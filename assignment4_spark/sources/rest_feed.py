"""REST-feed Python Data Source: the external-adapter face (Spark 4
DataSource API) for paginated HTTP APIs.

Reference provenance: the arXiv Atom scrape (A20, ra/agent.py:79-95)
and SerpAPI search (A21, ra/agent.py:97-106) are rate-limited paginated
REST feeds whose failures the reference isolates per call (A28,
ra/server.py error envelopes). This source re-expresses that shape as a
first-class pluggable scan:

  * **partition planning**: pages are split across input partitions, so
    a 1000-executor cluster fans the crawl out with zero driver
    involvement — each worker fetches only its page range;
  * **rate limiting**: a per-reader min-interval pacer (1/rate seconds
    between calls — the client side of a 429 policy). Real deployments
    rate-limit per worker precisely because the fan-out multiplies the
    request rate;
  * **bounded retry**: HTTP-429/5xx-style responses are retried up to
    max_retries with the pacer applied between attempts; a page that
    stays failed yields ONE page-level error row instead of killing the
    scan (the A28 error-isolation rule: one bad fetch must not fail the
    batch);
  * **per-record isolation**: malformed items inside an otherwise-good
    payload become error ROWS (rec_id kept from the envelope, error
    column set) — the PERMISSIVE corrupt-record pattern applied to an
    API payload.

Network is a declared non-goal in this sandbox, so the default fetcher
is an in-process deterministic fake (page content derives from the page
number only — no RNG, no clock), which is exactly what makes the
registered query DuckDB-oracle-checkable: every good row, every
malformed row, and every transient-429 retry is reproducible. A real
deployment passes fetch=requests-backed callable with the same
(page) -> (status, body) contract.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("rec_id", LongType()),
        StructField("title", StringType()),
        StructField("page", LongType()),
        StructField("error", StringType()),
    ]
)


def fake_fetch(page: int, attempt: int) -> tuple:
    """Deterministic fake REST endpoint: (status, body) derived from the
    page number and attempt count only.

    Every 5th page rate-limits its FIRST attempt (429, succeeds on
    retry); every item with id % 7 == 3 carries a malformed body (title
    replaced by a non-string marker the parser rejects). Page size is
    fixed at 10."""
    if page % 5 == 0 and attempt == 0:
        return 429, ""
    items = []
    for i in range(10):
        rec_id = page * 10 + i
        if rec_id % 7 == 3:
            items.append({"id": rec_id, "title": {"corrupt": True}})
        else:
            items.append({"id": rec_id, "title": f"Item {rec_id}"})
    return 200, json.dumps({"items": items})


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RestFeedReader(DataSourceReader):
    """Reader with client-side pacing + bounded retry + error-row
    isolation. `fetch` is injectable for tests (and for a real HTTP
    client); it must be a picklable callable (page, attempt) ->
    (status_code, body)."""

    def __init__(self, options, fetch=fake_fetch):
        self.n_pages = int(options.get("pages", 10))
        self.n_parts = int(options.get("partitions", 4))
        self.rate_per_sec = float(options.get("rate_per_sec", 1000.0))
        self.max_retries = int(options.get("max_retries", 2))
        self.fetch = fetch
        self.call_log: list = []  # (page, attempt, t) — inspected by tests
        self._last_call = 0.0

    def partitions(self):
        step = (self.n_pages + self.n_parts - 1) // self.n_parts
        return [
            _PageRange(i * step, min((i + 1) * step, self.n_pages))
            for i in range(self.n_parts)
            if i * step < self.n_pages
        ]

    def _paced_fetch(self, page: int, attempt: int) -> tuple:
        min_interval = 1.0 / self.rate_per_sec
        wait = self._last_call + min_interval - time.monotonic()
        if wait > 0:
            time.sleep(wait)
        self._last_call = time.monotonic()
        self.call_log.append((page, attempt, self._last_call))
        return self.fetch(page, attempt)

    def read(self, partition: _PageRange):
        for page in range(partition.start, partition.end):
            status, body = None, None
            for attempt in range(self.max_retries + 1):
                status, body = self._paced_fetch(page, attempt)
                if status == 200:
                    break
            if status != 200:
                # page-level isolation: the scan survives a dead page
                yield (None, None, page, f"fetch failed: status {status}")
                continue
            try:
                items = json.loads(body)["items"]
                if not isinstance(items, list):
                    raise TypeError(f"items is {type(items).__name__}, not list")
            # broad by design: a real fetcher can hand back ANY shape
            # (list body -> TypeError on ['items'], string items, etc.)
            # and the A28 contract is error ROW, never task death
            except Exception as ex:
                yield (None, None, page, f"bad payload: {ex}")
                continue
            for item in items:
                if not isinstance(item, dict):
                    yield (None, None, page, "malformed item")
                    continue
                rec_id = item.get("id")
                title = item.get("title")
                if not isinstance(rec_id, int) or not isinstance(title, str):
                    # record-level isolation: envelope id kept, body flagged
                    yield (
                        rec_id if isinstance(rec_id, int) else None,
                        None,
                        page,
                        "malformed item",
                    )
                else:
                    yield (rec_id, title, page, None)


class RestFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_feed"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return RestFeedReader(self.options)

    def streamReader(self, schema):
        return RestFeedStreamReader(self.options)


class RestFeedStreamReader(DataSourceStreamReader):
    """Streaming face of the same feed (Spark 4 Python streaming data
    source, full partition-planned API — not SimpleDataSourceStreamReader,
    whose driver-side prefetch would serialize the crawl that the batch
    reader already fans out): each trigger admits up to pages_per_batch
    new pages (latestOffset is the admission-control knob — a real
    deployment polls the API's cursor there), partitions() splits the
    admitted [start, end) page range one-page-per-partition so executors
    fetch in parallel, and read() reuses RestFeedReader's exact
    fetch/retry/error-isolation path — one implementation of the A28
    rules for both faces. Offsets are {"page": N} dicts.

    Restart contract — stated precisely, because the Python API gives a
    restarted reader no hand-back of the checkpointed offset before its
    first latestOffset() call (initialOffset is NOT re-invoked on
    restart; pyspark datasource.py documents restart-from-checkpoint),
    and the engine logs whatever latestOffset returns — the reader
    cannot veto a regressed offset entering the checkpoint. Two modes:

    * ``cursor_path`` set (production form): the admission cursor is
      persisted OUTSIDE Spark (atomic tmp+rename before latestOffset
      returns) — the REST analogue of asking the broker/metadata store
      where the crawl stands. The cursor can only run AHEAD of the
      committed offset (persist happens before the engine logs), which
      at worst makes one latestOffset admit a wider range the engine
      plans from its own committed start — never a regression, never a
      re-emission: exactly-once end-to-end with an idempotent sink
      (the sink half is streaming.stream_impl.idempotent_parquet_sink;
      the claim is proven with a FORCED batch replay in
      tests/test_streaming.py::test_idempotent_sink_replayed_batch).
    * no ``cursor_path`` (default): a fresh process restarts the
      counter, so the first post-restart latestOffset regresses below
      the restored start; partitions() repairs the cursor from that
      (start > end) plan and emits nothing, and the NEXT batch re-plans
      from the regressed logged offset — re-emitting a bounded window
      (≤ the committed-minus-regressed range) of already-delivered
      pages. At-least-once; partitions() itself stays stateless and
      idempotent per planned range (replay of an uncommitted logged
      batch re-reads its exact range, byte-identical thanks to the
      deterministic endpoint)."""

    def __init__(self, options, fetch=fake_fetch):
        self._delegate = RestFeedReader(options, fetch=fetch)
        self.n_pages = int(options.get("pages", 10))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))
        self._cursor_path = options.get("cursor_path")
        self._cur = 0
        if self._cursor_path and os.path.exists(self._cursor_path):
            with open(self._cursor_path) as f:
                self._cur = int(f.read().strip() or 0)

    def initialOffset(self) -> dict:
        # invoked ONLY for a FRESH checkpoint (a restart resumes from
        # the offset log without calling this — pyspark datasource.py),
        # so this is exactly the moment to CLAIM the cursor file: a
        # stale cursor left by a previous query at the same path would
        # otherwise make the first latestOffset admit the whole
        # historical page range in one micro-batch, defeating
        # pages_per_batch admission control. Concurrent queries must
        # still not SHARE a cursor_path (single-query ownership is the
        # documented contract); this guard repairs the serial-reuse
        # case, not simultaneous writers.
        self._cur = 0
        if self._cursor_path:
            tmp = f"{self._cursor_path}.tmp"
            with open(tmp, "w") as f:
                f.write("0")
            os.replace(tmp, self._cursor_path)
        return {"page": 0}

    def latestOffset(self) -> dict:
        self._cur = min(self._cur + self.pages_per_batch, self.n_pages)
        if self._cursor_path:
            tmp = f"{self._cursor_path}.tmp"
            with open(tmp, "w") as f:
                f.write(str(self._cur))
            os.replace(tmp, self._cursor_path)
        return {"page": self._cur}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["page"], end["page"]
        if hi < lo:
            # restart regression (fresh counter below the restored start,
            # default mode only): repair and emit nothing — the next
            # latestOffset resumes forward from the restored position
            self._cur = lo
            return []
        return [_PageRange(p, p + 1) for p in range(lo, hi)]

    def read(self, partition: _PageRange):
        return self._delegate.read(partition)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass
