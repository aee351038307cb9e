"""Sources & sinks (SURVEY.md §2 B.1).

Re-expresses the reference's I/O surface — S3 PDF listing
(parser_pinecone_storage.py:41-46), text/JSON/CSV/PNG sinks
(parser_pinecone_storage.py:81-117) — as Spark readers/writers with
explicit schemas. Roundtrip queries write to a local artifacts dir and
read back through the matching source, proving both directions.

Scale notes: all sinks write one file per partition in parallel (no
driver-side collect); CSV/JSON/text sources read with explicit schemas
so Catalyst can prune columns and push filters. On a cluster the same
code targets an object store path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io_util import table
from ..registry import register

ARTIFACT_ROOT = "/tmp/assignment4_spark_artifacts"

# Fixture-dir fingerprint cache: (mtime, size) of every parquet in the
# sf_dir, hashed into the artifact path. Derived layouts (partitioned /
# bucketed / compacted copies) are build-once behind a _SUCCESS marker,
# so a regenerated fixture MUST change the cache path or every gated
# artifact silently serves data derived from the old fixtures (this bit
# round 2→3: events.parquet changed ts unit and the cached
# events_by_date kept the stale dates).
#
# CONCURRENCY contract: the check-_SUCCESS-then-overwrite gates assume
# ONE process builds a given artifact path at a time (two concurrent
# builders could overwrite each other mid-commit). The driver runs
# bench/verify sequentially and pytest is single-process here, so the
# assumption holds; a multi-writer deployment would publish via a
# staging dir + atomic rename (the operators/lakehouse.py discipline).
_FPRINT_CACHE: dict[str, str] = {}


def _fixture_fingerprint(sf_dir: str) -> str:
    fp = _FPRINT_CACHE.get(sf_dir)
    if fp is None:
        import hashlib

        h = hashlib.md5()
        stable = True
        try:
            for fn in sorted(os.listdir(sf_dir)):
                if fn.endswith(".parquet"):
                    st = os.stat(os.path.join(sf_dir, fn))
                    h.update(f"{fn}:{st.st_mtime_ns}:{st.st_size};".encode())
        except OSError:
            # missing dir / mid-replace race: return a best-effort value
            # but do NOT cache it — caching a partial fingerprint for the
            # process lifetime would hand two different fixture
            # generations the same _SUCCESS-gated artifact path, the
            # exact staleness this mechanism exists to prevent
            stable = False
        fp = h.hexdigest()[:10]
        if stable:
            _FPRINT_CACHE[sf_dir] = fp
    return fp


def _adir(sf_dir: str, name: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(ARTIFACT_ROOT, f"{base}-{_fixture_fingerprint(sf_dir)}", name)


def _footer_stats_manifest(
    data_dir: str, manifest_path: str, cols: dict[str, tuple[str, str]]
) -> None:
    """Build and atomically publish a zone-map manifest from parquet
    row-group footer statistics — no data pages are read. Shared by
    scan_file_skipping_stats (1-D zone maps) and scan_zorder_cluster
    (2-D); ``cols`` maps column name -> (min_key, max_key) JSON field
    names so each op's on-disk manifest shape stays stable.

    Zero-row part files are omitted outright (they contribute no rows,
    so a planner that never opens them is exact). A column chunk
    written without footer statistics yields ``None`` bounds — planners
    must treat None as always-keep and exclude it from global-span
    arithmetic. The atomic tmp+rename publish matters because a crash
    mid-write must not leave a truncated manifest the exists() fast
    path would trust forever.
    """
    import json as _json

    import pyarrow.parquet as pq

    entries = []
    for fn in sorted(os.listdir(data_dir)):
        if not fn.endswith(".parquet"):
            continue
        path = os.path.join(data_dir, fn)
        meta = pq.ParquetFile(path).metadata
        if meta.num_rows == 0:
            continue
        names = meta.schema.names
        entry: dict[str, object] = {"file": path}
        for col, (min_key, max_key) in cols.items():
            ci = names.index(col)
            col_stats = [
                meta.row_group(g).column(ci).statistics
                for g in range(meta.num_row_groups)
            ]
            if all(s is not None and s.has_min_max for s in col_stats):
                entry[min_key] = int(min(s.min for s in col_stats))
                entry[max_key] = int(max(s.max for s in col_stats))
            else:
                entry[min_key] = None
                entry[max_key] = None
        entries.append(entry)
    tmp_path = manifest_path + ".tmp"
    with open(tmp_path, "w") as fh:
        _json.dump({"files": entries}, fh)
    os.replace(tmp_path, manifest_path)



def _manifest_span(stats: list[dict], min_key: str, max_key: str) -> tuple[int, int]:
    """Global [min, max] of a manifest column — FAILS LOUD if any file
    lacks stats for it: the span-derived predicate bounds must equal
    the oracle's table-wide MIN/MAX (every row is in some file), so a
    silent subset-span would shift the bounds and diverge VALUES with
    no error. None bounds are a keep-time concept (always-keep,
    _manifest_keep), never a span one."""
    missing = [s["file"] for s in stats if s.get(min_key) is None or s.get(max_key) is None]
    if missing:
        raise ValueError(
            f"manifest lacks {min_key}/{max_key} stats for {len(missing)} "
            f"file(s) (e.g. {os.path.basename(missing[0])}); span-derived "
            "bounds would silently diverge from the oracle's table MIN/MAX"
        )
    return (min(s[min_key] for s in stats), max(s[max_key] for s in stats))


def _manifest_keep(stats: list[dict], boxes: list[tuple[str, str, int, int]]) -> list[str]:
    """Files whose per-column [min, max] can intersect EVERY (lo, hi)
    box — the one definition of the keep rule for the 1-D
    (scan_file_skipping_stats) and 2-D (scan_zorder_cluster) planners.
    A file with None bounds for a column is always-keep for that
    column (stats-less chunk: cannot be proven non-intersecting)."""

    def ok(s: dict, min_key: str, max_key: str, lo: int, hi: int) -> bool:
        if s.get(min_key) is None or s.get(max_key) is None:
            return True
        return s[max_key] >= lo and s[min_key] <= hi

    return [
        s["file"]
        for s in stats
        if all(ok(s, mk, xk, lo, hi) for (mk, xk, lo, hi) in boxes)
    ]


@register(
    "scan_parquet",
    oracle="""
    SELECT COUNT(*)                         AS n_rows,
           COUNT(DISTINCT l_orderkey)       AS n_orders,
           ROUND(SUM(l_quantity), 2)        AS sum_qty,
           MIN(l_shipdate)                  AS first_ship,
           MAX(l_shipdate)                  AS last_ship
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan with projection — generalizes the S3 listing scan
    (parser_pinecone_storage.py:41-46). Only 3 columns reach the reader
    (ReadSchema pruning); counts aggregate map-side."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "scan_csv_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source roundtrip (reference table→CSV sink,
    parser_pinecone_storage.py:91-103): write `region` with a header,
    read back with an explicit schema (no inference on engine paths)."""
    out = _adir(sf_dir, "region_csv")
    # write exactly the columns the read schema declares: the 2-column
    # positional read previously worked only because r_comment sat LAST
    # and PERMISSIVE drops extra tokens — a column-order change (or
    # FAILFAST) would break every row; selecting first also stops
    # writing the comment bytes that dominate row width
    table(spark, sf_dir, "region").select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).option("header", True).csv(out)
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .csv(out)
        .orderBy("r_regionkey")
    )


@register(
    "scan_json_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """,
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source roundtrip (reference layout-JSON sink,
    parser_pinecone_storage.py:81-82)."""
    out = _adir(sf_dir, "nation_json")
    table(spark, sf_dir, "nation").write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).json(out).orderBy("n_nationkey")


@register(
    "scan_orc_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip — the columnar-format alternative to
    parquet (same reference export surface, parser_pinecone_storage.py:
    81-117). ORC is JVM-native in Spark (predicate pushdown + column
    pruning like parquet); DuckDB cannot read ORC, so the oracle reads
    the source-of-truth parquet view — any roundtrip corruption shows as
    a value mismatch."""
    out = _adir(sf_dir, "nation_orc")
    table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").orc(out)
    return spark.read.orc(out).orderBy("n_nationkey")


@register(
    "scan_partition_overwrite",
    oracle="""
    -- dynamic partition overwrite replay: only the 'F' partition is
    -- replaced (recomputed at doubled price, ver 2); every other
    -- partition's rows are byte-untouched
    WITH final AS (
      SELECT o_orderstatus AS status, 1 AS ver, o_totalprice AS price
      FROM orders WHERE o_orderstatus <> 'F'
      UNION ALL
      SELECT o_orderstatus, 2, o_totalprice * 2
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT status,
           COUNT(*)                 AS n_rows,
           CAST(SUM(ver) AS BIGINT) AS sum_ver,
           ROUND(SUM(price), 2)     AS sum_price
    FROM final
    GROUP BY status
    ORDER BY status
    """,
)
def scan_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — Spark's NATIVE
    ``partitionOverwriteMode=dynamic`` sink (INSERT OVERWRITE that
    replaces only the partitions the incoming batch actually touches,
    instead of truncating the table — the Hive-style backfill idiom
    and the hive-layout sibling of the manifest table's REPLACE
    WHERE): seed orders hive-partitioned by status, then overwrite a
    RECOMPUTED status='F' slice (doubled price, ver 2) in dynamic
    mode. Inline asserts pin the mode's contract — the untouched
    partitions keep their EXACT file sets (names compared before and
    after; static mode would have truncated them away) and the
    overwritten partition's files are replaced.

    Scale shape: the overwrite costs O(recomputed partition), not
    O(table) — on a date-partitioned 100 TB log this is the
    idempotent daily-backfill write; the write itself is one
    shuffle-free pass of the batch (partitionBy routes rows, no
    pre-repartition needed at one partition).
    Reference provenance: none (the reference re-upserts everything;
    SURVEY §2 A15); public recipe = SPARK-20236 dynamic partition
    overwrite / Hive INSERT OVERWRITE ... PARTITION.
    """
    import shutil

    base = _adir(sf_dir, "orders_dyn_overwrite")
    shutil.rmtree(base, ignore_errors=True)

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.lit(1).alias("ver"),
        F.col("o_totalprice").alias("price"),
    )
    orders.write.mode("overwrite").partitionBy("status").parquet(base)

    def part_files(status):
        d = os.path.join(base, f"status={status}")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    before = {s: part_files(s) for s in ("O", "P")}
    f_before = part_files("F")

    patch = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderstatus").alias("status"),
            F.lit(2).alias("ver"),
            (F.col("o_totalprice") * 2).alias("price"),
        )
    )
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("status")
        .parquet(base)
    )

    for s, fs in before.items():
        if part_files(s) != fs:
            raise AssertionError(
                f"dynamic overwrite must leave partition {s} untouched"
            )
    if part_files("F") == f_before:
        raise AssertionError("the touched partition must be replaced")

    return (
        spark.read.parquet(base)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("ver").alias("sum_ver"),
            F.round(F.sum("price"), 2).alias("sum_price"),
        )
        .orderBy("status")
    )


@register(
    "scan_text_sink",
    oracle="""
    SELECT COUNT(*)                                                AS n_lines,
           CAST(SUM(LENGTH(REGEXP_REPLACE(text, '[\\n\\r]', ' ', 'g'))) AS BIGINT) AS total_chars,
           MIN(LENGTH(REGEXP_REPLACE(text, '[\\n\\r]', ' ', 'g'))) AS min_chars,
           MAX(LENGTH(REGEXP_REPLACE(text, '[\\n\\r]', ' ', 'g'))) AS max_chars
    FROM documents
    """,
)
def scan_text_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text sink + source roundtrip (reference export_to_text sink,
    parser_pinecone_storage.py:83-84). Newlines flattened before the
    write so one document stays one line."""
    out = _adir(sf_dir, "documents_text")
    docs = table(spark, sf_dir, "documents").select(
        F.regexp_replace("text", "[\\n\\r]", " ").alias("value")
    )
    docs.write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_chars"),
        F.max(F.length("value")).alias("max_chars"),
    )


@register(
    "scan_binary_files",
    oracle="""
    SELECT 1 AS n_files,
           CAST(SUM(LENGTH(REGEXP_REPLACE(text, '[\\n\\r]', ' ', 'g')) + 1) AS BIGINT)
             AS total_bytes
    FROM documents
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source — the multimodal-column entry point (reference
    PDF fetch + PNG figures, parser_pinecone_storage.py:53-54,106-117).
    Writes the corpus as ONE text file (coalesce(1) makes the layout
    deterministic), reads it back as an opaque binary blob with
    path/length/content — the shape image/audio/video columns use —
    and aggregates so the oracle can pin it: total bytes = every line's
    chars + its newline. Fixture text is ASCII, so chars == bytes."""
    out = _adir(sf_dir, "documents_text_single")
    # build-once behind _SUCCESS (fingerprinted _adir invalidates on
    # fixture regen): the single-threaded coalesce(1) corpus write is
    # pure setup — re-paying it per bench invocation is the same fixed
    # overhead class as scan_permissive_corrupt's r5 drift
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "documents").select(
            F.regexp_replace("text", "[\\n\\r]", " ").alias("value")
        ).coalesce(1).write.mode("overwrite").text(out)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(out)
        .select(F.length("content").alias("content_len"))
    )
    return blobs.agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        # sum the CONTENT length, not the filesystem length metadata —
        # the aggregate then proves the loaded blob bytes match what the
        # oracle computes from the text (a metadata-only sum would pass
        # even if content loading were broken); the n_bytes==content_len
        # equivalence itself is pinned in tests/test_api.py
        F.sum("content_len").alias("total_bytes"),
    )


@register(
    "scan_python_datasource",
    oracle="""
    SELECT i AS doc_id,
           ARRAY_TO_STRING([('doc_' || i) FOR _ IN GENERATE_SERIES(1, CAST(i % 5 + 1 AS INTEGER))], ' ') AS text,
           CAST(i % 5 + 1 AS BIGINT) AS n_tokens
    FROM (SELECT UNNEST(generate_series(0, 99)) AS i)
    ORDER BY doc_id
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 DataSource API): the
    `synthetic_docs` source plans its own partitions (each generates an
    id range independently — the fan-out shape of a real custom feed)
    and yields deterministic rows the oracle reproduces with
    generate_series. Generalizes the reference's hand-rolled S3 listing
    loop (A1) into a first-class pluggable source."""
    from ..sources import register_once
    from ..sources.synthetic import SyntheticDocsDataSource

    register_once(spark, SyntheticDocsDataSource)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", 100)
        .option("partitions", 8)
        .load()
        .orderBy("doc_id")
    )


@register(
    "scan_rest_datasource",
    oracle="""
    SELECT i AS rec_id,
           CASE WHEN i % 7 = 3 THEN NULL ELSE 'Item ' || i END AS title,
           CAST(i // 10 AS BIGINT) AS page,
           CASE WHEN i % 7 = 3 THEN 'malformed item' ELSE NULL END AS error
    FROM (SELECT UNNEST(generate_series(0, 99)) AS i)
    ORDER BY rec_id
    """,
)
def scan_rest_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated REST-feed adapter (A20 arXiv / A21 SerpAPI shape) as a
    pluggable Python Data Source: page-ranged partitions, per-worker
    rate pacing, bounded 429 retry, and two-level error isolation
    (page-level and record-level error ROWS instead of job failure —
    A28). The deterministic fake endpoint makes every good row,
    malformed row, and transient retry oracle-reproducible; retry and
    pacing behavior is unit-tested reader-direct in
    tests/test_api.py."""
    from ..sources import register_once
    from ..sources.rest_feed import RestFeedDataSource

    register_once(spark, RestFeedDataSource)
    return (
        spark.read.format("rest_feed")
        .option("pages", 10)
        .option("partitions", 4)
        .load()
        .orderBy("rec_id")
    )


@register(
    "scan_permissive_corrupt",
    oracle="""
    SELECT 7 AS n_good, 3 AS n_corrupt, 21 AS sum_good_vals
    """,
)
def scan_permissive_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive-mode error isolation — the reference's per-item
    try/except-and-skip (A28, parser_pinecone_storage.py:127-128,
    ra/agent.py:75-77) as engine semantics: malformed records land in
    `_corrupt_record` instead of failing the job, good rows flow on. A
    known 10-line feed (3 broken) is written and read back PERMISSIVE;
    the oracle pins the exact good/corrupt split and the sum over good
    rows — i.e. corrupt rows provably neither crash nor contribute."""
    out = _adir(sf_dir, "corrupt_json")
    lines = [
        '{"id": 1, "val": 1}',
        '{"id": 2, "val": 2}',
        'not json at all',
        '{"id": 3, "val": 3}',
        '{"id": 4, "val": 4',  # truncated
        '{"id": 5, "val": 5}',
        '{"id": 6, "val": 6}',
        '[1, 2, 3]',  # wrong shape (array, not object)
        '{"id": 7, "val": 4}',
        '{"id": 8, "val": 0}',
    ]
    # SQL VALUES, not createDataFrame: coalescing a Python-built local
    # relation spins up Python workers for a 10-row write (~5 s); the
    # JVM literal relation writes in milliseconds. Build-once: the feed
    # is a constant; the fingerprinted _adir invalidates on fixture regen.
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        values = ", ".join("('" + l.replace("'", "''") + "')" for l in lines)
        spark.sql(f"SELECT * FROM VALUES {values} AS t(value)").coalesce(
            1
        ).write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("val", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # ONE conditional aggregate over ONE scan: good/corrupt split and
    # the good-row sum in the same pass. Spark's ban on querying the
    # corrupt column does not bite here because the agg references
    # `val` alongside `_corrupt_record`, so the scan never prunes down
    # to the internal column alone — which is why the earlier
    # cache→count→agg→unpersist dance (3 actions + a cached relation
    # per call; the r5 bench drift) is unnecessary.
    corrupt = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.when(~corrupt, 1)).alias("n_good"),
        F.count(F.when(corrupt, 1)).cast("int").alias("n_corrupt"),
        F.sum(F.when(~corrupt, F.col("val"))).cast("int").alias("sum_good_vals"),
    )


@register(
    "json_parse_props",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                   AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))    AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))    AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column with an explicit schema (from_json) —
    the engine's version of the reference's dynamic layout-JSON access
    (parser_pinecone_storage.py:160-161). from_json with a fixed schema
    stays JVM-side/codegen; no Python in the loop."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").getField("k").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scan_files_compaction",
    oracle="""
    SELECT event_type,
           COUNT(*)                    AS n_rows,
           ROUND(SUM(value), 6)        AS sum_value,
           COUNT(DISTINCT user_id)     AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scan_files_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every large
    parquet lake runs: a fragmented layout (here: events deliberately
    written as 64 splinter files, the state a streaming/incremental
    ingest leaves behind) is rewritten into few right-sized files, and
    downstream queries read the compacted layout. At 100 TB the
    small-file problem IS a first-order cost: every file costs a task +
    open + footer parse, and 10⁶ × 1 MB files can make a scan
    scheduler-bound — compaction to ~128 MB files restores
    maxPartitionBytes-sized splits. The op asserts the invariant that
    matters: byte-identical table contents (the oracle reads the
    PRE-compaction truth) with a verified file-count collapse.
    Provenance: A13's batch-size-1 upserts are exactly how such
    fragmentation arises (SURVEY §4.1 "per-vector upsert RPC").
    """
    frag_dir = _adir(sf_dir, "events_fragmented")
    compact_dir = _adir(sf_dir, "events_compacted")
    ev = table(spark, sf_dir, "events")
    ev.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    # compact: 2 output files via repartition — at scale you'd target
    # bytes/file (e.g. coalesce to sum(bytes)/128MB) not a constant
    frag.repartition(2).write.mode("overwrite").parquet(compact_dir)

    n_frag = len([f for f in os.listdir(frag_dir) if f.endswith(".parquet")])
    n_comp = len([f for f in os.listdir(compact_dir) if f.endswith(".parquet")])
    if not (n_comp < n_frag and n_comp <= 2):
        raise AssertionError(f"compaction failed: {n_frag} -> {n_comp} files")

    return (
        spark.read.parquet(compact_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@register(
    "scan_schema_evolution",
    oracle="""
    SELECT CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END AS event_type,
           COUNT(*)                AS n_rows,
           ROUND(SUM(value), 6)    AS sum_value
    FROM events
    GROUP BY CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END
    ORDER BY event_type NULLS FIRST
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches — the lake reality that a
    100 TB table is written over months by evolving jobs: an old batch
    lacks a column a new batch has. Batch 1 (even event_ids) is written
    WITHOUT event_type; batch 2 (odd ids) with it; the read merges the
    footers (`mergeSchema`) and legacy rows surface the new column as
    NULL — the exact union-by-name widening a long-lived table needs.
    The oracle derives the same view from the unevolved truth, so the
    merge semantics (not just the counts) are what's verified.

    Scale note: mergeSchema reconciles FOOTERS, not data — cost scales
    with file count, not bytes; production tables pin the merged schema
    in a metastore so the read doesn't re-derive it per query (the
    explicit-schema discipline every other scan here follows)."""
    b1 = _adir(sf_dir, "events_evo_b1")
    b2 = _adir(sf_dir, "events_evo_b2")
    # build-once (the op under test is the mergeSchema READ, not the
    # writes); the fingerprinted _adir invalidates on fixture regen
    if not (
        os.path.exists(os.path.join(b1, "_SUCCESS"))
        and os.path.exists(os.path.join(b2, "_SUCCESS"))
    ):
        ev = table(spark, sf_dir, "events")
        ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value").write.mode(
            "overwrite"
        ).parquet(b1)
        ev.filter(F.col("event_id") % 2 == 1).select(
            "event_id", "value", "event_type"
        ).write.mode("overwrite").parquet(b2)
    merged = spark.read.option("mergeSchema", True).parquet(b1, b2)
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy(F.col("event_type").asc_nulls_first())
    )


@register(
    "scan_snapshot_time_travel",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                  AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderkey % 3 = 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def scan_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolated time travel over a manifest-tracked table — the
    lakehouse mechanism (Iceberg/Delta snapshot + manifest list) built
    from first principles on plain parquet: each commit writes NEW data
    files plus an immutable manifest JSON naming the complete file set
    of that version; a reader pins a version by reading exactly the
    manifest's files, so later appends can never tear or contaminate an
    in-flight query.

    Two commits happen here: v1 = orders with o_orderkey%3=0, v2 =
    append of the %3=1 slice (manifest v2 = v1's files + the new ones —
    appends never rewrite data). The registered read is **AS OF v1**:
    its file list comes from v1.json, and the op asserts the v2 read
    sees strictly more rows before returning the v1 aggregate (the
    oracle is the %3=0 slice of the truth table — byte-equality of the
    snapshot with the data as of commit 1).

    At 100 TB this IS how isolation scales: commits are O(new files) +
    one manifest write; readers plan from a manifest listing (no
    directory listing race), and pruning/compaction produce new
    manifests without touching readers pinned to old ones. The format
    here omits only what the sandbox can't exercise (concurrent-writer
    CAS on the manifest pointer, column stats in the manifest for file
    skipping — both noted, not simulated).
    Reference provenance: A13's Pinecone index has no version pinning
    at all (every read sees whatever the last upsert left) — this op is
    the correctness property the reference silently lacks; write-side
    MERGE lives in vec_upsert_merge (vectors.py).
    """
    import json as _json

    base = _adir(sf_dir, "orders_snapshots")
    orders = table(spark, sf_dir, "orders")

    def commit(version: int, df, prior_files: list[str]) -> list[str]:
        data_dir = os.path.join(base, f"batch{version}")
        df.write.mode("overwrite").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        manifest = {"version": version, "files": prior_files + files}
        final = os.path.join(base, f"v{version}.json")
        tmp = final + ".tmp"
        # atomic publish (tmp + rename), the same discipline
        # _footer_stats_manifest documents: a reader in another process
        # must never observe a half-written manifest
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        os.replace(tmp, final)
        return manifest["files"]

    os.makedirs(base, exist_ok=True)
    v1_files = commit(1, orders.filter(F.col("o_orderkey") % 3 == 0), [])
    v2_files = commit(2, orders.filter(F.col("o_orderkey") % 3 == 1), v1_files)

    with open(os.path.join(base, "v1.json")) as fh:
        pinned = _json.load(fh)["files"]
    snap_v1 = spark.read.parquet(*pinned)
    snap_v2 = spark.read.parquet(*v2_files)
    if snap_v2.count() <= snap_v1.count():
        raise AssertionError("append commit must grow the snapshot")

    return (
        snap_v1.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "scan_file_skipping_stats",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 4 AS lo,
             MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 2 AS hi
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*)                    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders, bounds
    WHERE o_orderkey BETWEEN bounds.lo AND bounds.hi
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scan_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file skipping from first principles — the data-skipping
    mechanism under every lakehouse MERGE/OPTIMIZE story: orders is
    written CLUSTERED by o_orderkey into 8 range-partitioned files, a
    manifest records per-file (min, max) of the cluster key, and a
    range query plans its file list FROM THE MANIFEST — files whose
    [min, max] cannot intersect the predicate are never opened. The op
    asserts the skip actually happened (files read < files written)
    before returning the aggregate; correctness is oracle-checked
    against the unclustered truth.

    Why this is the 100 TB idiom: at scale the scheduler cost is
    files-touched, not rows-matched — clustering + stats turns a
    full-scan into an O(selectivity) scan with NO index structure,
    just layout discipline. repartitionByRange gives the disjoint
    key ranges (a plain repartition would give every file the full key
    span and nothing could ever be skipped — that is precisely the
    difference OPTIMIZE/Z-ORDER exists to make). Pairs with
    scan_snapshot_time_travel: the same manifest that pins a version
    is where these stats live (Iceberg manifests, Delta add-file
    stats).
    """
    import json as _json

    base = _adir(sf_dir, "orders_clustered")
    data_dir = os.path.join(base, "data")
    manifest_path = os.path.join(base, "manifest.json")
    orders = table(spark, sf_dir, "orders")
    if not os.path.exists(manifest_path):
        os.makedirs(base, exist_ok=True)
        orders.repartitionByRange(8, "o_orderkey").write.mode("overwrite").parquet(
            data_dir
        )
        _footer_stats_manifest(
            data_dir, manifest_path, {"o_orderkey": ("min", "max")}
        )

    with open(manifest_path) as fh:
        stats = _json.load(fh)["files"]
    # predicate bounds = the second keyspace quartile, derived from the
    # manifest itself (exact integer arithmetic, mirrored by the
    # oracle's MIN/MAX subquery) so the op skips files at EVERY sf.
    # _manifest_span fails loud if any file lacks stats — a subset-span
    # would silently shift the bounds away from the oracle's table
    # MIN/MAX; _manifest_keep holds the shared keep rule.
    mn, mx = _manifest_span(stats, "min", "max")
    lo, hi = mn + (mx - mn) // 4, mn + (mx - mn) // 2
    keep = _manifest_keep(stats, [("min", "max", lo, hi)])
    if not (0 < len(keep) < len(stats)):
        raise AssertionError(
            f"file skipping ineffective: {len(keep)} of {len(stats)} files"
        )
    return (
        spark.read.parquet(*keep)
        .filter(F.col("o_orderkey").between(lo, hi))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scan_table_profile",
    oracle="""
    SELECT COUNT(*)                                        AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                           AS orderkey_nulls,
           COUNT(DISTINCT o_orderkey)                      AS orderkey_ndv,
           COUNT(DISTINCT o_custkey)                       AS custkey_ndv,
           COUNT(DISTINCT o_orderstatus)                   AS orderstatus_ndv,
           COUNT(DISTINCT o_orderdate)                     AS orderdate_ndv,
           CAST(MIN(o_orderdate) AS DATE)                  AS orderdate_min,
           CAST(MAX(o_orderdate) AS DATE)                  AS orderdate_max,
           ROUND(MIN(o_totalprice), 2)                     AS totalprice_min,
           ROUND(MAX(o_totalprice), 2)                     AS totalprice_max,
           ROUND(AVG(o_totalprice), 2)                     AS totalprice_avg
    FROM orders
    """,
)
def scan_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profiling in one statement — row count,
    per-column null counts and EXACT distinct cardinalities, min/max/avg
    for the date and measure columns of `orders`. This is the stats
    pass every CBO, data-quality monitor, and ingestion contract check
    runs first; the reference has no notion of it (Pinecone metadata is
    write-only).

    Spark shape: multiple COUNT(DISTINCT) in one Aggregate — Catalyst
    plans the standard Expand (one input replica per distinct group)
    with partial aggregation, so the shuffle carries (group-id, value)
    pairs already combined map-side. At 100 TB the exact-NDV profile is
    the expensive honest form (the Expand multiplies the scan by the
    number of distinct-columns); the production fast path swaps each
    COUNT(DISTINCT) for approx_count_distinct — the engine ships that
    estimator as agg_approx_distinct/agg_hll_distinct, same plan minus
    the Expand. Floats are ROUNDed (registry rule); date min/max are
    exact DATE values on both engines.
    """
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orderkey_nulls"),
        F.countDistinct("o_orderkey").alias("orderkey_ndv"),
        F.countDistinct("o_custkey").alias("custkey_ndv"),
        F.countDistinct("o_orderstatus").alias("orderstatus_ndv"),
        F.countDistinct("o_orderdate").alias("orderdate_ndv"),
        F.min(F.col("o_orderdate").cast("date")).alias("orderdate_min"),
        F.max(F.col("o_orderdate").cast("date")).alias("orderdate_max"),
        F.round(F.min("o_totalprice"), 2).alias("totalprice_min"),
        F.round(F.max("o_totalprice"), 2).alias("totalprice_max"),
        F.round(F.avg("o_totalprice"), 2).alias("totalprice_avg"),
    )


@register(
    "scan_zorder_cluster",
    oracle="""
    WITH b AS (
      SELECT MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) // 4   AS c_lo,
             MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) // 2   AS c_hi,
             MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 4 AS k_lo,
             MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 2 AS k_hi
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*)                    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders, b
    WHERE o_custkey  BETWEEN b.c_lo AND b.c_hi
      AND o_orderkey BETWEEN b.k_lo AND b.k_hi
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scan_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering — the 2-D generalization of
    scan_file_skipping_stats' zone maps, i.e. what Delta OPTIMIZE
    ZORDER BY / Iceberg sort-order rewrite actually do: orders is
    rewritten range-clustered by the Morton code of
    (o_custkey, o_orderkey) — both keys scaled to 16 bits and
    bit-interleaved with 32 unrolled shift/mask terms, pure codegen —
    so every file covers a LOCALIZED RECTANGLE of the 2-D keyspace.
    The manifest records per-file (min, max) of BOTH columns, and a
    2-D box query plans its file list from the manifest; files whose
    rectangle misses the box on either dimension are never opened
    (asserted in-op: files read < files written).

    Why a single-key range layout can't do this: clustering by
    o_custkey alone makes every file span the FULL o_orderkey range —
    the second predicate can never skip a file. The Morton curve's
    locality gives BOTH predicates skipping power from one layout,
    which at 100 TB is the difference between touching O(box area)
    files and touching every file that matches one dimension. Same
    fingerprint-keyed build-once artifact discipline as the other
    layout ops; results oracle-checked against the unclustered truth.
    Reference provenance: none (the reference's storage is a Pinecone
    index with no layout control); north-star scale-idiom surface,
    public recipe = Delta OPTIMIZE ZORDER / Morton 1966.
    """
    import json as _json

    base = _adir(sf_dir, "orders_zorder")
    data_dir = os.path.join(base, "data")
    manifest_path = os.path.join(base, "manifest.json")
    orders = table(spark, sf_dir, "orders")
    if not os.path.exists(manifest_path):
        os.makedirs(base, exist_ok=True)
        stats_row = orders.agg(
            F.min("o_custkey").alias("cmn"),
            F.max("o_custkey").alias("cmx"),
            F.min("o_orderkey").alias("kmn"),
            F.max("o_orderkey").alias("kmx"),
        ).first()
        c_span = max(stats_row.cmx - stats_row.cmn, 1)
        k_span = max(stats_row.kmx - stats_row.kmn, 1)
        xi = ((F.col("o_custkey") - F.lit(stats_row.cmn)) * 65535 / F.lit(c_span)).cast(
            "int"
        )
        yi = ((F.col("o_orderkey") - F.lit(stats_row.kmn)) * 65535 / F.lit(k_span)).cast(
            "int"
        )
        z = F.lit(0).cast("long")
        for i in range(16):
            z = (
                z
                + F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i)
                + F.shiftleft(
                    F.shiftright(yi, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
                )
            )
        (
            orders.withColumn("_z", z)
            .repartitionByRange(8, "_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(data_dir)
        )
        _footer_stats_manifest(
            data_dir,
            manifest_path,
            {"o_custkey": ("c_min", "c_max"), "o_orderkey": ("k_min", "k_max")},
        )

    with open(manifest_path) as fh:
        stats = _json.load(fh)["files"]
    # 2-D box = the second quartile of each keyspace, derived from the
    # manifest (== the raw table's MIN/MAX — every row is in some file),
    # mirrored exactly by the oracle's integer arithmetic; shared
    # span/keep helpers (fail-loud on missing stats, always-keep on
    # None bounds) — one keep-rule definition with the 1-D planner.
    cmn, cmx = _manifest_span(stats, "c_min", "c_max")
    kmn, kmx = _manifest_span(stats, "k_min", "k_max")
    c_lo, c_hi = cmn + (cmx - cmn) // 4, cmn + (cmx - cmn) // 2
    k_lo, k_hi = kmn + (kmx - kmn) // 4, kmn + (kmx - kmn) // 2
    keep = _manifest_keep(
        stats, [("c_min", "c_max", c_lo, c_hi), ("k_min", "k_max", k_lo, k_hi)]
    )
    if not (0 < len(keep) < len(stats)):
        raise AssertionError(
            f"z-order skipping ineffective: {len(keep)} of {len(stats)} files"
        )
    return (
        spark.read.parquet(*keep)
        .filter(
            F.col("o_custkey").between(c_lo, c_hi)
            & F.col("o_orderkey").between(k_lo, k_hi)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scan_expectations_gate",
    oracle="""
    WITH j AS (
      SELECT o.*, c.c_custkey AS fk
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ), m AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE o_orderkey IS NULL)            AS v_null,
             COUNT(*) - COUNT(DISTINCT o_orderkey)                 AS v_uniq,
             COUNT(*) FILTER (WHERE o_totalprice < 0)              AS v_neg,
             COUNT(*) FILTER (WHERE o_totalprice > 300000)         AS v_cap,
             COUNT(*) FILTER (WHERE o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
                                 OR o_orderdate >= TIMESTAMP '2002-01-01 00:00:00') AS v_date,
             COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS v_dom,
             COUNT(*) FILTER (WHERE fk IS NULL)                    AS v_fk
      FROM j
    )
    SELECT expectation, violations, n_checked, violations = 0 AS passed
    FROM (
      SELECT 'o_custkey_fk_customer'   AS expectation, v_fk  AS violations, n AS n_checked FROM m
      UNION ALL SELECT 'o_orderdate_in_range',   v_date, n FROM m
      UNION ALL SELECT 'o_orderkey_not_null',    v_null, n FROM m
      UNION ALL SELECT 'o_orderkey_unique',      v_uniq, n FROM m
      UNION ALL SELECT 'o_orderstatus_domain',   v_dom,  n FROM m
      UNION ALL SELECT 'o_totalprice_nonneg',    v_neg,  n FROM m
      UNION ALL SELECT 'o_totalprice_soft_cap_300k', v_cap, n FROM m
    )
    ORDER BY expectation
    """,
)
def scan_expectations_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract expectations gate — the ingestion check every
    production pipeline runs before letting a batch into the lake
    (Great Expectations / Delta constraints / dbt tests, as one
    operator): per-expectation violation counts over `orders` for
    null-ness, key uniqueness, value range, domain membership, a soft
    business cap (deliberately failing on this data, so the counting
    path is exercised, not just the zero path), and o_custkey
    referential integrity against `customer`.

    Spark shape — ONE scan of the fact table: all seven checks ride a
    single aggregate over orders LEFT-JOINed to the customer key set
    (Catalyst broadcasts the dim side at fixture scale; at 100 TB the
    same declaration shuffle-joins on the FK — either way the fact
    table is read once, and every violation counter is a map-side
    conditional sum fused into one Expand-free Aggregate except the
    COUNT(DISTINCT) uniqueness probe, which Catalyst plans as the
    standard Expand). The per-expectation rows come from unpivoting
    the 1-row aggregate with stack() — metadata-sized, no second pass.
    A failed gate at scale quarantines the batch: the `passed` column
    is the bit a scheduler branches on.
    Reference provenance: none (the reference ingests with no
    validation — SURVEY §0 gap); north-star ingestion-contract
    surface, public recipe = Great Expectations / Delta CHECK
    constraints.
    """
    o = table(spark, sf_dir, "orders")
    c_keys = table(spark, sf_dir, "customer").select("c_custkey").distinct()
    j = o.join(c_keys, o.o_custkey == c_keys.c_custkey, "left")

    def _viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(F.col("o_orderkey").isNull()).alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_uniq"),
        _viol(F.col("o_totalprice") < 0).alias("v_neg"),
        _viol(F.col("o_totalprice") > 300000).alias("v_cap"),
        _viol(
            (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2002-01-01 00:00:00").cast("timestamp"))
        ).alias("v_date"),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_dom"),
        _viol(F.col("c_custkey").isNull()).alias("v_fk"),
    )
    return (
        m.select(
            F.expr(
                "stack(7, "
                "'o_custkey_fk_customer', v_fk, "
                "'o_orderdate_in_range', v_date, "
                "'o_orderkey_not_null', v_null, "
                "'o_orderkey_unique', v_uniq, "
                "'o_orderstatus_domain', v_dom, "
                "'o_totalprice_nonneg', v_neg, "
                "'o_totalprice_soft_cap_300k', v_cap"
                ") AS (expectation, violations)"
            ),
            F.col("n").alias("n_checked"),
        )
        .select(
            "expectation",
            "violations",
            "n_checked",
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy("expectation")
    )


@register(
    "json_variant_shred",
    oracle="""
    WITH j AS (
      SELECT to_json(struct_pack(
               id := o_orderkey,
               m := struct_pack(pri := o_orderpriority, ck := o_custkey),
               arr := [o_custkey, o_orderkey])) AS js
      FROM orders
      WHERE o_orderkey < 1000
    )
    SELECT CAST(json_extract(js, '$.id') AS BIGINT)      AS id,
           json_extract_string(js, '$.m.pri')            AS pri,
           CAST(json_extract(js, '$.m.ck') AS BIGINT)    AS ck,
           CAST(json_extract(js, '$.arr[1]') AS BIGINT)  AS arr_1,
           CAST(json_array_length(js, '$.arr') AS INTEGER) AS arr_len
    FROM j
    ORDER BY id
    """,
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read-less semi-structured access via Spark 4's VARIANT
    type: parse_json ONCE into the binary variant encoding, then
    variant_get per path — nested object fields, an array index, an
    array length — with no declared schema anywhere. The modern
    lakehouse answer to JSON columns, and the third point on the
    engine's JSON access spectrum: from_json needs the schema up front
    (json_parse_props), get_json_object re-parses the string per path,
    VARIANT parses once and serves every path from the shredded binary
    form. At 100 TB that difference is the whole game: parse cost is
    paid once per row (not once per extraction), the binary encoding
    is columnar-shreddable by the writer, and the paths here stay
    entirely JVM-side codegen.

    The JSON document is built in-plan from orders columns (to_json of
    a nested struct — integers and strings only, so the serialized
    text is byte-identical across engines) and immediately re-parsed:
    the oracle runs the same build→extract round-trip through DuckDB's
    JSON functions, so engine parity covers the full serialize → parse
    → path-extract pipeline, not just the happy values.
    Reference provenance: generalizes the reference's dynamic
    layout-JSON access (parser_pinecone_storage.py:160-161) to the
    schema-free form; SURVEY §2 B.11 (round 5)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_orderpriority").alias("pri"),
                F.col("o_custkey").alias("ck"),
            ).alias("m"),
            F.array("o_custkey", "o_orderkey").alias("arr"),
        )
    )
    v = F.parse_json(j)
    return o.select(
        F.variant_get(v, "$.id", "bigint").alias("id"),
        F.variant_get(v, "$.m.pri", "string").alias("pri"),
        F.variant_get(v, "$.m.ck", "bigint").alias("ck"),
        F.variant_get(v, "$.arr[1]", "bigint").alias("arr_1"),
        F.size(F.variant_get(v, "$.arr", "array<bigint>")).alias("arr_len"),
    ).orderBy("id")
