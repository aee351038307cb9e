"""MERGE INTO with snapshot-isolated optimistic concurrency (SURVEY.md
§2 B.1 lake-maintenance family).

Reference provenance: A13's per-vector Pinecone upsert
(parser_pinecone_storage.py:154) has no transactional story at all —
concurrent writers interleave per-record and a reader mid-upsert sees a
torn index. This module supplies the correctness property the reference
silently lacks, composed from two already-proven pieces:

* the bucket-pruned latest-wins rewrite of ``vec_upsert_merge``
  (vectors.py: only buckets containing updated keys are rewritten);
* the immutable-manifest snapshot commits of
  ``scan_snapshot_time_travel`` (scans.py: a version is an immutable
  JSON naming its complete file set; readers pin a version and can
  never be torn by a concurrent commit).

The missing third piece — what Delta/Iceberg add on top — is the
**optimistic-concurrency commit loop** implemented here:

1. pin the latest manifest (version N);
2. plan the touched buckets from the UPDATE batch's keys and read ONLY
   those buckets' files out of manifest N (file-level pruning — the
   untouched ~(B-t)/B of a 100 TB table is never opened);
3. write the merged touched buckets as NEW files under a
   commit-private directory (shared files are never mutated);
4. publish manifest N+1 = (manifest N's untouched-bucket files) +
   (the new touched-bucket files) via an atomic compare-and-swap;
5. if the CAS loses (another writer already published N+1), re-pin,
   re-plan, re-merge against the winner's state, and retry — the loser
   re-reads the winner's rows, so the final state is the SERIAL result
   of both merges in commit order (true snapshot-isolated MERGE, not
   last-writer-wins clobbering).

The CAS primitive is ``os.link(tmp, vN.json)``: hard-link creation is
atomic and fails with EEXIST if the destination exists, and the
manifest becomes visible only as a complete file (readers never observe
a partial write). On a production object store the same step is an S3
conditional PUT (If-None-Match) or a metastore/DynamoDB CAS — one
swapped function, identical protocol.

Scale shape: a commit costs O(touched buckets) data I/O + one manifest
write; conflict retries re-do only the touched-bucket merge; readers
plan from a manifest listing (no directory-listing race) and pruning /
compaction publish new manifests without disturbing pinned readers.
Bucket count B tunes the rewrite granularity exactly as in
``vec_upsert_merge`` — at 100 TB you size B so a bucket ≈ a few GB and
a point-update commit rewrites thousandths of the table.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register


def _bucket_of(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _column_types(df: DataFrame) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def _manifest_path(base_dir: str, version: int) -> str:
    return os.path.join(base_dir, f"v{version}.json")


def latest_version(base_dir: str) -> int:
    """Highest committed manifest version (0 = uninitialized table)."""
    best = 0
    try:
        names = os.listdir(base_dir)
    except OSError:
        return 0
    for fn in names:
        if fn.startswith("v") and fn.endswith(".json"):
            try:
                best = max(best, int(fn[1:-5]))
            except ValueError:
                continue
    return best


def load_manifest(base_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(base_dir)
    with open(_manifest_path(base_dir, version)) as fh:
        return json.load(fh)


def _publish_manifest(base_dir: str, manifest: dict) -> bool:
    """Atomic CAS commit of ``manifest`` at its version slot.

    Content is fully written to a private temp file first, then
    hard-linked to the version path: the link either materializes the
    COMPLETE manifest atomically or fails with FileExistsError because
    a competing writer won the version — the two outcomes of a
    conditional PUT. Returns False on a lost race (caller retries)."""
    final = _manifest_path(base_dir, manifest["version"])
    tmp = os.path.join(
        base_dir,
        f".v{manifest['version']}.{os.getpid()}.{threading.get_ident()}.tmp",
    )
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, final)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _list_bucket_files(staging_dir: str) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for entry in os.listdir(staging_dir):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        bdir = os.path.join(staging_dir, entry)
        out[b] = sorted(
            os.path.join(bdir, f) for f in os.listdir(bdir) if f.endswith(".parquet")
        )
    return out


def init_table(
    df: DataFrame, base_dir: str, key_col: str, n_buckets: int
) -> dict:
    """Commit version 1 of a manifest-tracked bucketed table.

    The bucket is DERIVED (pmod(xxhash64(key), B)) — data files do not
    store it, so any pinned-file read can recompute it from the key and
    no basePath gymnastics are needed. Raises if the table already has
    a committed version (init is not a merge)."""
    import shutil

    os.makedirs(base_dir, exist_ok=True)
    if latest_version(base_dir) != 0:
        raise ValueError(f"table at {base_dir} already initialized")
    # staging is WRITER-PRIVATE (pid/thread), exactly like merge's: a
    # shared 'commit_v1' dir with mode(overwrite) would let a
    # concurrent-init LOSER delete the CAS winner's part files before
    # losing — publishing a v1 manifest that names dead paths
    staging = os.path.join(
        base_dir, f"commit_v1_{os.getpid()}_{threading.get_ident()}"
    )
    (
        df.withColumn("bucket", _bucket_of(key_col, n_buckets))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )
    manifest = {
        "version": 1,
        "n_buckets": n_buckets,
        "key_col": key_col,
        "columns": df.columns,
        "column_types": _column_types(df),
        "buckets": {str(b): fs for b, fs in sorted(_list_bucket_files(staging).items())},
    }
    if not _publish_manifest(base_dir, manifest):
        shutil.rmtree(staging, ignore_errors=True)  # loser leaves nothing
        raise ValueError(f"concurrent init of {base_dir}")
    return manifest


def read_snapshot(
    spark: SparkSession, base_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest) — exactly the
    manifest's file set, so concurrent commits can never tear the scan."""
    manifest = load_manifest(base_dir, version)
    files = [f for fs in manifest["buckets"].values() for f in fs]
    return spark.read.parquet(*files)


def vacuum(base_dir: str, keep_last: int = 2) -> dict:
    """Retention cleanup — the VACUUM half of the MERGE story: expire
    every manifest older than the newest ``keep_last`` versions and
    delete the data files ONLY those expired versions reference.

    A file is deleted iff it appears in some expired manifest and in NO
    kept manifest — untouched-bucket files carried forward across
    commits survive as long as any kept version names them. Readers
    pinned inside the retention window are untouched (their manifests
    and files remain intact); readers pinned to an expired version
    lose it — the same explicit retention contract Delta/Iceberg
    VACUUM/expire_snapshots ships with. Deletion order is files first,
    manifests last, so a crash mid-vacuum can never leave a live
    manifest naming a deleted file... only an expired one.

    Returns ``{"deleted_versions": [...], "deleted_files": N,
    "kept_versions": [...]}``."""
    latest = latest_version(base_dir)
    if latest == 0:
        raise ValueError(f"no committed table at {base_dir}")
    keep_last = max(1, keep_last)
    # enumerate versions that STILL EXIST on disk (an earlier vacuum
    # already removed older manifests — idempotency requires never
    # assuming a contiguous 1..latest range)
    existing = sorted(
        int(fn[1:-5])
        for fn in os.listdir(base_dir)
        if fn.startswith("v") and fn.endswith(".json") and fn[1:-5].isdigit()
    )
    kept = [v for v in existing if v > latest - keep_last]
    expired = [v for v in existing if v not in kept]
    kept_files: set[str] = set()
    for v in kept:
        for fs in load_manifest(base_dir, v)["buckets"].values():
            kept_files.update(fs)
    doomed: set[str] = set()
    for v in expired:
        for fs in load_manifest(base_dir, v)["buckets"].values():
            doomed.update(f for f in fs if f not in kept_files)
    for f in sorted(doomed):
        try:
            os.remove(f)
        except FileNotFoundError:
            pass  # an earlier interrupted vacuum already got it
    for v in expired:
        os.remove(_manifest_path(base_dir, v))
    return {
        "deleted_versions": expired,
        "deleted_files": len(doomed),
        "kept_versions": kept,
    }


class MergeConflictError(RuntimeError):
    """Raised when a merge loses the commit CAS more than max_retries
    times in a row (livelock guard; production backs off instead)."""


def merge_upsert_manifest(
    base_dir: str,
    updates: DataFrame,
    ver_col: str,
    tiebreak_col: str,
    writer_id: str = "w0",
    max_retries: int = 5,
    before_commit=None,
) -> tuple[int, int]:
    """MERGE INTO the manifest table at ``base_dir``: latest-wins per
    key across (pinned snapshot ∪ updates), ordered by ``ver_col`` DESC
    with ``tiebreak_col`` for full determinism. Only buckets containing
    an updated key are read or rewritten; every other bucket's files
    carry over into the new manifest untouched (asserted file-identical
    in tests/test_lakehouse.py).

    ``before_commit(attempt)`` is a test seam invoked after the new
    files are written but before the CAS — the window in which a
    competing commit causes this writer to lose the race and retry.

    Retention interaction (the same contract Delta documents for
    VACUUM): the retention window must exceed the longest-running
    merge. A vacuum that expires THIS writer's pinned version mid-merge
    deletes base files the attempt is reading; the loop treats that
    file-not-found exactly like a lost CAS — re-pin the (younger)
    latest manifest and retry — so the merge still converges unless it
    exhausts max_retries.

    Returns ``(committed_version, attempts)``."""
    import shutil

    spark = updates.sparkSession
    for attempt in range(max_retries + 1):
        snap = load_manifest(base_dir)
        key_col, n_buckets = snap["key_col"], snap["n_buckets"]
        expected = snap.get("columns")
        expected_types = snap.get("column_types")
        if expected is not None and sorted(updates.columns) != sorted(expected):
            raise ValueError(
                f"update batch columns {sorted(updates.columns)} do not match "
                f"table columns {sorted(expected)}; MERGE does not evolve the "
                "schema — align the batch (or re-init) first"
            )
        if expected_types is not None:
            got_types = _column_types(updates)
            drift = {
                c: (expected_types[c], got_types[c])
                for c in got_types
                if c in expected_types and got_types[c] != expected_types[c]
            }
            if drift:
                # name-only matching would let a type-drifted key column
                # re-bucket (xxhash64('5') != xxhash64(5L)) and leave TWO
                # live rows for one logical key across buckets
                raise ValueError(
                    f"update batch column types drift from the table's: "
                    f"{drift}; MERGE does not evolve the schema"
                )
        cols = [key_col, ver_col, tiebreak_col] + [
            c for c in updates.columns if c not in (key_col, ver_col, tiebreak_col)
        ]
        upd = updates.select(*cols).withColumn(
            "bucket", _bucket_of(key_col, n_buckets)
        )
        touched = sorted(
            r.bucket for r in upd.select("bucket").distinct().collect()
        )
        base_files = [
            f for b in touched for f in snap["buckets"].get(str(b), [])
        ]
        unioned = upd
        if base_files:
            base_df = spark.read.parquet(*base_files).select(*cols).withColumn(
                "bucket", _bucket_of(key_col, n_buckets)
            )
            unioned = base_df.unionByName(upd)
        w = Window.partitionBy(key_col).orderBy(
            F.col(ver_col).desc(), F.col(tiebreak_col)
        )
        # the lazy plan writes straight to staging: pinned base files
        # are IMMUTABLE under the protocol (commits only add files and
        # publish manifests; only vacuum deletes), so no checkpoint
        # barrier is needed — a materialize-then-rewrite here would
        # double the commit path's I/O for nothing
        merged = (
            unioned.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        next_version = snap["version"] + 1
        staging = os.path.join(
            base_dir, f"commit_v{next_version}_{writer_id}_a{attempt}"
        )
        try:
            merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        except Exception as ex:
            shutil.rmtree(staging, ignore_errors=True)
            msg = str(ex)
            if "FileNotFound" in msg or "does not exist" in msg:
                # a vacuum expired our pinned version mid-read (see
                # docstring): same remedy as a lost CAS — re-pin + retry
                continue
            raise
        new_files = _list_bucket_files(staging)
        buckets = dict(snap["buckets"])
        for b in touched:
            buckets[str(b)] = new_files.get(b, [])
        manifest = {
            "version": next_version,
            "n_buckets": n_buckets,
            "key_col": key_col,
            "columns": expected if expected is not None else updates.columns,
            "column_types": expected_types
            if expected_types is not None
            else _column_types(updates),
            "buckets": {k: buckets[k] for k in sorted(buckets, key=int)},
        }
        if before_commit is not None:
            before_commit(attempt)
        if _publish_manifest(base_dir, manifest):
            return next_version, attempt + 1
        # lost the CAS: a competing commit moved the version — drop this
        # attempt's unreferenced staging files (they are in NO manifest,
        # so vacuum would never reclaim them) and re-merge against the
        # winner's manifest
        shutil.rmtree(staging, ignore_errors=True)
    raise MergeConflictError(
        f"merge by {writer_id} lost the commit race {max_retries + 1} times"
    )


@register(
    "merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, 1 AS ver, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders
    ), u1 AS (
      SELECT o_orderkey, 2, o_orderstatus, o_totalprice * 2
      FROM orders WHERE o_orderkey % 5 = 0
    ), u2 AS (
      SELECT o_orderkey, 3, 'X', o_totalprice + 1000
      FROM orders WHERE o_orderkey % 7 = 0
    ), u AS (
      SELECT * FROM base UNION ALL SELECT * FROM u1 UNION ALL SELECT * FROM u2
    ), latest AS (
      SELECT k, ver, status, price,
             ROW_NUMBER() OVER (PARTITION BY k
                                ORDER BY ver DESC, status) AS rn
      FROM u
    )
    SELECT status,
           COUNT(*)              AS n_rows,
           SUM(ver)              AS sum_ver,
           ROUND(SUM(price), 2)  AS sum_price
    FROM latest
    WHERE rn = 1
    GROUP BY status
    ORDER BY status
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of the manifest MERGE: seed orders as table
    version 1, merge two sequential update batches (every 5th key gets
    ver=2 at doubled price; every 7th key gets ver=3, status 'X',
    price+1000 — keys divisible by 35 take both, latest wins), and
    aggregate the final snapshot. ``sum_ver`` is the sensitive probe:
    any row surviving at a stale version shifts it. The update
    transforms (*2, +1000) are exact in IEEE double, so no per-row
    rounding is needed and the oracle comparison stays bit-clean
    (per-row ROUND of a *1.1 product was measured to split HALF_UP vs
    DuckDB's tie behavior).

    The op also asserts the protocol invariants inline (same pattern as
    scan_snapshot_time_travel): final manifest version is 3, a reader
    pinned at v1 still sees exactly the original row count, and both
    merges committed on their first attempt (no competing writer here —
    the two-writer conflict path is exercised in
    tests/test_lakehouse.py::test_two_writer_conflict_retries)."""
    import shutil

    from .scans import _adir

    base_dir = _adir(sf_dir, "merge_upsert_table")
    # rebuild per run: init_table forbids double-init by design, and a
    # stale half-committed dir from an interrupted run must not leak in
    shutil.rmtree(base_dir, ignore_errors=True)

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("ver"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    init_table(orders, base_dir, key_col="k", n_buckets=16)

    u1 = orders.filter(F.col("k") % 5 == 0).select(
        "k", F.lit(2).alias("ver"), "status",
        (F.col("price") * 2).alias("price"),
    )
    u2 = orders.filter(F.col("k") % 7 == 0).select(
        "k", F.lit(3).alias("ver"), F.lit("X").alias("status"),
        (F.col("price") + 1000).alias("price"),
    )
    v2, tries2 = merge_upsert_manifest(
        base_dir, u1, ver_col="ver", tiebreak_col="status", writer_id="u1"
    )
    v3, tries3 = merge_upsert_manifest(
        base_dir, u2, ver_col="ver", tiebreak_col="status", writer_id="u2"
    )
    if (v2, tries2, v3, tries3) != (2, 1, 3, 1):
        raise AssertionError(
            f"sequential merges must commit v2/v3 first-try, got "
            f"{(v2, tries2, v3, tries3)}"
        )
    n_orig = orders.count()
    if read_snapshot(spark, base_dir, version=1).count() != n_orig:
        raise AssertionError("v1 snapshot torn by later merges")

    return (
        read_snapshot(spark, base_dir)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("ver").alias("sum_ver"),
            F.round(F.sum("price"), 2).alias("sum_price"),
        )
        .orderBy("status")
    )
