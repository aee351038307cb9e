"""Scale idioms as first-class, oracle-checked operators.

The fixture tables are small; these operators exist to keep the
100 TB-relevant physical techniques exercised and regression-tested:

  * partition pruning — the dominant cost lever on a date-partitioned
    lake: a filtered scan must touch only matching directories
    (PartitionFilters in the plan, asserted in tests/test_plans.py);
  * bucketed co-located joins — pre-shuffling both fact tables into the
    same bucket layout makes every subsequent join on that key
    exchange-free (the one-time shuffle is amortized across queries);
  * salted skew aggregation — two-stage aggregation over a salted key
    so one hot key spreads across reducers instead of stalling a
    single task (AQE skew handling covers joins; salting is the
    explicit idiom for pathological aggregation keys);
  * salted skew join — the big side salted, the small side replicated
    per salt value, join key widened to (key, salt): the explicit form
    that also survives when the join feeds a same-key aggregation AQE
    cannot split.

The reference has no analogue (it has no joins or aggregations at all —
SURVEY §2 Part A "not present"); these generalize its pipeline to the
scale the north-star demands.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register
from .scans import _adir


def _events_by_date(spark: SparkSession, sf_dir: str) -> str:
    """Date-partitioned copy of events (the large-scale lake layout).

    Build-once: the partitioned copy derives deterministically from the
    read-only fixture, so a completed write (_SUCCESS) is reused —
    exactly how a real lake amortizes its layout cost."""
    out = _adir(sf_dir, "events_by_date")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    return out


@register(
    "scan_partition_pruning",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           event_type,
           COUNT(*)              AS n,
           ROUND(SUM(value), 2)  AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-05'
    GROUP BY event_date, event_type
    ORDER BY event_date, event_type
    """,
)
def scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate a 3-day slice of the date-partitioned events layout.
    The date filter is satisfied by directory pruning — the scan's
    PartitionFilters carry it and only 3 partitions' files are
    listed/read, which is the difference between scanning 3 days and
    scanning 10 years."""
    out = _events_by_date(spark, sf_dir)
    part = spark.read.parquet(out).filter(
        F.col("event_date").between("2024-01-03", "2024-01-05")
    )
    return (
        part.groupBy("event_date", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("event_date", "event_type")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                    AS n,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket both join sides into the same (custkey, 8-bucket) layout,
    then join the bucketed tables: the join itself is exchange-free —
    each task reads matching buckets from both sides (verified by plan
    test: no Exchange between the bucketed scans and the join). The
    write-side shuffle happens once; every later join on the key rides
    the layout for free — the cluster answer to repeated fact⨝fact joins."""
    from .scans import _fixture_fingerprint

    # the catalog name carries the SAME fixture fingerprint as the
    # artifact path: a basename-only name would let a second sf_dir (or
    # an in-place regenerated fixture) short-circuit on tableExists and
    # serve the FIRST dataset's bucketed rows — the staleness class the
    # fingerprinted _adir exists to prevent
    base = (
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
        + "_" + _fixture_fingerprint(sf_dir)
    )
    o_tbl, c_tbl = f"orders_bkt_{base}", f"customer_bkt_{base}"
    o_path, c_path = _adir(sf_dir, "orders_bkt"), _adir(sf_dir, "customer_bkt")

    def ensure_bucketed(tbl: str, path: str, src: str, cols: list, ddl: str, key: str):
        # Build-once layout: in-session catalog entry wins; otherwise a
        # completed prior write is re-attached as an external bucketed
        # table (CLUSTERED BY must match the written layout); only a
        # missing/incomplete layout pays the one-time shuffle+write.
        if spark.catalog.tableExists(tbl):
            return
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS "
                f"LOCATION '{path}'"
            )
            return
        (
            table(spark, sf_dir, src)
            .select(*cols)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )

    ensure_bucketed(
        o_tbl,
        o_path,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE",
        "o_custkey",
    )
    ensure_bucketed(
        c_tbl,
        c_path,
        "customer",
        ["c_custkey", "c_mktsegment"],
        "c_custkey BIGINT, c_mktsegment STRING",
        "c_custkey",
    )
    o = spark.table(o_tbl)
    c = spark.table(c_tbl).filter(F.col("c_mktsegment") == "BUILDING")
    # force sort-merge: at fixture scale the filtered side fits the
    # broadcast threshold, which would hide the point — the co-located
    # SMJ with no exchange and no sort IS the artifact under test
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_skew_salted",
    oracle="""
    SELECT event_type,
           COUNT(*)              AS n,
           ROUND(SUM(value), 2)  AS total_value,
           ROUND(SUM(value) / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: stage 1 groups by (key, salt16) so a
    hot key's rows split across 16 reducers; stage 2 combines the 16
    partials per key. Identical result to the direct groupBy (the oracle
    IS the direct groupBy) — the point is the shuffle shape: no single
    reducer ever receives a whole hot key. Spark's map-side partial
    aggregation makes this redundant for built-in aggregates; the salt
    is the pattern for when it isn't (exact distinct structures,
    collect-type aggregates, pandas UDAFs)."""
    ev = table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum")
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("psum"), 2).alias("total_value"),
            F.round(F.sum("psum") / F.sum("pn"), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join — the explicit fix when one join key is hot enough to
    pin a single reducer: the big (skewed) side gets a deterministic
    uniform salt (xxhash64 of the row's line number, mod 8 — NOT
    l_linenumber % 8, whose 1..7 range never produces salt 0 and skews
    toward low values, wasting 1/8 of the replicated dim and capping a
    hot key at 7 reducers), the small side is replicated once per salt
    value (posexplode of a 0..7 sequence), and the join key becomes
    (key, salt) so the hot key's rows spread over all 8 reducers. AQE's
    skew-join split handles sort-merge cases adaptively; the salt idiom
    is the version that also survives when the join feeds a same-key
    aggregation (AQE cannot split that) — and this plan's result is
    byte-identical to the plain join, which is exactly what the oracle
    checks."""
    n_salt = 8
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)).cast("int")
    )
    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .select(
            "*", F.posexplode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("pos", "salt")
        )
        .drop("pos")
    )
    # merge hint: without it Spark broadcast-hashes the REPLICATED side
    # (1.2M rows — slow to build/broadcast, and a broadcast join is
    # exactly the case where salting is pointless); the idiom under test
    # is the shuffle join on the widened (key, salt)
    return (
        li.join(o.hint("merge"), (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scan_dynamic_partition_prune",
    oracle="""
    SELECT event_type,
           COUNT(*)             AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-07'
       OR CAST(ts AS DATE) = DATE '2024-01-14'
       OR CAST(ts AS DATE) = DATE '2024-01-21'
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scan_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact side is the
    date-partitioned events layout, the filter arrives via a JOIN to a
    small dim whose surviving keys are only known after its own filter
    runs — so no static PartitionFilter is possible. Spark plans a
    dynamicpruningexpression subquery: the dim's dates are computed
    first and broadcast INTO the fact scan's partition pruning, so only
    3 of ~30 directories are read (plan-gated in tests/test_plans.py).
    On a date-partitioned 100 TB lake joined to filtered dims, DPP is
    the difference between scanning everything and scanning the slice
    the dim selects."""
    import datetime

    out = _events_by_date(spark, sf_dir)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 7), "peak"),
            (datetime.date(2024, 1, 14), "peak"),
            (datetime.date(2024, 1, 21), "peak"),
            (datetime.date(2024, 1, 2), "quiet"),
            (datetime.date(2024, 1, 9), "quiet"),
        ],
        "d date, day_kind string",
    ).filter(F.col("day_kind") == "peak")
    return (
        fact.join(F.broadcast(dim), fact.event_date == dim.d)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("event_type")
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                                          AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 480000
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join: before shuffling the big fact side into a
    selective join, test each fact key against a Bloom filter built from
    the dim's surviving keys, so non-matching fact rows die AT THE SCAN
    instead of riding the exchange. This is the explicit form of what
    Spark's runtime row-group filters inject adaptively; written out, it
    works on any join shape and survives plan changes.

    Build: k=3 positions per dim key via xxhash64(key, seed_i) mod 2^14;
    the dim's set bits are OR-ed into a 256-word (2 KB) bitset on the
    driver — the build side is the already-filtered dim (small by
    construction; Arrow-collecting its bit positions is the same cost
    class as a broadcast-hash-join build). Probe: the word array appears
    ONLY inside the filter predicate as a single Literal — never as a
    projected column, which would memcpy the whole bitset onto every
    fact row (the first cut of this operator did exactly that: ~2 s of
    pure array copying at sf0.1). element_at + shiftright on the
    literal stay in codegen; shiftright takes its per-row shift amount
    via call_function (the Python wrapper only accepts int literals),
    and the bitset is sized so the generated filter compiles fast —
    2^16 bits measured ~3× slower on a cold first run purely from
    codegen compilation. False positives are removed by the real join
    that follows, so the result is EXACTLY the plain join's (the oracle
    is that plain join); the bloom only sheds ~(1-fpp) of non-matching
    fact rows before the exchange. At 100 TB with a 0.1%-selective dim,
    that is the difference between shuffling the whole fact table and
    shuffling ~0.1% of it — with the bitset sized ~10 bits/key, not the
    fixture's demo 2 KB.
    """
    dim = (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 480000))
        .select("o_orderkey")
    )
    fact = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    fact = bloom_prefilter(fact, "l_orderkey", dim, "o_orderkey")
    return (
        fact.join(dim.hint("merge"), fact.l_orderkey == dim.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("l_returnflag")
    )


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 14,
    seeds: tuple = (1, 2, 3),
) -> DataFrame:
    """Composable Bloom prefilter (api.bloom_prefilter): returns `fact`
    filtered to rows whose key MIGHT appear in `dim[dim_key]` (no false
    negatives; fpp set by m_bits vs dim cardinality). Build: dim's k
    bit positions Arrow-collected and OR-ed into an m_bits/64-word
    bitset; probe: codegen-side bit test against the bitset LITERAL —
    no UDF, no join, no shuffle, and the literal never becomes a
    projected column (that would memcpy it onto every row).

    Contract guards: m_bits rounds UP to the next multiple of 64 (bits
    past the last full word would otherwise either crash the build or
    NULL the probe's bit test and silently DROP matching fact rows),
    and the probe hashes the fact key CAST TO THE DIM KEY'S TYPE —
    xxhash64 is type-sensitive (int 5 and long 5 hash differently)
    while the downstream join coerces, so a type mismatch would turn
    every probe into a false negative."""
    import numpy as np

    m_bits = ((m_bits + 63) // 64) * 64
    n_words = m_bits // 64
    dim_type = dim.schema[dim_key].dataType
    fact_key_expr = F.col(fact_key)
    if fact.schema[fact_key].dataType != dim_type:
        fact_key_expr = fact_key_expr.cast(dim_type)
    pos = (
        dim.select(
            F.explode(
                F.array(*[F.pmod(F.xxhash64(dim_key, F.lit(s)), m_bits) for s in seeds])
            ).alias("p")
        )
        .toPandas()["p"]  # Arrow transfer: ~10× faster than row collect()
        .to_numpy()
    )
    w = np.zeros(n_words, dtype=np.uint64)
    np.bitwise_or.at(w, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    # view as signed: bit 63 set would overflow a JVM long otherwise
    words = [int(x) for x in w.view(np.int64)]
    bloom = F.lit(words)
    cond = None
    for s in seeds:
        p = F.pmod(F.xxhash64(fact_key_expr, F.lit(s)), m_bits)
        word = F.element_at(bloom, (p / 64).cast("int") + 1)
        bit = F.call_function("shiftright", word, (p % 64).cast("int")).bitwiseAND(F.lit(1))
        cond = (bit == 1) if cond is None else cond & (bit == 1)
    return fact.filter(cond)


_MV_SPLIT = "1998-01-01 00:00:00"  # orders before this are the stored base


def _monthly_partial(orders: DataFrame) -> DataFrame:
    """THE per-month partial aggregate (n, exact-decimal sum) — one
    definition shared by the stored MV build and the delta scan of
    agg_incremental_merge: the refresh-equals-recompute guarantee
    requires the two partials to stay bit-identical, so they must not
    be two hand-kept copies."""
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
    )




def _orders_monthly_mv(spark: SparkSession, sf_dir: str) -> str:
    """Stored base PARTIAL aggregate for agg_incremental_merge — the
    materialized view a production pipeline maintains instead of
    rescanning history: per-month (n, sum) over the closed period, kept
    as DECIMAL so the partial is exact and associative. Build-once
    behind _SUCCESS, like every derived layout here."""
    out = _adir(sf_dir, "orders_monthly_mv")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = _monthly_partial(
            table(spark, sf_dir, "orders").filter(
                F.col("o_orderdate") < F.lit(_MV_SPLIT).cast("timestamp")
            )
        )
        base.write.mode("overwrite").parquet(out)
    return out


@register(
    "agg_incremental_merge",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS total,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price
    FROM orders
    GROUP BY month ORDER BY month
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic materialized-view refresh: monthly order revenue where
    the closed history (o_orderdate < 1998-01-01) comes from a STORED
    partial aggregate (_orders_monthly_mv — per-month count + exact
    DECIMAL sum) and only the open period is scanned; the two partials
    unionAll-merge into the final view because count/sum are
    commutative monoids and avg derives from them (never averaged
    partials). The oracle is the full single-pass recompute — passing
    it IS the refresh-equals-recompute theorem, checked on values.

    Scale story: at 100 TB the closed history never rescans — the
    refresh cost is O(delta) scan (the o_orderdate >= split predicate is
    pushed to parquet; at scale the MV split would align with date
    partitions so pruning skips history outright) + a merge shuffle of
    O(months) partial rows. DECIMAL partials make the merge bit-exact
    under any partitioning or merge order — the double-typed twin would
    drift by reduction order (see agg_decimal_money).
    """
    mv = spark.read.parquet(_orders_monthly_mv(spark, sf_dir))
    delta = _monthly_partial(
        table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= F.lit(_MV_SPLIT).cast("timestamp")
        )
    )
    merged = (
        mv.select("month", "n", "s")
        .unionAll(delta.select("month", "n", "s"))
        .groupBy("month")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("s"))
    )
    return merged.select(
        "month",
        "n_orders",
        F.col("s").cast("decimal(38,2)").cast("double").alias("total"),
        F.round(F.col("s").cast("double") / F.col("n_orders"), 6).alias("avg_price"),
    ).orderBy("month")
