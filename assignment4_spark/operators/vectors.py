"""Vector/similarity-search operators (SURVEY.md §2 B.8; reference
Pinecone surface: cosine index parser_pinecone_storage.py:30-31, top-k
query ra/agent.py:108-133, upsert A13).

The engine has no vector type (SURVEY §7 risk register: resist a UDT) —
vectors are `array<float>`, widened to double before arithmetic, and all
similarity math is native higher-order expressions (zip_with+aggregate):
JVM codegen, no Python in the hot path.

Scale design:
  * brute-force k-NN is a broadcast of the QUERY side over the corpus —
    each executor scans its corpus slice once; cost O(Q×N/cores), the
    right baseline when Q is small;
  * the 100 TB path is `vec_ann_ivf_topk`: coarse-quantize the corpus to
    centroids once (narrow after a broadcast argmin), then probe only
    nprobe clusters per query — the IVF-Flat layout every vector DB uses,
    expressed as two broadcast joins + a partition-pruned scan;
  * upsert = latest-version-wins window, the MERGE shape (A13 replaces
    Pinecone upsert; SURVEY Appendix A.4 replaces wall-clock ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io_util import table
from ..registry import register
from ..schemas import FIXTURE_EMBED_DIM


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b) -> Column:
    """cos(a,b) over double arrays via zip_with+aggregate (no UDF).

    Zero-norm input → NULL, not an error: cosine against the zero vector
    is undefined (the reference's [0]*1536 enumeration probe, A16 /
    ra/agent.py:72, leans on Pinecone's arbitrary behavior here — SURVEY
    Appendix A.6 pins NULL instead), and under ANSI mode (Spark 4
    default) a bare division would throw DIVIDE_BY_ZERO."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    denom = na * nb
    return F.when(denom != 0.0, dot / denom)


@register(
    "vec_cosine_similarity",
    oracle="""
    SELECT e.vec_id,
           ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
             AS cos_sim
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY e.vec_id
    """,
)
def vec_cosine_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector against the vec_id=0 query vector — the
    reference's rag_search scoring (A18) with the scan brought in-engine.
    The single-row query side is broadcast; corpus is scanned once."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(as_double("embedding"), as_double("q_embedding")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy("vec_id")
    )


def knn_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query over any corpus DataFrame.

    Query side is broadcast (queries ≪ corpus — the reference's shape:
    one query, top_k=100, ra/agent.py:117), so the corpus is scanned
    exactly once with no shuffle of corpus rows; per-query ranking is a
    window with an id tie-break, pruned by WindowGroupLimit before the
    shuffle. Returns (query_id, neighbor_id, sim_r, rank ≤ k)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_emb_col).alias("q_embedding"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(as_double(emb_col), as_double("q_embedding")).alias("sim"),
        )
    )
    # rank on the 6-dp-ROUNDED sim (id tie-break): engines accumulate
    # the dot product in different orders, so raw-double ranking can
    # flip ulp-close neighbors (the rag_rrf_fusion idiom); also keeps
    # the rank consistent with the displayed sim_r
    w = W.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("sim_r"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


@register(
    "vec_knn_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim_r,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(sim, 6) DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, sim_r, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def vec_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 neighbors for 5 query vectors (reference top_k=100,
    ra/agent.py:117; fixture k=10 per FIXTURES §3) — registered face of
    knn_topk."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return knn_topk(e, q, k=10)


@register(
    "vec_upsert_dedup",
    oracle="""
    WITH v(vec_id, ver, payload) AS (VALUES
      (1, 1, 'a1'), (1, 2, 'a2'), (1, 3, 'a3'),
      (2, 1, 'b1'), (2, 2, 'b2'),
      (3, 7, 'c7'),
      (4, 1, 'd1'), (4, 1, 'd1-dup')
    )
    SELECT vec_id, ver, payload
    FROM (SELECT vec_id, ver, payload,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY ver DESC, payload) AS rn
          FROM v)
    WHERE rn = 1
    ORDER BY vec_id
    """,
)
def vec_upsert_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert semantics: latest version per vec_id wins (ties broken on
    payload for determinism) — true idempotent upsert replacing the
    reference's wall-clock-salted always-insert (A11/A13, SURVEY
    Appendix A.4). On a table format this is MERGE; engine form is the
    dedup window over the union of base+updates."""
    # SQL VALUES, not createDataFrame: a literal inline relation plans
    # as LocalRelation with no Python→JVM round-trip (~3 s saved per call)
    v = spark.sql(
        """
        SELECT * FROM VALUES
          (1, 1, 'a1'), (1, 2, 'a2'), (1, 3, 'a3'),
          (2, 1, 'b1'), (2, 2, 'b2'),
          (3, 7, 'c7'),
          (4, 1, 'd1'), (4, 1, 'd1-dup')
        AS v(vec_id, ver, payload)
        """
    )
    w = W.partitionBy("vec_id").orderBy(F.col("ver").desc(), F.col("payload"))
    return (
        v.select("vec_id", "ver", "payload", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "ver", "payload")
        .orderBy("vec_id")
    )


def upsert_merge_parquet(
    target_path: str,
    updates: DataFrame,
    key_col: str,
    ver_col: str,
    tiebreak_col: str,
    n_buckets: int = 16,
) -> None:
    """Write-side MERGE (upsert) onto a bucket-partitioned parquet
    target — the pre-ACID warehouse pattern this sandbox's plain-parquet
    catalog supports (no Delta/Iceberg here; Spark's MERGE INTO needs a
    row-level-operation v2 table and fails with UNSUPPORTED_FEATURE on
    parquet — probed, not assumed). On a lakehouse table the call site
    swaps this for `MERGE INTO t USING u ON t.key = u.key WHEN MATCHED
    UPDATE SET * WHEN NOT MATCHED INSERT *`; semantics here are
    identical: latest (ver, tiebreak) per key wins.

    Scale shape: the target is partitioned by pmod(xxhash64(key),
    n_buckets); the merge (1) computes the update batch's touched
    buckets, (2) reads ONLY those partitions back (partition-pruned
    scan — at 100 TB the unmatched 99% of the table is never read or
    written), (3) latest-wins windows base∪updates, and (4) rewrites
    just the touched partitions via dynamic partition overwrite. The
    merged frame is localCheckpoint()ed before the write because a
    path cannot be overwritten while its files are still in the read
    lineage — a staging-dir swap (or the ACID format) lifts that at
    real scale."""
    spark = updates.sparkSession
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    upd = updates.withColumn("bucket", bucket)
    touched = [r.bucket for r in upd.select("bucket").distinct().collect()]
    base = spark.read.parquet(target_path).filter(F.col("bucket").isin(touched))
    w = W.partitionBy(key_col).orderBy(
        F.col(ver_col).desc(), F.col(tiebreak_col)
    )
    merged = (
        base.unionByName(upd)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(target_path)
    )


@register(
    "vec_upsert_merge",
    oracle="""
    WITH base(vec_id, ver, payload) AS (VALUES
      (1, 1, 'a1'), (2, 1, 'b1'), (3, 7, 'c7'), (4, 1, 'd1')
    ), upd(vec_id, ver, payload) AS (VALUES
      (1, 3, 'a3'), (2, 2, 'b2'), (4, 1, 'd1-dup'), (5, 1, 'e1')
    ), u AS (
      SELECT * FROM base UNION ALL SELECT * FROM upd
    )
    SELECT vec_id, ver, payload
    FROM (SELECT vec_id, ver, payload,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY ver DESC, payload) AS rn
          FROM u)
    WHERE rn = 1
    ORDER BY vec_id
    """,
)
def vec_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13's upsert on the WRITE path (vec_upsert_dedup is the read-side
    emulation): seed a bucket-partitioned parquet target with the base
    batch, merge an update batch through upsert_merge_parquet (partition-
    pruned read + dynamic-partition-overwrite write — only buckets
    containing updated keys are rewritten; the untouched-bucket
    invariant is asserted file-level in tests/test_api.py), and return
    the post-merge table. Oracle = the same latest-wins window over
    base ∪ updates."""
    from .scans import _adir

    out = _adir(sf_dir, "upsert_merge_target")
    base = spark.sql(
        """
        SELECT * FROM VALUES
          (1, 1, 'a1'), (2, 1, 'b1'), (3, 7, 'c7'), (4, 1, 'd1')
        AS v(vec_id, ver, payload)
        """
    )
    n_buckets = 4
    base.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_buckets))
    ).write.mode("overwrite").partitionBy("bucket").parquet(out)
    updates = spark.sql(
        """
        SELECT * FROM VALUES
          (1, 3, 'a3'), (2, 2, 'b2'), (4, 1, 'd1-dup'), (5, 1, 'e1')
        AS v(vec_id, ver, payload)
        """
    )
    upsert_merge_parquet(
        out, updates, key_col="vec_id", ver_col="ver", tiebreak_col="payload",
        n_buckets=n_buckets,
    )
    return (
        spark.read.parquet(out)
        .select("vec_id", "ver", "payload")
        .orderBy("vec_id")
    )


@register(
    "dedup_near_embedding",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
          >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def dedup_near_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4, chosen from
    the fixture similarity distribution — max pairwise cos ≈ 0.51) —
    registered face of near_dup_pairs_exact (distributed block-pair
    scan, no driver materialization). The approximate production path
    is near_dup_pairs_lsh (bucketed candidates, recall-tested)."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return near_dup_pairs_exact(e, threshold=0.4)


def near_dup_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """EXACT cosine near-dup pairs via a distributed block-pair matmul —
    O(N²) compute (inherent to exactness) but fully cluster-parallel and
    driver-free: nothing is collect()ed or broadcast.

    Shape: hash every vector into one of n_blocks blocks, enumerate the
    n_blocks·(n_blocks+1)/2 unordered block pairs as a literal relation,
    route each block to the pairs it participates in (two broadcast-hash
    joins — replication factor ~n_blocks/2 per side), then cogrouped
    applyInPandas runs one BLAS matmul per block pair. Each task holds
    2·N/n_blocks vectors, so n_blocks tunes task memory independently of
    N — at 100 TB you'd size n_blocks ≈ N·d·8 / executor_mem and get
    ~n_blocks²/2 evenly-sized tasks. The earlier form collect()ed the
    corpus to the driver; this keeps the same float64 BLAS arithmetic
    (deterministic, oracle-exact) with no driver bottleneck."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pair_rows = ", ".join(
        f"({i * n_blocks + j}, {i}, {j})"
        for i in range(n_blocks)
        for j in range(i, n_blocks)
    )

    def side(which: str) -> DataFrame:
        # each side built from its OWN scan + VALUES instance: cogroup's
        # self-join disambiguation rejects two inputs with shared lineage
        v = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(emb_col).alias("embedding"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
        )
        pairs = spark.sql(f"SELECT * FROM VALUES {pair_rows} AS p(pair_id, pa, pb)")
        return v.join(F.broadcast(pairs), v.blk == pairs[which]).select(
            "pair_id", "vec_id", "embedding"
        )

    a_side, b_side = side("pa"), side("pb")

    def score(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": np.int64, "vec_b": np.int64, "cos_sim": np.float64}
            )
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.array(list(left["embedding"]), dtype=np.float64)
        b_mat = np.array(list(right["embedding"]), dtype=np.float64)
        # zero-norm guard: a zero vector has no direction — it matches
        # nothing (norm→inf makes its sims 0, below any threshold>0)
        # instead of emitting NaN rows that silently vanish from the
        # >= compare while DuckDB's NaN sorts above every threshold
        a_n = np.linalg.norm(a_mat, axis=1, keepdims=True)
        b_n = np.linalg.norm(b_mat, axis=1, keepdims=True)
        a_mat /= np.where(a_n == 0.0, np.inf, a_n)
        b_mat /= np.where(b_n == 0.0, np.inf, b_n)
        # round-before-compare (the file-wide determinism rule): the
        # membership decision uses the same 6-dp value both engines
        # emit, so a pair 1 ulp either side of the threshold cannot
        # flip between Spark's BLAS accumulation order and DuckDB's
        sims = np.round(a_mat @ b_mat.T, 6)
        diagonal = key[0] % (n_blocks + 1) == 0  # pair_id = i·n+j, diag ⇔ i == j
        if diagonal:
            # left == right here: id order picks each unordered pair once
            keep = (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
        else:
            # distinct blocks meet in exactly ONE block pair — keep all
            # matches, normalize id order on output
            keep = sims >= threshold
        ai, bj = np.nonzero(keep)
        lo, hi = a_ids[ai], b_ids[bj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(lo, hi),
                "vec_b": np.maximum(lo, hi),
                "cos_sim": sims[ai, bj],
            }
        )

    return (
        a_side.groupBy("pair_id")
        .cogroup(b_side.groupBy("pair_id"))
        .applyInPandas(score, "vec_a bigint, vec_b bigint, cos_sim double")
        .orderBy("vec_a", "vec_b")
    )



def _centroid_list(emb: DataFrame, n: int = 8) -> DataFrame:
    """One-row broadcastable centroid table: sorted (cid, cemb) structs
    of the first ``n`` vectors — the shared E-step input of the four
    centroid-argmax consumers (kmeans assign, semantic cluster, IVF-PQ,
    IVF build stats)."""
    return (
        emb.filter(F.col("vec_id") < n)
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
                )
            ).alias("cents")
        )
    )


def _centroid_argmax(emb_col: str = "emb"):
    """Row-local nearest-centroid argmax over the broadcast ``cents``
    array: element [0] of array_sort(transform(...)) is the winner.
    ONE definition of the determinism rules — cosine rounded to 6 dp
    BEFORE the argmax (cross-engine tie safety), NULL sims (zero-norm
    guard in cosine()) sorted last via the +inf sentinel, centroid_id
    as the tie-break — shared so the four consumers cannot drift."""
    return F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                F.coalesce(
                    -F.round(cosine(F.col(emb_col), c["cemb"]), 6),
                    F.lit(float("inf")),
                ).alias("negsim"),
                c["cid"].alias("cid"),
            ),
        )
    )


def near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 10,
    n_bits: int = 5,
) -> DataFrame:
    """APPROXIMATE cosine near-dup pairs — the production path past the
    exact scan's O(N²) wall: random-hyperplane LSH buckets (same
    signature family as _rp_lsh_topk) generate candidates, and only
    bucket-cohabiting pairs get the exact JVM cosine re-score. Compute
    is Σ_bucket |bucket|² ≪ N² whenever buckets are balanced; recall at
    cos=θ is 1-(1-p^n_bits)^n_tables with p = 1-acos(θ)/π (recall floor
    vs near_dup_pairs_exact asserted in tests/test_rag_ops.py). The only
    shuffle is the bucket self-join; no driver materialization beyond
    one head() to infer the embedding dimensionality."""
    v = df.select(F.col(id_col).alias(id_col), F.col(emb_col).alias(emb_col))
    # lazy localCheckpoint: the self-join consumes keys TWICE, and
    # without the cut each side re-runs the Python/Arrow sign-matmul
    # AND the corpus scan under it — the same multi-consumer
    # re-execution vec_centroid_outliers documents; the bucketize stage
    # is the expensive one here, so materializing it once halves it
    keys = rp_bucket_keys(v, id_col, emb_col, n_tables, n_bits).localCheckpoint(
        eager=False
    )
    cand = (
        keys.alias("x")
        .join(keys.alias("y"), ["table_id", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("vec_a"), F.col(f"y.{id_col}").alias("vec_b")
        )
        .distinct()
    )
    ea = v.select(F.col(id_col).alias("vec_a"), F.col(emb_col).alias("emb_a"))
    eb = v.select(F.col(id_col).alias("vec_b"), F.col(emb_col).alias("emb_b"))
    sim = cosine(as_double("emb_a"), as_double("emb_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        # round-before-compare, same rule as near_dup_pairs_exact
        .filter(F.round(sim, 6) >= threshold)
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


def _rp_planes(n_tables: int, n_bits: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplanes: sha256-seeded uniform
    [-1,1) components (no RNG state, no PYTHONHASHSEED dependence —
    FIXTURES §5 determinism rule), shaped (tables·bits, dim)."""
    import hashlib

    import numpy as np

    planes = np.empty((n_tables * n_bits, dim), dtype=np.float64)
    for p in range(n_tables * n_bits):
        for j in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"rp_{p}_{j}".encode()).digest()[:8], "big"
            )
            planes[p, j] = (h % 2000001) / 1000000.0 - 1.0
    return planes


def rp_bucket_keys(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    n_tables: int,
    n_bits: int,
    dim: int | None = None,
) -> DataFrame:
    """(id, table_id, bucket) random-hyperplane LSH keys — the ONE
    signature implementation shared by the ANN query path
    (_rp_lsh_topk) and the near-dup pair path (near_dup_pairs_lsh), so
    the bucket algebra cannot drift between them. One numpy sign-matmul
    per Arrow batch; each vector emits n_tables keys. `dim` is inferred
    from the data with a single head() when not given."""
    import numpy as np
    import pandas as pd

    if dim is None:
        row = df.select(F.size(emb_col)).head()
        dim = int(row[0]) if row and row[0] is not None else 1
    planes = _rp_planes(n_tables, n_bits, dim)
    bc = df.sparkSession.sparkContext.broadcast(planes)

    def bucketize(batches):
        pl = bc.value
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        for pdf in batches:
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            bits = (mat @ pl.T) > 0  # (batch, tables·bits)
            for t in range(n_tables):
                seg = bits[:, t * n_bits : (t + 1) * n_bits]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "table_id": t,
                        "bucket": (seg * weights).sum(axis=1),
                    }
                )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, emb_col).mapInPandas(
        bucketize, f"{id_col} {id_type}, table_id int, bucket long"
    )


def _rp_lsh_topk(spark: SparkSession, sf_dir: str, n_probes: int = 1) -> DataFrame:
    """Shared RP-LSH pipeline; n_probes=1 is classic LSH, n_probes>1 is
    multi-probe (query also searches the buckets at Hamming distance 1 —
    flip one sign bit per probe). See the registered ops' docstrings."""
    N_TABLES, N_BITS, DIM = 10, 5, FIXTURE_EMBED_DIM
    e = table(spark, sf_dir, "embeddings")
    keys = rp_bucket_keys(
        e.select("vec_id", "embedding"), "vec_id", "embedding", N_TABLES, N_BITS,
        dim=DIM,
    )
    q_ids = (F.col("vec_id") >= 100) & (F.col("vec_id") < 105)
    q_keys = keys.filter(q_ids).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    if n_probes > 1:
        # Multi-probe: expand the QUERY side only — the corpus keeps one
        # key per table, so index size is unchanged; each extra probe is
        # the bucket with one sign bit flipped (Hamming-1 neighbors are
        # where a near-miss lands). Candidates are a strict superset of
        # the single-probe set → recall is monotonically ≥.
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b))
                for b in range(min(n_probes - 1, N_BITS))
            ],
        )
        q_keys = q_keys.select(
            "query_id", "table_id", F.explode(probes).alias("bucket")
        )
    cand = (
        keys.join(F.broadcast(q_keys), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qe = e.filter(q_ids).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(as_double("q_emb"), as_double("n_emb")).alias("sim"),
        )
    )
    # rank on the 6-dp-ROUNDED sim (id tie-break): engines accumulate
    # the dot product in different orders, so raw-double ranking can
    # flip ulp-close neighbors (the rag_rrf_fusion idiom); also keeps
    # the rank consistent with the displayed sim_r
    w = W.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("sim_r"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


@register("vec_ann_rp_lsh_topk")  # engine-defined hashing → rows-only; recall unit-tested
def vec_ann_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN via random-hyperplane (SimHash-for-cosine) LSH —
    the second scale path next to IVF (vec_ann_ivf_topk):

      1. signature: sign bits of the embedding against 10 tables × 5
         deterministic hyperplanes, computed as one numpy matmul per
         Arrow batch (mapInPandas — the per-plane higher-order
         formulation would re-walk the array per bit, the B.8 pitfall);
      2. bucket: each vector lands in 10 (table_id, 5-bit bucket) keys —
         explode → the bucket join is the ONLY shuffle;
      3. candidates within shared buckets are exact-cosine re-ranked
         per query, top-5.

    P(bit match) = 1 - acos(cos θ)/π; the fixture's uniform-random
    embeddings are LSH-adversarial (top-neighbor cos only ≈ 0.4), so
    10×5 trades selectivity for recall ≈ 0.4-0.6 at ~30% of the corpus
    scanned per query (floor asserted in tests/test_rag_ops.py::
    test_rp_lsh_ann_recall_vs_exact — the SURVEY §5.2.6 pin for this
    rows-only op). Clustered real-world
    embeddings sit at higher cos where the same parameters both recall
    more and scan less. Reference provenance: the Pinecone-delegated
    ANN search (A18) brought in-engine."""
    return _rp_lsh_topk(spark, sf_dir, n_probes=1)


@register("vec_ann_rp_lsh_multiprobe")  # engine-defined hashing → rows-only
def vec_ann_rp_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe RP-LSH (Lv et al., VLDB'07): each query additionally
    probes every Hamming-1 bucket in each table (6 probes × 10 tables),
    recovering the near-misses where ONE sign bit flipped. Same index
    (corpus keys unchanged — this is the point: recall of ~2× the tables
    without 2× the index size or build shuffle); only the broadcast query
    key-set grows 6×. Candidates are a strict superset of the
    single-probe op's, so recall is provably ≥ (SURVEY §5.2.6 pin:
    tests/test_rag_ops.py::test_rp_lsh_multiprobe_dominates_single_probe)."""
    return _rp_lsh_topk(spark, sf_dir, n_probes=6)


@register("vec_ann_ivf_topk")  # engine-defined clustering → rows-only; recall unit-tested
def vec_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN, IVF-Flat layout — the 100 TB similarity-search
    path:

      1. coarse centroids: vectors with vec_id < 8 act as the codebook
         (a real deployment k-means them; deterministic seed vectors keep
         the fixture reproducible);
      2. assignment: every corpus vector → nearest centroid (broadcast
         argmin, narrow map over the corpus — this is the partitioning
         key you'd write the corpus out by);
      3. probe: each query searches only its nprobe=3 nearest clusters —
         ~N·nprobe/K distance computations instead of N.

    Returns (query_id, neighbor_id, sim_r, rank ≤ 5). SURVEY §5.2.6
    pin: recall vs the exact scan asserted in
    tests/test_rag_ops.py::test_ivf_ann_recall_vs_exact."""
    e = table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )

    def assign(df: DataFrame, id_col: str, emb_col: str, keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).select(
            id_col,
            emb_col,
            "centroid_id",
            cosine(as_double(emb_col), as_double("c_emb")).alias("c_sim"),
        )
        w = W.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
        return scored.select(
            id_col, emb_col, "centroid_id", F.row_number().over(w).alias("c_rank")
        ).filter(F.col("c_rank") <= keep)

    corpus = assign(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")),
        "neighbor_id",
        "n_emb",
        keep=1,
    )
    queries = assign(
        e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        ),
        "query_id",
        "q_emb",
        keep=3,  # nprobe (fixture embeddings are uniform-random, i.e. barely
        # clusterable — recall scales ~linearly with nprobe/K there; real
        # corpora cluster and get the usual IVF recall curve)
    )
    scored = (
        queries.join(corpus, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(as_double("q_emb"), as_double("n_emb")).alias("sim"),
        )
    )
    # rank on the 6-dp-ROUNDED sim (id tie-break): engines accumulate
    # the dot product in different orders, so raw-double ranking can
    # flip ulp-close neighbors (the rag_rrf_fusion idiom); also keeps
    # the rank consistent with the displayed sim_r
    w = W.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("sim_r"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


@register(
    "vec_kmeans_assign",
    oracle="""
    WITH c AS (SELECT vec_id AS centroid_id, embedding AS cemb
               FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.centroid_id,
                    ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], c.cemb::DOUBLE[]), 6)
                      AS sim
             FROM embeddings e CROSS JOIN c),
    assigned AS (SELECT *,
                        ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY sim DESC NULLS LAST, centroid_id) AS rn
                 FROM sims)
    SELECT centroid_id,
           COUNT(*) AS n_members,
           ROUND(AVG(sim), 6) AS avg_sim
    FROM assigned
    WHERE rn = 1
    GROUP BY centroid_id
    ORDER BY centroid_id
    """,
)
def vec_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step (the E-step every iterative clustering
    / IVF index build runs): nearest-of-8 fixed centroids by cosine,
    then per-cluster size + mean similarity. Centroids collapse to ONE
    broadcast array row and the argmax-of-8 happens inside the row
    (transform → array_sort on (−sim, centroid_id) structs), so the
    corpus is scanned once and NEVER expands or shuffles — the earlier
    form exploded 8× rows through a per-vec_id window sort, an entire
    exchange of corpus×k rows that an argmax doesn't need. That
    row-local E-step is what makes the iteration viable over 100 TB of
    vectors (the M-step is a tiny groupBy(centroid) average). Ties
    broken by centroid_id; sims rounded to 6 dp BEFORE the argmax so
    both engines break identically; NULL sims (zero-norm guard in
    cosine()) sort last via a +inf sentinel, matching desc_nulls_last."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = _centroid_list(emb)
    ranked = _centroid_argmax()
    best = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", ranked[0].alias("b"))
        .select(
            "vec_id",
            F.col("b.cid").alias("centroid_id"),
            F.when(F.col("b.negsim") != float("inf"), -F.col("b.negsim")).alias("sim"),
        )
    )
    return (
        best.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_members"), F.round(F.avg("sim"), 6).alias("avg_sim"))
        .orderBy("centroid_id")
    )


@register("vec_mmr_rerank")  # iterative greedy selection → rows-only; unit-tested
def vec_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (maximal marginal relevance, Carbonell & Goldstein '98)
    diversity re-rank — the step a real retrieval stack runs AFTER
    top-k: from each query's top-20 cosine candidates, greedily pick 5
    maximizing λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s), λ=0.7.

    Spark shape: the candidate generation is the existing broadcast
    top-k (corpus scanned once, no corpus shuffle); the greedy loop —
    inherently sequential but over only k=20 rows — runs per query
    group in applyInPandas, so queries parallelize across the cluster
    while each tiny greedy problem stays in one Arrow batch. Ties
    broken by neighbor_id; float64 throughout → deterministic.

    Generalizes A18 (ra/agent.py:108-133): the reference returns raw
    Pinecone rank order; MMR is what production RAG uses to stop the
    context window filling with near-duplicate chunks. SURVEY §5.2.6
    pin: greedy-invariant properties (first pick = top cosine, picked
    set diversity, determinism) asserted in
    tests/test_rag_ops.py::test_mmr_rerank_properties."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    cands = knn_topk(emb, queries, k=20)
    # attach candidate embeddings for the pairwise-redundancy term
    cand_emb = cands.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"), "neighbor_id"
    )

    out_schema = "query_id bigint, neighbor_id bigint, mmr_rank int, mmr_score double"

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        lam, k = 0.7, 5
        pdf = pdf.sort_values(["rank"]).reset_index(drop=True)
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms
        pair = unit @ unit.T  # candidate×candidate cosine
        rel = pdf["sim_r"].to_numpy(dtype=np.float64)
        picked: list = []
        avail = list(range(len(pdf)))
        scores = []
        while avail and len(picked) < k:
            if picked:
                redundancy = pair[np.ix_(avail, picked)].max(axis=1)
            else:
                redundancy = np.zeros(len(avail))
            mmr_score = lam * rel[avail] - (1 - lam) * redundancy
            # argmax with neighbor_id tie-break (stable: avail is id-ordered by rank)
            best_pos = int(np.argmax(mmr_score))
            scores.append(float(mmr_score[best_pos]))
            picked.append(avail.pop(best_pos))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[picked].to_numpy(),
                "neighbor_id": pdf["neighbor_id"].iloc[picked].to_numpy(),
                "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
                "mmr_score": np.round(np.asarray(scores), 6),
            }
        )

    return (
        cand_emb.groupBy("query_id")
        .applyInPandas(mmr, out_schema)
        .orderBy("query_id", "mmr_rank")
    )


@register("vec_kmeans_train")  # iterative float averaging → rows-only; unit-tested
def vec_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full spherical k-means training (Lloyd's, k=8, 3 iterations, cosine)
    — the codebook-build step that turns vec_ann_ivf_topk's fixed seed
    centroids into a real IVF index (vec_kmeans_assign is one E-step of
    exactly this loop).

    Scale shape, per iteration:
      * E-step: centroids (k×dim, tiny) broadcast; every corpus vector
        scores k cosines NARROW and keeps its argmax — the corpus never
        shuffles for assignment;
      * M-step: per-dimension means via posexplode(embedding) →
        groupBy(centroid, pos) partial-avg — map-side combinable, so the
        shuffle is k×dim partial aggregates per executor, not the
        corpus; the k×dim result is re-assembled into unit-normalized
        array centroids (spherical k-means keeps cosine and dot product
        equivalent) and localCheckpoint()ed — 8 rows — so the lineage
        does not grow with iterations (same driver-loop discipline as
        dedup_connected_components).
    Empty clusters keep their previous centroid (coalesce on the left
    join), the standard Lloyd fallback. Ties in the argmax break by
    centroid_id with sims pre-rounded to 6 dp, so the trajectory is
    deterministic run-to-run. Output: per-cluster size + mean cosine.
    SURVEY §5.2.6 pin: monotone non-decreasing mean similarity over
    iterations asserted in
    tests/test_rag_ops.py::test_kmeans_train_improves_on_seed_assignment.
    Provenance: north-star "IVF build";
    generalizes A18's externally-built ANN index to an in-engine build.
    """
    k, n_iter = 8, 3
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cemb")
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        sims = emb.crossJoin(F.broadcast(cent_df)).select(
            "vec_id",
            "emb",
            "centroid_id",
            F.round(cosine(F.col("emb"), F.col("cemb")), 6).alias("sim"),
        )
        w = W.partitionBy("vec_id").orderBy(
            F.col("sim").desc_nulls_last(), F.col("centroid_id")
        )
        return (
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    for _ in range(n_iter):
        assigned = assign(cent)
        dim_means = (
            assigned.select(
                "centroid_id", F.posexplode("emb").alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
        )
        new_cent = dim_means.groupBy("centroid_id").agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        raw = F.transform(F.col("pm"), lambda s: s["m"])
        norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
        # zero-norm guard (ANSI mode raises DIVIDE_BY_ZERO): a cluster
        # whose per-dim means cancel exactly keeps its raw zero vector
        # rather than killing the round — same rule cosine() applies
        new_cent = new_cent.select(
            "centroid_id",
            F.when(norm != 0.0, F.transform(raw, lambda x: x / norm))
            .otherwise(raw)
            .alias("new_cemb"),
        )
        cent = (
            cent.join(new_cent, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new_cemb"), F.col("cemb")).alias("cemb"),
            )
            .localCheckpoint(eager=True)
        )

    return (
        assign(cent)
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("sim"), 6).alias("avg_sim"),
        )
        .orderBy("centroid_id")
    )


@register(
    "vec_quantize_int8",
    oracle="""
    WITH scaled AS (
        SELECT vec_id,
               len(embedding) AS n_dims,
               127.0 / CAST(list_max(list_transform(embedding, x -> abs(x)))
                            AS DOUBLE) AS scale,
               embedding
        FROM embeddings
        WHERE list_max(list_transform(embedding, x -> abs(x))) > 0
    )
    SELECT vec_id,
           CAST(n_dims AS INTEGER) AS n_dims,
           ROUND(scale, 6)         AS scale_r,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale) AS BIGINT))) AS BIGINT)
             AS q_sum,
           ROUND(list_max(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE)
                         - FLOOR(CAST(x AS DOUBLE) * scale) / scale))), 6)
             AS max_abs_err
    FROM scaled
    ORDER BY vec_id
    """,
)
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    4× storage/bandwidth cut every large ANN deployment takes before
    indexing (FAISS SQ8, Milvus/pgvector int8). Per vector: scale =
    127/max|x|, q_i = floor(x_i·scale) ∈ [-128,127]; emitted here as
    the per-vector audit (dims, scale, quantized checksum, max
    dequantization error) rather than 60k-wide rows.

    Everything is float→double IEEE arithmetic (identical on JVM and
    DuckDB) plus FLOOR — so the oracle pins exact values, not bands.
    Plan: one narrow projection over the parquet scan, no shuffle, no
    UDF — transform/aggregate higher-order functions stay codegen'd;
    at 100 TB this runs at scan speed and the quantized vectors would
    be written back columnar (int8 array = 1/4 the bytes).

    Zero vectors (max|x| = 0) are excluded on both sides: scale is
    undefined (the serving-layer convention is to store them unscaled).
    """
    e = table(spark, sf_dir, "embeddings")
    return quantize_int8_audit(e, id_col="vec_id", vec_col="embedding").orderBy("vec_id")


def quantize_int8_audit(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Composable int8 symmetric quantization audit (api.quantize_int8_audit):
    per vector — dims, 6-dp scale (127/max|x|), quantized-value checksum,
    max dequantization error. Zero vectors are excluded (scale undefined).
    Pure codegen projection: no shuffle, no UDF."""
    absmax = F.array_max(F.transform(vec_col, lambda x: F.abs(x)))
    scaled = df.filter(absmax > 0).select(
        id_col,
        F.size(vec_col).alias("n_dims"),
        (F.lit(127.0) / absmax.cast("double")).alias("scale"),
        vec_col,
    )
    x = lambda v: v.cast("double")  # noqa: E731
    q = lambda v: F.floor(x(v) * F.col("scale"))  # noqa: E731
    return scaled.select(
        id_col,
        "n_dims",
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.aggregate(
            vec_col, F.lit(0).cast("bigint"), lambda acc, v: acc + q(v).cast("bigint")
        ).alias("q_sum"),
        F.round(
            F.array_max(F.transform(vec_col, lambda v: F.abs(x(v) - q(v) / F.col("scale")))),
            6,
        ).alias("max_abs_err"),
    )


@register(
    "dedup_semantic_cluster",
    oracle="""
    WITH c AS (SELECT vec_id AS centroid_id, embedding AS cemb
               FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.centroid_id,
                    ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], c.cemb::DOUBLE[]), 6)
                      AS sim
             FROM embeddings e CROSS JOIN c),
    assigned AS (SELECT vec_id, centroid_id
                 FROM (SELECT *,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                                 ORDER BY sim DESC NULLS LAST,
                                                          centroid_id) AS rn
                       FROM sims)
                 WHERE rn = 1),
    pairs AS (SELECT aa.centroid_id, aa.vec_id AS vec_a, bb.vec_id AS vec_b
              FROM assigned aa
              JOIN assigned bb
                ON aa.centroid_id = bb.centroid_id AND aa.vec_id < bb.vec_id
              JOIN embeddings ea ON ea.vec_id = aa.vec_id
              JOIN embeddings eb ON eb.vec_id = bb.vec_id
              WHERE ROUND(LIST_COSINE_SIMILARITY(ea.embedding::DOUBLE[],
                                           eb.embedding::DOUBLE[]), 6) >= 0.4),
    dropped AS (SELECT centroid_id, COUNT(DISTINCT vec_b) AS n_dropped
                FROM pairs GROUP BY centroid_id)
    SELECT a.centroid_id,
           COUNT(*) AS n_members,
           COALESCE(MAX(d.n_dropped), 0) AS n_dropped,
           COUNT(*) - COALESCE(MAX(d.n_dropped), 0) AS n_kept
    FROM assigned a LEFT JOIN dropped d ON d.centroid_id = a.centroid_id
    GROUP BY a.centroid_id
    ORDER BY a.centroid_id
    """,
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    search for semantic duplicates ONLY within each cluster — the
    clustering is what turns the O(N²) all-pairs scan into a sum of
    per-cluster quadratics with bounded cluster size. Per cluster:
    member count, how many members are semantic duplicates of an
    earlier member (cos ≥ 0.4 — the near_dup_pairs_exact threshold),
    and the surviving count.

    Shape: the 8-centroid assignment is the row-local broadcast argmax
    of vec_kmeans_assign (corpus scanned once, never expands); the
    within-cluster pair join shuffles on centroid_id, so each task's
    candidate set is one cluster — at 100 TB you raise k so clusters
    stay task-sized (SemDeDup used k=50k over 5B embeddings) and the
    per-cluster matmul runs through near_dup_pairs_exact's block-pair
    kernel instead of an expression join. Keep-rule: lowest vec_id per
    duplicate group survives (first-occurrence convention,
    dedup_first_occurrence).
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = _centroid_list(emb)
    ranked = _centroid_argmax()
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "emb", ranked[0]["cid"].alias("centroid_id"))
    )
    a = assigned.select(
        F.col("centroid_id"), F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a")
    )
    b = assigned.select(
        F.col("centroid_id").alias("c_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
    )
    pairs = a.join(
        b, (a.centroid_id == b.c_b) & (a.vec_a < b.vec_b)
    ).filter(F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6) >= 0.4)
    dropped = pairs.groupBy("centroid_id").agg(
        F.countDistinct("vec_b").alias("n_dropped")
    )
    members = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.join(dropped, "centroid_id", "left")
        .select(
            "centroid_id",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
        )
        .orderBy("centroid_id")
    )


_PQ_M = 4       # subspaces
_PQ_SUB = 16    # dims per subspace (64-dim fixture vectors)
_PQ_K = 16      # codebook entries per subspace


@register(
    "vec_pq_quantize",
    oracle=f"""
    WITH cb AS (SELECT vec_id AS cid, embedding FROM embeddings
                WHERE vec_id < {_PQ_K}),
    sub AS (SELECT e.vec_id, cb.cid, j.j,
                   ROUND(LIST_DISTANCE(
                     (e.embedding[j.j*{_PQ_SUB}+1 : j.j*{_PQ_SUB}+{_PQ_SUB}])::DOUBLE[],
                     (cb.embedding[j.j*{_PQ_SUB}+1 : j.j*{_PQ_SUB}+{_PQ_SUB}])::DOUBLE[]), 6)
                     AS dist
            FROM embeddings e
            CROSS JOIN cb
            CROSS JOIN (SELECT UNNEST(generate_series(0, {_PQ_M - 1})) AS j) j),
    best AS (SELECT vec_id, j, cid, dist
             FROM (SELECT *,
                          ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                             ORDER BY dist, cid) AS rn
                   FROM sub)
             WHERE rn = 1)
    SELECT vec_id,
           MAX(CASE WHEN j = 0 THEN cid END) AS code0,
           MAX(CASE WHEN j = 1 THEN cid END) AS code1,
           MAX(CASE WHEN j = 2 THEN cid END) AS code2,
           MAX(CASE WHEN j = 3 THEN cid END) AS code3,
           ROUND(SUM(dist), 6) AS recon_err
    FROM best
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def vec_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode (Jégou et al. 2011 — the memory
    layout every billion-scale ANN index uses): the 64-dim vector is
    split into 4 subspaces of 16 dims; each sub-vector is replaced by
    the id of its nearest codebook entry (16 entries per subspace =
    4 bits each, so the whole vector compresses to 4 small codes).
    Emits the 4 codes + the summed sub-space quantization distance.

    The codebook (here: sub-slices of the first 16 vectors — production
    trains it with vec_kmeans_train per subspace) collapses to ONE
    broadcast row, and each subspace argmin is the row-local
    transform→array_sort idiom of vec_kmeans_assign: corpus scanned
    once, no explode, no shuffle at all before the final orderBy —
    encode throughput is the Tungsten expression pipeline. Distances
    are rounded to 6 dp BEFORE the argmin, ties break on codebook id
    (registry determinism rules).
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    out = pq_encode(emb, _pq_codebook(emb))
    return out.select(
        "vec_id",
        *[F.col(f"_b{j}")["cid"].alias(f"code{j}") for j in range(_PQ_M)],
        F.round(
            sum(F.col(f"_b{j}")["dist"] for j in range(_PQ_M)), 6
        ).alias("recon_err"),
    ).orderBy("vec_id")


def _pq_codebook(emb: DataFrame) -> DataFrame:
    """One-row codebook frame: the _PQ_K lowest-id vectors as a sorted
    (cid, cemb) struct array (production swaps in per-subspace
    vec_kmeans_train output — the shape downstream is identical)."""
    return (
        emb.filter(F.col("vec_id") < _PQ_K)
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
                )
            ).alias("cb")
        )
    )


def pq_sub_dist(a, c, j: int):
    """L2 distance between subspace j of vectors a and c — sequential
    left-to-right fold, so DuckDB's LIST_DISTANCE over the same slices
    produces the identical double."""
    sa = F.slice(a, j * _PQ_SUB + 1, _PQ_SUB)
    sc = F.slice(c, j * _PQ_SUB + 1, _PQ_SUB)
    return F.sqrt(
        F.aggregate(
            F.zip_with(sa, sc, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )


def pq_encode(emb: DataFrame, cb: DataFrame) -> DataFrame:
    """Attach per-subspace best-codebook-entry structs _b0.._b{M-1}
    (fields: dist rounded 6dp, cid) to every row of `emb` — the
    row-local broadcast argmin described in vec_pq_quantize."""

    # NB: the transform lambda must be SINGLE-parameter — a `lambda c, j=j`
    # default-arg binding makes PySpark pick transform's (element, index)
    # two-argument form and silently rebinds j to the array index.
    def ranked_for(j: int):
        def entry(c):
            return F.struct(
                F.round(pq_sub_dist(F.col("emb"), c["cemb"], j), 6).alias("dist"),
                c["cid"].alias("cid"),
            )

        return F.array_sort(F.transform(F.col("cb"), entry))[0]

    out = emb.crossJoin(F.broadcast(cb))
    for j in range(_PQ_M):
        out = out.withColumn(f"_b{j}", ranked_for(j))
    return out


@register(
    "vec_ann_ivf_pq_topk",
    oracle=f"""
    WITH coarse AS (SELECT vec_id AS centroid_id, embedding AS cemb
                    FROM embeddings WHERE vec_id < 8),
    cb AS (SELECT vec_id AS cid, embedding FROM embeddings
           WHERE vec_id < {_PQ_K}),
    assigned AS (
      SELECT vec_id, centroid_id
      FROM (SELECT e.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(LIST_COSINE_SIMILARITY(
                                e.embedding::DOUBLE[], c.cemb::DOUBLE[]), 6)
                              DESC NULLS LAST, c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN coarse c)
      WHERE rn = 1),
    codes_long AS (
      SELECT vec_id, j, cid
      FROM (SELECT e.vec_id, j.j, cb.cid,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id, j.j
                     ORDER BY ROUND(LIST_DISTANCE(
                       (e.embedding[j.j*{_PQ_SUB}+1 : j.j*{_PQ_SUB}+{_PQ_SUB}])::DOUBLE[],
                       (cb.embedding[j.j*{_PQ_SUB}+1 : j.j*{_PQ_SUB}+{_PQ_SUB}])::DOUBLE[]), 6),
                       cb.cid) AS rn
            FROM embeddings e CROSS JOIN cb
            CROSS JOIN (SELECT UNNEST(generate_series(0, {_PQ_M - 1})) AS j) j)
      WHERE rn = 1),
    codes AS (
      SELECT vec_id,
             MAX(CASE WHEN j = 0 THEN cid END) AS c0,
             MAX(CASE WHEN j = 1 THEN cid END) AS c1,
             MAX(CASE WHEN j = 2 THEN cid END) AS c2,
             MAX(CASE WHEN j = 3 THEN cid END) AS c3
      FROM codes_long GROUP BY vec_id),
    probes AS (
      SELECT vec_id AS query_id, centroid_id
      FROM (SELECT e.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(LIST_COSINE_SIMILARITY(
                                e.embedding::DOUBLE[], c.cemb::DOUBLE[]), 6)
                              DESC NULLS LAST, c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN coarse c
            WHERE e.vec_id >= 100 AND e.vec_id < 105)
      WHERE rn <= 3),
    lut AS (
      SELECT q.vec_id AS query_id, j.j, cb.cid,
             ROUND(LIST_DISTANCE(
               (q.embedding[j.j*{_PQ_SUB}+1 : j.j*{_PQ_SUB}+{_PQ_SUB}])::DOUBLE[],
               (cb.embedding[j.j*{_PQ_SUB}+1 : j.j*{_PQ_SUB}+{_PQ_SUB}])::DOUBLE[]), 6)
               AS d
      FROM embeddings q CROSS JOIN cb
      CROSS JOIN (SELECT UNNEST(generate_series(0, {_PQ_M - 1})) AS j) j
      WHERE q.vec_id >= 100 AND q.vec_id < 105),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(SQRT(((l0.d*l0.d + l1.d*l1.d) + l2.d*l2.d) + l3.d*l3.d), 6)
               AS est_dist
      FROM probes p
      JOIN assigned a ON a.centroid_id = p.centroid_id
      JOIN codes k ON k.vec_id = a.vec_id
      JOIN lut l0 ON l0.query_id = p.query_id AND l0.j = 0 AND l0.cid = k.c0
      JOIN lut l1 ON l1.query_id = p.query_id AND l1.j = 1 AND l1.cid = k.c1
      JOIN lut l2 ON l2.query_id = p.query_id AND l2.j = 2 AND l2.cid = k.c2
      JOIN lut l3 ON l3.query_id = p.query_id AND l3.j = 3 AND l3.cid = k.c3
      WHERE a.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, est_dist,
           CAST(rnk AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY est_dist, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    ORDER BY query_id, rank
    """,
)
def vec_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate k-NN with asymmetric distance computation —
    the full billion-scale ANN read path (Jégou et al. 2011 / FAISS
    IVFPQ): coarse-quantize the corpus into 8 inverted lists, PQ-encode
    every vector to 4 codes, and answer each query by (1) probing its
    3 nearest coarse lists and (2) scoring candidates WITHOUT touching
    their full vectors — each query precomputes a 4×16 lookup table of
    subspace distances to the shared codebook, and a candidate's
    estimated distance is four table lookups. Unlike vec_ann_ivf_topk /
    the RP-LSH ops (engine-defined → rows-only), every step here is
    md5-free deterministic arithmetic, so this one carries a full
    value oracle.

    Scale shape: the corpus is scanned once for assignment+encoding
    (row-local broadcast argmins — no explode, no shuffle); the probe
    relation (queries × 3) and the per-query LUTs (5 rows of 4 arrays)
    broadcast; the only corpus-sized exchange is the inverted-list
    bucket join on centroid_id, whose output is |probed lists| — the
    ADC scan never moves an original embedding. That is precisely why
    IVFPQ wins at 10⁹ vectors: candidate scoring is memory-bandwidth
    on 4-byte codes, not 256-byte floats. Distances rounded to 6 dp at
    the LUT (both engines), est formula written in identical
    operation order; ties break on neighbor_id.
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    coarse = _centroid_list(emb)
    ranked_cos = _centroid_argmax()
    cb = _pq_codebook(emb)
    # corpus: coarse list id + PQ codes, one scan, all row-local
    corpus = pq_encode(
        emb.crossJoin(F.broadcast(coarse)).select(
            "vec_id", "emb", ranked_cos[0]["cid"].alias("centroid_id")
        ),
        cb,
    ).select(
        "vec_id",
        "centroid_id",
        *[F.col(f"_b{j}")["cid"].alias(f"c{j}") for j in range(_PQ_M)],
    )
    q = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
    probes = (
        q.crossJoin(F.broadcast(coarse))
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(F.slice(ranked_cos, 1, 3)).alias("_p", "probe"),
        )
        .select("query_id", F.col("probe")["cid"].alias("centroid_id"))
    )
    # per-query LUT: for each subspace j an array where entry cid+1 is
    # the (rounded) distance from the query's sub-vector j to codebook
    # entry cid — the cb array is cid-sorted and cids are contiguous.
    luts = q.crossJoin(F.broadcast(cb)).select(
        F.col("vec_id").alias("query_id"),
        *[
            F.transform(
                F.col("cb"),
                (lambda j: lambda c: F.round(pq_sub_dist(F.col("emb"), c["cemb"], j), 6))(j),
            ).alias(f"lut{j}")
            for j in range(_PQ_M)
        ],
    )
    d = [
        F.element_at(F.col(f"lut{j}"), F.col(f"c{j}").cast("int") + 1)
        for j in range(_PQ_M)
    ]
    scored = (
        F.broadcast(probes)
        .join(corpus, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(luts), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.sqrt(((d[0] * d[0] + d[1] * d[1]) + d[2] * d[2]) + d[3] * d[3]), 6
            ).alias("est_dist"),
        )
    )
    w = W.partitionBy("query_id").orderBy("est_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


@register(
    "vec_ivf_build_stats",
    oracle="""
    WITH c AS (SELECT vec_id AS centroid_id, embedding AS cemb
               FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.centroid_id,
                    ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], c.cemb::DOUBLE[]), 6)
                      AS sim
             FROM embeddings e CROSS JOIN c),
    assigned AS (SELECT vec_id, centroid_id
                 FROM (SELECT *,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                                 ORDER BY sim DESC NULLS LAST,
                                                          centroid_id) AS rn
                       FROM sims)
                 WHERE rn = 1),
    occ AS (SELECT centroid_id, COUNT(*) AS n FROM assigned GROUP BY centroid_id)
    SELECT CAST(COUNT(*) AS BIGINT)  AS n_lists,
           MIN(n)                    AS min_occ,
           MAX(n)                    AS max_occ,
           ROUND(AVG(n), 2)          AS avg_occ,
           ROUND(MAX(n) / AVG(n), 4) AS imbalance
    FROM occ
    """,
)
def vec_ivf_build_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build health: inverted-list occupancy spread and the
    imbalance factor max/avg — THE number that decides whether an IVF
    index needs re-training or more lists before it ships (a hot list
    makes every probe touching it scan avg×imbalance candidates; probe
    latency is linear in it). Pairs with vec_ann_ivf_pq_topk (read
    path) and vec_kmeans_train (codebook build) as the build-side
    observability step every billion-vector index pipeline runs.

    Shape: the row-local broadcast-argmax assignment (vec_kmeans_assign
    idiom — corpus scanned once, never expands), one map-side-
    combinable occupancy count whose key cardinality = n_lists, and a
    single-row rollup. Nothing here grows with corpus size except the
    one scan.
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = _centroid_list(emb)
    ranked = _centroid_argmax()
    occ = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", ranked[0]["cid"].alias("centroid_id"))
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return occ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.min("n").alias("min_occ"),
        F.max("n").alias("max_occ"),
        F.round(F.avg("n"), 2).alias("avg_occ"),
        F.round(F.max("n") / F.avg("n"), 4).alias("imbalance"),
    )


@register(
    "vec_sign_binary_hamming",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             CAST(len(list_filter(range(64),
                  i -> (e.embedding[i+1] > 0) <> (q.embedding[i+1] > 0)))
                  AS BIGINT) AS hamming
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, hamming, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def vec_sign_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary sign quantization ANN: every 64-dim vector compresses to
    ONE bigint of sign bits (32× smaller than float32), and neighbor
    search becomes popcount(xor) — the cheapest vector-search primitive
    there is, the standard first-stage filter in front of exact
    re-ranking (vec_knn_topk is the exact twin; the sign-Hamming order
    approximates cosine order for mean-centered embeddings).

    Engine shape: the signature column is computed by a JVM-side
    `aggregate(sequence(0,63), ...)` fold — one pass, whole-stage
    codegen, no Python — and the search is a 3-row broadcast against
    the packed corpus: per row ONE xor + ONE bit_count on a long,
    then the rank window prunes to top-10 under WindowGroupLimit. At
    100 TB the packed corpus is the ONLY thing scanned (8 bytes/vector
    + id), which is the entire point of the quantization: a 100 TB
    float corpus becomes a ~3 TB bit corpus that fits hot storage.
    The oracle computes the identical Hamming metric directly on the
    float signs (bit-packing is an engine detail, not a semantic).
    Reference provenance: Pinecone similarity search (A10,
    ra/agent.py:115-119) under the cheapest quantization; SURVEY §2
    B.11 vector family (round 4).
    """
    e = table(spark, sf_dir, "embeddings")
    # fixture dim from the shared constant (schemas.FIXTURE_EMBED_DIM);
    # a silent hardcoded 64 would truncate the signature if the fixture
    # dim ever grew — wrong distances with no error, since the oracle's
    # range(64) would have to move in lockstep anyway
    sig = F.expr(
        f"aggregate(sequence(0, {FIXTURE_EMBED_DIM - 1}), 0L, (acc, i) -> "
        "acc | IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))"
    )
    packed = e.select(F.col("vec_id"), sig.alias("sig"))
    q = packed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("q_sig")
    )
    scored = (
        packed.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr("bit_count(sig ^ q_sig)").cast("bigint").alias("hamming"),
        )
    )
    w = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.select(
            "query_id", "neighbor_id", "hamming", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )


@register(
    "vec_hard_negatives",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, label AS q_label, embedding
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS negative_id, e.label AS neg_label,
             LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]) AS sim
      FROM q CROSS JOIN embeddings e
      WHERE e.label <> q.q_label
    ), ranked AS (
      SELECT query_id, negative_id, neg_label, ROUND(sim, 6) AS sim_r,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(sim, 6) DESC, negative_id) AS rank
      FROM scored
    )
    SELECT query_id, negative_id, neg_label, sim_r, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def vec_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-5 most-similar vectors with a DIFFERENT label — the
    examples a contrastive/triplet loss learns most from (easy
    negatives contribute ~zero gradient; random sampling wastes the
    batch). The label-aware twin of vec_knn_topk: same broadcast + rank
    plan, but the label inequality is applied BEFORE scoring, so
    same-label rows never enter the similarity computation at all.

    Scale shape identical to vec_knn_topk (the exact baseline the ANN
    ops approximate): 5-query broadcast against the corpus scan, rank
    window pruned by WindowGroupLimit; at production scale the corpus
    side is the ANN index (vec_ann_ivf_topk) with the label filter
    pushed into the bucket scan — the mining loop is the read path
    these indexes exist for.
    Reference provenance: Pinecone top-k retrieval (ra/agent.py:115-119)
    repurposed as a training-data miner; SURVEY §2 B.11 vector family
    (round 4).
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_embedding"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("neg_label"),
            cosine(as_double("embedding"), as_double("q_embedding")).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), "negative_id")
    return (
        scored.select(
            "query_id",
            "negative_id",
            "neg_label",
            F.round("sim", 6).alias("sim_r"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


_CENTROID_DIM = FIXTURE_EMBED_DIM  # fixture dim (FIXTURES.md §3); a real
# deployment derives it from the table schema/catalog, never the data.


def _centroid_outliers_oracle() -> str:
    cent = ", ".join(
        f"ROUND(AVG(embedding[{i + 1}]), 9)" for i in range(_CENTROID_DIM)
    )
    return f"""
    WITH c AS (
      SELECT [{cent}]::DOUBLE[] AS cent FROM embeddings
    ), s AS (
      SELECT e.vec_id,
             ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], c.cent), 9) AS cos
      FROM embeddings e, c
    ), m AS (
      SELECT ROUND(AVG(cos), 9) AS mu, ROUND(STDDEV_SAMP(cos), 9) AS sd FROM s
    )
    SELECT vec_id,
           ROUND(cos, 6)             AS cos_centroid,
           ROUND((cos - mu) / sd, 6) AS z,
           ((cos - mu) / sd) < -2.0  AS is_outlier
    FROM s, m
    ORDER BY vec_id
    """


@register("vec_centroid_outliers", oracle=_centroid_outliers_oracle())
def vec_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier screen — the curation step that runs
    BEFORE semantic dedup / training-set assembly: flag vectors whose
    cosine to the corpus centroid z-scores below −2 (far from the bulk
    of the distribution ⇒ mis-embedded, off-domain, or corrupt rows;
    the per-cluster variant of the same test is SemDeDup's prune rule).

    Spark shape — three telescoping aggregates, corpus scanned narrow:
    (1) the per-dimension centroid as 64 `avg(emb[i])` expressions in
    ONE aggregation pass (no explode — the shuffle carries a single
    64-double row); (2) cosine of every vector against the broadcast
    centroid (the zip_with/aggregate fold, codegen, no UDF); (3) mean +
    sample-stddev of those cosines as a second single-row aggregate
    broadcast back for the z-score. At 100 TB: two metadata-sized
    exchanges and one narrow map — nothing data-sized ever shuffles.
    Float determinism: centroid dims, cosines, and the moments are all
    ROUNDed to 1e-9 on BOTH engines before anything derives from them
    (registry float rule); z rounds to 1e-6 for the compare. The −2
    cut reads the unrounded quotient on both sides, so a boundary flip
    would need the z itself to straddle the cut within one ulp.
    Reference provenance: none (the reference never inspects its
    embedding space); north-star curation surface, SemDeDup-adjacent.
    """
    dim = _CENTROID_DIM
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    cent = e.agg(
        F.array(
            *[F.round(F.avg(F.col("emb")[i]), 9) for i in range(dim)]
        ).alias("cent")
    )
    # localCheckpoint: `s` feeds BOTH the moments aggregate and the
    # final projection — without it the corpus scan + centroid
    # aggregate + cosine fold would execute twice (same multi-consumer
    # idiom as text_dsir_importance / graph_jaccard_neighbors).
    # eager=False: the moments job materializes the blocks as it runs,
    # so no dedicated checkpoint job is paid at toy scale
    s = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", F.round(cosine(F.col("emb"), F.col("cent")), 9).alias("cos")
        )
        .localCheckpoint(eager=False)
    )
    m = s.agg(
        F.round(F.avg("cos"), 9).alias("mu"),
        F.round(F.stddev_samp("cos"), 9).alias("sd"),
    )
    return (
        s.crossJoin(F.broadcast(m))
        .select(
            "vec_id",
            F.round("cos", 6).alias("cos_centroid"),
            F.round((F.col("cos") - F.col("mu")) / F.col("sd"), 6).alias("z"),
            (((F.col("cos") - F.col("mu")) / F.col("sd")) < -2.0).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


def pca_fit(
    df: DataFrame,
    emb_col: str = "embedding",
    k: int = 4,
    dim: int = FIXTURE_EMBED_DIM,
):
    """Distributed PCA fit via a FIXED-SIZE sufficient statistic — the
    matrix-valued sibling of agg_corr_matrix's one-pass trick: each
    partition's mapInPandas fold emits ONE row carrying (count, Σv,
    Σ v·vᵀ flattened) — n_partitions rows total, independent of N — so
    the driver assembles mean and covariance from a bounded collect
    (the treeAggregate shape), runs the 64×64 eigendecomposition
    locally (a model-sized problem, like kmeans' centroid step), and
    returns (components, mean, explained_var). Component signs are
    fixed deterministically (largest-|entry| coordinate made positive)
    so the artifact is reproducible run-to-run.

    At 100 TB: ONE narrow pass over the corpus, a cluster-size-bounded
    driver fetch of d²-sized partials, and an O(d³) driver step with
    d=64 — the eigh never sees data. Returns numpy arrays
    (components[k,dim] row-major, mean[dim], explained[k])."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            if len(m):
                n += len(m)
                s += m.sum(axis=0)
                g += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    rows = (
        df.select(emb_col)
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()
    )  # ≤ one row per partition — bounded by cluster size, never by N
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    g = np.sum([np.asarray(r.g).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    explained = evals[order]
    for i in range(k):  # deterministic sign: largest-|entry| coord > 0
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return comps, mean, explained


def pca_project(
    df: DataFrame,
    comps,
    mean,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Project vectors onto fitted components (api.pca_project): one
    Arrow-batched numpy matmul per batch against the closure-captured
    (k×d) component matrix — same BLAS-stage shape as
    near_dup_pairs_exact, corpus never shuffles. Emits scalar columns
    pc1..pck (driver-canonicalizable, no array outputs)."""
    import numpy as np
    import pandas as pd

    k = len(comps)
    c = np.asarray(comps, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    cols = [f"pc{i + 1}" for i in range(k)]

    def project(batches):
        for pdf in batches:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            out = {"_id": pdf[id_col]}
            proj = (m - mu) @ c.T if len(m) else np.zeros((0, k))
            for i, name in enumerate(cols):
                out[name] = proj[:, i] if len(m) else []
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    schema = ", ".join([f"_id {id_type}"] + [f"{c_} double" for c_ in cols])
    return (
        df.select(id_col, emb_col)
        .mapInPandas(project, schema)
        .withColumnRenamed("_id", id_col)
    )


@register("vec_pca_project")  # eigendecomposition floats → rows-only; numpy-pinned
def vec_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA embedding compression: fit 4 principal components on the
    corpus (pca_fit — one-pass distributed Gram statistic, driver-local
    64×64 eigh) and project every vector (pca_project — Arrow-batched
    BLAS, no shuffle). Output (vec_id, pc1..pc4 rounded 1e-6) — the
    low-rank representation that feeds cheaper ANN/OPQ stages, and the
    engine's answer to "whiten/compress the embedding column" next to
    the PQ (vec_pq_quantize) and int8 (vec_quantize_int8) quantizers.

    Rows-only by design (eigenvector floats have no SQL twin; sign/
    order pinned deterministically in pca_fit). SURVEY §5.2.6 pin:
    tests/test_rag_ops.py::test_pca_matches_driver_side_numpy replays
    the ENTIRE fit+project on driver-collected vectors with plain numpy
    (full-matrix path, not the Gram path) and asserts projections match
    to 1e-9, plus orthonormality / explained-variance-ordering
    invariants.
    Reference provenance: none (the reference never inspects its
    embedding space); north-star similarity-search surface.
    """
    e = table(spark, sf_dir, "embeddings")
    comps, mean, _ = pca_fit(e, k=4)
    proj = pca_project(e, comps, mean)
    return proj.select(
        "vec_id",
        *[F.round(F.col(f"pc{i + 1}"), 6).alias(f"pc{i + 1}") for i in range(4)],
    ).orderBy("vec_id")


_MRL_LEVELS = [8, 16, 32, 64]  # prefix dims evaluated; 64 = full


@register(
    "vec_matryoshka_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    lv AS (SELECT UNNEST({_MRL_LEVELS}) AS level),
    scored AS (
      SELECT lv.level, q.query_id, e.vec_id AS neighbor_id,
             LIST_COSINE_SIMILARITY((e.embedding[1:lv.level])::DOUBLE[],
                                    (q.embedding[1:lv.level])::DOUBLE[]) AS sim
      FROM q CROSS JOIN embeddings e CROSS JOIN lv
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT level, query_id, neighbor_id, ROUND(sim, 6) AS sim_r,
             ROW_NUMBER() OVER (PARTITION BY level, query_id
                                ORDER BY ROUND(sim, 6) DESC, neighbor_id) AS rn
      FROM scored
    ),
    top1 AS (
      SELECT level, query_id, neighbor_id AS top1_id, sim_r
      FROM ranked WHERE rn = 1
    )
    SELECT level, query_id, top1_id, sim_r,
           CAST(top1_id = MAX(CASE WHEN level = {_MRL_LEVELS[-1]} THEN top1_id END)
                            OVER (PARTITION BY query_id) AS INTEGER) AS agree_full
    FROM top1 ORDER BY level, query_id
    """,
)
def vec_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval eval (Kusupati et al. 2022): for
    each prefix length in {8, 16, 32, 64}, the exact cosine top-1
    neighbor of each query under TRUNCATED embeddings, plus whether it
    agrees with the full-dimension answer — the measurement behind the
    "can we store 8 of 64 dims and keep recall" decision every
    embedding-storage budget forces. One output row per (level, query).

    Spark shape: corpus scanned ONCE; the 5-query side broadcasts; the
    four prefix NORMS are precomputed once per ROW on each side before
    the cross join (per-row state never belongs in the per-pair stage —
    inlining the norm into the pair projection would fold it |Q|× per
    corpus row), so each pair pays only the four prefix DOT products,
    in one projection; the per-level struct array explodes to
    (level, sim) rows only AFTER the arithmetic, so the corpus row is
    read once per pair, not once per level. Per-(level, query) top-1
    via a rank window over the 6-dp-ROUNDED sim with neighbor-id
    tie-break (the suite-wide ulp-flip rule), pruned map-side by
    WindowGroupLimit; the full-dim agreement bit rides a second window
    over the 20-row top-1 frame, never the pair frame. The arithmetic
    (dot / (na·nb), zero-denominator → NULL) is identical
    operation-for-operation to cosine(), so the precomputation cannot
    move a bit. At 100 TB-scale corpora the pair stage is the same
    cost as vec_knn_topk (the broadcast-query exact path); levels
    multiply only the projection arithmetic, not the shuffle.
    """

    def with_prefix_norms(df, emb_col, out_col):
        emb = as_double(emb_col)
        return df.withColumn(
            out_col,
            F.array(
                *[
                    F.sqrt(
                        F.aggregate(
                            F.slice(emb, 1, lv), F.lit(0.0), lambda s, x: s + x * x
                        )
                    )
                    for lv in _MRL_LEVELS
                ]
            ),
        )

    e = table(spark, sf_dir, "embeddings")
    corpus = with_prefix_norms(e, "embedding", "e_norms")
    q = with_prefix_norms(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        ),
        "q_embedding",
        "q_norms",
    )
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )

    def sim_at(i: int, lv: int):
        dot = F.aggregate(
            F.zip_with(
                F.slice(as_double("embedding"), 1, lv),
                F.slice(as_double("q_embedding"), 1, lv),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        denom = F.element_at("e_norms", i + 1) * F.element_at("q_norms", i + 1)
        return F.when(denom != 0.0, dot / denom)

    per_level = F.array(
        *[
            F.struct(F.lit(lv).alias("level"), sim_at(i, lv).alias("sim"))
            for i, lv in enumerate(_MRL_LEVELS)
        ]
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.explode(per_level).alias("ls"),
    ).select(
        F.col("ls.level").alias("level"),
        "query_id",
        "neighbor_id",
        F.round("ls.sim", 6).alias("sim_r"),
    )
    w = W.partitionBy("level", "query_id").orderBy(
        F.col("sim_r").desc(), "neighbor_id"
    )
    top1 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("level", "query_id", F.col("neighbor_id").alias("top1_id"), "sim_r")
    )
    full_top1 = F.max(
        F.when(F.col("level") == _MRL_LEVELS[-1], F.col("top1_id"))
    ).over(W.partitionBy("query_id"))
    return top1.select(
        "level",
        "query_id",
        "top1_id",
        "sim_r",
        (F.col("top1_id") == full_top1).cast("int").alias("agree_full"),
    ).orderBy("level", "query_id")


@register("vec_ann_recall_report")  # scores engine-defined ANN → rows-only; pinned
def vec_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a first-class operator: recall@5 of each
    approximate index path (IVF-Flat, RP-LSH, multi-probe RP-LSH)
    against the exact cosine scan over the SAME query set (vec_ids
    100-104) — the eval loop every production vector deployment runs
    before trusting an index, in-engine instead of in a notebook.
    Output: (method, n_queries, macro_recall_at5, min_query_recall),
    one row per method, recall = |approx∩exact| / 5 per query, macro
    averaged. Deterministic end to end (every path is seeded and
    rank-stable), but the values grade engine-defined indexes, so the
    op is rows-only like the indexes themselves — pinned instead by
    tests/test_rag_ops.py::test_ann_recall_report_floors_and_dominance
    (IVF/LSH floors from the §5.2.6 recall pins; multiprobe ≥
    single-probe by candidate-superset dominance).

    Scale shape: the exact side is one broadcast-query corpus scan
    (knn_topk); each comparison joins two ≤(queries×5)-row frames —
    evaluation cost is O(queries), never a second corpus pass.
    Reference provenance: the reference trusts Pinecone blindly
    (ra/agent.py:115-119 consumes scores unvalidated); this is the
    missing measurement."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = knn_topk(e, q, k=5).select("query_id", "neighbor_id")
    methods = [
        ("ivf_flat", vec_ann_ivf_topk),
        ("rp_lsh", vec_ann_rp_lsh_topk),
        ("rp_lsh_multiprobe", vec_ann_rp_lsh_multiprobe),
    ]
    out = None
    for name, fn in methods:
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
        per_q = (
            exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        # queries with zero hits drop out of the semi-join group-by:
        # re-anchor on the full query list so recall=0 counts as 0,
        # not as a silently missing row
        rep = (
            q.select("query_id")
            .join(per_q, "query_id", "left")
            .select(
                F.lit(name).alias("method"),
                F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            )
            .groupBy("method")
            .agg(
                F.count(F.lit(1)).alias("n_queries"),
                F.round(F.avg(F.col("hits") / 5.0), 6).alias("macro_recall_at5"),
                F.round(F.min(F.col("hits") / 5.0), 6).alias("min_query_recall"),
            )
        )
        out = rep if out is None else out.unionByName(rep)
    return out.orderBy("method")


@register(
    "dedup_threshold_sweep",
    oracle="""
    -- brute-force O(N^2) cosine replay (the only exact verification),
    -- swept over the candidate thresholds: per threshold, the pair
    -- count and the number of distinct flagged docs. LEFT JOIN +
    -- COALESCE so a threshold with zero pairs still reports 0 on both
    -- engines.
    WITH sims AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS s
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ), t(thr) AS (
      VALUES (0.30), (0.35), (0.40), (0.45), (0.50)
    ), hits AS (
      SELECT thr, va, vb FROM t JOIN sims ON s >= thr
    ), p AS (
      SELECT thr, COUNT(*) AS n_pairs FROM hits GROUP BY thr
    ), f AS (
      SELECT thr, COUNT(DISTINCT doc) AS n_flagged
      FROM (SELECT thr, va AS doc FROM hits
            UNION ALL SELECT thr, vb FROM hits)
      GROUP BY thr
    )
    SELECT CAST(t.thr AS DOUBLE)                 AS threshold,
           CAST(COALESCE(p.n_pairs, 0) AS BIGINT)   AS n_pairs,
           CAST(COALESCE(f.n_flagged, 0) AS BIGINT) AS n_flagged
    FROM t LEFT JOIN p USING (thr) LEFT JOIN f USING (thr)
    ORDER BY threshold
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sensitivity sweep — the table a curator reads
    BEFORE committing a 100 TB dedup pass to one cosine cutoff: for
    each candidate threshold, how many pairs fire and how many distinct
    documents get flagged (the removal upper bound). The cliff between
    two adjacent rows is the decision: a threshold on the cliff's edge
    deletes a corpus; one past it deletes nothing.

    Spark shape: ONE distributed block-pair BLAS scan at the LOWEST
    candidate threshold (near_dup_pairs_exact — the O(N²) compute is
    paid once, not once per threshold), then the sweep is a
    broadcast-joined re-bucketing of the pair list: O(pairs ×
    thresholds), metadata-sized next to the scan. Flagged-doc counts
    via explode([a,b]) + COUNT(DISTINCT). Zero-pair thresholds report
    0 via LEFT JOIN on both engines. Round-before-compare (6 dp) makes
    the ≥-membership decision identical across Spark's BLAS
    accumulation order and DuckDB's.
    Reference provenance: none; SURVEY §2 B.11 dedup family (round 9) —
    the tuning face over the dedup_near_embedding primitive.
    """
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    thresholds = [0.30, 0.35, 0.40, 0.45, 0.50]
    pairs = near_dup_pairs_exact(e, threshold=min(thresholds))
    t = spark.createDataFrame([(x,) for x in thresholds], "thr double")
    # ONE consumption of the BLAS pair list: broadcast-replicate each
    # pair to the thresholds it clears, explode to (thr, doc), and take
    # BOTH counters from the same grouped pass — each pair contributes
    # exactly two doc rows, so n_pairs = rows/2 (a second branch over
    # `pairs` would re-run the O(N²) cogroup subtree per branch: the
    # plan gate in tests/test_plans.py pins exactly one FlatMapCoGroups)
    agg = (
        pairs.join(F.broadcast(t), pairs["cos_sim"] >= t["thr"])
        .select("thr", F.explode(F.array("vec_a", "vec_b")).alias("doc"))
        .groupBy("thr")
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_pairs"),
            F.countDistinct("doc").alias("n_flagged"),
        )
    )
    return (
        t.join(agg, on="thr", how="left")
        .select(
            F.col("thr").alias("threshold"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("n_flagged"), F.lit(0)).cast("bigint").alias("n_flagged"),
        )
        .orderBy("threshold")
    )
