"""Multimodal-column operators + report sink (SURVEY.md §2 B.8).

Reference provenance: Docling layout JSON with tables/pictures arrays
(parser_pinecone_storage.py:81-82,156-183), table/figure S3 keys with the
1-based/0-based off-by-one (SURVEY Appendix A.2 — the engine standardizes
1-BASED keys), PDF report sink (ra/agent.py:135-149; 5-section server
schema ra/server.py:72-77 taken as canonical per Appendix A.1).

Multimodal columns are opaque `binary` + typed metadata columns
(SURVEY §1.3: no UDT). Real image/audio decode libraries are not in this
container, so decode is a clearly-marked deterministic FAKE behind the
same mapInPandas plumbing a real decoder would use — schema, batching and
partitioning are the real, tested parts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register


@register(
    "multimodal_table_explode",
    oracle="""
    WITH t AS (
      SELECT doc_id, UNNEST(generate_series(1, CAST(doc_id % 4 AS INTEGER))) AS table_no
      FROM documents
      WHERE doc_id % 4 <> 0
    )
    SELECT doc_id,
           CAST(table_no AS INTEGER)                                    AS table_no,
           'doc_' || doc_id || '/table_' || table_no || '.csv'          AS s3_key,
           CAST((doc_id * 7 + table_no) % 20 + 1 AS INTEGER)            AS n_rows
    FROM t
    ORDER BY doc_id, table_no
    """,
)
def multimodal_table_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-JSON → exploded per-table references with 1-BASED keys
    (fixes the reference's A6/A14 off-by-one: CSV uploads counted from 1,
    Pinecone metadata from 0 — SURVEY Appendix A.2).

    The layout JSON is synthesized deterministically per document (the
    fixture corpus has no real Docling output), round-tripped through
    to_json → from_json → posexplode to prove the JSON path."""
    d = table(spark, sf_dir, "documents")
    # build layout: tables = [{rows: (doc_id*7+n)%20+1} for n in 1..doc_id%4]
    # NB: Spark's sequence(1, 0) counts DOWN ([1,0]) rather than returning
    # an empty array — docs with doc_id%4==0 must be guarded explicitly.
    n_tables = (F.col("doc_id") % 4).cast("int")
    layout = F.to_json(
        F.struct(
            F.when(
                n_tables > 0,
                F.transform(
                    F.sequence(F.lit(1), n_tables),
                    lambda n: F.struct(
                        ((F.col("doc_id") * 7 + n) % 20 + 1).cast("int").alias("rows")
                    ),
                ),
            )
            .otherwise(F.array().cast("array<struct<rows:int>>"))
            .alias("tables")
        )
    )
    parsed = d.select(
        "doc_id",
        F.from_json(layout, "tables array<struct<rows:int>>").alias("layout"),
    ).filter(F.size("layout.tables") > 0)
    exploded = parsed.select(
        "doc_id", F.posexplode("layout.tables").alias("pos", "tbl")
    )
    return exploded.select(
        "doc_id",
        (F.col("pos") + 1).alias("table_no"),  # 1-based, by design
        F.concat(
            F.lit("doc_"),
            F.col("doc_id"),
            F.lit("/table_"),
            (F.col("pos") + 1),
            F.lit(".csv"),
        ).alias("s3_key"),
        F.col("tbl.rows").alias("n_rows"),
    ).orderBy("doc_id", "table_no")


def fake_decode_image(blob: bytes) -> tuple[int, int, str]:
    """Deterministic FAKE image decode (image libs absent in this
    container — SURVEY §7 non-goals). A real deployment swaps this one
    function for PIL/libvips; everything around it (binary column in,
    Arrow batches, typed metadata out) is the production plumbing."""
    if not blob:
        return (0, 0, "empty")
    w = 64 + (blob[0] % 16) * 64
    h = 64 + (len(blob) % 16) * 64
    fmt = ["png", "jpeg", "webp"][blob[-1] % 3]
    return (w, h, fmt)


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)                     AS n_bytes,
           CAST(64 + (ASCII(SUBSTRING(text, 1, 1)) % 16) * 64 AS INTEGER) AS width,
           CAST(64 + (OCTET_LENGTH(ENCODE(text)) % 16) * 64 AS INTEGER)   AS height,
           ['png', 'jpeg', 'webp'][ASCII(SUBSTRING(text, LENGTH(text), 1)) % 3 + 1]
             AS format
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary multimodal column + mapInPandas feature extraction.

    documents.text stands in for image bytes (binary column); decode runs
    per Arrow batch — thousands of blobs per Python call, the batch shape
    a real CV/audio decoder needs. Schema: (doc_id, n_bytes, width,
    height, format)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-record isolation (A28, like every sibling decode hook): a
        # NULL blob yields a NULL-metadata row, never a dead task —
        # len(None) would raise and kill the stage after retries while
        # the oracle happily emits the NULL row
        for pdf in batches:
            meta = pdf["blob"].map(
                lambda b: fake_decode_image(b) if b is not None else (None,) * 3
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "format": meta.map(lambda m: m[2]),
                }
            )

    return d.mapInPandas(
        decode_batches,
        schema="doc_id long, n_bytes long, width int, height int, format string",
    ).orderBy("doc_id")


@register(
    "multimodal_resize_plan",
    oracle="""
    SELECT doc_id,
           64 + (CAST(doc_id % 251 AS INTEGER) % 16) * 64  AS width,
           64 + (CAST(n_chars AS INTEGER) % 16) * 64       AS height,
           CAST(FLOOR(LEAST(
             256.0 / (64 + (CAST(doc_id % 251 AS INTEGER) % 16) * 64),
             256.0 / (64 + (CAST(n_chars AS INTEGER) % 16) * 64)
           ) * (64 + (CAST(doc_id % 251 AS INTEGER) % 16) * 64)) AS INTEGER) AS out_w,
           CAST(FLOOR(LEAST(
             256.0 / (64 + (CAST(doc_id % 251 AS INTEGER) % 16) * 64),
             256.0 / (64 + (CAST(n_chars AS INTEGER) % 16) * 64)
           ) * (64 + (CAST(n_chars AS INTEGER) % 16) * 64)) AS INTEGER) AS out_h
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (fit into 256×256): the geometry
    is computed JVM-side from typed metadata; only the pixel transform
    itself (absent here — no image libs in the container) would run in a
    mapInPandas decode→resize→encode stage. Deterministic fake
    dimensions are derived from doc_id/n_chars so the oracle can check
    the arithmetic."""
    d = table(spark, sf_dir, "documents")
    w = (64 + ((F.col("doc_id") % 251).cast("int") % 16) * 64).cast("int")
    h = (64 + (F.col("n_chars").cast("int") % 16) * 64).cast("int")
    scale = F.least(F.lit(256.0) / w, F.lit(256.0) / h)
    # FLOOR explicitly on both sides: DuckDB's float→int CAST rounds
    # half-to-even while Spark's truncates — floor is the resize
    # convention anyway (never exceed the bounding box)
    return d.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        F.floor(scale * w).cast("int").alias("out_w"),
        F.floor(scale * h).cast("int").alias("out_h"),
    ).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             10.0 + CAST(doc_id % 113 AS INTEGER) AS duration_s
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           CAST(UNNEST(generate_series(0, CAST(FLOOR(duration_s / 2.5) AS INTEGER) - 1)) AS INTEGER) AS frame_no,
           ROUND(UNNEST(generate_series(0, CAST(FLOOR(duration_s / 2.5) AS INTEGER) - 1)) * 2.5, 2) AS ts_sec
    FROM v
    ORDER BY doc_id, frame_no
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame at a fixed
    2.5 s stride over a (deterministic fake) duration. The explode is the
    real operator — at scale each video row fans out to its frame rows
    narrow, and a mapInPandas decoder fills in the actual frame bytes.
    Models the reference's figure extraction loop (A7) generalized to
    time-indexed media."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    duration = F.lit(10.0) + (F.col("doc_id") % 113).cast("int")
    n_frames = F.floor(duration / 2.5).cast("int")  # FLOOR both sides (DuckDB CAST rounds)
    # plain explode of the index sequence: binding posexplode's POSITION
    # as frame_no (and discarding the value) worked but inverted the
    # alias convention of multimodal_scene_cuts — a copy-paste trap
    # where both variants "look right" and one is off by one
    return (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
        )
        .select(
            "doc_id",
            F.col("frame_no").cast("int").alias("frame_no"),
            F.round(F.col("frame_no") * 2.5, 2).alias("ts_sec"),
        )
        .orderBy("doc_id", "frame_no")
    )


_REPORT_ORACLE = """
    SELECT
      'Corpus Research Report'                                   AS title,
      'Analyzed ' || (SELECT COUNT(*) FROM documents) || ' documents'   AS introduction,
      'Top language: ' ||
        (SELECT lang FROM documents GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 1)
                                                                 AS key_findings,
      'Average length: ' ||
        CAST(ROUND((SELECT AVG(n_chars) FROM documents), 2) AS VARCHAR) AS analysis,
      'Total characters: ' ||
        CAST((SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents) AS VARCHAR) AS conclusion,
      (SELECT STRING_AGG(source, '; ' ORDER BY source)
       FROM (SELECT DISTINCT source FROM documents ORDER BY source LIMIT 3)) AS sources
    """


@register(
    "report_compose",
    oracle=_REPORT_ORACLE,
)
def report_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row report with the server's 5-section schema
    (ra/server.py:72-77; the 4-arg agent variant ra/agent.py:135-149 is
    the buggy one — Appendix A.1). Sections are composed from aggregates
    with concat — a driver-side-loop-free report sink; write.text/json
    turns it into the reference's file artifact."""
    d = table(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
    )
    top_lang = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("lang"))
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    sources = (
        d.select("source")
        .distinct()
        .orderBy("source")
        .limit(3)
        .agg(F.array_join(F.array_sort(F.collect_list("source")), "; ").alias("src3"))
    )
    return (
        stats.crossJoin(F.broadcast(top_lang))
        .crossJoin(F.broadcast(sources))
        .select(
            F.lit("Corpus Research Report").alias("title"),
            F.concat(F.lit("Analyzed "), F.col("n_docs"), F.lit(" documents")).alias(
                "introduction"
            ),
            F.concat(F.lit("Top language: "), F.col("top_lang")).alias("key_findings"),
            F.concat(F.lit("Average length: "), F.col("avg_chars").cast("string")).alias(
                "analysis"
            ),
            F.concat(
                F.lit("Total characters: "), F.col("total_chars").cast("string")
            ).alias("conclusion"),
            F.col("src3").alias("sources"),
        )
    )


@register(
    "multimodal_image_phash",
    oracle="""
    WITH d AS (
        SELECT doc_id, md5(text) || md5(text || 'x') AS digits FROM documents
    ), n AS (
        SELECT doc_id,
               list_transform(range(1, 65),
                   j -> ascii(substr(digits, CAST(j AS INTEGER), 1))
                        - CASE WHEN substr(digits, CAST(j AS INTEGER), 1) <= '9'
                               THEN 48 ELSE 87 END) AS nibs
        FROM d
    ), p AS (
        SELECT doc_id,
               array_to_string(
                   list_transform(nibs,
                       v -> CASE WHEN v * 64 > list_sum(nibs) THEN '1' ELSE '0' END),
                   '') AS phash
        FROM n
    )
    SELECT doc_id, phash,
           COUNT(*) OVER (PARTITION BY phash) AS n_bucket
    FROM p
    ORDER BY doc_id
    """,
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup plumbing: fake-decode each "image"
    (documents.text standing in for the blob, as in multimodal_binary_meta)
    into an 8×8 luma grid, threshold each cell against the grid mean
    (classic aHash), and bucket the corpus by the 64-bit signature to
    surface duplicate groups.

    The decode is the clearly-marked deterministic fake (64 luma nibbles
    derived from md5 of the bytes — a real deployment swaps in
    PIL → grayscale → resize(8,8)); everything downstream is the real
    production shape: per-row signature computed scan-side with NO
    shuffle and NO UDF (substr/ascii/transform stay in codegen), then
    ONE exchange on the 8-byte signature — never the image bytes — to
    group duplicates. At 100 TB the heavy blobs stay put; only hashes
    move, which is what makes pHash dedup tractable where byte-level
    dedup is not. Threshold compare is integer (n·64 > Σnibs), so the
    oracle pins every signature exactly.
    """
    d = table(spark, sf_dir, "documents")
    return phash_buckets(d, id_col="doc_id", blob_col="text").orderBy("doc_id")


def pil_luma_decoder(data: bytes) -> list:
    """Real image decode hook: PIL → grayscale → resize(8×8) → 64 luma
    bytes, the standard aHash front end. Gated behind import-try (PIL is
    not in the CI container — tests importorskip it); any deployment
    with Pillow installed passes decoder=pil_luma_decoder to
    phash_buckets and gets true perceptual hashing with the identical
    downstream plan. Replaces the reference's delegated image parsing
    (Docling/PIL, parser_pinecone_storage.py:106-117) with an in-engine
    decode."""
    import io

    try:
        from PIL import Image
    except ImportError as ex:  # pragma: no cover - exercised only sans PIL
        raise ImportError(
            "pil_luma_decoder requires Pillow; pass a custom decoder or "
            "use the deterministic fake (decoder=None)"
        ) from ex
    img = Image.open(io.BytesIO(data)).convert("L").resize((8, 8))
    return list(img.getdata())


def phash_buckets(
    df: DataFrame, id_col: str, blob_col: str, decoder=None
) -> DataFrame:
    """Composable aHash dedup bucketing (api.phash_buckets): per row —
    64-bit signature string (each cell thresholded against the grid
    mean) plus the count of rows sharing the signature. The only
    exchange moves signatures, never blobs.

    decoder=None (default): deterministic fake decode — 64 luma nibbles
    from md5 of the blob, pure codegen (no UDF, oracle-exact). Pass a
    callable bytes→64 luma ints (e.g. pil_luma_decoder) to decode real
    image bytes: the decode runs as ONE Arrow-batched mapInPandas stage
    emitting (id, 64 lumas) — blobs die in the worker, signatures are
    all that ever moves — and the threshold/bucket stages are shared
    verbatim with the fake path.

    Undecodable rows keep a NULL phash and n_bucket=1 — each corrupt
    blob is its OWN singleton, never a "duplicate" of other corrupt
    blobs (a NULL-partition count would report 500 distinct truncated
    images as one 500-strong bucket and a dedup consumer would drop
    499 unique assets)."""
    reserved = {"digits", "nibs", "s", "phash", "n_bucket"}
    if id_col in reserved:
        raise ValueError(
            f"id_col={id_col!r} collides with a reserved internal/output "
            f"column of phash_buckets ({sorted(reserved)}); rename it first"
        )
    if decoder is None:
        d = df.select(
            id_col,
            F.concat(
                F.md5(F.col(blob_col)), F.md5(F.concat(F.col(blob_col), F.lit("x")))
            ).alias("digits"),
        )
        ch = lambda j: F.substr(F.col("digits"), j, F.lit(1))  # noqa: E731
        nibs = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: F.ascii(ch(j)) - F.when(ch(j) <= "9", 48).otherwise(87),
        )
        n = d.select(id_col, nibs.alias("nibs"))
    else:

        def decode(batches):
            import pandas as pd

            def one(b):
                # per-record isolation: a NULL blob or a decoder that
                # raises (truncated image, wrong codec) yields a NULL
                # signature row, never a dead task — same A28 rule as
                # the REST source
                if b is None:
                    return None
                try:
                    return [int(x) for x in decoder(bytes(b))]
                except Exception:
                    return None

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "_id": pdf[id_col],
                        "nibs": [one(b) for b in pdf[blob_col]],
                    }
                )

        n = (
            df.select(id_col, blob_col)
            .mapInPandas(decode, f"_id {df.schema[id_col].dataType.simpleString()}, nibs array<int>")
            .withColumnRenamed("_id", id_col)
        )
    total = F.aggregate("nibs", F.lit(0), lambda acc, v: acc + v)
    n = n.select(id_col, "nibs", total.alias("s"))
    phash = F.when(
        F.col("nibs").isNotNull(),
        F.concat_ws(
            "",
            F.transform(
                "nibs", lambda v: F.when(v * 64 > F.col("s"), "1").otherwise("0")
            ),
        ),
    )  # undecodable rows keep a NULL phash — singletons, see docstring
    p = n.select(id_col, phash.alias("phash"))
    return p.withColumn(
        "n_bucket",
        F.when(
            F.col("phash").isNotNull(),
            F.count(F.lit(1)).over(Window.partitionBy("phash")),
        ).otherwise(F.lit(1)),
    )


@register(
    "multimodal_audio_windows",
    oracle="""
    WITH a AS (
      SELECT doc_id, CAST((doc_id * 31) % 300 + 5 AS BIGINT) AS duration_s
      FROM documents WHERE doc_id % 3 = 0
    ), w AS (
      SELECT doc_id, duration_s,
             UNNEST(generate_series(1, CAST(CEIL(duration_s / 10.0) AS BIGINT)))
               AS win_no
      FROM a
    )
    SELECT doc_id,
           CAST(win_no AS INTEGER)                                AS win_no,
           CAST((win_no - 1) * 10 AS BIGINT)                      AS start_s,
           LEAST(win_no * 10, duration_s)                         AS end_s,
           ROUND(((doc_id * 7 + win_no) % 1000) / 1000.0, 3)      AS rms
    FROM w
    ORDER BY doc_id, win_no
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plan: fixed 10 s analysis windows (hop = size)
    over per-file durations, each window carrying a decoder feature
    (RMS energy). Docs with doc_id % 3 == 0 stand in for audio rows;
    duration and RMS are deterministic FAKES (no audio libs in this
    container — module docstring) while the Spark plumbing is the real
    part under test: an Arrow-batched mapInPandas with an explicit
    output schema, one input row fanning out to its window rows inside
    the Python worker exactly as a streaming PCM decoder would emit
    them (the decode swaps in per-batch; schema, batching and fan-out
    shape stay fixed).

    At scale this is the audio twin of multimodal_frame_sample: the
    binary column never leaves the executor, each task decodes its own
    files, and the per-window feature rows are narrow. mapInPandas
    (not explode) because a real decoder needs the bytes in Python —
    the fan-out happens Arrow-side, not in Catalyst.
    Reference provenance: extends the reference's figure-extraction
    loop (parser_pinecone_storage.py:106-117) from page images to
    time-windowed media, same opaque-binary + typed-metadata model
    (SURVEY §1.3).
    """
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(
            "doc_id",
            ((F.col("doc_id") * 31) % 300 + 5).cast("bigint").alias("duration_s"),
        )
    )

    out_schema = (
        "doc_id bigint, win_no int, start_s bigint, end_s bigint, rms double"
    )

    def decode_windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            reps = (pdf["duration_s"] + 9) // 10  # ceil(d/10), ints
            doc_id = pdf["doc_id"].repeat(reps).reset_index(drop=True)
            duration = pdf["duration_s"].repeat(reps).reset_index(drop=True)
            win_no = doc_id.groupby(doc_id).cumcount() + 1
            start = (win_no - 1) * 10
            end = (win_no * 10).clip(upper=duration)
            rms = ((doc_id * 7 + win_no) % 1000) / 1000.0
            yield pd.DataFrame(
                {
                    "doc_id": doc_id,
                    "win_no": win_no.astype("int32"),
                    "start_s": start,
                    "end_s": end,
                    "rms": rms.round(3),
                }
            )

    return (
        d.mapInPandas(decode_windows, schema=out_schema)
        .orderBy("doc_id", "win_no")
    )


@register(
    "multimodal_scene_cuts",
    oracle="""
    WITH v AS (
      SELECT doc_id, 10.0 + CAST(doc_id % 113 AS INTEGER) AS duration_s
      FROM documents WHERE doc_id % 5 = 0
    ), frames AS (
      SELECT doc_id,
             UNNEST(generate_series(1, CAST(FLOOR(duration_s / 2.5) AS INTEGER)))
               AS frame_no
      FROM v
    ), sigs AS (
      SELECT doc_id, frame_no,
             CAST(concat('0x', substr(md5(doc_id || '#' || frame_no), 1, 8)) AS BIGINT)
               % 1000 AS sig
      FROM frames
    ), cuts AS (
      SELECT doc_id, frame_no, sig,
             CASE WHEN ABS(sig - LAG(sig) OVER w) > 600 THEN 1 ELSE 0 END AS is_cut
      FROM sigs
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no)
    ), scenes AS (
      SELECT doc_id, frame_no,
             SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_no
                               ROWS UNBOUNDED PRECEDING) AS scene_id
      FROM cuts
    ), scene_len AS (
      SELECT doc_id, scene_id, COUNT(*) AS n FROM scenes GROUP BY doc_id, scene_id
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT)    AS n_frames,
           CAST(COUNT(*) AS BIGINT)  AS n_scenes,
           CAST(MAX(n) AS BIGINT)    AS longest_scene
    FROM scene_len
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot/scene segmentation over sampled video frames — the cut
    detector every video-curation pipeline runs before captioning or
    frame dedup (scene boundaries decide which frames are redundant):
    frame-to-frame signature distance over a per-video lag window, a
    cut where the jump exceeds threshold, then scene ids via the
    gaps-and-islands running sum and per-video scene stats.

    Decode is simulated (md5 frame signature standing in for a
    perceptual frame hash — container has no video libs, same
    convention as the rest of B.10's multimodal family and
    multimodal_image_phash's pluggable real-decoder hook), but the
    plumbing is the production shape: the frame explode is narrow, the
    lag + scene-id windows share ONE per-video sort, and the scene
    rollup re-uses the same partitioning — one exchange total for the
    whole segmentation, blobs never move.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    duration = F.lit(10.0) + (F.col("doc_id") % 113).cast("int")
    n_frames = F.floor(duration / 2.5).cast("int")
    frames = d.select(
        "doc_id", F.posexplode(F.sequence(F.lit(1), n_frames)).alias("_i", "frame_no")
    ).select("doc_id", "frame_no")
    sig = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("doc_id"), F.col("frame_no"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    cuts = frames.select(
        "doc_id",
        "frame_no",
        sig.alias("sig"),
    ).select(
        "doc_id",
        "frame_no",
        F.when(
            F.abs(F.col("sig") - F.lag("sig").over(w)) > 600, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_cut"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scenes = cuts.select(
        "doc_id", "frame_no", F.sum("is_cut").over(wrun).alias("scene_id")
    )
    scene_len = scenes.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        scene_len.groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_frames"),
            F.count(F.lit(1)).cast("bigint").alias("n_scenes"),
            F.max("n").cast("bigint").alias("longest_scene"),
        )
        .orderBy("doc_id")
    )


def compose_pdf(sections: list[tuple[str, str]]) -> bytes:
    """Assemble a minimal valid single-page PDF (no libraries) from
    (heading, body) sections: PDF 1.4 header, catalog/pages/page
    objects, one Helvetica text stream, a correct cross-reference
    table, %%EOF. Deterministic byte-for-byte for fixed input —
    fixture-testable without Pillow/fpdf (the sandbox has neither).
    Text is escaped per PDF string syntax; non-Latin-1 characters are
    replaced (a real deployment embeds a Unicode font program — out of
    scope the same way image decode is, multimodal module docstring)."""
    def esc(s: str) -> str:
        s = s.encode("latin-1", "replace").decode("latin-1")
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    lines = []
    y = 760
    for head, body in sections:
        lines.append((head, 14, y))
        y -= 22
        lines.append((body, 10, y))
        y -= 30
    content = "BT\n"
    for text, size, yy in lines:
        content += f"/F1 {size} Tf 72 {yy} Td ({esc(text)}) Tj 0 0 Td ET\nBT\n"
    content += "ET\n"
    stream = content.encode("latin-1")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream",
    ]
    out = b"%PDF-1.4\n"
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return out


@register(
    "report_pdf_sink",
    oracle=_REPORT_ORACLE,
)
def report_pdf_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PDF report artifact (A25, ra/agent.py:135-149
    via fpdf) done for real: report_compose's five sections are
    rendered into a genuinely valid single-page PDF (header, page
    tree, font object, content stream, xref table — assembled by
    compose_pdf, no libraries) and written next to the other sinks;
    structural validity is asserted in-op (magic bytes, object count,
    xref offset round-trip) before the oracle-checked report frame is
    returned. One driver-side write of a KB-sized artifact composed
    from aggregates — the data work is the same broadcast-joined
    aggregation plan as report_compose; the sink adds no distributed
    step (exactly like the reference, where fpdf runs on the
    single-node result)."""
    import os as _os

    from .scans import _adir

    df = report_compose(spark, sf_dir)
    row = df.first()
    sections = [
        ("Corpus Research Report", ""),
        ("Introduction", row.introduction),
        ("Key Findings", row.key_findings),
        ("Analysis", row.analysis),
        ("Conclusion", row.conclusion),
        ("Sources", row.sources),
    ]
    pdf = compose_pdf(sections)
    if not (pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")):
        raise AssertionError("malformed PDF envelope")
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    if not pdf[xref_at:].startswith(b"xref"):
        raise AssertionError("xref offset does not land on the xref table")
    if row.introduction.encode("latin-1", "replace") not in pdf:
        raise AssertionError("report text missing from content stream")
    # fingerprinted path (scans._adir): a shared un-fingerprinted
    # reports/ dir would let two fixture generations overwrite each
    # other's artifact with no way to tell whose it is
    out_dir = _adir(sf_dir, "reports")
    _os.makedirs(out_dir, exist_ok=True)
    with open(_os.path.join(out_dir, "corpus_report.pdf"), "wb") as fh:
        fh.write(pdf)
    # return the already-materialized row, not the lazy plan: the caller
    # (driver/oracle harness) would otherwise re-execute the whole
    # aggregation a second time for byte-identical output
    return spark.createDataFrame([row], df.schema)


def utf8_text_parser(data: bytes) -> str:
    """Plain-text `bytes→text` parser: UTF-8 decode with replacement.
    Deterministic and dependency-free — the default hook for
    binary_extract_text and the test oracle for the pluggable-parser
    plumbing (the pypdf twin below is the import-guarded real-document
    path)."""
    return bytes(data).decode("utf-8", "replace")


def pypdf_text_parser(data: bytes) -> str:
    """Real document-text extraction hook: pypdf → per-page
    extract_text, newline-joined. Import-guarded (pypdf is not in the
    CI container — tests importorskip it, same convention as
    pil_luma_decoder); a deployment with pypdf installed passes
    parser=pypdf_text_parser to binary_extract_text and gets true PDF
    parsing through the identical mapInPandas stage. Replaces the
    reference's delegated Docling OCR/convert step
    (parser_pinecone_storage.py:59-84) with an in-engine parse."""
    import io

    try:
        from pypdf import PdfReader
    except ImportError as ex:  # pragma: no cover - exercised only sans pypdf
        raise ImportError(
            "pypdf_text_parser requires pypdf; pass a custom parser or "
            "use utf8_text_parser for plain-text blobs"
        ) from ex
    reader = PdfReader(io.BytesIO(data))
    return "\n".join(page.extract_text() or "" for page in reader.pages)


def binary_extract_text(
    df: DataFrame, id_col: str, blob_col: str, parser=None
) -> DataFrame:
    """Composable document-text extraction (api.binary_extract_text):
    binary blobs in, (id, text, n_chars) out — the A3 ingest front end
    (parser_pinecone_storage.py:59-84 runs Docling over each S3 PDF)
    as ONE Arrow-batched mapInPandas stage, the same plumbing shape as
    phash_buckets' image-decoder hook.

    parser=None defaults to utf8_text_parser (plain-text blobs); pass
    pypdf_text_parser (or any bytes→str callable) for real document
    formats. Per-record isolation: a NULL blob or a parser that raises
    (corrupt file, wrong codec) yields a NULL text row, never a dead
    task — the A28 rule. Blobs die in the worker; only extracted text
    (and at scale, usually just its derived features) moves."""
    if parser is None:
        parser = utf8_text_parser
    if id_col in ("text", "n_chars"):
        raise ValueError(
            f"id_col={id_col!r} collides with a reserved output column of "
            "binary_extract_text ('text', 'n_chars'); rename the id column first"
        )

    def extract(batches):
        import pandas as pd

        def one(b):
            if b is None:
                return None
            try:
                return parser(bytes(b))
            except Exception:
                return None

        for pdf in batches:
            texts = [one(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "text": texts,
                    "n_chars": [len(t) if t is not None else None for t in texts],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(id_col, blob_col)
        .mapInPandas(extract, f"_id {id_type}, text string, n_chars long")
        .withColumnRenamed("_id", id_col)
    )


def fake_tables_parser(data: bytes) -> list[list[list[str]]]:
    """Deterministic FAKE `bytes→tables` parser (layout-analysis libs
    are not in this container): table count/shape/cells derive only
    from the blob bytes, so tests have an exact oracle. A real
    deployment swaps this one function (see docling_tables_parser);
    the mapInPandas plumbing around it is the production path."""
    if not data:
        return []
    n_tables = data[0] % 3
    out = []
    for t in range(1, n_tables + 1):
        n_rows = (len(data) + t) % 4 + 1
        n_cols = (data[-1] + t) % 3 + 1
        out.append(
            [[f"t{t}r{r}c{c}" for c in range(1, n_cols + 1)]
             for r in range(1, n_rows + 1)]
        )
    return out


def docling_tables_parser(data: bytes) -> list[list[list[str]]]:
    """Real layout-aware table extraction hook: Docling document
    conversion → per-table cell grid. Import-guarded (docling is not in
    the CI container — tests importorskip it, same convention as
    pypdf_text_parser / pil_luma_decoder); a deployment with docling
    installed passes parser=docling_tables_parser to
    binary_extract_tables and gets true PDF/DOCX table structure
    through the identical mapInPandas stage. Replaces the reference's
    delegated Docling table step (parser_pinecone_storage.py:91-103 —
    export_to_dataframe per table, uploaded as CSV) with an in-engine
    parse that keeps the engine's 1-BASED table keys (Appendix A.2)."""
    import io

    try:
        from docling.document_converter import DocumentConverter
        from docling_core.types.io import DocumentStream
    except ImportError as ex:  # pragma: no cover - exercised only sans docling
        raise ImportError(
            "docling_tables_parser requires docling; pass a custom parser "
            "or use fake_tables_parser for the deterministic test path"
        ) from ex
    conv = DocumentConverter()
    result = conv.convert(DocumentStream(name="blob", stream=io.BytesIO(data)))
    tables = []
    for tbl in result.document.tables:
        frame = tbl.export_to_dataframe()
        tables.append(
            [[str(c) for c in frame.columns]]
            + [[str(v) for v in row] for row in frame.itertuples(index=False)]
        )
    return tables


def binary_extract_tables(
    df: DataFrame, id_col: str, blob_col: str, parser=None
) -> DataFrame:
    """Composable layout-aware table extraction
    (api.binary_extract_tables): binary blobs in, one row per extracted
    table out — (id, table_no 1-BASED, s3_key, n_rows, n_cols,
    cells_csv) — the A6/A14 table-upload front end
    (parser_pinecone_storage.py:91-103 runs Docling table export per S3
    PDF and uploads `table_{n}.csv`) as ONE Arrow-batched mapInPandas
    stage, the same pluggable-hook shape as binary_extract_text.

    parser is any ``bytes -> list[list[list[str]]]`` callable (outer
    list = tables, then rows, then cells); None defaults to
    fake_tables_parser, docling_tables_parser is the import-guarded
    real-document path. Keys are 1-based by design — the engine-wide
    fix of the reference's off-by-one (SURVEY Appendix A.2). Per-record
    isolation (A28): a NULL blob or a raising parser yields zero table
    rows for that record, never a dead task; cells are flattened to a
    CSV-ish string (rows '\\n'-joined, cells ','-joined) so the output
    stays driver-canonicalizable flat columns. Blobs die in the worker;
    only the extracted structure moves."""
    if parser is None:
        parser = fake_tables_parser
    reserved = {"table_no", "s3_key", "n_rows", "n_cols", "cells_csv"}
    if id_col in reserved:
        raise ValueError(
            f"id_col={id_col!r} collides with a reserved output column "
            f"of binary_extract_tables ({sorted(reserved)}); rename it first"
        )

    def extract(batches):
        for pdf in batches:
            ids, nos, keys, nrs, ncs, cells = [], [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                try:
                    tables = parser(bytes(blob))
                except Exception:
                    continue
                for t_no, tbl in enumerate(tables, start=1):  # 1-based
                    ids.append(rid)
                    nos.append(t_no)
                    keys.append(f"doc_{rid}/table_{t_no}.csv")
                    nrs.append(len(tbl))
                    ncs.append(max((len(r) for r in tbl), default=0))
                    cells.append("\n".join(",".join(r) for r in tbl))
            yield pd.DataFrame(
                {
                    "_id": ids,
                    "table_no": nos,
                    "s3_key": keys,
                    "n_rows": nrs,
                    "n_cols": ncs,
                    "cells_csv": cells,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(id_col, blob_col)
        .mapInPandas(
            extract,
            f"_id {id_type}, table_no int, s3_key string, "
            "n_rows int, n_cols int, cells_csv string",
        )
        .withColumnRenamed("_id", id_col)
    )


def compose_markdown(sections: list[tuple[str, str]]) -> str:
    """Assemble the markdown/codelabs export (ExportOptions.tsx:20,31
    declares 'Export as PDF' and 'Export as Codelabs'; the codelabs
    toolchain consumes exactly this shape — an H1 title followed by H2
    step sections). Deterministic for fixed input; headings are the
    section names, bodies verbatim."""
    (title, _), *rest = sections
    out = [f"# {title}", ""]
    for head, body in rest:
        out += [f"## {head}", "", body, ""]
    return "\n".join(out)


@register(
    "report_markdown_sink",
    oracle=_REPORT_ORACLE,
)
def report_markdown_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's codelabs/markdown export (ExportOptions.tsx:31
    'Export as Codelabs' — declared in the frontend, absent in the
    backend, same gap the engine models for report_pdf_sink's PDF twin
    at :20): report_compose's five sections rendered to a markdown
    document (H1 title + H2 steps, the codelabs input shape) and
    written next to the other sinks; structure asserted in-op (heading
    count, section bodies present) before the oracle-checked report
    frame is returned. Like the PDF sink, the data work is the
    broadcast-joined aggregation plan; the sink adds no distributed
    step."""
    import os as _os

    from .scans import _adir

    df = report_compose(spark, sf_dir)
    row = df.first()
    sections = [
        (row.title, ""),
        ("Introduction", row.introduction),
        ("Key Findings", row.key_findings),
        ("Analysis", row.analysis),
        ("Conclusion", row.conclusion),
        ("Sources", row.sources),
    ]
    md = compose_markdown(sections)
    if md.count("\n## ") != 5 or not md.startswith("# Corpus Research Report"):
        raise AssertionError("malformed markdown structure")
    for _, body in sections[1:]:
        if body not in md:
            raise AssertionError("report section missing from markdown body")
    # fingerprinted path (scans._adir): a shared un-fingerprinted
    # reports/ dir would let two fixture generations overwrite each
    # other's artifact with no way to tell whose it is
    out_dir = _adir(sf_dir, "reports")
    _os.makedirs(out_dir, exist_ok=True)
    with open(_os.path.join(out_dir, "corpus_report.md"), "w") as fh:
        fh.write(md + "\n")
    # single-execution return, same as report_pdf_sink
    return spark.createDataFrame([row], df.schema)
