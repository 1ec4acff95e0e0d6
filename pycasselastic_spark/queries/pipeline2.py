"""Training-data pipeline breadth: deterministic sampling / mixing / sharding, vocabulary, contamination, curation chains, gap fill, packing, layout (Z-order), skew tooling, PPM multimodal codec, embedding LSH/IVF near-dup scale paths.

Split out of the monolithic catalog.py (round 8); registration
side-effects populate the shared QUERIES dict in queries.base.
"""

from __future__ import annotations

import os  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import (  # noqa: F401
    anti_echo,
    conflict_losers,
    lww_merge,
)
from pycasselastic_spark.core.incremental import scan_increment  # noqa: F401
from pycasselastic_spark.core.schema import align_schemas  # noqa: F401
from pycasselastic_spark.functions.aggregates import (  # noqa: F401
    money,
    money_expr_sum,
    money_sum,
)
from pycasselastic_spark.operators.relational import (  # noqa: F401
    asof_join,
    sessionize,
    topk_per_group,
)
from pycasselastic_spark.queries.base import (  # noqa: F401
    QUERIES,
    _STORES_SQL,
    _event_stores,
    _t,
    register,
)
from pycasselastic_spark.core import convert as CV  # noqa: F401,E402
from pycasselastic_spark.functions import text as TX  # noqa: F401,E402
from pycasselastic_spark.operators import dedup as D  # noqa: F401,E402
from pycasselastic_spark.operators import multimodal as M  # noqa: F401,E402
from pycasselastic_spark.operators import sampling as SP  # noqa: F401,E402
from pycasselastic_spark.operators import similarity as S  # noqa: F401,E402
from pycasselastic_spark.operators import sketches as SK  # noqa: F401,E402
from pycasselastic_spark.plans.tuning import ensure_parallelism  # noqa: F401,E402
from pycasselastic_spark.streaming.windows import (  # noqa: F401,E402
    sliding_event_counts,
)
from pycasselastic_spark.streaming.sync import (  # noqa: F401,E402
    SnapshotStore,
    read_event_stream,
    read_table_stream,
    start_streaming_sync,
)
from pycasselastic_spark.queries.pipeline_text import (  # noqa: F401
    _CDOT_SQL,
    _DOT_SQL,
    _MEAN_SQL,
    _STOPS_SQL,
    _UNIT_SQL,
    _ivf_centroids_sql,
)
from pycasselastic_spark.queries.streaming_q import (  # noqa: F401
    _run_stream_to_parquet,
)


# ---------------------------------------------------------------------------
# Training-data pipeline batch 2: deterministic sampling/mixing/sharding,
# vocabulary building, benchmark-contamination detection, an end-to-end
# curation pipeline, and the LSH scale twin for embedding near-dup.
# ---------------------------------------------------------------------------

from pycasselastic_spark.operators import sampling as SP  # noqa: E402


@register(
    "stratified_sample_documents",
    """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000' ELSE '2000' END
""",
    doc="Deterministic per-language stratified sampling (the "
    "reproducible twin of sampleBy): keep-decision = md5(doc_id) hex "
    "prefix under a per-stratum threshold — stable across re-runs, "
    "partitionings and engines; narrow filter, no shuffle "
    "(operators/sampling.py).",
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = SP.stratified_sample(
        docs,
        key_col="doc_id",
        strata_col="lang",
        rates={"en": 0.5, "de": 0.25},
        default_rate=0.125,
    )
    return out.select("doc_id", "lang", "source", "n_chars")


@register(
    "weighted_sample_documents",
    """
WITH u AS (
  SELECT doc_id, n_chars,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT::DOUBLE
           / 4503599627370496.0 AS uni
  FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       round(pow(uni, 1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)), 12)
         AS sample_key
FROM (SELECT *, ROW_NUMBER() OVER (
        ORDER BY pow(uni, 1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)) DESC,
                 doc_id) AS rn
      FROM u)
WHERE rn <= 20
""",
    doc="Weighted sampling without replacement (Efraimidis-Spirakis "
    "A-ES, operators/sampling.py:weighted_sample_topk): uniform u from "
    "52 md5 bits of the key, keep the 20 largest u^(1/n_chars) — "
    "selection odds proportional to document length, fully "
    "deterministic (the mixing-weights primitive, minus the RNG). "
    "Executes as TakeOrderedAndProject: per-partition heaps, k-row "
    "merge, no global sort.",
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return SP.weighted_sample_topk(docs, "doc_id", "n_chars", 20).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "sample_key"
    )


@register(
    "shard_assignment_documents",
    """
SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY shard
""",
    doc="Stable 16-way corpus sharding by md5 key prefix with per-shard "
    "balance stats; at scale the shard column feeds "
    "write.partitionBy(shard) so any engine can locate a document from "
    "its key alone (operators/sampling.py:hash_shard).",
)
def shard_assignment_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("shard", SP.hash_shard("doc_id"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register(
    "vocab_top_terms",
    """
SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY term_freq DESC, token
LIMIT 50
""",
    doc="Vocabulary building: explode tokens -> global term/document "
    "frequencies -> top-50 (token tiebreak). The classic wide-shuffle "
    "op; partial aggregation combines counts map-side before the "
    "token-keyed exchange.",
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(TX.words("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), F.col("token"))
        .limit(50)
    )


@register(
    "contamination_overlap",
    """
WITH sh AS (
  SELECT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) >= 3
           THEN list_distinct(list_transform(
                  range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2]))
           ELSE [] END) AS shingle
  FROM documents)
SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
FROM sh c JOIN sh b ON c.shingle = b.shingle
WHERE b.doc_id < 10 AND c.doc_id >= 10
GROUP BY c.doc_id, b.doc_id
HAVING COUNT(*) >= 2
""",
    doc="Benchmark-contamination check: corpus documents sharing >= 2 "
    "distinct 3-gram shingles with any benchmark document (ids < 10). "
    "Equi-join on the shingle value — shuffle keyed by shingle, no "
    "cross product; the benchmark side is tiny and broadcast.",
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(D.shingles("text", 3)).alias("shingle")
    )
    bench = sh.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corpus = sh.filter(F.col("doc_id") >= 10)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "curation_pipeline_documents",
    f"""
WITH q AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             w -> list_contains({_STOPS_SQL}, w))) / len(string_split(text, ' ')) AS stop_ratio,
         length(replace(text, ' ', '')) / len(string_split(text, ' ')) AS mean_word_len,
         md5(lower(text)) AS fp
  FROM documents),
scored AS (
  SELECT *, least(n_tokens, 100) / 100 * 0.4 + stop_ratio * 0.3
            + least(mean_word_len, 10.0) / 10 * 0.3 AS quality
  FROM q
  WHERE lang = 'en' AND n_chars BETWEEN 100 AND 450 AND n_tokens >= 20),
kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM scored WHERE quality >= 0.35)
SELECT doc_id, lang, n_chars, n_tokens, quality FROM kept WHERE rn = 1
""",
    doc="End-to-end corpus curation: language filter -> length/token "
    "bounds -> heuristic quality threshold -> exact dedup by content "
    "fingerprint (lowest doc_id wins). One narrow pass for scoring, "
    "one fingerprint-keyed shuffle for the dedup — the canonical "
    "pretraining-data filter chain as a single declarative plan.",
)
def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    ws = TX.words("text")
    scored = (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.size(ws).alias("n_tokens"),
            TX.quality_score("text").alias("quality"),
            TX.content_fingerprint("text").alias("fp"),
        )
        .filter(
            (F.col("lang") == "en")
            & F.col("n_chars").between(100, 450)
            & (F.col("n_tokens") >= 20)
            & (F.col("quality") >= 0.35)
        )
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars", "n_tokens", "quality")
    )


# Recall target for the REGISTERED corpus-scaled LSH near-dup query.
# The corpus's planted near-dups sit at cosine ~0.4-0.5 — the
# near-orthogonal regime where sign-LSH per-bit agreement is ~0.63, so
# high recall would force the band width below log2(n) (quadratic
# candidates, the r4 SCALING.md caveat). 0.6 keeps width at its
# log2(n)-feasible value so candidates stay pruned by a 2^width
# factor; the high-recall low-threshold path is the value-oracled IVF
# twin (embedding_ivf_neardup).
_LSH_AUTO_THRESHOLD = 0.4
_LSH_AUTO_RECALL = 0.6


def _embedding_lsh_auto_oracle(sf_dir: str) -> str | None:
    """Render the LSH near-dup oracle with the SAME corpus-scaled
    parameters the Spark side derives: n comes from a DuckDB count of
    the embeddings table, (planes, bands) from lsh_params_for — pure
    arithmetic on n, so both engines agree by construction. Everything
    downstream (md5 planes, mean-centering, sequential-fold signature
    bits, band keys, exact-cosine verify) replays bit-for-bit."""
    import os

    import duckdb

    from pycasselastic_spark.operators.similarity import lsh_params_for

    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{path}')"
    ).fetchone()[0]
    num_planes, num_bands = lsh_params_for(
        n, _LSH_AUTO_THRESHOLD, _LSH_AUTO_RECALL
    )
    width = num_planes // num_bands
    return f"""
WITH {_UNIT_SQL},
{_MEAN_SQL},
planes AS (
  SELECT p, list_transform(range(0, 64), d ->
    CASE WHEN ('0x' || substring(md5('plane' || p || ':dim' || d), 1, 2))::INT % 2 = 1
         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS vec
  FROM range(0, {num_planes}) t(p)
),
sigs AS (
  SELECT e.vec_id,
         string_agg(CASE WHEN list_sum(list_transform(range(1, 65),
                           k -> (e.u[k] - ma.mv[k]) * pl.vec[k])) >= 0
                         THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS sig
  FROM eu e CROSS JOIN planes pl CROSS JOIN marr ma GROUP BY e.vec_id
),
banded AS (
  SELECT vec_id, b AS band_idx, substring(sig, b * {width} + 1, {width}) AS band_key
  FROM sigs, range(0, {num_bands}) t(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS doc_a, c.vec_id AS doc_b
  FROM banded a JOIN banded c
    ON a.band_idx = c.band_idx AND a.band_key = c.band_key
  WHERE a.vec_id < c.vec_id
)
SELECT doc_a, doc_b, cosine FROM (
  SELECT cand.doc_a, cand.doc_b,
         {_DOT_SQL.format(a='x.u', b='y.u')} AS cosine
  FROM cand
  JOIN eu x ON x.vec_id = cand.doc_a
  JOIN eu y ON y.vec_id = cand.doc_b)
WHERE cosine >= {_LSH_AUTO_THRESHOLD}
"""


@register(
    "embedding_lsh_neardup",
    _embedding_lsh_auto_oracle,  # corpus-scaled parameters, replayed per sf
    doc="Embedding near-dup pairs via hyperplane-LSH banding with "
    "CORPUS-SCALED parameters (operators/dedup.py:"
    "embedding_lsh_pairs_auto): band width tracks log2(n) so the "
    "candidate join prunes by a 2^width factor instead of the fixed "
    "small-band configuration that degraded toward O(n^2) at scale. "
    "Fully oracle-checked: the oracle re-derives n, (planes, bands), "
    "md5 planes, centered sequential-fold signatures, band candidates "
    "and the exact-cosine verify bit-for-bit in SQL. Recall tradeoff "
    "at this low threshold is explicit (_LSH_AUTO_RECALL); the "
    "asymptotic low-threshold path is embedding_ivf_neardup.",
)
def embedding_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    return D.embedding_lsh_pairs_auto(
        emb, "vec_id", "embedding",
        threshold=_LSH_AUTO_THRESHOLD, dim=64,
        target_recall=_LSH_AUTO_RECALL,
    )


@register(
    "streaming_sliding_window_events",
    """
SELECT ws AS window_start,
       ws + INTERVAL 10 MINUTES AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM (
  SELECT event_type,
         time_bucket(INTERVAL 5 MINUTES, CAST(ts AS TIMESTAMP))
           - to_minutes(5 * k) AS ws
  FROM events, (SELECT unnest([0, 1]) AS k) dup)
GROUP BY 1, 2, 3
""",
    doc="Sliding (overlapping) event-time windows as a real Structured "
    "Streaming query (10-minute windows sliding by 5: every event lands "
    "in exactly two windows). Watermark bounds window state; the oracle "
    "re-derives the two epoch-aligned windows per event in SQL "
    "(streaming/windows.py:sliding_event_counts).",
)
def streaming_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = sliding_event_counts(stream)
    return _run_stream_to_parquet(spark, agg, "complete")


@register(
    "streaming_dedup_events",
    """
SELECT event_id, user_id, event_type, value FROM events
""",
    doc="Exactly-once dedup of a re-delivered stream: the events file "
    "is delivered TWICE through the file source and "
    "dropDuplicatesWithinWatermark(event_id) must collapse the replay "
    "back to the original rows. WithinWatermark (not plain "
    "dropDuplicates) is the scale posture: key state is dropped once "
    "the watermark passes instead of growing forever.",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    src = f"{sf_dir}/events.parquet"
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    shutil.copy(src, os.path.join(tmp, "delivery1.parquet"))
    shutil.copy(src, os.path.join(tmp, "delivery2.parquet"))
    stream = read_event_stream(spark, tmp)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    result = _run_stream_to_parquet(spark, deduped, "append")
    shutil.rmtree(tmp, ignore_errors=True)  # parquet sink holds the rows
    return result


@register(
    "tfidf_top_terms_per_doc",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1)
SELECT doc_id, token, tf, df, score FROM (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.df, tf.tf / dfq.df AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf / dfq.df DESC, tf.token) AS rn
  FROM tf JOIN dfq USING (token))
WHERE rn <= 3
""",
    doc="Per-document top-3 distinguishing terms by tf/df weighting "
    "(the log-free tf-idf variant: int/int division is exactly rounded "
    "in both engines, ln() is not). Two partial-aggregated shuffles "
    "(doc-term counts, term document frequencies) + a term-keyed join "
    "+ windowed top-k — the vocabulary-scoring pattern at corpus scale.",
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(TX.words("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") / F.col("df")).desc(), F.col("token")
    )
    return (
        tf.join(dfq, "token")
        .withColumn("score", F.col("tf") / F.col("df"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "df", "score")
    )


@register(
    "label_centroid_embeddings",
    """
WITH dims AS (SELECT k AS dim FROM range(1, 65) t(k)),
e AS (
  SELECT label, dim,
         CAST(FLOOR(CAST(embedding[dim] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
  FROM embeddings, dims)
SELECT label, dim,
       CAST(SUM(q) AS DOUBLE) / (1048576.0 * COUNT(*)) AS centroid
FROM e GROUP BY label, dim
""",
    doc="Per-label mean embedding (the distributed centroid step of "
    "clustering / class-prototype computation): posexplode to "
    "(label, dim, value), one partial-aggregated shuffle keyed by "
    "(label, dim). Values are accumulated in Q20 fixed point "
    "(floor(v * 2^20) — scaling by a power of two is exact in binary "
    "floating point, and the integer sum is order-independent), the "
    "deterministic-distributed-float-aggregation trick; a raw double "
    "sum would differ between engines and shuffle orders. DECIMAL "
    "rounding was rejected: double->decimal cast ties round "
    "differently across engines.",
)
def label_centroid_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "label",
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            F.floor(F.col("val").cast("double") * F.lit(1048576.0))
            .cast("bigint")
            .alias("q"),
        )
        .groupBy("label", "dim")
        .agg(
            (
                F.sum("q").cast("double") / (F.lit(1048576.0) * F.count(F.lit(1)))
            ).alias("centroid")
        )
    )


@register(
    "multimodal_audio_resample",
    """
WITH m AS (
  SELECT doc_id, repeat(substring(md5(text), 1, 8), 8) AS payload
  FROM documents WHERE doc_id % 3 = 1)
SELECT doc_id AS media_id,
       CAST(8000 AS INT) AS out_rate,
       CAST(length(payload) AS INT) AS orig_bytes,
       CAST((length(payload) + 1) // 2 AS INT) AS n_bytes,
       md5(array_to_string(list_transform(
             range(0, (length(payload) + 1) // 2),
             i -> substring(payload, 2 * i + 1, 1)), '')) AS resampled_md5
FROM m
""",
    doc="Audio 'resample' by payload decimation over Arrow batches "
    "(operators/multimodal.py:resample_audio — a real resampler swaps "
    "the per-batch kernel only). Fully value-checked: the oracle "
    "re-derives the decimated byte stream and its md5 from the fake "
    "wire format in SQL.",
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ensure_parallelism(M.synthesize_media(spark, sf_dir), spark)
    return M.resample_audio(media, factor=2)


@register(
    "multimodal_image_resize",
    """
SELECT doc_id AS media_id,
       'FIMG|8|4|1;' || substring(repeat(substring(md5(text), 1, 8), 8), 1, 4)
         AS content_str
FROM documents WHERE doc_id % 3 = 0
""",
    doc="Image 'resize' (binary in -> binary out with rewritten header "
    "dims and truncated payload; operators/multimodal.py:resize_images). "
    "The resized binary is decoded back to UTF-8 so the oracle can "
    "value-check the exact output bytes.",
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ensure_parallelism(M.synthesize_media(spark, sf_dir), spark)
    return M.resize_images(media, 8, 4).select(
        "media_id", F.decode(F.col("content"), "UTF-8").alias("content_str")
    )


# Shared CTE: the synthesized PPM rasters replayed from documents —
# dims (w, h) and the raster hex string exactly as synthesize_ppm_media
# builds them column-side (repeat(md5(text)) truncated to w*h*3 bytes).
_PPM_SQL = """
ppm AS (
  SELECT doc_id, (doc_id % 16 + 4) AS w, (doc_id % 8 + 2) AS h,
         substring(repeat(md5(text), 33), 1,
                   CAST((doc_id % 16 + 4) * (doc_id % 8 + 2) * 6 AS INT)) AS hx
  FROM documents)
"""


@register(
    "multimodal_ppm_decode_stats",
    f"""
WITH {_PPM_SQL},
b AS (
  SELECT doc_id, w, h,
         ('0x' || substring(hx, CAST(k * 2 + 1 AS INT), 2))::INT AS byte,
         k % 3 AS chan
  FROM ppm, LATERAL (SELECT unnest(range(0, w * h * 3)) AS k) t)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(SUM(CASE WHEN chan = 0 THEN byte END) AS DOUBLE) / (w * h) AS mean_r,
       CAST(SUM(CASE WHEN chan = 1 THEN byte END) AS DOUBLE) / (w * h) AS mean_g,
       CAST(SUM(CASE WHEN chan = 2 THEN byte END) AS DOUBLE) / (w * h) AS mean_b
FROM b GROUP BY doc_id, w, h
""",
    doc="REAL codec decode: parse binary PPM (P6) files — a public "
    "Netpbm format needing no codec library — and report per-channel "
    "means (operators/multimodal.py:decode_ppm/ppm_channel_stats). The "
    "oracle re-derives every raster byte from the md5 hex and matches "
    "the means exactly: the decoder's byte-level parse is value-checked.",
)
def multimodal_ppm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ensure_parallelism(M.synthesize_ppm_media(spark, sf_dir), spark)
    return M.ppm_channel_stats(media.select("media_id", "content"))


@register(
    "multimodal_ppm_resize",
    f"""
WITH {_PPM_SQL},
hdr AS (SELECT lower(hex(CAST('P6' || chr(10) || '8 4' || chr(10) || '255'
                              || chr(10) AS BLOB))) AS hh),
px AS (
  SELECT doc_id,
         substring(hx,
           CAST((((((k // 24) * h) // 4) * w + ((((k % 24) // 3) * w) // 8))
                 * 3 + k % 3) * 2 + 1 AS INT), 2) AS pair,
         k
  FROM ppm, LATERAL (SELECT unnest(range(0, 96)) AS k) t)
SELECT doc_id AS media_id, CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
       (SELECT hh FROM hdr) || string_agg(pair, '' ORDER BY k) AS content_hex
FROM px GROUP BY doc_id
""",
    doc="REAL codec resize: decode P6 -> nearest-neighbor resize to 8x4 "
    "(pure integer index map src=(dst*extent)//out) -> re-encode P6 "
    "(operators/multimodal.py:ppm_resize). The oracle rebuilds the "
    "entire output FILE hex — header plus every remapped raster byte — "
    "so encoder, resampler and decoder are all value-checked "
    "byte-for-byte.",
)
def multimodal_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ensure_parallelism(M.synthesize_ppm_media(spark, sf_dir), spark)
    return M.ppm_resize(media.select("media_id", "content"), 8, 4).select(
        "media_id", "width", "height",
        F.lower(F.hex("content")).alias("content_hex"),
    )


# Z-order oracle: the same floor-quantization and bit-interleaving as
# plans/layout.py, generated as inline shift/mask terms (16 bits per
# column, column 0 in the even bit lanes).
_Z_BITS = 16
_ZQ_SQL = (
    "CAST(FLOOR(LEAST(GREATEST(({x} - {lo}) / ({hi} - {lo}), 0.0), 1.0) "
    f"* {float(2**_Z_BITS - 1)}) AS BIGINT)"
)
_Z_INTERLEAVE_SQL = " | ".join(
    f"(((q{c} >> {i}) & 1) << {i * 2 + c})"
    for i in range(_Z_BITS)
    for c in (0, 1)
)


@register(
    "zorder_key_events",
    f"""
WITH q AS (
  SELECT event_id,
         {_ZQ_SQL.format(x='CAST(user_id AS DOUBLE)', lo='0.0', hi='1024.0')} AS q0,
         {_ZQ_SQL.format(x='value', lo='0.0', hi='1000.0')} AS q1
  FROM events)
SELECT event_id, {_Z_INTERLEAVE_SQL} AS zkey
FROM q
""",
    doc="Z-order (Morton) clustering key over (user_id, value): floor "
    "quantization onto a 2^16 grid + bit interleaving, pure bigint "
    "expressions (plans/layout.py:zorder_key). Range-partitioning and "
    "sorting by this key makes parquet min/max stats tight on BOTH "
    "columns per file — multi-column data skipping at 100 TB; the "
    "locality win is asserted quantitatively in tests/test_layout.py.",
)
def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.plans.layout import quantize, zorder_key

    ev = _t(spark, sf_dir, "events")
    key = zorder_key(
        [
            quantize(F.col("user_id"), 0.0, 1024.0, bits=16),
            quantize(F.col("value"), 0.0, 1000.0, bits=16),
        ],
        bits=16,
    )
    return ev.select("event_id", key.alias("zkey"))


def _ivf_cells_for(n: int) -> int:
    """Corpus-scaled IVF cell count: cells ~ sqrt(n) keeps expected
    per-cell membership ~ sqrt(n), so the blocked candidate volume
    n_assign^2 * n^2 / (2 * cells) grows ~ n^1.5 instead of n^2 at
    fixed cells. Pure arithmetic on the corpus count — the oracle
    derives the same value from its own COUNT(*), so both engines
    agree by construction."""
    import math

    return max(8, math.isqrt(n))


def _embedding_ivf_neardup_oracle(sf_dir: str) -> str | None:
    import os

    import duckdb

    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{path}')"
    ).fetchone()[0]
    cents = _ivf_centroids_sql(sf_dir, n_cells=_ivf_cells_for(n), seed=42)
    if cents is None:
        return None
    return f"""
WITH {_UNIT_SQL},
{cents},
cdot AS (
  SELECT e.vec_id, c.cell,
         {_CDOT_SQL.format(u='e.u', c='c.cvec')} AS d
  FROM eu e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rn
    FROM cdot) WHERE rn <= 3),
cand AS (
  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM assigned a JOIN assigned b USING (cell)
  WHERE a.vec_id < b.vec_id)
SELECT doc_a, doc_b,
       {_DOT_SQL.format(a='ua.u', b='ub.u')} AS cosine
FROM cand
JOIN eu ua ON ua.vec_id = doc_a
JOIN eu ub ON ub.vec_id = doc_b
WHERE {_DOT_SQL.format(a='ua.u', b='ub.u')} >= 0.4
"""


@register(
    "embedding_ivf_neardup",
    _embedding_ivf_neardup_oracle,  # deterministic centroids replayed
    doc="Cell-blocked embedding near-dup (cluster-then-compare, the "
    "semantic-dedup scale path): spherical-k-means cells bound the "
    "candidate space by sum(cell_size^2). n_cells now SCALES with the "
    "corpus (cells ~ sqrt(n), catalog._ivf_cells_for) so per-vector "
    "candidate work stays ~sqrt(n) instead of the fixed-cell n "
    "(operators/dedup.py:embedding_ivf_pairs). Value-oracled via the "
    "materialized deterministic centroid table rendered at the same "
    "scaled cell count.",
)
def embedding_ivf_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    n_cells = _ivf_cells_for(emb.count())
    return D.embedding_ivf_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_cells=n_cells, n_assign=3
    )


@register(
    "udtf_chunk_documents",
    """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 50)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       array_to_string(ws[i * 20 + 1 : i * 20 + 20], ' ') AS chunk,
       CAST(least(20, len(ws) - i * 20) AS INT) AS n_tokens
FROM t, LATERAL (SELECT unnest(range(0, (len(ws) + 19) // 20)) AS i)
""",
    doc="Python UDTF (Spark 4 table function): split each document into "
    "20-token chunks, one output row per chunk — the context-window "
    "packing shape. Completes the UDF/UDAF/UDTF API trio next to the "
    "Pandas-UDF and applyInPandas edges; UDTFs are the row-based slow "
    "path, so the catalog keeps the input bounded and the oracle "
    "replays the chunking with list slicing in SQL.",
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str, size: int):
            ws = text.split(" ")
            for i in range(0, (len(ws) + size - 1) // size):
                piece = ws[i * size : (i + 1) * size]
                yield doc_id, i, " ".join(piece), len(piece)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.* FROM _udtf_docs, "
        "LATERAL chunk_doc(doc_id, text, 20) AS c"
    )


@register(
    "window_function_suite_orders",
    """
SELECT o_orderkey, o_custkey,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       FIRST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Window-function breadth: lag/lead/ntile/percent_rank/cume_dist "
    "+ framed first/last_value per customer, unique (orderdate, "
    "orderkey) tiebreak everywhere. percent_rank and cume_dist are "
    "int/int divisions — exactly rounded in both engines.",
)
def window_function_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
    )


@register(
    "date_arithmetic_suite_orders",
    """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS o_day,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS o_quarter,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + 30 AS plus_30d,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS BIGINT) AS days_since_1995
FROM orders
""",
    doc="Scalar date/time arithmetic breadth: extract fields, month "
    "truncation, last_day, day offsets and day differences — all "
    "calendar-exact (no timezone arithmetic; session pinned UTC).",
)
def date_arithmetic_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("o_year"),
        F.month(d).cast("bigint").alias("o_month"),
        F.dayofmonth(d).cast("bigint").alias("o_day"),
        F.quarter(d).cast("bigint").alias("o_quarter"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("plus_30d"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_1995"),
    )


@register(
    "q8_market_share",
    """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'ECONOMY') all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 shape: 8-way join, region-filtered customers, "
    "share-of-total CASE ratio per year. Decimal sums, double division "
    "once at the end.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = money("l_extendedprice") * (1 - money("l_discount"))
    share_vol = F.when(F.col("nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            (F.sum(share_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q9_product_profit",
    """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           - CAST(p_retailprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%e%') profit
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 shape: profit per supplier-nation per year with a "
    "LIKE filter on part names (p_retailprice stands in for the absent "
    "partsupp supplycost). Exercises LIKE pushdown + 5-way join + "
    "two-column rollup.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = money("l_extendedprice") * (1 - money("l_discount")) - money(
        "p_retailprice"
    ) * money("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money_expr_sum(F.col("amount"), "sum_profit"))
    )


@register(
    "q13_order_count_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: left outer join with an extra join-side "
    "predicate, then a two-level aggregation (orders per customer -> "
    "histogram of counts). COUNT(col) counts non-NULL only — customers "
    "with no qualifying orders land in the 0 bucket.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 shape: aggregate-derived view joined back against "
    "its own MAX (scalar subquery over a CTE) — the classic "
    "top-supplier query; the revenue view computes once per branch.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    vol = money("l_extendedprice") * (1 - money("l_discount"))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_expr_sum(vol, "total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity), decorrelated into an aggregate + join; the average is "
    "exact-decimal-sum / count so both engines agree bitwise.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("_pk"))
        .agg(
            (
                F.lit(0.2)
                * (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)))
            ).alias("_qty_bar")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_bar"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "funnel_conversion_events",
    """
WITH stage AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_buy
  FROM events GROUP BY user_id)
SELECT
  COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
    AS purchased_after_click
FROM stage
""",
    doc="Funnel conversion (view -> click -> purchase in strict time "
    "order, by first occurrence per stage): one conditional-MIN "
    "aggregation per user, then counting stage survivors — the "
    "product-analytics sequence query as two partial-aggregated "
    "shuffles, no self-joins.",
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    stage = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_int(viewed).alias("viewed"),
        as_int(clicked).alias("clicked_after_view"),
        as_int(bought).alias("purchased_after_click"),
    )


@register(
    "retention_cohorts_events",
    """
WITH firsts AS (
  SELECT user_id,
         CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
  FROM events)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.week) // 7 AS BIGINT) AS week_offset,
       COUNT(*) AS active_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort, week_offset
""",
    doc="Retention cohorts: users bucketed by first-activity week, "
    "counted per subsequent active week offset — first-touch "
    "aggregation joined back to distinct weekly activity; all shuffles "
    "keyed by user or (cohort, offset), calendar-exact week truncation "
    "(both engines start weeks on Monday).",
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort")) / 7)
            .cast("bigint"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "session_stats_events",
    """
WITH e AS (SELECT user_id, event_type, value,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
g AS (
  SELECT user_id, us, event_type, value,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us, event_type, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         max(us) - min(us) AS duration_us,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
  FROM s GROUP BY user_id, session_id)
SELECT
  COUNT(*) AS n_sessions,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
  CAST(SUM(n_events) AS BIGINT) AS total_events,
  CAST(SUM(duration_us) // 1000000 AS BIGINT)
    AS total_duration_s,
  CAST(SUM(n_purchases) AS BIGINT) AS total_purchases,
  CAST(SUM(CAST(session_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM per_session
""",
    doc="Session-level rollup composed on the sessionize operator: "
    "per-session duration/bounce/purchase/value stats, then a global "
    "summary — integer-microsecond durations and decimal-exact money "
    "keep the two-level rollup hashable cross-engine.",
)
def session_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.unix_micros("ts").alias("us")
    )
    sess = sessionize(ev, ["user_id"], "us", gap_seconds=1_800_000_000)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        money_sum("value", "session_value"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("bounces"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        # INTEGER division micros -> whole seconds: routing through a
        # double + cast was a latent cross-engine trap (DuckDB's
        # double->bigint CAST rounds, Spark's truncates — they diverged
        # by 1 s at sf0.001 when the fraction crossed .5)
        F.expr("CAST(sum(duration_us) DIV 1000000 AS BIGINT)")
        .alias("total_duration_s"),
        F.sum("n_purchases").cast("bigint").alias("total_purchases"),
        money_sum("session_value", "total_value"),
    )


@register(
    "q21_sole_supplier_orders",
    """
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_suppkey, s_name
""",
    doc="TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the "
    "same fact table (multi-supplier orders where this supplier shipped "
    "strictly last), planned as a semi join + anti join on the order "
    "key. The classic late-supplier blame query.",
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = _t(spark, sf_dir, "supplier")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    others = li.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_suppkey").alias("_sk"),
        F.col("l_shipdate").alias("_sd"),
    )
    with_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
        "left_semi",
    )
    not_latest = with_other.join(
        others,
        (F.col("l_orderkey") == F.col("_ok"))
        & (F.col("l_suppkey") != F.col("_sk"))
        & (F.col("_sd") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        not_latest.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "array_function_suite_embeddings",
    """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       list_sum(list_transform(embedding, x -> x::DOUBLE)) AS vec_sum,
       list_sum(list_transform(
         list_filter(embedding, x -> x > 0), x -> x::DOUBLE)) AS pos_sum,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       CAST(embedding[1] AS DOUBLE) AS first_comp,
       CAST(list_sort(embedding)[len(embedding)] AS DOUBLE) AS max_comp,
       list_sum(list_transform(embedding[1:8],
                x -> x::DOUBLE * x::DOUBLE)) AS head_sq_sum
FROM embeddings
""",
    doc="Array higher-order-function breadth over the embedding column: "
    "transform / filter / slice / sort / element access / sequential "
    "fold — the JVM-side array toolkit ANN and dedup are built from, "
    "exercised directly. Sequential-double folds keep sums bit-exact "
    "cross-engine.",
)
def array_function_suite_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    pos = F.filter(e, lambda x: x > 0)
    return emb.select(
        "vec_id",
        F.size(e).cast("int").alias("dim"),
        fold(e).alias("vec_sum"),
        fold(pos).alias("pos_sum"),
        F.size(pos).cast("int").alias("n_pos"),
        F.element_at(e, 1).cast("double").alias("first_comp"),
        F.element_at(F.array_sort(e), F.size(e)).cast("double").alias("max_comp"),
        F.aggregate(
            F.slice(e, 1, 8),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("head_sq_sum"),
    )


@register(
    "q20_part_supplier_chain",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
""",
    doc="TPC-H Q20 shape: two-level nested IN chain (parts by LIKE -> "
    "suppliers by shipped-quantity HAVING -> supplier projection), "
    "planned as stacked semi joins with the aggregate in the middle.",
)
def q20_part_supplier_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    big_suppliers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
    )
    return supplier.join(
        F.broadcast(big_suppliers),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


@register(
    "regex_suite_events",
    """
SELECT event_id,
       regexp_extract(props, '[0-9]+', 0) AS first_number,
       regexp_replace(props, '[0-9]+', '#') AS masked,
       CAST(regexp_matches(props, '"k": [0-9]{2}') AS INT) AS has_2digit,
       CAST(len(regexp_extract_all(props, '[0-9]')) AS INT) AS n_digits
FROM events WHERE event_id < 500
""",
    doc="Regex breadth over the props JSON strings: extract, replace, "
    "boolean match, match counting — simple character-class patterns "
    "whose semantics are identical across the Java and RE2-style "
    "engines.",
)
def regex_suite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    p = F.col("props")
    return ev.select(
        "event_id",
        F.regexp_extract(p, "[0-9]+", 0).alias("first_number"),
        F.regexp_replace(p, "[0-9]+", "#").alias("masked"),
        p.rlike('"k": [0-9]{2}').cast("int").alias("has_2digit"),
        F.size(F.regexp_extract_all(p, F.lit("[0-9]"), F.lit(0)))
        .cast("int")
        .alias("n_digits"),
    )


@register(
    "q2_min_price_supplier",
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey, l_extendedprice
  FROM lineitem),
best AS (
  SELECT l_partkey AS bp, MIN(l_extendedprice) AS min_price
  FROM offers GROUP BY l_partkey)
SELECT p_partkey, p_name, s_suppkey, s_name, o.l_extendedprice AS price
FROM offers o, best, part, supplier
WHERE o.l_partkey = bp AND o.l_extendedprice = min_price
  AND p_partkey = o.l_partkey AND s_suppkey = o.l_suppkey
  AND p_size <= 5
  AND o.l_suppkey = (SELECT MIN(o2.l_suppkey) FROM offers o2
                     WHERE o2.l_partkey = o.l_partkey
                       AND o2.l_extendedprice = best.min_price)
""",
    doc="TPC-H Q2 shape: argmin-per-group with join-back (cheapest "
    "offer per part, supplier-key tiebreak making the argmin unique) — "
    "the relational dual of the LWW argmax merge, expressed with "
    "min_by(struct) so the shuffle carries one candidate per key.",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    supplier = _t(spark, sf_dir, "supplier")
    best = (
        li.groupBy("l_partkey")
        .agg(
            F.min_by(
                F.struct(
                    F.col("l_extendedprice").alias("price"),
                    F.col("l_suppkey").alias("supp"),
                ),
                F.struct("l_extendedprice", "l_suppkey"),
            ).alias("_b")
        )
        .select(
            "l_partkey",
            F.col("_b.price").alias("price"),
            F.col("_b.supp").alias("l_suppkey"),
        )
    )
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "price")
    )


@register(
    "q16_supplier_variety",
    """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape: NOT IN subquery + COUNT(DISTINCT) per part "
    "attribute triple — supplier variety excluding negative-balance "
    "suppliers. NOT IN is null-aware in general; the subquery key is "
    "non-nullable here, so the plain (broadcast) anti join is exactly "
    "equivalent and is the plan used.",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 13))
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


