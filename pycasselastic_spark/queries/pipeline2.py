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

    def deliver(tag: str) -> None:
        # the driver corpus ships events.parquet as a single FILE, but
        # a synthesized corpus (scripts/bench_sf1.py) writes a parquet
        # DIRECTORY — flatten its part files into the stream source
        # dir so both shapes re-deliver identically
        if os.path.isdir(src):
            for i, f in enumerate(sorted(os.listdir(src))):
                if f.endswith(".parquet"):
                    shutil.copy(
                        os.path.join(src, f),
                        os.path.join(tmp, f"{tag}_{i}.parquet"),
                    )
        else:
            shutil.copy(src, os.path.join(tmp, f"{tag}.parquet"))

    deliver("delivery1")
    deliver("delivery2")
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
