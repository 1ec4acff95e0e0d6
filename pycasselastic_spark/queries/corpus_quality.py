"""Corpus quality + sketches + anti-entropy: LM fluency, novelty, rebalancing, count-min / bloom, quantization, fuzzy matching, passage dedup, store diff/repair, streaming sketches and incremental near-dup.

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
from pycasselastic_spark.queries.pipeline2 import (  # noqa: F401,E402
    contamination_overlap,
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
    _JACCARD_POSTING_SQL,
    _SHINGLES_SQL,
    _STOPS_SQL,
    _UNIT_SQL,
    _ivf_centroids_sql,
)
from pycasselastic_spark.queries.streaming_q import (  # noqa: F401
    _run_stream_to_parquet,
)


# ---------------------------------------------------------------------------
# Round-5 training-pipeline additions: corpus-level statistical quality
# signals (bigram LM fluency, cross-doc n-gram novelty), source
# rebalancing, and a deterministic global shuffle — the remaining mix /
# curation primitives of an LLM data pipeline.
# ---------------------------------------------------------------------------


@register(
    "bigram_lm_score_documents",
    """
WITH sp AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM sp WHERE len(t) >= 2),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w) AS nv
      FROM (SELECT unnest(t) AS w FROM sp)),
q AS (
  SELECT bg.doc_id,
         FLOOR(CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.nv AS DOUBLE)
               * 1073741824.0) AS qp
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(qp) AS BIGINT) AS sum_prob_q30,
       (CAST(SUM(qp) AS BIGINT) / 1073741824.0) / COUNT(*) AS avg_prob
FROM q GROUP BY doc_id
""",
    doc="Corpus-trained bigram language-model fluency score (the "
    "CCNet-style statistical quality signal): add-one-smoothed "
    "P(w2|w1) = (c12+1)/(c1+V) trained on the whole corpus, averaged "
    "per document. Determinism: each probability is a correctly-"
    "rounded IEEE division (bit-identical cross-engine — no "
    "transcendentals), quantized to Q30 fixed point (floor(p * 2^30): "
    "power-of-two scaling is exact) so the per-doc SUM is an order-"
    "independent integer; avg_prob divides back out in two exact "
    "steps. Scale shape: bigram/unigram count tables are map-side "
    "partial aggregations bounded by vocabulary, the score join "
    "shuffles on bigram keys, the one-row vocab count broadcasts.",
)
def bigram_lm_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.functions.expr import let

    docs = _t(spark, sf_dir, "documents")
    # token array bound once (functions/expr.py:let) — inlining the
    # split into the per-position lambda re-splits per bigram slot
    bg_expr = let(
        F.split(F.col("text"), " "),
        lambda ws: F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.struct(
                    F.element_at(ws, i).alias("w1"),
                    F.element_at(ws, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    bi = docs.select("doc_id", F.explode(bg_expr).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .agg(F.countDistinct("w").alias("nv"))
    )
    prob = (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("nv")).cast(
        "double"
    )
    q = bi.join(c12, ["w1", "w2"]).join(c1, ["w1"]).crossJoin(
        F.broadcast(vocab)
    ).select("doc_id", F.floor(prob * F.lit(1073741824.0)).alias("qp"))
    return q.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("qp").alias("sum_prob_q30"),
        (
            (F.sum("qp").cast("double") / F.lit(1073741824.0))
            / F.count(F.lit(1))
        ).alias("avg_prob"),
    )


@register(
    "ngram_novelty_documents",
    """
WITH sh AS (
  SELECT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) >= 3
           THEN list_distinct(list_transform(
                  range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2]))
           ELSE [] END) AS shingle
  FROM documents),
df AS (SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY 1)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
FROM sh JOIN df USING (shingle)
GROUP BY sh.doc_id
""",
    doc="Cross-document n-gram novelty (the boilerplate detector "
    "complementing repetition_stats' WITHIN-doc signal): fraction of a "
    "document's distinct 3-gram shingles that appear in no other "
    "document. Low novelty = template/boilerplate/near-dup content. "
    "Exact integers + one correctly-rounded division — fully "
    "deterministic. Scale shape: shingle document-frequency is one "
    "partial-aggregated count keyed by shingle; the score join "
    "shuffles on the same key; no pair space is ever materialized.",
)
def ngram_novelty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(D.shingles("text", 3)).alias("shingle"))
    # shingles() is distinct WITHIN each doc, so every (doc, shingle)
    # row is unique and doc-frequency is a plain COUNT — a
    # countDistinct here would drag the agg through Expand for the
    # same answer (measured 3x slower at sf0.1)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    novel = F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).cast("long")
    return (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            (novel / F.count(F.lit(1)).cast("double")).alias("novelty_ratio"),
        )
    )


@register(
    "source_balanced_sample_documents",
    """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
SELECT d.doc_id, d.source
FROM documents d JOIN c USING (source)
WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT::DOUBLE
        / 4503599627370496.0
      < LEAST(1.0, 15.0 / CAST(c.n AS DOUBLE))
""",
    doc="Source/domain rebalancing (operators/sampling.py:"
    "balanced_sample): every source keeps rate min(1, 15/|source|), so "
    "over-represented sources downsample toward 15 docs while small "
    "ones pass through — the training-mix balancing primitive, keyed "
    "off 52 md5 bits of doc_id (reproducible across engines, re-runs "
    "and partitionings; the uniform and the rate are both exact "
    "doubles, so the keep decision is bit-deterministic). Per-source "
    "counts broadcast; the corpus is never shuffled.",
)
def source_balanced_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return SP.balanced_sample(
        docs, key_col="doc_id", strata_col="source", target_per_stratum=15
    ).select("doc_id", "source")


@register(
    "deterministic_shuffle_documents",
    """
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
            AS BIGINT) AS shuffle_pos
FROM documents
""",
    doc="Deterministic global training-order shuffle: permutation rank "
    "by md5(doc_id) — reproducible across engines and re-runs (the "
    "epoch-shuffle primitive, minus the RNG; vary the permutation by "
    "salting the key). The global rank is NOT a single-task "
    "ROW_NUMBER: it is the scalable two-pass prefix sum over a "
    "constant 1 (operators/relational.py:global_prefix_sum — "
    "range-partitioned local cumsums + broadcast partition offsets).",
)
def deterministic_shuffle_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.relational import global_prefix_sum

    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("shuffle_key")
    ).withColumn("_one", F.lit(1))
    return global_prefix_sum(
        keyed, "shuffle_key", "_one", "shuffle_pos"
    ).select("doc_id", "shuffle_key", F.col("shuffle_pos").cast("long").alias("shuffle_pos"))


@register(
    "countmin_heavy_hitters_events",
    """
WITH pairs AS (
  SELECT t.d,
         ('0x' || substring(md5('cms' || t.d || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 256 AS bucket
  FROM events, range(4) t(d)),
counters AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY d, bucket),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM events GROUP BY user_id),
est AS (
  SELECT e.user_id, MIN(c.cnt) AS cms_cnt
  FROM exact e, range(4) t(d)
  JOIN counters c
    ON c.d = t.d
   AND c.bucket = ('0x' || substring(md5('cms' || t.d || ':' || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT % 256
  GROUP BY e.user_id)
SELECT e.user_id, e.exact_cnt, s.cms_cnt
FROM exact e JOIN est s USING (user_id)
ORDER BY e.exact_cnt DESC, e.user_id
LIMIT 20
""",
    doc="Heavy hitters via a count-min sketch (operators/sketches.py): "
    "a fixed 4x256 md5-hashed counter grid built in ONE pass with "
    "map-side partial aggregation (shuffle volume bounded by the grid, "
    "not the key cardinality — the 100 TB answer to frequency "
    "estimation over unbounded keys), probed by a broadcast join of "
    "candidate keys. Output: top-20 users by exact count beside their "
    "sketch estimate; the sketch is md5-deterministic so the DuckDB "
    "oracle replays counters, minima and estimates bit-exactly (the "
    "exact counts double as the overestimate-bound witness).",
)
def countmin_heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators import sketches as SK

    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = SK.countmin_estimates(ev, "user_id", exact, depth=4, width=256)
    return (
        exact.join(est, "user_id")
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id"))
        .limit(20)
    )


@register(
    "embedding_quantize_stats",
    """
WITH ed AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
sc AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
              ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale
  FROM ed),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> floor(x / scale + 0.5)) AS qc
  FROM sc),
r AS (
  SELECT vec_id, v, scale, qc,
         list_transform(qc, c -> c * scale) AS rv
  FROM q)
SELECT vec_id,
       CAST(list_sum(list_transform(qc, c -> CAST(c AS BIGINT))) AS BIGINT) AS q_sum,
       scale,
       list_max(list_transform(range(1, 65), k -> abs(v[k] - rv[k]))) AS max_abs_err,
       CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x)))
                 * sqrt(list_sum(list_transform(rv, x -> x * x))) = 0 THEN NULL
            ELSE list_sum(list_transform(range(1, 65), k -> v[k] * rv[k]))
                 / (sqrt(list_sum(list_transform(v, x -> x * x)))
                    * sqrt(list_sum(list_transform(rv, x -> x * x)))) END AS cos_recon
FROM r
""",
    doc="Symmetric int8 scalar quantization of the embedding corpus "
    "with per-vector reconstruction stats (operators/similarity.py:"
    "quantize_int8_stats): scale = max|v|/127, codes "
    "floor(v/scale+0.5), reconstruction q*scale. 4x storage/scan-byte "
    "reduction is the embedding-store scale play; the emitted "
    "max_abs_err and cos(v, reconstruction) quantify the ranking cost "
    "per vector. Linear shuffle-free pass; every float op is "
    "elementwise or a sequential fold, so the oracle replays all "
    "columns bit-exactly.",
)
def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return S.quantize_int8_stats(emb, "vec_id", "embedding")


@register(
    "histogram_order_prices",
    """
WITH b AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), CAST(10 AS BIGINT)) AS bucket,
         o_totalprice
  FROM orders)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       FLOOR(1e6 * CAST(COUNT(*) AS DOUBLE)
             / (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders)) / 1e6 AS frac
FROM b GROUP BY bucket
""",
    doc="Equi-width price histogram (50k-wide buckets, top bucket "
    "open): the data-profiling primitive behind range partitioning and "
    "skew detection. Single hash aggregation with map-side partials on "
    "an 11-value key; the global total arrives via a broadcast scalar "
    "subquery, never a second shuffle. Fraction is floor-scaled to 6 "
    "decimals (floor is exact on IEEE doubles; round() ties differ "
    "cross-engine).",
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    total = orders.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)), F.lit(10).cast("long")
    )
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_orders",
            "min_price",
            "max_price",
            (
                F.floor(
                    F.lit(1e6) * F.col("n_orders").cast("double") / F.col("_total")
                )
                / F.lit(1e6)
            ).alias("frac"),
        )
    )


@register(
    "fuzzy_match_customer_names",
    """
WITH v AS (
  SELECT c_custkey AS id, c_name AS text,
         unnest(list_prepend(c_name,
            list_transform(range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)))) AS variant
  FROM customer WHERE length(c_name) >= 1)
SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.text AS text_a, b.text AS text_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS dist
FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
WHERE levenshtein(a.text, b.text) <= 1
""",
    doc="Fuzzy entity matching: customer-name pairs within Levenshtein "
    "distance 1 via FastSS 1-deletion-neighborhood blocking "
    "(operators/dedup.py:edit_distance_pairs) — candidates from an "
    "equi-join on deletion variants (recall-exact for distance 1, no "
    "pair space materialized), levenshtein verify map-side before the "
    "distinct so only true matches shuffle. Spark and DuckDB agree on "
    "unit-cost Levenshtein, so the pairs value-oracle bit-exactly.",
)
def fuzzy_match_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = ensure_parallelism(_t(spark, sf_dir, "customer"), spark)
    return D.edit_distance_pairs(cust, "c_custkey", "c_name", max_dist=1).select(
        F.col("id_a"),
        F.col("id_b"),
        "text_a",
        "text_b",
        F.col("dist").cast("int").alias("dist"),
    )


@register(
    "passage_dedup_documents",
    """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id,
         md5(array_to_string(t[(i * 10 + 1):(i * 10 + 10)], ' ')) AS ph
  FROM toks, UNNEST(range(CAST(ceil(len(t) / 10.0) AS BIGINT))) AS r(i)
  WHERE len(t) > 0),
cross_doc AS (
  SELECT ph, MIN(doc_id) <> MAX(doc_id) AS is_dup FROM occ GROUP BY ph)
SELECT o.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_passages,
       CAST(SUM(CASE WHEN c.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       CAST(SUM(CASE WHEN c.is_dup THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_share
FROM occ o JOIN cross_doc c USING (ph)
GROUP BY o.doc_id
""",
    doc="Passage-level exact dedup (operators/dedup.py:"
    "passage_duplicate_stats): each document splits into consecutive "
    "non-overlapping 10-token passages (pure JVM sequence+slice+"
    "array_join — no Python), and a passage counts as duplicated when "
    "its md5 also occurs in at least one OTHER document — the "
    "exact-substring curation signal (boilerplate, license blocks, "
    "templated spans) that doc-level exact dedup misses. One bounded "
    "hash-shuffle on the passage digest (the >=2-distinct-docs test is "
    "min!=max, cheaper than a distinct count), digest-keyed join back, "
    "per-doc aggregate. Linear in token count; no pair space.",
)
def passage_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return D.passage_duplicate_stats(docs, "doc_id", "text", passage_tokens=10)


@register(
    "bloom_prefilter_customers",
    """
WITH pos AS (
  SELECT ('0x' || substring(md5('bf' || t.i || ':' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
           % 4096 AS bit
  FROM orders, range(5) t(i)),
bits AS (SELECT DISTINCT bit FROM pos),
probe AS (
  SELECT c_custkey,
         ('0x' || substring(md5('bf' || t.i || ':' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
           % 4096 AS bit
  FROM customer, range(5) t(i)),
hits AS (
  SELECT c_custkey,
         MIN(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 1 AS bloom_hit
  FROM probe p LEFT JOIN bits b USING (bit) GROUP BY c_custkey),
truth AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(CASE WHEN h.bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pos,
       CAST(SUM(CASE WHEN t.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(SUM(CASE WHEN h.bloom_hit AND t.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST(SUM(CASE WHEN t.c_custkey IS NOT NULL AND NOT h.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_neg,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set
FROM hits h LEFT JOIN truth t USING (c_custkey)
""",
    doc="Bloom-filter join pre-filtering (operators/sketches.py: "
    "bloom_build/bloom_probe) — the third classic sketch beside HLL "
    "and count-min: a 4096-bit / 5-hash filter over orders.o_custkey "
    "built in one bounded shuffle (explode to bit positions, distinct "
    "collapses map-side to <= m rows), broadcast-probed by every "
    "customer key. At 100 TB this is the build-small/probe-big shape "
    "that drops non-matching big-side rows BEFORE a join shuffle. "
    "Output: probe count, bloom positives, true members, false "
    "positives, false negatives (must be 0 — no-false-negative law in "
    "band), set-bit count; md5-derived positions replay bit-exactly "
    "in the oracle.",
)
def bloom_prefilter_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators import sketches as SK

    ords = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    bits = SK.bloom_build(ords, "o_custkey", m_bits=4096, k=5)
    hits = SK.bloom_probe(
        cust.select(F.col("c_custkey")), bits, "c_custkey", m_bits=4096, k=5
    )
    members = (
        ords.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    joined = hits.join(F.broadcast(members), "c_custkey", "left")
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("n_bloom_pos"),
        F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0)).alias("n_members"),
        F.sum(
            F.when(F.col("bloom_hit") & F.col("_m").isNull(), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when(F.col("_m").isNotNull() & ~F.col("bloom_hit"), 1).otherwise(0)
        ).alias("n_false_neg"),
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    return agg.crossJoin(F.broadcast(n_bits))


def _ivf_cell_quality_oracle(sf_dir: str) -> str | None:
    cents = _ivf_centroids_sql(sf_dir, n_cells=16, seed=42)
    if cents is None:
        return None
    return f"""
WITH {_UNIT_SQL},
{cents},
cd AS (
  SELECT e.vec_id, c.cell,
         {_CDOT_SQL.format(u='e.u', c='c.cvec')} AS d
  FROM eu e CROSS JOIN cents c),
rk AS (
  SELECT vec_id, cell, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rn
  FROM cd),
best AS (
  SELECT a.vec_id, a.cell,
         CAST(FLOOR(a.d * 1073741824.0) AS BIGINT) AS q1,
         CAST(FLOOR(b.d * 1073741824.0) AS BIGINT) AS q2
  FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND b.rn = 2
  WHERE a.rn = 1)
SELECT cell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(q1) AS DOUBLE) / (1073741824.0 * COUNT(*)) AS mean_cos,
       CAST(MIN(q1) AS DOUBLE) / 1073741824.0 AS min_cos,
       CAST(SUM(q1 - q2) AS DOUBLE) / (1073741824.0 * COUNT(*)) AS mean_margin
FROM best GROUP BY cell
"""


@register(
    "ivf_cell_quality_embeddings",
    _ivf_cell_quality_oracle,
    doc="IVF partition-quality audit: per cell, member count, mean/min "
    "cosine to the owning centroid, and mean assignment margin (best "
    "minus second-best dot) — the operational health check for the "
    "IVF ANN index (skewed cells -> rebalance; thin margins -> "
    "boundary vectors need multi-assignment). Assignment dots use the "
    "same sequential fold as every oracle-replayed IVF query; "
    "per-vector dots are quantized to Q30 fixed point BEFORE "
    "aggregation so sums are order-independent integers and both "
    "engines derive bit-identical doubles. One narrow codegen pass "
    "over the corpus + a 16-group aggregate; no shuffle beyond it.",
)
def ivf_cell_quality_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.functions.expr import let
    from pycasselastic_spark.operators import similarity as S

    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    unit = S.with_unit_vector(emb.select("vec_id", "embedding"), "embedding", "_u")
    cents = S._train_centroids(unit, "vec_id", n_cells=16, seed=42)
    structs = [
        F.struct(
            S.dot(F.col("_u"), F.array(*[F.lit(float(v)) for v in vec])).alias("d"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell, vec in cents
    ]
    ordered = F.array_sort(
        F.array(*structs),
        lambda left, right: F.when(left["d"] > right["d"], F.lit(-1))
        .when(left["d"] < right["d"], F.lit(1))
        .otherwise(left["cell"] - right["cell"]),
    )
    q30 = 1073741824.0
    per_vec = unit.select(
        "vec_id",
        # bind the sorted (dot, cell) array once: three projections
        # reference it, and inlining would re-run the 16x64 dot fold 3x
        let(
            ordered,
            lambda o: F.struct(
                F.element_at(o, 1)["cell"].alias("cell"),
                F.floor(F.element_at(o, 1)["d"] * q30).cast("long").alias("q1"),
                F.floor(F.element_at(o, 2)["d"] * q30).cast("long").alias("q2"),
            ),
        ).alias("a"),
    ).select("vec_id", "a.cell", "a.q1", "a.q2")
    return per_vec.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum("q1").cast("double") / (F.lit(q30) * F.count(F.lit(1)))).alias(
            "mean_cos"
        ),
        (F.min("q1").cast("double") / F.lit(q30)).alias("min_cos"),
        (
            F.sum(F.col("q1") - F.col("q2")).cast("double")
            / (F.lit(q30) * F.count(F.lit(1)))
        ).alias("mean_margin"),
    )


@register(
    "incremental_neardup_delta",
    f"""
WITH {_SHINGLES_SQL},
jpost AS (SELECT doc_id, unnest(s) AS g FROM sh),
jn AS (SELECT doc_id, len(s) AS n FROM sh),
jshared AS (
  SELECT b.doc_id AS base_id, d.doc_id AS delta_id, COUNT(*) AS c
  FROM jpost b JOIN jpost d ON b.g = d.g
  WHERE b.doc_id % 10 <> 0 AND d.doc_id % 10 = 0
  GROUP BY 1, 2)
SELECT base_id, delta_id,
       CAST(c AS DOUBLE) / (nb.n + nd.n - c) AS jaccard
FROM jshared JOIN jn nb ON nb.doc_id = jshared.base_id
             JOIN jn nd ON nd.doc_id = jshared.delta_id
WHERE CAST(c AS DOUBLE) / (nb.n + nd.n - c) >= 0.6
""",
    doc="Incremental near-dup (operators/dedup.py:"
    "minhash_lsh_pairs_between): a newly-ingested batch (doc_id % 10 "
    "= 0 stands in for the delta) deduped against the accumulated "
    "corpus — candidates are base-band x delta-band collisions ONLY, "
    "so base x base never materializes and per-ingest work scales "
    "with the batch, not the corpus. The md5 hash family is "
    "data-independent, so at scale the base banding is computed once "
    "and stored beside the corpus; only the delta is hashed per "
    "ingest. Oracle is the brute-force cross-side answer: the "
    "incremental banding must not lose a qualifying pair.",
)
def incremental_neardup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    return D.minhash_lsh_pairs_between(
        base, delta, "doc_id", "text", n=3, num_hashes=24, band_rows=2,
        threshold=0.6,
    )


@register(
    "decontaminate_documents",
    """
WITH sh AS (
  SELECT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) >= 3
           THEN list_distinct(list_transform(
                  range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2]))
           ELSE [] END) AS shingle
  FROM documents),
contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM sh c JOIN sh b ON c.shingle = b.shingle
  WHERE b.doc_id < 10 AND c.doc_id >= 10
  GROUP BY c.doc_id, b.doc_id
  HAVING COUNT(*) >= 2)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id >= 10 AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
""",
    doc="Decontamination APPLY step — the removal twin of "
    "contamination_overlap: corpus documents sharing >= 2 distinct "
    "3-gram shingles with any benchmark document (ids < 10) are "
    "dropped via a left-anti join on the flagged id set. The flagged "
    "set is small (contamination is rare), so the anti-join "
    "broadcasts; the expensive shingle join is the same "
    "benchmark-broadcast equi-join as the detection query.",
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    flagged = (
        contamination_overlap(spark, sf_dir).select("doc_id").distinct()
    )
    return (
        docs.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(flagged), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "neardup_text_embedding_agreement",
    f"""
WITH {_JACCARD_POSTING_SQL},
{_UNIT_SQL},
pairs AS (SELECT doc_a, doc_b, jaccard FROM jpairs)
SELECT p.doc_a, p.doc_b, p.jaccard,
       {_DOT_SQL.format(a='ua.u', b='ub.u')} AS cosine
FROM pairs p
JOIN eu ua ON ua.vec_id = p.doc_a
JOIN eu ub ON ub.vec_id = p.doc_b
""",
    doc="Cross-modal dedup agreement audit: every MinHash-LSH text "
    "near-dup pair (Jaccard >= 0.6) joined to the pair's embedding "
    "cosine — the curation check that the embedding space agrees with "
    "lexical near-duplication (pairs lexically near but semantically "
    "far flag a bad encoder or a boilerplate-dominated shingle set). "
    "Composes two verified operators: banded LSH candidates (no pair "
    "space) + two id-keyed shuffle joins to the unit vectors; the "
    "sequential-fold dot keeps the cosine bit-replayable in SQL.",
)
def neardup_text_embedding_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators import similarity as S

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    emb = _t(spark, sf_dir, "embeddings")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=24, band_rows=2, threshold=0.6
    )
    unit = S.with_unit_vector(emb.select("vec_id", "embedding"), "embedding", "_u")
    ua = unit.select(F.col("vec_id").alias("doc_a"), F.col("_u").alias("_ua"))
    ub = unit.select(F.col("vec_id").alias("doc_b"), F.col("_u").alias("_ub"))
    return (
        pairs.join(ua, "doc_a")
        .join(ub, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            S.dot(F.col("_ua"), F.col("_ub")).alias("cosine"),
        )
    )


@register(
    "streaming_countmin_events",
    """
WITH pairs AS (
  SELECT t.d,
         ('0x' || substring(md5('cms' || t.d || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 256 AS bucket
  FROM events, range(4) t(d))
SELECT CAST(d AS BIGINT) AS d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs GROUP BY d, bucket
""",
    doc="Count-min sketch maintained by Structured Streaming: the "
    "event stream explodes to its (hash-row, bucket) pairs and a "
    "complete-mode streaming aggregation keeps the counter grid — "
    "state is bounded by the 4x256 grid REGARDLESS of stream length "
    "or key cardinality, the canonical always-on frequency monitor "
    "shape (no watermark needed: the state never grows). The "
    "converged counters must equal the batch sketch bit-for-bit "
    "(same md5 bucketing as countmin_heavy_hitters_events), so the "
    "batch SQL oracle replays the final state exactly.",
)
def streaming_countmin_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators import sketches as SK

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    buckets = F.array(
        *[SK.cms_bucket(F.col("user_id"), d, 256) for d in range(4)]
    )
    pairs = stream.select(F.posexplode(buckets).alias("d", "bucket"))
    agg = pairs.groupBy(F.col("d").cast("long").alias("d"), "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return _run_stream_to_parquet(spark, agg, "complete")


@register(
    "streaming_incremental_neardup",
    QUERIES["incremental_neardup_delta"].oracle,
    doc="The incremental-ingest dedup loop as Structured Streaming: "
    "delta documents arrive as a file stream and each micro-batch is "
    "deduped against the STATIC accumulated corpus inside foreachBatch "
    "(stream-static composition around an expensive relational "
    "operator, not just an enrich join). Because the base is static "
    "and cross-side pairs are independent per delta doc, the union of "
    "per-batch answers equals the one-shot batch answer REGARDLESS of "
    "how the stream is batched — so the converged sink must hash-equal "
    "incremental_neardup_delta's oracle exactly.",
)
def streaming_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    # the stored-index shape: the corpus is shingled and banded ONCE
    # (materialized) and every micro-batch only probes it — per-ingest
    # work is the delta's banding plus the band join
    base_index = D.minhash_band_index(
        base, "doc_id", "text", n=3, num_hashes=24, band_rows=2,
        materialize=True,
    )
    from pycasselastic_spark.streaming.sync import read_table_stream

    # read_table_stream handles both single-file and directory parquet
    # layouts; hardcoding pathGlobFilter here would yield an empty
    # stream on a directory corpus
    path = f"{sf_dir}/documents.parquet"
    delta = read_table_stream(spark, path).filter(F.col("doc_id") % 10 == 0)
    workdir = tempfile.mkdtemp(prefix="incr_dedup_")
    out = os.path.join(workdir, "out")
    checkpoint = os.path.join(workdir, "checkpoint")

    def sink(batch_df, _batch_id):
        D.minhash_lsh_pairs_between(
            base, batch_df, "doc_id", "text", n=3, num_hashes=24, band_rows=2,
            threshold=0.6, base_index=base_index,
        ).write.mode("append").parquet(out)

    q = (
        delta.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@register(
    "anti_entropy_diff_events",
    """
WITH a AS (SELECT event_id, user_id, event_type FROM events),
b AS (SELECT event_id, user_id,
             CASE WHEN event_id % 101 = 0 THEN event_type || '_x'
                  ELSE event_type END AS event_type
      FROM events WHERE event_id % 97 <> 0)
SELECT COALESCE(a.event_id, b.event_id) AS event_id,
       CASE WHEN b.event_id IS NULL THEN 'missing_in_b'
            WHEN a.event_id IS NULL THEN 'missing_in_a'
            ELSE 'payload_differs' END AS diff_status
FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
WHERE b.event_id IS NULL OR a.event_id IS NULL
   OR a.user_id <> b.user_id OR a.event_type <> b.event_type
""",
    doc="Anti-entropy replica comparison (core/diff.py:table_diff) — "
    "the scale rebuild of the reference's driver-side checkSync dict "
    "probe (tests/testSyncClass.py:286-331): each store collapses to "
    "<= 64 (bucket, bit_xor-digest, count) rows map-side, agreement is "
    "proven by joining the digest tables alone, and the row-level "
    "full-outer join runs only inside disagreeing buckets (broadcast "
    "semi-join prune). Store B is store A with event_id%97 rows "
    "dropped and event_id%101 payloads mutated; the oracle is the "
    "GROUND-TRUTH direct diff, so a digest collision or an "
    "over-pruned bucket would hash-mismatch — the check proves the "
    "Merkle shortcut loses nothing.",
)
def anti_entropy_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.core.diff import table_diff

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    mutated = ev.filter(F.col("event_id") % 97 != 0).withColumn(
        "event_type",
        F.when(
            F.col("event_id") % 101 == 0,
            F.concat(F.col("event_type"), F.lit("_x")),
        ).otherwise(F.col("event_type")),
    )
    return table_diff(
        ev, mutated, "event_id", ["user_id", "event_type"], n_buckets=64
    )


@register(
    "anti_entropy_repair_events",
    """
WITH a AS (SELECT event_id, user_id, event_type FROM events),
b AS (SELECT event_id, user_id,
             CASE WHEN event_id % 101 = 0 THEN event_type || '_x'
                  ELSE event_type END AS event_type
      FROM events WHERE event_id % 97 <> 0),
d AS (
  SELECT COALESCE(a.event_id, b.event_id) AS event_id,
         CASE WHEN b.event_id IS NULL THEN 'missing_in_b'
              WHEN a.event_id IS NULL THEN 'missing_in_a'
              ELSE 'payload_differs' END AS diff_status
  FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
  WHERE b.event_id IS NULL OR a.event_id IS NULL
     OR a.user_id <> b.user_id OR a.event_type <> b.event_type)
SELECT d.event_id,
       CASE WHEN d.diff_status = 'missing_in_a' THEN 'delete'
            ELSE 'upsert' END AS action,
       a.user_id, a.event_type
FROM d LEFT JOIN a ON a.event_id = d.event_id
""",
    doc="Anti-entropy REPAIR plan: the diff composed into the actions "
    "that converge replica B to replica A — upsert A's row where B is "
    "missing or stale, delete where B has a row A lacks (the "
    "reference's delete-on-conflict made declarative). The action "
    "stream is exactly what sources/registry.py's connector sinks "
    "consume (per-row writetime upsert / id-keyed delete); at scale "
    "it is diff-sized, not table-sized, because the digest prune "
    "already proved the rest of the table converged.",
)
def anti_entropy_repair_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.core.diff import table_diff

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    mutated = ev.filter(F.col("event_id") % 97 != 0).withColumn(
        "event_type",
        F.when(
            F.col("event_id") % 101 == 0,
            F.concat(F.col("event_type"), F.lit("_x")),
        ).otherwise(F.col("event_type")),
    )
    diff = table_diff(
        ev, mutated, "event_id", ["user_id", "event_type"], n_buckets=64
    )
    return diff.join(ev, "event_id", "left").select(
        "event_id",
        F.when(F.col("diff_status") == "missing_in_a", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("action"),
        "user_id",
        "event_type",
    )


@register(
    "key_skew_report_events",
    """
WITH per_key AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       quantile_cont(cnt, 0.5) AS p50_cnt,
       quantile_cont(cnt, 0.99) AS p99_cnt,
       CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt) AS skew_ratio,
       CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top1_share
FROM per_key
""",
    doc="Join-key skew pre-flight: per-key frequency distribution of "
    "the prospective shuffle key (count of keys, hottest-key count, "
    "exact p50/p99 of per-key counts, hottest/mean ratio, top-1 "
    "share). At 100 TB this one cheap aggregation decides the plan — "
    "skew_ratio near 1 means plain hash join; large means salt the "
    "key (operators/skew.py) or lean on AQE skew-join splitting. One "
    "map-side-combined groupBy + a singleton aggregate; nothing "
    "shuffles twice.",
)
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
        (
            F.max("cnt").cast("double") * F.count(F.lit(1)) / F.sum("cnt")
        ).alias("skew_ratio"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top1_share"),
    )


@register(
    "gopher_rules_documents",
    f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       length(replace(text, ' ', '')) / len(w) AS mean_word_len,
       len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w)
         AS alpha_word_share,
       CAST(len(list_intersect(list_distinct(w), {_STOPS_SQL})) AS BIGINT)
         AS n_stopwords,
       (len(w) BETWEEN 50 AND 100000) AS wc_ok,
       (length(replace(text, ' ', '')) / len(w) BETWEEN 3 AND 10) AS mwl_ok,
       (len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) >= 0.8)
         AS alpha_ok,
       (len(list_intersect(list_distinct(w), {_STOPS_SQL})) >= 2) AS stop_ok,
       ((len(w) BETWEEN 50 AND 100000)
        AND (length(replace(text, ' ', '')) / len(w) BETWEEN 3 AND 10)
        AND (len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) >= 0.8)
        AND (len(list_intersect(list_distinct(w), {_STOPS_SQL})) >= 2)) AS keep
FROM t
""",
    doc="Gopher-style quality rule filter (Rae et al. 2021, adapted to "
    "the single-line corpus): word count in [50, 100k], mean word "
    "length in [3, 10], >= 80% of words containing an alphabetic "
    "character, >= 2 distinct stopwords present — per-doc rule flags "
    "plus the conjunctive keep decision. All pure JVM expressions "
    "(int/int divisions are IEEE-exact cross-engine), one narrow "
    "scan, no shuffle: the shape of a 100 TB first-pass filter.",
)
def gopher_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    w = TX.words("text")
    stops = F.array(*[F.lit(s) for s in ("the", "is", "and", "of", "to", "a", "in")])
    n_words = F.size(w)
    mwl = F.length(F.regexp_replace(F.col("text"), " ", "")) / n_words
    alpha_share = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))) / n_words
    n_stop = F.size(F.array_intersect(F.array_distinct(w), stops))
    wc_ok = n_words.between(50, 100000)
    mwl_ok = (mwl >= 3) & (mwl <= 10)
    alpha_ok = alpha_share >= 0.8
    stop_ok = n_stop >= 2
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha_share.alias("alpha_word_share"),
        n_stop.cast("long").alias("n_stopwords"),
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (wc_ok & mwl_ok & alpha_ok & stop_ok).alias("keep"),
    )


@register(
    "canonical_exact_dedup_documents",
    """
SELECT doc_id, canon_fp FROM (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), ' +', ' '))) AS canon_fp,
         ROW_NUMBER() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), ' +', ' ')))
           ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
""",
    doc="Canonicalized exact dedup: documents normalize (lowercase, "
    "collapse runs of spaces, trim) BEFORE fingerprinting, so "
    "case/whitespace variants of the same text collapse to one "
    "representative — the standard canonicalization pass that "
    "byte-exact dedup misses. Same single-shuffle min_by shape as "
    "exact_dedup (operators/dedup.py:exact_dedup) keyed on the "
    "canonical md5.",
)
def canonical_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    canon = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    )
    return (
        docs.select("doc_id", canon.alias("canon_fp"))
        .groupBy("canon_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "canon_fp")
    )


@register(
    "exact_k_per_source_sample",
    """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) WHERE rn <= 5
""",
    doc="Exact-k-per-group sampling: 5 documents per source, chosen by "
    "rank over the md5 of the id — deterministic, reproducible, and "
    "uniform-ish without any RNG state. Complements the rate-based "
    "samplers (stratified/source-balanced): per-group windows "
    "partition by the group key so no single-task sort; at 100 TB "
    "prefer this shape over ORDER BY rand() LIMIT k per group, which "
    "is neither deterministic nor partitionable.",
)
def exact_k_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source")
    )


@register(
    "bloom_pruned_join_events",
    """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY c.c_mktsegment
""",
    doc="Bloom-PRUNED join (the apply side of bloom_prefilter_"
    "customers): the fact stream filters through a row-level "
    "bloom_contains predicate (operators/sketches.py — densified "
    "4096-bit mask closed over in codegen, no join, no shuffle) "
    "BEFORE joining the selective dim. Because a Bloom filter has no "
    "false negatives, the pruned join's result is IDENTICAL to the "
    "plain join — so the oracle is the plain join, and any dropped "
    "true match would hash-mismatch. At 100 TB this is runtime row "
    "filtering ahead of the exchange: only possibly-matching fact "
    "rows shuffle.",
)
def bloom_pruned_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators import sketches as SK

    ev = _t(spark, sf_dir, "events")
    dim = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    mask = SK.bloom_mask(SK.bloom_build(dim, "c_custkey", 4096, 5), 4096)
    pruned = ev.filter(SK.bloom_contains(F.col("user_id"), mask, 5))
    joined = pruned.join(
        F.broadcast(dim), pruned["user_id"] == dim["c_custkey"]
    )
    # distinct users as a two-level aggregation joined back on the
    # 1-row group key: countDistinct beside other aggregates makes
    # Catalyst rewrite the whole agg through Expand (see
    # approx_distinct_stats_events)
    d_users = (
        joined.groupBy("c_mktsegment", "user_id")
        .agg(F.count(F.lit(1)))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    totals = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )
    return totals.join(d_users, "c_mktsegment").select(
        "c_mktsegment", "n_events", "n_users", "total_value"
    )


@register(
    "time_rollup_events",
    """
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP),
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP))
""",
    doc="Time-hierarchy rollup: event counts and exact decimal value "
    "totals at hour, day and grand-total grains in ONE pass "
    "(ROLLUP(day, hour) — the partial aggregates compose, so Spark "
    "computes the hierarchy without rescanning; at 100 TB this "
    "replaces three separate aggregation jobs).",
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    return (
        ev.select(day, hour, "value")
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "user_value_outliers_events",
    """
WITH c AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events),
m AS (
  SELECT user_id, quantile_cont(cents, 0.5) AS med_cents FROM c GROUP BY user_id)
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       m.med_cents,
       CAST(SUM(CASE WHEN abs(c.cents - m.med_cents) > 2000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM c JOIN m USING (user_id)
GROUP BY c.user_id, m.med_cents
""",
    doc="Per-entity outlier flagging on an exact, integer-safe basis: "
    "values quantize to cents (decimal, not a lossy double cast), the "
    "per-user median comes from the exact interpolated percentile "
    "(int inputs -> at worst .5 halves, bit-identical cross-engine), "
    "and an event is an outlier when it sits more than $20 from its "
    "user's median. Median + flags in two shuffles on the same key "
    "(AQE reuses the partitioning); no variance/stddev — those are "
    "order-dependent float sums and cannot back a value oracle.",
)
def user_value_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = ev.select("user_id", cents.alias("cents"))
    med = c.groupBy("user_id").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    return (
        c.join(med, "user_id")
        .groupBy("user_id", "med_cents")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med_cents")) > 2000, 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("user_id", "n_events", "med_cents", "n_outliers")
    )


@register(
    "streaming_approx_distinct_windows",
    """
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       true AS users_within_3rsd
FROM events GROUP BY 1
""",
    doc="Streaming sketch aggregation: per-tumbling-hour HLL++ distinct "
    "users maintained by Structured Streaming (distinct aggregates are "
    "unsupported in streaming — the SKETCH is precisely what makes "
    "windowed cardinality feasible there, with bounded per-window "
    "state). The converged estimates join the batch exact counts and "
    "the value oracle checks the tolerance flag (|HLL - exact| <= "
    "3*rsd*exact), the approx_distinct_stats_events pattern applied "
    "to the stream.",
)
def streaming_approx_distinct_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = stream.groupBy(F.window("ts", "1 hour")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
        F.count(F.lit(1)).alias("n_events"),
    )
    streamed = _run_stream_to_parquet(spark, agg, "complete").select(
        F.col("window.start").alias("window_start"), "_hll", "n_events"
    )
    ev = _t(spark, sf_dir, "events")
    exact = (
        ev.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)))
        .groupBy(F.col("window.start").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return streamed.join(exact, "window_start").select(
        "window_start",
        "n_events",
        "n_users",
        # 3*rsd relative band with an absolute floor of 3: hourly
        # windows hold 10-20 users, where 6% is under one count and
        # HLL's +/-1 discretization would trip a purely relative band
        (
            F.abs(F.col("_hll") - F.col("n_users"))
            <= F.greatest(F.lit(3.0), 0.06 * F.col("n_users"))
        ).alias("users_within_3rsd"),
    )


@register(
    "null_safe_join_events",
    """
WITH a AS (
  SELECT NULLIF(event_type, 'click') AS k, CAST(COUNT(*) AS BIGINT) AS n_a
  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
b AS (
  SELECT NULLIF(event_type, 'click') AS k, CAST(COUNT(*) AS BIGINT) AS n_b
  FROM events WHERE event_id % 2 = 1 GROUP BY 1)
SELECT a.k, a.n_a, b.n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL "
    "group joins the NULL group instead of silently dropping — the "
    "semantics a sync engine needs when the merge key can be absent "
    "on both sides. Null-safe equality is still a hashable equi-key, "
    "so the plan stays a hash join, not a nested loop.",
)
def null_safe_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("click")).alias("k")
    a = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["k"], "n_a", "n_b")


@register(
    "map_function_suite_documents",
    """
SELECT doc_id,
       lang AS lang_v,
       CAST(2 AS INT) AS n_keys,
       true AS has_source,
       upper(source) AS src_upper,
       'lang,source' AS keys_sorted
FROM documents
""",
    doc="Map-typed column surface: create_map / element_at / size / "
    "map_contains_key / transform_values / map_keys + array_sort — "
    "the semi-structured shape for per-row attribute bags. The oracle "
    "verifies the VALUES through map-free projections (the map here "
    "is constructed from known columns, so every map op has a scalar "
    "ground truth), keeping the check engine-portable while the Spark "
    "side exercises the real map operators.",
)
def map_function_suite_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    upper_m = F.transform_values(m, lambda _k, v: F.upper(v))
    return docs.select(
        "doc_id",
        F.element_at(m, F.lit("lang")).alias("lang_v"),
        F.size(m).alias("n_keys"),
        F.map_contains_key(m, F.lit("source")).alias("has_source"),
        F.element_at(upper_m, F.lit("source")).alias("src_upper"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@register(
    "dedup_graph_stats",
    f"""
WITH {_JACCARD_POSTING_SQL},
pairs AS (SELECT doc_a, doc_b FROM jpairs),
edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
comp AS (
  WITH RECURSIVE reach(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
  )
  SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node),
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS comp_size
  FROM comp GROUP BY component)
SELECT comp_size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY comp_size
""",
    doc="Dedup-graph observability: the component-SIZE histogram of "
    "the near-dup pair graph (size 1 = unique docs, 2+ = dup "
    "clusters) — the one-look answer to 'how aggressive is this "
    "dedup pass', and the skew check for the clustering itself (a "
    "giant component means boilerplate shingles are bridging "
    "unrelated docs). Composes the banded-LSH pair generation with "
    "large-star/small-star components (operators/components.py) and "
    "two bounded aggregations; the oracle recomputes the closure "
    "with recursive SQL.",
)
def dedup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.components import assign_components

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    labeled = assign_components(
        docs.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b"
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return sizes.groupBy("comp_size").agg(
        F.count(F.lit(1)).alias("n_components")
    )


def _transform_with_state_available() -> bool:
    """transformWithStateInPandas runs a protobuf-speaking state server
    worker-side; without ``google.protobuf`` the query crashes at
    runtime, so registration is gated on the import. This container
    ships no protobuf — the explicit environment pin lives here (and in
    COVERAGE.md); on a protobuf-equipped deployment the query registers
    and the driver gate picks it up with no code change. The
    applyInPandasWithState twin (streaming_stateful_first_event) covers
    the custom-stateful-streaming surface in the gate everywhere."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _transform_with_state_available():

    @register(
        "streaming_running_totals_events",
        """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""",
        doc="Spark 4 typed-state streaming operator "
        "(transformWithStateInPandas): per-user running count + exact "
        "cents total in a ValueState; each batch emits the cumulative "
        "totals, so the converged answer per user is the emission with "
        "the highest count (streaming/stateful.py:"
        "RunningTotalsProcessor). Registered only where "
        "google.protobuf exists (the state server requires it).",
    )
    def streaming_running_totals_events(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pycasselastic_spark.streaming.stateful import running_totals_per_key

        stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
        updates = _run_stream_to_parquet(
            spark, running_totals_per_key(stream.select("user_id", "value")), "append"
        )
        # cumulative emissions are monotone in n_events; the converged
        # answer is the latest (highest-count) emission per user
        return updates.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )


