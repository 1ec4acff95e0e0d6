"""Round-14 continuation queries: the remaining high-frequency ES
`_search` surface — ``bucket_script`` / ``normalize`` pipeline
aggregations, ``more_like_this``, field ``collapse``, the ``term``
suggester, and join-field (``has_child`` / ``has_parent``) semantics.

All dispatch end-to-end through the request-body APIs; every oracle
replays the exact integer-score law from raw parquet. Pipeline
aggregations remain second-pass transforms over the RESPONSE-sized
bucket relation (ES caps it at ``search.max_buckets``), so their
windows never see the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_api import es_search
from pycasselastic_spark.queries.base import register
from pycasselastic_spark.queries.base import _t
from pycasselastic_spark.queries.search_dsl import _postings_index_for
from pycasselastic_spark.queries.search_r13 import (
    _TS0,
    _TS_STEP,
    _ts_index_for,
)
from pycasselastic_spark.queries.search_r12b import (
    _BM25_TERM_SCORE,
    _TOK_POSTINGS,
)
from pycasselastic_spark.queries.search_r13b import _HITS_MERGE


@register(
    "bucket_script_documents",
    f"""
WITH {_HITS_MERGE},
b AS (
  SELECT d.source AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(d.n_chars) AS min_val,
         MAX(d.n_chars) AS max_val,
         CAST(SUM(d.n_chars) AS BIGINT) AS sum_val,
         CAST(FLOOR(AVG(d.n_chars) * 1048576.0) AS BIGINT) AS avg_q20
  FROM documents d JOIN hits USING (doc_id)
  WHERE d.source IS NOT NULL
  GROUP BY 1
)
SELECT bucket, n_docs, min_val, max_val, sum_val, avg_q20,
       CAST(FLOOR(
         100.0 * (max_val - min_val) / (max_val + min_val)
         * 1048576.0) AS BIGINT) AS spread_pct
FROM b ORDER BY bucket
""",
    doc="ES ``bucket_script`` pipeline aggregation under terms: a "
    "per-bucket COMPUTED metric — an arithmetic expression over "
    "sibling buckets_path values (here the relative length spread "
    "100*(max-min)/(max+min) per source), the 'error rate = errors/"
    "total*100' dashboard column. The supported script grammar is "
    "arithmetic (+ - * / parens) over params.<var> and numeric "
    "literals; Painless beyond that raises by name, and paths "
    "resolve under the selector law (exact integer columns only — "
    "the Q20-quantized avg raises rather than mixing units). Result "
    "Q20-floored; x/0 follows SQL (NULL, documented divergence from "
    "Painless's throw). operators/search_compose.py:"
    "apply_bucket_script/_parse_bucket_script. Row-local expression "
    "over the response-sized bucket relation; no extra shuffle.",
)
def bucket_script_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"per_source": {
            "terms": {"field": "source"},
            "aggs": {
                "len": {"stats": {"field": "n_chars"}},
                "spread_pct": {"bucket_script": {
                    "buckets_path": {"mn": "len.min", "mx": "len.max"},
                    "script":
                        "100 * (params.mx - params.mn)"
                        " / (params.mx + params.mn)",
                }},
            },
        }},
    })


@register(
    "normalize_agg_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
c AS (SELECT CAST(FLOOR(ts / 43200) * 43200 AS BIGINT) AS bucket_s,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id) GROUP BY 1)
SELECT bucket_s, n_docs,
       CAST(FLOOR(CAST(n_docs AS DOUBLE) / SUM(CAST(n_docs AS DOUBLE))
         OVER () * 1048576.0) AS BIGINT) AS share_q20,
       CAST(FLOOR((CAST(n_docs AS DOUBLE)
           - MIN(CAST(n_docs AS DOUBLE)) OVER ())
         / (MAX(CAST(n_docs AS DOUBLE)) OVER ()
           - MIN(CAST(n_docs AS DOUBLE)) OVER ())
         * 1048576.0) AS BIGINT) AS scaled_q20
FROM c ORDER BY bucket_s
""",
    doc="ES ``normalize`` pipeline aggregation riding a "
    "date_histogram: each bucket's count rescaled against the WHOLE "
    "bucket set — ``percent_of_sum`` (x/sum, the traffic-share "
    "column) and ``rescale_0_1`` ((x-min)/(max-min), the sparkline "
    "normalizer). Q20-floored; degenerate sets (max==min, sum==0) "
    "follow SQL division -> NULL. The unpartitioned window is over "
    "the response-sized bucket relation ES caps at "
    "search.max_buckets, never the corpus. operators/"
    "search_compose.py:apply_normalize, dispatched from "
    "aggs.<name>.date_histogram + aggs.<name>.aggs.normalize.",
)
def normalize_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"halfdays": {
            "date_histogram": {
                "field": "ingest_ts", "fixed_interval": "12h",
            },
            "aggs": {
                "share_q20": {"normalize": {
                    "buckets_path": "_count",
                    "method": "percent_of_sum",
                }},
                "scaled_q20": {"normalize": {
                    "buckets_path": "_count",
                    "method": "rescale_0_1",
                }},
            },
        }},
    })
    return out.select(
        F.col("bucket").cast("long").alias("bucket_s"),
        "n_docs", "share_q20", "scaled_q20",
    ).orderBy("bucket_s")


# the deterministic join-field fixture shared by the has_child /
# has_parent twins and their oracles: every 5th doc is a 'post'
# (parent), the rest are 'comment' children of the preceding post —
# the same replica-synthesized-fixture pattern the date_histogram
# queries use for ingest_ts
_JOIN_FIELD_SQL = """
jf AS (SELECT doc_id,
  CASE WHEN doc_id % 5 = 0 THEN 'post' ELSE 'comment' END AS join_name,
  CASE WHEN doc_id % 5 = 0 THEN NULL
       ELSE doc_id - (doc_id % 5) END AS parent
  FROM documents)
"""


def _join_field_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    is_post = F.col("doc_id") % 5 == 0
    return docs.select(
        "doc_id",
        F.when(is_post, F.lit("post"))
         .otherwise(F.lit("comment")).alias("join_name"),
        F.when(is_post, F.lit(None).cast("long"))
         .otherwise(
             (F.col("doc_id") - F.col("doc_id") % 5).cast("long")
         ).alias("parent"),
    )


@register(
    "has_child_documents",
    f"""
WITH {_TOK_POSTINGS},
{_JOIN_FIELD_SQL.strip().lstrip()},
qt AS (SELECT * FROM postings WHERE term = 'spark'),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scored AS (SELECT qt.doc_id,
  CAST(FLOOR(({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc),
kids AS (SELECT jf.doc_id, jf.parent, s
  FROM jf JOIN scored USING (doc_id) WHERE join_name = 'comment'),
pp AS (SELECT parent, CAST(COUNT(*) AS BIGINT) AS n_children,
         CAST(SUM(s) AS BIGINT) AS score_q20
       FROM kids GROUP BY parent),
posts AS (SELECT doc_id AS parent FROM jf WHERE join_name = 'post')
SELECT pp.parent AS parent_id, n_children, score_q20
FROM pp JOIN posts USING (parent)
ORDER BY score_q20 DESC, parent_id LIMIT 10
""",
    doc="ES ``has_child`` join-field query: return PARENT docs "
    "('post') having at least one 'comment' child matching the inner "
    "match, score_mode=sum over the children's exact Q20 BM25 "
    "scores. The join mapping is the (id, join_name, parent) "
    "relation ES co-routes to one shard — here it rides the corpus's "
    "own doc-id partitioning, so the hit->parent rollup is an "
    "equi-join on the partitioning the data already has. Plan: one "
    "pruned postings probe, one pushed-filter join-relation scan, "
    "map-side partial groupBy(parent), parent-type semi-join, "
    "TakeOrderedAndProject. operators/search_join.py:"
    "has_child_search, dispatched from query.has_child.",
)
def has_child_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"has_child": {
            "type": "comment",
            "query": {"match": {"text": "spark"}},
            "score_mode": "sum",
        }},
        "size": 10,
    }, join_field=_join_field_for(spark, sf_dir),
       join_relations={"post": "comment"})


@register(
    "has_parent_documents",
    f"""
WITH {_TOK_POSTINGS},
{_JOIN_FIELD_SQL.strip().lstrip()},
qt AS (SELECT * FROM postings WHERE term = 'merge'),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scored AS (SELECT qt.doc_id,
  CAST(FLOOR(({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc),
phits AS (SELECT jf.doc_id AS parent, s FROM jf
  JOIN scored USING (doc_id) WHERE join_name = 'post'),
kids AS (SELECT doc_id AS child_id, parent FROM jf
  WHERE join_name = 'comment')
SELECT child_id, parent AS parent_id, CAST(s AS BIGINT) AS score_q20
FROM kids JOIN phits USING (parent)
ORDER BY score_q20 DESC, child_id LIMIT 12
""",
    doc="ES ``has_parent`` join-field query: return CHILD docs "
    "('comment') whose 'post' parent matches the inner match, "
    "score=true — the parent's exact Q20 BM25 score propagated to "
    "every child (ES score mode 'score'). Inverse propagation of "
    "has_child over the same co-partitioned join relation: parent "
    "hits (pruned probe ∩ parent-typed ids) equi-join the child "
    "slice of the join-field scan on the parent id. operators/"
    "search_join.py:has_parent_search, dispatched from "
    "query.has_parent.",
)
def has_parent_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"has_parent": {
            "parent_type": "post",
            "query": {"match": {"text": "merge"}},
            "score": True,
        }},
        "size": 12,
    }, join_field=_join_field_for(spark, sf_dir),
       join_relations={"post": "comment"})


@register(
    "string_stats_documents",
    f"""
WITH {_HITS_MERGE},
v AS (SELECT d.source AS v FROM documents d JOIN hits USING (doc_id)
      WHERE d.source IS NOT NULL),
ls AS (SELECT CAST(COUNT(*) AS BIGINT) AS val_count,
              CAST(MIN(len(v)) AS BIGINT) AS min_len,
              CAST(MAX(len(v)) AS BIGINT) AS max_len,
              CAST(FLOOR(AVG(len(v)) * 1048576.0) AS BIGINT)
                AS avg_len_q20
       FROM v),
cc AS (SELECT ch, CAST(COUNT(*) AS BIGINT) AS c
       FROM (SELECT unnest(string_split(v, '')) AS ch FROM v)
       WHERE ch <> '' GROUP BY ch),
ent AS (SELECT CAST(SUM(c) AS BIGINT) AS t,
               CAST(SUM(CAST(FLOOR(c * log2(c) * 1073741824.0)
                 AS BIGINT)) AS BIGINT) AS s_q30
        FROM cc)
SELECT val_count, min_len, max_len, avg_len_q20,
       CAST(FLOOR((log2(t) - s_q30 / 1073741824.0 / t) * 1048576.0)
         AS BIGINT) AS entropy_q20
FROM ls CROSS JOIN ent
""",
    doc="ES ``string_stats`` metric aggregation over the hit set's "
    "stored string doc-values (the keyword-field profile panel): "
    "value count (NULLs excluded), length extrema, Q20 mean length, "
    "and the Shannon entropy of the aggregated character "
    "distribution. Entropy is transcendental, so the reduction "
    "follows the bigram-LM Q30 fixed-point law: per-character "
    "FLOOR(c*log2(c)*2^30) terms are exact longs summed exactly "
    "(order-independent across partitions), and H = log2(T) - "
    "S/(T*2^30) is ONE double expression over exact ints, "
    "Q20-floored — bit-deterministic cross-engine. Plan: hit-joined "
    "column-pruned doc-values scan; one reduction for lengths, one "
    "char explode (linear in hit character mass — the work entropy "
    "needs) over a tiny key space. operators/search_ext.py:"
    "search_string_stats_agg, dispatched from aggs.string_stats.",
)
def string_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"src": {"string_stats": {"field": "source"}}},
    })


@register(
    "matrix_stats_events",
    """
WITH e AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS a,
                  CAST(user_id AS BIGINT) AS b
           FROM events
           WHERE value IS NOT NULL AND user_id IS NOT NULL),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a) AS BIGINT) AS sa,
             CAST(SUM(b) AS BIGINT) AS sb,
             CAST(SUM(a * a) AS BIGINT) AS saa,
             CAST(SUM(b * b) AS BIGINT) AS sbb,
             CAST(SUM(a * b) AS BIGINT) AS sab
      FROM e)
SELECT n AS n_docs,
  CAST(FLOOR(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) * 1048576.0)
    AS BIGINT) AS mean_a_q20,
  CAST(FLOOR(CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) * 1048576.0)
    AS BIGINT) AS mean_b_q20,
  CAST(FLOOR((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) * 1048576.0)
    AS BIGINT) AS var_a_q20,
  CAST(FLOOR((CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) * 1048576.0)
    AS BIGINT) AS var_b_q20,
  CAST(FLOOR((CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) * 1048576.0)
    AS BIGINT) AS cov_q20,
  CAST(FLOOR(
    ((CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
       / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
    / SQRT(((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
      * ((CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)))
    * 1048576.0) AS BIGINT) AS corr_q20
FROM s
""",
    doc="ES ``matrix_stats`` (two-field form — does metric A move "
    "with metric B): unbiased variance/covariance and Pearson "
    "correlation of events.value (exact-cents quantized, the "
    "user_value_outliers law) vs user_id. Determinism is the "
    "extended_stats law generalized to the cross-moment: n, Σa, Σb, "
    "Σa², Σb², Σab are exact BIGINTs from integral inputs (one "
    "map-side-partial reduction, no corpus shuffle), every derived "
    "statistic ONE fixed IEEE-double expression over exact ints, "
    "Q20-floored. operators/search_ext.py:matrix_stats_2d / "
    "search_matrix_stats_agg (the es_search aggs.matrix_stats "
    "dispatch shares this law over stored doc-values).",
)
def matrix_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_ext import matrix_stats_2d

    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        F.col("user_id").cast("long").alias("user_id"),
    )
    return matrix_stats_2d(ev, "value_cents", "user_id")


@register(
    "diversified_sampler_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term = 'merge'),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scored AS (SELECT qt.doc_id,
  CAST(FLOOR(({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc),
j AS (SELECT d.doc_id, d.source, d.lang, s
      FROM documents d JOIN scored USING (doc_id)
      WHERE d.source IS NOT NULL),
rn AS (SELECT *, ROW_NUMBER() OVER
         (PARTITION BY source ORDER BY s DESC, doc_id) AS rnk FROM j),
samp AS (SELECT * FROM rn WHERE rnk <= 2
         ORDER BY s DESC, doc_id LIMIT 50)
SELECT lang AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM samp WHERE lang IS NOT NULL
GROUP BY 1 ORDER BY n_docs DESC, bucket
""",
    doc="ES ``diversified_sampler``: the sampler's top-scoring scope "
    "with a per-value cap — at most max_docs_per_value=2 docs per "
    "source enter the 50-doc sample (the 'don't let one domain "
    "dominate the sample' guard), then a lang terms facet over the "
    "sample. The per-value cap is a window PARTITIONED by the "
    "diversity value (bounded state per key, never a global window); "
    "docs missing the diversity value are excluded (documented). "
    "ES's per-shard sample is topology-dependent; this engine's one "
    "logical shard makes it the exact global answer under the "
    "(score desc, id) law. Dispatched from "
    "aggs.diversified_sampler + aggs.",
)
def diversified_sampler_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"div": {
            "diversified_sampler": {
                "field": "source", "shard_size": 50,
                "max_docs_per_value": 2,
            },
            "aggs": {"by_lang": {"terms": {"field": "lang"}}},
        }},
    })


from pycasselastic_spark.queries.search_dsl import (  # noqa: E402
    _BM25_ORACLE_TEMPLATE,
)


@register(
    "search_template_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'merge', 'scan'"),
    doc="ES ``_search/template``: a mustache-parameterized saved "
    "search rendered then dispatched — \"{{q}}\" fills the match "
    "text, \"{{k}}\" (a whole-value variable) renders as the "
    "NUMBER 10 for size. The oracle is the plain match-query BM25 "
    "law with the params inlined: rendering must not change the "
    "ranking by even one Q20 unit. Conditional mustache "
    "(sections/partials), missing params, non-scalar embedded "
    "params and templated object keys raise by name — a "
    "mis-rendered template is a silently different query. "
    "operators/search_api.py:es_search_template/_render_template.",
)
def search_template_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.search_api import (
        es_search_template,
    )

    idx = _postings_index_for(spark, sf_dir)
    return es_search_template(idx, {
        "source": {
            "query": {"match": {"text": "{{q}}"}},
            "size": "{{k}}",
        },
        "params": {"q": "merge scan", "k": 10},
    })


# geohash oracle SQL generated from the SAME (bits, nlon, nlat)
# derivation the Column construction uses — integer arithmetic
# end-to-end, so the two engines agree bit-for-bit by construction
def _geohash_oracle_sql(precision: int, k: int) -> str:
    from pycasselastic_spark.operators.geo import (
        _GEOHASH_BASE32,
        _geohash_quant,
    )
    from pycasselastic_spark.queries.search_r14 import _GEO_SQL

    bits, nlon, nlat = _geohash_quant(precision)
    terms = []
    for j in range(bits):
        if j % 2 == 0:
            src, sh = "xq", nlon - 1 - j // 2
        else:
            src, sh = "yq", nlat - 1 - (j - 1) // 2
        terms.append(
            f"(CAST(FLOOR(CAST({src} AS DOUBLE) / {float(1 << sh)}) "
            f"AS BIGINT) % 2) * {1 << (bits - 1 - j)}"
        )
    # integer shift/mask — exact at any precision (v reaches 2^60-1
    # at precision 12; a double divide would shear the low bits)
    chars = [
        "SUBSTRING('" + _GEOHASH_BASE32 + "', CAST("
        f"(v >> {5 * (precision - 1 - i)}) & 31"
        " AS INT) + 1, 1)"
        for i in range(precision)
    ]
    return (
        "WITH " + _GEO_SQL + f""",
q AS (SELECT
  GREATEST(LEAST(CAST(FLOOR((lon + 180.0) / 360.0 * {float(1 << nlon)})
    AS BIGINT), {(1 << nlon) - 1}), 0) AS xq,
  GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * {float(1 << nlat)})
    AS BIGINT), {(1 << nlat) - 1}), 0) AS yq
  FROM g),
vv AS (SELECT {' + '.join(terms)} AS v FROM q),
c AS (SELECT CONCAT({', '.join(chars)}) AS cell FROM vv)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM c GROUP BY cell
ORDER BY n_docs DESC, cell ASC LIMIT {k}
"""
    )


@register(
    "geohash_grid_events",
    _geohash_oracle_sql(4, 15),
    doc="ES ``geohash_grid`` aggregation: points bucketed into "
    "base32 geohash cells at precision 4 (~39 km cells), top-15 by "
    "(count desc, cell asc) — ES's bucket order with a "
    "deterministic key tiebreak. Geohash is INTEGER arithmetic "
    "end-to-end (quantize each axis once, interleave lon-first, "
    "base32 the 5-bit chunks) — no transcendentals, strictly easier "
    "cross-engine than geotile's Mercator y; the driver-side twin "
    "geohash_py is pinned against the classic interval-halving "
    "construction in pytest. Completes the geo family "
    "(geotile_grid / geo_bounding_box / geo_distance / "
    "geo_distance ring buckets, round 14). operators/geo.py:"
    "geohash_cells. Plan: one scan, one generated row-local integer "
    "expression tree inside whole-stage codegen, ONE "
    "partial-aggregated groupBy + TakeOrderedAndProject.",
)
def geohash_grid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.geo import geohash_cells
    from pycasselastic_spark.queries.search_r14 import _geo_events

    g = _geo_events(spark, sf_dir)
    return geohash_cells(g, "lat", "lon", precision=4, k=15)


@register(
    "t_test_documents",
    f"""
WITH {_HITS_MERGE},
dv AS (SELECT d.lang, d.n_chars FROM documents d JOIN hits USING (doc_id)),
s AS (SELECT
  CAST(SUM(CASE WHEN lang = 'en' AND n_chars IS NOT NULL
    THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
  CAST(SUM(CASE WHEN lang = 'en' AND n_chars IS NOT NULL
    THEN n_chars END) AS BIGINT) AS s_a,
  CAST(SUM(CASE WHEN lang = 'en' AND n_chars IS NOT NULL
    THEN n_chars * n_chars END) AS BIGINT) AS ss_a,
  CAST(SUM(CASE WHEN lang = 'de' AND n_chars IS NOT NULL
    THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
  CAST(SUM(CASE WHEN lang = 'de' AND n_chars IS NOT NULL
    THEN n_chars END) AS BIGINT) AS s_b,
  CAST(SUM(CASE WHEN lang = 'de' AND n_chars IS NOT NULL
    THEN n_chars * n_chars END) AS BIGINT) AS ss_b
  FROM dv),
m AS (SELECT n_a, n_b,
  CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
  CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
  (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
    / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1) AS va,
  (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
    / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1) AS vb
  FROM s),
e AS (SELECT *, va / CAST(n_a AS DOUBLE) AS sea,
               vb / CAST(n_b AS DOUBLE) AS seb FROM m)
SELECT n_a, n_b,
  CAST(FLOOR(ma * 1048576.0) AS BIGINT) AS mean_a_q20,
  CAST(FLOOR(mb * 1048576.0) AS BIGINT) AS mean_b_q20,
  CAST(FLOOR((ma - mb) / SQRT(sea + seb) * 1048576.0) AS BIGINT)
    AS t_stat_q20,
  CAST(FLOOR((sea + seb) * (sea + seb)
    / (sea * sea / (CAST(n_a AS DOUBLE) - 1)
       + seb * seb / (CAST(n_b AS DOUBLE) - 1)) * 1048576.0) AS BIGINT)
    AS df_q20
FROM e
""",
    doc="ES ``t_test`` aggregation (two-filter unpaired form): is "
    "mean n_chars different between lang=en and lang=de inside the "
    "hit set — Welch's heteroscedastic statistic with the "
    "Welch-Satterthwaite df. DOCUMENTED DIVERGENCE: ES reports the "
    "p-value (a t-CDF lookup with no SQL-replayable law); this "
    "engine reports the exact STATISTIC and df the CDF would "
    "consume — the decision content (|t| vs critical value) is "
    "preserved, the approximation is not reproduced. Determinism = "
    "the extended_stats law over both populations' exact BIGINT "
    "moments from ONE conditional reduction (no second scan); "
    "INTEGRAL fields only, paired raises by name. operators/"
    "search_ext.py:search_t_test_agg, dispatched from aggs.t_test.",
)
def t_test_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"len_shift": {"t_test": {
            "a": {"field": "n_chars",
                  "filter": {"term": {"lang": "en"}}},
            "b": {"field": "n_chars",
                  "filter": {"term": {"lang": "de"}}},
            "type": "heteroscedastic",
        }}},
    })


@register(
    "nb_classifier_documents",
    """
WITH lab AS (SELECT doc_id, text, (lang = 'en') AS pos
             FROM documents WHERE lang IS NOT NULL),
tk AS (SELECT doc_id, pos, term FROM
        (SELECT doc_id, pos, unnest(string_split(text, ' ')) AS term
         FROM lab)
       WHERE term <> ''),
pt AS (SELECT term,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
       FROM tk GROUP BY term),
sc AS (SELECT CAST(SUM(c_pos) AS BIGINT) AS m_pos,
              CAST(SUM(c_neg) AS BIGINT) AS m_neg,
              CAST(COUNT(*) AS BIGINT) AS v FROM pt),
dc AS (SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
         AS d_pos,
              CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
         AS d_neg FROM lab),
w AS (SELECT term, CAST(FLOOR(
        (ln((c_pos + 1.0) / (m_pos + v))
         - ln((c_neg + 1.0) / (m_neg + v))) * 1073741824.0) AS BIGINT)
        AS w_q30
      FROM pt CROSS JOIN sc),
k AS (SELECT CAST(FLOOR(
        (ln(1.0 / (m_pos + v)) - ln(1.0 / (m_neg + v)))
        * 1073741824.0) AS BIGINT) AS oov_q30,
             CAST(FLOOR(ln(CAST(d_pos AS DOUBLE) / CAST(d_neg AS DOUBLE))
        * 1073741824.0) AS BIGINT) AS prior_q30
      FROM sc CROSS JOIN dc),
at2 AS (SELECT doc_id, term FROM
         (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
        WHERE term <> ''),
ds AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(COALESCE(w_q30, k.oov_q30)) + MAX(k.prior_q30)
           AS BIGINT) AS score_q30
       FROM at2 LEFT JOIN w USING (term) CROSS JOIN k GROUP BY doc_id),
noempty AS (SELECT d.doc_id, CAST(0 AS BIGINT) AS n_tokens,
              k.prior_q30 AS score_q30
            FROM documents d
            LEFT JOIN (SELECT DISTINCT doc_id FROM at2) t
              ON d.doc_id = t.doc_id
            CROSS JOIN k WHERE t.doc_id IS NULL),
u AS (SELECT * FROM ds UNION ALL SELECT * FROM noempty)
SELECT doc_id, n_tokens, score_q30 FROM u
ORDER BY score_q30 DESC, doc_id LIMIT 20
""",
    doc="LLM-pipeline classifier step: multinomial Naive Bayes "
    "trained in ONE corpus pass on a weak label (lang='en' — the "
    "language-ID-distillation / CCNet-quality-filter shape) and "
    "scored corpus-wide with a posting-style term join; top-20 by "
    "(score desc, id). Add-one smoothing makes the unseen-term "
    "weight a CONSTANT, so OOV is a coalesce, not a lookup miss. "
    "Determinism: exact BIGINT counts -> per-term Q30-floored "
    "log-likelihood-ratio (ONE double expression over exact ints) "
    "-> per-doc exact integer sums over token occurrences -> "
    "prior-only score for token-less docs. Scale: train output is "
    "vocab-bounded, scoring is an equi-join on term + per-doc "
    "partial sum — no driver loops, corpus scalars broadcast. "
    "operators/classify.py:nb_train/nb_score.",
)
def nb_classifier_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.classify import nb_score, nb_train

    docs = _t(spark, sf_dir, "documents")
    weights, consts = nb_train(
        docs, "doc_id", "text", F.col("lang") == "en"
    )
    out = nb_score(docs, "doc_id", "text", weights, consts)
    return out.orderBy(
        F.col("score_q30").desc(), F.col("doc_id").asc()
    ).limit(20)


# BPE oracle generated with one CTE block per unrolled merge round —
# pair counting, deterministic argmax, and the same literal
# non-overlapping left-to-right replace both engines share
def _bpe_oracle_sql(k: int) -> str:
    parts = ["""
w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM
        (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       WHERE w <> '' GROUP BY w),
s0 AS (SELECT '  ' || array_to_string(string_split(w, ''), '  ')
         || '  ' AS seg, freq FROM w0)"""]
    for r in range(k):
        parts.append(f"""
i{r} AS (SELECT unnest(range(1, len(string_split(trim(seg), '  '))))
           AS i, string_split(trim(seg), '  ') AS s, freq FROM s{r}),
p{r} AS (SELECT s[i] AS l, s[i+1] AS r, CAST(SUM(freq) AS BIGINT)
           AS cnt FROM i{r} GROUP BY 1, 2),
b{r} AS (SELECT l, r, cnt FROM p{r}
         ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
s{r + 1} AS (SELECT replace(seg, ' ' || b.l || '  ' || b.r || ' ',
               ' ' || b.l || b.r || ' ') AS seg, freq
             FROM s{r}, b{r} b)""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, l AS left_sym, "
        f"r AS right_sym, l || r AS merged, cnt FROM b{r}"
        for r in range(k)
    )
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT * FROM ({union}) ORDER BY merge_rank"
    )


@register(
    "bpe_train_documents",
    _bpe_oracle_sql(5),
    doc="LLM-pipeline tokenizer TRAINING: 5 rounds of BPE merge "
    "induction (Sennrich et al. 2016) over the corpus — the merge "
    "table (rank, pair, merged, weighted count) IS the tokenizer "
    "vocabulary induction step. Scale law: the corpus is touched "
    "ONCE (word-frequency table); every round then pair-counts and "
    "re-segments the VOCAB-bounded relation — distinct words, not "
    "corpus rows — with one bounded (pair, count) scalar fetch per "
    "round (the IVF-centroid pattern; the loop is inherently "
    "sequential in k). Determinism: exact BIGINT pair counts, "
    "(cnt desc, left asc, right asc) argmax, and re-segmentation by "
    "literal non-overlapping left-to-right string replace on the "
    "space-delimited symbol encoding — semantics both engines' "
    "replace() share, so the whole training loop replays in SQL "
    "with unrolled rounds. operators/bpe.py:bpe_train (+ "
    "bpe_segment, the encode twin, pytest-pinned against a pure-"
    "Python BPE reference).",
)
def bpe_train_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.bpe import bpe_train_df

    docs = _t(spark, sf_dir, "documents")
    return bpe_train_df(docs, "text", 5)
