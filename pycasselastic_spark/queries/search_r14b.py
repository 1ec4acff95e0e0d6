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
