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
from pycasselastic_spark.queries.search_dsl import _postings_index_for
from pycasselastic_spark.queries.search_r13 import (
    _TS0,
    _TS_STEP,
    _ts_index_for,
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
