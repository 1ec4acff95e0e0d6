"""Round-13 continuation queries: the ES PIPELINE aggregations
(``cumulative_sum`` / ``derivative`` under ``date_histogram``;
``bucket_selector`` / ``bucket_sort`` under ``terms``), plus further
``_search`` surface added this round.

All dispatch end-to-end through the ``es_search`` request-body API.
Pipeline aggregations are second-pass transforms over the
RESPONSE-sized bucket relation (ES caps it at ``search.max_buckets``,
default 65536), so their windows never see the corpus — the
corpus-sized reduction happened in the parent aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_api import es_search
from pycasselastic_spark.queries.base import register
from pycasselastic_spark.queries.search_dsl import _postings_index_for
from pycasselastic_spark.queries.search_r12b import (
    _BM25_TERM_SCORE,
    _TOK_POSTINGS,
)
from pycasselastic_spark.queries.search_r13 import (
    _TS0,
    _TS_STEP,
    _ts_index_for,
)

# the analyzed-hit CTE shared with the other date_histogram oracles:
# docs whose whitespace tokenization contains the query term
_HITS_MERGE = """
hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'merge'
)
"""


@register(
    "cumulative_derivative_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
c AS (SELECT CAST(FLOOR(ts / 43200) * 43200 AS BIGINT) AS bucket_s,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id) GROUP BY 1)
SELECT bucket_s, n_docs,
       CAST(SUM(n_docs) OVER (ORDER BY bucket_s) AS BIGINT) AS cum_docs,
       CAST(n_docs - LAG(n_docs) OVER (ORDER BY bucket_s) AS BIGINT)
         AS deriv_docs
FROM c ORDER BY bucket_s
""",
    doc="ES parent PIPELINE aggregations riding a date_histogram: "
    "``cumulative_sum`` (the running total every usage dashboard "
    "plots) and ``derivative`` (bucket-over-bucket delta, NULL for "
    "the first bucket — exactly ES) over buckets_path ``_count``. "
    "operators/search_compose.py:apply_bucket_pipelines. The window "
    "is single-partition BY DESIGN: its input is the final bucket "
    "table ES itself caps at search.max_buckets (default 65536), "
    "never the corpus — the corpus-sized reduction already happened "
    "in the histogram. Dispatched from "
    "aggs.<name>.date_histogram + aggs.<name>.aggs.",
)
def cumulative_derivative_documents(
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
                "cum_docs": {"cumulative_sum": {"buckets_path": "_count"}},
                "deriv_docs": {"derivative": {"buckets_path": "_count"}},
            },
        }},
    })
    return out.select(
        F.col("bucket").cast("long").alias("bucket_s"),
        "n_docs", "cum_docs", "deriv_docs",
    ).orderBy("bucket_s")


@register(
    "bucket_selector_sort_documents",
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
SELECT * FROM b WHERE n_docs >= 18
ORDER BY sum_val DESC, bucket LIMIT 5
""",
    doc="ES sibling PIPELINE aggregations under terms: "
    "``bucket_selector`` (keep buckets where params.n >= 18 — the "
    "supported script grammar is one comparison of one buckets_path "
    "variable, the filter-dashboards shape; Painless beyond that "
    "raises by name) then ``bucket_sort`` re-paging by the stats "
    "sub-aggregation's sum descending, size 5. buckets_path resolves "
    "_count and <stats>.sum/min/max; selecting on the Q20-quantized "
    "avg raises rather than comparing in the wrong units. "
    "operators/search_compose.py:apply_bucket_selector/"
    "apply_bucket_sort over the response-sized bucket relation. "
    "Dispatched from aggs.<name>.aggs siblings.",
)
def bucket_selector_sort_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"per_source": {
            "terms": {"field": "source"},
            "aggs": {
                "len": {"stats": {"field": "n_chars"}},
                "keep_busy": {"bucket_selector": {
                    "buckets_path": {"n": "_count"},
                    "script": "params.n >= 18",
                }},
                "page": {"bucket_sort": {
                    "sort": [{"len.sum": {"order": "desc"}}],
                    "size": 5,
                }},
            },
        }},
    })


@register(
    "filters_agg_documents",
    f"""
WITH {_HITS_MERGE},
dv AS (SELECT d.* FROM documents d JOIN hits USING (doc_id))
SELECT bucket, n_docs FROM (
  SELECT 'en' AS bucket,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs FROM dv
  UNION ALL
  SELECT 'long',
         CAST(SUM(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS BIGINT)
    FROM dv
  UNION ALL
  SELECT 'src5',
         CAST(SUM(CASE WHEN source = 'src5' THEN 1 ELSE 0 END) AS BIGINT)
    FROM dv
) ORDER BY bucket
""",
    doc="ES ``filters`` aggregation: one NAMED bucket per "
    "filter-context clause over the hit set (term lang, range "
    "n_chars, term source) — the segment-comparison dashboard shape. "
    "Buckets overlap freely and EMPTY named buckets return 0 "
    "(exactly ES; adjacency_matrix omits them instead). "
    "operators/search_compose.py:search_filters_agg — hit ids join "
    "ONE column-pruned doc-values scan, every bucket a conditional "
    "sum inside a SINGLE reduction, then a bounded len(filters) "
    "explode; no per-bucket re-scan, the corpus is never shuffled. "
    "Dispatched from aggs.<name>.filters.filters.",
)
def filters_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"segments": {"filters": {"filters": {
            "en": {"term": {"lang": "en"}},
            "long": {"range": {"n_chars": {"gte": 400}}},
            "src5": {"term": {"source": "src5"}},
        }}}},
    })


@register(
    "adjacency_matrix_documents",
    f"""
WITH {_HITS_MERGE},
dv AS (SELECT d.* FROM documents d JOIN hits USING (doc_id)),
cells AS (
  SELECT 'en' AS bucket,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs FROM dv
  UNION ALL
  SELECT 'fr',
         CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
    FROM dv
  UNION ALL
  SELECT 'long',
         CAST(SUM(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS BIGINT)
    FROM dv
  UNION ALL
  SELECT 'en&fr',
         CAST(SUM(CASE WHEN lang = 'en' AND lang = 'fr'
                  THEN 1 ELSE 0 END) AS BIGINT) FROM dv
  UNION ALL
  SELECT 'en&long',
         CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 400
                  THEN 1 ELSE 0 END) AS BIGINT) FROM dv
  UNION ALL
  SELECT 'fr&long',
         CAST(SUM(CASE WHEN lang = 'fr' AND n_chars >= 400
                  THEN 1 ELSE 0 END) AS BIGINT) FROM dv
)
SELECT bucket, n_docs FROM cells WHERE n_docs > 0 ORDER BY bucket
""",
    doc="ES ``adjacency_matrix`` aggregation: a bucket per named "
    "filter PLUS one per pairwise intersection (keys joined by '&' "
    "in sorted name order) — the segment co-occurrence matrix. "
    "Zero-count buckets are OMITTED (exactly ES; here en&fr is "
    "structurally empty — one doc has one lang — and must disappear "
    "from the output, which the oracle pins). The n(n-1)/2 pair "
    "space is over the FILTER LIST (ES caps it at max_clause_count), "
    "never the docs: one doc-values pass computes every single and "
    "pairwise conditional sum in a SINGLE reduction. "
    "operators/search_compose.py:search_adjacency_matrix_agg; "
    "dispatched from aggs.<name>.adjacency_matrix.",
)
def adjacency_matrix_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"overlap": {"adjacency_matrix": {"filters": {
            "en": {"term": {"lang": "en"}},
            "fr": {"term": {"lang": "fr"}},
            "long": {"range": {"n_chars": {"gte": 400}}},
        }}}},
    })


@register(
    "rank_feature_documents",
    """
SELECT doc_id,
       CAST(FLOOR(1.5
         * (n_chars::DOUBLE / (n_chars::DOUBLE + 300.0))
         * 1048576.0) AS BIGINT) AS score_q20
FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``rank_feature`` query, saturation function: score = "
    "boost * x / (x + pivot) over a positive numeric doc-values "
    "field — the static-signal ranker (pagerank / recency / "
    "url_length). x and pivot are exact in double, the saturation is "
    "ONE IEEE division then the Q20 floor (bit-replayable); the "
    "log/sigmoid functions are transcendental and raise by name, as "
    "does the pivot-less form (ES defaults it to the index's "
    "approximate geometric mean — statistics-derived, not "
    "replayable). operators/search_compose.py:rank_feature_search; "
    "one column-pruned doc-values scan with the positive predicate "
    "pushed down, TakeOrderedAndProject. Dispatched from "
    "query.rank_feature.",
)
def rank_feature_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"rank_feature": {
            "field": "n_chars",
            "saturation": {"pivot": 300},
            "boost": 1.5,
        }},
        "size": 10,
    })


@register(
    "distance_feature_documents",
    f"""
WITH d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents)
SELECT doc_id,
       CAST(FLOOR(2.0
         * (259200.0 / (259200.0 + ABS(ts - {_TS0 + 2 * _TS_STEP})))
         * 1048576.0) AS BIGINT) AS score_q20
FROM d
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``distance_feature`` query over a DATE field: score = "
    "boost * pivot / (pivot + |value - origin|) — the recency "
    "booster every news/feed ranker runs (docs at the origin score "
    "boost, decaying hyperbolically). Origin parses from ISO or "
    "epoch seconds, pivot from the ES duration grammar (<n>s/m/h/d); "
    "the temporal distance is an exact BIGINT and the score one IEEE "
    "division, Q20-floored — bit-replayable. Geo origins raise (no "
    "geo doc-values here). operators/search_compose.py:"
    "distance_feature_search; one column-pruned doc-values scan, "
    "TakeOrderedAndProject. Dispatched from query.distance_feature.",
)
def distance_feature_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"distance_feature": {
            "field": "ingest_ts",
            "origin": _TS0 + 2 * _TS_STEP,
            "pivot": "3d",
            "boost": 2.0,
        }},
        "size": 10,
    })


@register(
    "pinned_search_documents",
    f"""
WITH {_TOK_POSTINGS.strip().rstrip(',')},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scores AS (
  SELECT qt.doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
),
pin_spec AS (SELECT * FROM (VALUES (0, 5), (1, 12), (2, 999999999))
             t(_pos, doc_id)),
pin AS (
  SELECT ROW_NUMBER() OVER (ORDER BY _pos) AS rnk, doc_id
  FROM pin_spec WHERE doc_id IN (SELECT doc_id FROM documents)
),
org AS (
  SELECT s.doc_id, ROW_NUMBER() OVER (ORDER BY s.score_q20 DESC, s.doc_id)
           AS rn
  FROM scores s WHERE s.doc_id NOT IN (SELECT doc_id FROM pin_spec)
),
page AS (
  SELECT rnk, doc_id, TRUE AS pinned FROM pin
  UNION ALL
  SELECT rn + (SELECT COUNT(*) FROM pin), doc_id, FALSE FROM org
)
SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, pinned
FROM page ORDER BY rnk LIMIT 10
""",
    doc="ES ``pinned`` query: the listed ids occupy the TOP of the "
    "page in list order (editorial promotion), then organic BM25 "
    "hits with pinned ids excluded — the same size-bounded page, not "
    "an extended one. A pinned id absent from the index is skipped "
    "(here 999999999), exactly ES. operators/search_compose.py:"
    "pinned_search — the pinned list is a literal inline relation "
    "(ES caps pinned ids at 100) semi-joined against live ids; the "
    "organic probe is the standard pruned BM25 probe minus the "
    "pinned set via one bounded anti-join; ranks are ROW_NUMBERs "
    "over k-bounded relations. Dispatched from query.pinned.",
)
def pinned_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"pinned": {
            "ids": [5, 12, 999999999],
            "organic": {"match": {"text": "merge spark"}},
        }},
        "size": 10,
    })


# --- combined_fields: ANALYZED title/body field indexes ----------------------
# combined_fields reconstructs per-doc field norms from the forward
# relation (dl = sum of tf), exact only for analyzed indexes — the
# identity chain below keeps tokens byte-identical to the whitespace
# split while switching dl to the kept-token law.

_CF_INDEX_CACHE: dict[str, tuple[str, str]] = {}


def _cf_indexes_for(spark: SparkSession, sf_dir: str):
    import os
    import tempfile

    from pycasselastic_spark.operators import search as SRCH
    from pycasselastic_spark.operators.search_index import Analyzer
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    cached = _CF_INDEX_CACHE.get(sf_dir)
    if cached is None:
        docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
        toks = F.split(F.col("text"), " ")
        fields = docs.select(
            "doc_id",
            F.array_join(F.slice(toks, 1, 8), " ").alias("title"),
            F.array_join(
                F.expr(
                    "slice(split(text, ' '), 9,"
                    " greatest(size(split(text, ' ')) - 8, 0))"
                ),
                " ",
            ).alias("body"),
        )
        ident = Analyzer(lowercase=False, strip_punct=False)
        base = tempfile.mkdtemp(prefix="cf_idx_")
        tpath = os.path.join(base, "title")
        bpath = os.path.join(base, "body")
        SRCH.build_postings_index(
            fields.select("doc_id", "title"), "doc_id", "title", tpath,
            16, analyzer=ident,
        )
        SRCH.build_postings_index(
            fields.select("doc_id", "body"), "doc_id", "body", bpath,
            16, analyzer=ident,
        )
        cached = (tpath, bpath)
        _CF_INDEX_CACHE[sf_dir] = cached
    return (
        SRCH.load_postings_index(spark, cached[0]),
        SRCH.load_postings_index(spark, cached[1]),
    )


@register(
    "combined_fields_documents",
    """
WITH f AS (SELECT doc_id,
  array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS title,
  array_to_string(list_slice(string_split(text, ' '), 9,
    len(string_split(text, ' '))), ' ') AS body
  FROM documents),
tpost AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(title, ' ')) AS term FROM f)
  WHERE term <> '' GROUP BY doc_id, term),
bpost AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(body, ' ')) AS term FROM f)
  WHERE term <> '' GROUP BY doc_id, term),
u AS (
  SELECT doc_id, term, tf * 1 AS wtf FROM tpost
  WHERE term IN ('merge', 'spark')
  UNION ALL
  SELECT doc_id, term, tf * 2 AS wtf FROM bpost
  WHERE term IN ('merge', 'spark')
),
tfc AS (SELECT doc_id, term, CAST(SUM(wtf) AS BIGINT) AS tf_c
        FROM u GROUP BY doc_id, term),
dfc AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM u GROUP BY term),
dl AS (SELECT doc_id,
  CAST(len(list_filter(string_split(title, ' '), x -> x <> ''))
     + 2 * len(list_filter(string_split(body, ' '), x -> x <> ''))
    AS BIGINT) AS dl_c FROM f),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
  CAST(SUM(len(list_filter(string_split(title, ' '), x -> x <> ''))
       + 2 * len(list_filter(string_split(body, ' '), x -> x <> '')))
    AS DOUBLE) / COUNT(*) AS avgdl FROM f)
SELECT tfc.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(SUM(CAST(FLOOR(
         ln(1.0 + (sc.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
         * (tfc.tf_c * 2.2)
         / (tfc.tf_c + 1.2 * (0.25 + 0.75 * dl.dl_c / sc.avgdl))
         * 1048576.0) AS BIGINT)) AS BIGINT) AS score_q20
FROM tfc JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
GROUP BY tfc.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``combined_fields`` query — TERM-centric multi-field "
    "scoring against ONE synthetic combined field (Lucene's "
    "CombinedFieldQuery / BM25F simplification), here title + "
    "body^2: tf_c = tf_title + 2 x tf_body, dl_c = dl_title + 2 x "
    "dl_body, df = docs with the term in ANY field, avgdl from the "
    "weighted total lengths — the principled alternative ES offers "
    "to cross_fields' per-field blending (boosts must be integers "
    ">= 1 because the synthetic tf stays integral; fractional "
    "boosts raise, exactly ES). Per-doc field norms are "
    "reconstructed from each index's id-bucketed FORWARD relation "
    "(dl = sum of tf — exact for analyzed indexes; legacy "
    "slot-count indexes raise). operators/search_compose.py:"
    "combined_fields_search; dispatched from query.combined_fields. "
    "Plan: per-field pruned probes unioned (query-bounded), "
    "candidate ids broadcast into the forward scans, two "
    "reductions; per-term Q20 floors, integer per-doc sum.",
)
def combined_fields_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    tidx, bidx = _cf_indexes_for(spark, sf_dir)
    return es_search(tidx, {
        "query": {"combined_fields": {
            "query": "merge spark",
            "fields": ["title", "body^2"],
        }},
        "size": 10,
    }, field_indexes={"title": tidx, "body": bidx})


# --- query_string: the Lucene grammar ----------------------------------------

# per-(term, doc) BM25 with its OWN Q20 floor — the query_string leaf
# law (each leaf probe floors independently; boolean combinations sum
# the integer floors, so compositions stack no float noise)
_QS_PER_TERM = f"""
per AS (SELECT qt.doc_id,
         CAST(FLOOR(({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
        FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id)
             CROSS JOIN sc)
"""


@register(
    "query_string_bool_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
{_QS_PER_TERM},
pos AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_q20
        FROM per GROUP BY doc_id),
neg AS (SELECT DISTINCT doc_id FROM postings WHERE term = 'slow')
SELECT doc_id, score_q20 FROM pos
WHERE doc_id NOT IN (SELECT doc_id FROM neg)
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``query_string`` — the full Lucene grammar every Kibana "
    "search box POSTs, here '(merge OR spark) AND NOT slow': "
    "recursive-descent parse with Lucene precedence (NOT > AND > "
    "OR, default_operator filling bare adjacency), compiled onto a "
    "HIT-RELATION ALGEBRA over the standalone probes — each leaf a "
    "query-bounded pruned-postings probe returning (id, Q20 score), "
    "AND an inner join summing scores, OR a full outer coalesce-sum, "
    "AND NOT an anti join (operators/search_qs.py). Pure-negative "
    "queries and NOT-under-OR raise by name (Lucene's "
    "prohibited-clause OR semantics is a silent-miss trap), as do "
    "inner wildcards (field: scoping, ^boosts and ranges dispatch "
    "since round 14 — query_string_fielded_documents). "
    "Determinism: leaves floor independently, combinations are exact "
    "integer sums. Dispatched from query.query_string.",
)
def query_string_bool_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"query_string": {
            "query": "(merge OR spark) AND NOT slow",
        }},
        "size": 10,
    })


@register(
    "query_string_mixed_documents",
    f"""
WITH {_TOK_POSTINGS},
-- phrase leaf: Lucene PhraseQuery BM25 ("fast merge", adjacency)
tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
pf AS (SELECT doc_id,
    CAST(len(list_filter(range(1, len(tk)),
      i -> tk[i] = 'fast' AND tk[i + 1] = 'merge')) AS BIGINT) AS pf
  FROM tk),
pfh AS (SELECT * FROM pf WHERE pf > 0),
pdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings
  WHERE term IN ('fast', 'merge') GROUP BY term),
pidf AS (SELECT CAST(SUM(CAST(FLOOR(
    ln(1.0 + (sc.n_docs - df + 0.5) / (df + 0.5)) * 1048576.0)
    AS BIGINT)) AS BIGINT) AS idf_q FROM pdf CROSS JOIN sc),
phr AS (SELECT p.doc_id,
    CAST(FLOOR((pidf.idf_q / 1048576.0)
      * (p.pf * 2.2) / (p.pf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
      * 1048576.0) AS BIGINT) AS s
  FROM pfh p JOIN dl USING (doc_id) CROSS JOIN pidf CROSS JOIN sc),
-- prefix leaf: 'mer*' expanded at the df-desc rewrite cap (50)
exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM postings WHERE term LIKE 'mer%'
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM exp)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt
  GROUP BY term),
pre AS (SELECT qt.doc_id,
    CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs)
SELECT COALESCE(phr.doc_id, pre.doc_id) AS doc_id,
       CAST(COALESCE(phr.s, 0) + COALESCE(pre.s, 0) AS BIGINT)
         AS score_q20
FROM phr FULL OUTER JOIN pre ON phr.doc_id = pre.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``query_string`` mixing LEAF TYPES in one boolean — "
    "'\"fast merge\" OR mer*': the quoted phrase compiles to the "
    "positional PhraseQuery probe (stored-position chain counting, "
    "Lucene BM25 phrase scoring), the trailing-* prefix to the "
    "dictionary-expansion probe (df-desc rewrite cap 50), and the OR "
    "combines their independently-floored Q20 scores in one full "
    "outer coalesce-sum — the composed scoring law "
    "simple_query_string deliberately refuses (it dispatches "
    "single-leaf specials only); query_string's algebra makes the "
    "composition exact. operators/search_qs.py:_compile. Plan: two "
    "query-bounded probe relations, one bounded join, "
    "TakeOrderedAndProject.",
)
def query_string_mixed_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"query_string": {
            "query": '"fast merge" OR mer*',
        }},
        "size": 10,
    })


@register(
    "rare_terms_agg_documents",
    f"""
WITH {_HITS_MERGE}
SELECT d.n_chars AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN hits USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY 1 HAVING COUNT(*) <= 2
ORDER BY n_docs, bucket
""",
    doc="ES ``rare_terms`` aggregation: the LONG TAIL the terms agg's "
    "size cap hides — buckets of the hit set's n_chars doc-values "
    "holding at most max_doc_count=2 docs, rarest first (count asc "
    "then value, ES's contract). ES bounds memory with a "
    "CuckooFilter and documents the approximation; here the bucket "
    "relation is exact and the rarity cut is a post-aggregation "
    "predicate riding the SAME single reduction as the terms facet. "
    "operators/search_ext.py:search_rare_terms_agg; dispatched from "
    "aggs.<name>.rare_terms.",
)
def rare_terms_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"rare_lengths": {"rare_terms": {
            "field": "n_chars", "max_doc_count": 2,
        }}},
    })


@register(
    "global_extended_stats_documents",
    """
WITH s AS (
  SELECT CAST(COUNT(n_chars) AS BIGINT) AS n_docs,
         MIN(n_chars) AS min_val,
         MAX(n_chars) AS max_val,
         CAST(SUM(n_chars) AS BIGINT) AS sum_val,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_sq,
         CAST(FLOOR(AVG(n_chars) * 1048576.0) AS BIGINT) AS avg_q20
  FROM documents
)
SELECT n_docs, min_val, max_val, sum_val, sum_sq, avg_q20,
       CAST(FLOOR(((CAST(sum_sq AS DOUBLE)
          - CAST(sum_val AS DOUBLE) * CAST(sum_val AS DOUBLE) / n_docs)
          / n_docs) * 1048576.0) AS BIGINT) AS var_q20,
       CAST(FLOOR(sqrt((CAST(sum_sq AS DOUBLE)
          - CAST(sum_val AS DOUBLE) * CAST(sum_val AS DOUBLE) / n_docs)
          / n_docs) * 1048576.0) AS BIGINT) AS std_q20
FROM s
""",
    doc="ES ``global`` aggregation scope carrying ``extended_stats``: "
    "the sub-aggregation runs over ALL live docs, IGNORING the query "
    "(here a match that would otherwise narrow the scope) — the "
    "'hits vs overall' comparison every faceted dashboard draws. "
    "extended_stats adds sum_of_squares / population variance / std "
    "to the stats row; INTEGRAL fields only (fractional raise — the "
    "exact-integer law doesn't extend): n, Σx, Σx² are exact "
    "BIGINTs, variance = (Σx² - (Σx)²/n)/n in IEEE double from exact "
    "integers (identical rounding cross-engine), std the "
    "correctly-rounded sqrt, both Q20-floored. operators/"
    "search_ext.py:search_extended_stats_agg; global unwrap in "
    "es_search. One partial-aggregated reduction to a single row.",
)
def global_extended_stats_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"all_docs": {
            "global": {},
            "aggs": {"len_stats": {"extended_stats": {
                "field": "n_chars",
            }}},
        }},
    })


@register(
    "mget_documents",
    """
WITH req AS (SELECT * FROM (VALUES (0, 5), (1, 999999999), (2, 12),
                                   (3, 7))
             t(pos, doc_id))
SELECT CAST(req.pos AS BIGINT) AS pos, req.doc_id,
       d.doc_id IS NOT NULL AS found,
       d.n_chars, d.source, d.lang
FROM req LEFT JOIN documents d USING (doc_id)
ORDER BY pos
""",
    doc="ES ``_mget``: batched point lookup BY ID in REQUEST ORDER, "
    "one response row per requested id with found=false for absent "
    "ids (here 999999999) and NULL stored fields — the round-trip "
    "the reference runs after every bulk upsert (read-back "
    "verification, pyCassElastic.py's ES GET path). The stored "
    "doc-values ARE the _source this engine keeps columnar. "
    "operators/search_api.py:es_mget — the id list is a literal "
    "request-bounded inline relation, one broadcast join against "
    "the live doc-values scan, ordered by request position.",
)
def mget_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_mget

    idx = _postings_index_for(spark, sf_dir)
    out = es_mget(idx, [5, 999999999, 12, 7])
    return out.select(
        "pos", "doc_id", "found", "n_chars", "source", "lang"
    ).orderBy("pos")


# --- SemDeDup: semantic dedup by embedding clusters --------------------------

from pycasselastic_spark.queries.pipeline_text import (  # noqa: E402
    _DOT_SQL,
    _MEAN_SQL,
    _UNIT_SQL,
)

_SEMDEDUP_THRESHOLD = 0.4
_SEMDEDUP_RECALL = 0.6


def _semdedup_oracle(sf_dir: str) -> str | None:
    """Render the SemDeDup oracle with the SAME corpus-scaled LSH
    parameters the Spark side derives (lsh_params_for over the DuckDB
    row count — pure arithmetic on n, both engines agree by
    construction); fixed small bands measured 27x at 10x data, the
    scaled form is the 100 TB path."""
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
        n, _SEMDEDUP_THRESHOLD, _SEMDEDUP_RECALL
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
  SELECT vec_id, b AS band_idx,
         substring(sig, b * {width} + 1, {width}) AS band_key
  FROM sigs, range(0, {num_bands}) t(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS doc_a, c.vec_id AS doc_b
  FROM banded a JOIN banded c
    ON a.band_idx = c.band_idx AND a.band_key = c.band_key
  WHERE a.vec_id < c.vec_id
),
vpairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT cand.doc_a, cand.doc_b,
           {_DOT_SQL.format(a='x.u', b='y.u')} AS cosine
    FROM cand JOIN eu x ON x.vec_id = cand.doc_a
              JOIN eu y ON y.vec_id = cand.doc_b)
  WHERE cosine >= {_SEMDEDUP_THRESHOLD}
),
edges AS (SELECT doc_a AS s, doc_b AS d FROM vpairs
          UNION SELECT doc_b, doc_a FROM vpairs),
comp AS (
  WITH RECURSIVE reach(node, label) AS (
    SELECT DISTINCT s, s FROM edges
    UNION
    SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
  )
  SELECT node, MIN(label) AS component FROM reach GROUP BY node),
memb AS (SELECT c.node AS vec_id, c.component, eu.u
         FROM comp c JOIN eu ON eu.vec_id = c.node),
cq AS (SELECT component, k AS dim,
         CAST(SUM(CAST(FLOOR(u[k] * 1048576.0) AS BIGINT)) AS DOUBLE)
           / (1048576.0 * COUNT(*)) AS m
       FROM memb, range(1, 65) t(k) GROUP BY component, k),
carr AS (SELECT component, list(m ORDER BY dim) AS cv FROM cq
         GROUP BY component),
cn AS (SELECT component,
         list_transform(cv, x -> x /
           sqrt(list_sum(list_transform(cv, y -> y * y)))) AS cu
       FROM carr),
scored AS (
  SELECT m.vec_id, m.component,
         CAST(FLOOR({_DOT_SQL.format(a='m.u', b='cn.cu')} * 1048576.0)
           AS BIGINT) AS cos_c_q20
  FROM memb m JOIN cn USING (component)),
keeper AS (
  SELECT component, vec_id AS keep_id FROM (
    SELECT component, vec_id,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY cos_c_q20, vec_id) AS rn
    FROM scored) WHERE rn = 1)
SELECT s.vec_id, s.component, s.cos_c_q20,
       s.vec_id = k.keep_id AS keep
FROM scored s JOIN keeper k USING (component)
ORDER BY s.component, s.vec_id
"""


@register(
    "semdedup_prune_embeddings",
    _semdedup_oracle,
        doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — SEMANTIC "
    "dedup by embedding clusters, the pruning pass behind "
    "web-scale curation stacks: duplicate groups are connected "
    "components of the cosine>=0.4 LSH pair graph; within each "
    "group ONE representative survives — the member with the LOWEST "
    "cosine to the group centroid (the paper's keep-the-atypical "
    "rule: near-centroid copies are the redundant mass, the outlier "
    "carries the diversity). operators/dedup.py:semdedup_prune. "
    "Fully deterministic end-to-end: md5-hyperplane banding, "
    "large/small-star components, Q20 fixed-point centroid sums, "
    "sequential-fold cosines, argmin on (floor(cos x 2^20), id) — "
    "the oracle replays ALL of it in SQL including the recursive "
    "closure. Scale: band-bounded pair space, dup-member-bounded "
    "components, (component, dim)-keyed centroid reduction; the "
    "corpus never shuffles.",
)
def semdedup_prune_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.dedup import semdedup_prune
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    return semdedup_prune(
        emb, "vec_id", "embedding", _SEMDEDUP_THRESHOLD,
        target_recall=_SEMDEDUP_RECALL,
    )


# --- UniMax: water-filled budget allocation across sources --------------------

_UNIMAX_BUDGET, _UNIMAX_EPOCHS = 3000, 2

_UNIMAX_ALLOC_SQL = f"""
c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
r AS (SELECT source, n_docs,
        ROW_NUMBER() OVER (ORDER BY n_docs, source) AS i,
        COUNT(*) OVER () AS k,
        CAST(n_docs * {_UNIMAX_EPOCHS} AS BIGINT) AS cap,
        CAST(COALESCE(SUM(n_docs * {_UNIMAX_EPOCHS}) OVER (
          ORDER BY n_docs, source
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS prefix
      FROM c),
f AS (SELECT *,
        MIN(CASE WHEN cap * (k - i + 1) <= {_UNIMAX_BUDGET} - prefix
                 THEN 1 ELSE 0 END) OVER (
          ORDER BY n_docs, source
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS is_full
      FROM r),
t AS (SELECT *,
        SUM(CASE WHEN is_full THEN cap ELSE 0 END) OVER () AS full_sum,
        SUM(CASE WHEN is_full THEN 1 ELSE 0 END) OVER () AS n_full
      FROM f),
alloc AS (SELECT source, n_docs, is_full AS at_cap,
        CASE WHEN is_full THEN CAST(cap AS DOUBLE)
             WHEN k = n_full THEN CAST(0.0 AS DOUBLE)
             ELSE CAST({_UNIMAX_BUDGET} - full_sum AS DOUBLE)
                  / CAST(k - n_full AS DOUBLE) END AS a
      FROM t),
rates AS (SELECT source, n_docs, at_cap,
        CAST(FLOOR(a * 1048576.0) AS BIGINT) AS alloc_q20,
        CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                         a / CAST(n_docs AS DOUBLE)) * 1048576.0)
          AS BIGINT) AS rate_q20
      FROM alloc)
"""


@register(
    "unimax_allocation_documents",
    f"""
WITH {_UNIMAX_ALLOC_SQL}
SELECT source, n_docs, alloc_q20, rate_q20, at_cap
FROM rates ORDER BY source
""",
    doc="UniMax budget allocation (Chung et al. 2023, "
    "arXiv:2304.09151) — the fairer alternative to temperature "
    "mixing: WATER-FILL a document budget across sources with a "
    "per-source epoch cap (here budget 3000, max 2 epochs). Sources "
    "ascending by size each take an equal share of the remaining "
    "budget capped at epochs x size; freed budget flows to larger "
    "sources, so the tail is never oversampled past the cap and the "
    "head never starves it. The greedy loop collapses to its "
    "water-filling closed form (fullness is prefix-closed in "
    "ascending order): ONE cumulative-sum window over the tiny "
    "strata relation, caps and prefixes exact integers, the residual "
    "share one IEEE division — bit-replayable. operators/"
    "sampling.py:unimax_allocation; the corpus is touched by exactly "
    "one partial-aggregated count.",
)
def unimax_allocation_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.sampling import unimax_allocation
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return unimax_allocation(
        docs, "source", _UNIMAX_BUDGET, max_epochs=_UNIMAX_EPOCHS
    )


@register(
    "unimax_sample_documents",
    f"""
WITH {_UNIMAX_ALLOC_SQL}
SELECT d.doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT::DOUBLE
        / 4503599627370496.0
      < CAST(rate_q20 AS DOUBLE) / 1048576.0
ORDER BY d.doc_id
""",
    doc="UniMax applied: each doc keeps iff its 52-bit md5 uniform "
    "falls under its source's water-filled Q20 rate — the sampling "
    "twin of unimax_allocation_documents and the UniMax counterpart "
    "of temperature_mixture_sample (broadcast rate join + narrow "
    "filter, corpus never shuffled; the Q20-floored rate is the one "
    "the allocation table publishes, so keep decisions replay "
    "bit-for-bit). operators/sampling.py:unimax_sample.",
)
def unimax_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.sampling import unimax_sample
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return unimax_sample(
        docs, "doc_id", "source", _UNIMAX_BUDGET,
        max_epochs=_UNIMAX_EPOCHS,
    ).select("doc_id", "source").orderBy("doc_id")


# --- _count API, intervals query, sampler aggregation ------------------------

from pycasselastic_spark.queries.search_r13 import _TOKPOS_SQL  # noqa: E402


@register(
    "count_api_documents",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
x AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'slow')
SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
FROM m WHERE doc_id NOT IN (SELECT doc_id FROM x)
""",
    doc="ES ``_count``: the hit COUNT of a query body without "
    "fetching hits — the cheapest request ES serves and the one "
    "every monitoring dashboard polls; here a bool "
    "(must match 'merge', must_not term 'slow'). Reuses the "
    "aggregation scope dispatcher's hit-relation machinery, so every "
    "scope-supported query shape counts and unsupported ones raise "
    "by name. operators/search_api.py:es_count. Plan: the pruned "
    "hit-id relation reduced by ONE count — no stored-field fetch, "
    "no scoring, no sort.",
)
def count_api_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_count

    idx = _postings_index_for(spark, sf_dir)
    return es_count(idx, {"query": {"bool": {
        "must": [{"match": {"text": "merge"}}],
        "must_not": [{"term": {"text": "slow"}}],
    }}})


@register(
    "intervals_match_documents",
    "WITH "
    + _TOKPOS_SQL
    + """,
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'merge'),
sel AS (
  SELECT DISTINCT a.doc_id, a.pos AS p
  FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos > a.pos
       AND b.pos - a.pos <= 3)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM sel GROUP BY doc_id ORDER BY doc_id
""",
    doc="ES ``intervals`` query, ``match`` rule with ordered=true + "
    "max_gaps — the modern interval-algebra surface Lucene grew to "
    "replace span queries: 'fast merge' in order with at most 2 "
    "intervening positions. An ordered bounded-gap interval IS the "
    "span total-stretch law (end - start <= n_terms + max_gaps - 1), "
    "so the dispatcher compiles it onto span_near_search — one "
    "grammar, one proximity engine. Unordered intervals, unbounded "
    "max_gaps (ES's -1 default would be a co-occurrence test, not a "
    "proximity probe) and the all_of/any_of/prefix/fuzzy rules raise "
    "by name. Dispatched from query.intervals.",
)
def intervals_match_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"intervals": {"text": {"match": {
            "query": "fast merge", "max_gaps": 2, "ordered": True,
        }}}},
    }).orderBy("doc_id")


@register(
    "sampler_agg_documents",
    f"""
WITH {_TOK_POSTINGS.strip().rstrip(',')},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scores AS (
  SELECT qt.doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
),
top AS (SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_q20 DESC, doc_id) rn
  FROM scores) WHERE rn <= 60)
SELECT d.source AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN top USING (doc_id)
WHERE d.source IS NOT NULL
GROUP BY 1 ORDER BY n_docs DESC, bucket
""",
    doc="ES ``sampler`` aggregation: the sub-aggregation (a terms "
    "facet over source) runs over only the TOP-SCORING shard_size "
    "hits — the 'what do the best matches look like' scope that "
    "keeps agg cost flat no matter how many docs match. ES's "
    "per-shard sample is topology-dependent; this engine's one "
    "logical shard makes it the exact global top-N by (score, id) — "
    "strictly more reproducible, same contract at shard count 1. "
    "Plan: the pruned scored probe's TakeOrderedAndProject feeds a "
    "broadcast semi-join into the column-pruned doc-values scan, one "
    "facet reduction. Dispatched from aggs.<name>.sampler.",
)
def sampler_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge spark"}},
        "aggs": {"best": {
            "sampler": {"shard_size": 60},
            "aggs": {"src": {"terms": {"field": "source"}}},
        }},
    })


# --- weighted_avg / median_absolute_deviation / wrapper ----------------------

_WV_INDEX_CACHE: dict[str, str] = {}


def _wv_index_for(spark: SparkSession, sf_dir: str):
    """Index storing TWO integral doc-values fields (n_chars + the
    derived token count) — the weighted_avg fixture, built once per
    sf_dir like every corpus fixture."""
    import os
    import tempfile

    from pycasselastic_spark.operators import search as SRCH
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    path = _WV_INDEX_CACHE.get(sf_dir)
    if path is None:
        docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
        with_tok = docs.select(
            "doc_id", "text", "n_chars",
            F.size(F.split(F.col("text"), " ")).cast("long")
            .alias("n_tokens"),
        )
        path = os.path.join(tempfile.mkdtemp(prefix="wv_idx_"), "idx")
        SRCH.build_postings_index(
            with_tok, "doc_id", "text", path, n_buckets=16,
            stored_fields=["n_chars", "n_tokens"],
        )
        _WV_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "weighted_avg_agg_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id, n_chars,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
       CAST(SUM(n_tokens) AS BIGINT) AS wsum,
       CAST(FLOOR(CAST(SUM(n_chars * n_tokens) AS DOUBLE)
         / CAST(SUM(n_tokens) AS DOUBLE) * 1048576.0) AS BIGINT)
         AS wavg_q20
FROM d JOIN hits USING (doc_id)
WHERE n_chars IS NOT NULL AND n_tokens IS NOT NULL
""",
    doc="ES ``weighted_avg`` aggregation: Σ(value x weight)/Σ(weight) "
    "over the hit set's stored doc-values (char length weighted by "
    "token count) — the rating-by-volume request shape. INTEGRAL "
    "fields only: both sums exact BIGINTs, the quotient ONE IEEE "
    "division Q20-floored; NULL-on-either-side rows skipped (ES's "
    "default missing behavior). operators/search_compose.py:"
    "search_weighted_avg_agg — hit ids join ONE two-field doc-values "
    "scan, a single partial-aggregated reduction. Dispatched from "
    "aggs.<name>.weighted_avg.",
)
def weighted_avg_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _wv_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"wavg": {"weighted_avg": {
            "value": {"field": "n_chars"},
            "weight": {"field": "n_tokens"},
        }}},
    })


@register(
    "mad_agg_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id, n_chars FROM documents),
h AS (SELECT n_chars FROM d JOIN hits USING (doc_id)
      WHERE n_chars IS NOT NULL),
m AS (SELECT quantile_cont(n_chars, 0.5) AS med FROM h)
SELECT CAST(FLOOR(quantile_cont(ABS(CAST(h.n_chars AS DOUBLE) - m.med),
         0.5) * 1048576.0) AS BIGINT) AS mad_q20
FROM h CROSS JOIN m
""",
    doc="ES ``median_absolute_deviation`` over the hit set — the "
    "robust dispersion metric (immune to the outliers that wreck "
    "std): median(|x - median|). ES computes it on a t-digest and "
    "documents the approximation; one Spark reduction computes the "
    "EXACT interpolated answer (Spark percentile and DuckDB "
    "quantile_cont share the interpolation law, and over integral "
    "inputs every midpoint is an exactly-representable binary "
    "fraction). The t-digest ``compression`` dial raises — accepting "
    "it would imply an approximation. operators/search_compose.py:"
    "search_mad_agg; two column-pruned reductions, the inner median "
    "a broadcast scalar. Dispatched from "
    "aggs.<name>.median_absolute_deviation.",
)
def mad_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"spread": {"median_absolute_deviation": {
            "field": "n_chars",
        }}},
    })


@register(
    "wrapper_query_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term)
SELECT qt.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
         AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
GROUP BY qt.doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``wrapper`` query: a base64-encoded query embedded by "
    "tooling that can't emit raw JSON (templating layers, signed "
    "query pass-through) — decoded and RE-DISPATCHED through "
    "es_search, so every strictness rule applies to the decoded "
    "query unchanged; here it wraps a plain match and must rank "
    "IDENTICALLY to the direct request (the oracle is the standard "
    "BM25 replay). Malformed payloads and non-object decodes raise "
    "by name. Dispatched from query.wrapper.",
)
def wrapper_query_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    import base64
    import json

    idx = _postings_index_for(spark, sf_dir)
    encoded = base64.b64encode(
        json.dumps({"match": {"text": "merge spark"}}).encode()
    ).decode()
    return es_search(idx, {
        "query": {"wrapper": {"query": encoded}},
        "size": 10,
    })


# --- fields fetch, histogram zero-fill/offset, auto_date_histogram -----------


@register(
    "fields_fetch_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
page AS (
  SELECT qt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
  ORDER BY score_q20 DESC, doc_id LIMIT 10
)
SELECT p.doc_id, p.n_hit_terms, p.score_q20, d.n_chars, d.source
FROM page p JOIN documents d USING (doc_id)
ORDER BY p.score_q20 DESC, p.doc_id
""",
    doc="ES ``fields`` response shaping: the ranked hit page carries "
    "the named STORED fields — the request every client that renders "
    "results sends. Served from doc-values (the columnar _source "
    "this engine keeps); the fetch joins the k-bounded page, so the "
    "doc-values scan is id-pruned by a broadcast of at most size "
    "ids — no corpus-wide fetch, the exact opposite of SELECT *. "
    "Unstored fields raise naming the doc-values gap; combining with "
    "another shaping section raises. Dispatched from body.fields in "
    "es_search.",
)
def fields_fetch_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge spark"}},
        "fields": ["n_chars", "source"],
        "size": 10,
    })


@register(
    "histogram_zero_fill_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id, n_chars FROM documents),
c AS (SELECT CAST(FLOOR((n_chars - 25.0) / 50.0) AS BIGINT) AS bidx,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id)
      WHERE n_chars IS NOT NULL GROUP BY 1),
s AS (SELECT unnest(range((SELECT MIN(bidx) FROM c),
                          (SELECT MAX(bidx) FROM c) + 1)) AS bidx)
SELECT CAST(s.bidx AS DOUBLE) * 50.0 + 25.0 AS bucket,
       CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs
FROM s LEFT JOIN c USING (bidx) ORDER BY bucket
""",
    doc="ES numeric ``histogram`` with ``offset`` (grid shifted by 25 "
    "so bucket edges land mid-range) and ``min_doc_count=0`` "
    "zero-fill: empty buckets render as zeros across the hit set's "
    "value span — the distribution-chart contract, completing what "
    "date_histogram already had. The zero-fill is ONE "
    "generate-series from a one-row min/max reduction over bucket "
    "INDEXES (exact longs; the double bucket key is one identical "
    "multiply per engine). operators/search_ext.py:"
    "search_histogram_agg; dispatched from aggs.<name>.histogram.",
)
def histogram_zero_fill_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"lens": {"histogram": {
            "field": "n_chars", "interval": 50,
            "offset": 25, "min_doc_count": 0,
        }}},
    })


@register(
    "auto_date_histogram_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
h AS (SELECT ts FROM d JOIN hits USING (doc_id)),
span AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM h),
lad AS (SELECT unnest([1, 5, 10, 30, 60, 300, 600, 1800,
                       3600, 10800, 43200, 86400, 604800]) AS w),
pick AS (SELECT MIN(w) AS w FROM lad CROSS JOIN span
         WHERE (hi // w) - (lo // w) + 1 <= 12)
SELECT CAST(pick.w AS BIGINT) AS interval_s,
       CAST((ts // pick.w) * pick.w AS BIGINT) AS bucket_s,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h CROSS JOIN pick GROUP BY 1, 2 ORDER BY bucket_s
""",
    doc="ES ``auto_date_histogram``: pick the smallest ladder "
    "interval rendering the hit set's time span in at most "
    "``buckets`` buckets, then histogram on it — the 'sensible "
    "x-axis' aggregation every overview dashboard opens with. The "
    "chosen interval travels IN-BAND (interval_s) so the choice "
    "itself is oracle-pinned. Ladder = ES's second/minute/hour/day/"
    "week rungs; spans needing calendar months raise (variable-"
    "length units a fixed ladder must not silently approximate as "
    "30 days). The span reduction is one bounded single-row collect "
    "(same driver-side law as the prefix rewrite). operators/"
    "search_compose.py:search_auto_date_histogram_agg; dispatched "
    "from aggs.<name>.auto_date_histogram.",
)
def auto_date_histogram_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"auto": {"auto_date_histogram": {
            "field": "ingest_ts", "buckets": 12,
        }}},
    })


@register(
    "hard_negative_mining_embeddings",
    f"""
WITH {_UNIT_SQL},
lab AS (SELECT e.vec_id, e.label, eu.u
        FROM embeddings e JOIN eu ON eu.vec_id = e.vec_id),
anch AS (SELECT vec_id AS anchor_id, label AS anchor_label, u AS au
         FROM (SELECT l.*, md5(CAST(vec_id AS VARCHAR)) AS h FROM lab l
               ORDER BY h, vec_id LIMIT 32)),
scored AS (
  SELECT a.anchor_id, a.anchor_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         CAST(FLOOR({_DOT_SQL.format(a='a.au', b='c.u')} * 1048576.0)
           AS BIGINT) AS cos_q20
  FROM anch a JOIN lab c ON c.label <> a.anchor_label
),
best AS (
  SELECT anchor_id, anchor_label, neg_id, neg_label, cos_q20 FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY anchor_id
      ORDER BY cos_q20 DESC, neg_id, neg_label) AS rn
    FROM scored) WHERE rn = 1)
SELECT anchor_id, anchor_label, neg_id, neg_label, cos_q20
FROM best ORDER BY anchor_id
""",
    doc="Hard-negative mining for contrastive / retrieval training "
    "(DPR / SimCSE curriculum): for each of 32 md5-ordered anchor "
    "vectors, the OTHER-labeled vector most similar to it — the "
    "near-miss that teaches the margin, where random negatives are "
    "trivially easy. operators/similarity.py:hard_negative_mining — "
    "deterministic md5 anchor sample, n_anchors broadcast rows x ONE "
    "corpus scan, argmax an order-free min(struct(-cos, id)) on "
    "Q20-floored cosines so ties break identically everywhere. At "
    "100 TB the same shape rides the IVF cells (mine within the "
    "anchor's cell first). Anchors whose complement class is empty "
    "simply emit nothing.",
)
def hard_negative_mining_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.similarity import (
        hard_negative_mining,
    )
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    return hard_negative_mining(
        emb, "vec_id", "embedding", "label", n_anchors=32
    )


@register(
    "serial_diff_stats_bucket_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
c AS (SELECT CAST(FLOOR(ts / 43200) * 43200 AS BIGINT) AS bucket_s,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id) GROUP BY 1)
SELECT bucket_s, n_docs,
       CAST(n_docs - LAG(n_docs, 2) OVER (ORDER BY bucket_s) AS BIGINT)
         AS season_diff
FROM c ORDER BY bucket_s
""",
    doc="ES ``serial_diff`` pipeline aggregation: the lag-N "
    "bucket-over-bucket difference (here lag 2 on 12 h buckets — "
    "the seasonality-removal transform; lag 7 on daily buckets "
    "strips the weekly cycle). NULL for the first N buckets, exactly "
    "ES. Same response-sized single-partition window law as "
    "cumulative_sum/derivative (operators/search_compose.py:"
    "apply_bucket_pipelines); the sibling scalar reductions "
    "avg_bucket/sum_bucket/min_bucket/max_bucket/stats_bucket "
    "dispatch from the same sub-agg position and are pinned by "
    "pytest. Dispatched from aggs.<name>.aggs.<p>.serial_diff.",
)
def serial_diff_stats_bucket_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"halfdays": {
            "date_histogram": {
                "field": "ingest_ts", "fixed_interval": "12h",
            },
            "aggs": {"season_diff": {"serial_diff": {
                "buckets_path": "_count", "lag": 2,
            }}},
        }},
    })
    return out.select(
        F.col("bucket").cast("long").alias("bucket_s"),
        "n_docs", "season_diff",
    ).orderBy("bucket_s")


@register(
    "percentile_ranks_documents",
    f"""
WITH {_HITS_MERGE},
h AS (SELECT n_chars FROM documents JOIN hits USING (doc_id)
      WHERE n_chars IS NOT NULL),
one AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN n_chars <= 200 THEN 1 ELSE 0 END) AS BIGINT)
            AS le0,
          CAST(SUM(CASE WHEN n_chars <= 350 THEN 1 ELSE 0 END) AS BIGINT)
            AS le1,
          CAST(SUM(CASE WHEN n_chars <= 500 THEN 1 ELSE 0 END) AS BIGINT)
            AS le2
        FROM h)
SELECT value, rank_q20 FROM (
  SELECT CAST(200.0 AS DOUBLE) AS value,
         CAST(FLOOR(CAST(le0 AS DOUBLE) / n * 100.0 * 1048576.0)
           AS BIGINT) AS rank_q20 FROM one
  UNION ALL
  SELECT 350.0, CAST(FLOOR(CAST(le1 AS DOUBLE) / n * 100.0 * 1048576.0)
    AS BIGINT) FROM one
  UNION ALL
  SELECT 500.0, CAST(FLOOR(CAST(le2 AS DOUBLE) / n * 100.0 * 1048576.0)
    AS BIGINT) FROM one
) ORDER BY value
""",
    doc="ES ``percentile_ranks`` — the INVERSE of percentiles: for "
    "each requested value, the percentage of the hit set's "
    "doc-values at or below it ('what share of docs fit the 350-char "
    "budget'). ES serves an interpolated t-digest estimate; this "
    "engine computes the EXACT empirical CDF (100 x count(<=v) / n) "
    "in ONE reduction — every requested value a conditional sum, no "
    "per-value re-scan — Q20-floored. operators/search_compose.py:"
    "search_percentile_ranks_agg; dispatched from "
    "aggs.<name>.percentile_ranks.",
)
def percentile_ranks_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"budget": {"percentile_ranks": {
            "field": "n_chars", "values": [200, 350, 500],
        }}},
    })


@register(
    "date_range_agg_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
h AS (SELECT ts FROM d JOIN hits USING (doc_id)),
one AS (SELECT
  CAST(SUM(CASE WHEN ts < {_TS0 + 2 * 86400} THEN 1 ELSE 0 END)
    AS BIGINT) AS b0,
  CAST(SUM(CASE WHEN ts >= {_TS0 + 2 * 86400}
            AND ts < {_TS0 + 5 * 86400} THEN 1 ELSE 0 END)
    AS BIGINT) AS b1,
  CAST(SUM(CASE WHEN ts >= {_TS0 + 5 * 86400} THEN 1 ELSE 0 END)
    AS BIGINT) AS b2
  FROM h)
SELECT bucket, n_docs FROM (
  SELECT '*-{_TS0 + 2 * 86400}' AS bucket, b0 AS n_docs FROM one
  UNION ALL SELECT '{_TS0 + 2 * 86400}-{_TS0 + 5 * 86400}', b1 FROM one
  UNION ALL SELECT '{_TS0 + 5 * 86400}-*', b2 FROM one
) ORDER BY bucket
""",
    doc="ES ``date_range`` aggregation: the range agg with ISO / "
    "epoch bounds over a DATE doc-values field — from inclusive, to "
    "exclusive, open sides, overlapping and EMPTY buckets returned, "
    "ES's a-b / *-b / a-* keys (epoch seconds, timezone-free "
    "cross-engine). Same single-reduction law as the numeric range "
    "agg: every bucket a conditional sum in ONE pass. operators/"
    "search_compose.py:search_date_range_agg; dispatched from "
    "aggs.<name>.date_range.",
)
def date_range_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    lo = _TS0 + 2 * 86400
    hi = _TS0 + 5 * 86400
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"eras": {"date_range": {
            "field": "ingest_ts",
            "ranges": [
                {"to": lo},
                {"from": lo, "to": hi},
                {"from": hi},
            ],
        }}},
    })


@register(
    "terms_include_exclude_documents",
    f"""
WITH {_HITS_MERGE},
b AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents d JOIN hits USING (doc_id)
      WHERE d.source IS NOT NULL
        AND regexp_full_match(d.source, 'src1.*')
        AND NOT regexp_full_match(d.source, 'src1[23]')
      GROUP BY 1)
SELECT source, n_docs FROM b
ORDER BY n_docs DESC, source LIMIT 10
""",
    doc="ES ``terms`` aggregation ``include``/``exclude`` regex "
    "filters: buckets keep values matching include and not exclude, "
    "both ANCHORED to the whole value (Lucene's convention — the "
    "same anchoring law as the regexp query, paired with DuckDB's "
    "regexp_full_match), exclude winning on overlap. The filter "
    "rides the facet reduction's input — no second pass. The "
    "partitioned expressions form raises by name. operators/"
    "search_ext.py:search_facets; dispatched from "
    "aggs.<name>.terms.include/exclude.",
)
def terms_include_exclude_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    idx = _postings_index_for(spark, sf_dir)
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"srcs": {"terms": {
            "field": "source", "size": 10,
            "include": "src1.*", "exclude": "src1[23]",
        }}},
    }, docs=docs)
