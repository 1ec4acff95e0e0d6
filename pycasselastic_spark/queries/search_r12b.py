"""Round-12 continuation queries: ES compound-scoring surface
(``dis_max``, ``boosting``, ``constant_score`` — the reference's own
sync query, ``pyCassElastic.py:366-397``), the remaining metric/bucket
aggregations (exact ``percentiles``, exact ``cardinality``, ``range``,
``date_histogram``), and the Lee-et-al duplicated-span coverage
operator for training-data curation.

All compound-scoring and agg queries dispatch end-to-end through the
``es_search`` request-body API and probe the SHARED corpus index
(``search_dsl._postings_index_for`` — n_chars/source doc-values
already stored); only ``date_histogram`` builds its own small fixture
index carrying a derived date doc-value.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.operators.dedup import duplicate_span_coverage
from pycasselastic_spark.operators.search_api import es_search
from pycasselastic_spark.plans.tuning import ensure_parallelism
from pycasselastic_spark.queries.base import _t, register
from pycasselastic_spark.queries.search_dsl import _postings_index_for

# Shared BM25 replay blocks (whitespace tokens, empties dropped — the
# default analyzer of the shared index; same algebra as every search
# oracle in the catalog).
_TOK_POSTINGS = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents)
"""

_BM25_TERM_SCORE = """
           ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (qt.tf * 2.2)
           / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
"""


@register(
    "dis_max_bm25_documents",
    f"""
WITH {_TOK_POSTINGS},
cmap AS (
  SELECT * FROM (VALUES
    (0, 'merge'), (0, 'spark'),
    (1, 'hash'), (1, 'scan')
  ) t(clause_id, term)
),
qt AS (SELECT * FROM postings
       WHERE term IN (SELECT DISTINCT term FROM cmap)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
per_clause AS (
  SELECT cmap.clause_id, qt.doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s_q20
  FROM qt JOIN dfreq USING (term) JOIN cmap USING (term)
       JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY cmap.clause_id, qt.doc_id, sc.n_docs
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_clauses,
       CAST(MAX(s_q20)
            + CAST(FLOOR(CAST(0.3 AS DOUBLE) * (SUM(s_q20) - MAX(s_q20)))
                   AS BIGINT)
            AS BIGINT) AS score_q20
FROM per_clause GROUP BY doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``dis_max`` with tie_breaker=0.3 (operators/"
    "search_compose.py:dis_max_search): per-doc score = best clause + "
    "0.3 x the other matching clauses — rewards the strongest "
    "phrasing instead of summing correlated matches (bool.should "
    "adds; dis_max takes the max). Determinism law: per-clause scores "
    "floor to Q20 integers FIRST, then max/sum/one float multiply "
    "combine in integer space — no stacked float-order noise, "
    "replayed exactly by the oracle (tie_breaker cast to DOUBLE so "
    "DuckDB doesn't take its exact-DECIMAL path where Spark runs "
    "binary doubles). Plan: the msearch amortization — ONE pruned "
    "probe over the union term set, df paid once, the (clause, term) "
    "map a broadcast literal, two partial-aggregated reductions. "
    "Dispatched from the _search body's query.dis_max.",
)
def dis_max_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"dis_max": {
            "queries": [
                {"match": {"text": "spark merge"}},
                {"match": {"text": "scan hash"}},
            ],
            "tie_breaker": 0.3,
        }},
        "size": 10,
    })


@register(
    "boosting_query_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'sort')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
pos AS (
  SELECT qt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
),
neg AS (SELECT DISTINCT doc_id FROM postings WHERE term = 'window')
SELECT doc_id, n_hit_terms,
       CAST(CASE WHEN doc_id IN (SELECT doc_id FROM neg)
            THEN CAST(FLOOR(s * CAST(0.5 AS DOUBLE)) AS BIGINT)
            ELSE s END AS BIGINT) AS score_q20
FROM pos ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``boosting`` query with negative_boost=0.5 (operators/"
    "search_compose.py:boosting_search): hits come only from the "
    "positive match; a hit that ALSO matches the negative query keeps "
    "its slot with its Q20 score halved — demotion without exclusion "
    "(must_not throws the doc away; boosting keeps it cheap). The "
    "demotion is one float multiply of an exact integer + floor, "
    "oracle-replayed with the same DOUBLE cast. Plan: the standard "
    "pruned scored probe left-joins the negative probe's DISTINCT id "
    "set through the count-guarded broadcast — both sides "
    "query-bounded, no raw docs. Dispatched from query.boosting.",
)
def boosting_query_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"boosting": {
            "positive": {"match": {"text": "merge sort"}},
            "negative": {"match": {"text": "window"}},
            "negative_boost": 0.5,
        }},
        "size": 10,
    })


@register(
    "constant_score_sync_documents",
    """
SELECT doc_id, CAST(1048576 AS BIGINT) AS score_q20
FROM documents
WHERE n_chars >= 300 AND n_chars <= 420
  AND (source IS NULL OR source <> 'src3')
ORDER BY doc_id LIMIT 12
""",
    doc="THE reference query: get_elasticsearch_latest wraps its "
    "version-column range in constant_score.filter and appends the "
    "legacy not.term source guard when ignore_same_source is set "
    "(pyCassElastic.py:366-397 — the exact JSON shape this body "
    "reproduces, legacy and-list included). The not.term compiles "
    "NULL-SAFE: ES keeps a doc whose field is missing (it can't "
    "match the negated term), where a plain != would silently drop "
    "it — the oracle spells the same law. Every doc passing the "
    "filter scores the flat boost (1.0 -> Q20 1048576); the "
    "deterministic page is the id tiebreak, exactly ES's tied-score "
    "behavior. Plan (operators/search_compose.py:"
    "constant_score_search): ONE column-pruned doc-values scan with "
    "range + not-term predicates PUSHED into the parquet scan, a "
    "literal score column, TakeOrderedAndProject — no postings, no "
    "joins, no relevance math.",
)
def constant_score_sync_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"constant_score": {
            "filter": {"and": [
                {"range": {"n_chars": {"gte": 300, "lte": 420}}},
                {"not": {"term": {"source": "src3"}}},
            ]},
        }},
        "size": 12,
    })


_HITS_MERGE_SORT = """
hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term IN ({terms})
)
"""


@register(
    "percentiles_agg_documents",
    "WITH "
    + _HITS_MERGE_SORT.format(terms="'merge', 'sort'")
    + """,
v AS (SELECT n_chars FROM documents JOIN hits USING (doc_id))
SELECT CAST(25 AS BIGINT) AS pct,
       CAST(FLOOR(quantile_cont(n_chars, 0.25) * 1048576.0) AS BIGINT)
         AS val_q20 FROM v
UNION ALL
SELECT CAST(50 AS BIGINT),
       CAST(FLOOR(quantile_cont(n_chars, 0.5) * 1048576.0) AS BIGINT) FROM v
UNION ALL
SELECT CAST(75 AS BIGINT),
       CAST(FLOOR(quantile_cont(n_chars, 0.75) * 1048576.0) AS BIGINT) FROM v
UNION ALL
SELECT CAST(90 AS BIGINT),
       CAST(FLOOR(quantile_cont(n_chars, 0.9) * 1048576.0) AS BIGINT) FROM v
ORDER BY pct
""",
    doc="ES ``percentiles`` aggregation over the hit set from STORED "
    "doc-values (operators/search_compose.py:search_percentiles_agg) "
    "— EXACT linear-interpolated percentiles where ES ships a "
    "t-digest approximation (its segment architecture forces the "
    "sketch; one Spark reduction computes the exact answer — Spark "
    "``percentile`` and DuckDB ``quantile_cont`` share the "
    "(n-1)*p interpolation law). Values Q20-quantized. Plan: pruned "
    "probe hit ids, count-guarded broadcast, column-pruned doc-values "
    "scan, ONE exact-percentile reduction to a single array row, "
    "bounded 4-element explode. Dispatched from aggs.percentiles.",
)
def percentiles_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge sort"}},
        "aggs": {"chars": {"percentiles": {
            "field": "n_chars", "percents": [25, 50, 75, 90],
        }}},
    })


@register(
    "cardinality_agg_documents",
    "WITH "
    + _HITS_MERGE_SORT.format(terms="'merge', 'sort'")
    + """
SELECT CAST(COUNT(DISTINCT d.source) AS BIGINT) AS cardinality
FROM documents d JOIN hits USING (doc_id)
""",
    doc="ES ``cardinality`` aggregation over the hit set "
    "(operators/search_compose.py:search_cardinality_agg): distinct "
    "count of a stored doc-values field — EXACT here where ES's "
    "HLL++ approximates by design (the catalog's sketch twins "
    "``approx_distinct_stats_events`` / ``streaming_approx_distinct_"
    "windows`` cover the bounded-memory path; at the hit-set sizes a "
    "search page aggregates, exact is both cheap and right). Plan: "
    "hit ids join the column-pruned doc-values scan, one "
    "partial-aggregated distinct count — shuffle bounded by the hit "
    "set, never the corpus. Dispatched from aggs.cardinality.",
)
def cardinality_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge sort"}},
        "aggs": {"sources": {"cardinality": {"field": "source"}}},
    })


@register(
    "range_agg_documents",
    "WITH "
    + _HITS_MERGE_SORT.format(terms="'merge'")
    + """,
v AS (SELECT n_chars FROM documents JOIN hits USING (doc_id))
SELECT '*-300' AS bucket,
       CAST(SUM(CASE WHEN n_chars < 300 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs FROM v
UNION ALL
SELECT '300-420',
       CAST(SUM(CASE WHEN n_chars >= 300 AND n_chars < 420
                THEN 1 ELSE 0 END) AS BIGINT) FROM v
UNION ALL
SELECT '420-*',
       CAST(SUM(CASE WHEN n_chars >= 420 THEN 1 ELSE 0 END) AS BIGINT) FROM v
ORDER BY bucket
""",
    doc="ES ``range`` aggregation over the hit set (operators/"
    "search_compose.py:search_range_agg): per-bucket counts for "
    "from-inclusive / to-exclusive bounds with ES's exact key "
    "convention ('*-300', '300-420', '420-*') — buckets may overlap "
    "and EMPTY buckets are returned, both exactly ES (histogram "
    "omits empties; range doesn't). Plan: every bucket is a "
    "conditional sum inside a SINGLE reduction over the hit set's "
    "doc-values — no per-bucket re-scan — then a bounded 3-element "
    "explode. Dispatched from aggs.range.",
)
def range_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"chars": {"range": {
            "field": "n_chars",
            "ranges": [{"to": 300}, {"from": 300, "to": 420},
                       {"from": 420}],
        }}},
    })


_DATE_INDEX_CACHE: dict[str, str] = {}


def _date_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a deterministic derived ingest date (DATE
    '2024-01-07' + doc_id % 90 days — spans four calendar months and
    both month/week boundaries)."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id", "text", "source",
        F.date_add(
            F.lit("2024-01-07").cast("date"),
            (F.col("doc_id") % 90).cast("int"),
        ).alias("ingest_date"),
    )


def _date_index_for(spark: SparkSession, sf_dir: str) -> "SRCH.PostingsIndex":
    path = _DATE_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="dthist_idx_"), "idx")
        SRCH.build_postings_index(
            _date_documents(spark, sf_dir), "doc_id", "text", path,
            n_buckets=16, stored_fields=["ingest_date", "source"],
        )
        _DATE_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "date_histogram_agg_documents",
    "WITH "
    + _HITS_MERGE_SORT.format(terms="'merge'")
    + """,
d AS (SELECT doc_id,
        DATE '2024-01-07' + CAST(doc_id % 90 AS INTEGER) AS ingest_date
      FROM documents)
SELECT CAST(date_trunc('month', ingest_date) AS DATE) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY bucket
""",
    doc="ES ``date_histogram`` (calendar_interval=month) over a "
    "STORED date doc-values field (operators/search_compose.py:"
    "search_date_histogram_agg): hit docs bucketed by calendar month "
    "— the real calendar truncation (first-of-month DATE keys), not "
    "a fixed-interval floor, matching ES's calendar_interval "
    "semantics; empty buckets omitted (min_doc_count=1). The fixture "
    "index stores a derived ingest date spanning four months. Plan: "
    "identical to the histogram agg — hit ids join the column-pruned "
    "doc-values scan, one two-column reduction. Dispatched from "
    "aggs.date_histogram; day/week intervals share the same "
    "truncation path.",
)
def date_histogram_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _date_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"months": {"date_histogram": {
            "field": "ingest_date", "calendar_interval": "month",
        }}},
    })


@register(
    "duplicate_span_coverage_documents",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (
  SELECT doc_id, CAST(u.s AS BIGINT) AS s,
         md5(array_to_string(tk[u.s:u.s + 7], ' ')) AS wh
  FROM t, unnest(range(1, len(tk) - 8 + 2)) AS u(s)
),
dup AS (SELECT wh FROM w GROUP BY wh HAVING MIN(doc_id) <> MAX(doc_id)),
occ AS (SELECT doc_id, s FROM w JOIN dup USING (wh)),
cov AS (
  SELECT doc_id,
         GREATEST(0, s + 8 - GREATEST(s, COALESCE(
           MAX(s + 8) OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))) AS c
  FROM occ
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
         CAST(SUM(c) AS BIGINT) AS covered_tokens
  FROM cov GROUP BY doc_id
),
n AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
SELECT doc_id, n_tokens, n_dup_windows, covered_tokens,
       CAST(FLOOR((covered_tokens / n_tokens) * 1048576.0) AS BIGINT)
         AS covered_share_q20
FROM per JOIN n USING (doc_id)
ORDER BY covered_tokens DESC, doc_id LIMIT 15
""",
    doc="Duplicated-SPAN coverage (operators/dedup.py:"
    "duplicate_span_coverage) — the exact-substring dedup signal of "
    "Lee et al. 2022: every overlapping 8-token window (stride 1) is "
    "hashed, windows occurring in >= 2 distinct docs are duplicated "
    "spans, and each doc reports the UNION length of its duplicated "
    "windows' intervals — the token-exact mask length span-level "
    "dedup would remove, which doc-level exact dedup and the "
    "non-overlapping ``passage_dedup_documents`` both miss (spans "
    "straddling passage boundaries, partial boilerplate). Top-15 by "
    "covered tokens. All-integer output plus one Q20 share. Plan: "
    "window relation ~1 row/token; ONE digest hash-shuffle with the "
    "min!=max distinct-doc test; equi-join back; interval union via "
    "a running-max window PARTITIONED BY doc (state bounded by one "
    "doc's length). No pair space.",
)
def duplicate_span_coverage_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    cov = duplicate_span_coverage(docs, "doc_id", "text", window_tokens=8)
    return cov.orderBy(
        F.col("covered_tokens").desc(), F.col("doc_id").asc()
    ).limit(15)


@register(
    "simple_query_string_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('scan', 'join', 'hash')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scored AS (
  SELECT qt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS score_q20,
         COUNT(CASE WHEN term = 'scan' THEN 1 END) AS must_hits
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs)
SELECT doc_id, n_hit_terms, score_q20
FROM scored
WHERE must_hits >= 1
  AND doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'window')
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``simple_query_string`` — the forgiving end-user query "
    "grammar every search box speaks: '+scan join hash -window' "
    "parses to required (+) / optional (bare, default_operator OR) / "
    "excluded (-) clauses and compiles onto the SAME full-bool probe "
    "as query.bool (operators/search_probes.py:bm25_bool_query): one "
    "pruned probe fetches all contexts' terms, the required-clause "
    "hit count rides the scoring aggregation, the veto is a "
    "broadcast anti-join. Tokens run through the index's stored "
    "analyzer; phrase/prefix/fuzzy/precedence syntax raises by name "
    "(never a half-understood query), and default_operator=and is "
    "dispatched too. Oracle replays the clause algebra.",
)
def simple_query_string_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"simple_query_string": {
            "query": "+scan join hash -window",
        }},
        "size": 10,
    })


# the shared per-field BM25 replay template — imported, not copied, so
# the scoring algebra can never drift between the most_fields and
# best_fields oracles
from pycasselastic_spark.queries.search_es_queries import (  # noqa: E402
    _MF_FIELD_SCORE_SQL as _MF_FIELD_SCORE_SQL_R12B,
)


@register(
    "best_fields_bm25_documents",
    "WITH f AS (SELECT doc_id,\n"
    "  array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')"
    " AS title,\n"
    "  array_to_string(list_slice(string_split(text, ' '), 9,"
    " len(string_split(text, ' '))), ' ') AS body\n"
    "  FROM documents),\n"
    + _MF_FIELD_SCORE_SQL_R12B.format(p="t", field="title",
                                      terms="'spark', 'merge'")
    + ",\n"
    + _MF_FIELD_SCORE_SQL_R12B.format(p="b", field="body",
                                      terms="'spark', 'merge'")
    + """
SELECT COALESCE(tscore.doc_id, bscore.doc_id) AS doc_id,
       CAST(GREATEST(COALESCE(tscore.hits, 0), COALESCE(bscore.hits, 0))
            AS BIGINT) AS n_hit_terms,
       CAST(GREATEST(COALESCE(tscore.s, 0), COALESCE(bscore.s, 0))
            + CAST(FLOOR(CAST(0.3 AS DOUBLE)
                * (COALESCE(tscore.s, 0) + COALESCE(bscore.s, 0)
                   - GREATEST(COALESCE(tscore.s, 0), COALESCE(bscore.s, 0))))
              AS BIGINT)
            AS BIGINT) AS score_q20
FROM tscore FULL OUTER JOIN bscore ON tscore.doc_id = bscore.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES multi_match in its DEFAULT ``best_fields`` mode "
    "(operators/search_compose.py:multi_match_best_fields): a dis_max "
    "ACROSS FIELDS — the doc's score is its best field's score plus "
    "tie_breaker x the other matching fields', over the same "
    "title/body per-field index pair (own df/dl/avgdl each, the "
    "Lucene per-field model) the most_fields twin sums. Per-field "
    "Q20 integers combine via max/sum/one DOUBLE multiply + floor "
    "(BM25 Q20 scores are strictly positive, so COALESCE-to-0 is "
    "exact). One pruned probe per field, full outer join on "
    "query-bounded outputs, no corpus scan.",
)
def best_fields_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_compose import (
        multi_match_best_fields,
    )
    from pycasselastic_spark.queries.search_es_queries import _mf_indexes_for

    tidx, bidx = _mf_indexes_for(spark, sf_dir)
    return multi_match_best_fields(
        {"title": tidx, "body": bidx}, ["spark", "merge"],
        tie_breaker=0.3, k=10,
    )


@register(
    "span_dedup_rewrite_documents",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (
  SELECT doc_id, CAST(u.s AS BIGINT) AS s,
         md5(array_to_string(tk[u.s:u.s + 7], ' ')) AS wh
  FROM t, unnest(range(1, len(tk) - 8 + 2)) AS u(s)
),
dup AS (SELECT wh FROM w GROUP BY wh HAVING MIN(doc_id) <> MAX(doc_id)),
occ AS (SELECT doc_id, s FROM w JOIN dup USING (wh)),
st AS (SELECT doc_id, list_sort(list(s)) AS starts FROM occ GROUP BY doc_id),
rw AS (
  SELECT t.doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         list_transform(
           list_filter(range(1, len(tk) + 1),
             p -> NOT len(list_filter(COALESCE(starts, []),
                    x -> p >= x AND p < x + 8)) > 0),
           p -> tk[p]) AS kept
  FROM t LEFT JOIN st USING (doc_id)
)
SELECT doc_id, n_tokens,
       CAST(len(kept) AS BIGINT) AS kept_tokens,
       CAST(n_tokens - len(kept) AS BIGINT) AS removed_tokens,
       -- DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
       COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
FROM rw
ORDER BY removed_tokens DESC, doc_id LIMIT 15
""",
    doc="The APPLY twin of span coverage (operators/dedup.py:"
    "span_dedup_rewrite): REMOVE every token covered by a "
    "cross-document duplicated 8-token span and rebuild the text from "
    "the kept tokens — span-level dedup as Lee et al. 2022 apply it "
    "(mask the repeated substring, keep the document). The oracle "
    "rebuilds each cleaned text string byte-for-byte. Plan: the "
    "shared duplicated-window core, per-doc starts folded to ONE "
    "array (bounded by the doc's window count), then a per-row JVM "
    "higher-order position filter — no second shuffle, no window "
    "functions. removed_tokens is pinned equal to the coverage "
    "twin's covered_tokens in tests.",
)
def span_dedup_rewrite_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.dedup import span_dedup_rewrite

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    rw = span_dedup_rewrite(docs, "doc_id", "text", window_tokens=8)
    return rw.select(
        "doc_id", "n_tokens", "kept_tokens",
        (F.col("n_tokens") - F.col("kept_tokens")).alias("removed_tokens"),
        "cleaned_text",
    ).orderBy(F.col("removed_tokens").desc(), F.col("doc_id").asc()).limit(15)


@register(
    "knn_search_api_embeddings",
    """
WITH en AS (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)))
          AS nrm
      FROM embeddings),
eu AS (SELECT vec_id,
        list_transform(embedding, x -> x::DOUBLE / nrm) AS u FROM en),
qv AS (SELECT list_transform(range(0, 64),
        i -> CASE WHEN i % 2 = 0 THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END) AS v),
qn AS (SELECT v,
        sqrt(list_sum(list_transform(v, y -> y * y))) AS nrm FROM qv),
qu AS (SELECT list_transform(v, x -> x / nrm) AS u FROM qn),
p AS (
  SELECT c.vec_id,
         list_sum(list_transform(range(1, 65), k -> q.u[k] * c.u[k]))
           AS cosine
  FROM eu c CROSS JOIN qu q
)
SELECT vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rn FROM p
) WHERE rn <= 8
ORDER BY cosine DESC, vec_id
""",
    doc="ES 8.x top-level ``knn`` retrieval dispatched from the "
    "_search request body (operators/search_api.py:es_search): exact "
    "cosine top-8 for a LITERAL query_vector over the embeddings "
    "frame — the request a RAG stack POSTs. ES's HNSW is approximate "
    "by necessity and num_candidates is its recall dial; the exact "
    "answer dispatched here is what any num_candidates converges to, "
    "and the banded-LSH / IVF twins (cosine_topk_lsh/ivf) stay the "
    "100 TB path. Plan: the one-row query broadcast against one "
    "corpus scan (operators/similarity.py:brute_force_topk), "
    "sequential-double dot products, windowed top-k — the oracle "
    "replays normalization and fold order bit-exactly.",
)
def knn_search_api_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.queries.search_dsl import _postings_index_for

    idx = _postings_index_for(spark, sf_dir)
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    vec = [1.0 if i % 2 == 0 else 0.0 for i in range(64)]
    return es_search(idx, {
        "knn": {
            "field": "embedding", "query_vector": vec,
            "k": 8, "num_candidates": 100,
        },
    }, embeddings=emb)


@register(
    "match_all_page_documents",
    """
SELECT doc_id FROM documents ORDER BY doc_id LIMIT 12
""",
    doc="ES ``match_all`` (operators/search_api.py:es_search): every "
    "LIVE document at ES's constant 1.0 score, paged by the id "
    "tiebreak — the exists/ids constant-score contract without a "
    "predicate, and the query every index browser / reindex driver "
    "issues first. Served from the forward relation with superseded "
    "copies dropped (a deleted-by-LWW doc never resurfaces in the "
    "page, which raw-docs pagination would get wrong). Plan: "
    "column-pruned forward scan, distinct over ids, "
    "TakeOrderedAndProject — no postings, no raw docs.",
)
def match_all_page_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {"query": {"match_all": {}}, "size": 12})


@register(
    "facet_stats_agg_documents",
    "WITH "
    + _HITS_MERGE_SORT.format(terms="'merge'")
    + """
SELECT source AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_val,
       MAX(n_chars) AS max_val,
       CAST(SUM(n_chars) AS BIGINT) AS sum_val,
       CAST(FLOOR(AVG(n_chars) * 1048576.0) AS BIGINT) AS avg_q20
FROM documents JOIN hits USING (doc_id)
WHERE source IS NOT NULL
GROUP BY source
ORDER BY avg_q20 DESC, bucket
""",
    doc="ES ``terms`` aggregation CARRYING a stats sub-aggregation, "
    "bucket-ordered by the sub-agg's value (order: {avg: desc}) — "
    "the most common composed request ('per source: hit count + "
    "char-length stats, biggest-average first'); operators/"
    "search_compose.py:search_facet_metric_agg. Both fields come "
    "from STORED doc-values, so no docs frame is touched: hit ids "
    "from the pruned probe broadcast-join ONE column-pruned "
    "doc-values scan carrying facet + metric, and the sub-agg rides "
    "the same single partial-aggregated reduction as the bucket "
    "count — no second pass. Dispatched from aggs.terms.aggs.stats "
    "with the order key mapped exactly (_count/avg/sum/min/max).",
)
def facet_stats_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"by_source": {
            "terms": {"field": "source", "order": {"avg": "desc"}},
            "aggs": {"chars": {"stats": {"field": "n_chars"}}},
        }},
    })
