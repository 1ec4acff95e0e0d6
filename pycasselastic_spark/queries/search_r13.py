"""Round-13 queries: the ES 8.x kNN retrieval COMPOSITIONS every RAG
stack POSTs (``knn.filter`` pre-filtering, the default additive
``knn`` + ``query`` hybrid, and the ``rank: {rrf: ...}`` retriever
from a literal query_vector), the remaining ``multi_match`` types
(``phrase``, ``cross_fields``), the full ``simple_query_string``
grammar, and the ``date_histogram`` ``fixed_interval`` /
``min_doc_count=0`` / ``extended_bounds`` surface.

All dispatch end-to-end through the ``es_search`` request-body API
against the SHARED corpus index (``search_dsl._postings_index_for``)
and the driver's ``embeddings`` table (vec_id aligns with doc_id —
one embedding per document, the layout the reference's ES index
would hold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pycasselastic_spark.operators.search_api import es_search
from pycasselastic_spark.plans.tuning import ensure_parallelism
from pycasselastic_spark.queries.base import _t, register
from pycasselastic_spark.queries.search_dsl import _postings_index_for
from pycasselastic_spark.queries.search_r12b import (
    _BM25_TERM_SCORE,
    _TOK_POSTINGS,
)

# The alternating literal query vector shared with
# ``knn_search_api_embeddings`` (even dims 1.0, odd 0.0).
_QVEC = [1.0 if i % 2 == 0 else 0.0 for i in range(64)]

# Unit-normalized corpus + literal query vector, the bit-replayable
# normalize/fold blocks proven by the round-12 knn oracle. ``{where}``
# narrows the candidate set (the knn.filter pre-filter).
_KNN_UNIT_SQL = """
en AS (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)))
          AS nrm
      FROM embeddings{where}),
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
"""


@register(
    "knn_filtered_search_embeddings",
    "WITH "
    + _KNN_UNIT_SQL.format(
        where=" WHERE vec_id IN (SELECT doc_id FROM documents"
        " WHERE source = 'src1' AND n_chars >= 250)"
    )
    + """
SELECT vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rn FROM p
) WHERE rn <= 8
ORDER BY cosine DESC, vec_id
""",
    doc="ES 8.x ``knn.filter`` — FILTERED vector retrieval, the "
    "pre-filter semantics ES guarantees: the filter applies DURING "
    "the search, so all k survivors pass it (post-filtering a top-k "
    "would under-fill the page). Filter clauses (term source + range "
    "n_chars, the constant_score predicate family) evaluate against "
    "the index's STORED doc-values (operators/search_hybrid.py:"
    "filtered_ids), never a raw docs frame; the allowed-id set "
    "restricts the embeddings scan BEFORE any dot product is "
    "computed (knn_literal_topk). Exact cosine over the surviving "
    "candidates — ES's HNSW+filter is its approximation of exactly "
    "this limit; the IVF/LSH twins stay the 100 TB path. Dispatched "
    "from the _search body's knn.filter.",
)
def knn_filtered_search_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    return es_search(idx, {
        "knn": {
            "field": "embedding", "query_vector": _QVEC,
            "k": 8, "num_candidates": 100,
            "filter": [
                {"term": {"source": "src1"}},
                {"range": {"n_chars": {"gte": 250}}},
            ],
        },
    }, embeddings=emb)


@register(
    "hybrid_knn_bm25_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
lexs AS (
  SELECT qt.doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS lex_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
),
"""
    + _KNN_UNIT_SQL.format(where="").lstrip()
    + """,
knn AS (
  SELECT vec_id AS doc_id,
         CAST(FLOOR((cosine * CAST(0.5 AS DOUBLE)) * 1048576.0) AS BIGINT)
           AS knn_q20
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rn
        FROM p) WHERE rn <= 20
)
SELECT COALESCE(l.doc_id, k.doc_id) AS doc_id,
       l.lex_q20, k.knn_q20,
       CAST(COALESCE(l.lex_q20, 0) + COALESCE(k.knn_q20, 0) AS BIGINT)
         AS score_q20
FROM lexs l FULL OUTER JOIN knn k ON l.doc_id = k.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES's DEFAULT hybrid: ``knn`` BESIDE a match ``query`` in one "
    "_search body — score = lexical BM25 + knn.boost x cosine over "
    "the UNION of both hit sets, a doc found by only one leg keeping "
    "that leg's score and the kNN leg contributing only its global "
    "top-k (operators/search_hybrid.py:hybrid_knn_bm25, dispatched "
    "from es_search — the round-12 dispatcher RAISED on this, the "
    "single most common RAG request shape). Determinism: lex is the "
    "floored Q20 BM25 integer; knn_q20 = floor(cosine x 0.5 x Q20) — "
    "one double multiply chain over the bit-replayable "
    "unit-normalize + sequential-fold cosine; the combination is "
    "integer addition. Plan: pruned postings probe FULL OUTER JOIN "
    "the bounded kNN top-20 — both legs query-sized, no corpus "
    "shuffle (vec_id aligns with doc_id; the embeddings scan is the "
    "kNN leg's one pass).",
)
def hybrid_knn_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    return es_search(idx, {
        "query": {"match": {"text": "merge spark"}},
        "knn": {
            "field": "embedding", "query_vector": _QVEC,
            "k": 20, "num_candidates": 100, "boost": 0.5,
        },
        "size": 10,
    }, embeddings=emb)


@register(
    "hybrid_rrf_api_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'spark')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
lexs AS (
  SELECT qt.doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
),
text_leg AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS text_rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS rn
    FROM lexs) WHERE rn <= 30
),
"""
    + _KNN_UNIT_SQL.format(where="").lstrip()
    + """,
knn_leg AS (
  SELECT vec_id AS doc_id, CAST(rn AS BIGINT) AS knn_rank FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC)
      AS rn FROM p) WHERE rn <= 30
)
SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
       CAST(FLOOR(
         (COALESCE(1.0 / (60.0 + CAST(t.text_rank AS DOUBLE)), 0.0)
          + COALESCE(1.0 / (60.0 + CAST(v.knn_rank AS DOUBLE)), 0.0))
         * 1048576.0) AS BIGINT) AS rrf_q20,
       t.text_rank, v.knn_rank
FROM text_leg t FULL OUTER JOIN knn_leg v USING (doc_id)
ORDER BY rrf_q20 DESC, doc_id ASC LIMIT 10
""",
    doc="The ES 8.8+ ``rrf`` retriever dispatched from ONE _search "
    "body: ``knn`` + ``query`` + ``rank: {rrf: {rank_window_size, "
    "rank_constant}}`` — reciprocal rank fusion of the lexical "
    "top-30 and the literal-vector kNN top-30 by sum(1/(60+rank)); "
    "ranks, not scores, fuse, so the legs' scales never need "
    "calibrating (operators/search_hybrid.py:hybrid_rrf_from_vector; "
    "the corpus-resident-vector twin is hybrid_rrf_documents). "
    "Determinism: each leg ranks a total order with the id tiebreak, "
    "and the fused double is two exact small-integer reciprocals "
    "added in fixed order, floored once to Q20. Plan: both legs "
    "bounded, rank windows sort <=30-row leg outputs only, fusion a "
    "full outer join of two <=30-row relations.",
)
def hybrid_rrf_api_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    return es_search(idx, {
        "query": {"match": {"text": "merge spark"}},
        "knn": {
            "field": "embedding", "query_vector": _QVEC,
            "k": 30, "num_candidates": 100,
        },
        "rank": {"rrf": {"rank_window_size": 30, "rank_constant": 60}},
        "size": 10,
    }, embeddings=emb)


@register(
    "sqs_phrase_prefix_documents",
    f"""
WITH {_TOK_POSTINGS},
k1 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ph AS (SELECT doc_id,
    CAST(len(list_filter(range(1, len(tk)),
      i -> tk[i] = 'merge' AND tk[i + 1] = 'sort')) AS BIGINT) AS n_hits
  FROM k1),
phl AS (SELECT 'phrase' AS kind, doc_id, n_hits AS metric
  FROM ph WHERE n_hits > 0 ORDER BY n_hits DESC, doc_id LIMIT 10),
exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM postings WHERE term LIKE 'mer%'
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM exp)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
pre AS (
  SELECT doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id, sc.n_docs),
prel AS (SELECT 'prefix' AS kind, doc_id, score_q20 AS metric
  FROM pre ORDER BY score_q20 DESC, doc_id LIMIT 10)
SELECT * FROM phl
UNION ALL
SELECT * FROM prel
ORDER BY kind, metric DESC, doc_id
""",
    doc="The ``simple_query_string`` grammar BEYOND bare terms — the "
    "round-12 dispatcher raised on every one of these; now a "
    "whole-query special token compiles onto its standalone probe "
    "(operators/search_api.py:_dispatch_simple_query_string): the "
    "phrase leg runs '\"merge sort\"' through the positional chain "
    "probe (phrase_slop_search — n_hits = distinct chain starts from "
    "STORED positions), the prefix leg runs 'mer*' through the edge "
    "probe (bm25_topk_prefix — LIKE-pruned dictionary expansion, "
    "top-50 by df, summed BM25). ~N fuzzy and parenthesized "
    "OR-groups dispatch too (compile-equivalence pytests pin all "
    "four against the standalone probes); specials MIXED with other "
    "clauses raise by name — Lucene's parser silently treats broken "
    "syntax as text, this dispatcher never scores a half-understood "
    "query. Both legs stay candidate-bounded postings plans.",
)
def sqs_phrase_prefix_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    idx = _postings_index_for(spark, sf_dir)
    ph = (
        es_search(idx, {
            "query": {"simple_query_string": {"query": '"merge sort"'}},
        })
        .orderBy(F.col("n_hits").desc(), F.col("doc_id").asc())
        .limit(10)
        .select(
            F.lit("phrase").alias("kind"), "doc_id",
            F.col("n_hits").cast("long").alias("metric"),
        )
    )
    pre = es_search(idx, {
        "query": {"simple_query_string": {"query": "mer*"}},
        "size": 10,
    }).select(
        F.lit("prefix").alias("kind"), "doc_id",
        F.col("score_q20").alias("metric"),
    )
    return ph.unionByName(pre).orderBy(
        "kind", F.col("metric").desc(), F.col("doc_id").asc()
    )


@register(
    "facet_date_histogram_agg_documents",
    """
WITH hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'merge'
),
d AS (SELECT doc_id, source,
        DATE '2024-01-07' + CAST(doc_id % 90 AS INTEGER) AS ingest_date
      FROM documents)
SELECT source AS bucket,
       CAST(date_trunc('month', ingest_date) AS DATE) AS date_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d JOIN hits USING (doc_id)
WHERE source IS NOT NULL
GROUP BY 1, 2 ORDER BY bucket, date_bucket
""",
    doc="ES ``terms`` aggregation carrying a ``date_histogram`` "
    "SUB-aggregation — per source, monthly hit counts: THE "
    "time-series dashboard request (operators/search_compose.py:"
    "search_facet_date_histogram_agg, dispatched from "
    "aggs.terms.aggs.date_histogram). Both bucket keys come from "
    "STORED doc-values (facet + the derived four-month ingest date), "
    "NULL facets excluded (ES default), empty date buckets omitted "
    "(min_doc_count=1; the zero-fill form lives on the single-level "
    "agg). Plan: hit ids broadcast-join ONE column-pruned doc-values "
    "scan carrying both fields, then a single partial-aggregated "
    "TWO-KEY groupBy — the nested bucket rides the same reduction, "
    "no second pass, no raw docs.",
)
def facet_date_histogram_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.queries.search_r12b import _date_index_for

    idx = _date_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"by_source": {
            "terms": {"field": "source"},
            "aggs": {"monthly": {"date_histogram": {
                "field": "ingest_date", "calendar_interval": "month",
            }}},
        }},
    })


@register(
    "range_query_facet_agg_documents",
    """
WITH hits AS (
  SELECT doc_id FROM documents WHERE n_chars >= 250 AND n_chars < 400),
j AS (SELECT d.source, d.n_chars FROM documents d JOIN hits USING (doc_id)
      WHERE d.source IS NOT NULL)
SELECT source AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_val,
       MAX(n_chars) AS max_val,
       CAST(SUM(n_chars) AS BIGINT) AS sum_val,
       CAST(FLOOR(AVG(n_chars) * 1048576.0) AS BIGINT) AS avg_q20
FROM j GROUP BY source
ORDER BY n_docs DESC, bucket
""",
    doc="Aggregations under a NON-MATCH query — ES lets an "
    "aggregation ride ANY query, and the round-12 dispatcher refused "
    "everything but match (operators/search_api.py:_agg_scope, new): "
    "here a constant-score ``range`` query over stored doc-values "
    "defines the hit set (n_chars in [250, 400) — no lexical terms "
    "anywhere) and the terms+stats sub-aggregation buckets it by "
    "source. The hit-id relation is derived ONCE (predicates PUSHED "
    "into the columnar doc-values scan) and shared by the agg "
    "through hits_relation — every agg function now accepts a term "
    "list (the match fast path, plans unchanged) or a hit-id frame. "
    "term / match_all / exists / terms / bool(must, must_not) scopes "
    "dispatch the same way; top_hits stays match-only (it needs "
    "scores). Plan: one pushed dv scan for the hits, one "
    "partial-aggregated groupBy carrying the metric — no postings, "
    "no raw docs.",
)
def range_query_facet_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"range": {"n_chars": {"gte": 250, "lt": 400}}},
        "aggs": {"by_source": {
            "terms": {"field": "source"},
            "aggs": {"chars": {"stats": {"field": "n_chars"}}},
        }},
    })


@register(
    "bool_min_should_match_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings
       WHERE term IN ('scan', 'join', 'hash', 'merge')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scored AS (
  SELECT qt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS score_q20,
         MAX(CASE WHEN term = 'scan' THEN 1 ELSE 0 END) AS m0,
         MAX(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS s0,
         MAX(CASE WHEN term = 'hash' THEN 1 ELSE 0 END) AS s1,
         MAX(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS s2
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs)
SELECT doc_id, n_hit_terms, score_q20 FROM scored
WHERE m0 = 1 AND s0 + s1 + s2 >= 2
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES BOOL-LEVEL ``minimum_should_match`` — the common "
    "recall/precision dial ('must match the anchor term AND at least "
    "2 of the 3 context terms'): must=[scan], "
    "should=[join][hash][merge], minimum_should_match=2 "
    "(operators/search_probes.py:bm25_bool_query min_should_match). "
    "A should CLAUSE counts once however many of its analyzed terms "
    "hit — clause semantics, not term counting (the match-level "
    "minimum_should_match twin counts terms; both exist in ES and "
    "they differ on multi-term clauses). The per-clause hit flags "
    "ride the SAME single scoring aggregation as the must flags — "
    "one pruned probe, one reduction, no extra pass. Scoring stays "
    "the BM25 sum over every matched scoring term, exactly Lucene. "
    "Dispatched from query.bool.minimum_should_match.",
)
def bool_min_should_match_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"bool": {
            "must": [{"match": {"text": "scan"}}],
            "should": [
                {"match": {"text": "join"}},
                {"match": {"text": "hash"}},
                {"match": {"text": "merge"}},
            ],
            "minimum_should_match": 2,
        }},
        "size": 10,
    })


@register(
    "highlighted_search_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('scan', 'hash')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
scored AS (
  SELECT qt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs),
top AS (SELECT * FROM scored ORDER BY score_q20 DESC, doc_id LIMIT 10),
tokp AS (
  SELECT doc_id, i AS pos, toks[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(len(toks))) AS i) t
  WHERE toks[i+1] <> ''
),
firsts AS (
  SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS first_pos
  FROM tokp WHERE term IN ('scan', 'hash') GROUP BY doc_id)
SELECT t.doc_id, t.n_hit_terms, t.score_q20,
       array_to_string(
         list_slice(string_split(d.text, ' '),
                    f.first_pos + 1, f.first_pos + 5), ' ') AS snippet
FROM top t JOIN firsts f USING (doc_id) JOIN documents d USING (doc_id)
ORDER BY score_q20 DESC, doc_id
""",
    doc="ES's ACTUAL highlight response shape dispatched from the "
    "_search body (operators/search_api.py: highlight branch): the "
    "RANKED BM25 hits, each carrying its 5-token snippet at the "
    "first match position — the standalone search_highlight_"
    "documents returns the unranked candidate relation; a real "
    "search page is scored-then-snippeted. Plan: the pruned scored "
    "probe (TakeOrderedAndProject top-10) joins the "
    "candidate-bounded stored-field fetch (positions from STORED "
    "postings, only candidates touch raw text) on the id — both "
    "sides query-sized. fragment_size raises (ES counts chars, this "
    "window counts tokens — never silently reinterpret units).",
)
def highlighted_search_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return es_search(idx, {
        "query": {"match": {"text": "scan hash"}},
        "highlight": {"fields": {"text": {}}},
        "size": 10,
    }, docs=docs)


@register(
    "multi_terms_agg_documents",
    """
WITH hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'merge'
)
SELECT d.source, d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN hits USING (doc_id)
WHERE d.source IS NOT NULL AND d.lang IS NOT NULL
GROUP BY d.source, d.lang
ORDER BY n_docs DESC, d.source, d.lang
LIMIT 10
""",
    doc="ES ``multi_terms`` aggregation (7.12+) — buckets keyed by "
    "the COMBINATION of several doc-values fields, the composite "
    "group-by the plain terms agg can't express ('per (source, "
    "lang): hit count'; operators/search_ext.py:"
    "search_multi_terms_agg, dispatched from aggs.multi_terms). Docs "
    "missing ANY key are excluded, exactly ES. Plan: hit ids "
    "broadcast-join ONE column-pruned doc-values scan carrying both "
    "key fields, a single partial-aggregated multi-key groupBy, "
    "TakeOrderedAndProject by (count desc, keys asc).",
)
def multi_terms_agg_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"by_src_lang": {"multi_terms": {
            "terms": [{"field": "source"}, {"field": "lang"}],
            "size": 10,
        }}},
    })


@register(
    "delete_by_query_documents",
    """
WITH doomed AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'window'
),
d2 AS (SELECT * FROM documents
       WHERE doc_id NOT IN (SELECT doc_id FROM doomed)),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d2),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'sort')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM d2),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM d2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM(
         ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (qt.tf * 2.2)
         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
       ) * 1048576.0) AS BIGINT) AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
GROUP BY doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``_delete_by_query`` — the index-maintenance request "
    "every operator runs (expire-by-policy, purge-by-source, GDPR "
    "erasure; operators/search_lifecycle.py:delete_by_query): delete "
    "every doc matching 'window', then a BM25 probe for 'merge sort' "
    "must rank EXACTLY like a FRESH BUILD on the remaining corpus — "
    "the fresh-build-parity contract, which only holds because the "
    "delete is a supersede-without-replacement through the index's "
    "standard LWW machinery (probes drop superseded (id, gen) pairs; "
    "a re-ingested id comes back alive, exactly ES) AND the corpus "
    "scalars decrement by the deleted rows' stats (n_docs / "
    "total_dl, hence avgdl) — a delete that left stale scalars would "
    "mis-rank every subsequent query. Crash-atomic via the claimed "
    "generation + atomic stats rewrite (the update protocol with an "
    "empty data append). The oracle IS the fresh build on the "
    "remaining docs.",
)
def delete_by_query_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from pycasselastic_spark.operators import search as SRCH2

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    path = os.path.join(tempfile.mkdtemp(prefix="delq_idx_"), "idx")
    SRCH2.build_postings_index(docs, "doc_id", "text", path, n_buckets=16)
    SRCH2.delete_by_query(spark, path, {
        "query": {"match": {"text": "window"}},
    })
    idx = SRCH2.load_postings_index(spark, path)
    return SRCH2.bm25_topk_indexed(idx, ["merge", "sort"], k=10)


@register(
    "filter_agg_documents",
    """
WITH hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'merge'
),
v AS (SELECT d.n_chars FROM documents d JOIN hits USING (doc_id)
      WHERE d.source = 'src1')
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_val,
       MAX(n_chars) AS max_val,
       CAST(SUM(n_chars) AS BIGINT) AS sum_val,
       CAST(FLOOR(AVG(n_chars) * 1048576.0) AS BIGINT) AS avg_q20
FROM v
""",
    doc="ES ``filter`` aggregation — narrow the agg scope with a "
    "filter-context clause WITHOUT touching the query, then run the "
    "sub-aggregation over the intersection: the dashboard staple "
    "('hits for merge; char stats over just the src1 subset'). "
    "Dispatched from aggs.<name>.filter + aggs (nesting composes — "
    "filter inside filter loops in the dispatcher); the filter's "
    "id set comes from the PUSHED doc-values scan and meets the "
    "query's hit relation through a semi join, then the stats "
    "sub-agg rides one partial-aggregated reduction "
    "(operators/search_api.py aggs branch + search_hybrid."
    "filtered_ids + search_ext.search_stats_agg).",
)
def filter_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"src1_only": {
            "filter": {"term": {"source": "src1"}},
            "aggs": {"chars": {"stats": {"field": "n_chars"}}},
        }},
    })


_TOKPOS_SQL = """tok AS (
  SELECT doc_id, i AS pos, toks[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(len(toks))) AS i) t
  WHERE toks[i+1] <> ''
)"""


@register(
    "span_near_documents",
    "WITH "
    + _TOKPOS_SQL
    + """,
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'table'),
c AS (SELECT doc_id, pos FROM tok WHERE term = 'scan'),
sel AS (
  SELECT DISTINCT a.doc_id, a.pos AS p
  FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos > a.pos
       JOIN c ON a.doc_id = c.doc_id AND c.pos > b.pos
            AND c.pos - a.pos <= 4)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM sel GROUP BY doc_id ORDER BY doc_id
""",
    doc="ES ``span_near`` in_order — the proximity primitive "
    "legal/patent search builds on (operators/search_ext.py:"
    "span_near_search, dispatched from query.span_near with "
    "span_term clauses): 'fast' then 'table' then 'scan' IN ORDER "
    "within a TOTAL stretch of slop=2 intervening positions — "
    "Lucene's span law bounds the whole match width "
    "(end - start <= n_terms + slop - 1), unlike match_phrase+slop's "
    "per-gap bound; 'fast x x table scan' matches here but not "
    "phrase slop=1. n_spans = distinct qualifying start positions. "
    "Plan: the phrase probe's position chain joins with the stretch "
    "bound applied INCREMENTALLY (positions only grow, so "
    "p_next - p_start <= width prunes every intermediate join); "
    "inputs bounded by the clause terms' postings. in_order=false "
    "raises by name. Oracle replays positions from raw text.",
)
def span_near_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    idx = _postings_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"span_near": {
            "clauses": [
                {"span_term": {"text": "fast"}},
                {"span_term": {"text": "table"}},
                {"span_term": {"text": "scan"}},
            ],
            "slop": 2, "in_order": True,
        }},
    })
    return out.orderBy("doc_id")


@register(
    "span_first_documents",
    "WITH "
    + _TOKPOS_SQL
    + """
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM tok WHERE term = 'merge' AND pos <= 4
GROUP BY doc_id ORDER BY doc_id
""",
    doc="ES ``span_first``: 'merge' within the FIRST 5 positions of "
    "the document — title-ish boosting without a separate field "
    "(Lucene SpanFirstQuery: span end <= end; operators/"
    "search_ext.py:span_first_search, dispatched from "
    "query.span_first.match.span_term). n_hits counts qualifying "
    "occurrences. Plan: ONE pruned postings probe with a JVM-side "
    "array filter over the STORED position list — no explode of "
    "non-qualifying positions, no joins, no raw text. Oracle "
    "replays positions from raw text.",
)
def span_first_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"span_first": {
            "match": {"span_term": {"text": "merge"}},
            "end": 5,
        }},
    })
    return out.orderBy("doc_id")


@register(
    "match_bool_prefix_documents",
    f"""
WITH {_TOK_POSTINGS},
exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM postings WHERE term LIKE 'ta%'
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
qterms AS (SELECT 'fast' AS term UNION SELECT term FROM exp),
qt AS (SELECT * FROM postings
       WHERE term IN (SELECT term FROM qterms)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term)
SELECT qt.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
         AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
GROUP BY qt.doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``match_bool_prefix`` — search-as-you-type WITHOUT the "
    "position requirement: 'fast ta' compiles to a bool of optional "
    "term clauses with the LAST token expanded as a prefix (exactly "
    "the bool ES builds; match_phrase_prefix is the ordered-adjacency "
    "sibling). The expansion is the stored-dictionary scan capped at "
    "max_expansions by (df desc, term) — the prefix probe's rewrite "
    "cap — and scoring is the plain BM25 sum over every matched "
    "term, each with its own df (bm25_bool_query with all-should "
    "clauses). One pruned probe over fixed + expansion terms; no "
    "positions touched, no raw text. Dispatched from "
    "query.match_bool_prefix.",
)
def match_bool_prefix_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match_bool_prefix": {"text": "fast ta"}},
        "size": 10,
    })


@register(
    "metric_aggs_documents",
    """
WITH hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'merge'
),
v AS (SELECT d.n_chars, d.source
      FROM documents d JOIN hits USING (doc_id))
SELECT 'avg' AS metric,
       CAST(FLOOR(AVG(n_chars) * 1048576.0) AS BIGINT) AS value FROM v
UNION ALL SELECT 'max', MAX(n_chars) FROM v
UNION ALL SELECT 'min', MIN(n_chars) FROM v
UNION ALL SELECT 'missing',
  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM v
UNION ALL SELECT 'sum', CAST(SUM(n_chars) AS BIGINT) FROM v
UNION ALL SELECT 'value_count', CAST(COUNT(source) AS BIGINT) FROM v
ORDER BY metric
""",
    doc="The SINGLE-metric aggregation bodies — avg / sum / min / "
    "max / value_count / missing (operators/search_ext.py:"
    "search_metric_agg; ES serves each as its own one-line request, "
    "stats only bundles them): six dispatches over the 'merge' hit "
    "set, numeric metrics on n_chars, the NULL-sensitive pair "
    "(value_count counts non-NULL, missing counts NULL — ES's "
    "missing agg) on the nullable source field. avg Q20-quantized, "
    "sum exact-long for the integral field (fractional fields "
    "pre-quantize per value and integer-sum, the facet rule). Each "
    "dispatch is ONE partial-aggregated reduction over the hit set's "
    "column-pruned doc-values; the union is driver-side plumbing of "
    "six one-row frames. Dispatched from aggs.<metric>.",
)
def metric_aggs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    idx = _postings_index_for(spark, sf_dir)
    legs = []
    for m, field in (
        ("avg", "n_chars"), ("sum", "n_chars"), ("min", "n_chars"),
        ("max", "n_chars"), ("value_count", "source"),
        ("missing", "source"),
    ):
        one = es_search(idx, {
            "query": {"match": {"text": "merge"}},
            "aggs": {"a": {m: {"field": field}}},
        })
        legs.append(one.select(
            F.lit(m).alias("metric"),
            F.col(one.columns[0]).cast("long").alias("value"),
        ))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("metric")


@register(
    "dsir_importance_documents",
    """
WITH sp AS (SELECT doc_id, lang, string_split(text, ' ') AS t
            FROM documents),
bg AS (SELECT doc_id, lang,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS b
       FROM sp WHERE len(t) >= 2),
f AS (SELECT doc_id, lang,
        ('0x' || substring(md5(b), 1, 4))::BIGINT % 64 AS feat FROM bg),
rc AS (SELECT feat, COUNT(*) AS c_r FROM f GROUP BY 1),
tc AS (SELECT feat, COUNT(*) AS c_t FROM f WHERE lang = 'en' GROUP BY 1),
rn AS (SELECT COUNT(*) AS n_r FROM f),
tn AS (SELECT COUNT(*) AS n_t FROM f WHERE lang = 'en'),
lr AS (SELECT feat,
         CAST(FLOOR(ln(
           ((COALESCE(c_t, 0) + 1)::DOUBLE / (n_t + 64)::DOUBLE)
           / ((COALESCE(c_r, 0) + 1)::DOUBLE / (n_r + 64)::DOUBLE)
         ) * 1048576.0) AS BIGINT) AS lr_q20
       FROM rc FULL OUTER JOIN tc USING (feat)
            CROSS JOIN rn CROSS JOIN tn),
pd AS (SELECT doc_id, feat, COUNT(*) AS c FROM f GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(SUM(c * lr_q20) AS BIGINT) AS logw_q20
FROM pd JOIN lr USING (feat)
GROUP BY doc_id ORDER BY logw_q20 DESC, doc_id LIMIT 20
""",
    doc="DSIR — Data Selection with Importance Resampling (Xie et al. "
    "2023; operators/sampling.py:dsir_importance_weights): score every "
    "document by how much it resembles a TARGET distribution (here "
    "the lang='en' slice) under hashed bigram features — the modern "
    "data-selection primitive ('web data that looks like my curated "
    "set') that a 100 TB pretraining pipeline runs between dedup and "
    "mixing. log w(doc) = sum over bigram occurrences of "
    "ln(p_target(bucket)/p_raw(bucket)) with add-one smoothing over "
    "64 md5 buckets. Determinism: each bucket's log-ratio floors to "
    "a Q20 integer FIRST, the per-doc combination is an exact integer "
    "dot product — order-independent under any partitioning (the "
    "temperature-normalizer law). Plan: one tokenize pass, "
    "vocabulary-bounded 64-row ratio table broadcast, per-doc reduce "
    "keyed by the doc id — the corpus is scanned once and never "
    "shuffled whole. Top-20 by weight.",
)
def dsir_importance_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from pycasselastic_spark.operators.sampling import (
        dsir_importance_weights,
    )

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    target = docs.filter(F.col("lang") == "en")
    w = dsir_importance_weights(docs, "doc_id", "text", target,
                                n_buckets=64)
    return w.orderBy(
        F.col("logw_q20").desc(), F.col("doc_id").asc()
    ).limit(20)


@register(
    "sorted_search_after_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark',)
)
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents JOIN hits USING (doc_id)
) WHERE rn BETWEEN 11 AND 20
ORDER BY n_chars DESC, doc_id
""",
    doc="``search_after`` UNDER A FIELD SORT — stateless deep paging "
    "in the (field desc, id asc) total order, the field-sort twin of "
    "the score cursor (operators/search_ext.py:search_sort_by_field "
    "after=; round-13 fix: the dispatcher previously IGNORED a "
    "cursor beside a sort clause and silently returned page one "
    "again — the forbidden failure mode). Page 1's last hit "
    "(n_chars, doc_id) becomes the cursor; page 2 is the hits "
    "STRICTLY after it, replayed by the oracle as rows 11-20 of the "
    "identical total order — an exact-pagination identity. Plan: the "
    "cursor predicate rides the column-pruned doc-values scan the "
    "sort already does; TakeOrderedAndProject per-partition heaps, "
    "no global sort.",
)
def sorted_search_after_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    page1 = es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "sort": [{"n_chars": "desc"}],
        "size": 10,
    }).collect()
    cursor = page1[-1]
    return es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "sort": [{"n_chars": "desc"}],
        "search_after": [cursor["n_chars"], cursor["doc_id"]],
        "size": 10,
    })


@register(
    "ccnet_quality_sample_documents",
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
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
lm AS (SELECT doc_id,
         (CAST(SUM(qp) AS BIGINT) / 1073741824.0) / COUNT(*) AS avg_prob
       FROM q GROUP BY doc_id),
cuts AS (SELECT quantile_cont(avg_prob, 0.25) AS ct,
                quantile_cont(avg_prob, 0.75) AS ch FROM lm),
b AS (SELECT doc_id,
        CASE WHEN avg_prob >= ch THEN 'head'
             WHEN avg_prob >= ct THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM lm CROSS JOIN cuts)
SELECT doc_id, bucket FROM b
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        ::BIGINT::DOUBLE / 4503599627370496.0
      < CASE bucket WHEN 'head' THEN 1.0
             WHEN 'middle' THEN 0.5 ELSE 0.1 END
ORDER BY doc_id
""",
    doc="CCNet-style QUALITY-BUCKETED corpus sampling (Wenzek et al. "
    "2020 — the perplexity head/middle/tail mix every web-scale "
    "pretraining pipeline runs; operators/sampling.py:"
    "quality_bucket_sample over the corpus-trained bigram-LM fluency "
    "score): documents split at the exact 25th/75th percentiles of "
    "avg bigram probability, the head kept whole, the middle sampled "
    "at 0.5, the tail thinned to 0.1 instead of hard-dropped "
    "(quality scores are noisy; a hard cut throws away recoverable "
    "data). Every decision is bit-deterministic cross-engine: exact "
    "percentile cuts (Spark percentile = DuckDB quantile_cont), "
    "Q30-integer LM scores (order-independent sums), md5-uniform "
    "keeps. Plan: the LM's vocabulary-bounded count tables + one "
    "percentile reduction broadcast back over the scored frame + a "
    "narrow filter — the corpus itself is never shuffled.",
)
def ccnet_quality_sample_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.sampling import quality_bucket_sample
    from pycasselastic_spark.queries.base import QUERIES

    lm = QUERIES["bigram_lm_score_documents"].fn(spark, sf_dir)
    kept = quality_bucket_sample(
        lm.select("doc_id", "avg_prob"), "doc_id", "avg_prob",
        head_frac=0.75, tail_frac=0.25, rates=(1.0, 0.5, 0.1),
    )
    from pyspark.sql import functions as F

    return kept.select("doc_id", "bucket").orderBy("doc_id")


@register(
    "fuzzy_match_grouped_customer_names",
    """
WITH base AS (
  SELECT c_name AS text, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer WHERE length(c_name) >= 1 GROUP BY c_name),
same AS (
  SELECT text AS text_a, text AS text_b, CAST(0 AS INT) AS dist,
         CAST(cnt * (cnt - 1) // 2 AS BIGINT) AS n_pairs
  FROM base WHERE cnt >= 2),
v AS (
  SELECT text, cnt,
         unnest(list_prepend(text,
            list_transform(range(1, length(text) + 1),
                           i -> substr(text, 1, i - 1) || substr(text, i + 1))))
           AS variant
  FROM base),
crs AS (
  SELECT DISTINCT a.text AS text_a, b.text AS text_b,
         CAST(levenshtein(a.text, b.text) AS INT) AS dist,
         CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs
  FROM v a JOIN v b ON a.variant = b.variant AND a.text < b.text
  WHERE levenshtein(a.text, b.text) <= 1)
SELECT * FROM same UNION ALL SELECT * FROM crs
""",
    doc="The FLOOD DIAL for fuzzy entity matching (operators/dedup.py:"
    "edit_distance_pairs_grouped) — dedup-before-verify: when a text "
    "value occurs cnt times, the id-level pair output grows as cnt2 "
    "per value (the sf1 ladder's one genuine super-linear residual: "
    "replica-duplicated names made fuzzy_match_customer_names ~12x "
    "at 10x data, all of it output volume), yet every such pair "
    "carries the same (text_a, text_b, dist) fact. Grouping "
    "identical texts FIRST collapses output, verify join, and the "
    "distinct's shuffle from O(sum cnt2) to O(distinct-text pairs); "
    "dist=0 rows carry n_pairs=C(cnt,2), dist>=1 rows cnt_a*cnt_b — "
    "the id-pair multiset stays exactly recoverable. Same FastSS "
    "deletion-variant block join, now over the deduped relation. "
    "Measured before/after at sf1 in SCALING.md.",
)
def fuzzy_match_grouped_customer_names(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.dedup import (
        edit_distance_pairs_grouped,
    )

    cust = ensure_parallelism(_t(spark, sf_dir, "customer"), spark)
    return edit_distance_pairs_grouped(cust, "c_custkey", "c_name",
                                       max_dist=1)


_MF_SPLIT_SQL = """f AS (SELECT doc_id,
  array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS title,
  array_to_string(list_slice(string_split(text, ' '), 9,
    len(string_split(text, ' '))), ' ') AS body
  FROM documents)"""

_BP_FIELD_SQL = """
{p}post AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split({field}, ' ')) AS term FROM f)
  WHERE term <> '' GROUP BY term, doc_id),
{p}exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM {p}post WHERE term LIKE '{prefix}%'
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
{p}qt AS (SELECT * FROM {p}post
  WHERE term IN (SELECT term FROM {p}exp UNION SELECT '{fixed}')),
{p}df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM {p}qt
  GROUP BY term),
{p}dl AS (SELECT doc_id, len(string_split({field}, ' ')) AS dl FROM f),
{p}sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
    AVG(CAST(len(string_split({field}, ' ')) AS DOUBLE)) AS avgdl FROM f),
{p}score AS (
  SELECT doc_id,
         CAST(FLOOR(SUM(
           ln(1.0 + ({p}sc.n_docs - {p}df.df + 0.5) / ({p}df.df + 0.5))
           * ({p}qt.tf * 2.2)
           / ({p}qt.tf + 1.2 * (0.25 + 0.75 * {p}dl.dl / {p}sc.avgdl))
         ) * 1048576.0) AS BIGINT) AS s
  FROM {p}qt JOIN {p}df USING (term) JOIN {p}dl USING (doc_id)
       CROSS JOIN {p}sc
  GROUP BY doc_id, {p}sc.n_docs)
"""


@register(
    "bool_prefix_multi_match_documents",
    "WITH "
    + _MF_SPLIT_SQL
    + ","
    + _BP_FIELD_SQL.format(p="t", field="title", fixed="spark",
                           prefix="mer")
    + ","
    + _BP_FIELD_SQL.format(p="b", field="body", fixed="spark",
                           prefix="mer")
    + """
SELECT COALESCE(ts.doc_id, bs.doc_id) AS doc_id,
       CAST(GREATEST(COALESCE(ts.s, 0), COALESCE(bs.s, 0))
            + CAST(FLOOR(CAST(0.3 AS DOUBLE)
                * (COALESCE(ts.s, 0) + COALESCE(bs.s, 0)
                   - GREATEST(COALESCE(ts.s, 0), COALESCE(bs.s, 0))))
              AS BIGINT)
            AS BIGINT) AS score_q20
FROM tscore ts FULL OUTER JOIN bscore bs ON ts.doc_id = bs.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES multi_match type=``bool_prefix`` — multi-field "
    "search-as-you-type (operators/search_compose.py:"
    "multi_match_bool_prefix): each field runs a match_bool_prefix "
    "('spark mer' — 'spark' optional, 'mer' expanded against THAT "
    "field's dictionary at the df-desc rewrite cap), scored by the "
    "per-term-df BM25 sum with the field's own statistics, and the "
    "doc takes its best field plus tie_breaker x the rest — the "
    "best_fields combination over per-field bool_prefix queries, "
    "exactly how ES compiles the type; a field whose expansion comes "
    "up empty contributes nothing (the lenient as-you-type "
    "behavior). Completes the multi_match family: all six ES types "
    "now dispatch or raise by name (phrase_prefix raises — its "
    "positional expansion scoring law is not dispatched). Plan: "
    "per-field pushed-startswith dictionary scans + one pruned probe "
    "per field, full outer join of query-bounded outputs.",
)
def bool_prefix_multi_match_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.queries.search_es_queries import _mf_indexes_for

    tidx, bidx = _mf_indexes_for(spark, sf_dir)
    return es_search(tidx, {
        "query": {"multi_match": {
            "query": "spark mer", "type": "bool_prefix",
            "fields": ["title", "body"], "tie_breaker": 0.3,
        }},
        "size": 10,
    }, field_indexes={"title": tidx, "body": bidx})


# --- date_histogram: fixed_interval + min_doc_count=0/extended_bounds -------

_TS_INDEX_CACHE: dict[str, str] = {}

# epoch anchor 2024-01-07T00:00:00Z; one doc every (doc_id % 7) x 30 h
# so the 12 h grid holds both multi-doc and EMPTY buckets
_TS0 = 1704585600
_TS_STEP = 108000  # 30 h
_EB_LO = _TS0 - 43200  # one empty bucket before the data span
_EB_HI = _TS0 + 8 * 86400  # empty buckets after it


def _ts_index_for(spark: SparkSession, sf_dir: str):
    from pycasselastic_spark.operators import search as SRCH
    import os
    import tempfile

    from pyspark.sql import functions as F

    path = _TS_INDEX_CACHE.get(sf_dir)
    if path is None:
        docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
        with_ts = docs.select(
            "doc_id", "text",
            F.timestamp_seconds(
                F.lit(_TS0) + (F.col("doc_id") % 7) * _TS_STEP
            ).alias("ingest_ts"),
        )
        path = os.path.join(tempfile.mkdtemp(prefix="tshist_idx_"), "idx")
        SRCH.build_postings_index(
            with_ts, "doc_id", "text", path,
            n_buckets=16, stored_fields=["ingest_ts"],
        )
        _TS_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "date_histogram_fixed_documents",
    f"""
WITH hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term = 'merge'
),
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
c AS (SELECT CAST(FLOOR(ts / 43200) * 43200 AS BIGINT) AS bucket_s,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id) GROUP BY 1),
b AS (SELECT LEAST(COALESCE(MIN(bucket_s), {_EB_LO}), {_EB_LO}) AS lo,
             GREATEST(COALESCE(MAX(bucket_s), {_EB_HI}), {_EB_HI}) AS hi
      FROM c),
s AS (SELECT unnest(range(b.lo, b.hi + 43200, 43200)) AS bucket_s FROM b)
SELECT s.bucket_s, CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs
FROM s LEFT JOIN c USING (bucket_s) ORDER BY bucket_s
""",
    doc="ES ``date_histogram`` in its ``fixed_interval`` form (12 h "
    "epoch-floored buckets — floor(epoch/43200)*43200, the "
    "fixed-width law, vs calendar_interval's variable-length "
    "truncation) WITH ``min_doc_count=0`` + ``extended_bounds``: "
    "empty buckets are synthesized across the union of the data span "
    "and the bucket-aligned bounds — the exact shape every "
    "time-series dashboard needs (gaps must RENDER as zeros, and the "
    "x-axis must extend to the requested window even where no doc "
    "fell). Operators/search_compose.py:search_date_histogram_agg; "
    "hour/quarter/year calendar intervals share the dispatch "
    "(pytest-pinned incl. month boundaries). Output keys are epoch "
    "seconds (timezone-free cross-engine compare). Plan: one "
    "two-column reduction over the hit set's doc-values, then ONE "
    "generate-series from a one-row bounds reduction left-joining "
    "the counts — series length = bucket count, never corpus. "
    "Dispatched from aggs.date_histogram.",
)
def date_histogram_fixed_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    idx = _ts_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"halfdays": {"date_histogram": {
            "field": "ingest_ts", "fixed_interval": "12h",
            "min_doc_count": 0,
            "extended_bounds": {"min": _EB_LO, "max": _EB_HI},
        }}},
    })
    return out.select(
        F.col("bucket").cast("long").alias("bucket_s"), "n_docs"
    ).orderBy("bucket_s")


@register(
    "function_score_sqrt_documents",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('spark', 'merge')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term)
SELECT qt.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM({_BM25_TERM_SCORE})
         * sqrt(d.n_chars * CAST(0.5 AS DOUBLE)) * 1048576.0) AS BIGINT)
         AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
     JOIN documents d ON d.doc_id = qt.doc_id
GROUP BY qt.doc_id, sc.n_docs, d.n_chars
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES function_score field_value_factor with the FULL modifier "
    "set dispatched from the _search body (operators/search_ext.py:"
    "bm25_function_score; round-13 extension of the ln1p-only round-9 "
    "operator): here modifier=sqrt with factor=0.5 — final score = "
    "BM25 x sqrt(0.5 x n_chars), the sub-linear length prior. "
    "Modifier semantics are EXACTLY ES's Lucene contract: log/log1p/"
    "log2p are BASE-10, ln/ln1p/ln2p natural, plus sqrt/square/"
    "reciprocal/none and the missing-value substitute; unsupported "
    "modifiers raise by name. One Q20 floor after the multiply "
    "(sqrt is correctly-rounded IEEE — bit-equal cross-engine); the "
    "query-bounded candidates broadcast-join back for the factor "
    "column, no corpus scan. Dispatched from query.function_score.",
)
def function_score_sqrt_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return es_search(idx, {
        "query": {"function_score": {
            "query": {"match": {"text": "spark merge"}},
            "field_value_factor": {
                "field": "n_chars", "modifier": "sqrt", "factor": 0.5,
            },
        }},
        "size": 10,
    }, docs=docs)


@register(
    "multi_knn_search_embeddings",
    f"""
WITH {_TOK_POSTINGS},
qt AS (SELECT * FROM postings WHERE term IN ('merge')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
lexs AS (
  SELECT qt.doc_id,
         CAST(FLOOR(SUM({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT)
           AS lex_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qt.doc_id, sc.n_docs
),
en AS (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)))
          AS nrm
      FROM embeddings),
eu AS (SELECT vec_id,
        list_transform(embedding, x -> x::DOUBLE / nrm) AS u FROM en),
qa AS (SELECT list_transform(range(0, 64),
        i -> CASE WHEN i % 2 = 0 THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END) AS v),
qan AS (SELECT list_transform(v, x -> x /
          sqrt(list_sum(list_transform(v, y -> y * y)))) AS u FROM qa),
qb AS (SELECT list_transform(range(0, 64),
        i -> CASE WHEN i % 3 = 0 THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END) AS v),
qbn AS (SELECT list_transform(v, x -> x /
          sqrt(list_sum(list_transform(v, y -> y * y)))) AS u FROM qb),
pa AS (SELECT c.vec_id,
         list_sum(list_transform(range(1, 65), k -> q.u[k] * c.u[k]))
           AS cosine
       FROM eu c CROSS JOIN qan q),
pb AS (SELECT c.vec_id,
         list_sum(list_transform(range(1, 65), k -> q.u[k] * c.u[k]))
           AS cosine
       FROM eu c CROSS JOIN qbn q),
ka AS (SELECT vec_id AS doc_id,
         CAST(FLOOR((cosine * CAST(1.0 AS DOUBLE)) * 1048576.0) AS BIGINT)
           AS q20
       FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id)
             AS rn FROM pa) WHERE rn <= 15),
kb AS (SELECT vec_id AS doc_id,
         CAST(FLOOR((cosine * CAST(0.5 AS DOUBLE)) * 1048576.0) AS BIGINT)
           AS q20
       FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id)
             AS rn FROM pb) WHERE rn <= 15)
SELECT doc_id,
       CAST(COALESCE(ka.q20, 0) + COALESCE(kb.q20, 0)
            + COALESCE(l.lex_q20, 0) AS BIGINT) AS score_q20
FROM ka FULL OUTER JOIN kb USING (doc_id)
        FULL OUTER JOIN lexs l USING (doc_id)
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES 8.7+ MULTI-kNN: the ``knn`` body key as a LIST of clauses "
    "beside a lexical match — multi-vector retrieval (several query "
    "aspects against the same embedding column, here an alternating "
    "and an every-third pattern at boosts 1.0/0.5 with a 'merge' "
    "lexical leg): each clause contributes floor(boost x cosine x "
    "Q20) for the docs in ITS global top-15, the lexical leg its "
    "BM25 Q20, and a doc's score is the SUM over the legs that "
    "retrieved it — ES's additive combination generalized to n legs "
    "(operators/search_hybrid.py:multi_knn_bm25). Determinism: every "
    "leg floors independently, the combination is order-free integer "
    "addition. Plan: n bounded kNN legs (each one broadcast one-row "
    "query over the embeddings scan) + the pruned lexical probe, "
    "reduced by full outer joins — every input query-sized.",
)
def multi_knn_search_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"), spark)
    vec_b = [1.0 if i % 3 == 0 else 0.0 for i in range(64)]
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "knn": [
            {"field": "embedding", "query_vector": _QVEC, "k": 15,
             "num_candidates": 100},
            {"field": "embedding", "query_vector": vec_b, "k": 15,
             "boost": 0.5, "num_candidates": 100},
        ],
        "size": 10,
    }, embeddings=emb)


# --- multi_match: the remaining types (phrase, cross_fields) ----------------

# One field's Lucene PhraseQuery score under BM25Similarity: pf = the
# number of adjacent chain starts, idf = the terms' Q20-integer idf
# sum (order-independent), score = (idf/Q20) * pf(k1+1)/(pf + k1*norm).
_PHRASE_FIELD_SQL = """
{p}k AS (SELECT doc_id, string_split({field}, ' ') AS tk FROM f),
{p}pf AS (SELECT doc_id,
    CAST(len(list_filter(range(1, len(tk)),
      i -> tk[i] = '{t1}' AND tk[i + 1] = '{t2}')) AS BIGINT) AS pf
  FROM {p}k),
{p}pfh AS (SELECT * FROM {p}pf WHERE pf > 0),
{p}post AS (SELECT term, doc_id
  FROM (SELECT doc_id, unnest(string_split({field}, ' ')) AS term FROM f)
  WHERE term <> '' GROUP BY term, doc_id),
{p}df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM {p}post
  WHERE term IN ('{t1}', '{t2}') GROUP BY term),
{p}sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
    AVG(CAST(len(string_split({field}, ' ')) AS DOUBLE)) AS avgdl FROM f),
{p}idf AS (SELECT CAST(SUM(CAST(FLOOR(
    ln(1.0 + ({p}sc.n_docs - df + 0.5) / (df + 0.5)) * 1048576.0)
    AS BIGINT)) AS BIGINT) AS idf_q FROM {p}df CROSS JOIN {p}sc),
{p}dl AS (SELECT doc_id, len(string_split({field}, ' ')) AS dl FROM f),
{p}score AS (
  SELECT p.doc_id,
         CAST(FLOOR(({p}idf.idf_q / 1048576.0)
           * (p.pf * 2.2)
           / (p.pf + 1.2 * (0.25 + 0.75 * {p}dl.dl / {p}sc.avgdl))
           * 1048576.0) AS BIGINT) AS s
  FROM {p}pfh p JOIN {p}dl USING (doc_id)
       CROSS JOIN {p}idf CROSS JOIN {p}sc
)"""


@register(
    "phrase_multi_match_documents",
    "WITH "
    + _MF_SPLIT_SQL
    + ","
    + _PHRASE_FIELD_SQL.format(p="t", field="title", t1="merge", t2="sort")
    + ","
    + _PHRASE_FIELD_SQL.format(p="b", field="body", t1="merge", t2="sort")
    + """
SELECT COALESCE(ts.doc_id, bs.doc_id) AS doc_id,
       CAST(GREATEST(COALESCE(ts.s, 0), COALESCE(bs.s, 0))
            + CAST(FLOOR(CAST(0.3 AS DOUBLE)
                * (COALESCE(ts.s, 0) + COALESCE(bs.s, 0)
                   - GREATEST(COALESCE(ts.s, 0), COALESCE(bs.s, 0))))
              AS BIGINT)
            AS BIGINT) AS score_q20
FROM tscore ts FULL OUTER JOIN bscore bs ON ts.doc_id = bs.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES multi_match type=``phrase``: match_phrase runs on EVERY "
    "field and the doc's score is its best field's phrase score plus "
    "tie_breaker x the others' — a dis_max of per-field phrase "
    "queries, exactly how ES compiles the type (operators/"
    "search_compose.py:multi_match_phrase over the shared title/body "
    "index pair). Per-field scoring is Lucene's PhraseWeight under "
    "BM25Similarity: the phrase acts as ONE synthetic term whose tf "
    "is the phrase frequency (valid chain starts from STORED "
    "positions) and whose idf is the terms' idf sum — summed in Q20 "
    "INTEGER space so the idf can never stack float-order noise at "
    "any phrase length, then one fixed double expression over "
    "(pf, dl), floored once. Plan: per-field positional chain joins "
    "(inputs bounded by docs containing the rarer prefix), dl from "
    "the same pruned probe, idf a one-row broadcast, full outer join "
    "of query-bounded field outputs. Dispatched from "
    "query.multi_match.type=phrase.",
)
def phrase_multi_match_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.queries.search_es_queries import _mf_indexes_for

    tidx, bidx = _mf_indexes_for(spark, sf_dir)
    return es_search(tidx, {
        "query": {"multi_match": {
            "query": "merge sort", "type": "phrase",
            "fields": ["title", "body"], "tie_breaker": 0.3,
        }},
        "size": 10,
    }, field_indexes={"title": tidx, "body": bidx})


@register(
    "cross_fields_bm25_documents",
    "WITH "
    + _MF_SPLIT_SQL
    + """,
tqt AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(title, ' ')) AS term FROM f)
  WHERE term IN ('spark', 'merge') GROUP BY term, doc_id),
bqt AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(body, ' ')) AS term FROM f)
  WHERE term IN ('spark', 'merge') GROUP BY term, doc_id),
tdl AS (SELECT doc_id, len(string_split(title, ' ')) AS dl FROM f),
bdl AS (SELECT doc_id, len(string_split(body, ' ')) AS dl FROM f),
tsc AS (SELECT AVG(CAST(len(string_split(title, ' ')) AS DOUBLE))
          AS avgdl FROM f),
bsc AS (SELECT AVG(CAST(len(string_split(body, ' ')) AS DOUBLE))
          AS avgdl FROM f),
nsc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM f),
u AS (
  SELECT qt.term, qt.doc_id, qt.tf, dl.dl, sc.avgdl
  FROM tqt qt JOIN tdl dl USING (doc_id) CROSS JOIN tsc sc
  UNION ALL
  SELECT qt.term, qt.doc_id, qt.tf, dl.dl, sc.avgdl
  FROM bqt qt JOIN bdl dl USING (doc_id) CROSS JOIN bsc sc
),
bdf AS (SELECT term, CAST(MAX(df_f) AS BIGINT) AS df FROM (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df_f FROM tqt GROUP BY term
    UNION ALL
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df_f FROM bqt GROUP BY term
  ) GROUP BY term),
ptd AS (
  SELECT u.term, u.doc_id,
         CAST(FLOOR(MAX(
           ln(1.0 + (nsc.n - bdf.df + 0.5) / (bdf.df + 0.5))
           * (u.tf * 2.2)
           / (u.tf + 1.2 * (0.25 + 0.75 * u.dl / u.avgdl))
         ) * 1048576.0) AS BIGINT) AS s
  FROM u JOIN bdf USING (term) CROSS JOIN nsc
  GROUP BY u.term, u.doc_id
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(SUM(s) AS BIGINT) AS score_q20
FROM ptd GROUP BY doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES multi_match type=``cross_fields`` — TERM-centric "
    "multi-field matching (operators/search_compose.py:"
    "multi_match_cross_fields): each query term may match in ANY "
    "field, a term's score is its best field's, and document "
    "frequencies are BLENDED across fields (df(t) = max over fields "
    "of df_f(t), Lucene's BlendedTermQuery) so a term common in one "
    "field can't look artificially rare in another — the entity-name "
    "failure mode best_fields has on first_name/last_name-style "
    "splits. Per-doc score = sum over terms of the per-term "
    "best-field score (max of doubles — order-independent — floored "
    "once to Q20, then INTEGER-summed across terms). Plan: one "
    "pruned probe per field unioned with a field tag, per-(field, "
    "term) df reduced then blended via a broadcast max join, two "
    "partial-aggregated reductions — no corpus scan, no per-field "
    "re-probe. Dispatched from query.multi_match.type=cross_fields.",
)
def cross_fields_bm25_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.queries.search_es_queries import _mf_indexes_for

    tidx, bidx = _mf_indexes_for(spark, sf_dir)
    return es_search(tidx, {
        "query": {"multi_match": {
            "query": "spark merge", "type": "cross_fields",
            "fields": ["title", "body"],
        }},
        "size": 10,
    }, field_indexes={"title": tidx, "body": bidx})
