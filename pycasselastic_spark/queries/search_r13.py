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
