"""ES 8.x kNN retrieval COMPOSITION: pre-filtered kNN, the default
additive hybrid (``knn`` + ``query`` in one ``_search`` body), and the
``rrf`` retriever from a literal ``query_vector``.

This is the request shape every RAG stack POSTs at the index the
reference feeds (``pyCassElastic.py:316-354`` writes the documents;
ES 8.x serves ``knn`` beside a lexical ``query``): the standalone
``knn`` body was dispatched in round 12, and ``hybrid_rrf_search``
(operators/search_ext.py) already fuses a CORPUS-RESIDENT query
vector — this module closes the literal-vector composition gap so
``es_search`` stops raising on it.

Semantics, exactly ES:

* ``knn.filter`` — the filter applies DURING the vector search, so
  all k returned neighbors pass it (post-filtering a top-k would
  return fewer than k; ES guarantees k survivors when they exist).
  Filters evaluate against the index's STORED doc-values — never a
  raw docs frame.
* ``knn`` + ``query`` (no ``rank``) — ES's default combination: a
  doc's score is the SUM of its lexical score and ``knn.boost`` x its
  vector similarity, over the UNION of both hit sets (a doc found by
  only one leg keeps that leg's score; the kNN leg contributes only
  its global top-k, exactly ES).
* ``rank: {rrf: ...}`` — reciprocal rank fusion: ranks, not scores,
  fuse (score scales never need calibrating), score =
  sum over legs of 1 / (rank_constant + rank).

Determinism law (shared with the whole search family): lexical BM25
floors to Q20 integers first; cosine is the bit-replayable
unit-normalize + sequential-fold dot the similarity operators pin;
the one cross-scale combination is a single double multiply chain +
floor, replayed exactly by the DuckDB oracles.

Plan shapes — all candidate-bounded: the kNN leg broadcasts ONE
one-row unit query vector over the embeddings scan (filter ids meet
it through a pre-scan join, pushing the candidate set down BEFORE
any dot product is computed — the 100 TB story is the IVF/LSH twins,
``cosine_topk_ivf``/``cosine_topk_lsh``, which bucket the corpus so
the scan itself prunes); the lexical leg is the pruned postings
probe; fusion is a full outer join of two bounded relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pycasselastic_spark.operators.search_index import (
    Q20,
    PostingsIndex,
    dv_col,
)
from pycasselastic_spark.operators.search_probes import _bm25_scored


def filtered_ids(index: PostingsIndex, filters: list) -> DataFrame:
    """Ids passing a filter-context predicate list ``(field, op,
    value)`` — same triples and semantics as ``constant_score_search``
    / ``bm25_topk_filtered`` (range bounds, exact term, null-safe
    ``!=~``, ``exists``), evaluated against STORED doc-values with
    every predicate pushed into the columnar scan."""
    from pycasselastic_spark.operators.search_compose import _DV_OPS

    dv = index.live_docvalues()
    for field, op, value in filters:
        if field not in index.stored_fields:
            raise ValueError(
                f"field {field!r} is not stored in this index's doc "
                f"values (stored_fields={index.stored_fields})"
            )
        if op not in _DV_OPS:
            raise ValueError(f"unsupported knn filter op {op!r}")
        dv = dv.filter(_DV_OPS[op](dv_col(field), F.lit(value)))
    return dv.select(index.id_col).distinct()


def knn_literal_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k for ONE literal query vector: the ES 8.x
    ``knn`` body's retrieval core (HNSW is ES's approximation of this
    limit; num_candidates is its recall dial — the exact answer is
    what any num_candidates converges to). Returns
    ``(match_id, cosine)``.

    ``allowed_ids`` (one column named ``id_col``) is the pre-filter:
    candidates are restricted BEFORE any dot product — ES's
    filtered-kNN guarantee that all k survivors pass the filter.

    No corpus row is ever excluded by a self-match sentinel: the
    query is a literal, not a corpus row, so no sentinel id exists to
    collide with (round-12 advisor finding against the -1 sentinel).

    Plan: optional pre-scan id join, one unit-normalize pass, ONE
    broadcast one-row query, sequential-fold dot products,
    TakeOrderedAndProject."""
    from pycasselastic_spark.operators.similarity import (
        dot,
        with_unit_vector,
    )

    for c in (id_col, vec_col):
        if c not in embeddings.columns:
            raise ValueError(
                f"knn column {c!r} not in the embeddings frame "
                f"(columns: {embeddings.columns})"
            )
    spark = embeddings.sparkSession
    vec = [float(x) for x in query_vector]
    q = spark.createDataFrame([(vec,)], f"{vec_col} array<double>")
    q = with_unit_vector(q, vec_col, "_qu").select("_qu")
    cand = embeddings
    if allowed_ids is not None:
        cand = cand.join(allowed_ids.select(id_col), id_col, "semi")
    c = with_unit_vector(cand, vec_col, "_cu").select(
        F.col(id_col).alias("match_id"), "_cu"
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", dot(F.col("_qu"), F.col("_cu")))
        .select("match_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("match_id").asc())
        .limit(k)
    )


def hybrid_knn_bm25(
    index: PostingsIndex,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vector: list[float],
    k: int = 10,
    knn_k: int = 10,
    knn_boost: float = 1.0,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    knn_filters: list | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES's DEFAULT ``knn`` + ``query`` combination in one ``_search``
    body: score = lexical BM25 + ``knn_boost`` x cosine, over the
    UNION of the lexical hit set and the kNN leg's global top-k
    (a doc retrieved by only one leg keeps that leg's score — ES
    computes exactly this sum with the missing leg contributing 0).

    Returns ``(id, lex_q20, knn_q20, score_q20)`` top-``k`` by the
    combined score with the id tiebreak; leg columns are NULL where
    the leg missed, the combined score coalesces them to 0.

    Determinism: lex_q20 is the standard floored BM25 integer;
    knn_q20 = floor(cosine * knn_boost * Q20) — one double multiply
    chain over the bit-replayable cosine, floored once; the
    combination is integer addition.

    Plan: pruned postings probe (lexical) FULL OUTER JOIN the bounded
    kNN top-k (both query-sized; no corpus shuffle)."""
    id_col = index.id_col
    lex = _bm25_scored(index, query_terms, k1, b).select(
        F.col(id_col), F.col("score_q20").alias("lex_q20")
    )
    allowed = None
    if knn_filters:
        allowed = filtered_ids(index, knn_filters).withColumnRenamed(
            id_col, emb_id_col
        )
    knn = knn_literal_topk(
        embeddings, query_vector, knn_k,
        id_col=emb_id_col, vec_col=emb_vec_col, allowed_ids=allowed,
    ).select(
        F.col("match_id").alias(id_col),
        F.floor(
            F.col("cosine") * F.lit(float(knn_boost)) * F.lit(float(Q20))
        ).cast("long").alias("knn_q20"),
    )
    return (
        lex.join(knn, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.col("lex_q20"),
            F.col("knn_q20"),
            (
                F.coalesce(F.col("lex_q20"), F.lit(0))
                + F.coalesce(F.col("knn_q20"), F.lit(0))
            ).cast("long").alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def multi_knn_bm25(
    index: PostingsIndex,
    embeddings: DataFrame,
    query_terms: list[str] | None,
    knn_specs: list[dict],
    k: int = 10,
    emb_id_col: str = "vec_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES 8.7+ MULTI-kNN: the ``knn`` body key as a LIST of clauses
    (multi-vector retrieval — several query aspects, or title/body
    embedding columns): each clause contributes
    floor(boost x cosine x Q20) for the docs in ITS global top-k, an
    optional lexical ``query`` contributes its BM25 Q20, and a doc's
    score is the SUM over the legs that retrieved it (exactly ES's
    additive combination generalized to n legs). Returns
    ``(id, score_q20)`` top-``k``.

    Each spec dict: ``vec`` (literal query_vector), ``k``, ``boost``
    (default 1.0), ``vec_col``, optional ``filters`` (the shared
    filter-context triples, pre-filter semantics per clause).

    Determinism: every leg floors independently (the single-leg law),
    and the combination is integer addition — order-free.

    Plan shape: n bounded kNN legs (each ONE broadcast one-row query
    over the embeddings scan) + the pruned lexical probe, reduced by
    full outer joins on the id — every input is query-sized."""
    if not knn_specs:
        raise ValueError("multi_knn_bm25 needs at least one knn clause")
    id_col = index.id_col
    combined = None
    score_cols = []
    for i, spec in enumerate(knn_specs):
        allowed = None
        if spec.get("filters"):
            allowed = filtered_ids(index, spec["filters"]).withColumnRenamed(
                id_col, emb_id_col
            )
        leg = knn_literal_topk(
            embeddings, spec["vec"], int(spec["k"]),
            id_col=emb_id_col, vec_col=spec["vec_col"],
            allowed_ids=allowed,
        ).select(
            F.col("match_id").alias(id_col),
            F.floor(
                F.col("cosine")
                * F.lit(float(spec.get("boost", 1.0)))
                * F.lit(float(Q20))
            ).cast("long").alias(f"knn_q20_{i}"),
        )
        score_cols.append(f"knn_q20_{i}")
        combined = (
            leg if combined is None
            else combined.join(leg, id_col, "full_outer")
        )
    if query_terms:
        lex = _bm25_scored(index, query_terms, k1, b).select(
            F.col(id_col), F.col("score_q20").alias("lex_q20")
        )
        combined = combined.join(lex, id_col, "full_outer")
        score_cols.append("lex_q20")
    total = None
    for c in score_cols:
        t = F.coalesce(F.col(c), F.lit(0))
        total = t if total is None else total + t
    return (
        combined.select(
            F.col(id_col), total.cast("long").alias("score_q20")
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hybrid_rrf_from_vector(
    index: PostingsIndex,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vector: list[float],
    k: int = 10,
    k_rrf: int = 60,
    n_text: int = 50,
    n_knn: int = 50,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    knn_filters: list | None = None,
) -> DataFrame:
    """The ES 8.8+ ``rrf`` retriever for a LITERAL ``query_vector``
    (``hybrid_rrf_search`` serves the corpus-resident-vector form):
    fuse the lexical top-``n_text`` with the kNN top-``n_knn`` by
    score = sum of 1/(k_rrf + rank) over the legs a doc appears in.
    Returns ``(id, rrf_q20, text_rank, knn_rank)`` top-``k``
    (absent-leg ranks NULL, contributing 0).

    Determinism: each leg's rank comes from a total order with the id
    tiebreak — text on (score_q20 desc, id), kNN on (cosine desc, id)
    — and the fused double is two exact small-integer reciprocals
    added in fixed order, floored once to Q20.

    Plan: both legs bounded (pruned probe / broadcast one-row query),
    rank windows only ever sort the ≤ n-row leg outputs, fusion is a
    full outer join of two ≤ n-row relations."""
    id_col = index.id_col
    text = (
        _bm25_scored(index, query_terms, 1.2, 0.75)
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(n_text)
        .withColumn(
            "text_rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("score_q20").desc(), F.col(id_col).asc()
                )
            ),
        )
        .select(F.col(id_col), "text_rank")
    )
    allowed = None
    if knn_filters:
        allowed = filtered_ids(index, knn_filters).withColumnRenamed(
            id_col, emb_id_col
        )
    knn = (
        knn_literal_topk(
            embeddings, query_vector, n_knn,
            id_col=emb_id_col, vec_col=emb_vec_col, allowed_ids=allowed,
        )
        .withColumn(
            "knn_rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("cosine").desc(), F.col("match_id").asc()
                )
            ),
        )
        .select(F.col("match_id").alias(id_col), "knn_rank")
    )
    leg = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(c).cast("double")),
        F.lit(0.0),
    )
    return (
        text.join(knn, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.floor((leg("text_rank") + leg("knn_rank")) * Q20)
            .cast("long")
            .alias("rrf_q20"),
            F.col("text_rank").cast("long"),
            F.col("knn_rank").cast("long"),
        )
        .orderBy(F.col("rrf_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )
