"""ES query-DSL extensions over the stored index: aggregations
(facets, composite paging, significant_terms, top_hits), score-shaping
layers (function_score, decay, collapse), suggesters, percolation,
highlighting, and hybrid BM25+kNN RRF retrieval.

Split out of ``operators/search.py`` (round 10); the public surface is
re-exported there. These compose the probe family's scored candidate
sets with candidate-bounded stored-field fetches — the corpus is never
shuffled (see each docstring's plan-shape note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import (
    Q20,
    PostingsIndex,
    _tokens,
    dv_col,
    hits_relation,
)
from pycasselastic_spark.operators.search_probes import (
    _bm25_scored,
    _bm25_scored_raw,
    expand_fuzzy_terms,
)


# moved to search_index (round 11) so search_probes can use it too
# (bm25_rescore's secondary set was the last unguarded broadcast);
# re-imported here to keep this module's call sites and the facade's
# re-export unchanged
from pycasselastic_spark.operators.search_index import (  # noqa: E402
    _bounded_broadcast,
)

# ES rejects aggregations that would create more buckets than
# ``search.max_buckets`` (default 65536, too_many_buckets_exception);
# every zero-filling agg here enforces the same bound by name.
MAX_HISTOGRAM_BUCKETS = 65536


# ES field_value_factor modifiers — EXACTLY ES's function names: the
# log family is base 10, the ln family natural (Lucene's
# FieldValueFactorFunction.Modifier). Applied to (factor x value).
_FVF_MODIFIERS = {
    "none": lambda c: c,
    "log": lambda c: F.log10(c),
    "log1p": lambda c: F.log10(c + F.lit(1.0)),
    "log2p": lambda c: F.log10(c + F.lit(2.0)),
    "ln": lambda c: F.log(c),
    "ln1p": lambda c: F.log(F.lit(1.0) + c),
    "ln2p": lambda c: F.log(F.lit(2.0) + c),
    "sqrt": lambda c: F.sqrt(c),
    "square": lambda c: c * c,
    "reciprocal": lambda c: F.lit(1.0) / c,
}


def bm25_function_score(
    index: PostingsIndex,
    docs: DataFrame,
    query_terms: list[str],
    factor_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    modifier: str = "ln1p",
    factor: float = 1.0,
    missing: float | None = None,
) -> DataFrame:
    """ES ``function_score`` with a ``field_value_factor``: final
    score = BM25 x modifier(factor x doc[factor_col]) — the
    "relevance × document-quality signal" reranking every production
    search deploys (recency, popularity, length priors). The full ES
    modifier set is dispatched with ES's exact function semantics
    (``log``/``log1p``/``log2p`` are BASE-10, ``ln*`` natural — the
    Lucene FieldValueFactorFunction contract); ``missing``
    substitutes for NULL field values. Returns
    ``(id, n_hit_terms, score_q20)`` with ONE Q20 floor applied after
    the multiply, so the factor reorders within the exact arithmetic
    the oracle replays.

    Plan shape: the usual pruned probe scores candidates raw; only the
    (query-bounded) candidates broadcast-join back to the docs table
    for the factor column — the highlight-style stored-field fetch,
    never a corpus scan."""
    if modifier not in _FVF_MODIFIERS:
        raise ValueError(
            f"unsupported field_value_factor modifier {modifier!r} "
            f"(supported: {sorted(_FVF_MODIFIERS)})"
        )
    id_col = index.id_col
    raw = _bm25_scored_raw(index, query_terms, k1, b)
    val = F.col(factor_col)
    if missing is not None:
        val = F.coalesce(val, F.lit(float(missing)))
    val = val * F.lit(float(factor))
    return (
        _bounded_broadcast(raw)
        .join(docs.select(id_col, factor_col), id_col)
        .select(
            F.col(id_col),
            "n_hit_terms",
            F.floor(
                F.col("score_raw")
                * _FVF_MODIFIERS[modifier](val)
                * Q20
            ).cast("long").alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_decay_score(
    index: PostingsIndex,
    docs: DataFrame,
    query_terms: list[str],
    field_col: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``function_score`` with a ``gauss`` decay on a numeric field
    — the recency/distance boost every production search deploys:
    final score = BM25 * exp(-max(0, |x - origin| - offset)^2 /
    (2 sigma^2)) with sigma^2 = -scale^2 / (2 ln decay), so a doc at
    ``origin`` keeps its full score and one ``scale`` away is
    multiplied by ``decay``. ONE Q20 floor after the multiply
    (function_score's one-floor rule).

    Plan shape: identical to ``bm25_function_score`` — the pruned
    probe scores candidates raw, and only the (query-bounded)
    candidates broadcast-join back to the docs table for the decay
    field; never a corpus scan. sigma^2 is computed driver-side and
    inlined as a literal so the oracle replays the identical double."""
    import math

    sigma2 = -(float(scale) ** 2) / (2.0 * math.log(float(decay)))
    id_col = index.id_col
    raw = _bm25_scored_raw(index, query_terms, k1, b)
    dist = F.greatest(
        F.lit(0.0), F.abs(F.col(field_col) - F.lit(float(origin))) - F.lit(float(offset))
    )
    return (
        _bounded_broadcast(raw)
        .join(docs.select(id_col, field_col), id_col)
        .select(
            F.col(id_col),
            "n_hit_terms",
            F.floor(
                F.col("score_raw")
                * F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
                * Q20
            ).cast("long").alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_collapse(
    index: PostingsIndex,
    docs: DataFrame,
    query_terms: list[str],
    collapse_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES field ``collapse``: the ranked result list keeps only the
    single best hit per ``collapse_col`` value (dedup-by-field in the
    ranking, e.g. one result per domain). Returns the global top-``k``
    of the collapsed list as ``(id, collapsed, score_q20)``.

    Plan shape: top_hits_by_facet's — query-bounded scored candidates
    broadcast-join the docs table for the collapse field, ONE window
    partitioned by it picks each group's best (score desc, id), then
    the global top-k is a TakeOrderedAndProject over the collapsed
    (≤ distinct-field-values) rows."""
    from pyspark.sql.window import Window

    id_col = index.id_col
    scored = _bm25_scored(index, query_terms, k1, b)
    w = Window.partitionBy(collapse_col).orderBy(
        F.col("score_q20").desc(), F.col(id_col).asc()
    )
    return (
        _bounded_broadcast(scored)
        .join(docs.select(id_col, collapse_col), id_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col(collapse_col).alias("collapsed"),
            "score_q20",
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def search_facets(
    index: PostingsIndex,
    docs: DataFrame,
    query_terms: list[str],
    facet_col: str,
    k: int = 10,
    missing: str | None = None,
    include: str | None = None,
    exclude: str | None = None,
) -> DataFrame:
    """ES search + aggregations (a terms facet over the hit set):
    ``(facet value, n_docs)`` for every doc matching ANY query term,
    sorted by count desc then value. The hit set comes from the
    pruned stored postings (no corpus scan to FIND matches); only the
    (query-bounded) candidate ids broadcast-join back to the docs
    table for the facet column — the same candidate-bounded
    stored-field fetch shape as highlighting.

    ``missing`` is the ES terms-agg ``missing`` parameter: hits whose
    facet value is NULL count under that substitute bucket; without
    it they are EXCLUDED from the buckets entirely (ES's default —
    docs without the field simply don't aggregate)."""
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    hit_side = _bounded_broadcast(hits)
    facet = (
        F.coalesce(F.col(facet_col), F.lit(missing))
        if missing is not None
        else F.col(facet_col)
    ).alias(facet_col)
    joined = hit_side.join(docs.select(id_col, facet), id_col)
    if missing is None:
        joined = joined.filter(F.col(facet_col).isNotNull())
    # ES terms-agg include/exclude: regexes ANCHORED to the whole
    # value (Lucene's convention — same anchoring law as the regexp
    # query); exclude wins on overlap, exactly ES
    if include is not None:
        joined = joined.filter(
            F.col(facet_col).cast("string").rlike(f"^(?:{include})$")
        )
    if exclude is not None:
        joined = joined.filter(
            ~F.col(facet_col).cast("string").rlike(f"^(?:{exclude})$")
        )
    return (
        joined
        .groupBy(facet_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col(facet_col).asc())
        .limit(k)
    )


def top_hits_by_facet(
    index: PostingsIndex,
    docs: DataFrame,
    query_terms: list[str],
    facet_col: str,
    hits_per_bucket: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``terms`` aggregation with a ``top_hits`` sub-aggregation:
    for every facet value in the hit set, the ``hits_per_bucket`` best
    docs by BM25. Returns ``(facet, rank, id, score_q20)``.

    Plan shape: the (query-bounded) scored candidates broadcast-join
    to the docs table for the facet column — the stored-field fetch
    shape — then ONE window over the candidate set partitioned by
    facet; the corpus is never shuffled, and the window input is
    hit-set-sized."""
    from pyspark.sql.window import Window

    id_col = index.id_col
    scored = _bm25_scored(index, query_terms, k1, b)
    w = Window.partitionBy(facet_col).orderBy(
        F.col("score_q20").desc(), F.col(id_col).asc()
    )
    return (
        _bounded_broadcast(scored)
        .join(docs.select(id_col, facet_col), id_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= hits_per_bucket)
        .select(
            F.col(facet_col).alias("facet"),
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            "score_q20",
        )
    )


def search_facets_after(
    index: PostingsIndex,
    docs: DataFrame,
    query_terms: list[str],
    facet_col: str,
    size: int = 10,
    after: str | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation over the hit set: facet buckets in
    the facet-key total order with ``after``-key cursor pagination —
    the aggregation twin of search_after (stateless deep paging over
    buckets, no scroll context). Returns ``(facet, n_docs)`` sorted by
    facet, strictly after the cursor.

    Unlike the ranked ``search_facets`` (count-desc, needs the full
    facet table to rank), the composite order is the GROUP KEY itself,
    so each page aggregates only buckets after the cursor and every
    page is the same bounded probe — that is exactly why ES offers
    composite for deep bucket pagination."""
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    hit_side = _bounded_broadcast(hits)
    buckets = (
        hit_side
        .join(docs.select(id_col, facet_col), id_col)
        .filter(
            F.col(facet_col) > F.lit(after) if after is not None else F.lit(True)
        )
        .groupBy(facet_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        buckets.select(F.col(facet_col).alias("facet"), "n_docs")
        .orderBy(F.col("facet").asc())
        .limit(size)
    )


def suggest_terms(
    index: PostingsIndex, term: str, k: int = 5, max_dist: int | None = None
) -> DataFrame:
    """ES term suggester (did-you-mean): dictionary terms within
    ``max_dist`` edits of ``term`` ranked the way ES ranks suggestions
    — closer first, then more frequent (document frequency from the
    stored postings), then lexicographic. Returns
    ``(term, dist, df)``. Candidates come from the same FastSS
    variant probe as fuzzy search; their df from the
    term-bucket-pruned postings probe — a few candidate terms' rows,
    no corpus or full-dictionary scan. ``max_dist`` defaults to the
    index's stored variant depth."""
    max_dist = index.variant_depth if max_dist is None else max_dist
    cands = expand_fuzzy_terms(index, [term], max_dist)
    spark = index.postings.sparkSession
    if not cands:
        return spark.createDataFrame([], "term STRING, dist INT, df LONG")
    dfreq = (
        index.live_postings_for(cands)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit(term)).cast("int")
        )
    )
    return dfreq.select("term", "dist", "df").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    ).limit(k)


def significant_terms(
    index: PostingsIndex,
    query_terms: list[str],
    m: int = 10,
    min_fg_df: int = 2,
) -> DataFrame:
    """ES ``significant_terms`` aggregation: terms OVERREPRESENTED in
    the hit set relative to the corpus, scored with ES's JLH
    (``(fg% - bg%) * (fg% / bg%)``), query terms excluded, Q20
    fixed point. Returns ``(term, fg_df, bg_df, jlh_q20)``.

    Since round 14 this is ``significant_text`` at its jlh default
    with the historical column name — ONE scorer implementation
    (the review found two verbatim copies drifting); see
    ``significant_text`` for the plan shape and the heuristic dial."""
    return significant_text(
        index, query_terms, m=m, min_fg_df=min_fg_df, heuristic="jlh"
    ).withColumnRenamed("score_q20", "jlh_q20")


def significant_text(
    index: PostingsIndex,
    query_terms: list[str],
    m: int = 10,
    min_fg_df: int = 2,
    heuristic: str = "jlh",
) -> DataFrame:
    """ES ``significant_text`` aggregation: the free-text twin of
    ``significant_terms`` — "what words are unusual in this slice" —
    with the significance HEURISTIC dial dispatched (``jlh`` default,
    ``chi_square``, ``percentage``). ES re-analyzes hit text on the
    fly because text fields have no fielddata; here the analyzed
    tokens are already STORED (the forward relation), so the
    aggregation runs index-only — same stats, no re-analysis, no raw
    text.

    Heuristics, per term, from the exact contingency counts fg_df
    (hit docs containing it), n_fg, bg_df (corpus docs), n_docs —
    each one double expression Q20-floored (the cross-engine law):

    * ``jlh``: ``(fg% - bg%) * (fg% / bg%)`` — ES's default blend of
      absolute and relative change.
    * ``chi_square``: ES's ChiSquare with include_negatives=false and
      background_is_superset=true — the out-set contingency
      ``a=fg_df, b=n_fg-a, c=bg_df-a, d=(n_docs-n_fg)-c`` scored
      ``(ad - bc)^2 (a+b+c+d) / ((a+b)(c+d)(b+d)(a+c))``; terms LESS
      common in the slice than outside drop (include_negatives=false).
    * ``percentage``: ``fg_df / bg_df`` — the naive dial ES offers
      when commonness should not be rewarded at all.

    Returns ``(term, fg_df, bg_df, score_q20)`` top-``m``.
    ``filter_duplicate_text`` is NOT implemented — near-duplicate
    suppression belongs to the dedup operators; raise upstream rather
    than approximate. Plan shape identical to ``significant_terms``:
    pruned probe -> broadcast-or-shuffle hit join on the forward
    relation, one background aggregation over stored postings (the
    global-ordinals pass ES pays too)."""
    if heuristic not in ("jlh", "chi_square", "percentage"):
        raise ValueError(
            f"unsupported significant_text heuristic {heuristic!r} "
            "(supported: jlh, chi_square, percentage — gnd/"
            "mutual_information need log tables this engine doesn't "
            "pin cross-engine)"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    n_fg = hits.count()
    if n_fg == 0:
        return index.postings.sparkSession.createDataFrame(
            [], "term STRING, fg_df LONG, bg_df LONG, score_q20 LONG"
        )
    hit_side = hits if n_fg > 2_000_000 else F.broadcast(hits)
    fg = (
        index.live_forward()
        .join(hit_side, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(
            (F.col("fg_df") >= min_fg_df)
            & ~F.col("term").isin(sorted(set(query_terms)))
        )
    )
    bg = index.live_postings().groupBy("term").agg(
        F.count(F.lit(1)).alias("bg_df")
    )
    joined = fg.join(bg, "term")
    if heuristic == "jlh":
        fgp = F.col("fg_df") / F.lit(float(n_fg))
        bgp = F.col("bg_df") / F.lit(float(index.n_docs))
        score = (fgp - bgp) * (fgp / bgp)
    elif heuristic == "chi_square":
        a = F.col("fg_df").cast("double")
        b = F.lit(float(n_fg)) - a
        c = (F.col("bg_df") - F.col("fg_df")).cast("double")
        d = F.lit(float(index.n_docs - n_fg)) - c
        # squared via multiplication, not pow(): pow's libm rounding
        # is not pinned cross-engine; x*x is one IEEE multiply in both
        diff = a * d - b * c
        score = (
            diff * diff * (a + b + c + d)
            / ((a + b) * (c + d) * (b + d) * (a + c))
        )
        # include_negatives=false: a term LESS frequent in the slice
        # than outside is not "significant here"
        joined = joined.filter(
            F.col("fg_df") * F.lit(float(index.n_docs - n_fg))
            > (F.col("bg_df") - F.col("fg_df")) * F.lit(float(n_fg))
        )
    else:  # percentage
        score = F.col("fg_df") / F.col("bg_df")
    return (
        joined.withColumn(
            "score_q20", F.floor(score * Q20).cast("long")
        )
        .orderBy(F.col("score_q20").desc(), F.col("term").asc())
        .limit(m)
    )


def suggest_completion(
    index: PostingsIndex,
    prefix: str,
    k: int = 5,
) -> DataFrame:
    """ES ``completion`` suggester: search-box autocomplete — dictionary
    terms starting with ``prefix`` ranked by popularity. ES serves this
    from a dedicated FST field with author-supplied weights; this
    engine's dictionary IS the live postings, so the weight is the
    term's document frequency (the popularity signal ES users most
    often feed in as the weight anyway) and duplicates are impossible
    by construction (``skip_duplicates`` is the free default). The
    prefix normalizes through the analyzer's character pipeline —
    the same ``Analyzer.normalize`` contract query_string bases use.
    Returns ``(suggestion, weight)`` top-``k`` by (weight desc,
    suggestion asc).

    Plan shape: one dictionary scan with the prefix pushed as a
    StartsWith filter, a term-level aggregation (query-bounded
    output), TakeOrderedAndProject."""
    if not prefix:
        raise ValueError("completion suggester needs a non-empty prefix")
    base = prefix
    if index.analyzer is not None:
        base = index.analyzer.normalize_base_py(prefix)
        if not base:
            raise ValueError(
                f"completion prefix {prefix!r} normalizing to nothing"
            )
    return (
        index.live_postings()
        .filter(F.col("term").startswith(base))
        .groupBy(F.col("term").alias("suggestion"))
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("suggestion").asc())
        .limit(int(k))
    )


def es_analyze(index: PostingsIndex, text: str) -> list[dict]:
    """ES ``_analyze`` API: run one text through the index's stored
    analysis chain and return the token stream —
    ``[{"token", "position"}, ...]`` with Lucene position semantics
    (dropped tokens — stopwords, punctuation-only, contracted
    synonym slots — leave GAPS, which is exactly why phrase queries
    honor them). The one-string-in / token-list-out shape is the
    real endpoint's: a driver-side operation on a single request
    string, never a corpus job. This is the debugging window into
    the ingest/query analysis invariant — what you see here is
    byte-identical to what both sides indexed and probed."""
    if index.analyzer is None:
        slots = str(text).split(" ")
    else:
        an = index.analyzer
        raw = an.split_py(str(text))
        slots = (
            an.apply_tokens_py(raw)
            if an.has_phrase_rules
            else [an.apply_py(t) for t in raw]
        )
    return [
        {"token": t, "position": i}
        for i, t in enumerate(slots) if t != ""
    ]


def percolate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    broadcast_threshold: int = 2_000_000,
    analyzer=None,
) -> DataFrame:
    """ES percolator — search REVERSED: the queries are stored, and
    each incoming document is matched against all of them (alerting,
    saved searches, routing rules). ``queries`` is
    ``(query_id, terms array<string>, min_match int)`` — min_match =
    size(terms) is a conjunctive (bool-must) percolation, 1 is
    disjunctive, anything between is minimum_should_match. Returns
    ``(id, query_id, n_matched)`` for every (document, query) pair
    where at least ``min_match`` of the query's terms occur in the
    document.

    Plan shape: the query table explodes to (query_id, term) —
    query-table-sized, never corpus-sized — and broadcasts to the
    documents' DISTINCT (id, term) pairs, so the corpus is tokenized
    once and never shuffled on anything but the final (id, query_id)
    aggregation, whose cardinality is match-bounded. A query table too
    large to broadcast falls back to a shuffle join on the term (the
    search_facets escape hatch). ``analyzer`` tokenizes the documents
    through the same chain the stored queries were registered against
    (percolation's ingest/query invariant runs in reverse: the DOC is
    the query-time input); ``None`` keeps the legacy exact split."""
    qterms = queries.select(
        "query_id",
        "min_match",
        F.explode(F.array_distinct("terms")).alias("term"),
    )
    from pycasselastic_spark.operators.search_index import analyze_tokens

    dterms = docs.select(
        F.col(id_col),
        F.explode(analyze_tokens(text_col, analyzer)).alias("term"),
    ).filter(F.col("term") != "").distinct()
    # threshold on the EXPLODED (query_id, term) row count — what is
    # actually broadcast — not the query-table row count, which
    # underestimates by the terms-per-query factor (round-9 advisor
    # finding: 1.9M queries x 50 terms is a 95M-row broadcast)
    q_side = (
        F.broadcast(qterms)
        if qterms.count() <= broadcast_threshold
        else qterms
    )
    return (
        dterms.join(q_side, "term")
        .groupBy(id_col, "query_id", "min_match")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("min_match"))
        .select(id_col, "query_id", F.col("n_matched").cast("long"))
    )


def highlight_snippets(
    index: PostingsIndex,
    docs: DataFrame,
    text_col: str,
    query_terms: list[str],
    window: int = 5,
) -> DataFrame:
    """ES-style highlighting: for every doc matching any query term,
    the FIRST match position and a ``window``-token snippet starting
    there: ``(id, first_pos, n_hit_terms, snippet)``.

    The candidate set and positions come from the pruned stored
    postings (no corpus scan to FIND matches); only the candidates
    join back to the raw text to cut the snippet — candidate-bounded
    work, the same shape Lucene uses (stored-field fetch per hit).

    The snippet cut is ANALYZER-AWARE (round-10 advisor finding): the
    stored positions are slot indices into the index's tokenizer
    split, so the raw text re-splits with the SAME ``split_regex``
    (slot semantics — dropped tokens kept their slot at ingest) before
    slicing; a legacy index keeps the historical single-space split.
    The snippet shows the RAW tokens at those slots — highlighting
    displays source text, only the offsets come from analysis."""
    id_col = index.id_col
    split_pat = index.analyzer.split_regex if index.analyzer else " "
    postings = index.live_postings_for(query_terms)
    firsts = postings.groupBy(id_col).agg(
        F.min(F.array_min("positions")).alias("first_pos"),
        F.count(F.lit(1)).alias("n_hit_terms"),
    )
    c = F.col(text_col)
    # explicit broadcast: the candidate side's size estimate passes
    # through an aggregation, so relying on the optimizer's auto
    # threshold would make the corpus-side scan-without-shuffle plan
    # scale-dependent (round-8 verdict nit)
    return F.broadcast(firsts).join(docs, id_col).select(
        F.col(id_col),
        "first_pos",
        "n_hit_terms",
        F.array_join(
            F.slice(F.split(c, split_pat), F.col("first_pos") + 1, window),
            " ",
        ).alias("snippet"),
    )


def hybrid_rrf_search(
    index: PostingsIndex,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id,
    k: int = 10,
    k_rrf: int = 60,
    n_text: int = 50,
    n_knn: int = 50,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> DataFrame:
    """ES hybrid search with reciprocal rank fusion (the 8.8+ ``rrf``
    retriever, the standard RAG retrieval pattern): fuse a lexical
    BM25 top-``n_text`` with a vector kNN top-``n_knn`` by
    score = Σ 1/(k_rrf + rank) over the legs a doc appears in.
    Ranks, not scores, are fused — RRF's whole point is that the two
    legs' score scales never need calibrating. Returns
    ``(id, rrf_q20, text_rank, knn_rank)`` top-``k``
    (absent-leg ranks are NULL, contributing 0).

    Determinism: each leg's rank comes from a total order with the id
    tiebreak — the text leg on quantized (score_q20 desc, id), the
    kNN leg on (cosine desc, id) where the cosine arithmetic is the
    bit-replayable unit-normalize + sequential dot the similarity
    operators pin — and the fused double is two exact small-integer
    reciprocals added in fixed order, floored once to Q20.

    Plan shape: both legs are bounded — the text leg is the pruned
    postings probe, the kNN leg broadcasts ONE query vector over the
    embeddings scan — and the fusion is a full outer join of two
    ≤ n-row relations."""
    from pyspark.sql.window import Window

    from pycasselastic_spark.operators.similarity import dot, with_unit_vector

    id_col = index.id_col
    # top-n FIRST via orderBy().limit() — TakeOrderedAndProject's
    # per-partition heaps — so the rank window (single-partition by
    # construction: a global rank) only ever sorts ≤ n_text rows, not
    # the whole hit set
    text = (
        _bm25_scored(index, query_terms, 1.2, 0.75)
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(n_text)
        .withColumn(
            "text_rank",
            F.row_number().over(
                Window.orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
            ),
        )
        .select(F.col(id_col), "text_rank")
    )
    # single-query kNN: score the whole corpus against ONE broadcast
    # vector and take top-n via orderBy().limit() — the same
    # TakeOrderedAndProject shape as the text leg. brute_force_topk's
    # partition-by-query window distributes across MANY queries but
    # would funnel a one-query corpus into a single window partition.
    q = with_unit_vector(
        embeddings.filter(F.col(emb_id_col) == query_vec_id),
        emb_vec_col,
        "_qu",
    ).select("_qu")
    c = with_unit_vector(embeddings, emb_vec_col, "_cu").select(
        F.col(emb_id_col).alias("match_id"), "_cu"
    )
    knn = (
        c.join(F.broadcast(q), F.col("match_id") != F.lit(query_vec_id))
        .withColumn("cosine", dot(F.col("_qu"), F.col("_cu")))
        .orderBy(F.col("cosine").desc(), F.col("match_id").asc())
        .limit(n_knn)
        .withColumn(
            "knn_rank",
            F.row_number().over(
                Window.orderBy(F.col("cosine").desc(), F.col("match_id").asc())
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


def suggest_phrase(
    index: PostingsIndex,
    phrase_terms: list[str],
    k: int = 3,
    max_dist: int = 1,
) -> DataFrame:
    """ES phrase suggester (did-you-mean for whole phrases): each
    input term expands to its dictionary neighborhood (the stored
    FastSS probe + exact-levenshtein verify, like the term suggester),
    and candidate phrases are ranked by how often they actually occur
    IN ORDER in the corpus — a misspelled "fsat tabel" suggests
    "fast table" because that bigram is frequent, not because each
    word is individually close. Returns
    ``(suggestion, n_occurrences, dist_sum)`` ordered by
    (occurrences desc, total edit distance asc, suggestion asc),
    top ``k``.

    Plan shape: per-slot candidate sets are dictionary-neighborhood
    probes (query-bounded); occurrence counting is the phrase probe's
    position-adjacency chain join over ONLY the candidate terms'
    postings, counting every chain instance corpus-wide. No corpus
    tokenization, no raw text."""
    id_col = index.id_col
    cands = [
        expand_fuzzy_terms(index, [t], max_dist) for t in phrase_terms
    ]
    spark = index.postings.sparkSession
    if any(not c for c in cands):
        return spark.createDataFrame(
            [], "suggestion STRING, n_occurrences LONG, dist_sum LONG"
        )
    all_terms = sorted({t for c in cands for t in c})
    postings = index.live_postings_for(all_terms)
    slots = [
        postings.filter(F.col("term").isin(c)).select(
            F.col(id_col),
            F.col("term"),
            F.explode("positions").alias("pos"),
        )
        for c in cands
    ]
    chain = slots[0].select(
        id_col,
        F.col("pos").alias("p_prev"),
        F.col("term").alias("suggestion"),
        F.levenshtein(F.col("term"), F.lit(phrase_terms[0])).alias("dist_sum"),
    )
    for q, nxt in zip(phrase_terms[1:], slots[1:]):
        chain = (
            chain.join(nxt, id_col)
            .filter(F.col("pos") == F.col("p_prev") + 1)
            .select(
                id_col,
                F.col("pos").alias("p_prev"),
                F.concat_ws(" ", "suggestion", "term").alias("suggestion"),
                (
                    F.col("dist_sum")
                    + F.levenshtein(F.col("term"), F.lit(q))
                ).alias("dist_sum"),
            )
        )
    return (
        chain.groupBy("suggestion", "dist_sum")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select(
            "suggestion",
            F.col("n_occurrences").cast("long"),
            F.col("dist_sum").cast("long"),
        )
        .orderBy(
            F.col("n_occurrences").desc(),
            F.col("dist_sum").asc(),
            F.col("suggestion").asc(),
        )
        .limit(k)
    )


def bm25_topk_filtered(
    index: PostingsIndex,
    query_terms: list[str],
    filters: list,
    k: int = 10,
    min_match: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES bool query with a FILTER context: BM25 relevance over the
    ``query_terms`` hit set, restricted to docs whose stored
    DOC-VALUES satisfy every predicate — range and term filters that
    never affect the score, exactly ES's non-scoring filter clauses.
    ``filters`` is a list of ``(field, op, value)`` with op in
    ``>= <= > < = !=``; ``min_match`` sets the scoring-side hit
    requirement (len(query_terms) = the bool-must conjunction, 1 =
    disjunctive). Returns ``(id, n_hit_terms, score_q20)``.

    Plan shape: the scored candidates come from the usual pruned
    postings probe; the filter side is a scan of the stored doc-values
    relation with every predicate PUSHED into the columnar parquet
    scan (ES pays the same doc_values walk for an uncached filter) —
    the two meet in a hash join whose build side is the
    (query-bounded) scored set via the same count-guarded broadcast as
    every candidate fetch. No raw docs frame is touched: the index
    answers filtered search entirely from stored state."""
    _OPS = {
        ">=": lambda c, v: c >= v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        "<": lambda c, v: c < v,
        "=": lambda c, v: c == v,
        "!=": lambda c, v: c != v,
        # null-safe not-equal (ES not/must_not term filters KEEP
        # missing-field docs — plain != would drop them)
        "!=~": lambda c, v: ~c.eqNullSafe(v),
        # ES exists query in filter context (value ignored)
        "exists": lambda c, v: c.isNotNull(),
    }
    id_col = index.id_col
    dv = index.live_docvalues()
    for field, op, value in filters:
        if op == "nested":
            # ES nested query in FILTER context: value is the
            # per-element condition list of ``search_nested`` — the
            # same stored doc-values scan gains one JVM-side exists()
            # predicate, so relevance + nested filtering stays a
            # single candidate-bounded plan
            if field not in index.nested_fields:
                raise ValueError(
                    f"field {field!r} is not a declared nested field "
                    f"(nested_fields={index.nested_fields})"
                )
            conds = list(value)

            # factory closure, NOT a default-arg second parameter:
            # PySpark's higher-order exists() inspects the callable's
            # arity and would treat a 2-arg function as the
            # (element, index) form, binding the index Column to the
            # would-be default
            def _mk_elem_pred(conds_):
                def elem_pred(e):
                    pred = None
                    for sub, cop, cval in conds_:
                        if cop not in _OPS or cop in ("exists", "nested"):
                            raise ValueError(
                                f"unsupported nested filter op {cop!r}"
                            )
                        c = _OPS[cop](e[sub], F.lit(cval))
                        pred = c if pred is None else (pred & c)
                    return pred

                return elem_pred

            dv = dv.filter(F.exists(dv_col(field), _mk_elem_pred(conds)))
            continue
        if field not in index.stored_fields:
            raise ValueError(
                f"field {field!r} is not stored in this index's "
                f"doc values (stored_fields={index.stored_fields})"
            )
        if op not in _OPS:
            raise ValueError(f"unsupported filter op {op!r}")
        dv = dv.filter(_OPS[op](dv_col(field), F.lit(value)))
    scored = _bm25_scored(index, query_terms, k1, b).filter(
        F.col("n_hit_terms") >= min_match
    )
    return (
        dv.select(id_col)
        .join(_bounded_broadcast(scored), id_col)
        .select(id_col, "n_hit_terms", "score_q20")
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def search_stats_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
) -> DataFrame:
    """ES ``stats`` metric aggregation over the hit set, served from
    STORED doc-values: one row ``(n_docs, min_val, max_val, sum_val,
    avg_q20)`` for the given numeric field across every doc matching
    ANY query term. The average is Q20-quantized (the cross-engine
    float law); min/max/sum are exact.

    Plan shape: hit ids from the pruned postings probe (query-bounded,
    count-guarded broadcast) join the doc-values scan pruned to
    (id, field) — column pruning reaches the parquet scan — then ONE
    partial-aggregated reduction to a single row. No raw docs frame,
    no corpus shuffle."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    return (
        dv.join(_bounded_broadcast(hits), id_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(dv_col(field)).alias("min_val"),
            F.max(dv_col(field)).alias("max_val"),
            F.sum(dv_col(field)).cast("long").alias("sum_val"),
            F.floor(F.avg(dv_col(field)) * Q20).cast("long").alias("avg_q20"),
        )
    )


def _span_near_rel(
    index: PostingsIndex, span_terms: list[str], slop: int
) -> DataFrame:
    """The in-order span_near SPAN RELATION ``(id, ps, pe)`` under
    Lucene's total-stretch law (end - start <= n_terms + slop - 1):
    the one position-chain construction every span combinator builds
    on (span_near itself, span_not includes, span_containing bigs —
    extracted round 14 after the review found three drifting copies).
    Every intermediate join is pruned by the stretch bound (positions
    only grow), so candidates stay bounded exactly like the per-gap
    phrase chain."""
    if len(span_terms) < 2:
        raise ValueError("span_near needs at least two clauses")
    id_col = index.id_col
    width = len(span_terms) + slop - 1  # max (end - start)
    postings = index.live_postings_for(sorted(set(span_terms)))
    per_term = {
        t: postings.filter(F.col("term") == t).select(
            F.col(id_col), F.explode("positions").alias("pos")
        )
        for t in set(span_terms)
    }
    chain = per_term[span_terms[0]].select(
        id_col, F.col("pos").alias("ps"), F.col("pos").alias("p_prev")
    )
    for t in span_terms[1:]:
        nxt = per_term[t].select(id_col, F.col("pos").alias("p_next"))
        chain = (
            chain.join(nxt, id_col)
            .filter(
                (F.col("p_next") > F.col("p_prev"))
                & (F.col("p_next") - F.col("ps") <= width)
            )
            .select(id_col, "ps", F.col("p_next").alias("p_prev"))
        )
    return chain.select(id_col, "ps", F.col("p_prev").alias("pe"))



def span_near_search(
    index: PostingsIndex,
    span_terms: list[str],
    slop: int = 0,
    in_order: bool = True,
) -> DataFrame:
    """ES ``span_near`` (in_order form) from STORED positions — the
    proximity primitive legal/patent search builds on: the span terms
    must occur IN ORDER within a window of ``n_terms + slop`` total
    positions (Lucene's span law: the whole match may STRETCH by at
    most ``slop`` intervening positions, unlike match_phrase+slop's
    per-gap bound — 'a x x b c' matches span_near([a,b,c], slop=2)
    but not phrase slop=1). Returns ``(id, n_spans)`` with n_spans =
    distinct start positions opening at least one valid span.
    ``in_order=False`` raises by name (unordered spans need interval
    algebra this join chain doesn't implement).

    Plan shape: the shared ``_span_near_rel`` position chain (every
    intermediate join pruned by the stretch bound), then one
    distinct + reduction."""
    if not in_order:
        raise ValueError(
            "span_near in_order=false is not implemented (unordered "
            "span interval algebra) — raise rather than approximate"
        )
    id_col = index.id_col
    rel = _span_near_rel(index, span_terms, slop)
    return (
        rel.select(id_col, "ps")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def span_first_search(
    index: PostingsIndex,
    term: str,
    end: int,
) -> DataFrame:
    """ES ``span_first``: the term must occur within the FIRST ``end``
    positions of the document (title-ish boosting without a separate
    field — Lucene's SpanFirstQuery: span end <= end, i.e. 0-based
    position <= end - 1). Returns ``(id, n_hits)`` with n_hits = the
    number of qualifying occurrences.

    Plan shape: ONE pruned postings probe; the position bound is a
    JVM-side array filter over the stored position list — no explode
    of non-qualifying positions, no joins."""
    if end < 1:
        raise ValueError(f"span_first end must be >= 1, got {end}")
    id_col = index.id_col
    postings = index.live_postings_for([term])
    n_q = F.size(
        F.filter(F.col("positions"), lambda p: p <= F.lit(end - 1))
    )
    return (
        postings.select(F.col(id_col), n_q.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .select(id_col, F.col("n_hits").cast("long"))
    )


def _span_term_rel(index: PostingsIndex, terms: list[str]) -> DataFrame:
    """The span relation of one or more ``span_term`` clauses:
    ``(id, ps, pe)`` with ps = pe = each stored occurrence position —
    the Lucene Spans enumeration re-expressed relationally. ONE pruned
    postings probe for the whole term set; query-bounded."""
    if not terms:
        raise ValueError("span clause set analyzing to no terms")
    id_col = index.id_col
    postings = index.live_postings_for(sorted(set(terms)))
    return postings.select(
        F.col(id_col), F.explode("positions").alias("ps")
    ).withColumn("pe", F.col("ps"))


def span_or_search(
    index: PostingsIndex,
    clause_terms: list[str],
) -> DataFrame:
    """ES ``span_or``: the UNION of its clauses' spans (Lucene
    SpanOrQuery) — here over span_term clauses, so the spans are the
    occurrence positions of ANY listed term. Returns ``(id,
    n_spans)`` with n_spans = distinct union spans per doc — the same
    response shape as the other span probes, so the combinators
    compose.

    Plan shape: ONE pruned postings probe covering every clause term
    (the union is free — one IN filter), explode positions, distinct
    (identical spans from duplicate clauses collapse, exactly
    Lucene's ordered-spans dedup), one reduction."""
    spans = _span_term_rel(index, clause_terms)
    id_col = index.id_col
    return (
        spans.select(id_col, "ps", "pe")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def span_not_search(
    index: PostingsIndex,
    include_terms: list[str],
    exclude_terms: list[str],
    pre: int = 0,
    post: int = 0,
    include_slop: int | None = None,
) -> DataFrame:
    """ES ``span_not``: include spans that do NOT overlap any exclude
    span (Lucene SpanNotQuery) — 'alpha near beta but not when gamma
    intervenes'. ``pre``/``post`` widen the exclusion window by that
    many positions before/behind each exclude span (ES's pre/post
    dials; ``dist`` is pre=post=dist). The include is either the
    span_or of ``include_terms`` (single-position spans) or, with
    ``include_slop`` set, the span_near chain over them (in-order,
    total-stretch law — spans ``[p_start, p_end]``). Returns ``(id,
    n_spans)`` = surviving include spans per doc.

    Plan shape: two query-bounded span relations; the exclusion is a
    LEFT ANTI join on (same doc, interval overlap) — the exclude side
    is a pruned probe of the exclude terms only, never the corpus;
    then the same distinct + reduction as every span probe."""
    if pre < 0 or post < 0:
        raise ValueError(f"span_not pre/post must be >= 0 ({pre}, {post})")
    id_col = index.id_col
    if include_slop is None:
        inc = _span_term_rel(index, include_terms)
    else:
        inc = _span_near_rel(index, include_terms, include_slop)
    exc = _span_term_rel(index, exclude_terms).select(
        F.col(id_col).alias("_xid"),
        (F.col("ps") - F.lit(int(pre))).alias("xs"),
        (F.col("pe") + F.lit(int(post))).alias("xe"),
    )
    survivors = inc.join(
        exc,
        (F.col(id_col) == F.col("_xid"))
        & (F.col("ps") <= F.col("xe"))
        & (F.col("pe") >= F.col("xs")),
        "left_anti",
    )
    return (
        survivors.select(id_col, "ps", "pe")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def span_containing_search(
    index: PostingsIndex,
    big_terms: list[str],
    big_slop: int,
    little_terms: list[str],
    within: bool = False,
) -> DataFrame:
    """ES ``span_containing`` / ``span_within`` (Lucene
    SpanContainingQuery / SpanWithinQuery): ``span_containing``
    returns BIG spans (a span_near over ``big_terms`` with the
    total-stretch law) that enclose at least one LITTLE span (a
    span_term/span_or position); ``within=True`` flips the return
    side — LITTLE spans enclosed by at least one big span. Enclosure
    is Lucene's: big.start <= little.start AND little.end <= big.end.
    Returns ``(id, n_spans)`` — the shared span-probe shape.

    Plan shape: the big side is the span_near position chain (every
    intermediate join pruned by the stretch bound), the little side
    one pruned probe; the containment test is ONE semi join on
    (same doc, interval enclosure) — both sides query-bounded."""
    if len(big_terms) < 2:
        raise ValueError(
            "span_containing/within big side needs a span_near of at "
            "least two clauses (a one-term big span cannot strictly "
            "contain anything beyond itself — use span_or)"
        )
    id_col = index.id_col
    big = _span_near_rel(index, big_terms, big_slop)
    little = _span_term_rel(index, little_terms)
    if within:
        keep, other = little, big
    else:
        keep, other = big, little
    other = other.select(
        F.col(id_col).alias("_oid"),
        F.col("ps").alias("_ops"), F.col("pe").alias("_ope"),
    )
    if within:
        # little kept iff SOME big encloses it
        cond = (
            (F.col(id_col) == F.col("_oid"))
            & (F.col("_ops") <= F.col("ps"))
            & (F.col("pe") <= F.col("_ope"))
        )
    else:
        # big kept iff it encloses SOME little
        cond = (
            (F.col(id_col) == F.col("_oid"))
            & (F.col("ps") <= F.col("_ops"))
            & (F.col("_ope") <= F.col("pe"))
        )
    return (
        keep.join(other, cond, "left_semi")
        .select(id_col, "ps", "pe")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def search_multi_terms_agg(
    index: PostingsIndex,
    query_terms,
    fields: list[str],
    k: int = 10,
) -> DataFrame:
    """ES ``multi_terms`` aggregation (7.12+): buckets keyed by the
    COMBINATION of several doc-values fields — the group-by-composite
    the plain terms agg can't express ("per (source, lang): hit
    count"). Docs missing ANY key field are excluded (exactly ES).
    Returns the key columns + ``n_docs``, ordered by (count desc,
    keys asc), top ``k``.

    Plan shape: hit ids join ONE column-pruned doc-values scan
    carrying every key field, then a single partial-aggregated
    multi-key groupBy + TakeOrderedAndProject."""
    if len(fields) < 2:
        raise ValueError("multi_terms needs at least two fields")
    for f in fields:
        if f not in index.stored_fields:
            raise ValueError(
                f"field {f!r} is not stored in this index's doc values "
                f"(stored_fields={index.stored_fields})"
            )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(
        F.col(id_col), *[dv_col(f) for f in fields]
    )
    out = dv.join(_bounded_broadcast(hits), id_col)
    for f in fields:
        out = out.filter(dv_col(f).isNotNull())
    return (
        out.groupBy(*[dv_col(f) for f in fields])
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(
            F.col("n_docs").desc(),
            *[dv_col(f).asc() for f in fields],
        )
        .limit(k)
    )


def search_metric_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
    metric: str,
) -> DataFrame:
    """ES single-METRIC aggregations over the hit set's stored
    doc-values — the ``avg`` / ``sum`` / ``min`` / ``max`` /
    ``value_count`` / ``missing`` request bodies (every one a
    real-world one-liner; ``stats`` bundles the first five but ES
    serves them individually and so does this). One row out, named by
    the metric: ``avg_q20`` (Q20-quantized, the cross-engine float
    law), ``sum_val`` (exact long for integral fields; fractional
    fields pre-quantize each value to Q20 and sum in INTEGER space —
    the order-independent rule), ``min_val`` / ``max_val`` (native
    type), ``value_count`` (non-NULL count), ``n_missing`` (docs in
    the hit set whose field is NULL — the ``missing`` agg).

    Plan shape: hit ids (term list or derived hit relation) join the
    column-pruned doc-values scan, ONE partial-aggregated reduction."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    joined = dv.join(_bounded_broadcast(hits), id_col)
    c = dv_col(field)
    if metric == "avg":
        agg = F.floor(F.avg(c) * Q20).cast("long").alias("avg_q20")
    elif metric == "sum":
        integral = dict(dv.dtypes)[field] in (
            "tinyint", "smallint", "int", "bigint",
        )
        agg = (
            F.sum(c).cast("long") if integral
            else F.sum(F.floor(c * Q20)).cast("long")
        ).alias("sum_val")
    elif metric == "min":
        agg = F.min(c).alias("min_val")
    elif metric == "max":
        agg = F.max(c).alias("max_val")
    elif metric == "value_count":
        agg = F.count(c).alias("value_count")
    elif metric == "missing":
        agg = F.sum(
            F.when(c.isNull(), 1).otherwise(0)
        ).cast("long").alias("n_missing")
    else:
        raise ValueError(
            f"unsupported metric aggregation {metric!r} (supported: "
            "avg/sum/min/max/value_count/missing)"
        )
    return joined.agg(agg)


def search_histogram_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``histogram`` aggregation over the hit set from STORED
    doc-values: fixed-``interval`` buckets keyed by
    ``floor((value - offset) / interval) * interval + offset`` (ES's
    exact bucket law with the grid-shift ``offset``), returning
    ``(bucket, n_docs)`` sorted by bucket. ``min_doc_count=0``
    synthesizes EMPTY buckets across the hit set's value span —
    the zero-gap rendering every distribution chart needs. Same plan
    shape as ``search_stats_agg`` with a two-column aggregation; the
    zero-fill is a local range scan sized by a one-row min/max reduction
    over bucket INDEXES (exact longs — the double bucket key is one
    identical multiply per engine), bounded by ES's
    ``search.max_buckets`` (65536) — a small interval over a wide-range
    field raises ``ValueError`` by name instead of exploding a
    billion-row grid (ES throws too_many_buckets_exception there)."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    if min_doc_count not in (0, 1):
        raise ValueError(
            f"histogram min_doc_count {min_doc_count!r} (0 or 1)"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    idx_col = F.floor(
        (dv_col(field) - F.lit(float(offset))) / F.lit(float(interval))
    ).cast("long").alias("_bidx")
    counts = (
        dv.join(_bounded_broadcast(hits), id_col)
        .filter(dv_col(field).isNotNull())
        .select(idx_col)
        .groupBy("_bidx")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    if min_doc_count == 0:
        # ES bounds bucket generation at search.max_buckets (65536) and
        # rejects the request past it; an unguarded sequence over a wide
        # span (interval=1.0 on an epoch-seconds field) would generate
        # billions of grid rows. One-row scalar reduction (the repo's
        # bounded-collect rule), then the grid is a local range scan —
        # the final plan no longer recomputes the span either.
        row = counts.agg(
            F.min("_bidx").alias("_lo"), F.max("_bidx").alias("_hi")
        ).collect()[0]
        lo, hi = row["_lo"], row["_hi"]
        if lo is not None:
            n_buckets = int(hi) - int(lo) + 1
            if n_buckets > MAX_HISTOGRAM_BUCKETS:
                raise ValueError(
                    f"histogram zero-fill spans {n_buckets} buckets, over "
                    f"the max_buckets bound {MAX_HISTOGRAM_BUCKETS} (ES's "
                    f"search.max_buckets); widen interval={interval!r} or "
                    f"use min_doc_count=1"
                )
            grid = counts.sparkSession.range(int(lo), int(hi) + 1).select(
                F.col("id").cast("long").alias("_bidx")
            )
            counts = grid.join(counts, "_bidx", "left").select(
                "_bidx",
                F.coalesce(F.col("n_docs"), F.lit(0)).cast("long")
                .alias("n_docs"),
            )
    return (
        counts.select(
            (F.col("_bidx").cast("double") * F.lit(float(interval))
             + F.lit(float(offset))).alias("bucket"),
            "n_docs",
        )
        .orderBy(F.col("bucket").asc())
    )


def search_sort_by_field(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
    ascending: bool = True,
    k: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``sort`` by a doc-values field: the top-``k`` hits ordered by
    the STORED field instead of relevance (ES disables scoring under a
    field sort unless track_scores — so does this). Returns
    ``(id, <field>)`` in (field, id) total order — the id tiebreak
    keeps pagination deterministic, exactly why ES requires one.

    ``after`` is the ``search_after`` cursor under this sort —
    ``(field_value, id)`` of the previous page's last hit: the page is
    the hits STRICTLY after that point in the (field, id) total order
    (ES's stateless deep paging, the field-sort twin of the score
    cursor ``bm25_search_after``).

    Plan shape: hit ids from the pruned postings probe (count-guarded
    broadcast) join the column-pruned doc-values scan — the cursor
    predicate rides that scan — then TakeOrderedAndProject —
    per-partition heaps over the hit set, no global sort, no docs
    frame."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    page = dv.join(_bounded_broadcast(hits), id_col)
    if after is not None:
        a_val, a_id = after
        nxt = (
            (dv_col(field) > F.lit(a_val))
            if ascending
            else (dv_col(field) < F.lit(a_val))
        )
        page = page.filter(
            nxt
            | ((dv_col(field) == F.lit(a_val)) & (F.col(id_col) > a_id))
        )
    order = dv_col(field).asc() if ascending else dv_col(field).desc()
    return page.orderBy(order, F.col(id_col).asc()).limit(k)


def search_exists(
    index: PostingsIndex,
    field: str,
    k: int = 10,
) -> DataFrame:
    """ES ``exists`` query: docs whose STORED doc-values ``field``
    holds a value (non-NULL) — how ES users find docs carrying an
    optional field at all (the reference's corpus was flat and fully
    populated, ``pyCassElastic.py:272-274``, but a migration corpus
    has sparse fields). ES scores every hit 1.0; with scores tied the
    page order is the id tiebreak, so the deterministic contract is
    ``(id)`` ascending, first ``k``. Returns ``(id,)``.

    Plan shape: ONE column-pruned doc-values scan with the
    ``IsNotNull(field)`` predicate PUSHED into the parquet scan (ES
    pays the same doc_values walk), then TakeOrderedAndProject — no
    postings, no docs frame, no shuffle."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    return (
        index.live_docvalues()
        .filter(dv_col(field).isNotNull())
        .select(id_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
    )


def search_ids(
    index: PostingsIndex,
    values: list,
    k: int = 10,
) -> DataFrame:
    """ES ``ids`` query: the LIVE docs among the given ids — the
    direct-GET batch lookup every sync pipeline issues to verify an
    upsert landed (the reference reads back by id after bulk writes,
    ``pyCassElastic.py:272-274``). Ids whose every copy is superseded
    do NOT match (they are deleted as far as search is concerned).
    Constant-score like ``exists``: returns ``(id,)`` ascending,
    first ``k``.

    Plan shape: the forward relation pruned to the ids' buckets
    (partition pruning + pushed ``id IN`` filter), superseded dropped
    by the standard broadcast anti-join, one distinct over a
    values-bounded set. Never touches postings or raw docs."""
    id_col = index.id_col
    return (
        index.live_forward_for(values)
        .select(id_col)
        .distinct()
        .orderBy(F.col(id_col).asc())
        .limit(k)
    )


def terms_set_search(
    index: PostingsIndex,
    query_terms: list[str],
    msm_field: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``terms_set`` query with ``minimum_should_match_field``:
    a doc matches when it contains at least N of the supplied terms,
    where N is read PER DOC from a stored numeric doc-values field —
    the "match enough of these skills/tags" query, whose threshold
    lives in the document, not the request. Matches score under this
    engine's BM25 law over the hit terms (ES scores terms_set like
    the equivalent bool/should); returns ``(id, n_hit_terms,
    score_q20)`` by (score desc, id asc), first ``k``.

    Plan shape: the usual pruned postings probe scores candidates
    (query-bounded); only those candidates broadcast-join to the
    column-pruned doc-values scan for the per-doc threshold, then the
    ``n_hit_terms >= threshold`` filter and TakeOrderedAndProject.
    A doc whose threshold field is NULL never matches (ES skips docs
    missing the msm field)."""
    if msm_field not in index.stored_fields:
        raise ValueError(
            f"field {msm_field!r} is not stored in this index's doc "
            f"values (stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    scored = _bm25_scored(index, query_terms, k1, b)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(msm_field))
    return (
        dv.join(_bounded_broadcast(scored), id_col)
        .filter(
            dv_col(msm_field).isNotNull()
            & (F.col("n_hit_terms") >= dv_col(msm_field))
        )
        .select(id_col, "n_hit_terms", "score_q20")
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


_DV_OPS = {
    "gte": lambda c, v: c >= v,
    "lte": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "lt": lambda c, v: c < v,
}


def search_dv_range(
    index: PostingsIndex,
    field: str,
    spec: dict,
    k: int = 10,
) -> DataFrame:
    """ES top-level ``range`` QUERY (not just filter context): docs
    whose stored doc-values ``field`` satisfies the gte/lte/gt/lt
    bounds. ES scores every hit a constant 1.0, so the deterministic
    page is the id tiebreak — ``(id,)`` ascending, first ``k``
    (exactly the ``exists`` contract with bounds instead of
    NULL-awareness).

    Plan shape: ONE column-pruned doc-values scan with every bound
    PUSHED into the parquet scan, then TakeOrderedAndProject — no
    postings, no docs frame, no join."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    extra = set(spec) - set(_DV_OPS)
    if extra:
        raise ValueError(f"unsupported range options {sorted(extra)}")
    id_col = index.id_col
    dv = index.live_docvalues()
    for op, fn in _DV_OPS.items():
        if op in spec:
            dv = dv.filter(fn(dv_col(field), F.lit(spec[op])))
    return (
        dv.select(id_col).orderBy(F.col(id_col).asc()).limit(k)
    )


def search_dv_terms(
    index: PostingsIndex,
    field: str,
    values: list,
    k: int = 10,
) -> DataFrame:
    """ES ``terms`` query over a STORED doc-values (keyword-style)
    field: docs whose field value is IN the given list — the
    filter-cache workhorse of every ES deployment. Constant-score like
    ``range``/``exists``: returns ``(id,)`` ascending, first ``k``.
    A ``terms`` query against the indexed TEXT field is a different
    semantic (analyzed OR-match) — callers want ``match``/``bool``
    there, and the stored-fields guard raises by name.

    Plan shape: one column-pruned doc-values scan with the IN-list
    pushed into parquet, then TakeOrderedAndProject."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields}); for the indexed "
            "text field use a match or bool query instead"
        )
    id_col = index.id_col
    return (
        index.live_docvalues()
        .filter(dv_col(field).isin(list(values)))
        .select(id_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
    )


def search_nested(
    index: PostingsIndex,
    path: str,
    conditions: list,
    k: int = 10,
) -> DataFrame:
    """ES ``nested`` query: docs where AT LEAST ONE element of a
    declared array-of-objects doc-values field satisfies EVERY
    condition — per-element semantics, the entire reason the nested
    type exists (a flattened mapping would match one condition on
    element A and another on element B: ES's cross-object leakage).
    ``conditions`` is a list of ``(subfield, op, value)`` with op in
    ``= != >= <= > <``, all evaluated on the SAME element.
    Constant-score like every pure filter query here: ``(id,)``
    ascending, first ``k``.

    Plan shape: one column-pruned doc-values scan; the existence test
    is a JVM-side higher-order ``exists()`` over the stored array —
    doc-sized work, no explode, no shuffle, no join, then
    TakeOrderedAndProject."""
    _OPS = {
        "=": lambda c, v: c == v,
        "!=": lambda c, v: c != v,
        ">=": lambda c, v: c >= v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        "<": lambda c, v: c < v,
    }
    if path not in index.nested_fields:
        raise ValueError(
            f"field {path!r} is not a declared nested field "
            f"(nested_fields={index.nested_fields}) — nested queries "
            "need the explicit nested mapping, exactly as in ES"
        )
    if not conditions:
        raise ValueError("nested query with no conditions")
    for _f, op, _v in conditions:
        if op not in _OPS:
            raise ValueError(f"unsupported nested op {op!r}")

    def elem_pred(e):
        pred = None
        for sub, op, value in conditions:
            c = _OPS[op](e[sub], F.lit(value))
            pred = c if pred is None else (pred & c)
        return pred

    id_col = index.id_col
    return (
        index.live_docvalues()
        .filter(F.exists(dv_col(path), elem_pred))
        .select(id_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
    )


def search_extended_stats_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
) -> DataFrame:
    """ES ``extended_stats`` over the hit set's stored doc-values: the
    ``stats`` row plus sum_of_squares / population variance / standard
    deviation — the dashboard's dispersion panel. One row
    ``(n_docs, min_val, max_val, sum_val, sum_sq, avg_q20, var_q20,
    std_q20)``.

    Determinism: INTEGRAL fields only (fractional fields raise — their
    Q20-prequantized squares overflow long). n, Σx and Σx² are exact
    BIGINTs; variance = (Σx² - (Σx)²/n)/n evaluated in IEEE double
    from those exact integers (identical rounding cross-engine),
    std = correctly-rounded sqrt of the same double, both Q20-floored.

    Plan shape: hit ids join the column-pruned doc-values scan, ONE
    partial-aggregated reduction to a single row."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    if dict(dv.dtypes)[field] not in (
        "tinyint", "smallint", "int", "bigint",
    ):
        raise ValueError(
            f"extended_stats over fractional field {field!r} "
            "(integral doc-values only — the exact-integer variance "
            "law doesn't extend)"
        )
    c = dv_col(field)
    base = (
        dv.join(_bounded_broadcast(hits), id_col)
        # ES extended_stats count is the number of VALUES (NULLs
        # excluded) and the variance divides by it
        .agg(
            F.count(c).alias("n_docs"),
            F.min(c).alias("min_val"),
            F.max(c).alias("max_val"),
            F.sum(c).cast("long").alias("sum_val"),
            F.sum(c * c).cast("long").alias("sum_sq"),
            F.floor(F.avg(c) * Q20).cast("long").alias("avg_q20"),
        )
    )
    var = (
        F.col("sum_sq").cast("double")
        - F.col("sum_val").cast("double")
        * F.col("sum_val").cast("double") / F.col("n_docs")
    ) / F.col("n_docs")
    return base.select(
        "n_docs", "min_val", "max_val", "sum_val", "sum_sq", "avg_q20",
        F.floor(var * Q20).cast("long").alias("var_q20"),
        F.floor(F.sqrt(var) * Q20).cast("long").alias("std_q20"),
    )


def search_rare_terms_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
    max_doc_count: int = 1,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the LONG TAIL the terms agg's
    size cap hides — buckets of the hit set's ``field`` doc-values
    holding at most ``max_doc_count`` docs, ordered count ASCENDING
    then value (ES's rarest-first contract). NULLs are excluded like
    the terms agg. Returns ``(bucket, n_docs)``.

    Plan shape: the SAME single reduction as the terms facet (hit ids
    join one column-pruned doc-values scan, one groupBy) with the
    rarity filter riding the aggregation output — ES implements this
    with a CuckooFilter to bound memory; here the bucket relation is
    exact and the filter is a post-aggregation predicate."""
    if not (int(max_doc_count) >= 1):
        raise ValueError(
            f"rare_terms max_doc_count {max_doc_count!r} (must be >= 1)"
        )
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    return (
        dv.join(_bounded_broadcast(hits), id_col)
        .filter(dv_col(field).isNotNull())
        .groupBy(dv_col(field).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") <= int(max_doc_count))
        .orderBy(F.col("n_docs").asc(), F.col("bucket").asc())
    )


def search_string_stats_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
) -> DataFrame:
    """ES ``string_stats`` metric aggregation over the hit set's
    stored string doc-values: one row ``(val_count, min_len, max_len,
    avg_len_q20, entropy_q20)`` — value count (NULLs excluded),
    length extrema, Q20-floored mean length, and the Shannon entropy
    of the aggregated CHARACTER distribution (ES's
    ``show_distribution`` source statistic).

    Determinism: entropy is transcendental, so the reduction follows
    the Q30 fixed-point law the bigram LM uses — per-character terms
    ``FLOOR(c*log2(c) * 2^30)`` are exact longs summed exactly
    (order-independent), and ``H = log2(T) - S / (T*2^30)`` is then
    evaluated once in IEEE double from exact integers (identical
    rounding cross-engine), Q20-floored.

    Plan shape: hit ids join the column-pruned doc-values scan; the
    length row is ONE partial-aggregated reduction; the entropy leg
    explodes values into characters (linear in hit-set character
    mass, the work entropy inherently needs) and reduces over the
    tiny per-character key space — two bounded aggregations, no
    corpus shuffle, crossed through broadcast scalars."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    vals = (
        index.live_docvalues()
        .select(F.col(id_col), dv_col(field).alias("_v"))
        .join(_bounded_broadcast(hits), id_col)
        .filter(F.col("_v").isNotNull())
        .select(F.col("_v").cast("string").alias("_v"))
    )
    lstats = vals.agg(
        F.count(F.lit(1)).cast("long").alias("val_count"),
        F.min(F.length("_v")).cast("long").alias("min_len"),
        F.max(F.length("_v")).cast("long").alias("max_len"),
        F.floor(F.avg(F.length("_v")) * Q20).cast("long")
         .alias("avg_len_q20"),
    )
    chars = (
        vals.select(F.explode(F.split("_v", "")).alias("ch"))
        # the empty-value edge: Spark's split('','') yields [''],
        # DuckDB's yields [] — drop the phantom so both agree
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("t"),
            F.sum(
                F.floor(F.col("c") * F.log2("c") * F.lit(float(1 << 30)))
                .cast("long")
            ).cast("long").alias("s_q30"),
        )
    )
    return lstats.crossJoin(F.broadcast(chars)).select(
        "val_count", "min_len", "max_len", "avg_len_q20",
        F.floor(
            (F.log2("t") - F.col("s_q30") / F.lit(float(1 << 30))
             / F.col("t")) * Q20
        ).cast("long").alias("entropy_q20"),
    )


_INTEGRAL_DV = ("tinyint", "smallint", "int", "bigint")


def matrix_stats_2d(
    df: DataFrame, field_a: str, field_b: str
) -> DataFrame:
    """ES ``matrix_stats`` for one field pair over any relation with
    two INTEGRAL numeric columns: one row ``(n_docs, mean_a_q20,
    mean_b_q20, var_a_q20, var_b_q20, cov_q20, corr_q20)``. Rows
    missing EITHER field are excluded (ES's default missing-handling
    for matrix_stats). Variance/covariance are the UNBIASED (n-1)
    estimators ES reports; correlation is Pearson.

    Determinism (the extended_stats law): n, Σa, Σb, Σa², Σb², Σab
    are exact BIGINTs (integral inputs only — fractional callers
    pre-quantize, e.g. the exact-cents law), every derived statistic
    is then one fixed IEEE-double expression over those exact
    integers (identical rounding cross-engine), Q20-floored. Callers
    own the no-overflow bound (|x|²·n < 2⁶³), same as
    extended_stats.

    Plan shape: ONE partial-aggregated reduction to a single row —
    map-side partial sums, no shuffle beyond the final combine."""
    for f in (field_a, field_b):
        if f not in df.columns:
            raise ValueError(
                f"matrix_stats field {f!r} not in the relation "
                f"(columns: {df.columns})"
            )
        if dict(df.dtypes)[f] not in _INTEGRAL_DV:
            raise ValueError(
                f"matrix_stats field {f!r} is {dict(df.dtypes)[f]} — "
                "INTEGRAL fields only (fractional fields pre-quantize, "
                "e.g. the exact-cents law; their float sums would be "
                "partitioning-dependent)"
            )
    a, b = F.col(field_a), F.col(field_b)
    sums = (
        df.filter(a.isNotNull() & b.isNotNull())
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(a).cast("long").alias("sa"),
            F.sum(b).cast("long").alias("sb"),
            F.sum(a * a).cast("long").alias("saa"),
            F.sum(b * b).cast("long").alias("sbb"),
            F.sum(a * b).cast("long").alias("sab"),
        )
    )
    # try_divide throughout: a DEGENERATE input (0 or 1 complete
    # rows) yields NULL statistics instead of an ANSI divide-by-zero
    # failure — the same small-sample law as search_t_test_agg
    div = F.try_divide
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    saa = F.col("saa").cast("double")
    sbb = F.col("sbb").cast("double")
    sab = F.col("sab").cast("double")
    var_a = div(saa - div(sa * sa, n), n - 1)
    var_b = div(sbb - div(sb * sb, n), n - 1)
    cov = div(sab - div(sa * sb, n), n - 1)
    q = F.lit(float(Q20))

    def q20(c):
        return F.floor(c * q).cast("long")

    return sums.select(
        F.col("n").alias("n_docs"),
        q20(div(sa, n)).alias("mean_a_q20"),
        q20(div(sb, n)).alias("mean_b_q20"),
        q20(var_a).alias("var_a_q20"),
        q20(var_b).alias("var_b_q20"),
        q20(cov).alias("cov_q20"),
        q20(div(cov, F.sqrt(var_a * var_b))).alias("corr_q20"),
    )


def search_matrix_stats_agg(
    index: PostingsIndex,
    query_terms,
    fields: list[str],
) -> DataFrame:
    """ES ``matrix_stats`` over the hit set's stored doc-values —
    the two-field form (ES's most common use: does metric A move
    with metric B inside this slice). Dispatch validates exactly two
    INTEGRAL stored fields; the law and plan are ``matrix_stats_2d``
    over the hit-joined, column-pruned doc-values scan."""
    if len(fields) != 2:
        raise ValueError(
            f"matrix_stats fields {fields!r} (the dispatched form is "
            "exactly two fields)"
        )
    for f in fields:
        if f not in index.stored_fields:
            raise ValueError(
                f"field {f!r} is not stored in this index's doc "
                f"values (stored_fields={index.stored_fields})"
            )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = (
        index.live_docvalues()
        .select(
            F.col(id_col),
            dv_col(fields[0]).alias("_a"),
            dv_col(fields[1]).alias("_b"),
        )
        .join(_bounded_broadcast(hits), id_col)
    )
    return matrix_stats_2d(dv, "_a", "_b")


def search_t_test_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
    filter_a: list,
    filter_b: list,
    test_type: str = "heteroscedastic",
) -> DataFrame:
    """ES ``t_test`` aggregation (the two-filter unpaired form): is
    the metric's mean different between two populations of the hit
    set. One row ``(n_a, n_b, mean_a_q20, mean_b_q20, t_stat_q20,
    df_q20)`` — Welch's statistic for ``heteroscedastic`` (ES's
    default) with the Welch-Satterthwaite df, pooled-variance
    Student's for ``homoscedastic`` (df = n_a + n_b - 2).

    DOCUMENTED DIVERGENCE from the ES response: ES reports the
    p-value (a t-distribution CDF lookup — an approximation
    evaluated in Java with no SQL-replayable law); this engine
    reports the exact test STATISTIC and df the CDF would consume.
    The decision content (|t| vs a critical value) is preserved;
    the approximation is not reproduced.

    Determinism: the extended_stats law — each population's n, Σx,
    Σx² are exact BIGINTs from INTEGRAL inputs (fractional fields
    raise; pre-quantize by the exact-cents law), sample variances
    and the statistic are ONE fixed IEEE-double expression over
    those exact ints, Q20-floored. ``paired`` raises (it needs a
    row-pairing key ES takes from _id adjacency — not a doc-values
    law).

    Plan shape: hit ids join ONE column-pruned doc-values scan;
    both populations reduce in a single conditional aggregation
    (map-side partials, no second scan, no shuffle beyond the final
    combine)."""
    if test_type not in ("heteroscedastic", "homoscedastic"):
        raise ValueError(
            f"t_test type {test_type!r} (supported: heteroscedastic, "
            "homoscedastic; paired needs a pairing key, not a "
            "doc-values law)"
        )
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues()
    ftype = dict(dv.select(dv_col(field).alias("_f")).dtypes)["_f"]
    if ftype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"t_test field {field!r} is {ftype} — INTEGRAL fields only "
            "(pre-quantize fractional metrics, the exact-cents law)"
        )
    from pycasselastic_spark.operators.search_compose import (
        _named_filter_conditions,
    )

    conds = dict(_named_filter_conditions(
        index, [("a", filter_a), ("b", filter_b)]
    ))
    x = dv_col(field)
    aggs = []
    for k, cond in conds.items():
        sel = cond & x.isNotNull()
        aggs += [
            F.sum(F.when(sel, 1).otherwise(0)).cast("long").alias(f"n_{k}"),
            F.sum(F.when(sel, x)).cast("long").alias(f"s_{k}"),
            F.sum(F.when(sel, x * x)).cast("long").alias(f"ss_{k}"),
        ]
    sums = dv.join(_bounded_broadcast(hits), id_col).agg(*aggs)
    # try_divide throughout: a DEGENERATE population (n < 2, or an
    # empty filter) yields NULL statistics instead of an ANSI
    # divide-by-zero failure — the documented small-sample law
    div = F.try_divide
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    ssa = F.col("ss_a").cast("double")
    ssb = F.col("ss_b").cast("double")
    ma, mb = div(sa, na), div(sb, nb)
    va = div(ssa - div(sa * sa, na), na - 1)   # sample variances
    vb = div(ssb - div(sb * sb, nb), nb - 1)
    q = F.lit(float(Q20))

    def q20(c):
        return F.floor(c * q).cast("long")

    if test_type == "heteroscedastic":
        se2_a, se2_b = div(va, na), div(vb, nb)
        t = div(ma - mb, F.sqrt(se2_a + se2_b))
        df = div(
            (se2_a + se2_b) * (se2_a + se2_b),
            div(se2_a * se2_a, na - 1) + div(se2_b * se2_b, nb - 1),
        )
    else:
        sp2 = div((na - 1) * va + (nb - 1) * vb, na + nb - 2)
        t = div(ma - mb, F.sqrt(sp2 * (div(F.lit(1.0), na)
                                       + div(F.lit(1.0), nb))))
        df = na + nb - 2
    return sums.select(
        F.col("n_a"), F.col("n_b"),
        q20(ma).alias("mean_a_q20"),
        q20(mb).alias("mean_b_q20"),
        q20(t).alias("t_stat_q20"),
        q20(df).alias("df_q20"),
    )
