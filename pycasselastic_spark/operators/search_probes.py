"""Query-side probes over the stored postings index: the BM25
scoring family (disjunctive / conjunctive / min_should_match /
search_after / multifield / bool / boosted / prefix / wildcard /
regexp / fuzzy / msearch), positional phrase probes, and per-document
views (explain, term vectors, more-like-this).

Split out of ``operators/search.py`` (round 10); the public surface is
re-exported there. Every probe here shares the same scale shape: pruned
partition scan (pbucket IN + pushed term filter) -> broadcast df join
-> one aggregation -> TakeOrderedAndProject (pinned in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import (
    Q20,
    PostingsIndex,
    _bounded_broadcast,
    _deletion_variants_py,
    _term_bucket_py,
)

def bm25_topk_indexed(
    index: PostingsIndex,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``bm25_topk`` against the STORED index: same scoring law, but
    the plan reads pruned postings partitions instead of tokenizing the
    corpus — no Generate/explode anywhere (pinned by test_plans).
    N and avgdl come from the incrementally-maintained stats file as
    literals; per-term df aggregates over the pruned postings (a few
    terms' rows). Returns ``(id, n_hit_terms, score_q20)``."""
    return _bm25_scored(index, query_terms, k1, b).orderBy(
        F.col("score_q20").desc(), F.col(index.id_col).asc()
    ).limit(k)


def _bm25_scored_raw(
    index: PostingsIndex, query_terms: list[str], k1: float, b: float
) -> DataFrame:
    """Unquantized BM25 ``(id, n_hit_terms, score_raw)`` for every doc
    matching any query term — kept raw so score-transforming layers
    (function_score) can multiply BEFORE the single Q20 floor."""
    id_col = index.id_col
    postings = index.live_postings_for(query_terms)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        postings.join(F.broadcast(dfreq), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(index.n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(index.avgdl))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("term_score").alias("score_raw"),
        )
    )


def _bm25_scored(
    index: PostingsIndex, query_terms: list[str], k1: float, b: float
) -> DataFrame:
    """Unranked BM25 scores ``(id, n_hit_terms, score_q20)`` for every
    doc matching any query term — the shared scoring core of the
    disjunctive / conjunctive / more-like-this probes."""
    return _bm25_scored_raw(index, query_terms, k1, b).select(
        F.col(index.id_col),
        "n_hit_terms",
        F.floor(F.col("score_raw") * Q20).cast("long").alias("score_q20"),
    )

def phrase_slop_search(
    index: PostingsIndex, phrase_terms: list[str], slop: int = 0
) -> DataFrame:
    """Ordered proximity match from STORED positions — the ES
    match_phrase(+slop) primitive, the last query shape that needed
    raw text. A document matches where the phrase terms appear in
    order with each gap ≤ ``slop + 1`` token slots (slop=0 = exact
    adjacency). Returns ``(id, n_hits)`` with n_hits = number of
    distinct start positions opening at least one valid chain.

    Plan shape: per-term position lists come from the SAME pruned
    postings probe as BM25 (partition-pruned scan), then k-1
    position-difference equi-joins on the doc id — each join's inputs
    are only the docs containing the rarer prefix, shrinking
    monotonically. The explodes here flatten a few query terms'
    position arrays (query-sized), not the corpus."""
    id_col = index.id_col
    postings = index.live_postings_for(list(set(phrase_terms)))
    per_term = {
        t: postings.filter(F.col("term") == t).select(
            F.col(id_col), F.explode("positions").alias("pos")
        )
        for t in set(phrase_terms)
    }
    chain = per_term[phrase_terms[0]].select(
        id_col, F.col("pos").alias("p_start"), F.col("pos").alias("p_prev")
    )
    for t in phrase_terms[1:]:
        nxt = per_term[t].select(id_col, F.col("pos").alias("p_next"))
        chain = (
            chain.join(nxt, id_col)
            .filter(
                (F.col("p_next") > F.col("p_prev"))
                & (F.col("p_next") - F.col("p_prev") <= 1 + slop)
            )
            .select(id_col, "p_start", F.col("p_next").alias("p_prev"))
        )
    return (
        chain.select(id_col, "p_start")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def conjunctive_filter(scored: DataFrame, n_terms: int) -> DataFrame:
    """ES ``bool.must`` semantics: keep only docs that matched ALL
    ``n_terms`` query terms (the scored relation already carries
    ``n_hit_terms``)."""
    return scored.filter(F.col("n_hit_terms") == n_terms)


def bm25_topk_min_should_match(
    index: PostingsIndex,
    query_terms: list[str],
    min_match: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``minimum_should_match``: BM25 top-``k`` over docs matching
    at least ``min_match`` of the query terms — the middle ground
    between the disjunctive (1) and conjunctive (all) probes. Same
    pruned-postings probe; the constraint is one filter on the per-doc
    hit count riding the existing aggregation, no extra shuffle."""
    scored = _bm25_scored(index, query_terms, k1, b)
    return (
        scored.filter(F.col("n_hit_terms") >= min_match)
        .orderBy(F.col("score_q20").desc(), F.col(index.id_col).asc())
        .limit(k)
    )


def bm25_search_after(
    index: PostingsIndex,
    query_terms: list[str],
    after_score_q20: int,
    after_id,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``search_after`` cursor pagination: the next ``k`` results
    STRICTLY after the (score_q20, id) sort cursor in the total order
    (score desc, id asc — the unique tiebreak makes the cursor
    unambiguous, exactly why ES requires a tiebreak sort field).
    Stateless deep paging: unlike from/size the probe re-ranks only
    matching docs and the filter prunes everything at or before the
    cursor — no scroll context server-side, same partition-pruned
    probe as page one."""
    scored = _bm25_scored(index, query_terms, k1, b)
    after = scored.filter(
        (F.col("score_q20") < F.lit(int(after_score_q20)))
        | (
            (F.col("score_q20") == F.lit(int(after_score_q20)))
            & (F.col(index.id_col) > F.lit(after_id))
        )
    )
    return after.orderBy(
        F.col("score_q20").desc(), F.col(index.id_col).asc()
    ).limit(k)


def bm25_topk_multifield(
    field_indexes: dict[str, PostingsIndex],
    boosts: dict[str, float],
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``multi_match`` in ``most_fields`` mode: each field is its
    own stored index (own df/dl/avgdl statistics — exactly how Lucene
    scores per-field), the per-field BM25 scores combine as a
    boost-weighted sum, and docs matching in ANY field rank. Returns
    ``(id, n_hit_terms, score_q20)`` where score_q20 =
    sum(boost_f * field_score_q20) in exact integer math (boosts are
    small integers by convention, keeping the Q20 determinism law) and
    n_hit_terms = max over fields.

    Plan shape: one pruned probe per field (each against its own
    term-bucket layout), combined by a full outer join on the doc id —
    field probe outputs are query-bounded, so the join is small; no
    corpus scan anywhere."""
    combined = None
    id_col = None
    for field, index in field_indexes.items():
        raw_boost = boosts.get(field, 1)
        if float(raw_boost) != int(raw_boost):
            # int() would silently truncate (2.5 -> 2; 0.5 -> 0 zeroes
            # the field), diverging from ES float-boost semantics with
            # no signal (round-9 advisor finding) — integer boosts are
            # the exact-Q20-arithmetic contract, so enforce it loudly
            raise ValueError(
                f"boost for field {field!r} must be integral (exact "
                f"Q20 integer arithmetic), got {raw_boost!r}"
            )
        boost = int(raw_boost)
        id_col = index.id_col
        scored = _bm25_scored(index, query_terms, k1, b).select(
            F.col(index.id_col),
            F.col("n_hit_terms").alias(f"hits_{field}"),
            (F.col("score_q20") * F.lit(boost)).alias(f"score_{field}"),
        )
        combined = (
            scored
            if combined is None
            else combined.join(scored, id_col, "full_outer")
        )
    fields = list(field_indexes)
    return combined.select(
        F.col(id_col),
        F.greatest(
            *[F.coalesce(F.col(f"hits_{f}"), F.lit(0)) for f in fields]
        ).alias("n_hit_terms"),
        sum(
            (F.coalesce(F.col(f"score_{f}"), F.lit(0)) for f in fields),
            F.lit(0),
        ).cast("long").alias("score_q20"),
    ).orderBy(F.col("score_q20").desc(), F.col(id_col).asc()).limit(k)


def bm25_topk_conjunctive(
    index: PostingsIndex,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k restricted to docs containing EVERY query term — the
    ES bool-must + relevance-sort shape. Same pruned-postings probe;
    the conjunctive constraint is one filter on the per-doc hit count
    (no extra shuffle: it rides the existing groupBy)."""
    scored = (
        bm25_topk_indexed(index, query_terms, k=2_147_483_647, k1=k1, b=b)
    )
    # re-apply top-k AFTER the conjunctive filter (limit-then-filter
    # would under-fill k); the plan is still TakeOrderedAndProject
    return (
        conjunctive_filter(scored, len(set(query_terms)))
        .orderBy(F.col("score_q20").desc(), F.col(index.id_col).asc())
        .limit(k)
    )


def _as_clauses(terms: list) -> list[list[str]]:
    """Normalize a bool-context term list to CLAUSES: a bare string is
    its own single-term clause (the historical flat-list form — each
    term independently required, unchanged behavior); a nested list is
    one multi-term clause (a ``match`` query's analyzed terms — ES
    default ``operator: OR``, satisfied when ANY of its terms hits)."""
    return [[c] if isinstance(c, str) else list(c) for c in terms]


def bm25_bool_query(
    index: PostingsIndex,
    must: list,
    should: list | None = None,
    must_not: list | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_should_match: int = 0,
) -> DataFrame:
    """The full ES ``bool`` query: every ``must`` CLAUSE must be
    satisfied, ``should`` terms add relevance without being required,
    and any ``must_not`` term excludes the doc outright. Returns
    ``(id, n_hit_terms, score_q20)`` — score over the must+should
    matches (must_not terms never contribute score, they only veto).

    Clause semantics (round-10 advisor finding): ``must`` elements are
    clauses — a bare string is a single-term clause (so the historical
    flat-term call is byte-identical: every term required), while a
    list of terms is ONE ``match`` clause, satisfied when ANY of its
    analyzed terms occurs (ES's default ``operator: OR`` inside a
    match — flattening it into per-term conjunction silently returned
    a strict subset of ES's results). Scoring is unchanged either way:
    BM25 sums over every matched scoring term, exactly how Lucene
    scores a bool query (per-clause sums of per-term scores).
    ``must_not`` flattens safely — a doc is vetoed iff ANY term of ANY
    must_not clause hits, which is term-set semantics.

    ``min_should_match`` is ES's BOOL-LEVEL ``minimum_should_match``:
    at least N of the ``should`` CLAUSES must be satisfied (a clause
    counts once however many of its terms hit). The default 0 keeps
    ES's own default in the presence of must clauses; should-only
    bodies already behave as msm=1 (a doc can only surface by
    matching a scoring term). The per-clause hit flags ride the same
    single aggregation as the must flags — no extra pass.

    Plan shape: ONE pruned postings probe fetches all three contexts'
    terms; scoring rows (must+should) flow through the same
    broadcast-df + single-aggregation pipeline as every other probe,
    with one conditional max PER MUST CLAUSE riding that groupBy
    (clause count is query-bounded); the veto is a broadcast anti-join
    against the (query-bounded) must_not doc list. No corpus access
    anywhere."""
    should = should or []
    must_not = must_not or []
    id_col = index.id_col
    must_clauses = _as_clauses(must)
    must_terms = {t for c in must_clauses for t in c}
    should_terms = {t for c in _as_clauses(should) for t in c}
    not_terms = {t for c in _as_clauses(must_not) for t in c}
    all_terms = sorted(must_terms | should_terms | not_terms)
    postings = index.live_postings_for(all_terms)
    scoring_terms = sorted(must_terms | should_terms)
    scoring = postings.filter(F.col("term").isin(scoring_terms))
    dfreq = scoring.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    clause_hits = [
        F.max(
            F.when(F.col("term").isin(sorted(set(c))), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias(f"_clause_{i}")
        for i, c in enumerate(must_clauses)
    ]
    should_clauses = _as_clauses(should) if min_should_match else []
    if min_should_match > len(should_clauses):
        raise ValueError(
            f"min_should_match={min_should_match} exceeds the "
            f"{len(should_clauses)} should clauses — no doc could match"
        )
    clause_hits += [
        F.max(
            F.when(F.col("term").isin(sorted(set(c))), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias(f"_should_{i}")
        for i, c in enumerate(should_clauses)
    ]
    scored = (
        scoring.join(F.broadcast(dfreq), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(index.n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(index.avgdl))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.floor(F.sum("term_score") * Q20).cast("long").alias("score_q20"),
            *clause_hits,
        )
    )
    for i in range(len(must_clauses)):
        scored = scored.filter(F.col(f"_clause_{i}") == 1)
    scored = scored.drop(*[f"_clause_{i}" for i in range(len(must_clauses))])
    if min_should_match:
        total = None
        for i in range(len(should_clauses)):
            c = F.col(f"_should_{i}")
            total = c if total is None else total + c
        scored = scored.filter(total >= min_should_match).drop(
            *[f"_should_{i}" for i in range(len(should_clauses))]
        )
    if must_not:
        vetoed = (
            postings.filter(F.col("term").isin(sorted(set(must_not))))
            .select(id_col)
            .distinct()
        )
        scored = scored.join(F.broadcast(vetoed), id_col, "left_anti")
    return scored.orderBy(
        F.col("score_q20").desc(), F.col(id_col).asc()
    ).limit(k)

def bm25_topk_boosted(
    index: PostingsIndex,
    term_boosts: dict[str, float],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES query-time per-term boosts (``match`` with ``boost``): each
    query term's BM25 contribution is scaled by its boost before the
    per-doc sum. Same pruned probe; the boosts ride the (broadcast,
    |query|-row) df join as one more column, and the single Q20 floor
    lands after the weighted sum — no extra shuffle, exact arithmetic
    the oracle replays."""
    id_col = index.id_col
    terms = sorted(term_boosts)
    postings = index.live_postings_for(terms)
    spark = postings.sparkSession
    boosts = spark.createDataFrame(
        [(t, float(w)) for t, w in sorted(term_boosts.items())],
        "term STRING, boost DOUBLE",
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(boosts), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(index.n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("boost")
            * F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(index.avgdl))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.floor(F.sum("term_score") * Q20).cast("long").alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_topk_prefix(
    index: PostingsIndex,
    prefix: str,
    k: int = 10,
    max_expansions: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``prefix`` query + relevance: expand the prefix to matching
    dictionary terms, then BM25 over the expansion (each term scored
    with its own df). Like ES (``index_prefixes`` absent), prefix
    expansion cannot use the term-partitioned layout — the md5 bucket
    hash scatters a prefix across every bucket — so the expansion
    scans the stored postings DICTIONARY (postings-sized, never raw
    text) with the ``startswith`` predicate pushed to parquet, and
    caps the expansion at ``max_expansions`` terms by (df desc, term)
    exactly like ES's rewrite cap. The scoring probe afterwards is
    the normal pruned-by-expanded-terms shape."""
    terms = prefix_expansion_terms(index, prefix, max_expansions)
    if not terms:
        return index.postings.sparkSession.createDataFrame(
            [], f"{index.id_col} LONG, n_hit_terms LONG, score_q20 LONG"
        )
    return bm25_topk_indexed(index, terms, k=k, k1=k1, b=b)


def prefix_expansion_terms(
    index: PostingsIndex, prefix: str, max_expansions: int = 50
) -> list[str]:
    """The prefix rewrite's expansion set: dictionary terms starting
    with ``prefix``, capped at ``max_expansions`` by (df desc, term) —
    ES's rewrite cap. Shared by the standalone prefix probe and the
    query_string prefix leaf."""
    dict_scan = (
        index.live_postings()
        .filter(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
    )
    return [r["term"] for r in dict_scan.collect()]


def _wildcard_to_like(pattern: str) -> str:
    """Translate an ES wildcard pattern (``*`` = any run, ``?`` = one
    char) to a SQL LIKE pattern, escaping LIKE's own metacharacters."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def bm25_topk_wildcard(
    index: PostingsIndex,
    pattern: str,
    k: int = 10,
    max_expansions: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``wildcard`` query + relevance (the scoring_boolean rewrite,
    matching our prefix probe): the pattern expands to matching
    dictionary terms capped at ``max_expansions`` by (df desc, term) —
    then BM25 over the expansion with per-term df. Like ES, a leading
    wildcard is the worst case: no prefix to seek on, so the expansion
    is a full DICTIONARY scan (stored postings, never raw text) with
    the LIKE predicate evaluated in the scan stage; the scoring probe
    afterwards is the normal pruned-by-expanded-terms shape."""
    like = _wildcard_to_like(pattern)
    dict_scan = (
        index.live_postings()
        .filter(F.col("term").like(like))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
    )
    terms = [r["term"] for r in dict_scan.collect()]
    if not terms:
        return index.postings.sparkSession.createDataFrame(
            [], f"{index.id_col} LONG, n_hit_terms LONG, score_q20 LONG"
        )
    return bm25_topk_indexed(index, terms, k=k, k1=k1, b=b)


def bm25_topk_regexp(
    index: PostingsIndex,
    pattern: str,
    k: int = 10,
    max_expansions: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``regexp`` query + relevance: like ES/Lucene the pattern is
    ANCHORED — it must match the WHOLE term — so the Spark-side
    ``rlike`` (unanchored by contract) is wrapped in ``^(?:...)$``.
    Expansion and scoring follow the wildcard probe exactly: dictionary
    terms matching the pattern, capped at ``max_expansions`` by
    (df desc, term), then BM25 over the expansion with per-term df.
    The expansion is honestly a full DICTIONARY scan (stored postings,
    never raw text) — same as ES, whose regexp automaton walks the
    whole term dictionary too."""
    anchored = f"^(?:{pattern})$"
    dict_scan = (
        index.live_postings()
        .filter(F.col("term").rlike(anchored))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
    )
    terms = [r["term"] for r in dict_scan.collect()]
    if not terms:
        return index.postings.sparkSession.createDataFrame(
            [], f"{index.id_col} LONG, n_hit_terms LONG, score_q20 LONG"
        )
    return bm25_topk_indexed(index, terms, k=k, k1=k1, b=b)


def match_phrase_prefix(
    index: PostingsIndex,
    phrase_terms: list[str],
    prefix: str,
    max_expansions: int = 50,
    slop: int = 0,
) -> DataFrame:
    """ES ``match_phrase_prefix``: the phrase's LAST position matches
    any dictionary term starting with ``prefix`` (search-as-you-type).
    Expansion follows ES exactly — the first ``max_expansions`` terms
    in term-dictionary (lexicographic) order, NOT by df. Returns
    ``(id, n_hits)`` like ``phrase_slop_search``.

    Plan shape: the fixed terms probe pruned postings partitions as
    usual; the prefix expansion scans the stored dictionary once
    (postings-sized, never raw text); the chain joins shrink
    monotonically exactly like the phrase probe, with the final step's
    position list unioned over the expansion terms."""
    if not phrase_terms:
        raise ValueError("match_phrase_prefix needs >= 1 fixed term")
    exp_scan = (
        index.live_postings()
        .filter(F.col("term").startswith(prefix))
        .select("term")
        .distinct()
        .orderBy(F.col("term").asc())
        .limit(max_expansions)
    )
    expansions = [r["term"] for r in exp_scan.collect()]
    id_col = index.id_col
    if not expansions:
        return index.postings.sparkSession.createDataFrame(
            [], f"{id_col} LONG, n_hits LONG"
        )
    all_terms = sorted(set(phrase_terms) | set(expansions))
    postings = index.live_postings_for(all_terms)
    chain = (
        postings.filter(F.col("term") == phrase_terms[0])
        .select(id_col, F.explode("positions").alias("pos"))
        .select(
            id_col, F.col("pos").alias("p_start"), F.col("pos").alias("p_prev")
        )
    )
    steps = [
        F.col("term") == t for t in phrase_terms[1:]
    ] + [F.col("term").isin(expansions)]
    for cond in steps:
        nxt = postings.filter(cond).select(
            id_col, F.explode("positions").alias("p_next")
        )
        chain = (
            chain.join(nxt, id_col)
            .filter(
                (F.col("p_next") > F.col("p_prev"))
                & (F.col("p_next") - F.col("p_prev") <= 1 + slop)
            )
            .select(id_col, "p_start", F.col("p_next").alias("p_prev"))
        )
    return (
        chain.select(id_col, "p_start")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def bm25_rescore(
    index: PostingsIndex,
    query_terms: list[str],
    rescore_terms: list[str],
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``rescore``: rerank only the top ``window_size`` hits of the
    cheap base query with a second (costlier) query — final score =
    query_weight * base + rescore_weight * secondary, docs outside the
    window keep their base order below the window. Returns the top
    ``k`` of the window as ``(id, n_hit_terms, score_q20)``.

    Window selection happens in the QUANTIZED (score_q20, id) total
    order — the same deterministic cursor order as search_after — so
    the oracle replays the exact window membership; the weighted
    combine then runs on raw doubles with ONE Q20 floor at the end
    (function_score's one-floor rule). Plan shape: the secondary
    probe's (usually query-bounded) output broadcasts to the
    ≤ window_size-row window — the build side of a left-outer join
    must be the right side — so neither input shuffles corpus-side.
    The broadcast is count-guarded (``_bounded_broadcast``): a
    stop-word-frequency rescore term can produce a corpus-scale
    secondary set, where the probe degrades to a shuffle join instead
    of OOMing the driver (round-10 advisor finding — the last scored
    candidate set still broadcast unguarded)."""
    id_col = index.id_col
    base = _bm25_scored_raw(index, query_terms, k1, b).withColumn(
        "base_q20", F.floor(F.col("score_raw") * Q20).cast("long")
    )
    window = base.orderBy(
        F.col("base_q20").desc(), F.col(id_col).asc()
    ).limit(window_size)
    secondary = _bm25_scored_raw(index, rescore_terms, k1, b).select(
        F.col(id_col), F.col("score_raw").alias("rescore_raw")
    )
    return (
        window
        .join(_bounded_broadcast(secondary), id_col, "left")
        .select(
            F.col(id_col),
            "n_hit_terms",
            F.floor(
                (
                    F.col("score_raw") * F.lit(float(query_weight))
                    + F.coalesce(F.col("rescore_raw"), F.lit(0.0))
                    * F.lit(float(rescore_weight))
                )
                * Q20
            ).cast("long").alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )

def explain_score(
    index: PostingsIndex,
    doc_id,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``_explain``: the per-term BM25 score breakdown for ONE
    (document, query) pair — ``(term, tf, df, dl, idf_q20,
    term_score_q20)`` — so an operator can see WHY a document ranked
    where it did (which term contributed, its idf, its saturation).
    The quantized per-term contributions are each floored
    independently (this is a diagnostic view; the ranking probes floor
    once after the sum, so the explain rows bound but need not sum to
    the probe's score_q20 — same relationship as Lucene's explain vs
    its scorer).

    Plan shape: one pruned postings probe (pbucket IN + term filter)
    supplies df over the query's rows AND the target doc's tf/dl —
    query-bounded, no corpus scan, no raw text."""
    id_col = index.id_col
    postings = index.live_postings_for(query_terms)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    mine = postings.filter(F.col(id_col) == doc_id).select("term", "tf", "dl")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(index.n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(index.avgdl))
    )
    return mine.join(F.broadcast(dfreq), "term").select(
        "term",
        F.col("tf").cast("long"),
        F.col("df").cast("long"),
        F.col("dl").cast("long"),
        F.floor(idf * Q20).cast("long").alias("idf_q20"),
        F.floor(term_score * Q20).cast("long").alias("term_score_q20"),
    )


def term_vectors(index: PostingsIndex, doc_id) -> DataFrame:
    """ES ``_termvectors`` with ``term_statistics=true``: one
    document's terms with their in-doc tf and corpus-wide df, entirely
    from stored state. Two pruned probes — the FORWARD relation
    (ibucket partition pruning + pushed id filter) yields the doc's
    terms and tfs; those few terms then probe the postings for df the
    same way every BM25 query does. Raw text is never read."""
    id_col = index.id_col
    fwd = index.live_forward_for([doc_id]).select("term", "tf")
    terms = [r["term"] for r in fwd.select("term").distinct().collect()]
    if not terms:
        return index.postings.sparkSession.createDataFrame(
            [], "term STRING, tf LONG, df LONG"
        )
    dfreq = (
        index.live_postings_for(terms)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return fwd.join(F.broadcast(dfreq), "term").select(
        "term", F.col("tf").cast("long"), F.col("df").cast("long")
    )

def doc_top_terms(index: PostingsIndex, doc_id, m: int = 5) -> list[str]:
    """The doc's ``m`` highest-tf terms (ties broken by term) from the
    STORED forward relation — an id-bucket-pruned probe returning at
    most ``m`` strings to the driver (the same bounded-collect shape as
    the IVF centroid step; query terms must be literals for the
    postings probe's partition pruning anyway)."""
    rows = (
        index.live_forward_for([doc_id])
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(m)
        .collect()
    )
    return [r["term"] for r in rows]


def more_like_this(
    index: PostingsIndex,
    doc_id,
    m: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES's More-Like-This query from the stored index alone: take the
    source doc's top-``m`` terms (forward-index probe), BM25-score the
    corpus on them (postings probe), drop the source doc, return the
    top ``k``: ``(id, n_hit_terms, score_q20)``. Two pruned probes,
    zero corpus scans, zero raw-text access."""
    terms = doc_top_terms(index, doc_id, m)
    if not terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], f"{index.id_col} LONG, n_hit_terms LONG, score_q20 LONG"
        )
    return (
        _bm25_scored(index, terms, k1, b)
        .filter(F.col(index.id_col) != doc_id)
        .orderBy(F.col("score_q20").desc(), F.col(index.id_col).asc())
        .limit(k)
    )

def expand_fuzzy_terms(
    index: PostingsIndex, query_terms: list[str], max_dist: int = 1
) -> list[str]:
    """Dictionary terms within Levenshtein distance ``max_dist`` of
    ANY query term, from the STORED variant dictionary: generate the
    query terms' depth-``max_dist`` deletion neighborhoods in the
    driver (tiny), probe the variant-bucket-pruned dictionary with one
    equi-filter, verify the surviving candidate terms with exact
    ``levenshtein`` (the neighborhood join overmatches — up to
    distance ``max_dist + variant_depth``), and collect the matched
    terms — bounded by the dictionary neighborhood of a few query
    words. Exact matches ride the same probe (a term is in its own
    neighborhood). ``max_dist`` may not exceed the index's stored
    ``variant_depth`` (the FastSS recall bound needs both sides'
    neighborhoods at the target depth; a DEEPER dictionary than the
    query is fine — it only widens candidates the verify step then
    trims). ES fuzziness caps at 2, and so does the dictionary."""
    if max_dist > index.variant_depth:
        raise ValueError(
            f"max_dist={max_dist} exceeds this index's stored FastSS "
            f"variant_depth={index.variant_depth}; rebuild or compact "
            f"with variant_depth={max_dist}"
        )
    probe = {v for t in query_terms for v in _deletion_variants_py(t, max_dist)}
    buckets = sorted({_term_bucket_py(v, index.n_buckets) for v in probe})
    cand = (
        index.variants.filter(
            F.col("vbucket").isin(buckets)
            & F.col("variant").isin(sorted(probe))
        )
        .select("term")
        .distinct()
    )
    qdf = cand.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "q STRING"
    )
    verified = (
        cand.join(F.broadcast(qdf))
        # thresholded levenshtein (banded DP + early exit); identical
        # accept set — returns -1 iff the distance exceeds max_dist
        .filter(F.levenshtein(F.col("term"), F.col("q"), max_dist) != -1)
        .select("term")
        .distinct()
        .collect()
    )
    return sorted(r["term"] for r in verified)

def bm25_msearch(
    index: PostingsIndex,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``_msearch``: a batch of named queries answered in ONE pass
    over the index — the amortization story of batching: the postings
    probe, the df aggregation, and the scoring shuffle are paid once
    for the UNION of all query terms instead of once per query.
    Returns ``(query_id, id, n_hit_terms, score_q20, rank)`` — each
    query's BM25 top-``k`` in its own (score desc, id) order.

    Plan shape: one pruned probe over the union term set; per-term df
    is query-independent so it is computed once and shared; the
    (query_id, term) membership map is a broadcast literal; ranking is
    ONE window partitioned by query_id — the partitioning spreads the
    batch across the cluster, each partition holding one query's
    bounded candidate set."""
    from pyspark.sql.window import Window

    id_col = index.id_col
    pairs = [
        (qid, t)
        for qid in sorted(queries)
        for t in sorted(set(queries[qid]))
    ]
    all_terms = sorted({t for _, t in pairs})
    postings = index.live_postings_for(all_terms)
    spark = postings.sparkSession
    qmap = spark.createDataFrame(pairs, "query_id STRING, term STRING")
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qmap), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(index.n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(index.avgdl))
            ),
        )
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.floor(F.sum("term_score") * Q20).cast("long").alias("score_q20"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q20").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, "n_hit_terms", "score_q20",
            F.col("rank").cast("long"),
        )
    )

def bm25_topk_fuzzy(
    index: PostingsIndex,
    query_terms: list[str],
    k: int = 10,
    max_dist: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES fuzzy match + relevance sort: expand each query term to its
    dictionary neighbors within ``max_dist`` edits (stored FastSS
    variant probe), then BM25 over the expanded term set — each
    matched term scored with its own df, the ES ``fuzziness``
    semantics. A typo'd query still finds its documents without any
    corpus scan.

    The raw query terms always stay in the probe set (a term absent
    from the postings simply matches nothing): exact matching can
    therefore NEVER lag the dictionary, even when ingests deferred
    their variants write (``defer_variants=True``) and a
    first-seen-since-compaction term is not yet fuzzy-discoverable."""
    expanded = expand_fuzzy_terms(index, query_terms, max_dist)
    probe = sorted(set(expanded) | set(query_terms))
    return bm25_topk_indexed(index, probe, k=k, k1=k1, b=b)
