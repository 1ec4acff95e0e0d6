"""ES compound-scoring queries and metric aggregations over the stored
index: ``dis_max``, ``boosting``, ``constant_score`` (the reference's
own query idiom — ``pyCassElastic.py:366-397`` POSTs exactly
``constant_score.filter.and: [range{gte,lte}, not{term}]`` at ES every
sync cycle), and the ``percentiles`` / ``cardinality`` / ``range`` /
``date_histogram`` aggregations.

Determinism law shared with the rest of the search family: per-clause
BM25 scores are floored to Q20 integers FIRST, then compound scores
combine in integer space (max/sum/one float multiply + floor) — the
DuckDB oracles replay the identical arithmetic, so compound scoring
never stacks float-order noise.

Every plan here is candidate-bounded: postings probes are pruned to
the query terms' buckets, doc-values predicates push into the columnar
parquet scan, and small sides travel through the count-guarded
``_bounded_broadcast``. The corpus is never shuffled.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import (
    Q20,
    PostingsIndex,
    _bounded_broadcast,
    dv_col,
    hits_relation,
)
from pycasselastic_spark.operators.search_probes import (
    _bm25_scored,
    phrase_slop_search,
)

_DV_OPS = {
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    # null-safe not-equal: ES's not/must_not term filter KEEPS docs
    # whose field is missing (they can't match the term) — plain !=
    # would drop them
    "!=~": lambda c, v: ~c.eqNullSafe(v),
    "exists": lambda c, v: c.isNotNull(),
}


def dis_max_search(
    index: PostingsIndex,
    clauses: list[list[str]],
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``dis_max``: per-document score = the BEST clause's score
    plus ``tie_breaker`` times every other matching clause's score —
    the multi-field/multi-phrasing query that rewards the strongest
    signal instead of summing correlated ones (``bool.should`` adds;
    ``dis_max`` takes the max).

    Each clause is a term list (an analyzed match); scores combine in
    Q20 integer space: ``max_q20 + floor(tie_breaker * (sum_q20 -
    max_q20))`` — one float multiply between exact integers, replayed
    bit-identically by the SQL oracle. Returns
    ``(id, n_clauses, score_q20)``.

    Plan shape (the msearch amortization): ONE pruned postings probe
    over the union term set, per-term df computed once, the
    (clause, term) membership map a broadcast literal, then two
    partial-aggregated reductions — (clause, doc) then (doc). No
    per-clause re-probe, no corpus shuffle."""
    if not clauses:
        raise ValueError("dis_max needs at least one clause")
    id_col = index.id_col
    pairs = [
        (int(ci), t)
        for ci, clause in enumerate(clauses)
        for t in sorted(set(clause))
    ]
    all_terms = sorted({t for _, t in pairs})
    postings = index.live_postings_for(all_terms)
    spark = postings.sparkSession
    cmap = spark.createDataFrame(pairs, "clause_id INT, term STRING")
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    per_clause = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(cmap), "term")
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
        .groupBy("clause_id", id_col)
        .agg(
            F.floor(F.sum("term_score") * Q20).cast("long").alias("s_q20")
        )
    )
    return (
        per_clause.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_clauses"),
            F.max("s_q20").alias("max_q20"),
            F.sum("s_q20").alias("sum_q20"),
        )
        .select(
            F.col(id_col),
            F.col("n_clauses"),
            (
                F.col("max_q20")
                + F.floor(
                    F.lit(float(tie_breaker))
                    * (F.col("sum_q20") - F.col("max_q20"))
                ).cast("long")
            ).alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def boosting_search(
    index: PostingsIndex,
    positive_terms: list[str],
    negative_terms: list[str],
    negative_boost: float = 0.5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``boosting`` query: hits come ONLY from the positive match;
    any hit that also matches the negative query keeps its rank slot
    but with its score multiplied by ``negative_boost`` — demotion
    without exclusion (``must_not`` throws the doc away; ``boosting``
    keeps it cheap).

    Demotion happens on the already-Q20 positive score:
    ``floor(score_q20 * negative_boost)`` — one float multiply of an
    exact integer, oracle-replayable. Returns
    ``(id, n_hit_terms, score_q20)``.

    Plan shape: the positive side is the standard pruned scored probe;
    the negative side is a DISTINCT id set from its own pruned probe
    (query-bounded) that meets the positive set through the
    count-guarded broadcast left join. Neither side touches raw docs."""
    pos = _bm25_scored(index, positive_terms, k1, b)
    id_col = index.id_col
    neg_ids = (
        index.live_postings_for(negative_terms)
        .select(id_col)
        .distinct()
        .withColumn("_neg", F.lit(1))
    )
    return (
        pos.join(_bounded_broadcast(neg_ids), id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_hit_terms"),
            F.when(
                F.col("_neg").isNotNull(),
                F.floor(
                    F.col("score_q20") * F.lit(float(negative_boost))
                ).cast("long"),
            )
            .otherwise(F.col("score_q20"))
            .alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def constant_score_search(
    index: PostingsIndex,
    filters: list,
    boost: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """ES ``constant_score``: every doc passing the filter scores the
    flat ``boost`` — no relevance math, no df lookups. This is THE
    reference query: ``get_elasticsearch_latest``
    (``pyCassElastic.py:366-383``) wraps a version-column range in
    ``constant_score.filter`` each cycle, optionally appending the
    legacy ``not.term`` source guard (``:391-397``).

    ``filters`` is the ``(field, op, value)`` triple list shared with
    ``bm25_topk_filtered`` (range bounds, exact term, ``!=`` for the
    ``not.term`` form, ``exists``). Returns ``(id, score_q20)`` with
    score_q20 = floor(boost * Q20) on every row, paged by the id
    tiebreak (all scores tied — exactly ES).

    Plan shape: ONE column-pruned doc-values scan with every predicate
    PUSHED into the parquet scan, a literal score column, then
    TakeOrderedAndProject. No postings, no joins."""
    if not filters:
        raise ValueError("constant_score needs at least one filter")
    id_col = index.id_col
    dv = index.live_docvalues()
    for field, op, value in filters:
        if field not in index.stored_fields:
            raise ValueError(
                f"field {field!r} is not stored in this index's "
                f"doc values (stored_fields={index.stored_fields})"
            )
        if op not in _DV_OPS:
            raise ValueError(f"unsupported constant_score filter op {op!r}")
        dv = dv.filter(_DV_OPS[op](dv_col(field), F.lit(value)))
    # floor, not int(): int() truncates toward zero, which diverges
    # from the repo's floor-quantization law for fractional boosts
    # whose product isn't exactly representable (and for any negative
    # boost) — round-12 advisor finding
    score = math.floor(float(boost) * Q20)
    return (
        dv.select(
            F.col(id_col),
            F.lit(score).cast("long").alias("score_q20"),
        )
        .orderBy(F.col(id_col).asc())
        .limit(k)
    )


def _hit_docvalues(
    index: PostingsIndex, query_terms: list[str], field: str
) -> DataFrame:
    """Shared agg input: the hit set's stored doc-values for one field
    — pruned postings probe, count-guarded broadcast, column-pruned
    doc-values scan."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(F.col(id_col), dv_col(field))
    return dv.join(_bounded_broadcast(hits), id_col)


def search_percentiles_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
    percents: tuple[int, ...] = (25, 50, 75, 90),
) -> DataFrame:
    """ES ``percentiles`` aggregation over the hit set from STORED
    doc-values — EXACT linear-interpolated percentiles (ES's t-digest
    is an approximation forced by its segment architecture; a Spark
    reduction computes the exact answer in one pass, and Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the
    interpolation law). Values are Q20-quantized (the cross-engine
    float rule). Returns ``(pct, val_q20)`` rows sorted by pct.

    Plan shape: hit ids (pruned probe, count-guarded broadcast) join
    the column-pruned doc-values scan, ONE exact-percentile reduction
    to a single array row, then a bounded len(percents) explode."""
    fracs = ", ".join(f"{p / 100.0!r}D" for p in percents)
    one = _hit_docvalues(index, query_terms, field).agg(
        F.expr(f"percentile(`{field}`, array({fracs}))").alias("vals")
    )
    # an EMPTY hit set aggregates to vals=NULL and exploding NULL
    # would emit zero rows; ES returns one NULL value per requested
    # percentile (and so does the SQL oracle) — substitute the
    # all-NULL array so the row count is percents-stable
    nulls = F.array(
        *[F.lit(None).cast("double") for _ in percents]
    )
    one = one.select(F.coalesce(F.col("vals"), nulls).alias("vals"))
    pcts = F.array(*[F.lit(int(p)).cast("long") for p in percents])
    return (
        one.select(F.posexplode("vals").alias("pos", "val"))
        .select(
            F.element_at(pcts, F.col("pos").cast("int") + 1).alias("pct"),
            F.floor(F.col("val") * Q20).cast("long").alias("val_q20"),
        )
        .orderBy("pct")
    )


def search_boxplot_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
) -> DataFrame:
    """ES ``boxplot`` aggregation over the hit set from STORED
    doc-values: one row ``(n_vals, min_val, max_val, q1_q20, q2_q20,
    q3_q20)`` — min/max exact raw values (deterministic picks),
    quartiles EXACT linear-interpolated and Q20-quantized (ES's
    t-digest approximates this limit; Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the interpolation law — the same
    contract search_percentiles_agg pins). NULL metric values are
    excluded from every cell (ES's value-count law).

    Plan shape: hit ids (pruned probe, count-guarded broadcast) join
    the column-pruned doc-values scan, ONE reduction."""
    one = _hit_docvalues(index, query_terms, field).agg(
        F.count(dv_col(field)).cast("long").alias("n_vals"),
        F.min(dv_col(field)).alias("min_val"),
        F.max(dv_col(field)).alias("max_val"),
        F.expr(
            f"percentile(`{field}`, array(0.25D, 0.5D, 0.75D))"
        ).alias("_q"),
    )
    return one.select(
        "n_vals", "min_val", "max_val",
        F.floor(F.element_at("_q", 1) * Q20).cast("long").alias("q1_q20"),
        F.floor(F.element_at("_q", 2) * Q20).cast("long").alias("q2_q20"),
        F.floor(F.element_at("_q", 3) * Q20).cast("long").alias("q3_q20"),
    )


def search_facet_top_metrics(
    index: PostingsIndex,
    query_terms: list[str],
    facet_field: str,
    metric_field: str,
    sort_field: str,
    ascending: bool = False,
    order_by_bucket: bool = True,
) -> DataFrame:
    """ES ``top_metrics`` riding a ``terms`` aggregation: per bucket,
    the metric value carried by the doc at the TOP of a sort — "per
    source: the n_chars of the newest doc". ES breaks sort ties
    arbitrarily; this engine breaks them by id ascending so the
    answer is total-ordered and replayable (the same determinism
    upgrade every top-k here applies). Returns ``(bucket, n_docs,
    top_sort, top_metric)`` — the sort value rides along exactly as
    ES returns it.

    Plan shape: hit ids join ONE column-pruned doc-values scan
    carrying facet + sort + metric, then a single partial-aggregated
    max_by/min_by reduction — no window, no second pass. Docs with a
    NULL sort value cannot win (ES drops them from the sort)."""
    for f in (facet_field, metric_field, sort_field):
        if f not in index.stored_fields:
            raise ValueError(
                f"field {f!r} is not stored in this index's doc values "
                f"(stored_fields={index.stored_fields})"
            )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(
        F.col(id_col), dv_col(facet_field), dv_col(sort_field),
        dv_col(metric_field),
    )
    # total order: (sort, id) — for desc sort the winner maximizes
    # (sort, -id); negate the id so max_by stays one reduction
    key = F.struct(
        dv_col(sort_field).alias("s"),
        (-F.col(id_col)).alias("tb") if not ascending
        else F.col(id_col).alias("tb"),
    )
    pick = F.max_by if not ascending else F.min_by
    payload = F.struct(
        dv_col(sort_field).alias("sv"), dv_col(metric_field).alias("mv")
    )
    out = (
        dv.join(_bounded_broadcast(hits), id_col)
        .filter(dv_col(facet_field).isNotNull())
        .filter(dv_col(sort_field).isNotNull())
        .groupBy(dv_col(facet_field).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pick(payload, key).alias("_top"),
        )
        .select(
            "bucket", "n_docs",
            F.col("_top.sv").alias("top_sort"),
            F.col("_top.mv").alias("top_metric"),
        )
    )
    if order_by_bucket:
        out = out.orderBy(F.col("bucket").asc())
    return out


def search_cardinality_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
) -> DataFrame:
    """ES ``cardinality`` aggregation over the hit set: distinct count
    of a stored doc-values field — EXACT here (ES's HLL++ is
    approximate by design; the catalog's streaming/approx twins cover
    the sketch path, ``approx_distinct_stats_events``). Returns one
    row ``(cardinality,)``.

    Plan shape: hit ids join the column-pruned doc-values scan, then
    one partial-aggregated distinct count — the distinct's shuffle is
    bounded by the hit set, never the corpus."""
    return _hit_docvalues(index, query_terms, field).agg(
        F.countDistinct(dv_col(field)).alias("cardinality")
    )


def search_range_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
    ranges: list[dict],
) -> DataFrame:
    """ES ``range`` aggregation over the hit set: per-bucket doc
    counts for ``[{"from": a, "to": b}, ...]`` bounds — ``from``
    inclusive, ``to`` exclusive, either side open, buckets may overlap
    and EMPTY buckets are returned (all exactly ES). Bucket keys
    follow ES's ``a-b`` / ``*-b`` / ``a-*`` convention. Returns
    ``(bucket, n_docs)`` sorted by bucket key.

    Plan shape: one pass — every bucket is a conditional sum inside a
    SINGLE reduction over the hit set's doc-values (no per-bucket
    re-scan), then a bounded len(ranges) explode."""
    if not ranges:
        raise ValueError("range aggregation needs at least one range")
    hdv = _hit_docvalues(index, query_terms, field)
    col = dv_col(field)
    sums, keys = [], []
    for i, spec in enumerate(ranges):
        extra = set(spec) - {"from", "to"}
        if extra:
            raise ValueError(f"unsupported range agg options {sorted(extra)}")
        cond = F.lit(True)
        lo, hi = spec.get("from"), spec.get("to")
        if lo is not None:
            cond = cond & (col >= F.lit(lo))
        if hi is not None:
            cond = cond & (col < F.lit(hi))
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        keys.append(key)
        sums.append(
            F.sum(F.when(cond, 1).otherwise(0))
            .cast("long")
            .alias(f"_b{i}")
        )
    one = hdv.agg(*sums)
    buckets = F.array(
        *[
            F.struct(
                F.lit(k).alias("bucket"), F.col(f"_b{i}").alias("n_docs")
            )
            for i, k in enumerate(keys)
        ]
    )
    return (
        one.select(F.explode(buckets).alias("b"))
        .select("b.bucket", "b.n_docs")
        .orderBy("bucket")
    )


# calendar intervals served by DATE truncation (bucket keys are DATEs)
_CAL_INTERVALS = {"day": "day", "week": "week", "month": "month",
                  "quarter": "quarter", "year": "year"}
# the step each calendar bucket advances by when synthesizing empty
# buckets (min_doc_count=0)
_CAL_STEPS = {
    "hour": "interval 1 hour", "day": "interval 1 day",
    "week": "interval 7 days", "month": "interval 1 month",
    "quarter": "interval 3 months", "year": "interval 1 year",
}
_FIXED_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _parse_fixed_interval(spec: str) -> int:
    """ES ``fixed_interval`` string -> whole seconds (s/m/h/d units;
    sub-second intervals raise — the stored doc-values here carry at
    most second resolution)."""
    m = re.fullmatch(r"(\d+)(s|m|h|d)", str(spec))
    if not m or int(m.group(1)) == 0:
        raise ValueError(
            f"unsupported fixed_interval {spec!r} "
            "(supported: <n>s / <n>m / <n>h / <n>d)"
        )
    return int(m.group(1)) * _FIXED_UNITS[m.group(2)]


def search_date_histogram_agg(
    index: PostingsIndex,
    query_terms: list[str],
    field: str,
    calendar_interval: str | None = None,
    fixed_interval: str | None = None,
    min_doc_count: int = 1,
    extended_bounds: tuple | None = None,
) -> DataFrame:
    """ES ``date_histogram`` over the hit set from a STORED date /
    timestamp doc-values field — BOTH interval forms:

    * ``calendar_interval`` hour/day/week/month/quarter/year: buckets
      keyed by the calendar truncation (month -> first of month,
      week -> Monday, quarter -> quarter start). DATE keys, except
      ``hour`` which keys TIMESTAMPs — calendar units are
      variable-length, exactly why ES distinguishes the two forms.
    * ``fixed_interval`` ``<n>s/m/h/d``: epoch-floored fixed-width
      buckets (``floor(epoch / width) * width``), TIMESTAMP keys.

    ``min_doc_count=0`` synthesizes EMPTY buckets across the data
    span, and ``extended_bounds=(lo, hi)`` (ISO strings, or epoch
    seconds for the fixed form) widens that span even where no
    document falls — exactly ES's contract: bounds only take effect
    with min_doc_count=0, so passing them with the default 1 raises.
    Returns ``(bucket, n_docs)`` sorted by bucket.

    Plan shape: hit ids join the column-pruned doc-values scan, one
    two-column reduction; the empty-bucket synthesis is ONE
    generate-series from a one-row bounds reduction left-joining the
    counted buckets — series length = bucket count, never corpus."""
    if (calendar_interval is None) == (fixed_interval is None):
        raise ValueError(
            "date_histogram needs exactly one of calendar_interval / "
            "fixed_interval"
        )
    if extended_bounds is not None and min_doc_count != 0:
        raise ValueError(
            "date_histogram extended_bounds only takes effect with "
            "min_doc_count=0 (ES contract) — raise rather than ignore"
        )
    col = dv_col(field)
    if fixed_interval is not None:
        width = _parse_fixed_interval(fixed_interval)

        def to_bucket(c):
            return F.timestamp_seconds(
                (F.floor(c.cast("timestamp").cast("double") / width)
                 * width).cast("long")
            )

        step = f"interval {width} seconds"
    elif calendar_interval == "hour":
        def to_bucket(c):
            return F.date_trunc("hour", c.cast("timestamp"))

        step = _CAL_STEPS["hour"]
    else:
        if calendar_interval not in _CAL_INTERVALS:
            raise ValueError(
                f"unsupported calendar_interval {calendar_interval!r} "
                f"(supported: {sorted(_CAL_INTERVALS)} + 'hour')"
            )

        def to_bucket(c):
            return F.trunc(c, _CAL_INTERVALS[calendar_interval])

        step = _CAL_STEPS[calendar_interval]
    hdv = _hit_docvalues(index, query_terms, field)
    counts = (
        hdv.select(to_bucket(col).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    if min_doc_count != 0:
        return counts.orderBy(F.col("bucket").asc())
    # empty-bucket synthesis: one-row bounds reduction (data span
    # widened by the bucket-ALIGNED extended bounds), one
    # generate-series, left join the counts
    bounds = counts.agg(
        F.min("bucket").alias("dlo"), F.max("bucket").alias("dhi")
    )
    if extended_bounds is not None:
        lo_raw, hi_raw = extended_bounds
        if fixed_interval is not None:
            lo_lit = to_bucket(F.lit(int(lo_raw)).cast("timestamp"))
            hi_lit = to_bucket(F.lit(int(hi_raw)).cast("timestamp"))
        elif calendar_interval == "hour":
            lo_lit = to_bucket(F.lit(str(lo_raw)).cast("timestamp"))
            hi_lit = to_bucket(F.lit(str(hi_raw)).cast("timestamp"))
        else:
            lo_lit = to_bucket(F.lit(str(lo_raw)).cast("date"))
            hi_lit = to_bucket(F.lit(str(hi_raw)).cast("date"))
        bounds = bounds.select(
            F.least(F.coalesce(F.col("dlo"), lo_lit), lo_lit).alias("dlo"),
            F.greatest(F.coalesce(F.col("dhi"), hi_lit), hi_lit).alias("dhi"),
        )
    series = bounds.select(
        F.explode(F.expr(f"sequence(dlo, dhi, {step})")).alias("bucket")
    )
    return (
        series.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long")
            .alias("n_docs"),
        )
        .orderBy(F.col("bucket").asc())
    )


def multi_match_best_fields(
    field_indexes: dict[str, PostingsIndex],
    query_terms: list[str],
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``multi_match`` in ``best_fields`` mode — the DEFAULT
    multi_match type: the document's score is its BEST field's score
    plus ``tie_breaker`` times the other matching fields' (a dis_max
    across fields, exactly how ES compiles it). Complements the
    ``most_fields`` sum (``bm25_topk_multifield``). Each field is its
    own stored index with its own df/dl/avgdl statistics — the Lucene
    per-field scoring model. Returns ``(id, n_hit_terms, score_q20)``
    with n_hit_terms = the max over fields.

    Determinism law: per-field scores are already Q20 integers; max /
    sum / one DOUBLE multiply + floor combine them (BM25 Q20 scores
    are strictly positive, so COALESCE-to-0 is exact for both the max
    and the sum).

    Plan shape: one pruned probe per field (each against its own
    term-bucket layout) combined by a full outer join on the doc id —
    field outputs are query-bounded, no corpus scan."""
    if not field_indexes:
        raise ValueError("best_fields needs at least one field index")
    combined = None
    id_col = None
    fields = list(field_indexes)
    for field, index in field_indexes.items():
        id_col = index.id_col
        scored = _bm25_scored(index, query_terms, k1, b).select(
            F.col(index.id_col),
            F.col("n_hit_terms").alias(f"hits_{field}"),
            F.col("score_q20").alias(f"score_{field}"),
        )
        combined = (
            scored
            if combined is None
            else combined.join(scored, id_col, "full_outer")
        )
    s = [F.coalesce(F.col(f"score_{f}"), F.lit(0)) for f in fields]
    best = F.greatest(*s) if len(s) > 1 else s[0]
    total = sum(s[1:], s[0])
    return (
        combined.select(
            F.col(id_col),
            F.greatest(
                *[F.coalesce(F.col(f"hits_{f}"), F.lit(0)) for f in fields]
            ).alias("n_hit_terms"),
            (
                best
                + F.floor(
                    F.lit(float(tie_breaker)) * (total - best)
                ).cast("long")
            ).alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _phrase_field_scored(
    index: PostingsIndex,
    phrase_terms: list[str],
    slop: int,
    k1: float,
    b: float,
) -> DataFrame:
    """One field's Lucene PhraseQuery score under BM25Similarity:
    score = (Σ term idf) x pf(k1+1) / (pf + k1(1-b+b·dl/avgdl)),
    where pf is the phrase frequency (number of valid chain starts,
    ``phrase_slop_search``'s n_hits) — the phrase acts as ONE synthetic
    term whose idf is the terms' sum, exactly Lucene's PhraseWeight.
    Returns ``(id, score_q20)``.

    Determinism: per-term idfs floor to Q20 integers and sum in
    INTEGER space (order-independent), then divide by the power-of-two
    Q20 (exact) — so the idf sum never stacks float-order noise for
    any phrase length; the remaining arithmetic is one fixed
    expression over (pf, dl).

    Plan shape: the positional chain join (inputs bounded by the docs
    containing the rarest prefix), per-doc dl from the SAME pruned
    postings probe, and the idf sum a one-row broadcast."""
    id_col = index.id_col
    pf = phrase_slop_search(index, phrase_terms, slop=slop)
    postings = index.live_postings_for(sorted(set(phrase_terms)))
    dls = postings.select(F.col(id_col), "dl").distinct()
    idf_sum = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum(
                F.floor(
                    F.log(
                        F.lit(1.0)
                        + (F.lit(index.n_docs) - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    )
                    * Q20
                ).cast("long")
            ).alias("idf_sum_q20")
        )
    )
    return (
        pf.join(dls, id_col)
        .crossJoin(F.broadcast(idf_sum))
        .select(
            F.col(id_col),
            F.floor(
                (F.col("idf_sum_q20") / F.lit(float(Q20)))
                * (F.col("n_hits") * F.lit(k1 + 1))
                / (
                    F.col("n_hits")
                    + F.lit(k1)
                    * (
                        F.lit(1 - b)
                        + F.lit(b) * F.col("dl") / F.lit(index.avgdl)
                    )
                )
                * Q20
            ).cast("long").alias("score_q20"),
        )
    )


def multi_match_phrase(
    field_indexes: dict[str, PostingsIndex],
    phrase_terms: list[str],
    tie_breaker: float = 0.0,
    slop: int = 0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``multi_match`` in ``phrase`` mode: run ``match_phrase`` on
    every field and combine best_fields-style — the doc's score is its
    BEST field's phrase score plus ``tie_breaker`` times the others'
    (exactly how ES compiles type=phrase: a dis_max of per-field
    phrase queries). Each field is its own stored index with its own
    positions/df/dl/avgdl. Returns ``(id, score_q20)``.

    Determinism law shared with ``multi_match_best_fields``: per-field
    scores are already Q20 integers; max / sum / one DOUBLE multiply +
    floor combine them (phrase Q20 scores are strictly positive, so
    COALESCE-to-0 is exact).

    Plan shape: one positional chain probe per field (query-bounded)
    combined by a full outer join on the doc id — no corpus scan."""
    if not field_indexes:
        raise ValueError("multi_match phrase needs at least one field index")
    if len(phrase_terms) < 2:
        raise ValueError("multi_match phrase needs at least two terms")
    combined = None
    id_col = None
    fields = list(field_indexes)
    for field, index in field_indexes.items():
        id_col = index.id_col
        scored = _phrase_field_scored(index, phrase_terms, slop, k1, b).select(
            F.col(index.id_col),
            F.col("score_q20").alias(f"score_{field}"),
        )
        combined = (
            scored
            if combined is None
            else combined.join(scored, id_col, "full_outer")
        )
    s = [F.coalesce(F.col(f"score_{f}"), F.lit(0)) for f in fields]
    best = F.greatest(*s) if len(s) > 1 else s[0]
    total = sum(s[1:], s[0])
    return (
        combined.select(
            F.col(id_col),
            (
                best
                + F.floor(
                    F.lit(float(tie_breaker)) * (total - best)
                ).cast("long")
            ).alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def multi_match_bool_prefix(
    field_indexes: dict[str, PostingsIndex],
    text: str,
    tie_breaker: float = 0.0,
    max_expansions: int = 50,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``multi_match`` type=``bool_prefix`` — multi-field
    search-as-you-type WITHOUT position requirements: each field runs
    a ``match_bool_prefix`` (every analyzed token an optional clause,
    the LAST expanded as a prefix against THAT field's dictionary,
    capped at ``max_expansions`` by (df desc, term)), and the doc's
    score is its best field's plus ``tie_breaker`` times the others'
    — the best_fields combination over per-field bool_prefix queries,
    exactly how ES compiles the type. Returns ``(id, score_q20)``.

    Each field analyzes the text through its OWN stored chain and
    expands against its OWN dictionary (per-field df/dl/avgdl — the
    Lucene model); a field whose analysis or expansion comes up empty
    simply contributes nothing (ES's lenient multi-field behavior for
    the as-you-type case, where a half-typed token often misses a
    short field entirely).

    Plan shape: per-field dictionary expansion scans (postings-sized,
    pushed startswith) + one pruned scored probe per field, combined
    by full outer joins on the doc id — all query-bounded."""
    if not field_indexes:
        raise ValueError("bool_prefix needs at least one field index")
    combined = None
    id_col = None
    fields = []
    for field, index in field_indexes.items():
        id_col = index.id_col
        toks = index.analyze_text(text)
        if not toks:
            continue
        fixed, last = toks[:-1], toks[-1]
        from pycasselastic_spark.operators.search_probes import (
            prefix_expansion_terms,
        )

        scoring = fixed + prefix_expansion_terms(index, last, max_expansions)
        if not scoring:
            continue
        scored = _bm25_scored(index, scoring, k1, b).select(
            F.col(index.id_col),
            F.col("score_q20").alias(f"score_{field}"),
        )
        fields.append(field)
        combined = (
            scored
            if combined is None
            else combined.join(scored, id_col, "full_outer")
        )
    if combined is None:
        raise ValueError(
            f"bool_prefix text {text!r} analyzes/expands to no terms in "
            "any field"
        )
    s = [F.coalesce(F.col(f"score_{f}"), F.lit(0)) for f in fields]
    best = F.greatest(*s) if len(s) > 1 else s[0]
    total = sum(s[1:], s[0])
    return (
        combined.select(
            F.col(id_col),
            (
                best
                + F.floor(
                    F.lit(float(tie_breaker)) * (total - best)
                ).cast("long")
            ).alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def multi_match_cross_fields(
    field_indexes: dict[str, PostingsIndex],
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``multi_match`` in ``cross_fields`` mode — TERM-centric
    multi-field matching: each query term may match in ANY field, the
    term's score is its best field's (Lucene's BlendedTermQuery
    grouping), and document frequencies are BLENDED across fields
    (df(t) = max over fields of df_f(t)) so a term common in one field
    can't look artificially rare in another — the failure mode
    best_fields/most_fields have on entity names split across
    first_name/last_name-style fields. Per-doc score = Σ over terms of
    the per-term best-field score; n_hit_terms = distinct terms
    matched in any field. Returns ``(id, n_hit_terms, score_q20)``.

    Determinism: the per-(term, doc) best-field score is a max of
    doubles (order-independent), floored once to Q20; per-doc
    combination is an integer sum.

    Plan shape: one pruned probe per field unioned with a field tag
    (query-bounded), per-(field, term) df reduced then blended by a
    broadcast max join, two partial-aggregated reductions —
    (term, doc) then (doc). No corpus scan, no per-field re-probe."""
    if not field_indexes:
        raise ValueError("cross_fields needs at least one field index")
    n_docs = {index.n_docs for index in field_indexes.values()}
    if len(n_docs) != 1:
        raise ValueError(
            "cross_fields needs indexes over the SAME document set "
            f"(saw n_docs={sorted(n_docs)})"
        )
    n = n_docs.pop()
    id_col = None
    union = None
    for field, index in field_indexes.items():
        id_col = index.id_col
        part = index.live_postings_for(query_terms).select(
            F.col(index.id_col).alias("_id"),
            "term", "tf", "dl",
            F.lit(field).alias("_field"),
            F.lit(float(index.avgdl)).alias("_avgdl"),
        )
        union = part if union is None else union.unionByName(part)
    blended_df = (
        union.groupBy("term", "_field")
        .agg(F.count(F.lit(1)).alias("df_f"))
        .groupBy("term")
        .agg(F.max("df_f").alias("df"))
    )
    per_term_doc = (
        union.join(F.broadcast(blended_df), "term")
        .withColumn(
            "term_score",
            F.log(
                F.lit(1.0)
                + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))
            ),
        )
        .groupBy("term", "_id")
        .agg(
            F.floor(F.max("term_score") * Q20).cast("long").alias("s_q20")
        )
    )
    return (
        per_term_doc.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("s_q20").cast("long").alias("score_q20"),
        )
        .select(
            F.col("_id").alias(id_col), "n_hit_terms", "score_q20"
        )
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def search_facet_date_histogram_agg(
    index: PostingsIndex,
    query_terms,
    facet_field: str,
    date_field: str,
    calendar_interval: str,
) -> DataFrame:
    """ES ``terms`` aggregation carrying a ``date_histogram``
    SUB-aggregation — the time-series-dashboard request ("per source:
    monthly doc counts"): two-level buckets of the hit set's stored
    doc-values, keyed (facet, calendar-truncated date). NULL facet
    values are excluded (ES's default), empty date buckets omitted
    (min_doc_count=1 — the zero-fill form lives on the single-level
    agg). Returns ``(bucket, date_bucket, n_docs)`` sorted by
    (bucket, date_bucket).

    Plan shape: hit ids (term list or derived hit relation —
    ``hits_relation``) join ONE column-pruned doc-values scan carrying
    both fields, then a single partial-aggregated two-key groupBy —
    the nested bucket rides the same reduction, no second pass."""
    if calendar_interval not in _CAL_INTERVALS:
        raise ValueError(
            f"unsupported calendar_interval {calendar_interval!r} "
            f"(supported: {sorted(_CAL_INTERVALS)})"
        )
    for f in (facet_field, date_field):
        if f not in index.stored_fields:
            raise ValueError(
                f"field {f!r} is not stored in this index's doc values "
                f"(stored_fields={index.stored_fields})"
            )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(
        F.col(id_col), dv_col(facet_field), dv_col(date_field)
    )
    return (
        dv.join(_bounded_broadcast(hits), id_col)
        .filter(dv_col(facet_field).isNotNull())
        .select(
            dv_col(facet_field).alias("bucket"),
            F.trunc(dv_col(date_field), _CAL_INTERVALS[calendar_interval])
            .alias("date_bucket"),
        )
        .groupBy("bucket", "date_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("bucket").asc(), F.col("date_bucket").asc())
    )


def search_facet_metric_agg(
    index: PostingsIndex,
    query_terms: list[str],
    facet_field: str,
    metric_field: str,
    order_by: str = "n_docs",
    include_value_count: bool = False,
) -> DataFrame:
    """ES ``terms`` aggregation carrying a METRIC sub-aggregation —
    the most common composed request ("per source: hit count and
    char-length stats"): buckets of the hit set's ``facet_field``
    doc-values, each carrying count / min / max / sum / Q20-avg of
    ``metric_field``. ``order_by`` is ES's bucket ``order``: the
    default count ordering (``n_docs``) or a metric key (``avg_q20``,
    ``sum_val``, ``min_val``, ``max_val``) — ordering buckets by a
    sub-aggregation value, exactly ES's ``order: {"metric": "desc"}``.
    NULL facet values are excluded (ES's default; the ``missing``
    bucket lives in ``search_facets``).

    Plan shape: hit ids (pruned probe, count-guarded broadcast) join
    ONE column-pruned doc-values scan carrying both fields, then a
    single partial-aggregated groupBy — the sub-aggregation rides the
    same reduction as the bucket count, no second pass, no raw docs."""
    for f in (facet_field, metric_field):
        if f not in index.stored_fields:
            raise ValueError(
                f"field {f!r} is not stored in this index's doc values "
                f"(stored_fields={index.stored_fields})"
            )
    valid_orders = ("n_docs", "avg_q20", "sum_val", "min_val", "max_val")
    if order_by not in valid_orders:
        raise ValueError(
            f"unsupported bucket order {order_by!r} "
            f"(supported: {valid_orders})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(
        F.col(id_col), dv_col(facet_field), dv_col(metric_field)
    )
    # the sum: exact long for integral metric fields; for fractional
    # fields, pre-quantize each value to Q20 and sum in INTEGER space
    # (sum_val then reads in Q20 units) — a raw double sum is
    # partition-order dependent and a blind cast("long") silently
    # truncates the fractional part (round-12 advisor finding)
    integral = dict(dv.dtypes)[metric_field] in (
        "tinyint", "smallint", "int", "bigint",
    )
    sum_col = (
        F.sum(dv_col(metric_field)).cast("long")
        if integral
        else F.sum(F.floor(dv_col(metric_field) * Q20)).cast("long")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min(dv_col(metric_field)).alias("min_val"),
        F.max(dv_col(metric_field)).alias("max_val"),
        sum_col.alias("sum_val"),
        F.floor(F.avg(dv_col(metric_field)) * Q20)
        .cast("long")
        .alias("avg_q20"),
    ]
    if include_value_count:
        # ES stats.count is the number of metric VALUES (NULLs
        # excluded), NOT the bucket doc count — buckets_path
        # '<stats>.count' resolves here, while '_count' reads n_docs.
        # Opt-in so the base response schema stays pinned.
        aggs.append(F.count(dv_col(metric_field)).alias("val_count"))
    return (
        dv.join(_bounded_broadcast(hits), id_col)
        .filter(dv_col(facet_field).isNotNull())
        .groupBy(dv_col(facet_field).alias("bucket"))
        .agg(*aggs)
        .orderBy(F.col(order_by).desc(), F.col("bucket").asc())
    )


# ---------------------------------------------------------------------------
# Pipeline aggregations: second-pass transforms over a materialized
# bucket relation (ES "parent" pipeline aggs). The input here is the
# RESPONSE-sized bucket table an aggregation already produced — ES
# itself bounds it (search.max_buckets, default 65536 per response) —
# so the single-partition window below is over an inherently tiny
# relation, never the corpus.

# bucket_selector scripts: ES runs Painless; the SQL-expressible (and
# by far the most used) shape is one comparison of one buckets_path
# variable against a literal.  Anything else raises by name.
_SELECTOR_SCRIPT = re.compile(
    r"\s*params\.(\w+)\s*(>=|<=|==|!=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$"
)

_PIPELINE_CMP = {
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


def apply_bucket_pipelines(
    buckets: DataFrame,
    pipelines: list[tuple[str, str, str]],
    order_col: str = "bucket",
) -> DataFrame:
    """ES parent pipeline aggregations (``cumulative_sum``,
    ``derivative``) over an already-computed bucket relation: each
    ``(out_name, kind, value_col)`` adds one column computed along the
    bucket order — the running total, or the delta vs the previous
    bucket (NULL for the first bucket, exactly ES). ``value_col`` is
    the resolved buckets_path column (``n_docs`` for ``_count``).

    Scale note: the window is single-partition BY DESIGN — its input
    is the final bucket table (ES caps it at search.max_buckets,
    default 65536), not a corpus-sized relation; the corpus-sized
    reduction already happened upstream."""
    from pyspark.sql.window import Window

    out = buckets
    w = Window.orderBy(F.col(order_col).asc())
    for out_name, kind, value_col in pipelines:
        if value_col not in out.columns:
            raise ValueError(
                f"pipeline buckets_path column {value_col!r} not in the "
                f"bucket relation (columns: {out.columns})"
            )
        if kind == "cumulative_sum":
            out = out.withColumn(
                out_name,
                F.sum(value_col).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ).cast("long"),
            )
        elif kind == "derivative":
            out = out.withColumn(
                out_name,
                (F.col(value_col)
                 - F.lag(value_col, 1).over(w)).cast("long"),
            )
        elif isinstance(kind, tuple) and kind[0] == "serial_diff":
            # ES serial_diff: the lag-N difference (seasonality
            # removal — lag 7 on daily buckets strips the weekly
            # cycle); NULL for the first N buckets, exactly ES
            out = out.withColumn(
                out_name,
                (F.col(value_col)
                 - F.lag(value_col, int(kind[1])).over(w)).cast("long"),
            )
        elif isinstance(kind, tuple) and kind[0] in (
            "moving_fn", "moving_avg"
        ):
            # ES moving_fn: a sliding window over the bucket order —
            # window N with shift s covers buckets [i-N+s, i+s-1]
            # (default shift 0 EXCLUDES the current bucket; the legacy
            # moving_avg 'simple' model is the same window anchored to
            # INCLUDE it: shift 1). Empty windows follow Lucene's
            # MovingFunctions: sum -> 0.0, avg/min/max -> NaN (NULL
            # here). The avg is Q20-floored — the cross-engine float
            # law every avg in this engine follows.
            _, fn, n, shift = kind
            win = w.rowsBetween(-int(n) + int(shift), int(shift) - 1)
            c = F.col(value_col)
            if fn == "unweightedAvg":
                expr = F.floor(F.avg(c).over(win) * Q20).cast("long")
            elif fn == "sum":
                expr = F.coalesce(
                    F.sum(c).over(win), F.lit(0)
                ).cast("long")
            elif fn == "min":
                expr = F.min(c).over(win).cast("long")
            elif fn == "max":
                expr = F.max(c).over(win).cast("long")
            else:
                raise ValueError(
                    f"unsupported moving_fn script {fn!r} (supported: "
                    "MovingFunctions.unweightedAvg/sum/min/max)"
                )
            out = out.withColumn(out_name, expr)
        else:
            raise ValueError(
                f"unsupported pipeline aggregation {kind!r} "
                "(supported: cumulative_sum, derivative, serial_diff, "
                "moving_fn, moving_avg)"
            )
    return out.orderBy(F.col(order_col).asc())


def bucket_scalar_agg(
    buckets: DataFrame, kind: str, value_col: str
) -> DataFrame:
    """ES sibling pipeline aggregations that REDUCE the bucket
    relation to one scalar: avg_bucket / sum_bucket / min_bucket /
    max_bucket / stats_bucket over a parent's per-bucket values — the
    "average daily count" summary row. Counts are exact longs; the
    avg is Q20-floored (the cross-engine float law). The reduction is
    over the response-sized bucket table (same max_buckets bound as
    apply_bucket_pipelines)."""
    if value_col not in buckets.columns:
        raise ValueError(
            f"buckets_path column {value_col!r} not in the bucket "
            f"relation (columns: {buckets.columns})"
        )
    c = F.col(value_col)
    if kind == "avg_bucket":
        return buckets.agg(
            F.floor(F.avg(c) * Q20).cast("long").alias("avg_q20")
        )
    if kind == "sum_bucket":
        return buckets.agg(F.sum(c).cast("long").alias("sum_val"))
    if kind == "min_bucket":
        return buckets.agg(F.min(c).cast("long").alias("min_val"))
    if kind == "max_bucket":
        return buckets.agg(F.max(c).cast("long").alias("max_val"))
    if kind == "stats_bucket":
        return buckets.agg(
            F.count(c).cast("long").alias("n_buckets"),
            F.min(c).cast("long").alias("min_val"),
            F.max(c).cast("long").alias("max_val"),
            F.sum(c).cast("long").alias("sum_val"),
            F.floor(F.avg(c) * Q20).cast("long").alias("avg_q20"),
        )
    raise ValueError(
        f"unsupported bucket pipeline aggregation {kind!r} (supported: "
        "avg_bucket, sum_bucket, min_bucket, max_bucket, stats_bucket)"
    )


def apply_bucket_selector(
    buckets: DataFrame,
    paths: dict[str, str],
    script: str,
) -> DataFrame:
    """ES ``bucket_selector``: drop buckets failing a script predicate
    over buckets_path variables. The supported script grammar is ONE
    comparison ``params.<var> <op> <literal>`` — the filter-dashboards
    shape; Painless beyond that raises by name. ``paths`` maps each
    script variable to a column of the bucket relation (already
    resolved from ES buckets_path syntax by the dispatcher)."""
    m = _SELECTOR_SCRIPT.fullmatch(str(script))
    if not m:
        raise ValueError(
            f"unsupported bucket_selector script {script!r} (supported: "
            "'params.<var> <op> <number>')"
        )
    var, op, lit = m.group(1), m.group(2), m.group(3)
    if var not in paths:
        raise ValueError(
            f"bucket_selector script variable {var!r} not in "
            f"buckets_path {sorted(paths)}"
        )
    col_name = paths[var]
    if col_name not in buckets.columns:
        raise ValueError(
            f"bucket_selector buckets_path column {col_name!r} not in "
            f"the bucket relation (columns: {buckets.columns})"
        )
    value = float(lit) if "." in lit else int(lit)
    return buckets.filter(_PIPELINE_CMP[op](F.col(col_name), F.lit(value)))


def apply_bucket_sort(
    buckets: DataFrame,
    sort: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
) -> DataFrame:
    """ES ``bucket_sort``: re-order the parent's buckets by
    buckets_path values and truncate to a page (``from``/``size``).
    ``sort`` is a list of (column, asc|desc) with the bucket key as
    the implicit final tie-break (ES sorts ties by insertion order;
    a deterministic key order replaces that here — same law as every
    other ranked output in this engine).

    ``from_`` pages by skipping N leading buckets — implemented with
    one ROW_NUMBER over the response-sized bucket relation (same
    max_buckets bound as apply_bucket_pipelines)."""
    from pyspark.sql.window import Window

    cols = []
    for col_name, direction in sort:
        if col_name not in buckets.columns:
            raise ValueError(
                f"bucket_sort column {col_name!r} not in the bucket "
                f"relation (columns: {buckets.columns})"
            )
        if direction not in ("asc", "desc"):
            raise ValueError(f"bucket_sort order {direction!r}")
        c = F.col(col_name)
        cols.append(c.asc() if direction == "asc" else c.desc())
    cols.append(F.col("bucket").asc())
    out = buckets.orderBy(*cols)
    if from_:
        w = Window.orderBy(*cols)
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > from_)
            .drop("_rn")
            .orderBy(*cols)
        )
    if size is not None:
        out = out.limit(int(size))
    return out


# bucket_script expressions: ES runs Painless; the SQL-expressible
# (and by far the most used) shape is ARITHMETIC over buckets_path
# variables and numeric literals — ratios, percentages, per-unit
# normalizations. The grammar below is + - * / with parentheses and
# unary minus; anything else (method calls, conditionals, string ops)
# raises by name.
_SCRIPT_TOKEN = re.compile(
    r"\s*(params\.\w+|\d+(?:\.\d+)?|[()+\-*/])"
)


def _parse_bucket_script(script: str, paths: dict[str, str]):
    """Compile an ES ``bucket_script`` arithmetic expression into a
    Spark Column over the bucket relation. Recursive descent over the
    + - * / ( ) grammar; ``params.<var>`` resolves through ``paths``
    to a bucket column, numeric literals become DOUBLE literals.
    Returns the UNQUANTIZED double-typed Column — the caller applies
    the Q20 floor so the quantization law lives in one place."""
    pos = 0
    tokens: list[str] = []
    s = str(script)
    while pos < len(s):
        m = _SCRIPT_TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(
                f"unsupported bucket_script {script!r} (supported: "
                "arithmetic over params.<var> and numeric literals "
                "with + - * / and parentheses)"
            )
        tokens.append(m.group(1))
        pos = m.end()
    i = 0

    def peek():
        return tokens[i] if i < len(tokens) else None

    def take():
        nonlocal i
        t = tokens[i]
        i += 1
        return t

    def atom():
        nonlocal i
        t = peek()
        if t is None:
            raise ValueError(f"bucket_script {script!r}: truncated")
        if t == "(":
            take()
            e = expr()
            if peek() != ")":
                raise ValueError(
                    f"bucket_script {script!r}: unbalanced parentheses"
                )
            take()
            return e
        if t == "-":
            take()
            return -atom()
        take()
        if t.startswith("params."):
            var = t[len("params."):]
            if var not in paths:
                raise ValueError(
                    f"bucket_script variable {var!r} not in "
                    f"buckets_path {sorted(paths)}"
                )
            return F.col(paths[var]).cast("double")
        return F.lit(float(t))

    def term():
        e = atom()
        while peek() in ("*", "/"):
            op = take()
            rhs = atom()
            # try_divide: x/0 -> NULL under ANSI mode (the documented
            # divergence from Painless's ArithmeticException — keep
            # the bucket instead of failing the whole response)
            e = e * rhs if op == "*" else F.try_divide(e, rhs)
        return e

    def expr():
        e = term()
        while peek() in ("+", "-"):
            op = take()
            rhs = term()
            e = e + rhs if op == "+" else e - rhs
        return e

    out = expr()
    if peek() is not None:
        raise ValueError(
            f"bucket_script {script!r}: trailing tokens from {peek()!r}"
        )
    return out


def apply_bucket_script(
    buckets: DataFrame,
    paths: dict[str, str],
    script: str,
    out_name: str,
) -> DataFrame:
    """ES ``bucket_script``: a per-bucket computed metric — an
    arithmetic expression over sibling buckets_path values (the
    "error rate = errors / total * 100" dashboard column). The result
    is Q20-floored to a long (division produces fractions; the
    cross-engine float law every fractional metric in this engine
    follows). SQL's division law applies: x/0 is NULL (ES Painless
    would throw — NULL is the documented divergence, it keeps the
    bucket instead of failing the response). Row-local expression
    over the response-sized bucket relation; no shuffle."""
    for var, col_name in paths.items():
        if col_name not in buckets.columns:
            raise ValueError(
                f"bucket_script buckets_path column {col_name!r} (for "
                f"params.{var}) not in the bucket relation "
                f"(columns: {buckets.columns})"
            )
    e = _parse_bucket_script(script, paths)
    return buckets.withColumn(
        out_name, F.floor(e * Q20).cast("long")
    )


_NORMALIZE_METHODS = ("rescale_0_1", "percent_of_sum", "z-score")


def apply_normalize(
    buckets: DataFrame,
    value_col: str,
    method: str,
    out_name: str,
    order_col: str = "bucket",
) -> DataFrame:
    """ES ``normalize`` pipeline aggregation: rescale a per-bucket
    metric against the WHOLE bucket set — ``rescale_0_1``
    ((x-min)/(max-min)), ``percent_of_sum`` (x/sum), ``z-score``
    ((x-mean)/stddev_pop). Outputs are Q20-floored longs (the
    cross-engine float law); degenerate sets follow SQL division:
    max==min or sum==0 or stddev==0 -> NULL.

    Scale note: the unpartitioned window is over the response-sized
    bucket relation (ES caps it at search.max_buckets, default
    65536), never the corpus — same law as apply_bucket_pipelines."""
    from pyspark.sql.window import Window

    if value_col not in buckets.columns:
        raise ValueError(
            f"normalize buckets_path column {value_col!r} not in the "
            f"bucket relation (columns: {buckets.columns})"
        )
    if method not in _NORMALIZE_METHODS:
        raise ValueError(
            f"unsupported normalize method {method!r} "
            f"(supported: {list(_NORMALIZE_METHODS)})"
        )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # try_divide: degenerate bucket sets (single bucket, all-equal
    # counts, all-zero zero-fill) yield the documented NULL instead
    # of an ANSI DIVIDE_BY_ZERO failing the whole response
    x = F.col(value_col).cast("double")
    if method == "rescale_0_1":
        e = F.try_divide(
            x - F.min(x).over(w),
            F.max(x).over(w) - F.min(x).over(w),
        )
    elif method == "percent_of_sum":
        e = F.try_divide(x, F.sum(x).over(w))
    else:
        e = F.try_divide(x - F.avg(x).over(w), F.stddev_pop(x).over(w))
    return buckets.withColumn(
        out_name, F.floor(e * Q20).cast("long")
    ).orderBy(F.col(order_col).asc())


def _named_filter_conditions(
    index: PostingsIndex,
    named_filters: list[tuple[str, list]],
):
    """Shared by the ``filters`` / ``adjacency_matrix`` aggregations:
    resolve each named filter's (field, op, value) predicate triples
    into one boolean Column over the doc-values relation, validating
    fields and ops exactly like ``filtered_ids``."""
    conds = []
    for name, preds in named_filters:
        cond = F.lit(True)
        for field, op, value in preds:
            if field not in index.stored_fields:
                raise ValueError(
                    f"field {field!r} is not stored in this index's doc "
                    f"values (stored_fields={index.stored_fields})"
                )
            if op not in _DV_OPS:
                raise ValueError(f"unsupported filter op {op!r}")
            cond = cond & _DV_OPS[op](dv_col(field), F.lit(value))
        conds.append((name, cond))
    return conds


def search_filters_agg(
    index: PostingsIndex,
    query_terms: list[str],
    named_filters: list[tuple[str, list]],
) -> DataFrame:
    """ES ``filters`` aggregation: one NAMED bucket per filter-context
    clause, each counting the hit docs that pass it — the
    segment-comparison dashboard shape ("hits for X: how many en vs
    de, short vs long"). Buckets may overlap; EMPTY named buckets are
    returned with 0 (exactly ES — unlike adjacency_matrix). Returns
    ``(bucket, n_docs)`` sorted by bucket key.

    Plan shape: hit ids join ONE column-pruned doc-values scan, every
    named bucket a conditional sum inside a SINGLE reduction (no
    per-bucket re-scan), then a bounded len(filters) explode."""
    if not named_filters:
        raise ValueError("filters aggregation needs at least one filter")
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().join(_bounded_broadcast(hits), id_col)
    conds = _named_filter_conditions(index, named_filters)
    sums = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_b{i}")
        for i, (_n, cond) in enumerate(conds)
    ]
    one = dv.agg(*sums)
    buckets = F.array(*[
        F.struct(F.lit(name).alias("bucket"), F.col(f"_b{i}").alias("n_docs"))
        for i, (name, _c) in enumerate(conds)
    ])
    return (
        one.select(F.explode(buckets).alias("b"))
        .select("b.bucket", "b.n_docs")
        .orderBy("bucket")
    )


def search_adjacency_matrix_agg(
    index: PostingsIndex,
    query_terms: list[str],
    named_filters: list[tuple[str, list]],
    separator: str = "&",
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: a bucket per named filter
    PLUS one per pairwise intersection (key ``a&b``, names joined by
    the separator in sorted order) — the co-occurrence matrix behind
    segment-overlap dashboards. Exactly ES: intersection buckets with
    ZERO docs are omitted; the n(n-1)/2 pair space is over the FILTER
    LIST (ES caps it at indices.query.bool.max_clause_count), never
    the docs. Returns ``(bucket, n_docs)`` sorted by bucket key.

    Plan shape: same single-reduction law as ``search_filters_agg`` —
    one doc-values pass computes every single and pairwise conditional
    sum; the explode is len(filters)^2-bounded."""
    if not named_filters:
        raise ValueError(
            "adjacency_matrix aggregation needs at least one filter"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().join(_bounded_broadcast(hits), id_col)
    conds = _named_filter_conditions(index, named_filters)
    cells = list(conds)
    for i in range(len(conds)):
        for j in range(i + 1, len(conds)):
            ni, ci = conds[i]
            nj, cj = conds[j]
            a, b = sorted((ni, nj))
            cells.append((f"{a}{separator}{b}", ci & cj))
    sums = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_c{i}")
        for i, (_k, cond) in enumerate(cells)
    ]
    one = dv.agg(*sums)
    buckets = F.array(*[
        F.struct(
            F.lit(key).alias("bucket"),
            F.col(f"_c{i}").alias("n_docs"),
        )
        for i, (key, _c) in enumerate(cells)
    ])
    return (
        one.select(F.explode(buckets).alias("b"))
        .select("b.bucket", "b.n_docs")
        # ES omits every zero-count bucket from adjacency_matrix output
        .filter(F.col("n_docs") > 0)
        .orderBy("bucket")
    )


def rank_feature_search(
    index: PostingsIndex,
    field: str,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """ES ``rank_feature`` query, ``saturation`` function: score =
    boost * x / (x + pivot) over a positive numeric doc-values field —
    the static-signal ranker (pagerank / url_length / recency scores).
    Hits are the docs whose feature EXISTS and is positive (rank_feature
    fields must be positive in ES; non-positive values can't score).
    Returns ``(id, score_q20)`` top-k.

    Determinism: x and pivot are exact in double, the saturation is ONE
    IEEE division and one multiply, then the Q20 floor — bit-replayable
    cross-engine; the log/sigmoid functions are transcendental (not
    correctly-rounded across engines) so the dispatcher raises on them.

    Plan: one column-pruned doc-values scan with the existence/positive
    predicate pushed down, per-row scoring, TakeOrderedAndProject."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    if not (float(pivot) > 0):
        raise ValueError(f"rank_feature pivot must be positive: {pivot!r}")
    id_col = index.id_col
    col = dv_col(field)
    dv = index.live_docvalues().select(F.col(id_col), col)
    return (
        dv.filter(col.isNotNull() & (col > 0))
        .withColumn(
            "score_q20",
            F.floor(
                F.lit(float(boost))
                * (col.cast("double")
                   / (col.cast("double") + F.lit(float(pivot))))
                * Q20
            ).cast("long"),
        )
        .select(id_col, "score_q20")
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def distance_feature_search(
    index: PostingsIndex,
    field: str,
    origin_epoch_s: int,
    pivot_s: int,
    boost: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """ES ``distance_feature`` query over a DATE field: score =
    boost * pivot / (pivot + |value - origin|) — the recency booster
    (docs at the origin score ``boost``, decaying hyperbolically with
    temporal distance). Returns ``(id, score_q20)`` top-k.

    Origin and pivot arrive normalized to epoch seconds (the dispatcher
    parses ISO origins and ``<n>s/m/h/d`` pivots); the distance is an
    exact BIGINT, the score one IEEE division — Q20-floored,
    bit-replayable cross-engine. Geo-point origins are not dispatched
    (no geo doc-values in this engine).

    Plan: one column-pruned doc-values scan, per-row scoring,
    TakeOrderedAndProject."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    if int(pivot_s) <= 0:
        raise ValueError(f"distance_feature pivot must be positive: {pivot_s!r}")
    id_col = index.id_col
    col = dv_col(field)
    dv = index.live_docvalues().select(F.col(id_col), col)
    dist = F.abs(
        col.cast("timestamp").cast("long") - F.lit(int(origin_epoch_s))
    )
    return (
        dv.filter(col.isNotNull())
        .withColumn(
            "score_q20",
            F.floor(
                F.lit(float(boost))
                * (F.lit(float(pivot_s))
                   / (F.lit(float(pivot_s)) + dist.cast("double")))
                * Q20
            ).cast("long"),
        )
        .select(id_col, "score_q20")
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pinned_search(
    index: PostingsIndex,
    pinned_ids: list,
    organic_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``pinned`` query: the listed ids come FIRST in list order
    (editorial promotion), then the organic hits by BM25 score with
    pinned ids excluded — exactly ES (which fakes this with enormous
    scores; here the contract is explicit). Pinned ids that don't
    exist in the index are skipped, as ES does. Returns
    ``(rnk, id, pinned)`` — rnk is the page position, pinned the
    provenance flag.

    Plan: the pinned list is a literal inline relation semi-joined
    against live ids (len(ids)-bounded, ES caps pinned ids at 100);
    the organic probe is the standard pruned BM25 probe minus the
    pinned set (one bounded anti-join); ranks are ROW_NUMBERs over
    k-bounded relations, never the corpus."""
    from pycasselastic_spark.operators.search_probes import (
        bm25_topk_indexed,
    )
    from pyspark.sql.window import Window

    if not pinned_ids:
        raise ValueError("pinned query needs at least one id")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned ids must be distinct")
    id_col = index.id_col
    spark = index.live_docvalues().sparkSession
    pin = spark.createDataFrame(
        [(int(i), n) for n, i in enumerate(pinned_ids)],
        f"{id_col} long, _pos long",
    )
    live = index.live_docvalues().select(id_col)
    pin_live = pin.join(F.broadcast(live.join(
        F.broadcast(pin.select(id_col)), id_col, "semi"
    )), id_col, "semi")
    pinned_rows = pin_live.select(
        F.col(id_col),
        F.lit(True).alias("pinned"),
        F.lit(0).alias("_grp"),
        F.col("_pos").cast("long").alias("_a"),
        F.lit(0).cast("long").alias("_b"),
    )
    organic_top = (
        bm25_topk_indexed(
            index, organic_terms, k=k + len(pinned_ids), k1=k1, b=b
        )
        .join(F.broadcast(pin.select(id_col)), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.lit(False).alias("pinned"),
            F.lit(1).alias("_grp"),
            (-F.col("score_q20")).alias("_a"),
            F.col(id_col).cast("long").alias("_b"),
        )
    )
    # ONE rank law over the union: pinned first in list order, then
    # organic by (score desc, id) — no driver-side count action, and
    # the window input is (k + len(ids))-bounded by construction.
    # ES page semantics: pinned hits occupy the TOP of the same
    # size-bounded page, they don't extend it.
    w = Window.orderBy("_grp", "_a", "_b")
    return (
        pinned_rows.unionByName(organic_top)
        .select(
            F.row_number().over(w).alias("rnk"),
            F.col(id_col), "pinned",
        )
        .orderBy("rnk")
        .limit(k)
    )


def combined_fields_search(
    field_indexes: dict[str, PostingsIndex],
    query_terms: list[str],
    weights: dict[str, int] | None = None,
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``combined_fields`` query: term-centric multi-field scoring
    against ONE synthetic combined field (Lucene's CombinedFieldQuery
    / the BM25F simplification) — per (doc, term): tf_c = Σ_f w_f x
    tf_f, per doc: dl_c = Σ_f w_f x dl_f, df_c = docs containing the
    term in ANY field, avgdl_c = Σ_f w_f x total_dl_f / N; BM25 over
    those combined statistics, per-term scores Q20-floored then
    integer-summed per doc. Returns ``(id, n_hit_terms, score_q20)``.
    Field weights are the ES ``field^boost`` integers (>= 1 — ES
    rejects fractional combined_fields boosts precisely because the
    synthetic tf must stay integral).

    Per-doc field lengths are reconstructed from each index's FORWARD
    relation (dl_f = Σ tf over the doc's terms) — exact for ANALYZED
    indexes, whose dl counts kept tokens; legacy (analyzer=None)
    indexes count raw split slots instead, so they raise rather than
    drift. This is the Lucene norms read re-expressed relationally:
    a candidate-pruned scan of the id-bucketed forward relation per
    field, never a corpus shuffle.

    Plan: one pruned probe per field (query-bounded union), combined
    df by distinct + count (query-bounded), candidate ids broadcast
    into the per-field forward scans, one (term, doc) reduction and
    one (doc) reduction."""
    if not field_indexes:
        raise ValueError("combined_fields needs at least one field index")
    n_docs = {index.n_docs for index in field_indexes.values()}
    id_cols = {index.id_col for index in field_indexes.values()}
    if len(n_docs) != 1 or len(id_cols) != 1:
        raise ValueError(
            "combined_fields needs indexes over the SAME document set "
            f"(saw n_docs={sorted(n_docs)}, id_col={sorted(id_cols)})"
        )
    for field, index in field_indexes.items():
        if index.analyzer is None:
            raise ValueError(
                f"combined_fields over legacy index {field!r}: "
                "analyzer=None stores slot-count norms that can't be "
                "reconstructed from the forward relation — rebuild the "
                "field index with an Analyzer"
            )
    weights = dict(weights or {})
    for field, w in weights.items():
        if int(w) != w or int(w) < 1:
            raise ValueError(
                f"combined_fields boost {w!r} on {field!r} "
                "(ES requires integer boosts >= 1)"
            )
    n = n_docs.pop()
    id_col = id_cols.pop()
    avgdl_c = (
        sum(
            int(weights.get(f, 1)) * index.total_dl
            for f, index in field_indexes.items()
        )
        / n
        if n
        else 0.0
    )
    union = None
    for field, index in field_indexes.items():
        w = int(weights.get(field, 1))
        part = index.live_postings_for(query_terms).select(
            F.col(index.id_col).alias("_id"),
            "term",
            (F.col("tf") * w).alias("wtf"),
        )
        union = part if union is None else union.unionByName(part)
    tfc = union.groupBy("_id", "term").agg(
        F.sum("wtf").cast("long").alias("tf_c")
    )
    dfc = (
        union.select("term", "_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    cand = tfc.select("_id").distinct()
    dl_parts = None
    for field, index in field_indexes.items():
        w = int(weights.get(field, 1))
        part = (
            index.live_forward()
            .join(
                _bounded_broadcast(
                    cand.withColumnRenamed("_id", index.id_col)
                ),
                index.id_col,
            )
            .groupBy(F.col(index.id_col).alias("_id"))
            .agg((F.sum("tf") * w).cast("long").alias("wdl"))
        )
        dl_parts = part if dl_parts is None else dl_parts.unionByName(part)
    dlc = dl_parts.groupBy("_id").agg(
        F.sum("wdl").cast("long").alias("dl_c")
    )
    per_term_doc = (
        tfc.join(dlc, "_id")
        .join(F.broadcast(dfc), "term")
        .withColumn(
            "s_q20",
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf_c") * (k1 + 1))
                / (
                    F.col("tf_c")
                    + k1 * (1 - b + b * F.col("dl_c") / F.lit(avgdl_c))
                )
                * Q20
            ).cast("long"),
        )
    )
    scored = (
        per_term_doc.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("s_q20").cast("long").alias("score_q20"),
        )
        .select(F.col("_id").alias(id_col), "n_hit_terms", "score_q20")
    )
    if k is None:
        # unsorted/unlimited mode for callers that filter the hit set
        # and re-sort at the root (the combined_fields AND path) — an
        # inner orderBy past topKSortFallbackThreshold would plan a
        # full global sort that the outer sort then throws away
        return scored
    return (
        scored
        .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )


def search_weighted_avg_agg(
    index: PostingsIndex,
    query_terms,
    value_field: str,
    weight_field: str,
) -> DataFrame:
    """ES ``weighted_avg`` aggregation over the hit set's stored
    doc-values: Σ(value x weight) / Σ(weight) — the rating-by-volume /
    price-by-quantity request. INTEGRAL fields only (the exact-integer
    law): both sums are exact BIGINTs, the quotient ONE IEEE division,
    Q20-floored. Rows where either side is NULL are skipped (exactly
    ES's default missing behavior). Returns one row
    ``(n_used, wsum, wavg_q20)``.

    Plan: hit ids join ONE column-pruned doc-values scan carrying both
    fields, a single partial-aggregated reduction."""
    id_col = index.id_col
    for f in (value_field, weight_field):
        if f not in index.stored_fields:
            raise ValueError(
                f"field {f!r} is not stored in this index's doc values "
                f"(stored_fields={index.stored_fields})"
            )
    hits = hits_relation(index, query_terms)
    dv = index.live_docvalues().select(
        F.col(id_col), dv_col(value_field), dv_col(weight_field)
    )
    types = dict(dv.dtypes)
    for f in (value_field, weight_field):
        if types[f] not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weighted_avg over fractional field {f!r} "
                "(integral doc-values only)"
            )
    v, w = dv_col(value_field), dv_col(weight_field)
    both = v.isNotNull() & w.isNotNull()
    return (
        dv.join(_bounded_broadcast(hits), id_col)
        .agg(
            F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_used"),
            F.sum(F.when(both, w).otherwise(0)).cast("long").alias("wsum"),
            F.floor(
                F.sum(F.when(both, v * w).otherwise(0)).cast("double")
                / F.sum(F.when(both, w).otherwise(0)).cast("double")
                * Q20
            ).cast("long").alias("wavg_q20"),
        )
    )


def search_mad_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
) -> DataFrame:
    """ES ``median_absolute_deviation`` over the hit set's stored
    doc-values — the robust dispersion metric (immune to the outliers
    that wreck std): median(|x - median(x)|). ES computes it on a
    t-digest and documents the approximation; a Spark reduction
    computes the EXACT interpolated answer (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation law, and
    over integral inputs every interpolated midpoint is an exactly-
    representable binary fraction). Returns one row ``(mad_q20,)``.

    Plan: two reductions over the hit set's doc-values (the inner
    median is a scalar broadcast into the residual pass) — both
    column-pruned, no corpus shuffle."""
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = (
        index.live_docvalues()
        .select(F.col(id_col), dv_col(field))
        .join(_bounded_broadcast(hits), id_col)
        .filter(dv_col(field).isNotNull())
    )
    med = dv.agg(
        F.expr(f"percentile(`{field}`, 0.5D)").alias("_med")
    )
    return (
        dv.crossJoin(F.broadcast(med))
        .select(
            F.abs(dv_col(field).cast("double") - F.col("_med"))
            .alias("_resid")
        )
        .agg(
            F.floor(F.expr("percentile(_resid, 0.5D)") * Q20)
            .cast("long")
            .alias("mad_q20")
        )
    )


# auto_date_histogram's interval ladder (seconds). ES walks
# second->minute->hour->day->week rungs exactly like this and then
# crosses into CALENDAR months/years — variable-length units this
# fixed ladder can't express, so spans needing a coarser rung than a
# week raise rather than silently approximate a month as 30 days.
_AUTO_LADDER_S = (
    1, 5, 10, 30, 60, 300, 600, 1800,
    3600, 10800, 43200, 86400, 604800,
)


def search_auto_date_histogram_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
    buckets: int = 10,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest ladder interval
    that renders the hit set's time span in at most ``buckets``
    buckets, then histogram on it — the "just give me a sensible
    x-axis" aggregation every overview dashboard opens with. Returns
    ``(interval_s, bucket_s, n_docs)`` with the chosen interval
    carried in-band so callers (and the oracle) can pin the choice.

    The span reduction is one bounded collect (a single min/max row —
    same driver-side law as the prefix rewrite's expansion); the
    histogram afterwards is the standard fixed-interval reduction.
    Spans needing a rung coarser than a week raise (ES crosses into
    calendar months there — variable-length units the fixed ladder
    must not silently approximate)."""
    if int(buckets) < 1:
        raise ValueError(f"auto_date_histogram buckets {buckets!r}")
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    dv = (
        index.live_docvalues()
        .select(
            F.col(id_col),
            dv_col(field).cast("timestamp").cast("long").alias("_s"),
        )
        .join(_bounded_broadcast(hits), id_col)
        .filter(F.col("_s").isNotNull())
    )
    span = dv.agg(F.min("_s").alias("lo"), F.max("_s").alias("hi")).collect()[0]
    spark = index.postings.sparkSession
    if span["lo"] is None:
        return spark.createDataFrame(
            [], "interval_s long, bucket_s long, n_docs long"
        )
    lo, hi = int(span["lo"]), int(span["hi"])
    width = None
    for w in _AUTO_LADDER_S:
        if (hi // w) - (lo // w) + 1 <= int(buckets):
            width = w
            break
    if width is None:
        raise ValueError(
            "auto_date_histogram span needs a rung coarser than a week "
            "(calendar months — not expressible on the fixed ladder)"
        )
    return (
        dv.select(
            # pmod keeps the bucket key a floor-multiple of the width
            # for NEGATIVE epochs too (Spark's % takes the dividend's
            # sign, which would merge the -w and 0 buckets)
            ((F.col("_s") - F.pmod(F.col("_s"), F.lit(width))))
            .alias("bucket_s")
        )
        .groupBy("bucket_s")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit(width).cast("long").alias("interval_s"),
            "bucket_s", "n_docs",
        )
        .orderBy("bucket_s")
    )


def search_percentile_ranks_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
    values: list,
) -> DataFrame:
    """ES ``percentile_ranks`` — the INVERSE of percentiles: for each
    given value, the percentage of the hit set's doc-values at or
    below it ("what fraction of responses beat 200 ms"). ES serves an
    interpolated t-digest estimate; this engine computes the EXACT
    empirical CDF — rank(v) = 100 x |{x : x <= v}| / n — from one
    reduction, Q20-floored (the cross-engine float law). Empty hit
    sets return NULL ranks, one row per requested value (ES's shape).
    Returns ``(value, rank_q20)`` sorted by value.

    Plan shape: hit ids join the column-pruned doc-values scan; every
    requested value is a conditional sum inside a SINGLE reduction
    (no per-value re-scan), then a bounded len(values) explode."""
    if not values:
        raise ValueError("percentile_ranks needs at least one value")
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )
    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    col = dv_col(field)
    dv = (
        index.live_docvalues()
        .select(F.col(id_col), col)
        .join(_bounded_broadcast(hits), id_col)
        .filter(col.isNotNull())
    )
    sums = [
        F.sum(F.when(col <= F.lit(v), 1).otherwise(0))
        .cast("long")
        .alias(f"_le{i}")
        for i, v in enumerate(values)
    ]
    one = dv.agg(F.count(F.lit(1)).alias("_n"), *sums)
    cells = F.array(*[
        F.struct(
            F.lit(float(v)).alias("value"),
            F.when(
                F.col("_n") > 0,
                F.floor(
                    F.col(f"_le{i}").cast("double") / F.col("_n")
                    * 100.0 * Q20
                ).cast("long"),
            ).alias("rank_q20"),
        )
        for i, v in enumerate(values)
    ])
    return (
        one.select(F.explode(cells).alias("c"))
        .select("c.value", "c.rank_q20")
        .orderBy("value")
    )


def search_date_range_agg(
    index: PostingsIndex,
    query_terms,
    field: str,
    ranges: list[dict],
) -> DataFrame:
    """ES ``date_range`` aggregation: the ``range`` agg with ISO /
    epoch-second bounds over a DATE doc-values field — from inclusive,
    to exclusive, either side open, overlapping and EMPTY buckets
    returned, keys in ES's ``a-b`` / ``*-b`` / ``a-*`` convention
    (epoch seconds, timezone-free). Same single-reduction plan as the
    numeric range agg: every bucket a conditional sum in ONE pass over
    the hit set's doc-values."""
    import datetime as _dt

    if not ranges:
        raise ValueError("date_range aggregation needs at least one range")
    if field not in index.stored_fields:
        raise ValueError(
            f"field {field!r} is not stored in this index's doc values "
            f"(stored_fields={index.stored_fields})"
        )

    def to_epoch(v):
        if v is None:
            return None
        if isinstance(v, str):
            parsed = _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
            if parsed.tzinfo is None:
                # zoneless ISO bounds are UTC (ES's law) — never the
                # machine's local timezone, which would shift bucket
                # bounds per deployment
                parsed = parsed.replace(tzinfo=_dt.timezone.utc)
            return int(parsed.timestamp())
        return int(v)

    id_col = index.id_col
    hits = hits_relation(index, query_terms)
    col = dv_col(field).cast("timestamp").cast("long")
    dv = (
        index.live_docvalues()
        .select(F.col(id_col), col.alias("_s"))
        .join(_bounded_broadcast(hits), id_col)
    )
    sums, keys = [], []
    for i, spec in enumerate(ranges):
        extra = set(spec) - {"from", "to"}
        if extra:
            raise ValueError(
                f"unsupported date_range options {sorted(extra)}"
            )
        lo, hi = to_epoch(spec.get("from")), to_epoch(spec.get("to"))
        cond = F.lit(True) & F.col("_s").isNotNull()
        if lo is not None:
            cond = cond & (F.col("_s") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col("_s") < F.lit(hi))
        keys.append(f"{'*' if lo is None else lo}-{'*' if hi is None else hi}")
        sums.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_b{i}")
        )
    one = dv.agg(*sums)
    buckets = F.array(*[
        F.struct(F.lit(k).alias("bucket"), F.col(f"_b{i}").alias("n_docs"))
        for i, k in enumerate(keys)
    ])
    return (
        one.select(F.explode(buckets).alias("b"))
        .select("b.bucket", "b.n_docs")
        .orderBy("bucket")
    )
