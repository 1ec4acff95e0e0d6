"""Deterministic corpus sampling and sharding for training-data
pipelines.

Random `.sample()` is non-reproducible across engines and re-runs; a
training pipeline needs sampling decisions that are (a) stable under
re-execution, (b) independent of partitioning, and (c) replayable by
any engine that has md5. These operators key every decision off an md5
prefix of the row key: lexicographic comparison on fixed-length
lowercase hex is monotone in the hash value, so a rate ``r`` maps to
the hex threshold ``int(r * 16**n_hex)`` with no hex->int parsing in
the hot path.

Scale shape: everything here is a narrow per-row projection + filter —
no shuffle, no driver participation; Catalyst pushes the residual
filters to the scan where possible. ``hash_shard`` is the groupBy-side
view of what a real corpus writer would do with
``df.write.partitionBy("shard")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_key(col: Column | str, n_hex: int = 4) -> Column:
    """Lowercase hex md5 prefix of the (stringified) key — the
    deterministic 'random' number driving sample/shard decisions."""
    return F.substring(F.md5(_c(col).cast("string")), 1, n_hex)


def rate_threshold(rate: float, n_hex: int = 4) -> str:
    """Hex string such that P[hash_key < threshold] ~= rate (exact up
    to 16**-n_hex granularity)."""
    space = 16**n_hex
    t = min(space, max(0, int(round(rate * space))))
    return format(t, f"0{n_hex + 1}x")[-n_hex:] if t < space else "g" * n_hex


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, n_hex: int = 4
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose hash prefix falls
    below the rate threshold."""
    return df.filter(hash_key(key_col, n_hex) < F.lit(rate_threshold(rate, n_hex)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    n_hex: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible twin of
    ``df.sampleBy``): each stratum value gets its own keep-rate. The
    training-data mixing primitive — weights per source/language."""
    thr = F.lit(rate_threshold(default_rate, n_hex))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            _c(strata_col) == value, F.lit(rate_threshold(rate, n_hex))
        ).otherwise(thr)
    return df.filter(hash_key(key_col, n_hex) < thr)


def hash_shard(col: Column | str, n_hex: int = 1) -> Column:
    """Stable shard label (16**n_hex shards) for corpus bucketing; at
    scale this is the column you ``partitionBy`` on write so any engine
    can locate a document's shard from its key alone."""
    return hash_key(col, n_hex)


def uniform_u(col: Column | str) -> Column:
    """Deterministic uniform in [0, 1): 52 md5 bits of the key as a
    double over 16^13 — exactly representable, so the value (and any
    comparison against a rate) is bit-identical across engines."""
    return (
        F.conv(F.substring(F.md5(_c(col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )


def balanced_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_per_stratum: int,
) -> DataFrame:
    """Rebalance a skewed stratum distribution by deterministic
    downsampling: each stratum keeps rate min(1, target/|stratum|), so
    over-represented strata shrink toward ``target_per_stratum`` rows
    (in expectation) while small strata pass through — the
    domain/source-balancing primitive of training-data mixes, with the
    keep decision keyed off md5(key) so it is reproducible across
    engines, re-runs and partitionings.

    Scale shape: one partial-aggregated count per stratum (stratum
    cardinality ~ sources/domains, tiny), broadcast back onto the
    corpus — a map-side join + narrow filter; the corpus itself is
    never shuffled."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_per_stratum)) / F.col("_n").cast("double"),
    )
    return (
        df.join(F.broadcast(counts), strata_col)
        .filter(uniform_u(key_col) < rate)
        .drop("_n")
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row draws a uniform u from 52 md5
    bits of its key and the k largest ``u^(1/weight)`` win — selection
    probability proportional to weight, reproducible across engines,
    re-runs and partitionings (the mixing-weights primitive of
    training-data pipelines, minus the RNG).

    Scale shape: a narrow projection then one top-k (TakeOrderedAndProject
    -— per-partition heaps + a k-row merge, no global sort). Output:
    input columns + ``sample_key`` (rounded to 12 digits: Java and C
    libm pow may differ in the last ulp; ranking uses full precision,
    where a boundary tie within 1 ulp is vanishingly improbable).
    """
    u = (
        F.conv(F.substring(F.md5(_c(key_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    skey = F.pow(u, F.lit(1.0) / F.greatest(_c(weight_col).cast("double"), F.lit(1.0)))
    return (
        df.withColumn("_skey", skey)
        .orderBy(F.col("_skey").desc(), _c(key_col))
        .limit(k)
        .withColumn("sample_key", F.round("_skey", 12))
        .drop("_skey")
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, priority-ordered by
    ``order_cols`` (ties must be broken by a unique column for
    determinism). The per-domain document cap every web-corpus pipeline
    applies (a single boilerplate-heavy domain must not dominate the
    training mix).

    One window over the group key — a single hash shuffle, rank
    computed streaming per partition; no global sort, no collect.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def group_consistent_split(
    group_col: Column | str,
    train_pct: int = 80,
    n_hex: int = 4,
) -> Column:
    """'train'/'heldout' split label that is CONSTANT within each group:
    the md5 of the GROUP key (not the row key) decides, so every row of
    a group lands in the same split. With ``group_col`` = near-dup
    component this is the leakage-safe train/validation split — a
    validation doc can never have a near-duplicate in train, which a
    row-hash split silently permits (the classic eval-contamination
    bug). Pure expression — no shuffle beyond whatever produced the
    group labels."""
    thr = rate_threshold(train_pct / 100.0, n_hex)
    return F.when(
        hash_key(group_col, n_hex) < F.lit(thr), F.lit("train")
    ).otherwise(F.lit("heldout"))


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float,
    target_total: int,
) -> DataFrame:
    """Temperature (alpha-smoothed) source mixing — the multilingual-
    corpus rebalancing law (mBERT / XLM-R style): target share of
    stratum i is ``n_i^alpha / Σ n_j^alpha``, so alpha=1 keeps natural
    proportions, alpha=0 equalizes strata, and the usual alpha≈0.5
    boosts tail sources without flattening the head. Each stratum
    keeps rate ``min(1, target_total * share_i / n_i)`` with the keep
    decision keyed off 52 md5 bits of the row key — reproducible
    across engines, re-runs and partitionings.

    Cross-engine exactness: ``alpha=0.5`` computes through IEEE-exact
    ``sqrt`` (bit-identical everywhere); other alphas go through
    ``pow``, whose last bit may differ across libm builds — fine for
    production, but oracle-checked pipelines should use 0.5. The
    normalizer sums in Q20 fixed-point integer space so its value —
    and every keep decision — is independent of addend order
    (partitioning, engine).

    Scale shape: one partial-aggregated count per stratum plus one
    scalar normalizer over the (tiny) strata relation, broadcast back
    onto the corpus — a map-side join + narrow filter; the corpus is
    never shuffled."""
    from pyspark.sql.window import Window

    smooth = (
        (lambda c: F.sqrt(c)) if float(alpha) == 0.5
        else (lambda c: F.pow(c, F.lit(float(alpha))))
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    # the normalizer rides a global window over the STRATA relation —
    # rows = distinct strata (sources/domains, tiny by construction),
    # so the single partition is bounded; a separate counts.agg()
    # would re-execute the corpus-wide groupBy a second time.
    # The sum runs in Q20 FIXED-POINT integer space (the repo's
    # order-independent float-sum law): a double SUM's value depends
    # on addend order, which partitioning — and the DuckDB oracle —
    # would not reproduce bit-for-bit, and a last-bit z difference can
    # flip a keep decision.
    q20 = F.lit(float(1 << 20))
    z_int = F.sum(
        F.floor(smooth(F.col("_n").cast("double")) * q20).cast("long")
    ).over(Window.partitionBy())
    z = z_int.cast("double") / q20
    rates = counts.select(
        F.col(strata_col),
        F.least(
            F.lit(1.0),
            F.lit(float(target_total))
            * smooth(F.col("_n").cast("double"))
            / z
            / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(uniform_u(key_col) < F.col("_rate"))
        .drop("_rate")
    )


def quality_bucket_sample(
    df: DataFrame,
    key_col: str,
    score_col: str,
    head_frac: float = 0.75,
    tail_frac: float = 0.25,
    rates: tuple[float, float, float] = (1.0, 0.5, 0.1),
) -> DataFrame:
    """CCNet-style QUALITY-BUCKETED sampling — the perplexity
    head/middle/tail mix (Wenzek et al. 2020): rank documents by a
    quality score (here any fluency/LM signal, higher = better),
    split the corpus at the ``tail_frac`` and ``head_frac`` EXACT
    percentiles of that score, then keep each bucket at its own
    deterministic rate (``rates`` = head, middle, tail; CCNet keeps
    the head whole, samples the middle, and thins the tail instead of
    hard-dropping it — quality scores are noisy and a hard cut
    throws away recoverable data). Returns the kept rows with their
    ``bucket`` label.

    Determinism: the two cut points are exact linear-interpolated
    percentiles (one reduction; Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the interpolation law); bucket membership
    is a plain double compare against those shared values; the keep
    decision is the md5-uniform ``uniform_u`` against a rate literal
    — every decision bit-identical cross-engine, no RNG state.

    Plan shape: ONE percentile reduction to a one-row relation,
    broadcast back over the scored frame, then a narrow filter —
    the corpus is scanned once and never shuffled."""
    if not (0.0 <= tail_frac < head_frac <= 1.0):
        raise ValueError(
            f"need 0 <= tail_frac < head_frac <= 1, got "
            f"({tail_frac}, {head_frac})"
        )
    cuts = df.agg(
        F.expr(
            f"percentile(`{score_col}`, array({tail_frac!r}D, "
            f"{head_frac!r}D))"
        ).alias("_cuts")
    ).select(
        F.element_at("_cuts", 1).alias("_c_tail"),
        F.element_at("_cuts", 2).alias("_c_head"),
    )
    head_r, mid_r, tail_r = (float(r) for r in rates)
    bucket = (
        F.when(_c(score_col) >= F.col("_c_head"), F.lit("head"))
        .when(_c(score_col) >= F.col("_c_tail"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    rate = (
        F.when(F.col("bucket") == "head", F.lit(head_r))
        .when(F.col("bucket") == "middle", F.lit(mid_r))
        .otherwise(F.lit(tail_r))
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .filter(uniform_u(key_col) < rate)
        .drop("_c_tail", "_c_head")
    )


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023): score every document by how much it looks like a TARGET
    distribution under hashed n-gram features, the data-selection
    primitive for "give me web data that resembles my high-quality
    target set". Features are bigrams hashed into ``n_buckets``
    md5 buckets; each bucket's log importance ratio is
    ln(p_target(f) / p_raw(f)) under add-one smoothing, and a
    document's log weight is the sum over its bigram occurrences.
    Returns ``(id, n_bigrams, logw_q20)``.

    Determinism law: each bucket's log-ratio quantizes to a Q20
    integer FIRST (one ln over correctly-rounded divisions — the
    engine-shared transcendental convention every BM25 oracle already
    relies on), and the per-document combination is an exact integer
    dot product c_doc(f) x L(f) — order-independent under any
    partitioning, exactly the fixed-point trick the temperature
    normalizer uses.

    Plan shape: ONE tokenize pass builds (id, bucket) counts
    (map-side partial); the raw and target bucket tables are
    n_buckets rows each, their scalars one-row reductions — all
    broadcast; the per-doc reduce is the only shuffle and it is keyed
    by the doc id. The corpus is scanned once; the target set should
    be the small curated side (DSIR's premise)."""
    from pycasselastic_spark.functions.expr import let

    def doc_feats(frame: DataFrame) -> DataFrame:
        bg = let(
            F.split(F.col(text_col), " "),
            lambda ws: F.when(
                F.size(ws) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        feat = (
            F.conv(F.substring(F.md5(F.col("_bg")), 1, 4), 16, 10)
            .cast("long") % n_buckets
        )
        return frame.select(
            F.col(id_col), F.explode(bg).alias("_bg")
        ).select(F.col(id_col), feat.alias("feat"))

    raw_feats = doc_feats(df)
    tgt_feats = doc_feats(target)
    # ONE corpus tokenize pass: the per-doc bucket counts are the
    # finest relation — materialize them (narrow: <= n_buckets rows
    # per doc) and DERIVE the bucket totals and the scalar by
    # re-aggregation instead of re-tokenizing the corpus per statistic
    per_doc = (
        raw_feats.groupBy(F.col(id_col), "feat")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    raw_c = per_doc.groupBy("feat").agg(F.sum("c").alias("c_r"))
    raw_n = raw_c.agg(F.sum("c_r").alias("n_r"))
    tgt_c = tgt_feats.groupBy("feat").agg(F.count(F.lit(1)).alias("c_t"))
    tgt_n = tgt_c.agg(F.sum("c_t").alias("n_t"))
    # full per-bucket table: buckets absent from one side still get
    # their smoothed mass (the join is outer over the bucket space)
    ratios = (
        raw_c.join(tgt_c, "feat", "full_outer")
        .crossJoin(F.broadcast(raw_n))
        .crossJoin(F.broadcast(tgt_n))
        .select(
            "feat",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("n_t") + n_buckets).cast("double")
                    )
                    / (
                        (F.coalesce(F.col("c_r"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("n_r") + n_buckets).cast("double")
                    )
                )
                * F.lit(float(1 << 20))
            ).cast("long").alias("lr_q20"),
        )
    )
    return (
        per_doc.join(F.broadcast(ratios), "feat")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lr_q20")).cast("long")
            .alias("logw_q20"),
        )
    )


def unimax_allocation(
    df: DataFrame,
    strata_col: str,
    budget_total: int,
    max_epochs: int = 1,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151)
    — the fairer alternative to temperature mixing for multilingual /
    multi-source pretraining: WATER-FILL the document budget across
    strata with a per-stratum epoch cap. Sources ascending by size
    each receive an equal share of the remaining budget, capped at
    ``max_epochs`` x their size; a small source hits its cap and the
    freed budget flows to larger ones, so no source is oversampled
    past the cap and no head source starves the tail.

    Returns the per-stratum allocation table ``(<strata>, n_docs,
    alloc_q20, rate_q20, at_cap)``: alloc the water-filled budget,
    rate = min(1, alloc/n) (the dedup-style keep rate; full-cap
    strata sample at 1.0 and repeat up to max_epochs at training
    time), at_cap whether the stratum hit its epoch cap (the
    water-filling "full" flag). The md5-keyed per-document keep
    decision at rate_q20 lives in ``unimax_sample`` — the same
    52-bit uniform every sampler here uses, so the decision replays
    bit-for-bit cross-engine.

    Determinism: the greedy loop has the standard water-filling
    closed form — fullness is prefix-closed in ascending size order,
    so one cumulative-sum window over the (tiny) strata relation
    finds the cutoff; caps and prefix sums are EXACT integers
    (max_epochs is integer-validated), the residual share is one
    integer division pair in IEEE double. The strata window is
    single-partition over distinct sources — bounded by construction,
    same law as temperature_mixture_sample's normalizer."""
    from pyspark.sql.window import Window

    if int(max_epochs) != max_epochs or int(max_epochs) < 1:
        raise ValueError(
            f"unimax max_epochs {max_epochs!r} (integer >= 1 — the "
            "cap law stays in exact integer space)"
        )
    if int(budget_total) < 0:
        raise ValueError(f"unimax budget {budget_total!r}")
    e = int(max_epochs)
    b = int(budget_total)
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w_ord = Window.orderBy(F.col("n_docs").asc(), F.col(strata_col).asc())
    w_all = Window.partitionBy()
    ranked = (
        counts.withColumn("_i", F.row_number().over(w_ord))
        .withColumn("_k", F.count(F.lit(1)).over(w_all))
        .withColumn("_cap", (F.col("n_docs") * e).cast("long"))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("_cap").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        # water-filling: row i is FULL iff its cap fits its equal
        # share of what's left assuming all smaller rows are full —
        # prefix-closed in ascending order, so the AND-min window
        # turns the per-row condition into the true fullness flag
        .withColumn(
            "_cond",
            (F.col("_cap") * (F.col("_k") - F.col("_i") + 1)
             <= F.lit(b) - F.col("_prefix")).cast("int"),
        )
        .withColumn(
            "_full",
            F.min("_cond").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ) == 1,
        )
    )
    totals = ranked.select(
        F.sum(F.when(F.col("_full"), F.col("_cap")).otherwise(0))
        .over(w_all).alias("_full_sum"),
        F.sum(F.when(F.col("_full"), 1).otherwise(0))
        .over(w_all).alias("_n_full"),
        F.col(strata_col), F.col("n_docs"), F.col("_cap"), F.col("_full"),
        F.col("_k"),
    )
    q20 = F.lit(float(1 << 20))
    # all-strata-at-cap leaves no residual takers: share is unused
    # then, but keep the expression NaN-free
    share = F.when(
        F.col("_k") == F.col("_n_full"), F.lit(0.0)
    ).otherwise(
        (F.lit(b) - F.col("_full_sum")).cast("double")
        / (F.col("_k") - F.col("_n_full")).cast("double")
    )
    alloc = F.when(F.col("_full"), F.col("_cap").cast("double")).otherwise(
        share
    )
    rate = F.least(F.lit(1.0), alloc / F.col("n_docs").cast("double"))
    return totals.select(
        F.col(strata_col),
        F.col("n_docs"),
        F.floor(alloc * q20).cast("long").alias("alloc_q20"),
        F.floor(rate * q20).cast("long").alias("rate_q20"),
        F.col("_full").alias("at_cap"),
    ).orderBy(strata_col)


def unimax_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    budget_total: int,
    max_epochs: int = 1,
) -> DataFrame:
    """Apply a ``unimax_allocation``: keep each row where its 52-bit
    md5 uniform falls under its stratum's water-filled rate — the
    UniMax twin of ``temperature_mixture_sample`` (broadcast rate
    join + narrow filter; the corpus is never shuffled)."""
    q20 = float(1 << 20)
    rates = unimax_allocation(
        df, strata_col, budget_total, max_epochs
    ).select(
        strata_col,
        (F.col("rate_q20").cast("double") / F.lit(q20)).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(uniform_u(key_col) < F.col("_rate"))
        .drop("_rate")
    )
