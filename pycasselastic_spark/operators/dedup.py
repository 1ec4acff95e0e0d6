"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.

Design for 100 TB:
  * exact dedup is a single hash-shuffle with map-side combine;
  * MinHash-LSH never compares all pairs — signatures are computed
    per-row (narrow), candidates come from an equi-join on band keys
    (shuffle keyed by band value, skew-safe under AQE), and only
    candidates pay the exact-Jaccard verification;
  * SimHash blocking uses the pigeonhole principle (hamming <= t means
    at least one of t+1 fingerprint chunks matches exactly), so the
    candidate join is again a plain equi-join — no cross product;
  * hash functions are md5-based so a DuckDB oracle can replay them
    bit-for-bit (xxhash64 would be faster JVM-side but has no
    cross-engine twin; swap via ``hash_fn`` if oracle parity is not
    needed).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# shared expressions
# --------------------------------------------------------------------------


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a single-space-tokenized text
    column. Empty array when the document has fewer than ``n`` words
    (Spark's ``sequence(1, 0)`` would count *down*, so guard it).

    The tokenization is bound ONCE per row via ``let``: referencing
    ``split(text)`` directly inside the per-position lambda would
    re-split the document for every position x slot access in Spark's
    interpreted higher-order evaluation (measured 8x slower at
    sf0.1)."""
    from pycasselastic_spark.functions.expr import let

    c = F.col(col) if isinstance(col, str) else col

    def build(ws: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(ws, i + j) for j in range(n)]
        )
        return F.when(
            F.size(ws) >= n, F.array_distinct(F.transform(idx, gram))
        ).otherwise(F.array().cast("array<string>"))

    return let(F.split(c, " "), build)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays.
    int/int division — bit-identical across engines."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def minhash_signature(sh: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: per hash function h, the minimum md5 of
    shingle||'#h'. String-min over hex digests == numeric min over the
    corresponding 128-bit values, and is identical in any engine.

    The per-hash salt MUST be closed over outside the transform lambda:
    a ``lambda s, h=h`` spelling gives the lambda two parameters, which
    PySpark binds as (element, index) — ``h`` silently becomes the
    array-index Column, ``f"#{h}"`` stringifies that Column's repr
    (unique per plan!), and every "hash function" degenerates to the
    same salt within a plan while never matching any OTHER plan's salt.
    Found when cross-DataFrame band joins (minhash_lsh_pairs_between)
    produced zero collisions."""

    def _hash(h: int) -> Column:
        salt = f"#{h}"
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(salt))))
        )

    return [_hash(h) for h in range(num_hashes)]


def token_hash32(w: Column, hex_offset: int = 1) -> Column:
    """Deterministic 32-bit token hash both engines can compute: 8 hex
    chars of md5 starting at ``hex_offset`` (1-based), parsed base-16."""
    return F.conv(F.substring(F.md5(w), hex_offset, 8), 16, 10).cast("long")


def _simhash32_of(hashes: Column) -> Column:
    """32-bit tf-weighted SimHash over an array of 32-bit token hashes:
    bit j is 1 iff the sum over ALL tokens (repeats included — term
    frequency is the weight) of (+1 if bit j of the token hash is set
    else -1) is >= 0. TF weighting discriminates far better than
    distinct-token SimHash on small vocabularies. Bits are extracted
    with floor-divide/mod (not shifts) so the SQL oracle can mirror the
    arithmetic exactly."""
    from pycasselastic_spark.functions.expr import let

    bit_vote = lambda h, j: F.when(  # noqa: E731
        F.pmod(F.floor(h / F.pow(F.lit(2.0), j)).cast("long"), 2) == 1, 1
    ).otherwise(-1)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(0), F.lit(31)), lambda j: bit_vote(h, j)),
            lambda x, y: x + y,
        ),
    )

    # bind the vote-count array ONCE (functions/expr.py:let): the
    # bit-packing transform references it for each of the 32 output
    # bits, and an inlined reference would re-run the whole per-token
    # vote fold 32x per row
    def pack(cnt: Column) -> Column:
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda j: F.when(
                    F.element_at(cnt, j + 1) >= 0,
                    F.pow(F.lit(2.0), j).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return let(counts, pack)


def simhash32(col: Column | str) -> Column:
    """32-bit tf-weighted SimHash of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return _simhash32_of(F.transform(F.split(c, " "), token_hash32))


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit tf-weighted SimHash as two 32-bit halves (``fp_hi`` from
    md5 hex chars 1-8 per token, ``fp_lo`` from chars 9-16) — two longs
    avoid unsigned-64 overflow while keeping the SQL oracle exact."""
    c = F.col(text_col)
    toks = F.split(c, " ")
    return df.select(
        F.col(id_col).alias("_id"),
        _simhash32_of(F.transform(toks, lambda w: token_hash32(w, 1))).alias("fp_hi"),
        _simhash32_of(F.transform(toks, lambda w: token_hash32(w, 9))).alias("fp_lo"),
    )


# --------------------------------------------------------------------------
# operators
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per identical content (the one with the
    smallest ``order_col``). Hash-shuffle on the content digest with
    map-side partial aggregation — the canonical exact dedup at scale."""
    # digest via to_json(struct(...)) — unlike concat_ws it distinguishes
    # NULL from empty string and never lets values from adjacent columns
    # collide after a NULL is skipped
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in content_cols])))
    return (
        df.withColumn("_digest", digest)
        .groupBy("_digest")
        .agg(F.min_by(F.struct(*df.columns), F.col(order_col)).alias("_row"))
        .select([F.col(f"_row.{c}").alias(c) for c in df.columns])
    )


def _guard_bruteforce(df: DataFrame, op: str, scale_twin: str, max_rows: int) -> None:
    """Refuse to run an O(n^2) verification baseline on an input too big
    for it. The count is one column-pruned pass — trivial next to the
    quadratic join it prevents; callers that really want the cross
    product can raise ``max_rows`` explicitly."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{op} is an all-pairs O(n^2) verification baseline; input has "
            f"{n} rows (> max_rows={max_rows}). Use {scale_twin} at scale, "
            f"or pass max_rows explicitly to force the brute-force path."
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_rows: int = 100_000,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard near-dup detection (the brute
    -force baseline; use ``minhash_lsh_pairs`` at scale). Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b. Inputs larger than
    ``max_rows`` are refused (quadratic candidate space) — the LSH twin
    is the scale path.

    Applies the exact size-bound prune from the set-similarity-join
    literature (PPJoin et al.): J(A,B) <= min(|A|,|B|)/max(|A|,|B|),
    so J >= t implies max <= min/t — pairs with incompatible shingle
    counts skip the (expensive) intersection entirely. Lossless: the
    output is identical to the unpruned scan."""
    _guard_bruteforce(df, "ngram_jaccard_pairs", "minhash_lsh_pairs", max_rows)
    # shingles materialized once — both join sides reference them
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh")
    ).localCheckpoint(eager=True)
    a = sh.select(
        F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"), F.size("_sh").alias("_na")
    )
    b = sh.select(
        F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"), F.size("_sh").alias("_nb")
    )
    size_compatible = (
        F.least(F.col("_na"), F.col("_nb"))
        >= F.greatest(F.col("_na"), F.col("_nb")) * F.lit(threshold)
    )
    return (
        a.join(b, (F.col("doc_a") < F.col("doc_b")) & size_compatible)
        .withColumn("jaccard", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 24,
    band_rows: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash + LSH near-dup pairs: shingle -> minhash signature ->
    band buckets -> equi-join candidates -> exact-Jaccard verify.

    Same output contract as ``ngram_jaccard_pairs`` but with no
    all-pairs comparison: candidate generation is an equi-join on
    (band index, band key). With 24 hashes in 12 bands of 2 rows, a
    pair at Jaccard 0.8 is missed with probability (1-0.64)^12 ~= 5e-6;
    tune bands/rows to the target threshold.
    """
    num_bands = num_hashes // band_rows
    # materialize the shingle sets once: they feed the banding
    # projection AND both verify sides, and project-collapse would
    # otherwise inline the shingle expression into every one of the
    # num_hashes signature transforms (num_hashes x shingle work/row)
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh")
    ).localCheckpoint(eager=True)
    sig = minhash_signature(F.col("_sh"), num_hashes)
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", *sig[b * band_rows : (b + 1) * band_rows]))
            for b in range(num_bands)
        ]
    )
    banded = sh.select("_id", F.posexplode(bands).alias("_band_idx", "_band_key"))
    left = banded.select(
        F.col("_id").alias("doc_a"), "_band_idx", "_band_key"
    )
    right = banded.select(
        F.col("_id").alias("doc_b"), "_band_idx", "_band_key"
    )
    candidates = (
        left.join(right, ["_band_idx", "_band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_a = sh.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"))
    sh_b = sh.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"))
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """64-bit SimHash near-dup pairs with pigeonhole blocking: the
    fingerprint is split into 4 x 16-bit chunks; any pair with hamming
    <= 3 must agree exactly on at least one chunk, so candidates come
    from an equi-join on (chunk index, chunk value) — exact, not
    probabilistic. 16-bit chunks keep the candidate buckets small
    (65536 keys per chunk position vs 256 for 8-bit chunks — the
    difference between a skew-free equi-join and a quadratic bucket
    blow-up on clustered fingerprints).

    Fingerprints are computed once and materialized (eager
    localCheckpoint — 3 narrow columns) before the self-join: without
    it Spark recomputes the (expensive) simhash subtree for both join
    sides, and unlike ``.persist()`` the checkpoint blocks are released
    by the ContextCleaner when this DataFrame is garbage-collected
    instead of leaking executor cache for the session's life.
    Output: (doc_a, doc_b, hamming)."""
    if max_hamming > 3:
        raise ValueError("pigeonhole blocking with 4 chunks requires max_hamming <= 3")
    chunk_bits = 16
    fp = simhash_fingerprints(df, id_col, text_col).localCheckpoint(eager=True)
    chunk_of = lambda col, c: F.pmod(  # noqa: E731
        F.floor(F.col(col) / F.pow(F.lit(2.0), c * chunk_bits)).cast("long"),
        F.lit(2**chunk_bits),
    )
    chunks = F.array(
        chunk_of("fp_hi", 0), chunk_of("fp_hi", 1),
        chunk_of("fp_lo", 0), chunk_of("fp_lo", 1),
    )
    blocked = fp.select(
        "_id", "fp_hi", "fp_lo",
        F.posexplode(chunks).alias("_chunk_idx", "_chunk_val"),
    )
    left = blocked.select(
        F.col("_id").alias("doc_a"),
        F.col("fp_hi").alias("_ha"),
        F.col("fp_lo").alias("_la"),
        "_chunk_idx",
        "_chunk_val",
    )
    right = blocked.select(
        F.col("_id").alias("doc_b"),
        F.col("fp_hi").alias("_hb"),
        F.col("fp_lo").alias("_lb"),
        "_chunk_idx",
        "_chunk_val",
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) + F.bit_count(
        F.col("_la").bitwiseXOR(F.col("_lb"))
    )
    # hamming is computed map-side from columns already in the joined
    # row, so filtering BEFORE the distinct shrinks that shuffle from
    # every blocked pair down to just the near-dup pairs (hamming is a
    # pure function of the pair, so filter-then-distinct is equivalent)
    return (
        left.join(right, ["_chunk_idx", "_chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_rows: int = 100_000,
) -> DataFrame:
    """Embedding near-dup pairs by cosine similarity (brute force —
    the verification baseline; the LSH-bucketed scale path lives in
    operators/similarity.py). Inputs larger than ``max_rows`` are
    refused (quadratic pair space). Vectors are unit-normalized once
    per row (linear), so each pair pays exactly one sequential-double
    dot product — bit-identical to the SQL oracle."""
    _guard_bruteforce(df, "embedding_cosine_pairs", "lsh_topk", max_rows)
    from pycasselastic_spark.operators.similarity import dot, with_unit_vector

    unit = with_unit_vector(df, vec_col, "_u")
    a = unit.select(F.col(id_col).alias("doc_a"), F.col("_u").alias("_ua"))
    b = unit.select(F.col(id_col).alias("doc_b"), F.col("_u").alias("_ub"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", dot(F.col("_ua"), F.col("_ub")))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def _lsh_banded(
    unit: DataFrame,
    id_col: str,
    dim: int,
    num_planes: int,
    num_bands: int,
) -> DataFrame:
    """(_id, _band_idx, _band_key) rows for hyperplane-LSH banding of a
    unit-vector DataFrame (column ``_u``). Signatures are computed on
    mean-centered vectors (deterministic Q20 mean — see
    ``similarity.with_centered_vector``) so banding keeps its entropy
    on positive-orthant inputs."""
    from pycasselastic_spark.operators.similarity import (
        _hyperplane,
        dim_mean_vector,
        signature_bits,
        with_centered_vector,
    )

    planes = [_hyperplane(dim, p) for p in range(num_planes)]
    band_width = num_planes // num_bands
    # the one-row mean has exactly ONE consumer here (the centering
    # inside the sigs checkpoint below), so it needs no checkpoint of
    # its own: it is evaluated once, inside the sigs materialization
    # job, as that job's broadcast input. (lsh_topk keeps its own
    # checkpointed mean — there it feeds TWO centering branches.)
    # One fewer driver-coordinated job per banding pass; on sub-second
    # graphs the per-job fixed cost is what dominates.
    means = dim_mean_vector(unit, "_u")
    centered = with_centered_vector(unit, "_u", "_c", means=means)
    # evaluate the signature expression ONCE into a narrow (id, sig)
    # table before banding: substring-ing the expression directly would
    # inline one copy of the (possibly huge — corpus-scaled plane
    # literal) signature tree per band, and the analyzer/codegen walk
    # over num_bands duplicated trees dominates wall-clock long before
    # execution does (measured: 65 s analysis vs 4 s execution at
    # 522 planes x 58 bands). The checkpoint is the index-build
    # materialization every LSH deployment pays anyway.
    sigs = centered.select(
        F.col(id_col).alias("_id"),
        signature_bits(F.col("_c"), planes).alias("_sig"),
    ).localCheckpoint(eager=True)
    bands = F.array(
        *[
            F.substring(F.col("_sig"), b * band_width + 1, band_width)
            for b in range(num_bands)
        ]
    )
    return sigs.select(
        "_id", F.posexplode(bands).alias("_band_idx", "_band_key")
    )


def embedding_lsh_band_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    num_planes: int = 12,
    num_bands: int = 6,
) -> DataFrame:
    """Bucket-occupancy diagnostics for ``embedding_lsh_pairs``:
    (_band_idx, _band_key, bucket_size) per LSH bucket. The candidate
    join's cost is sum(bucket_size^2) — run this (one cheap aggregation,
    no pair join) before committing to an LSH pass over a huge corpus
    to see whether the banding actually prunes on your distribution;
    degenerate inputs show a few giant buckets."""
    from pycasselastic_spark.operators.similarity import with_unit_vector

    unit = with_unit_vector(df, vec_col, "_u")
    return (
        _lsh_banded(unit, id_col, dim, num_planes, num_bands)
        .groupBy("_band_idx", "_band_key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
    )


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    num_planes: int = 12,
    num_bands: int = 6,
) -> DataFrame:
    """LSH-bucketed scale twin of ``embedding_cosine_pairs``: candidate
    pairs come from an equi-join on hyperplane sign-signature bands
    (same md5-derived planes as ``similarity.lsh_topk``), and only
    candidates pay the exact cosine verification against ``threshold``.

    Same output contract (doc_a < doc_b, cosine) but no all-pairs join:
    at 100 TB the band join shuffles by band key instead of building an
    O(n^2) candidate space. A pair at cosine ``c`` shares a sign bit
    with probability 1 - acos(c)/pi; with 12 planes in 6 bands of 2, a
    cosine-0.8 pair is missed with probability ~(1-0.73)^6 ~= 4e-4.
    Recall vs the brute-force baseline is asserted in tests.

    Signatures are computed on mean-centered unit vectors: raw
    sign-hyperplane bucketing is uninformative on positive-orthant
    embeddings (every vector lies on the same side of every plane, so
    every signature collides and candidates degrade toward O(n^2) —
    measured in scripts/scaling_probe.py). The operator centers
    internally with a deterministic Q20 fixed-point mean
    (similarity.dim_mean_vector), so bucket entropy is restored on ANY
    input distribution; the verification cosine still uses the
    original unit vectors, so emitted scores are unchanged.
    """
    from pycasselastic_spark.operators.similarity import dot, with_unit_vector

    # one narrow (id, unit-vector) materialization feeds the banding
    # AND both exact-verify sides — without it each of the three
    # consumers re-inlines the scan + normalization lineage into its
    # plan (same shape as embedding_ivf_pairs' unit checkpoint; the
    # repeated ~250-node analysis of those inlined trees was a
    # measurable slice of this operator's driver time)
    unit = (
        with_unit_vector(df.select(id_col, vec_col), vec_col, "_u")
        .select(id_col, "_u")
        .localCheckpoint(eager=True)
    )
    # banded rows feed both sides of the self-join, but the expensive
    # part — signatures, and the centering mean behind them — is
    # already materialized ONCE inside _lsh_banded's sigs checkpoint;
    # re-deriving the banding (substring + posexplode over the stored
    # signature string) per join side is a narrow in-memory scan, so a
    # second checkpoint here bought nothing but one more
    # driver-coordinated job (round-15: removed, plans verified — both
    # join sides read the same checkpointed sigs RDD)
    banded = _lsh_banded(unit, id_col, dim, num_planes, num_bands)
    left = banded.select(F.col("_id").alias("doc_a"), "_band_idx", "_band_key")
    right = banded.select(F.col("_id").alias("doc_b"), "_band_idx", "_band_key")
    candidates = (
        left.join(right, ["_band_idx", "_band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ua = unit.select(F.col(id_col).alias("doc_a"), F.col("_u").alias("_ua"))
    ub = unit.select(F.col(id_col).alias("doc_b"), F.col("_u").alias("_ub"))
    return (
        candidates.join(ua, "doc_a")
        .join(ub, "doc_b")
        .withColumn("cosine", dot(F.col("_ua"), F.col("_ub")))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def embedding_lsh_pairs_auto(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    target_recall: float = 0.9,
) -> DataFrame:
    """``embedding_lsh_pairs`` with corpus-scaled LSH parameters
    (similarity.lsh_params_for): band width grows with log2(n) so the
    cross-pair collision rate per band is ~1/n and total candidates
    stay ~bands * n (subquadratic), while the band count restores
    ``target_recall`` for pairs at cosine >= ``threshold``. One
    column-pruned count() sizes the parameters — trivial next to the
    quadratic join the wider bands prevent. Prefer this over raw
    ``embedding_lsh_pairs`` for corpora too large to eyeball; the fixed
    -parameter form remains for tuned pipelines.

    Honest boundary: the log2(n) band width is only admissible while
    ``target_recall`` is reachable within the 64-band signature cap.
    At LOW thresholds (near-orthogonal pairs, per-bit agreement
    p1 -> 1/2) the cap binds, lsh_params_for freezes the width at its
    recall-feasible maximum, and candidate volume reverts to
    bands * n^2 / 2^width — a large constant-factor prune (2^8-2^9),
    not an asymptotic one. No sign-LSH parameterization escapes that
    tradeoff; for low-threshold embedding dedup at corpus scale the
    asymptotic path is cell-blocked IVF (``embedding_ivf_pairs``),
    which bounds candidates by sum(cell_size^2) with cells ~ sqrt(n).
    Since the fold-exact signature path (similarity.signature_bits)
    now handles any plane count sequentially, this operator is fully
    value-oracle-replayable: planes, band keys and the exact-cosine
    verify re-derive bit-for-bit in SQL from the corpus count."""
    from pycasselastic_spark.operators.similarity import lsh_params_for

    num_planes, num_bands = lsh_params_for(df.count(), threshold, target_recall)
    return embedding_lsh_pairs(
        df, id_col, vec_col, threshold, dim,
        num_planes=num_planes, num_bands=num_bands,
    )


def embedding_ivf_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_cells: int = 16,
    n_assign: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Cell-blocked embedding near-dup (the clustering-then-compare
    pattern of semantic-dedup systems): assign every vector to its
    ``n_assign`` nearest spherical-k-means cells (multi-assignment — the
    IVF answer to pairs straddling a cell boundary), compare pairs only
    where they share a cell, verify with the exact cosine.

    This is the asymptotically scalable path for embedding dedup:
    sign-band LSH (``embedding_lsh_pairs``) prunes random pairs by a
    roughly constant factor, but cell blocking bounds candidates by
    sum(cell_size^2) ~= (n_assign * n)^2 / n_cells — grow ``n_cells``
    with the corpus (cells ~ sqrt(n) gives linear total pair work per
    vector budget). Recall vs the brute-force baseline is asserted in
    tests. Not SQL-expressible (iterative k-means) -> rows-only driver
    check.
    """
    from pycasselastic_spark.operators.similarity import (
        _assign_cells,
        _train_centroids,
        dot,
        with_unit_vector,
    )

    # materialize the narrow (id, unit-vector) projection ONCE: it
    # feeds the training sample, the assignment pass and BOTH verify
    # sides, and without the checkpoint Catalyst's project-collapse
    # inlines the normalization expression into every centroid dot of
    # the assignment (n_cells copies per row — measured 15 s vs 2 s at
    # 2k x 16 cells)
    unit = (
        with_unit_vector(df.select(id_col, vec_col), vec_col, "_u")
        .select(id_col, "_u")
        .localCheckpoint(eager=True)
    )
    centroids = _train_centroids(unit, id_col, n_cells, seed)
    assigned = (
        _assign_cells(unit, centroids, n_assign, "_cells")
        .select(
            F.col(id_col).alias("_id"),
            F.col("_u"),
            F.explode("_cells").alias("_cell"),
        )
        .localCheckpoint(eager=True)  # the materialized inverted file
    )
    a = assigned.select(F.col("_id").alias("doc_a"), "_cell")
    b = assigned.select(F.col("_id").alias("doc_b"), "_cell")
    cand = (
        a.join(b, "_cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()  # multi-assignment can surface a pair in 2 cells
    )
    ua = unit.select(F.col(id_col).alias("doc_a"), F.col("_u").alias("_ua"))
    ub = unit.select(F.col(id_col).alias("doc_b"), F.col("_u").alias("_ub"))
    return (
        cand.join(ua, "doc_a")
        .join(ub, "doc_b")
        .withColumn("cosine", dot(F.col("_ua"), F.col("_ub")))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def edit_distance_pairs(
    df: DataFrame, id_col: str, text_col: str, max_dist: int = 1
) -> DataFrame:
    """Fuzzy-match pairs within Levenshtein distance ``max_dist``
    (1 or 2 — the ES fuzziness ceiling) via FastSS
    deletion-neighborhood blocking — the entity-resolution primitive
    (typo'd ids, OCR'd names) at corpus scale.

    Candidates come from an equi-join on the depth-``max_dist``
    deletion neighborhood U_d(s) = {s with up to d chars deleted}:
    ed(x, y) <= d only if U_d(x) and U_d(y) intersect (Bocek et al.'s
    FastSS bound — the same machinery the search family's fuzzy
    dictionary stores, ``search_index._deletion_variants_expr``, now
    shared here per the round-9 verdict), so recall is exact — no pair
    space is ever materialized, and the shuffle key is the variant
    string. Depth 1 fans each row out to len+1 variant rows; depth 2
    to ~len^2/2 (quadratic in STRING length, not corpus size — fine
    for name/id-length strings, which is what entity resolution
    matches). The neighborhood join overmatches (up to distance 2d),
    so the ``levenshtein`` verification runs map-side on the joined
    row BEFORE the distinct — the distinct's shuffle carries only true
    matches (the simhash filter-before-distinct lesson). The
    cross-engine value oracle holds at both depths (DuckDB
    ``levenshtein`` agrees with Spark's on unit edit costs).
    """
    if max_dist not in (1, 2):
        raise ValueError(
            f"edit_distance_pairs supports max_dist 1 or 2 (the ES "
            f"fuzziness ceiling), got {max_dist}"
        )
    from pycasselastic_spark.operators.search_index import (
        _deletion_variants_expr,
    )

    name = F.col(text_col)
    variants = (
        df.filter(F.length(name) >= 1)
        .select(
            F.col(id_col).alias("_id"),
            name.alias("term"),
        )
        .select(
            "_id",
            F.col("term").alias("_text"),
            F.explode(
                F.expr(_deletion_variants_expr(max_dist))
            ).alias("_variant"),
        )
    )
    # pin the block join's partition count: the variant relation is a
    # few MB of short strings, so AQE's byte-based coalescing folds the
    # join to ~1 partition — and the join FANS OUT (each bucket
    # contributes C(size,2) candidates) into a levenshtein verify, so
    # one task ends up doing the whole corpus's edit-distance work
    # (measured 1 partition / single-core verify at sf0.1). An explicit
    # repartition by the join key to the cluster's parallelism keeps
    # the verify wide; both sides share the partitioning so the join
    # adds no further exchange. (guide §2.5: compute-heavy stages must
    # not inherit a byte-sized partition count.)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    variants = variants.repartition(n_parts, "_variant")
    left = variants.select(
        F.col("_id").alias("id_a"), F.col("_text").alias("text_a"), "_variant"
    )
    right = variants.select(
        F.col("_id").alias("id_b"), F.col("_text").alias("text_b"), "_variant"
    )
    return (
        left.join(right, "_variant")
        .filter(F.col("id_a") < F.col("id_b"))
        # thresholded levenshtein: banded DP + early exit, identical
        # accept set (returns -1 iff the true distance exceeds the
        # threshold) and identical distances for survivors
        .filter(F.levenshtein("text_a", "text_b", max_dist) != -1)
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
        .withColumn("dist", F.levenshtein("text_a", "text_b", max_dist))
    )


def edit_distance_pairs_grouped(
    df: DataFrame, id_col: str, text_col: str, max_dist: int = 1
) -> DataFrame:
    """``edit_distance_pairs`` with DEDUP-BEFORE-VERIFY — the flood
    dial for duplicate-heavy corpora: when a text value occurs cnt
    times, the pair output of the id-level operator grows as cnt² per
    value (10 exact copies of every name → ~45x the true-pair volume,
    the one genuine super-linear residual of the sf1 ladder), yet
    every one of those pairs carries the SAME (text_a, text_b, dist)
    fact. This variant groups identical texts FIRST, runs the FastSS
    block join over DISTINCT texts only, and returns one row per TEXT
    pair with the id-pair multiplicity as a count:

    ``(text_a, text_b, dist, n_pairs)`` where dist=0 rows are the
    within-group pairs (n_pairs = C(cnt, 2)) and dist>=1 rows carry
    n_pairs = cnt_a * cnt_b — the exact id-pair multiset of the
    ungrouped operator is recoverable by expanding each row against
    the per-text id lists, so no information is lost; the OUTPUT (and
    the verify join, and the distinct's shuffle) shrink from
    O(Σ cnt²) to O(distinct-text pairs).

    Plan shape: one hash groupBy on the text (map-side partial), the
    same variant equi-join as the base operator but over the deduped
    relation, levenshtein verify map-side before the distinct."""
    if max_dist not in (1, 2):
        raise ValueError(
            f"edit_distance_pairs supports max_dist 1 or 2 (the ES "
            f"fuzziness ceiling), got {max_dist}"
        )
    from pycasselastic_spark.operators.search_index import (
        _deletion_variants_expr,
    )

    base = (
        df.filter(F.length(F.col(text_col)) >= 1)
        .groupBy(F.col(text_col).alias("_text"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    same = base.filter(F.col("_cnt") >= 2).select(
        F.col("_text").alias("text_a"),
        F.col("_text").alias("text_b"),
        F.lit(0).cast("int").alias("dist"),
        F.expr("_cnt * (_cnt - 1) div 2").cast("long").alias("n_pairs"),
    )
    variants = base.withColumnRenamed("_text", "term").select(
        "term",
        "_cnt",
        F.explode(
            F.expr(_deletion_variants_expr(max_dist))
        ).alias("_variant"),
    )
    # same AQE-coalescing guard as edit_distance_pairs: the deduped
    # variant relation is byte-tiny but the block join fans out into
    # the levenshtein verify — keep the verify at cluster parallelism
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    variants = variants.repartition(n_parts, "_variant")
    left = variants.select(
        F.col("term").alias("text_a"), F.col("_cnt").alias("_cnt_a"),
        "_variant",
    )
    right = variants.select(
        F.col("term").alias("text_b"), F.col("_cnt").alias("_cnt_b"),
        "_variant",
    )
    cross = (
        left.join(right, "_variant")
        .filter(F.col("text_a") < F.col("text_b"))
        .filter(F.levenshtein("text_a", "text_b", max_dist) != -1)
        .select("text_a", "text_b", "_cnt_a", "_cnt_b")
        .distinct()
        .select(
            "text_a", "text_b",
            F.levenshtein("text_a", "text_b", max_dist)
            .cast("int").alias("dist"),
            (F.col("_cnt_a") * F.col("_cnt_b")).cast("long").alias("n_pairs"),
        )
    )
    return same.unionByName(cross)


def passage_duplicate_stats(
    df: DataFrame, id_col: str, text_col: str, passage_tokens: int = 10
) -> DataFrame:
    """Per-document duplicated-passage share: split each document into
    consecutive non-overlapping ``passage_tokens``-token passages, hash
    each, and report how many of a document's passages also occur in at
    least one OTHER document — the passage-granularity exact-substring
    dedup signal (boilerplate headers, license blocks, templated spans)
    that doc-level exact dedup misses.

    Returns ``(id_col, n_passages, n_dup_passages, dup_share)``.

    Scale shape: the passage relation is linear in token count (each
    token appears in exactly one passage); duplicate detection is one
    hash-shuffle on the passage digest with map-side partial
    aggregation (count + distinct-doc count via min/max compare), then
    a digest-keyed join back and a per-doc aggregation. No pair space,
    no windows. The passage split itself is a pure JVM transform
    (sequence + slice + array_join) — no Python in the hot path.
    """
    toks = F.split(F.col(text_col), " ")
    n_pass = F.ceil(F.size(toks) / F.lit(float(passage_tokens))).cast("int")
    # guard the empty-text case: sequence(0, -1) DESCENDS in Spark
    passages = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_pass - 1),
            lambda i: F.array_join(
                F.slice(toks, i * passage_tokens + 1, passage_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = df.select(
        F.col(id_col).alias("_id"), F.explode(passages).alias("_p")
    ).select("_id", F.md5("_p").alias("_ph"))
    # one bounded aggregation per distinct passage: does it appear in
    # >= 2 distinct documents? (min != max over doc ids is exact for
    # the >=2 test and cheaper than a distinct count)
    cross_doc = occ.groupBy("_ph").agg(
        (F.min("_id") != F.max("_id")).alias("_is_dup")
    )
    return (
        occ.join(cross_doc, "_ph")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("_is_dup"), 1).otherwise(0)).alias(
                "n_dup_passages"
            ),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_passages",
            "n_dup_passages",
            (F.col("n_dup_passages") / F.col("n_passages")).alias("dup_share"),
        )
    )


class MinHashBandIndex(NamedTuple):
    """A prebuilt MinHash-LSH corpus index plus the hash-family
    parameters it was built with. The parameters travel WITH the index
    so a probe built with a different family can't silently produce
    zero band collisions (band keys are md5 over parameter-dependent
    signatures — a mismatch looks exactly like "no duplicates")."""

    shingle_rel: DataFrame  # (_id, _sh)
    band_rel: DataFrame  # (_id, _band_idx, _band_key)
    n: int
    num_hashes: int
    band_rows: int


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 24,
    band_rows: int = 2,
    materialize: bool = False,
) -> MinHashBandIndex:
    """The MinHash-LSH "index" of a corpus: the shingle-set relation
    ``(_id, _sh)`` and the exploded band relation
    ``(_id, _band_idx, _band_key)``, tagged with the hash-family
    parameters (:class:`MinHashBandIndex`).

    The hash family is data-independent (md5 of the shingle, fixed
    band layout), so this pair is a pure function of each document:
    in production it is computed once, stored beside the corpus
    (band relation partitioned by band key), and reused across every
    ingest. ``materialize=True`` additionally localCheckpoints the
    band relation — pass it when the index is probed repeatedly in
    one session (e.g. per micro-batch in a stream) so the banding is
    not recomputed per probe.
    """
    num_bands = num_hashes // band_rows
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh")
    ).localCheckpoint(eager=True)
    sig = minhash_signature(F.col("_sh"), num_hashes)
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", *sig[b * band_rows : (b + 1) * band_rows]))
            for b in range(num_bands)
        ]
    )
    banded = sh.select("_id", F.posexplode(bands).alias("_band_idx", "_band_key"))
    if materialize:
        banded = banded.localCheckpoint(eager=True)
    return MinHashBandIndex(sh, banded, n, num_hashes, band_rows)


def minhash_lsh_pairs_between(
    base: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 24,
    band_rows: int = 2,
    threshold: float = 0.6,
    base_index: MinHashBandIndex | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup: pairs between an existing
    ``base`` corpus and a newly-arrived ``delta`` batch ONLY — the
    production curation loop, where each ingest must be deduped
    against the accumulated corpus without re-comparing the corpus to
    itself.

    Candidate generation is the band equi-join of base bands x delta
    bands: base x base and delta x delta collisions never materialize,
    so per-ingest work scales with |delta|, not |corpus|. Pass
    ``base_index`` (from :func:`minhash_band_index`) to amortize the
    base-side banding across repeated ingests — the stored-index shape;
    otherwise it is derived from ``base`` here.

    Returns ``(base_id, delta_id, jaccard)`` with exact-Jaccard
    verification at ``threshold``.
    """
    if base_index is not None:
        got = (base_index.n, base_index.num_hashes, base_index.band_rows)
        want = (n, num_hashes, band_rows)
        if got != want:
            raise ValueError(
                "base_index hash-family mismatch: index built with "
                f"(n, num_hashes, band_rows)={got} but probe uses {want}; "
                "a mismatched family silently yields zero band collisions, "
                "so it is rejected instead"
            )
        sh_base, banded_base = base_index.shingle_rel, base_index.band_rel
    else:
        idx = minhash_band_index(
            base, id_col, text_col, n=n, num_hashes=num_hashes, band_rows=band_rows
        )
        sh_base, banded_base = idx.shingle_rel, idx.band_rel
    delta_idx = minhash_band_index(
        delta, id_col, text_col, n=n, num_hashes=num_hashes, band_rows=band_rows
    )
    sh_delta, banded_delta = delta_idx.shingle_rel, delta_idx.band_rel
    candidates = (
        banded_base.select(F.col("_id").alias("base_id"), "_band_idx", "_band_key")
        .join(
            banded_delta.select(
                F.col("_id").alias("delta_id"), "_band_idx", "_band_key"
            ),
            ["_band_idx", "_band_key"],
        )
        .select("base_id", "delta_id")
        .distinct()
    )
    return (
        candidates.join(
            sh_base.select(F.col("_id").alias("base_id"), F.col("_sh").alias("_sha")),
            "base_id",
        )
        .join(
            sh_delta.select(
                F.col("_id").alias("delta_id"), F.col("_sh").alias("_shb")
            ),
            "delta_id",
        )
        .withColumn("jaccard", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard") >= threshold)
        .select("base_id", "delta_id", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection by shingle containment:
    pairs where C(A -> B) = |A ∩ B| / |A| >= ``threshold`` — "document
    A is (mostly) contained in document B". Symmetric Jaccard misses
    exactly this case when |B| >> |A| (a paragraph quoted inside a
    much longer page scores low Jaccard but containment 1.0), which is
    why dedup literature treats containment as its own primitive
    (Broder's resemblance vs containment distinction).

    Output: ``(doc_inner, doc_outer, shared, n_inner, containment)``
    with ``doc_inner != doc_outer`` (both directions can appear — the
    relation is not symmetric).

    Scale shape: candidates come from an equi-join of exploded DISTINCT
    shingles (posting-list self-join keyed by shingle — the same
    single-key shuffle as the LSH band join, never an all-pairs scan),
    then one hash aggregation counts shared shingles per surviving
    pair. ``max_shingle_df`` drops shingles appearing in more than
    that many docs from the JOIN SIDES ONLY — boilerplate shingles are
    the skew/fan-out hazard at corpus scale (a shingle shared by 10k
    docs contributes 10^8 candidate rows). The denominator ``n_inner``
    is counted over the UNFILTERED shingle set: dropping a shingle can
    then only shrink the numerator (``shared``), never the
    denominator, so measured containment can only DECREASE — the
    filter is precision-safe, and recall on boilerplate-heavy pairs is
    the dial. (Counting ``n_inner`` after the filter would RAISE
    containment for docs whose dropped shingles are absent from the
    partner doc, letting below-threshold pairs through.)
    """
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles(text_col, n)).alias("_s")
    )
    # full per-doc shingle count BEFORE any df-based pruning: the
    # containment denominator must be the doc's true shingle-set size
    counts = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("_s")
        )
        sh = sh.join(rare, "_s")
    a = sh.select(F.col("_id").alias("doc_inner"), "_s")
    b = sh.select(F.col("_id").alias("doc_outer"), "_s")
    shared = (
        a.join(b, "_s")
        .filter(F.col("doc_inner") != F.col("doc_outer"))
        .groupBy("doc_inner", "doc_outer")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            counts.select(F.col("_id").alias("doc_inner"), F.col("_n").alias("n_inner")),
            "doc_inner",
        )
        .withColumn("containment", F.col("shared") / F.col("n_inner"))
        .filter(F.col("containment") >= threshold)
        .select("doc_inner", "doc_outer", "shared", "n_inner", "containment")
    )


def duplicate_span_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 8,
) -> DataFrame:
    """Per-document coverage by cross-document duplicated token SPANS:
    every OVERLAPPING ``window_tokens``-token window (stride 1) is
    hashed; a window occurring in >= 2 distinct documents is a
    duplicated span, and a document's coverage is the UNION length of
    its duplicated windows' intervals — the exact-substring dedup
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), which masks repeated spans instead of
    dropping whole documents. ``passage_duplicate_stats`` is the
    cheaper non-overlapping approximation; stride-1 windows catch
    spans that straddle passage boundaries and the interval union
    yields a token-exact mask length.

    Tokens are raw single-space slots (split keeps empties — both
    engines agree on the array, so window identity is byte-exact).
    Returns ``(id_col, n_tokens, n_dup_windows, covered_tokens,
    covered_share_q20)`` for documents holding at least one
    duplicated window.

    Scale shape: the window relation is ~1 row per token (linear);
    duplicate detection is ONE hash-shuffle on the window digest with
    the min!=max distinct-doc test (map-side partials); the digest
    join back is an equi-join; the interval union is a running-max
    window PARTITIONED BY document — state bounded by one document's
    length, never global. No pair space anywhere.
    """
    from pyspark.sql.window import Window

    w = int(window_tokens)
    occ = _dup_span_occurrences(df, id_col, text_col, w)
    prev = (
        Window.partitionBy("_id")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = occ.select(
        "_id",
        F.greatest(
            F.lit(0),
            (F.col("_s") + w)
            - F.greatest(
                F.col("_s"),
                F.coalesce(F.max(F.col("_s") + w).over(prev), F.lit(0)),
            ),
        ).alias("_c"),
    )
    per_doc = cov.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sum("_c").cast("long").alias("covered_tokens"),
    )
    lens = df.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    return (
        per_doc.join(lens, "_id")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "n_dup_windows",
            "covered_tokens",
            F.floor(
                (F.col("covered_tokens") / F.col("n_tokens"))
                * F.lit(float(1 << 20))
            ).cast("long").alias("covered_share_q20"),
        )
    )


def _dup_span_occurrences(
    df: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """Shared span-dedup core: ``(_id, _s)`` occurrences of every
    overlapping ``w``-token window (1-based start) that appears in
    >= 2 DISTINCT documents. One ~row-per-token window relation, one
    digest hash-shuffle with the min!=max distinct-doc test, one
    equi-join back — no pair space."""
    toks = F.split(F.col(text_col), " ")
    n_win = F.size(toks) - w + 1
    starts = F.when(
        n_win >= 1, F.sequence(F.lit(1), n_win)
    ).otherwise(F.array().cast("array<int>"))
    wins = df.select(
        F.col(id_col).alias("_id"),
        F.explode(starts).alias("_s"),
        toks.alias("_tk"),
    ).select(
        "_id", "_s",
        F.md5(F.array_join(F.slice("_tk", F.col("_s"), w), " ")).alias("_wh"),
    )
    cross_doc = wins.groupBy("_wh").agg(
        (F.min("_id") != F.max("_id")).alias("_is_dup")
    )
    return (
        wins.join(cross_doc, "_wh")
        .filter(F.col("_is_dup"))
        .select("_id", "_s")
    )


def span_dedup_rewrite(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 8,
) -> DataFrame:
    """The APPLY twin of ``duplicate_span_coverage``: REMOVE every
    token covered by a cross-document duplicated span and rebuild the
    text from the kept tokens — span-level dedup as Lee et al. 2022
    actually apply it (mask the repeated substring, keep the document)
    instead of dropping whole near-duplicate documents.

    Returns every document: ``(id_col, n_tokens, kept_tokens,
    cleaned_text)`` — untouched docs pass through with their original
    token stream (cleaned_text re-joined on single spaces, the
    tokenizer's inverse).

    Scale shape: the duplicated-window detection is the shared
    ``_dup_span_occurrences`` core; per-doc duplicated starts fold to
    ONE array per doc (bounded by the doc's own window count), and the
    token mask is a per-row JVM higher-order filter — position p
    drops iff some start s satisfies s <= p < s+w. No window
    functions, no second shuffle beyond the per-doc fold."""
    w = int(window_tokens)
    occ = _dup_span_occurrences(df, id_col, text_col, w)
    starts = occ.groupBy("_id").agg(
        F.sort_array(F.collect_list("_s")).alias("_starts")
    )
    toks = F.split(F.col(text_col), " ")
    joined = df.select(F.col(id_col), toks.alias("_tk")).join(
        starts.withColumnRenamed("_id", id_col), id_col, "left"
    )
    st = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    kept_pos = F.filter(
        F.sequence(F.lit(1), F.size("_tk")),
        lambda p: ~F.exists(st, lambda s: (p >= s) & (p < s + w)),
    )
    return joined.select(
        F.col(id_col),
        F.size("_tk").cast("long").alias("n_tokens"),
        F.size(kept_pos).cast("long").alias("kept_tokens"),
        F.array_join(
            F.transform(kept_pos, lambda p: F.element_at("_tk", p)), " "
        ).alias("cleaned_text"),
    )


def semdedup_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int = 64,
    num_planes: int | None = None,
    num_bands: int | None = None,
    target_recall: float = 0.6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    deduplication by embedding clusters — find groups of
    semantically-duplicate documents (cosine >= threshold), keep ONE
    representative per group and flag the rest for removal. The keep
    rule is the paper's: within a duplicate group, keep the member
    with the LOWEST cosine to the group centroid (the most atypical
    example preserves diversity; the near-centroid copies are the
    redundant mass). Returns one row per DUP-GROUP MEMBER:
    ``(<id>, component, cos_c_q20, keep)`` — docs outside any group
    are implicitly kept and not emitted.

    Determinism: candidate pairs come from the md5-hyperplane LSH
    banding (``embedding_lsh_pairs`` — replayable in SQL), components
    from large/small-star propagation (order-free fixed point), the
    group centroid from Q20 fixed-point coordinate sums
    (order-independent integer accumulation), the cosine one
    sequential fold, and the keep decision an argmin on
    (floor(cos x 2^20), id).

    Scale: pair space is band-bounded, components touch only dup
    members, the centroid reduction is keyed by (component, dim) —
    nothing corpus-sized shuffles; this is the embedding-space twin
    of ``neardup_cluster_dedup``."""
    from pycasselastic_spark.operators.components import (
        connected_components,
    )
    from pycasselastic_spark.operators.similarity import (
        dot,
        with_unit_vector,
    )

    q20 = 1048576.0
    if (num_planes is None) != (num_bands is None):
        raise ValueError("pass both num_planes and num_bands, or neither")
    if num_planes is None:
        # CORPUS-SCALED banding (lsh_params_for): fixed small bands
        # give a constant candidate FRACTION — measured 27x at 10x
        # data on the 12/6 configuration — while band width ~ log2(n)
        # keeps candidates ~bands x n (subquadratic)
        from pycasselastic_spark.operators.similarity import (
            lsh_params_for,
        )

        num_planes, num_bands = lsh_params_for(
            df.count(), threshold, target_recall
        )
    pairs = embedding_lsh_pairs(
        df, id_col, vec_col, threshold, dim,
        num_planes=num_planes, num_bands=num_bands,
    )
    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    unit = with_unit_vector(df.select(id_col, vec_col), vec_col, "_u")
    # members (dup-group rows only — bounded by the pair graph, not the
    # corpus) feeds THREE consumers: the centroid aggregation, the
    # scoring join and (through scored) the keeper argmin. Materialize
    # it once instead of re-running the corpus scan + normalization +
    # join per consumer (guide §5: cache exactly the reused-and-
    # expensive intermediate; the frame is small by construction).
    members = comp.join(unit.select(id_col, "_u"), id_col).localCheckpoint(
        eager=True
    )
    cent = (
        members.select(
            "component", F.posexplode("_u").alias("_pos", "_v")
        )
        .groupBy("component", "_pos")
        .agg(
            (
                F.sum(F.floor(F.col("_v") * q20).cast("long"))
                .cast("double")
                / (F.lit(q20) * F.count(F.lit(1)))
            ).alias("_m")
        )
        .groupBy("component")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_m"))
            ).alias("_pm")
        )
        .select(
            "component",
            F.transform(F.col("_pm"), lambda s: s["_m"]).alias("_cv"),
        )
    )
    cent = with_unit_vector(cent, "_cv", "_cu").select("component", "_cu")
    scored = (
        members.join(F.broadcast(cent), "component")
        .withColumn(
            "cos_c_q20",
            F.floor(dot(F.col("_u"), F.col("_cu")) * q20).cast("long"),
        )
        .select(id_col, "component", "cos_c_q20")
    )
    keeper = scored.groupBy("component").agg(
        F.min(F.struct("cos_c_q20", id_col)).alias("_k")
    ).select("component", F.col(f"_k.{id_col}").alias("_keep_id"))
    return (
        scored.join(F.broadcast(keeper), "component")
        .withColumn("keep", F.col(id_col) == F.col("_keep_id"))
        .select(id_col, "component", "cos_c_q20", "keep")
        .orderBy("component", id_col)
    )
