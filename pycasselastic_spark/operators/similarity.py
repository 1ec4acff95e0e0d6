"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exactness baseline, and a
hyperplane-LSH bucketed variant as the scale path.

Scale notes: brute force is a broadcast nested loop (queries broadcast,
corpus streamed — linear in corpus size, no shuffle of the corpus).
The LSH variant buckets both sides by sign-pattern bands so each query
only scores its candidate buckets; recall is tunable via bands/bits
(verified against brute force in tests). Everything is built-in column
expressions — sequential-double dot products, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (cross-engine bit-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def with_unit_vector(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Attach a double unit vector — normalize ONCE per row so pairwise
    scoring is a single dot product instead of dot+2 norms. At n² pair
    volume this cuts per-pair work 3x; the normalization itself is a
    narrow, linear pass."""
    return df.withColumn("_norm", norm(F.col(vec_col))).withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")),
    ).drop("_norm")


def dim_mean_vector(df: DataFrame, vec_col: str) -> DataFrame:
    """One-row DataFrame holding the per-dimension mean of ``vec_col``
    as ``_mean`` (array<double>).

    The mean is accumulated in Q20 fixed point — ``floor(v * 2^20)`` as
    bigint; scaling by a power of two is exact in binary floating point
    and the integer sum is order-independent — so the result is
    bit-identical across engines, partitionings and shuffle orders. A
    raw double sum would vary with reduce order and flip downstream
    sign decisions nondeterministically. Cost: one posexplode + one
    partial-aggregated shuffle of ``dim`` keys; at cluster scale this
    is computed once per corpus and persisted with the index."""
    q = F.floor(F.col("val").cast("double") * F.lit(1048576.0)).cast("bigint")
    return (
        df.select(F.posexplode(vec_col).alias("pos", "val"))
        .select("pos", q.alias("q"))
        .groupBy("pos")
        .agg(
            (F.sum("q").cast("double") / (F.lit(1048576.0) * F.count(F.lit(1)))).alias(
                "m"
            )
        )
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.transform("pm", lambda s: s["m"]).alias("_mean"))
    )


def with_centered_vector(
    df: DataFrame, vec_col: str, out_col: str, means: DataFrame | None = None
) -> DataFrame:
    """Attach ``out_col`` = ``vec_col`` minus the per-dimension corpus
    mean (broadcast of the one-row ``dim_mean_vector`` result).

    Why: sign-hyperplane LSH signatures are uninformative on
    positive-orthant embeddings — every vector lies on the same side of
    every md5-derived plane, every signature collides, and the
    candidate space degrades to O(n^2). Centering restores bucket
    entropy; it does not change which pairs are near-duplicates because
    verification scoring still uses the original vectors. Pass
    ``means`` to center one side by another's distribution (queries by
    the corpus mean, so both sides land in consistent buckets)."""
    if means is None:
        means = dim_mean_vector(df, vec_col)
    return (
        df.crossJoin(F.broadcast(means))
        .withColumn(
            out_col, F.zip_with(F.col(vec_col), F.col("_mean"), lambda x, m: x - m)
        )
        .drop("_mean")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k nearest corpus
    vectors (self-matches excluded when ids collide). Queries are
    broadcast; the corpus is scanned once.

    Output: (query_id, match_id, cosine), deterministic under ties via
    the match id."""
    query_id_col = query_id_col or id_col
    q = with_unit_vector(queries, vec_col, "_qu").select(
        F.col(query_id_col).alias("query_id"), "_qu"
    )
    c = with_unit_vector(corpus, vec_col, "_cu").select(
        F.col(id_col).alias("match_id"), "_cu"
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", dot(F.col("_qu"), F.col("_cu")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component d is
    +1/-1 from a bit of md5, reproducible everywhere (no RNG state)."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}:dim{d}".encode()).digest()
        comps.append(1.0 if h[0] & 1 else -1.0)
    return comps


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """LSH sign signature: bit p = (dot(vec, plane_p) >= 0), folded in
    sequential double order — bit-exact against the SQL oracles' per-
    plane ``list_sum`` replay at ANY plane count, so this path may back
    oracle-replayed queries.

    Two shapes of the same sequential computation: up to 32 planes, an
    unrolled per-plane expression (widest codegen); beyond that, the
    fold-order-exact Arrow path (``_signature_bits_arrow``) — the
    interpreted higher-order-function expression it replaces paid
    planes x dim lambda evaluations PER ROW (measured 17.8 s for 2,000
    rows at 522 planes; the Arrow path computes the identical bits in
    under a second). For bulk rows-only signatures the BLAS matmul
    twin below is fastest of all; its pairwise accumulation can flip a
    bit on a dot within rounding of zero, so it must never back an
    oracle-replayed query. Large plane counts come from
    ``lsh_params_for`` scaling with corpus size."""
    if len(planes) <= 32:
        bits = []
        for plane in planes:
            p = F.array(*[F.lit(x) for x in plane])
            bits.append(F.when(dot(vec, p) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)
    return _signature_bits_arrow(vec, planes)


def _signature_bits_hof(vec: Column, planes: list[list[float]]) -> Column:
    """The pre-round-14 large-plane-count expression: planes ship as
    ONE literal array<array<double>> (per-element F.lit would cost one
    py4j round-trip per component, ~70 s of driver time at 522 x 64)
    and a ``transform`` lambda folds each dot sequentially. Kept as the
    parity reference for ``_signature_bits_arrow`` (tests assert the
    two produce byte-identical signatures); interpreted HOF evaluation
    makes it ~20x slower than the Arrow path at 522 planes."""
    planes_sql = ",".join(
        "array(" + ",".join(f"{repr(float(x))}D" for x in plane) + ")"
        for plane in planes
    )
    planes_lit = F.expr(f"array({planes_sql})")
    return F.array_join(
        F.transform(
            planes_lit,
            lambda p: F.when(dot(vec, p) >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


def _signature_bits_arrow(vec: Column, planes: list[list[float]]) -> Column:
    """Arrow-batched sign signature with the EXACT sequential fold
    order — unlike ``signature_bits_matmul`` this MAY back
    oracle-replayed queries. Bit-exactness argument: plane components
    are exactly +/-1.0, so each product x_d * p_d is exact; the
    accumulator adds those products in ascending dimension order with
    one elementwise numpy add per dimension — the same
    ((0.0 + t_0) + t_1) + ... chain as the ``aggregate`` fold (and the
    SQL oracles' ``list_sum``), never a pairwise/BLAS reduction.
    Null or non-``dim``-length vectors produce the all-zeros signature,
    exactly like the expression path (``zip_with`` pads with null, null
    poisons the fold, and ``null >= 0`` is false for every plane). A
    null ELEMENT is handled by a Column-level guard BEFORE the UDF:
    Arrow converts a SQL NULL element to NaN, which inside the UDF is
    indistinguishable from a true NaN element — but the two diverge in
    the expression path (null poisons the fold and ``null >= 0`` is
    false -> all-'0'; NaN orders ABOVE every number in Spark SQL ->
    all-'1'), so rows with a null element short-circuit to all-zeros
    without entering the UDF. A true NaN element still NaN-poisons the
    in-UDF fold and emits all-'1', matching the expression path."""
    from pyspark.sql.functions import pandas_udf

    pmat = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    dim, n_planes = pmat.shape
    zeros = "0" * n_planes

    @pandas_udf("string")
    def sig(vecs: pd.Series) -> pd.Series:
        rows: list[np.ndarray | None] = []
        for v in vecs:
            if v is None:
                rows.append(None)
                continue
            try:
                a = np.asarray(v, dtype=np.float64)
            except (TypeError, ValueError):
                # object-typed row (e.g. an embedded None the dtype
                # cast rejects): the expression path's fold is null-
                # poisoned for every plane -> all-zeros signature
                rows.append(None)
                continue
            rows.append(a if a.shape == (dim,) else None)
        good = [a for a in rows if a is not None]
        out: list[str] = []
        if good:
            x = np.stack(good)  # (n_good, dim)
            acc = np.zeros((x.shape[0], n_planes))
            for d in range(dim):
                # sequential fold order: acc_d = acc_{d-1} + x_d * p_d,
                # one exact elementwise add per dimension
                acc += x[:, d, None] * pmat[d]
            # '0'/'1' bytes per (row, plane). Spark SQL orders NaN
            # ABOVE every number (NaN >= 0 is true there, false in
            # IEEE/numpy), so a NaN fold must emit '1'; -0.0 >= 0 is
            # true in both.
            bits = (acc >= 0.0) | np.isnan(acc)
            chars = (bits.astype(np.uint8) + 48).tobytes()
            strs = iter(
                chars[i * n_planes:(i + 1) * n_planes].decode("ascii")
                for i in range(x.shape[0])
            )
            out = [zeros if a is None else next(strs) for a in rows]
        else:
            out = [zeros] * len(rows)
        return pd.Series(out, dtype=object)

    # null-ELEMENT guard (see docstring): the expression path emits
    # all-'0' for a vector containing a SQL NULL element, but Arrow
    # nulls become NaN before the UDF sees them and would emit all-'1'
    return F.when(
        F.exists(vec, lambda x: x.isNull()), F.lit(zeros)
    ).otherwise(sig(vec))


def signature_bits_matmul(vec: Column, planes: list[list[float]]) -> Column:
    """Arrow-batched matmul twin of ``signature_bits`` for rows-only /
    recall paths: one (batch x dim) @ (dim x planes) BLAS product per
    batch — the documented Pandas-UDF edge for dense numeric kernels —
    at the cost of pairwise accumulation order (a sign-boundary dot can
    differ from the sequential fold, so never behind a value oracle)."""
    from pyspark.sql.functions import pandas_udf

    pmat = np.asarray(planes, dtype=np.float64).T  # (dim, planes)

    @pandas_udf("string")
    def sig(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype=str)
        bits = (x @ pmat) >= 0
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    return sig(vec)


def lsh_params_for(
    n_rows: int, threshold: float, target_recall: float = 0.9
) -> tuple[int, int]:
    """(num_planes, num_bands) for sign-hyperplane LSH, scaled to the
    corpus so candidate volume stays subquadratic (Indyk-Motwani).

    Fixed parameters give LSH a constant candidate FRACTION — on a
    diverse corpus two unrelated vectors sit near 90 degrees, agree on
    each sign bit with p2 ~= 1/2, and collide on a w-bit band with
    probability 2^-w; unless w grows with the corpus, candidates are
    Theta(n^2 / 2^w). So: band width w = ceil(log2 n) drives expected
    cross-pair collisions per band to B * n^2 * 2^-w ~= B * n (linear),
    and the band count B = ceil(ln(1-R) / ln(1 - p1^w)) restores recall
    R for pairs at cosine >= ``threshold`` (per-bit agreement
    p1 = 1 - acos(t)/pi). Total work: n * B * w signature bits (linear,
    one Arrow matmul per batch) + ~B * n candidate verifications —
    n^(1+rho) in the classic analysis, instead of n^2.

    The band count is capped at 64 (signature cost is linear in
    bands * w). When the cap binds, the band width is narrowed step by
    step — each step halves the per-band miss rate at the cost of ~2x
    the candidate volume — until ``target_recall`` is reachable within
    the cap or w hits its floor of 8; if it still binds there, a
    ``UserWarning`` reports the achievable recall instead of silently
    under-delivering."""
    import math
    import warnings

    if not 0.0 < target_recall < 1.0:
        raise ValueError(
            f"target_recall must be in (0, 1), got {target_recall!r} "
            "(1.0 is unreachable for any finite band count)"
        )
    max_bands = 64
    w = max(2, math.ceil(math.log2(max(n_rows, 4))))
    p1 = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi

    def bands_needed(width: int) -> int:
        hit = p1**width
        if hit >= 1.0:
            return 1
        return math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - hit))

    while w > 8 and bands_needed(w) > max_bands:
        w -= 1
    needed = bands_needed(w)
    if needed > max_bands:
        achievable = 1.0 - (1.0 - p1**w) ** max_bands
        warnings.warn(
            f"lsh_params_for: target_recall={target_recall} needs {needed} "
            f"bands at width {w}, above the {max_bands}-band cap; achievable "
            f"recall is ~{achievable:.3f}. Raise threshold or accept lower "
            "recall.",
            UserWarning,
            stacklevel=2,
        )
    bands = max(2, min(needed, max_bands))
    return w * bands, bands


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
    num_planes: int = 12,
    num_bands: int = 4,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Both sides get a ``num_planes``-bit sign signature split into
    ``num_bands`` bands; a corpus vector is scored for a query only if
    they share at least one band — an equi-join on (band index, band
    bits) instead of a cross join. Exactness degrades gracefully:
    vectors at small angle share sign bits with high probability
    (P[bit equal] = 1 - theta/pi). Recall vs brute force is asserted in
    tests; raise ``num_planes``/lower ``num_bands`` for more recall.

    Signatures are computed on mean-centered unit vectors (both sides
    centered by the CORPUS mean, deterministically — see
    ``with_centered_vector``): on positive-orthant embeddings raw sign
    signatures all collide and banding stops pruning. Scoring still
    uses the uncentered unit vectors, so returned cosines are exact.
    """
    query_id_col = query_id_col or id_col
    planes = [_hyperplane(dim, p) for p in range(num_planes)]
    band_width = num_planes // num_bands

    def with_bands(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        # evaluate the signature once into a narrow (id, sig) row
        # before fanning out num_bands substring branches — the same
        # anti-inlining shape as dedup._lsh_banded (each substring
        # would otherwise carry its own copy of the signature tree,
        # which itself inlines the centering + normalization chain)
        sigs = df.select(
            F.col(idc).alias(out_id),
            signature_bits(F.col("_cvec"), planes).alias("_sig"),
        ).localCheckpoint(eager=True)
        bands = F.array(
            *[
                F.substring(F.col("_sig"), b * band_width + 1, band_width)
                for b in range(num_bands)
            ]
        )
        return sigs.select(
            out_id,
            F.posexplode(bands).alias("_band_idx", "_band_key"),
        )

    # narrow unit projections materialized once: each feeds the mean,
    # the centering/banding branch AND the exact-scoring branch
    uq = (
        with_unit_vector(queries.select(query_id_col, vec_col), vec_col, vec_col)
        .select(query_id_col, vec_col)
        .localCheckpoint(eager=True)
    )
    uc = (
        with_unit_vector(corpus.select(id_col, vec_col), vec_col, vec_col)
        .select(id_col, vec_col)
        .localCheckpoint(eager=True)
    )
    # materialize the one-row mean: it feeds BOTH centering branches, and
    # without a checkpoint each branch re-runs the full-corpus
    # posexplode+groupBy that computes it
    corpus_mean = dim_mean_vector(uc, vec_col).localCheckpoint(eager=True)
    qb = with_bands(
        with_centered_vector(uq, vec_col, "_cvec", corpus_mean), query_id_col, "query_id"
    )
    cb = with_bands(
        with_centered_vector(uc, vec_col, "_cvec", corpus_mean), id_col, "match_id"
    )
    # dedup candidate PAIRS on ids only (distinct over 64-dim arrays is
    # a needless wide-row shuffle), then re-attach the unit vectors
    candidates = (
        qb.select("query_id", "_band_idx", "_band_key")
        .join(cb.select("match_id", "_band_idx", "_band_key"), ["_band_idx", "_band_key"])
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id")
        .distinct()
    )
    qv = uq.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = uc.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv"))
    scored = (
        candidates.join(F.broadcast(qv), "query_id")
        .join(cv, "match_id")
        .withColumn("cosine", dot(F.col("_qv"), F.col("_cv")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _spherical_kmeans(
    vectors: list[list[float]], n_cells: int, seed: int, iters: int
) -> list[tuple[int, list[float]]]:
    """Seeded Lloyd iterations on unit vectors with cosine assignment
    (argmax dot == argmin Euclidean on the unit sphere); centroids are
    re-normalized each round so dot-product ranking against them stays
    scale-free. Runs on a driver-side bounded sample only — never the
    corpus."""
    x = np.asarray(vectors, dtype=np.float64)
    rng = np.random.RandomState(seed)
    k = min(n_cells, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):  # empty cell keeps its previous centroid
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[j] = m / n
    return [(i, [float(v) for v in c]) for i, c in enumerate(cents)]


def _train_centroids(
    unit: DataFrame, id_col: str, n_cells: int, seed: int
) -> list[tuple[int, list[float]]]:
    """Train IVF cell centroids on a seeded, size-capped sample of a
    unit-vector DataFrame (column ``_u``). Centroid quality at n_cells
    centroids needs thousands of vectors, not the corpus, so the
    training stage stays bounded no matter the corpus size; the bounded
    sample fits on the driver by construction, so training runs as a
    local numpy spherical k-means — milliseconds — and only the tiny
    centroid table ships back out. One count() sizes the sampling
    fraction. The sample is sorted by id so training is deterministic
    regardless of partition scheduling order."""
    train_cap = max(4096, 512 * n_cells)
    n_corpus = unit.count()
    frac = min(1.0, (1.2 * train_cap) / max(n_corpus, 1))
    sample_rows = (
        unit.select(F.col(id_col).alias("_id"), "_u")
        .sample(withReplacement=False, fraction=frac, seed=seed)
        .limit(train_cap)
        .collect()
    )
    sample_rows.sort(key=lambda r: r["_id"])
    return _spherical_kmeans(
        [r["_u"] for r in sample_rows], n_cells, seed=seed, iters=8
    )


def _assign_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n: int,
    out: str,
) -> DataFrame:
    """Attach the ``n`` nearest centroid ids (by dot with the unit
    vector column ``_u`` — equivalent to cosine order for unit inputs),
    computed with the same sequential-fold ``dot`` the exact-cosine
    verification uses.

    This is the assignment path behind every ORACLE-REPLAYED IVF query:
    the oracle re-derives each assignment dot as a sequential SQL sum
    (catalog ``_CDOT_SQL``), so the Spark side must fold in the same
    order — a BLAS matmul sums pairwise and a dot within rounding of a
    tie between two cells could flip assignment cross-engine. cells x
    dims is small (16 x 64 here), so the literal expression tree stays
    cheap and fully inside whole-stage codegen: no shuffle, no Python.
    Ties break to the lowest cell id, matching both the SQL oracle's
    ``ORDER BY d DESC, cell`` and the matmul twin's stable argsort."""
    structs = [
        F.struct(
            dot(F.col("_u"), F.array(*[F.lit(float(v)) for v in vec])).alias("d"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell, vec in centroids
    ]
    ordered = F.array_sort(
        F.array(*structs),
        lambda left, right: F.when(left["d"] > right["d"], F.lit(-1))
        .when(left["d"] < right["d"], F.lit(1))
        .otherwise(left["cell"] - right["cell"]),
    )
    top = F.transform(F.slice(ordered, 1, n), lambda s: s["cell"])
    return df.withColumn(out, top)


def _assign_cells_matmul(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n: int,
    out: str,
) -> DataFrame:
    """Matmul twin of ``_assign_cells`` for rows-only / recall paths
    (never behind an oracle-replayed query: pairwise BLAS summation can
    flip a near-tie assignment vs the sequential SQL replay).

    Cell assignment is dense linear algebra over the WHOLE corpus — at
    large cells x dims an Arrow-batched pandas_udf doing one
    (batch x dim) @ (dim x cells) matmul per batch beats any literal
    expression tree: narrow (no shuffle), centroids closed over (tiny),
    the documented Pandas-UDF edge for numeric kernels. argsort is
    stable so ties break to the lowest cell id deterministically."""
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray([c for _, c in centroids], dtype=np.float64)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        order = np.argsort(-(x @ cmat.T), axis=1, kind="stable")[:, :n]
        return pd.Series([[int(c) for c in row] for row in order])

    return df.withColumn(out, assign(F.col("_u")))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    query_id_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning:
    k-means cells over the corpus, each vector assigned to its nearest
    centroid; a query only scores the ``n_probe`` cells nearest to it.

    Compared to hyperplane LSH this adapts the partitioning to the data
    distribution (cells follow density). Centroids come from a seeded
    spherical k-means run driver-side over a bounded sample
    (deterministic per dataset: the sample is sorted by id before
    training).

    Scale shape: the corpus is scored cell-by-cell via an equi-join on
    cell id — work per query is corpus/n_cells * n_probe instead of the
    full corpus; centroids (tiny) broadcast everywhere. Recall vs brute
    force is asserted in tests; raise n_probe for more recall. The
    driver corpus embeddings are nearly isotropic (max pairwise cosine
    ~0.5), the hardest case for cell pruning — n_probe=8/16 reaches
    ~0.7 recall there; clustered real-world embeddings prune far
    better.
    """
    query_id_col = query_id_col or id_col
    # narrow unit projections materialized once: each feeds training +
    # assignment + scoring, and the collapse-inlined normalization
    # would otherwise be recomputed inside every centroid dot
    uc = (
        with_unit_vector(corpus.select(id_col, vec_col), vec_col, "_u")
        .select(id_col, "_u")
        .localCheckpoint(eager=True)
    )
    uq = (
        with_unit_vector(queries.select(query_id_col, vec_col), vec_col, "_u")
        .select(query_id_col, "_u")
        .localCheckpoint(eager=True)
    )
    centroids = _train_centroids(uc, id_col, n_cells, seed)

    # IVF is build-then-probe: materialize the cell-assigned corpus (the
    # inverted file) ONCE before probing. Without this, Catalyst inlines
    # the assignment UDF + normalization into both the join-key
    # null-filter and the projection — two full Arrow passes over the
    # corpus per probe. At cluster scale this step is the index build
    # you would persist to storage partitioned by cell; localCheckpoint
    # is its single-session analog.
    cell_corpus = (
        _assign_cells(uc, centroids, 1, "_cells")
        .select(
            F.col(id_col).alias("match_id"),
            F.col("_u").alias("_cu"),
            F.element_at("_cells", 1).alias("_cell"),
        )
        .localCheckpoint(eager=True)
    )
    cell_queries = (
        _assign_cells(uq, centroids, n_probe, "_cells")
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col("_u").alias("_qu"),
            F.explode("_cells").alias("_cell"),
        )
        .localCheckpoint(eager=True)
    )
    scored = (
        cell_corpus.join(F.broadcast(cell_queries), "_cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", dot(F.col("_qu"), F.col("_cu")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantize_int8_stats(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column, with
    per-vector reconstruction-quality stats — the storage/IO face of
    similarity search: int8 codes cut an embedding store 4x and a 100 TB
    scan's bytes with it, while cosine ranking degrades only marginally
    (the stats this emits quantify exactly how much, per vector).

    Per vector: ``scale = max(|v|)/127`` (1.0 for all-zero vectors),
    ``q_i = floor(v_i/scale + 0.5)`` in [-127, 127], reconstruction
    ``r_i = q_i * scale``. Emits the code sum (exact integer), the
    scale, the max absolute reconstruction error, and
    ``cos(v, r)`` — every float op is elementwise or a sequential-order
    fold, so a DuckDB oracle replays all four bit-exactly.

    Linear, shuffle-free, whole-corpus pass: one narrow projection per
    row, no joins, no aggregation across rows — the shape that scales
    to any corpus size.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = df.select(F.col(id_col), v.alias("_v"))
    mx = F.array_max(F.transform(F.col("_v"), F.abs))
    rows = rows.withColumn(
        "_scale", F.when(mx == 0, F.lit(1.0)).otherwise(mx / F.lit(127.0))
    )
    qc = F.transform(
        F.col("_v"), lambda x: F.floor(x / F.col("_scale") + F.lit(0.5))
    )
    rows = rows.withColumn("_qc", qc)
    rv = F.transform(F.col("_qc"), lambda c: c.cast("double") * F.col("_scale"))
    rows = rows.withColumn("_rv", rv)
    err = F.array_max(
        F.zip_with(F.col("_v"), F.col("_rv"), lambda a, b: F.abs(a - b))
    )
    nn = norm(F.col("_v")) * norm(F.col("_rv"))
    return rows.select(
        F.col(id_col),
        F.aggregate(
            F.col("_qc"), F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("q_sum"),
        F.col("_scale").alias("scale"),
        err.alias("max_abs_err"),
        # NULL (not 0/0) for zero vectors — ANSI mode rejects the division
        F.when(nn == 0, F.lit(None).cast("double"))
        .otherwise(dot(F.col("_v"), F.col("_rv")) / nn)
        .alias("cos_recon"),
    )


def hard_negative_mining(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    n_anchors: int = 32,
) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training: for
    each anchor, the OTHER-labeled vector most similar to it — the
    near-miss that teaches the margin (random negatives are trivially
    easy; the hardest negative per anchor is the standard curriculum,
    DPR/SimCSE style). Returns one row per anchor:
    ``(anchor_id, anchor_label, neg_id, neg_label, cos_q20)``.

    Anchors are a DETERMINISTIC md5-ordered sample of ``n_anchors``
    ids (reproducible across engines/partitionings — the corpus-cap
    law every sampler here uses); each anchor then scans the corpus
    once via a broadcast join. The argmax is an order-free
    min(struct(-cos, id)) on Q20-floored cosines, so ties break to
    the smallest negative id identically everywhere.

    Scale: n_anchors broadcast rows x ONE corpus scan — linear in the
    corpus with a bounded constant; at 100 TB the same shape rides
    the IVF cells (mine within the anchor's cell first), which the
    ivf machinery here already provides."""
    unit = with_unit_vector(df.select(id_col, vec_col, label_col),
                            vec_col, "_u")
    anchors = (
        unit.select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("anchor_label"),
            F.col("_u").alias("_au"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "anchor_id")
        .limit(int(n_anchors))
        .drop("_h")
    )
    cand = unit.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        F.col("_u").alias("_cu"),
    )
    scored = (
        cand.join(F.broadcast(anchors),
                  F.col("neg_label") != F.col("anchor_label"))
        .withColumn(
            "cos_q20",
            F.floor(dot(F.col("_au"), F.col("_cu")) * (1 << 20))
            .cast("long"),
        )
    )
    best = scored.groupBy("anchor_id", "anchor_label").agg(
        F.min(F.struct(
            (-F.col("cos_q20")).alias("_nc"), F.col("neg_id"),
            F.col("neg_label"),
        )).alias("_b")
    )
    return best.select(
        "anchor_id", "anchor_label",
        F.col("_b.neg_id").alias("neg_id"),
        F.col("_b.neg_label").alias("neg_label"),
        (-F.col("_b._nc")).cast("long").alias("cos_q20"),
    ).orderBy("anchor_id")
