"""Count-min sketch: fixed-size, mergeable frequency estimation for
heavy-hitter detection over unbounded key cardinality.

At 100 TB a ``groupBy(key).count()`` over a high-cardinality key (URLs,
user ids, shingles) shuffles one row per distinct key; a count-min
sketch replaces that with a FIXED ``depth x width`` counter grid that
is built map-side (each partition folds its rows into a local grid,
the shuffle carries at most ``depth * width`` counters per partition)
and merged by element-wise addition — the same partial-aggregation
shape Spark uses for any sum. Estimates are then a broadcast join of
candidate keys against the tiny counter table: no second scan, no
wide shuffle.

Hashes are md5-derived (``conv(substring(md5('cms{d}:' || key),1,8),
16,10) % width``) so a DuckDB oracle replays the whole sketch —
counters, minima, estimates — bit-exactly; production would swap in
xxhash64 with identical plans. The classic guarantee holds per hash
row: estimate >= true count always (only collisions inflate), and
estimate <= true + e/width * N with probability 1 - (1/2)^depth.

Reference parity note: the reference engine (PyCassElastic) has no
approximate aggregation at all; this module is part of the engine
build-out mandated by SURVEY.md §2.2 (approximate/sketch family,
beside approx_count_distinct and percentile_approx in the catalog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, d: int, width: int) -> Column:
    """Bucket of ``key`` under hash row ``d``: first 8 md5 hex chars of
    the salted key, base-16, mod ``width`` — replayable in ANSI SQL."""
    salted = F.concat(F.lit(f"cms{d}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % width
    )


def countmin_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """The ``depth x width`` counter grid as a DataFrame
    ``(d, bucket, cnt)`` — at most ``depth * width`` rows regardless of
    input size.

    One pass, one shuffle: each row emits its ``depth`` (d, bucket)
    pairs via ``posexplode`` and the groupBy's map-side partial
    aggregation collapses every partition to <= depth*width counters
    before anything moves — the shuffle volume is bounded by the grid,
    not the data.
    """
    buckets = F.array(
        *[cms_bucket(F.col(key_col), d, width) for d in range(depth)]
    )
    pairs = df.select(F.posexplode(buckets).alias("d", "bucket"))
    return pairs.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    keys: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch of ``df[key_col]`` for every row of
    ``keys`` (a DataFrame with a ``key_col`` column): returns
    ``(key_col, cms_cnt)`` where ``cms_cnt = min over d of
    counter[d][hash_d(key)]``.

    The counter grid is tiny by construction, so the probe is a
    broadcast hash join against it — candidate keys never shuffle.
    """
    counters = countmin_counters(df, key_col, depth, width)
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[cms_bucket(F.col(key_col), d, width) for d in range(depth)])
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_cnt"))
    )


# ---------------------------------------------------------------------------
# Bloom filter: fixed-size, mergeable set membership — the third classic
# sketch beside HLL (approx_count_distinct) and count-min above. The
# canonical 100 TB use is join pre-filtering: build an m-bit filter over
# the small side's keys (bounded state, map-side mergeable by bit-OR),
# broadcast it, and drop big-side rows whose keys cannot match BEFORE
# the shuffle. No false negatives; false positives only pass extra rows
# to the real join, never corrupt it.
# ---------------------------------------------------------------------------


def bloom_positions(key: Column, k: int, m_bits: int) -> Column:
    """The ``k`` bit positions of ``key``: first 8 md5 hex chars of the
    salted key, base-16, mod ``m_bits`` — replayable in ANSI SQL (same
    derivation as :func:`cms_bucket`; production swaps in xxhash64)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k: int = 5
) -> DataFrame:
    """The SET bit positions of a Bloom filter over ``df[key_col]`` as
    a one-column DataFrame ``(bit)`` with at most ``m_bits`` rows.

    One pass, one bounded shuffle: every row explodes to its ``k``
    positions and the ``distinct`` collapses each partition to at most
    ``m_bits`` values map-side before the exchange — shuffle volume is
    bounded by the filter size, not the data. (A dense bitmap in a
    single binary value is the production packing; the position-set
    relation keeps every downstream step SQL-replayable.)
    """
    return (
        df.select(F.explode(bloom_positions(F.col(key_col), k, m_bits)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bloom_bits: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 5,
) -> DataFrame:
    """``(key_col, bloom_hit)`` for every probe row: hit iff ALL ``k``
    of the key's positions are set in ``bloom_bits``.

    The filter is tiny by construction, so the probe is a broadcast
    hash join — probe keys never shuffle for the membership test. The
    hit test folds as ``min(matched)`` over the exploded positions, so
    duplicate positions (two hashes landing on one bit) stay correct.
    """
    exploded = probes.select(
        key_col,
        F.explode(bloom_positions(F.col(key_col), k, m_bits)).alias("bit"),
    )
    marked = exploded.join(
        F.broadcast(bloom_bits.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(key_col).agg(
        (F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1).alias("bloom_hit")
    )


def bloom_mask(bloom_bits: DataFrame, m_bits: int) -> str:
    """Densify the bit-position relation into an ``m_bits``-char
    '0'/'1' mask string for closing over in a row-level predicate.

    The collect is bounded by ``m_bits`` BY CONSTRUCTION (like the IVF
    training sample, it can never scale with the data) — this is the
    broadcast-the-filter step of Bloom join pruning.
    """
    mask = bytearray(b"0" * m_bits)
    for r in bloom_bits.collect():
        mask[int(r["bit"])] = ord("1")
    return mask.decode("ascii")


def bloom_contains(key: Column, mask: str, k: int) -> Column:
    """Row-level membership predicate against a densified mask: true
    iff ALL ``k`` of the key's positions are set. No join, no shuffle —
    a pure filter expression evaluated inside codegen, the shape that
    drops non-matching rows BEFORE a join's exchange. No false
    negatives, so ``filter(bloom_contains(...))`` before a join never
    changes the join's result.

    Implementation note: the mask densifies into ONE m_bits-element
    int array literal (a single foldable Literal node) and each
    position is an O(1) ``element_at`` lookup. The tempting
    alternatives all lose: ``substring`` on an m_bits-char mask
    literal copies the literal per call (~1.2 s per 100k rows x k),
    a ``forall`` over the position array runs its lambda interpreted,
    and k ``isin(<set positions>)`` lists put ~k*m literal nodes into
    the plan, which stalls DRIVER-side optimization for seconds per
    compile. Measured at sf0.1 (100k rows, k=5, m=4096): 6.7 s
    (substring) / 13.3 s (isin, optimizer-bound) -> 1.2 s (LUT)."""
    m_bits = len(mask)
    lut = F.lit([1 if ch == "1" else 0 for ch in mask])
    conds = [
        F.element_at(
            lut,
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            ).cast("int")
            + 1,
        )
        == 1
        for i in range(k)
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
