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
