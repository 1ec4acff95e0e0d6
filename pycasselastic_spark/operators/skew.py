"""Skew mitigation: salted two-stage aggregation.

A single hot key turns a groupBy shuffle into one straggler reducer.
Salting splits each key into ``salt_buckets`` sub-keys for a first
partial aggregation, then re-aggregates the partials — the hot key's
work spreads over ``salt_buckets`` tasks. (For joins, AQE's
``skewJoin`` handles the same problem adaptively; salting is the
static, always-works fallback.)

The salt is derived deterministically from a caller-chosen column so
results are reproducible run-to-run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.functions.aggregates import money


def salted_count_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    money_cols: Sequence[str],
    salt_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-key row count + exact decimal sums of ``money_cols``,
    computed as salted partials then re-aggregated. Decimal partial
    sums re-sum exactly, so the result is bit-identical to the unsalted
    aggregation (asserted by the oracle).

    Output: key_cols + ``n_rows`` + ``sum_<col>`` doubles."""
    salted = df.withColumn(
        "_salt", F.pmod(F.crc32(F.col(salt_col).cast("string")), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(money(c)).alias(f"_s_{c}") for c in money_cols],
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("n_rows"),
        *[
            F.sum(f"_s_{c}").cast("double").alias(f"sum_{c}")
            for c in money_cols
        ],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    salt_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Inner equi-join with static key salting: the big side gets a
    deterministic salt derived from ``salt_col`` (a row-level column —
    NOT the join key, whose hash would put every hot-key row in the
    same bucket again); the small side is replicated once per salt
    value via ``explode(sequence(...))``. The join runs on
    (key, salt), so a hot key's probe work spreads over
    ``salt_buckets`` tasks instead of one straggler reducer.

    Result is exactly the plain inner join (asserted by the oracle) —
    salting changes the partitioning, never the semantics. Cost: the
    small side shuffles ``salt_buckets`` x its size; keep it to true
    dimension tables. AQE's skewJoin is the adaptive alternative; this
    is the static form for engines/plans where AQE cannot see the skew
    (e.g. a first-stage shuffle feeding a stateful op).

    Output columns: big's columns then small's non-key columns."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.crc32(F.col(salt_col).cast("string")), F.lit(salt_buckets))
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = salted_big.join(replicated_small, [*key_cols, "_salt"])
    return joined.drop("_salt")


def hybrid_skew_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    hot_threshold: int,
) -> DataFrame:
    """Inner equi-join that routes HOT keys through a broadcast join
    and the cold tail through the normal shuffle join — the classic
    differentiated skew-join (salting's sibling: instead of spreading
    a hot key over salted reducers, hot keys never shuffle at all).

    A key is hot when the big side carries more than ``hot_threshold``
    rows for it. The hot-key list is itself a DataFrame (one agg +
    filter — by construction FEW rows, that's what 'hot' means), and so
    is the hot slice of the small side; both ride broadcasts. Cold rows
    are split off with a broadcast LEFT-ANTI join against the same hot
    list — the big side is never collected, never shuffled on the skewed
    key. Result is exactly the plain inner join (asserted by the
    oracle): every big row joins the same small rows, only the route
    differs.

    Output columns: key_cols, then big's remaining columns, then
    small's remaining columns (same order as Spark's ``join(...,
    key_cols)``).
    """
    keys = list(key_cols)
    hot_keys = (
        big.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > hot_threshold)
        .select(*keys)
    )
    big_hot = big.join(F.broadcast(hot_keys), keys, "left_semi")
    big_cold = big.join(F.broadcast(hot_keys), keys, "left_anti")
    small_hot = small.join(F.broadcast(hot_keys), keys, "left_semi")
    hot = big_hot.join(F.broadcast(small_hot), keys)
    cold = big_cold.join(small, keys)
    return hot.unionByName(cold)
