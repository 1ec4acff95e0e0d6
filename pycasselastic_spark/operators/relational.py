"""Relational operators the reference lacks entirely (SURVEY.md §2.2):
top-k per group, as-of join, sessionization. All pure DataFrame
compositions — single-shuffle designs that survive scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
) -> DataFrame:
    """Top-k rows per group by ``order_cols`` (pass Column objects with
    .desc()/.asc() for direction; include a unique key as the last
    ordering column for determinism under ties).

    One shuffle on the group keys; ``row_number`` is evaluated
    streaming per partition after the sort, so memory is O(1) per
    group — no per-group materialization.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the right row
    with the greatest ``right_ts <= left_ts`` within the same ``on``
    keys. Left rows with no prior right row get NULLs.

    Spark has no native as-of join; the common pandas route
    (``merge_asof`` per group) pulls every group through Python. This
    implementation instead uses the union + last-non-null-carry-forward
    trick: tag both sides, union them, and run a single
    ``last(..., ignorenulls)`` window ordered by time — one shuffle on
    the keys, one sort, zero Python. At 100 TB this is the difference
    between a window over co-partitioned data and an Arrow round-trip
    of the full dataset.

    Right rows sort *before* left rows at equal timestamps, so
    ``right_ts == left_ts`` matches (<= semantics, like DuckDB
    ``ASOF JOIN ... ON l.t >= r.t`` and ``pd.merge_asof``).
    """
    on = list(on)
    right_payload = [c for c in right.columns if c not in on]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None)
        .cast(right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType)
        .alias("_rrow"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType)
        .alias("_lrow"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in right_payload
    ]
    return matched.filter(F.col("_side") == 1).select(*out_cols)


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_seconds``.

    lag + conditional cumsum over one keyed window — the standard
    single-shuffle sessionization (streaming variant:
    ``session_window`` in streaming/windows.py).

    Adds ``session_id`` (1-based per key, ordered by time).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Scalable global running total of ``value_col`` in ``order_col``
    order (``order_col`` must be unique for a total order).

    A naive ``Window.orderBy`` with no partition key funnels the whole
    table through ONE task — a 100 TB non-starter. This is the
    classic two-pass prefix sum instead: range-partition by the order
    column (sorted partitions, parallel), cumsum WITHIN each partition,
    then add each partition's broadcast offset (the sum of all earlier
    partitions — one tiny aggregate of num_partitions rows). The result
    is independent of where the range boundaries land, so it is
    deterministic and oracle-replayable even though the partitioner
    samples.

    Output: input columns + ``out_col`` (inclusive running total).
    """
    parts = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts.withColumn("_local", F.sum(value_col).over(w_local))
    # partition totals: num_partitions rows — the only single-task
    # window here runs over THAT, not the data. Summed from the raw
    # value column, NOT max(_local): the max of a running total equals
    # the partition sum only for non-negative values, and negative
    # values would silently corrupt every downstream offset.
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
