"""Structured Streaming windowed aggregations over event streams —
the engine-native replacement for the reference's hand-rolled
fixed-period micro-batch loop (reference O10/O11,
``pyCassElastic.py:140-170``, ``SyncCassElastic.py:45-47``): watermarks
instead of a watermark file, triggers instead of ``sleep()``,
checkpoints instead of ``lastruntime.log``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.functions.aggregates import money_sum


def tumbling_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts + value sums. With a watermark,
    state for closed windows is dropped — bounded state at any scale.
    Same output columns as the batch ``tumbling_window_events`` query so
    stream/batch parity is directly assertable."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (overlapping) event-time windows."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_window_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time session windows (dynamic-gap state merged by the
    engine) — the streaming twin of the batch ``sessionize`` operator."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_stream_join_within(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: rows of the two streams with the same
    key whose event times fall within ``within`` of each other. Both
    sides carry watermarks plus the time-range join condition, so the
    engine can bound the join state it buffers (without them the state
    grows forever)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key_col] == r[key_col])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {within}"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")
