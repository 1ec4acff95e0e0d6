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
