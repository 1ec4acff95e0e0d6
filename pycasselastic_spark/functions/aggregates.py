"""Aggregate helpers with cross-engine exactness.

The corpus stores money as 2-decimal doubles. Floating sums are
order-dependent, so a Spark sum and a DuckDB oracle sum of the same
column can differ in the last ulps — enough to break a value-hash
compare. These helpers sum in exact DECIMAL space (both engines agree
bit-for-bit) and cast the final value back to double. They are also the
right call at scale: decimal aggregation is JVM-native and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: Column | str) -> Column:
    """Normalize a 2-decimal money double into exact decimal space."""
    return _c(col).cast(MONEY)


def money_sum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a money column, output double."""
    return F.sum(money(col)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count, divided in double space (deterministic)."""
    return (F.sum(money(col)).cast("double") / F.count(F.lit(1))).alias(alias)


def money_expr_sum(expr: Column, alias: str) -> Column:
    """Exact sum of an already-decimal arithmetic expression."""
    return F.sum(expr).cast("double").alias(alias)
