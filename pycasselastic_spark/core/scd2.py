"""SCD2 (slowly-changing-dimension, type 2) history maintenance.

The LWW merge (core/merge.py) is SCD1: the newest version replaces the
row. SCD2 instead *closes* the outgoing row (``valid_to`` = the new
version) and appends the incoming one — the CDC/MERGE pattern emulated
relationally (anti-join + union + window) since no transactional table
format ships in this environment; on Delta/Iceberg the same plan drives
``MERGE INTO``.

History row shape: id + attribute columns + ``valid_from`` (version at
which the row became current) + ``valid_to`` (version at which it was
superseded; NULL = current).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import lww_merge


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    id_col: str,
    version_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold a batch of updates into an SCD2 history.

    ``history`` columns: id, *attr_cols, valid_from, valid_to.
    ``updates`` columns: id, version, *attr_cols (multiple versions per
    id allowed — only the latest per id is applied, consistent with
    batch-at-a-time CDC).

    Per id: if the latest update differs from the current row's
    attributes (or the id is new), the current row closes at the update
    version and a new current row opens. Equal attributes are a no-op.
    Updates not newer than the current row's ``valid_from`` are ignored
    (stale deliveries — the watermark idempotence rule).

    Single shuffle on the id for the update argmax + one join against
    current rows; closed history is untouched (append-only at scale).
    """
    attr_cols = list(attr_cols)
    latest = lww_merge(
        [updates.select(id_col, version_col, *attr_cols, *tiebreak_cols)],
        id_col,
        version_col,
        tiebreak_cols,
    )
    closed = history.filter(F.col("valid_to").isNotNull())
    current = history.filter(F.col("valid_to").isNull())

    u = latest.select(
        F.col(id_col).alias("_uid"),
        F.col(version_col).alias("_uver"),
        *[F.col(c).alias(f"_u_{c}") for c in attr_cols],
    )
    joined = current.join(u, current[id_col] == u["_uid"], "full_outer")

    changed = F.col("_uid").isNotNull() & (
        F.col(id_col).isNull()  # brand-new id
        | (
            (F.col("_uver") > F.col("valid_from"))
            & ~F.struct(*[F.col(c) for c in attr_cols]).eqNullSafe(
                F.struct(*[F.col(f"_u_{c}").alias(c) for c in attr_cols])
            )
        )
    )

    # current rows that survive unchanged (no update, stale update, or
    # attributes equal)
    survivors = joined.filter(F.col(id_col).isNotNull() & ~changed).select(
        id_col, *attr_cols, "valid_from", "valid_to"
    )
    # current rows closed by a differing newer update
    closing = joined.filter(F.col(id_col).isNotNull() & changed).select(
        F.col(id_col),
        *[F.col(c) for c in attr_cols],
        F.col("valid_from"),
        F.col("_uver").alias("valid_to"),
    )
    # the new current rows (for changed ids and brand-new ids)
    opening = joined.filter(changed).select(
        F.col("_uid").alias(id_col),
        *[F.col(f"_u_{c}").alias(c) for c in attr_cols],
        F.col("_uver").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    return closed.unionByName(survivors).unionByName(closing).unionByName(opening)
