"""Last-writer-wins merge — the heart of the engine.

The reference delegates conflict resolution to its stores: ES external
versioning keeps the doc with the higher ``_version`` per ``_id``
(reference ``pyCassElastic.py:316-354``), Cassandra ``USING TIMESTAMP``
does cell-level LWW (``pyCassElastic.py:244-251``), and a separate
delete pass retracts the rows that lost (``pyCassElastic.py:508-582``).
Spark-natively all three collapse into one relational operator:
union the increments and keep the argmax-by-version row per id.

Scale notes:
  * ``lww_merge`` uses ``groupBy(id).agg(max_by(...))`` rather than a
    window + ``row_number``: both shuffle once on the id, but the
    aggregate form gets map-side partial aggregation (each task reduces
    its local rows to one candidate per id before the shuffle), which is
    strictly less shuffle I/O on wide inputs — the difference between
    shuffling 100 TB and shuffling one row per distinct id.
  * ``anti_echo`` is a pushable negated equi-predicate, not a join —
    Catalyst pushes it into the scan.
  * ``conflict_losers`` is a left-anti join against the winners; the
    winners side is the already-reduced aggregate, so at scale the join
    is between the raw increment and a much smaller reduced relation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordering_key(
    df_cols: Sequence[str],
    version_col: str,
    tiebreak_cols: Sequence[str],
) -> Column:
    """Composite ordering struct: version first, then deterministic
    tiebreaks. Structs compare lexicographically in Spark SQL, so
    ``max_by(payload, struct(version, *ties))`` is a total-order argmax.
    """
    missing = [c for c in (version_col, *tiebreak_cols) if c not in df_cols]
    if missing:
        raise ValueError(f"ordering columns not in DataFrame: {missing}")
    return F.struct(F.col(version_col), *[F.col(c) for c in tiebreak_cols])


def lww_merge(
    dfs: Sequence[DataFrame],
    id_col: str,
    version_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge increments from any number of stores: per id, keep the row
    with the greatest ``(version, *tiebreak_cols)``.

    Replaces reference operators O5 (versioned ES upsert), O6 (C*
    timestamped upsert) and O7 (delete-on-conflict) in one op — losers
    simply do not survive the argmax (SURVEY.md §2.1 O5-O7, §2.3).

    Schema drift between inputs is tolerated: inputs are aligned with
    ``unionByName(allowMissingColumns=True)`` (missing column = NULL,
    the reference's semantics at ``pyCassElastic.py:270-274``).

    Ties on version are resolved deterministically by
    ``tiebreak_cols`` (descending); pass e.g. a source-priority column
    to encode the reference's "ES keeps its copy on equal versions"
    asymmetry (``pyCassElastic.py:340-341``).
    """
    if not dfs:
        raise ValueError("lww_merge needs at least one input DataFrame")
    # Ordering columns must agree in type across inputs: unionByName
    # would otherwise coerce silently (e.g. long vs string -> string),
    # turning the version argmax into a lexicographic comparison where
    # version '9' beats '100'. Payload columns may drift; ordering
    # columns may not.
    for col in (version_col, *tiebreak_cols):
        seen = {}
        for df in dfs:
            if col in df.columns:
                seen[str(df.schema[col].dataType)] = True
        if len(seen) > 1:
            raise ValueError(
                f"ordering column {col!r} has conflicting types across "
                f"inputs: {sorted(seen)} — cast explicitly before merging"
            )
    unioned = dfs[0]
    for other in dfs[1:]:
        unioned = unioned.unionByName(other, allowMissingColumns=True)

    cols = unioned.columns
    if id_col not in cols:
        raise ValueError(f"id column {id_col!r} not in input columns {cols}")
    ordering = _ordering_key(cols, version_col, tiebreak_cols)
    payload = F.struct(*[F.col(c) for c in cols])
    winners = (
        unioned.groupBy(id_col)
        .agg(F.max_by(payload, ordering).alias("_row"))
        .select([F.col(f"_row.{c}").alias(c) for c in cols])
    )
    return winners


def anti_echo(df: DataFrame, source_col: str, source_id: str) -> DataFrame:
    """Suppress rows that originated from ``source_id`` so they don't
    round-trip back to their own store (reference ``ignore_same_source``,
    ``pyCassElastic.py:386-399``).

    NULL provenance is kept (unknown origin must still sync), matching
    the ES ``not: {term: ...}`` semantics which only excludes explicit
    matches.
    """
    col = F.col(source_col)
    return df.filter(col.isNull() | (col != F.lit(source_id)))


def conflict_losers(
    increment: DataFrame,
    winners: DataFrame,
    id_col: str,
    version_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Rows of ``increment`` that lost the LWW merge — i.e. their
    ``(id, version, *tiebreaks)`` key is not the winning key.

    Pass the same ``tiebreak_cols`` given to ``lww_merge``: without
    them, a row that loses only on the tiebreak (same id AND version,
    different payload — the reference's equal-version 409 case) would
    be invisible here and the losing store would never retract it.

    This is the relational form of the reference's 409-parsing delete
    pass (``pyCassElastic.py:508-582``): stores that need physical
    deletes feed this to their delete API; snapshot sinks don't need it
    at all because ``lww_merge`` output already excludes losers.
    """
    keys = [id_col, version_col, *tiebreak_cols]
    winner_keys = winners.select(*keys)
    return increment.join(winner_keys, on=keys, how="left_anti")


def lww_snapshots(
    dfs: Sequence[DataFrame],
    id_col: str,
    version_col: str,
    snapshot_versions: Sequence[int],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Time-travel: the LWW-merged state AS OF each of several
    watermarks, in ONE pass. For every ``v`` in ``snapshot_versions``
    and every id with at least one increment at ``version <= v``, emit
    that id's winning row at that point — the reference's sync state
    had it run to completion at watermark ``v`` (the multi-point form
    of O5/O6; a rebuilt daemon uses it to audit "what did the stores
    agree on yesterday / last week / at incident time").

    Scale shape: the naive plan per snapshot is a filtered argmax —
    k snapshots = k shuffles of the same table. This computes all k
    snapshots in ONE ``groupBy(id)`` shuffle with map-side partials:
    each snapshot is a conditional ``max(when(version <= v, ordered
    struct))`` aggregate, and the k per-id results unpivot via an
    inline explode (k is a handful of audit points — the explode is
    on the REDUCED relation, one row per id, not on the raw data).

    Output: ``snapshot_version`` + the input columns, winners only.
    """
    if not snapshot_versions:
        raise ValueError("lww_snapshots needs at least one snapshot version")
    unioned = dfs[0]
    for other in dfs[1:]:
        unioned = unioned.unionByName(other, allowMissingColumns=True)
    cols = unioned.columns
    ordering = _ordering_key(cols, version_col, tiebreak_cols)
    payload = F.struct(ordering.alias("_ord"), *[F.col(c) for c in cols])
    per_id = unioned.groupBy(id_col).agg(
        *[
            F.max(
                F.when(F.col(version_col) <= F.lit(v), payload)
            ).alias(f"_s{i}")
            for i, v in enumerate(snapshot_versions)
        ]
    )
    snap = per_id.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(v).alias("snapshot_version"),
                        F.col(f"_s{i}").alias("_row"),
                    )
                    for i, v in enumerate(snapshot_versions)
                ]
            )
        ).alias("_e")
    ).filter(F.col("_e._row").isNotNull())
    return snap.select(
        F.col("_e.snapshot_version").alias("snapshot_version"),
        *[F.col(f"_e._row.{c}").alias(c) for c in cols],
    )
