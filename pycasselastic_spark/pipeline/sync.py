"""Batch sync-cycle orchestration — the reference's ``run()``
(``pyCassElastic.py:54-115``) as a composition of the core operators.

One cycle per spec:
  1. read both stores, align schemas (drift reconciliation, O8),
  2. window both to the half-open increment ``(last, this]`` (O1/O3),
  3. suppress echo rows per side (O4),
  4. LWW-merge the increments (O5+O6+O7 collapsed),
  5. hand the winners to both sinks; losers available for stores that
     need physical deletes,
  6. advance the watermark only after the sinks succeed.

Per-spec error isolation mirrors the reference (one failing sync must
not abort the others, ``pyCassElastic.py:214-220`` et al.).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame

from pycasselastic_spark.core.incremental import (
    WatermarkStore,
    minute_floor_millis,
    scan_increment,
)
from pycasselastic_spark.core.merge import anti_echo, conflict_losers, lww_merge
from pycasselastic_spark.core.schema import align_schemas
from pycasselastic_spark.core.specs import SyncSpec
from pycasselastic_spark.core.timing import timed

log = logging.getLogger(__name__)


@dataclass
class SyncResult:
    name: str
    ok: bool
    winners: DataFrame | None = None
    losers_left: DataFrame | None = None
    losers_right: DataFrame | None = None
    error: str | None = None


def sync_once(
    spec: SyncSpec,
    left: DataFrame,
    right: DataFrame,
    lo: int | None,
    hi: int | None,
) -> SyncResult:
    """Pure (lazy) plan for one sync cycle; no actions are triggered.

    Returns the converged winners relation plus per-side loser
    relations (rows each store must retract)."""
    left_inc = scan_increment(left, spec.version_col, lo, hi) if spec.filter_date else left
    right_inc = (
        scan_increment(right, spec.version_col, lo, hi) if spec.filter_date else right
    )
    if spec.ignore_same_source:
        # Rows read from the right store must not have originated at the
        # left store (they would round-trip back to their own source),
        # and vice versa (reference pyCassElastic.py:386-399). Each
        # filter is gated on the source_id it actually filters by.
        if spec.left.source_id:
            right_inc = anti_echo(right_inc, "source", spec.left.source_id)
        if spec.right.source_id:
            left_inc = anti_echo(left_inc, "source", spec.right.source_id)
    if spec.fields_list:
        left_inc = left_inc.select(*spec.fields_list)
        right_inc = right_inc.select(*spec.fields_list)

    left_inc, right_inc = align_schemas([left_inc, right_inc])
    winners = lww_merge(
        [left_inc, right_inc],
        id_col=spec.id_col,
        version_col=spec.version_col,
        tiebreak_cols=spec.tiebreak_cols,
    )
    return SyncResult(
        name=spec.name,
        ok=True,
        winners=winners,
        losers_left=conflict_losers(
            left_inc, winners, spec.id_col, spec.version_col, spec.tiebreak_cols
        ),
        losers_right=conflict_losers(
            right_inc, winners, spec.id_col, spec.version_col, spec.tiebreak_cols
        ),
    )


def run_cycle(
    specs: list[SyncSpec],
    load: Callable[[SyncSpec], tuple[DataFrame, DataFrame]],
    sink: Callable[[SyncSpec, SyncResult], None],
    watermarks: WatermarkStore,
    now_millis: int | None = None,
) -> list[SyncResult]:
    """Run every spec once against the current watermark window, with
    per-spec error isolation; advance the watermark only if all sinks
    committed (the reference's duplicate-avoidance guard at
    ``pyCassElastic.py:86-88`` becomes unnecessary per-row because the
    merge is idempotent, but watermark-after-commit preserves
    at-least-once)."""
    hi = now_millis if now_millis is not None else minute_floor_millis()
    lo = watermarks.last(default=None)
    results: list[SyncResult] = []
    for spec in specs:
        try:
            # per-leg duration logging, the reference's @timeit
            # observability (utils.py:38-55)
            with timed(f"sync leg {spec.name}"):
                result = sync_once(spec, *load(spec), lo=lo, hi=hi)
                sink(spec, result)
        except Exception as exc:  # per-spec isolation, like the reference
            log.exception("sync %s failed", spec.name)
            result = SyncResult(name=spec.name, ok=False, error=str(exc))
        results.append(result)
    if all(r.ok for r in results):
        watermarks.commit(hi)
    return results
