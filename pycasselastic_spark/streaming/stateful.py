"""Custom stateful streaming operators via ``applyInPandasWithState``
(arbitrary per-key state the built-in windowed aggregations can't
express).

``first_event_per_key`` keeps, per key, the earliest-timestamp row seen
across ALL micro-batches — streaming argmin with explicit state. Each
batch emits the key's current champion only when it improves, so the
sink receives a monotone stream of updates; the final answer per key is
the last update (or equivalently the min over updates)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, first_us long, first_event_id long"
STATE_SCHEMA = "first_us long, first_event_id long"


def _fold_first(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        best_us, best_id = state.get
    else:
        best_us, best_id = None, None
    for pdf in pdfs:
        for us, eid in zip(pdf["us"], pdf["event_id"]):
            us, eid = int(us), int(eid)
            if best_us is None or (us, eid) < (best_us, best_id):
                best_us, best_id = us, eid
    improved = not state.exists or state.get != (best_us, best_id)
    state.update((best_us, best_id))
    if improved:
        yield pd.DataFrame(
            {"user_id": [key[0]], "first_us": [best_us], "first_event_id": [best_id]}
        )


def first_event_per_key(increments: DataFrame) -> DataFrame:
    """Streaming transformation: per user_id, the earliest (us,
    event_id) across all batches so far. Input columns: user_id,
    us (long micros), event_id."""
    return increments.groupBy("user_id").applyInPandasWithState(
        _fold_first,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"

try:  # Spark 4 typed-state API; keep module importable without it
    from pyspark.sql.streaming import StatefulProcessor as _StatefulProcessor
except ImportError:  # pragma: no cover
    _StatefulProcessor = object


class RunningTotalsProcessor(_StatefulProcessor):
    """``transformWithStateInPandas`` processor (the Spark 4 successor
    to applyInPandasWithState, with typed state handles): per user, a
    running event count + exact money total held in a ValueState.

    NOTE: the transformWithState state server speaks protobuf; this
    container ships no usable ``google.protobuf``, so the operator is
    exercised by a skip-if-unavailable test rather than a catalog/driver
    query (the applyInPandasWithState twin covers the driver gate).

    Money is accumulated as integer CENTS — the corpus stores
    2-decimal doubles, so value*100 rounds to an exact integer and the
    running sum is order-independent (the same determinism rule as the
    catalog's decimal sums, applied to streaming state). Each batch
    emits the key's cumulative totals; with one batch the emission
    equals the batch GROUP BY, which is what the oracle checks."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, cents BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        n, cents = 0, 0
        if self._totals.exists():
            prev = self._totals.get()
            n, cents = int(prev[0]), int(prev[1])
        for pdf in rows:
            n += len(pdf)
            # round each element BEFORE summing: 0.07*100 is
            # 7.000000000000001 in binary, so a float sum then one
            # round would drift; per-element rounds are exact
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def running_totals_per_key(increments: DataFrame) -> DataFrame:
    """Streaming running totals via transformWithStateInPandas. Input
    columns: user_id, value."""
    return increments.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
