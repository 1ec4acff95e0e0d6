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
