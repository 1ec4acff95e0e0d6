"""Structured Streaming twins: windowed aggs, LWW sync, stream-static enrich, stream-stream join, custom state - all verified against the SAME oracles as their batch twins.

Split out of the monolithic catalog.py (round 8); registration
side-effects populate the shared QUERIES dict in queries.base.
"""

from __future__ import annotations

import os  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import (  # noqa: F401
    anti_echo,
    conflict_losers,
    lww_merge,
)
from pycasselastic_spark.core.incremental import scan_increment  # noqa: F401
from pycasselastic_spark.core.schema import align_schemas  # noqa: F401
from pycasselastic_spark.functions.aggregates import (  # noqa: F401
    money,
    money_expr_sum,
    money_sum,
)
from pycasselastic_spark.operators.relational import (  # noqa: F401
    asof_join,
    sessionize,
    topk_per_group,
)
from pycasselastic_spark.queries.base import (  # noqa: F401
    QUERIES,
    _STORES_SQL,
    _event_stores,
    _t,
    register,
)
from pycasselastic_spark.core import convert as CV  # noqa: F401,E402
from pycasselastic_spark.functions import text as TX  # noqa: F401,E402
from pycasselastic_spark.operators import dedup as D  # noqa: F401,E402
from pycasselastic_spark.operators import multimodal as M  # noqa: F401,E402
from pycasselastic_spark.operators import sampling as SP  # noqa: F401,E402
from pycasselastic_spark.operators import similarity as S  # noqa: F401,E402
from pycasselastic_spark.operators import sketches as SK  # noqa: F401,E402
from pycasselastic_spark.plans.tuning import ensure_parallelism  # noqa: F401,E402


# ---------------------------------------------------------------------------
# Structured Streaming queries — run to completion on the file source and
# verified against the SAME oracles as their batch twins (stream/batch
# parity is the correctness claim).
# ---------------------------------------------------------------------------

import os  # noqa: E402
import tempfile  # noqa: E402
import threading  # noqa: E402

from pycasselastic_spark.streaming.sync import (  # noqa: E402
    SnapshotStore,
    read_event_stream,
    start_streaming_sync,
)
from pycasselastic_spark.streaming.windows import (  # noqa: E402
    sliding_event_counts,
    tumbling_event_counts,
)


#: The scale-safe state store: RocksDB keeps streaming state on local
#: disk with an in-memory cache instead of pinning every key in the
#: executor heap (the default HDFS-backed provider is memory-bound at
#: 100x key cardinality). Applied per-query in _run_stream_to_parquet
#: so the choice holds under ANY caller session (the driver gate's
#: included); tests/test_streaming.py pins provider-parity of results.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

#: _run_stream_to_parquet temporarily mutates SESSION-GLOBAL conf
#: (shuffle partitions + state provider) around the stream run; two
#: concurrent runs in one SparkSession would race and cross-apply each
#: other's settings. This lock serializes them (each catalog stream is
#: finite/availableNow, so holding it for the run is bounded).
_STREAM_CONF_LOCK = threading.Lock()


def _run_stream_to_parquet(
    spark, df, mode: str, state_partitions: int = 16,
    state_provider: str | None = ROCKSDB_PROVIDER,
) -> DataFrame:
    """Run a finite (availableNow) streaming DataFrame to completion
    through a FILE sink and read the result back.

    Why not ``format("memory")``: the memory sink materializes every
    result row in the DRIVER's heap — the one place that doesn't scale
    out. A parquet sink keeps results executor-written and
    distributed-readable, which is how a real pipeline would land them.
    File sinks only accept append mode, so complete/update-mode
    aggregations go through ``foreachBatch``: each micro-batch is
    written executor-parallel (complete overwrites — the last batch IS
    the final aggregate; update appends — callers fold the monotone
    update stream after read-back, exactly as they would from a real
    changelog sink).

    ``state_partitions`` sizes the stateful-operator partitioning for
    the stream only (restored after). Unlike batch shuffles, every
    state partition is a live state-store instance checkpointed every
    micro-batch, Spark pins the count at the first checkpoint for the
    query's life, and AQE cannot coalesce it — so it must be sized to
    stateful-key throughput rather than inherited from the batch
    shuffle setting (measured here: 64 inherited partitions made the
    stream-stream join 7x slower than 16 on the same data)."""
    workdir = tempfile.mkdtemp(prefix="stream_sink_")
    out = os.path.join(workdir, "out")
    checkpoint = os.path.join(workdir, "checkpoint")
    if mode == "append":
        writer = (
            df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", checkpoint)
        )
    else:
        save_mode = "overwrite" if mode == "complete" else "append"

        def sink(batch_df, _batch_id):
            batch_df.write.mode(save_mode).parquet(out)

        writer = (
            df.writeStream.outputMode(mode)
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
        )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    # RocksDB cost knobs, applied per-query so the choice holds under
    # ANY caller session (driver gate included), mirroring the provider
    # override: changelog checkpointing commits the per-batch changelog
    # instead of a full RocksDB snapshot per instance per micro-batch
    # (2x on this family — session.py documents the measurement), and
    # trackTotalNumberOfRows=false drops the metrics-only get-per-put.
    # Results are knob-independent (tests/test_streaming.py pins
    # provider parity; the oracles pin values).
    rocksdb_knobs = {
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
        "spark.sql.streaming.stateStore.rocksdb."
        "trackTotalNumberOfRows": "false",
    }
    with _STREAM_CONF_LOCK:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_provider = spark.conf.get(provider_key, None)
        prev_knobs = {k: spark.conf.get(k, None) for k in rocksdb_knobs}
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        if state_provider:
            spark.conf.set(provider_key, state_provider)
            for k, v in rocksdb_knobs.items():
                spark.conf.set(k, v)
        try:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            if state_provider:
                if prev_provider:
                    spark.conf.set(provider_key, prev_provider)
                else:
                    spark.conf.unset(provider_key)
                for k, prev in prev_knobs.items():
                    if prev is not None:
                        spark.conf.set(k, prev)
                    else:
                        spark.conf.unset(k)
    return spark.read.parquet(out)


@register(
    "streaming_tumbling_window_events",
    QUERIES["tumbling_window_events"].oracle,
    doc="The tumbling-window aggregation run as a real Structured "
    "Streaming query (file source -> watermark -> windowed agg -> "
    "parquet sink, availableNow) — must produce byte-identical results "
    "to the batch twin and its DuckDB oracle.",
)
def streaming_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = tumbling_event_counts(stream)
    return _run_stream_to_parquet(spark, agg, "complete")


@register(
    "streaming_lww_sync_events",
    QUERIES["lww_merge_events"].oracle,
    doc="The full sync pipeline as Structured Streaming: increments "
    "stream through foreachBatch into an LWW snapshot store "
    "(streaming/sync.py); the converged snapshot must equal the batch "
    "merge and its oracle — the reference daemon's convergence law.",
)
def streaming_lww_sync_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    increments = stream.select(
        F.col("user_id").alias("id"),
        F.unix_millis("ts").alias("version"),
        F.col("event_type").alias("text"),
        "event_id",
        F.when(F.col("event_id") % 2 == 1, "CASSANDRA")
        .otherwise("Elastic")
        .alias("source"),
    )
    workdir = tempfile.mkdtemp(prefix="lww-sync-")
    store = SnapshotStore(
        spark, f"{workdir}/snapshot", "id", "version", tiebreak_cols=["event_id"]
    )
    q = start_streaming_sync(increments, store, f"{workdir}/checkpoint")
    q.awaitTermination()
    return store.current()


@register(
    "streaming_static_enrich_events",
    """
SELECT c.c_mktsegment, COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Stream-static join: the event stream enriched against the "
    "static customer dimension (broadcast per micro-batch — no state "
    "store, the dim is re-read each batch so late dim updates are "
    "picked up) and aggregated by segment. The third join shape of the "
    "streaming matrix next to stream-stream and foreachBatch-merge; "
    "must equal the batch join oracle.",
)
def streaming_static_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        stream.select("user_id")
        .join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return _run_stream_to_parquet(spark, agg, "complete")


@register(
    "streaming_stream_stream_join",
    """
WITH e AS (SELECT user_id, event_id, event_type,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
c AS (SELECT user_id, event_id AS click_id, us AS cus
      FROM e WHERE event_type = 'click'),
b AS (SELECT user_id, event_id AS buy_id, us AS bus
      FROM e WHERE event_type = 'purchase')
SELECT c.user_id, c.click_id, b.buy_id
FROM c JOIN b ON c.user_id = b.user_id
              AND b.bus BETWEEN c.cus - 600000000 AND c.cus + 600000000
""",
    doc="Stream-stream inner join (clicks x purchases within 10 min, "
    "same user): both sides watermarked + time-range bound so the engine "
    "can expire join state (streaming/windows.py:stream_stream_join_within). "
    "Oracle replays the time-bounded equi-join in batch SQL with exact "
    "integer-microsecond bounds — stream/batch parity is the claim.",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.streaming.windows import stream_stream_join_within

    path = f"{sf_dir}/events.parquet"
    clicks = (
        read_event_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"))
    )
    buys = (
        read_event_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user_id"),
                F.col("ts").alias("buy_ts"),
                F.col("event_id").alias("buy_id"))
        .withColumnRenamed("b_user_id", "user_id")
    )
    joined = stream_stream_join_within(
        clicks, buys, key_col="user_id", left_ts="click_ts",
        right_ts="buy_ts", within="10 minutes",
    ).select(clicks["user_id"].alias("user_id"), "click_id", "buy_id")
    return _run_stream_to_parquet(spark, joined, "append")


# ---------------------------------------------------------------------------
# Stateful streaming: custom applyInPandasWithState operator and
# session windows — both verified against batch SQL oracles.
# ---------------------------------------------------------------------------

from pycasselastic_spark.streaming.stateful import first_event_per_key  # noqa: E402
from pycasselastic_spark.streaming.windows import session_window_counts  # noqa: E402


@register(
    "streaming_stateful_first_event",
    """
SELECT user_id, first_us, first_event_id FROM (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS first_us,
         event_id AS first_event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
  FROM events) WHERE rn = 1
""",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user earliest event maintained as explicit state across "
    "micro-batches; the converged state must equal the batch argmin "
    "oracle (streaming/stateful.py).",
)
def streaming_stateful_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    increments = stream.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    updates = _run_stream_to_parquet(spark, first_event_per_key(increments), "update")
    # the sink holds a monotone update stream; final answer = min per key
    return (
        updates
        .groupBy("user_id")
        .agg(
            F.min("first_us").alias("first_us"),
            F.min_by("first_event_id", F.struct("first_us", "first_event_id")).alias(
                "first_event_id"
            ),
        )
    )


@register(
    "streaming_session_window_events",
    """
WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
g AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, min(us) AS session_start_us, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    doc="Event-time session windows (session_window, 30-min gap) run as "
    "a streaming query; sessions must match the batch lag+cumsum "
    "sessionization oracle exactly.",
)
def streaming_session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    sessions = _run_stream_to_parquet(
        spark, session_window_counts(stream, gap="30 minutes"), "complete"
    )
    return sessions.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "n_events",
    )


@register(
    "approx_distinct_stats_events",
    """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events,
       true AS users_within_3rsd,
       true AS events_within_3rsd,
       true AS p50_within_rank_bounds
FROM events GROUP BY event_type
""",
    doc="Approximate aggregation sketches for 100 TB cardinalities: "
    "approx_count_distinct (HyperLogLog++, rsd=0.02) and "
    "percentile_approx. Sketch bits differ per engine, so the value "
    "oracle checks the TOLERANCE, not the estimate: the query emits "
    "exact distinct counts plus booleans asserting |HLL - exact| <= "
    "3*rsd*exact (three standard errors) and the approx median's rank "
    "within [p45, p55]; the oracle recomputes the exact counts and "
    "expects every tolerance flag true. A sketch outside its "
    "documented error bound is a hash mismatch, not prose. Tighter "
    "per-sketch error tracking stays in tests/test_approx.py.",
)
def approx_distinct_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # exact distinct counts as TWO-LEVEL aggregations, joined to the
    # sketch aggregation on the 5-row group key: packing countDistinct
    # next to other aggregates makes Catalyst rewrite the whole agg
    # through Expand (one row copy per distinct group — measured 8x
    # slower at sf0.1), while each two-level agg is two partial
    # hash aggregations and the sketch agg never expands
    d_users = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    d_events = (
        ev.groupBy("event_type", "event_id")
        .agg(F.count(F.lit(1)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("_ae"),
        F.percentile_approx("value", 0.5, 10000).alias("_ap50"),
        F.expr("percentile(value, 0.45)").alias("_p45"),
        F.expr("percentile(value, 0.55)").alias("_p55"),
    )
    agg = d_users.join(d_events, "event_type").join(sketches, "event_type")
    return agg.select(
        "event_type",
        "n_users",
        "n_events",
        (F.abs(F.col("_au") - F.col("n_users")) <= 0.06 * F.col("n_users")).alias(
            "users_within_3rsd"
        ),
        (F.abs(F.col("_ae") - F.col("n_events")) <= 0.06 * F.col("n_events")).alias(
            "events_within_3rsd"
        ),
        F.col("_ap50").between(F.col("_p45"), F.col("_p55")).alias(
            "p50_within_rank_bounds"
        ),
    )


