"""Structured Streaming tests: micro-batched LWW sync convergence,
stream/batch parity, and watermark late-data semantics."""

from __future__ import annotations

import datetime as dt
import os
import uuid

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import lww_merge
from pycasselastic_spark.sources.corpus import load_table
from pycasselastic_spark.streaming.sync import (
    SnapshotStore,
    read_event_stream,
    start_streaming_sync,
)
from pycasselastic_spark.streaming.windows import tumbling_event_counts


def _increments(df):
    return df.select(
        F.col("user_id").alias("id"),
        F.unix_millis("ts").alias("version"),
        F.col("event_type").alias("text"),
        "event_id",
    )


def test_multibatch_sync_converges_to_batch_answer(spark, sf_dir, tmp_path):
    """Split events into 4 files, stream them one file per micro-batch
    through the foreachBatch LWW sink; the final snapshot must equal the
    single-shot batch merge (idempotent argmax => order-insensitive)."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream-src")
    events.repartition(4).write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    store = SnapshotStore(
        spark, str(tmp_path / "snap"), "id", "version", tiebreak_cols=["event_id"]
    )
    q = start_streaming_sync(
        _increments(stream), store, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    got = {r["id"]: (r["version"], r["event_id"]) for r in store.current().collect()}
    want = {
        r["id"]: (r["version"], r["event_id"])
        for r in lww_merge(
            [_increments(events)], "id", "version", ["event_id"]
        ).collect()
    }
    assert got == want


def test_stream_batch_parity_tumbling(spark, sf_dir):
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    name = f"parity_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.table(name).collect()}

    events = load_table(spark, sf_dir, "events")
    from pycasselastic_spark.catalog import QUERIES

    batch = {tuple(r) for r in QUERIES["tumbling_window_events"].fn(spark, sf_dir).collect()}
    assert streamed == batch and len(batch) > 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg: a row older than the watermark must not
    reopen its (already emitted) window."""
    src = str(tmp_path / "late-src")
    sink_name = f"late_{uuid.uuid4().hex[:8]}"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, path):
        df = spark.createDataFrame(
            [(i, base + dt.timedelta(minutes=m), "click", 1.0) for i, m in rows],
            "event_id long, ts timestamp, event_type string, value double",
        )
        df.coalesce(1).write.mode("append").parquet(path)

    mk([(1, 1), (2, 60)], src)  # batch 1: window 00:00 gets 1 row; max t=01:00

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_name)
        .option("checkpointLocation", str(tmp_path / "late-ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one late row (00:02, far behind watermark 00:50) and
        # one fresh row to advance time
        mk([(3, 2), (4, 61)], src)
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = [tuple(r) for r in spark.table(sink_name).collect()]
    zero = dt.datetime(2024, 1, 1, 0, 0)
    # the 00:00 window emitted once, with only the on-time row counted
    assert [t for t in emitted if t[0] == zero] == [(zero, 1)]


def test_stateful_first_event_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState must carry state across micro-batches:
    stream the events in 4 single-file batches and converge to the
    batch argmin per user."""
    from pycasselastic_spark.streaming.stateful import first_event_per_key
    import uuid as _uuid

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stateful-src")
    events.repartition(4).write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    inc = stream.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
    name = f"state_{_uuid.uuid4().hex[:8]}"
    q = (
        first_event_per_key(inc)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "state-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert (q.lastProgress or {}).get("batchId", 0) >= 3  # really multi-batch

    got = {
        r["user_id"]: (r["m"]["first_us"], r["m"]["first_event_id"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(
            # paired min — independent min() per column could combine a
            # (us, event_id) pair that was never emitted together
            F.min_by(
                F.struct("first_us", "first_event_id"),
                F.struct("first_us", "first_event_id"),
            ).alias("m")
        )
        .collect()
    }
    got = {k: (v[0], v[1]) for k, v in got.items()}
    want = {
        r["user_id"]: (r["us"], r["event_id"])
        for r in events.select(
            "user_id", F.unix_micros("ts").alias("us"), "event_id"
        )
        .groupBy("user_id")
        .agg(F.min_by(F.struct("us", "event_id"), F.struct("us", "event_id")).alias("m"))
        .select("user_id", F.col("m.us").alias("us"), F.col("m.event_id").alias("event_id"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream join with watermarks + time-range condition must
    produce the same pairs as the equivalent batch join."""
    from pycasselastic_spark.streaming.windows import stream_stream_join_within
    import uuid as _uuid

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user_id"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks.write.parquet(cdir)
    buys.write.parquet(bdir)

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    bs = spark.readStream.schema(buys.schema).parquet(bdir).withColumnRenamed(
        "b_user_id", "user_id"
    )
    stream_joined = stream_stream_join_within(
        cs, bs, key_col="user_id", left_ts="click_ts", right_ts="buy_ts",
        within="10 minutes",
    ).select("click_id", "buy_id")
    name = f"ssj_{_uuid.uuid4().hex[:8]}"
    q = (
        stream_joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ssj-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {(r["click_id"], r["buy_id"]) for r in spark.table(name).collect()}

    batch_cond = (
        (clicks["user_id"] == buys["b_user_id"])
        & (buys["buy_ts"] >= clicks["click_ts"] - F.expr("INTERVAL 10 minutes"))
        & (buys["buy_ts"] <= clicks["click_ts"] + F.expr("INTERVAL 10 minutes"))
    )
    batch = {
        (r["click_id"], r["buy_id"])
        for r in clicks.join(buys, batch_cond).select("click_id", "buy_id").collect()
    }
    assert streamed == batch and len(batch) > 0


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState state server requires google.protobuf, "
    "absent from this container",
)
def test_transform_with_state_running_totals(spark, sf_dir):
    """transformWithStateInPandas running totals must equal the batch
    GROUP BY after one availableNow pass."""
    from pycasselastic_spark.streaming.stateful import running_totals_per_key
    from pycasselastic_spark.streaming.sync import read_event_stream

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        running_totals_per_key(stream.select("user_id", "value"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("tws_test").collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["tv"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert got == expect


def test_streaming_sync_into_fake_connector_stores(spark, sf_dir, tmp_path):
    """Streaming ingestion into an upsert store with server-side LWW —
    the reference's deployment on Spark, all layers composed: file
    stream -> foreachBatch -> write_table against the fake Cassandra
    data source (writetime upserts applied at its commit). The
    converged store must equal the batch LWW merge."""
    from pyspark.sql import functions as F

    from pycasselastic_spark.core.merge import lww_merge
    from pycasselastic_spark.sources.corpus import load_table
    from pycasselastic_spark.sources.fake_connectors import register_fake_connectors
    from pycasselastic_spark.sources.registry import TableRef, read_table, write_table
    from pycasselastic_spark.streaming.sync import read_event_stream

    register_fake_connectors(spark)
    ref = TableRef(
        "cassandra", "ks.stream_events", {"fake.root": str(tmp_path / "store")}
    )

    def to_increments(df):
        return df.select(
            F.col("user_id").alias("id"),
            F.unix_millis("ts").alias("version"),
            F.col("event_type").alias("text"),
        )

    stream = read_event_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1
    )
    q = (
        to_increments(stream)
        .writeStream.foreachBatch(
            lambda bdf, _bid: write_table(
                bdf, ref, mode="append", id_col="id", version_col="version"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["id"]: (r["version"], r["text"])
        for r in read_table(spark, ref).collect()
    }
    batch = to_increments(load_table(spark, sf_dir, "events"))
    want = {
        r["id"]: (r["version"], r["text"])
        for r in lww_merge([batch], "id", "version").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k


def test_incremental_neardup_batching_invariance(spark, sf_dir, tmp_path):
    """The streaming incremental-dedup claim: because the base corpus
    is static and cross-side pairs are independent per delta doc, the
    union of per-micro-batch answers equals the one-shot batch answer
    for ANY batching. Forced here: the delta lands as 4 files streamed
    one per trigger (4 real micro-batches)."""
    from pycasselastic_spark.operators.dedup import minhash_lsh_pairs_between

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    batch_answer = {
        (r["base_id"], r["delta_id"])
        for r in minhash_lsh_pairs_between(
            base, delta, "doc_id", "text"
        ).collect()
    }

    src = str(tmp_path / "delta_src")
    delta.repartition(4).write.parquet(src)
    out = str(tmp_path / "pairs_out")
    batches = []

    def sink(batch_df, batch_id):
        batches.append((batch_id, batch_df.count()))
        minhash_lsh_pairs_between(
            base, batch_df, "doc_id", "text"
        ).write.mode("append").parquet(out)

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batches) >= 2  # genuinely multiple micro-batches
    streamed = {
        (r["base_id"], r["delta_id"]) for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch_answer


class TestStateStoreProviderParity:
    """RocksDB is the package's state store (scale-safe: state lives on
    local disk, not executor heap). Results must be byte-identical to
    the HDFS-backed default provider — these pin that for both a custom
    applyInPandasWithState operator and a built-in session-window agg."""

    HDFS = (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    )

    def _first_event(self, spark, sf_dir, provider):
        from pycasselastic_spark import catalog
        from pycasselastic_spark.streaming.stateful import first_event_per_key

        stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
        inc = stream.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        out = catalog._run_stream_to_parquet(
            spark, first_event_per_key(inc), "update", state_provider=provider
        )
        return {
            tuple(r)
            for r in out.groupBy("user_id")
            .agg(F.min("first_us").alias("first_us"))
            .collect()
        }

    def _session_windows(self, spark, sf_dir, provider):
        from pycasselastic_spark import catalog
        from pycasselastic_spark.streaming.windows import session_window_counts

        stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
        out = catalog._run_stream_to_parquet(
            spark, session_window_counts(stream), "complete",
            state_provider=provider,
        )
        return {tuple(r) for r in out.collect()}

    def test_stateful_operator_parity(self, spark, sf_dir):
        from pycasselastic_spark import catalog

        rocks = self._first_event(spark, sf_dir, catalog.ROCKSDB_PROVIDER)
        hdfs = self._first_event(spark, sf_dir, self.HDFS)
        assert rocks and rocks == hdfs

    def test_session_window_parity(self, spark, sf_dir):
        from pycasselastic_spark import catalog

        rocks = self._session_windows(spark, sf_dir, catalog.ROCKSDB_PROVIDER)
        hdfs = self._session_windows(spark, sf_dir, self.HDFS)
        assert rocks and rocks == hdfs


def test_state_provider_escape_hatch(monkeypatch):
    """RocksDB is the session default, but an existing checkpoint
    created under the HDFS provider cannot switch providerClass —
    $SPARK_GRAFT_STATE_PROVIDER must select it back (ADVICE r6)."""
    from pycasselastic_spark.session import _state_store_provider

    monkeypatch.delenv("SPARK_GRAFT_STATE_PROVIDER", raising=False)
    assert _state_store_provider().endswith("RocksDBStateStoreProvider")
    monkeypatch.setenv("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
    assert _state_store_provider().endswith("HDFSBackedStateStoreProvider")
    monkeypatch.setenv("SPARK_GRAFT_STATE_PROVIDER", "com.example.MyProvider")
    assert _state_store_provider() == "com.example.MyProvider"


def test_snapshot_store_crash_between_generation_write_and_pointer_flip(
    spark, tmp_path, monkeypatch
):
    """Fault injection on the A/B commit: a merge that dies AFTER
    writing the new generation directory but BEFORE flipping the
    pointer must leave readers on the prior consistent snapshot, and
    the next (healthy) merge must converge to the argmax over ALL
    increments — the orphaned generation is simply overwritten."""
    from pycasselastic_spark.core.merge import lww_merge
    from pycasselastic_spark.streaming import sync as ssync

    store = SnapshotStore(spark, str(tmp_path / "snap"), "id", "version")
    inc1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "id LONG, version LONG, text STRING"
    )
    store.merge(inc1)
    before = sorted(map(tuple, store.current().collect()))

    # crash point: pointer flip (os.replace) raises — the generation
    # parquet write has already happened by then
    real_replace = os.replace

    def exploding_replace(src, dst):
        if os.path.basename(dst) == "CURRENT":
            raise OSError("injected crash before pointer flip")
        return real_replace(src, dst)

    monkeypatch.setattr(ssync.os, "replace", exploding_replace)
    inc2 = spark.createDataFrame(
        [(1, 20, "c"), (3, 5, "d")], "id LONG, version LONG, text STRING"
    )
    with pytest.raises(OSError, match="injected crash"):
        store.merge(inc2)
    # recovery invariant: readers still see the prior snapshot intact
    assert sorted(map(tuple, store.current().collect())) == before

    # healthy retry (the streaming engine replays the micro-batch):
    # converges to the argmax over everything ever merged
    monkeypatch.setattr(ssync.os, "replace", real_replace)
    store.merge(inc2)
    want = sorted(
        map(tuple, lww_merge([inc1, inc2], "id", "version").collect())
    )
    assert sorted(map(tuple, store.current().collect())) == want
