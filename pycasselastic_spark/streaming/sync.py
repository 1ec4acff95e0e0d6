"""Streaming form of the sync pipeline: a ``foreachBatch`` loop that
LWW-merges each micro-batch of increments into a snapshot store.

This is the reference daemon (``SyncCassElastic.py:17-47`` +
``pyCassElastic.py:54-115``) rebuilt on Structured Streaming: the
trigger replaces the sleep loop, the checkpoint replaces
``lastruntime.log``, and because the merge is an idempotent argmax,
micro-batch replays after failure converge to the same snapshot
(effectively-once without the reference's "abort or duplicate" guard at
``pyCassElastic.py:86-88``).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from pycasselastic_spark.core.merge import lww_merge


class SnapshotStore:
    """A tiny LWW snapshot store on parquet: ``merge(batch)`` folds an
    increment into the current snapshot with argmax-per-id semantics.

    Writes go to an alternating A/B directory and a pointer file flips
    afterwards — a poor man's atomic commit (a real deployment would use
    a transactional table format; the merge logic is identical).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str,
        version_col: str,
        tiebreak_cols: Sequence[str] = (),
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.version_col = version_col
        self.tiebreak_cols = list(tiebreak_cols)
        os.makedirs(path, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def current(self) -> DataFrame | None:
        """Read the current snapshot.

        SINGLE-WRITER CONTRACT: the pointer read and the generation
        open below are two separate steps, not one atomic action. They
        are safe because exactly one writer (the streaming query's
        foreachBatch, which Structured Streaming serializes per query)
        ever calls ``merge`` on a store path: a ``merge`` crashing
        between the generation write and the pointer flip leaves the
        pointer — and therefore every reader — on the previous
        consistent snapshot (see test_streaming's fault-injection
        test), and the next ``merge`` simply overwrites the orphaned
        generation directory. A multi-writer deployment would need a
        transactional table format instead (as the class docstring
        says)."""
        try:
            with open(self._pointer(), encoding="utf-8") as fh:
                gen = fh.read().strip()
        except FileNotFoundError:
            return None
        return self.spark.read.parquet(os.path.join(self.path, gen))

    def merge(self, batch: DataFrame) -> None:
        snapshot = self.current()
        inputs = [batch] if snapshot is None else [snapshot, batch]
        winners = lww_merge(
            inputs, self.id_col, self.version_col, self.tiebreak_cols
        )
        try:
            with open(self._pointer(), encoding="utf-8") as fh:
                nxt = "b" if fh.read().strip() == "a" else "a"
        except FileNotFoundError:
            nxt = "a"
        winners.write.mode("overwrite").parquet(os.path.join(self.path, nxt))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(nxt)
        os.replace(tmp, self._pointer())


def start_streaming_sync(
    increments: DataFrame,
    store: SnapshotStore,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
):
    """Run the sync as a streaming query: every micro-batch of increment
    rows is folded into the snapshot store. Returns the StreamingQuery
    handle (call ``processAllAvailable()``/``stop()`` or let it run on
    the trigger)."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        store.merge(batch_df)

    writer = (
        increments.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_table_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet table at ``path``, which may be
    either a single .parquet file (point the source at the parent dir
    and glob-filter to that file — the streaming file source only
    accepts directories) or a parquet directory (load it as-is). The
    isfile branch is load-bearing: hardcoding the single-file layout
    would silently yield an EMPTY stream on a directory corpus."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        return reader.load(os.path.dirname(path))
    return reader.load(path)


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events parquet layout (handles both
    corpus generations of ``ts`` — TIMESTAMP(NANOS)-as-long and
    no-timezone timestamp[us] — via the same conversions as the batch
    loader in ``sources.corpus.load_table``)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    stream = read_table_stream(spark, path, max_files_per_trigger)
    ts_type = stream.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # schema cached before the conf flip; session tz is UTC so the
        # cast preserves values (see sources.corpus)
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream
