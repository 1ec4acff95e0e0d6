"""Tests for the ``lwwstore`` Python Data Source — the executable
contract of the reference stores' semantics (versioned LWW upsert,
bulk-commit atomicity, token-range-style partitioned scans, pushdown)
run through Spark's real DSv2 planner and commit protocol."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import lww_merge
from pycasselastic_spark.sources.pyds import (
    DEFAULT_SCHEMA,
    _read_committed_segments,
    register_lwwstore,
)


@pytest.fixture()
def store(spark, tmp_path):
    register_lwwstore(spark)
    return str(tmp_path / "store")


def _write(df, path, mode="append", **opts):
    w = df.write.format("lwwstore").option("path", path)
    for k, v in opts.items():
        w = w.option(k, str(v))
    w.mode(mode).save()


def _read(spark, path, **opts):
    r = spark.read.format("lwwstore").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_versioned_upsert_across_bulk_writes(spark, store):
    """Two bulk writes with conflicting versions: the read surfaces
    per-id winners — higher version wins, stale writes are absorbed
    (reference O5 external versioning + O7 loser retraction)."""
    df1 = spark.createDataFrame(
        [(1, 10, "v10", "CASS"), (2, 10, "w10", "CASS")], DEFAULT_SCHEMA
    )
    df2 = spark.createDataFrame(
        [(1, 20, "v20", "ES"), (2, 3, "stale", "ES"), (3, 7, "y7", "CASS")],
        DEFAULT_SCHEMA,
    )
    _write(df1, store)
    _write(df2, store)
    got = {r["id"]: (r["version"], r["text"]) for r in _read(spark, store).collect()}
    assert got == {1: (20, "v20"), 2: (10, "w10"), 3: (7, "y7")}


def test_matches_lww_merge_on_random_increments(spark, store):
    """Store-resolved winners must equal the engine's lww_merge over
    the same increments — the same equivalence law the reference's
    checkSync asserts, now between a real sink/source pair and the
    relational operator."""
    import random

    rng = random.Random(11)
    rows = [
        (rng.randrange(40), rng.randrange(1000), f"t{i}", "S")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, DEFAULT_SCHEMA)
    half_a = df.filter(F.col("version") % 2 == 0)
    half_b = df.filter(F.col("version") % 2 == 1)
    _write(half_a, store, tiebreak_col="text")
    _write(half_b, store, tiebreak_col="text")
    got = sorted(
        map(tuple, _read(spark, store, tiebreak_col="text").collect())
    )
    want = sorted(
        map(
            tuple,
            lww_merge([half_a, half_b], "id", "version", tiebreak_cols=["text"])
            .select("id", "version", "text", "source")
            .collect(),
        )
    )
    assert got == want


def test_pushdown_version_window_and_provenance(spark, store):
    """The incremental-scan predicates (version half-open window, O1;
    source anti-filter, O4) push into the reader and return exactly
    the SQL-semantics rows — including NULL provenance dropped by
    ``!=`` (a NULL-keeping variant is anti_echo's contract, applied
    engine-side)."""
    df = spark.createDataFrame(
        [
            (1, 5, "a", "CASS"),
            (2, 15, "b", "ES"),
            (3, 25, "c", "CASS"),
            (4, 18, "d", None),
        ],
        DEFAULT_SCHEMA,
    )
    _write(df, store)
    out = _read(spark, store).filter(
        (F.col("version") > 10)
        & (F.col("version") <= 20)
        & (F.col("source") != "CASS")
    )
    assert [r["id"] for r in out.collect()] == [2]


def test_overwrite_truncates_previous_generations(spark, store):
    df1 = spark.createDataFrame([(1, 10, "old", "S")], DEFAULT_SCHEMA)
    df2 = spark.createDataFrame([(2, 1, "new", "S")], DEFAULT_SCHEMA)
    _write(df1, store)
    _write(df2, store, mode="overwrite")
    got = [tuple(r) for r in _read(spark, store).collect()]
    assert got == [(2, 1, "new", "S")]


def test_scan_parallelism_is_bucket_count(spark, store):
    """One InputPartition per touched bucket — the token-range-scan
    shape; and every version of one id lands in ONE bucket (the
    co-located merge invariant)."""
    df = spark.createDataFrame(
        [(i % 8, v, f"t{v}", "S") for i in range(64) for v in (1, 2)],
        DEFAULT_SCHEMA,
    )
    _write(df, store, n_buckets=8)
    out = _read(spark, store, n_buckets=8)
    assert out.rdd.getNumPartitions() <= 8
    # winners: one row per distinct id, each at version 2
    rows = out.collect()
    assert len(rows) == 8 and all(r["version"] == 2 for r in rows)


def test_commit_is_atomic_manifest(spark, store):
    """Segments exist only under a committed manifest: the manifest
    lists every visible segment, and generations are cumulative in
    append mode."""
    df = spark.createDataFrame([(1, 1, "a", "S")], DEFAULT_SCHEMA)
    _write(df, store)
    segs1 = _read_committed_segments(store)
    _write(df, store)
    segs2 = _read_committed_segments(store)
    assert set(segs1) <= set(segs2) and len(segs2) > len(segs1)
    for seg in segs2:
        assert os.path.exists(os.path.join(store, seg))


def test_stream_reader_emits_only_new_segments(spark, store, tmp_path):
    """readStream over the store emits INCREMENTS: the first
    availableNow run drains everything committed so far; after more
    bulk writes, a resumed run (same checkpoint) emits ONLY the new
    segments — the reference's watermark-windowed incremental scan
    (O1/O3/O10) as a real streaming source with exactly-once offsets."""
    out_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("lwwstore")
            .option("path", store)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {tuple(r) for r in spark.read.parquet(out_dir).collect()}

    df1 = spark.createDataFrame(
        [(1, 10, "a", "CASS"), (2, 11, "b", "CASS")], DEFAULT_SCHEMA
    )
    _write(df1, store)
    got1 = drain()
    assert {(r[0], r[1]) for r in got1} == {(1, 10), (2, 11)}

    df2 = spark.createDataFrame(
        [(1, 20, "c", "ES"), (3, 12, "d", "ES")], DEFAULT_SCHEMA
    )
    _write(df2, store)
    got2 = drain()
    # cumulative sink now holds ALL increments exactly once — the
    # second run did not re-emit bulk 1
    assert len(got2) == 4
    assert {(r[0], r[1]) for r in got2} == {(1, 10), (2, 11), (1, 20), (3, 12)}


def test_compaction_preserves_winners_and_shrinks_segments(spark, store):
    """compact_lwwstore folds many generations into one winner-only
    segment set: resolved rows identical, chain shorter, orphaned
    segment files GC'd."""
    from pycasselastic_spark.sources.pyds import (
        compact_lwwstore,
        _read_committed_segments,
    )

    for gen in range(4):
        df = spark.createDataFrame(
            [(i, gen * 10 + (i % 3), f"g{gen}r{i}", "S") for i in range(20)],
            DEFAULT_SCHEMA,
        )
        _write(df, store, n_buckets=4)
    want = sorted(map(tuple, _read(spark, store, n_buckets=4).collect()))
    n_before, n_after = compact_lwwstore(spark, store, n_buckets=4)
    assert n_after < n_before
    got = sorted(map(tuple, _read(spark, store, n_buckets=4).collect()))
    assert got == want
    # GC removed everything not in the live manifest
    live = set(_read_committed_segments(store))
    seg_root = os.path.join(store, "seg")
    on_disk = {
        os.path.relpath(os.path.join(dp, f), store)
        for dp, _, fs in os.walk(seg_root)
        for f in fs
    }
    assert on_disk == live


def test_complex_types_round_trip(spark, store):
    """Arrays and maps survive the JSON wire + Arrow read path and
    LWW-resolve per id like any scalar payload (the reference's ES
    documents are nested JSON — schema flexibility is part of the
    store contract)."""
    ddl = "id BIGINT, version BIGINT, tags ARRAY<STRING>, meta MAP<STRING,BIGINT>"
    df = spark.createDataFrame(
        [(1, 2, ["a", "b"], {"k": 7}), (1, 5, ["c"], {"j": 9}),
         (2, 1, [], {})],
        ddl,
    )
    _write(df, store, schema=ddl)
    out = {
        r["id"]: (r["version"], list(r["tags"]), dict(r["meta"]))
        for r in _read(spark, store, schema=ddl).collect()
    }
    assert out == {1: (5, ["c"], {"j": 9}), 2: (1, [], {})}


def test_abort_removes_uncommitted_segments(spark, store):
    """The writer's abort contract: segments written by tasks of a
    failed job are removed and never referenced by any manifest —
    driven at the unit level (fabricating a task failure inside a
    Spark job is nondeterministic; the abort hook itself is the
    contract)."""
    from pyspark.sql.types import StructType
    from pycasselastic_spark.sources.pyds import (
        LwwStoreWriter,
        _read_committed_segments,
    )

    schema = StructType.fromDDL(DEFAULT_SCHEMA)
    # a committed generation first
    df = spark.createDataFrame([(1, 1, "keep", "S")], DEFAULT_SCHEMA)
    _write(df, store)
    committed = set(_read_committed_segments(store))

    writer = LwwStoreWriter(schema, {"path": store}, overwrite=False)
    msg = writer.write(iter([(2, 9, "doomed", "S"), (3, 9, "doomed", "S")]))
    written = [os.path.join(store, rel) for rel in msg.segments]
    assert all(os.path.exists(p) for p in written)
    writer.abort([msg, None])  # None = a task that never reported
    assert all(not os.path.exists(p) for p in written)
    assert set(_read_committed_segments(store)) == committed
    # the store still reads exactly the committed generation
    assert [r["id"] for r in _read(spark, store).collect()] == [1]


def test_store_to_store_streaming_replication(spark, store, tmp_path):
    """The reference's actual topology — continuous store-to-store
    replication — through real pluggable machinery end to end:
    bulk writes land in store A, a streaming read of A feeds a
    streaming lwwstore WRITE into store B (per-micro-batch manifest
    commits with batch-id idempotence), and B's resolved winners must
    equal A's after each drain."""
    dst = str(tmp_path / "dst")
    checkpoint = str(tmp_path / "ckpt")

    def replicate():
        q = (
            spark.readStream.format("lwwstore")
            .option("path", store)
            .load()
            .writeStream.format("lwwstore")
            .option("path", dst)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    df1 = spark.createDataFrame(
        [(1, 10, "a", "CASS"), (2, 11, "b", "CASS")], DEFAULT_SCHEMA
    )
    _write(df1, store)
    replicate()
    winners = lambda p: sorted(map(tuple, _read(spark, p).collect()))  # noqa: E731
    assert winners(dst) == winners(store)

    # an upsert + a stale write in store A propagate correctly
    df2 = spark.createDataFrame(
        [(1, 20, "c", "ES"), (2, 3, "stale", "ES"), (3, 12, "d", "ES")],
        DEFAULT_SCHEMA,
    )
    _write(df2, store)
    replicate()
    assert winners(dst) == winners(store)
    assert dict((r[0], r[1]) for r in winners(dst)) == {1: 20, 2: 11, 3: 12}


def test_stream_writer_commit_is_batch_idempotent(spark, store):
    """Replaying a micro-batch (same batchId) must not double-publish:
    the second commit's segments are dropped, the store stays at one
    visible copy — at-least-once delivery becomes exactly-once
    visibility."""
    from pyspark.sql.types import StructType
    from pycasselastic_spark.sources.pyds import (
        LwwStoreStreamWriter,
        _read_committed_segments,
    )

    schema = StructType.fromDDL(DEFAULT_SCHEMA)
    w = LwwStoreStreamWriter(schema, {"path": store})
    m1 = w.write(iter([(1, 5, "x", "S")]))
    w.commit([m1], batchId=0)
    visible_after_first = list(_read_committed_segments(store))
    # engine retries batch 0 (e.g. driver failover mid-commit-ack)
    m2 = w.write(iter([(1, 5, "x", "S")]))
    w.commit([m2], batchId=0)
    assert _read_committed_segments(store) == visible_after_first
    rows = _read(spark, store).collect()
    assert len(rows) == 1 and rows[0]["version"] == 5


def test_streaming_written_store_is_self_describing(spark, store, tmp_path):
    """A store created ONLY via writeStream must carry its schema in
    the manifest like a batch-written one: a schema-less read returns
    the real columns, not DEFAULT_SCHEMA NULL projections."""
    ddl = "id BIGINT, version BIGINT, score DOUBLE, label STRING"
    src = str(tmp_path / "src_parquet")
    dst = str(tmp_path / "stream_only_store")
    spark.createDataFrame([(1, 3, 2.5, "x"), (2, 7, 1.0, "y")], ddl).write.parquet(src)
    q = (
        spark.readStream.schema(ddl).parquet(src)
        .writeStream.format("lwwstore")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.format("lwwstore").option("path", dst).load()
    assert [f.name for f in out.schema.fields] == ["id", "version", "score", "label"]
    got = {r["id"]: (r["version"], r["score"], r["label"]) for r in out.collect()}
    assert got == {1: (3, 2.5, "x"), 2: (7, 1.0, "y")}


def test_null_tiebreak_does_not_break_reader(spark, store):
    """Version ties where the tiebreak column holds NULLs must resolve
    like max_by over a struct (non-NULL tiebreak beats NULL), not raise
    a Python None-comparison TypeError in the reader."""
    ddl = "id BIGINT, version BIGINT, text STRING, source STRING"
    df = spark.createDataFrame(
        [(1, 5, None, "A"), (1, 5, "kept", "B"), (2, 5, None, "C")], ddl
    )
    _write(df, store, tiebreak_col="text")
    got = {r["id"]: (r["text"], r["source"])
           for r in _read(spark, store, tiebreak_col="text").collect()}
    assert got[1] == ("kept", "B")  # non-NULL tiebreak wins the tie
    assert got[2] == (None, "C")    # all-NULL group still surfaces


def test_concurrent_manifest_commit_never_loses_a_generation(spark, store):
    """Two commits racing for the same generation number must
    serialize: the exclusive-link claim makes the loser retry with the
    next generation instead of clobbering the winner's manifest."""
    from pycasselastic_spark.sources.pyds import _commit_manifest, _manifest_paths

    df = spark.createDataFrame([(1, 1, "a", "S")], DEFAULT_SCHEMA)
    _write(df, store)  # generation 0 exists
    import json as _json
    seen_gens = []

    def payload(gen):
        # simulate a concurrent writer claiming THIS generation in the
        # window between the directory listing and our link attempt
        seen_gens.append(gen)
        if gen == 1:
            with open(os.path.join(store, "manifest-00000001.json"), "w") as f:
                _json.dump(
                    {"generation": 1, "segments": ["seg/bucket=0/other.jsonl"]}, f
                )
        return {"generation": gen, "segments": []}

    got = _commit_manifest(store, payload)
    assert got == 2 and seen_gens == [1, 2]  # first attempt collided, retried
    assert _manifest_paths(store) == [
        "manifest-00000000.json", "manifest-00000001.json", "manifest-00000002.json"
    ]
    # the concurrent writer's manifest survived intact
    with open(os.path.join(store, "manifest-00000001.json")) as f:
        assert _json.load(f)["segments"] == ["seg/bucket=0/other.jsonl"]


def test_stream_replay_across_compaction_gc(spark, store):
    """readBetweenOffsets over a pre-compaction offset window (the
    documented micro-batch retry path) must not fail on GC'd segments:
    with the COMPACTION watermark present they are skipped — their
    surviving winners are re-delivered by the compacted generation —
    while a missing file WITHOUT a compaction is still an error."""
    from pyspark.sql.types import StructType
    from pycasselastic_spark.sources.pyds import (
        LwwStoreStreamReader,
        compact_lwwstore,
    )

    for v in (1, 2):
        df = spark.createDataFrame(
            [(i, v, f"t{v}", "S") for i in range(8)], DEFAULT_SCHEMA
        )
        _write(df, store, n_buckets=4)
    reader = LwwStoreStreamReader(
        StructType.fromDDL(DEFAULT_SCHEMA), {"path": store}
    )
    # a missing segment with NO compaction marker is corruption: raise
    segs = _read_committed_segments(store)
    victim = os.path.join(store, segs[0])
    os.rename(victim, victim + ".hidden")
    with pytest.raises(FileNotFoundError):
        reader.readBetweenOffsets({"generation": -1}, {"generation": 1})
    os.rename(victim + ".hidden", victim)

    compact_lwwstore(spark, store, n_buckets=4)  # GCs gen-0/1 segments
    # replaying the pre-compaction window now skips GC'd files cleanly
    replay = reader.readBetweenOffsets({"generation": -1}, {"generation": 1})
    assert replay == []  # every old segment was compacted away
    # and the compacted generation re-delivers all winners to the stream
    latest = reader._generation()
    rows = reader.readBetweenOffsets({"generation": latest - 1}, {"generation": latest})
    assert {(r[0], r[1]) for r in rows} == {(i, 2) for i in range(8)}


def test_store_is_self_describing(spark, store):
    """A store written with a custom schema reads back correctly with
    NO schema option: the manifest persists the schema (parquet-style
    self-description), closing the silent-NULL-projection trap of a
    forgotten or mistyped per-read schema option."""
    ddl = "id BIGINT, version BIGINT, score DOUBLE, tags ARRAY<STRING>"
    df = spark.createDataFrame([(1, 3, 2.5, ["x", "y"])], ddl)
    _write(df, store, schema=ddl)
    out = spark.read.format("lwwstore").option("path", store).load()
    assert [f.name for f in out.schema.fields] == ["id", "version", "score", "tags"]
    r = out.collect()[0]
    assert (r["id"], r["version"], r["score"], list(r["tags"])) == (1, 3, 2.5, ["x", "y"])
