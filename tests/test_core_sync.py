"""Core sync-operator tests.

Mirrors the reference's test strategy (SURVEY.md §5): generated
two-store fixtures, convergence-by-argmax golden checks
(``testBothSides``), window-exclusion (``testFromCassandraToElastic``),
and schema drift (``testDifferentSchemas``) — on DataFrames instead of
live Cassandra/ES.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.core import (
    SyncSpec,
    WatermarkStore,
    align_schemas,
    anti_echo,
    conflict_losers,
    lww_merge,
    scan_increment,
    schema_diff,
)
from pycasselastic_spark.core.specs import StoreSpec
from pycasselastic_spark.pipeline import run_cycle, sync_once

COLS = ["id", "version", "text", "source"]


def make_stores(spark):
    """Two store snapshots with the reference testBothSides shape:
    for ids 0..4 Cassandra has the newer version, for 5..9 ES does;
    id 10 exists only in C*, id 11 only in ES; id 12 ties on version."""
    cass, es = [], []
    for i in range(5):
        cass.append((f"id{i}", 1000 + i, f"new-c{i}", "CASSANDRA"))
        es.append((f"id{i}", 500 + i, f"old-e{i}", "Elastic"))
    for i in range(5, 10):
        cass.append((f"id{i}", 500 + i, f"old-c{i}", "CASSANDRA"))
        es.append((f"id{i}", 1000 + i, f"new-e{i}", "Elastic"))
    cass.append(("id10", 700, "only-c", "CASSANDRA"))
    es.append(("id11", 701, "only-e", "Elastic"))
    # equal version both sides: reference keeps the ES copy
    # (external versioning rejects equal versions) -> tiebreak on
    # source priority column in the caller.
    cass.append(("id12", 800, "tie-c", "CASSANDRA"))
    es.append(("id12", 800, "tie-e", "Elastic"))
    return (
        spark.createDataFrame(cass, COLS),
        spark.createDataFrame(es, COLS),
    )


def winners_by_id(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def with_priority(df):
    return df.withColumn(
        "prio", F.when(F.col("source") == "Elastic", 1).otherwise(0)
    )


class TestLwwMerge:
    def test_both_sides_converge(self, spark):
        cass, es = make_stores(spark)
        merged = lww_merge(
            [with_priority(cass), with_priority(es)],
            id_col="id",
            version_col="version",
            tiebreak_cols=["prio"],
        )
        got = winners_by_id(merged)
        assert len(got) == 13
        for i in range(5):
            assert got[f"id{i}"]["text"] == f"new-c{i}"
        for i in range(5, 10):
            assert got[f"id{i}"]["text"] == f"new-e{i}"
        assert got["id10"]["text"] == "only-c"
        assert got["id11"]["text"] == "only-e"
        # version tie: ES wins, matching reference external-versioning
        assert got["id12"]["text"] == "tie-e"

    def test_idempotent(self, spark):
        """Merging the merge output with either input changes nothing —
        the convergence law of SURVEY.md §2.3."""
        cass, es = make_stores(spark)
        cass, es = with_priority(cass), with_priority(es)
        once = lww_merge([cass, es], "id", "version", ["prio"])
        twice = lww_merge([once, cass, es], "id", "version", ["prio"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_single_input(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "x", "S"), ("a", 2, "y", "S"), ("b", 1, "z", "S")], COLS
        )
        got = winners_by_id(lww_merge([df], "id", "version"))
        assert got["a"]["text"] == "y" and got["b"]["text"] == "z"

    def test_schema_drift_tolerated(self, spark):
        """ES gains a column the C* side lacks (testDifferentSchemas):
        merge succeeds, missing column = NULL."""
        cass = spark.createDataFrame([("a", 1, "c-old")], ["id", "version", "text"])
        es = spark.createDataFrame(
            [("a", 2, "e-new", "extra")], ["id", "version", "text", "new_col"]
        )
        got = winners_by_id(lww_merge([cass, es], "id", "version"))
        assert got["a"]["text"] == "e-new" and got["a"]["new_col"] == "extra"
        # and the winner that lacks the drifted column yields NULL
        es_old = spark.createDataFrame(
            [("b", 1, "e-old", "extra")], ["id", "version", "text", "new_col"]
        )
        cass_new = spark.createDataFrame([("b", 2, "c-new")], ["id", "version", "text"])
        got = winners_by_id(lww_merge([cass_new, es_old], "id", "version"))
        assert got["b"]["text"] == "c-new" and got["b"]["new_col"] is None

    def test_errors(self, spark):
        df = spark.createDataFrame([("a", 1, "x", "S")], COLS)
        with pytest.raises(ValueError):
            lww_merge([], "id", "version")
        with pytest.raises(ValueError):
            lww_merge([df], "nope", "version")
        with pytest.raises(ValueError):
            lww_merge([df], "id", "nope")


class TestAntiEcho:
    def test_excludes_own_source_keeps_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "x", "CASSANDRA"), ("b", 1, "y", "Elastic"), ("c", 1, "z", None)],
            COLS,
        )
        kept = {r["id"] for r in anti_echo(df, "source", "CASSANDRA").collect()}
        assert kept == {"b", "c"}


class TestScanIncrement:
    def test_half_open_window(self, spark):
        df = spark.createDataFrame([(f"i{v}", v, "t", "S") for v in range(10)], COLS)
        got = {r["version"] for r in scan_increment(df, "version", 3, 7).collect()}
        assert got == {4, 5, 6, 7}
        assert scan_increment(df, "version", None, 2).count() == 3
        assert scan_increment(df, "version", 8, None).count() == 1
        assert scan_increment(df, "version", None, None).count() == 10

    def test_old_rows_excluded(self, spark):
        """The reference's testFromCassandraToElastic: rows older than
        the watermark window must not sync."""
        df = spark.createDataFrame(
            [("old", 100, "t", "S"), ("new", 900, "t", "S")], COLS
        )
        got = {r["id"] for r in scan_increment(df, "version", 500, 1000).collect()}
        assert got == {"new"}


class TestConflictLosers:
    def test_losers_are_non_winners(self, spark):
        cass, es = make_stores(spark)
        cass, es = with_priority(cass), with_priority(es)
        merged = lww_merge([cass, es], "id", "version", tiebreak_cols=["prio"])
        losers = conflict_losers(cass, merged, "id", "version", tiebreak_cols=["prio"])
        ids = {(r["id"], r["version"]) for r in losers.collect()}
        # C* loses ids 5..9 (older versions) AND id12 (version tie lost
        # on the source-priority tiebreak — the reference's equal-version
        # 409-delete case); id10 and the 0..4 it won are absent
        assert ids == {(f"id{i}", 500 + i) for i in range(5, 10)} | {("id12", 800)}


class TestSchema:
    def test_schema_diff(self, spark):
        a = spark.createDataFrame([(1, "x")], ["id", "text"]).schema
        b = spark.createDataFrame([(1, "x", 2.0)], ["id", "text", "score"]).schema
        diff = schema_diff(a, b)
        assert list(diff) == ["score"]
        assert schema_diff(b, a) == {}

    def test_align_schemas(self, spark):
        a = spark.createDataFrame([(1, "x")], ["id", "text"])
        b = spark.createDataFrame([(2, 3.5)], ["id", "score"])
        aa, bb = align_schemas([a, b])
        assert aa.columns == bb.columns == ["id", "text", "score"]
        row = {r["id"]: r for r in aa.unionByName(bb).collect()}
        assert row[1]["score"] is None and row[2]["text"] is None

    def test_append_with_evolution_alters_at_rest(self, spark):
        """At-rest DDL evolution (reference pyCassElastic.py:438-444):
        a drifted batch physically widens the stored table; old rows
        read NULL for the added column; columns missing from the new
        batch are NULL-filled, never dropped."""
        import uuid

        from pycasselastic_spark.core.schema import append_with_evolution

        table = f"evo_{uuid.uuid4().hex[:8]}"
        try:
            first = spark.createDataFrame([(1, "x")], ["id", "text"])
            assert append_with_evolution(first, table) == {}

            drifted = spark.createDataFrame([(2, "y", 3.5)], ["id", "text", "score"])
            added = append_with_evolution(drifted, table)
            assert list(added) == ["score"]

            narrow = spark.createDataFrame([(3,)], ["id"])
            assert append_with_evolution(narrow, table) == {}

            rows = {r["id"]: r for r in spark.table(table).collect()}
            assert set(spark.table(table).columns) == {"id", "text", "score"}
            assert rows[1]["score"] is None
            assert rows[2]["score"] == 3.5
            assert rows[3]["text"] is None and rows[3]["score"] is None
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


class TestWatermark:
    def test_roundtrip_and_bootstrap(self, tmp_path):
        store = WatermarkStore(str(tmp_path / "wm.json"))
        assert store.last() is None
        assert store.last(default=42) == 42
        store.commit(123456)
        assert store.last() == 123456
        store.commit(999)
        assert store.last() == 999

    def test_corrupt_raises(self, tmp_path):
        p = tmp_path / "wm.json"
        p.write_text('{"watermark_millis": "nope"}')
        with pytest.raises(ValueError):
            WatermarkStore(str(p)).last()


class TestPipeline:
    def _spec(self, **kw):
        base = dict(
            name="s1",
            id_col="id",
            version_col="version",
            filter_date=True,
            ignore_same_source=True,
            tiebreak_cols=("prio",),
            left=StoreSpec(table="cass", source_id="CASSANDRA"),
            right=StoreSpec(table="es", source_id="Elastic"),
        )
        base.update(kw)
        return SyncSpec(**base)

    def test_sync_once_converges(self, spark):
        cass, es = make_stores(spark)
        spec = self._spec(ignore_same_source=False)
        res = sync_once(spec, with_priority(cass), with_priority(es), lo=None, hi=None)
        assert res.ok
        got = winners_by_id(res.winners)
        assert got["id0"]["text"] == "new-c0" and got["id9"]["text"] == "new-e9"
        assert got["id12"]["text"] == "tie-e"

    def test_run_cycle_commits_watermark(self, spark, tmp_path):
        cass, es = make_stores(spark)
        cass, es = with_priority(cass), with_priority(es)
        store = WatermarkStore(str(tmp_path / "wm.json"))
        spec = self._spec(ignore_same_source=False)
        sunk = {}

        def sink(sp, result):
            sunk[sp.name] = result.winners.count()

        results = run_cycle([spec], lambda sp: (cass, es), sink, store, now_millis=5000)
        assert results[0].ok and sunk["s1"] == 13
        assert store.last() == 5000

    def test_run_cycle_error_isolation(self, spark, tmp_path):
        cass, es = make_stores(spark)
        cass, es = with_priority(cass), with_priority(es)
        store = WatermarkStore(str(tmp_path / "wm.json"))
        good = self._spec(ignore_same_source=False)
        bad = self._spec(name="s2", id_col="missing_col", ignore_same_source=False)

        def sink(sp, result):
            result.winners.count()

        results = run_cycle(
            [bad, good], lambda sp: (cass, es), sink, store, now_millis=5000
        )
        assert [r.ok for r in results] == [False, True]
        # a failed spec blocks the watermark advance (at-least-once)
        assert store.last() is None


class TestFieldsListProjection:
    def test_sync_once_projects_fields(self, spark):
        """Reference O2 (fields_list config, pyCassElastic.py:201):
        the sync plan only carries the configured columns."""
        df = spark.createDataFrame(
            [("a", 1, "x", "S", "extra")], COLS + ["junk"]
        )
        spec = SyncSpec(
            name="proj",
            id_col="id",
            version_col="version",
            filter_date=False,
            fields_list=("id", "version", "text"),
            left=StoreSpec(table="l"),
            right=StoreSpec(table="r"),
        )
        res = sync_once(spec, df, df.limit(0), lo=None, hi=None)
        assert res.winners.columns == ["id", "version", "text"]


class TestEchoSuppression:
    def _spec(self, left_sid, right_sid):
        return SyncSpec(
            name="echo",
            id_col="id",
            version_col="version",
            filter_date=False,
            ignore_same_source=True,
            left=StoreSpec(table="l", source_id=left_sid),
            right=StoreSpec(table="r", source_id=right_sid),
        )

    def test_one_sided_source_id_still_suppresses(self, spark):
        """Regression: with only left.source_id configured, rows that
        originated at left must STILL be excluded from the right-side
        increment (they'd echo back to their own store), and no rows
        may be dropped by matching an empty-string source."""
        left = spark.createDataFrame([("a", 1, "mine", "CASS")], COLS)
        right = spark.createDataFrame(
            [
                ("a", 2, "echoed", "CASS"),   # originated at left -> drop
                ("b", 1, "foreign", "ES"),    # genuine right row -> keep
                ("c", 1, "empty", ""),        # empty provenance -> keep
            ],
            COLS,
        )
        res = sync_once(self._spec("CASS", None), left, right, lo=None, hi=None)
        got = winners_by_id(res.winners)
        # the echoed row lost its chance to overwrite id 'a'
        assert got["a"]["text"] == "mine"
        assert got["b"]["text"] == "foreign"
        assert got["c"]["text"] == "empty"


class TestOrderingTypeGuard:
    def test_mixed_version_types_rejected(self, spark):
        """A string-typed version column on one side must not silently
        coerce the argmax into lexicographic order ('9' > '100')."""
        a = spark.createDataFrame([("x", 100, "new")], ["id", "version", "text"])
        b = spark.createDataFrame([("x", "9", "old")], ["id", "version", "text"])
        with pytest.raises(ValueError, match="conflicting types"):
            lww_merge([a, b], "id", "version")
