"""Anti-entropy diff invariants (core/diff.py): digest
order-independence, agreement short-circuit, exact drift detection,
and the bucket-prune plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.core.diff import bucket_digests, table_diff


def _store(spark, n=2_000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), (F.col("id") % 13).cast("string")).alias("val"),
    )


def test_digests_are_partitioning_and_order_independent(spark):
    a = _store(spark)
    # same rows, different physical layout and order
    b = _store(spark).repartition(17, "val").sortWithinPartitions(F.desc("k"))
    da = {tuple(r) for r in bucket_digests(a, "k", ["grp", "val"]).collect()}
    db = {tuple(r) for r in bucket_digests(b, "k", ["grp", "val"]).collect()}
    assert da == db


def test_identical_stores_diff_empty(spark):
    a = _store(spark)
    assert table_diff(a, _store(spark), "k", ["grp", "val"]).count() == 0


def test_detects_exactly_the_planted_drift(spark):
    a = _store(spark, 2_000)
    b = (
        _store(spark, 2_000)
        .filter(F.col("k") % 19 != 0)  # deletions
        .withColumn(
            "val",
            F.when(F.col("k") % 23 == 0, F.lit("corrupted")).otherwise(
                F.col("val")
            ),
        )
        .unionByName(  # one extra row only in b
            spark.createDataFrame([(99_999, 0, "vx")], "k long, grp long, val string")
        )
    )
    got = {
        (r["k"], r["diff_status"])
        for r in table_diff(a, b, "k", ["grp", "val"]).collect()
    }
    want = {(k, "missing_in_b") for k in range(0, 2_000, 19)}
    want |= {
        (k, "payload_differs")
        for k in range(0, 2_000, 23)
        if k % 19 != 0
    }
    want.add((99_999, "missing_in_a"))
    assert got == want


def test_row_join_reads_only_flagged_buckets(spark):
    """The scale property: one corrupt row flags one bucket, and the
    row-level join's inputs are semi-join pruned to that bucket."""
    a = _store(spark, 2_000)
    b = _store(spark, 2_000).withColumn(
        "val", F.when(F.col("k") == 123, "oops").otherwise(F.col("val"))
    )
    diff = table_diff(a, b, "k", ["grp", "val"], n_buckets=64)
    rows = diff.collect()
    assert {(r["k"], r["diff_status"]) for r in rows} == {(123, "payload_differs")}
    from pycasselastic_spark.plans import tuning

    plan = tuning.physical_plan(diff)
    assert "LeftSemi" in plan  # bucket prune reached the physical plan


def test_digest_resists_separator_injection_and_null_position(spark):
    """Adversarial field-boundary cases: per-column hashing means a '|'
    inside a value can't forge a boundary, and the NULL sentinel makes
    NULL position significant (concat_ws would otherwise skip it)."""
    schema = "k long, grp string, val string"
    pairs = [
        # ('a|b','c') vs ('a','b|c') — same concat_ws('|') image
        (spark.createDataFrame([(1, "a|b", "c")], schema),
         spark.createDataFrame([(1, "a", "b|c")], schema)),
        # ('x',NULL,'y')-style NULL shift: concat_ws skips NULLs
        (spark.createDataFrame([(1, None, "y")], schema),
         spark.createDataFrame([(1, "y", None)], schema)),
    ]
    for a, b in pairs:
        got = table_diff(a, b, "k", ["grp", "val"]).collect()
        assert [(r["k"], r["diff_status"]) for r in got] == [(1, "payload_differs")]


def test_duplicate_rows_cannot_xor_cancel(spark):
    """A={r,r,s} vs B={s,t,t}: equal xor_digest and equal n_rows, but
    sum_digest differs — the bucket must still be flagged. (table_diff's
    row phase needs unique ids; this pins the DIGEST layer alone.)"""
    schema = "k long, grp long, val string"
    a = spark.createDataFrame(
        [(1, 0, "r"), (1, 0, "r"), (2, 0, "s")], schema
    )
    b = spark.createDataFrame(
        [(2, 0, "s"), (3, 0, "t"), (3, 0, "t")], schema
    )
    # force everything into one bucket so xor-cancellation is possible:
    # ids 1,2,3 -> same bucket with n_buckets=1
    da = bucket_digests(a, "k", ["grp", "val"], n_buckets=1).collect()[0]
    db = bucket_digests(b, "k", ["grp", "val"], n_buckets=1).collect()[0]
    assert da["n_rows"] == db["n_rows"]
    # the pairs {r,r} and {t,t} XOR to zero, so the xor channel is blind:
    assert da["xor_digest"] == db["xor_digest"]
    # ...but 2*d(r)+d(s) != d(s)+2*d(t) unless d(r)==d(t): sum catches it
    assert da["sum_digest"] != db["sum_digest"]


def test_repair_actions_converge_replicas(spark):
    """Closing the anti-entropy loop: applying the diff-derived
    upsert/delete actions to B must make it identical to A (the
    reference's convergence law, checked end-to-end)."""
    a = _store(spark, 1_000)
    b = (
        _store(spark, 1_000)
        .filter(F.col("k") % 31 != 0)
        .withColumn(
            "val",
            F.when(F.col("k") % 37 == 0, F.lit("stale")).otherwise(F.col("val")),
        )
        .unionByName(
            spark.createDataFrame([(55_555, 1, "ghost")], "k long, grp long, val string")
        )
    )
    diff = table_diff(a, b, "k", ["grp", "val"])
    # upserts: A's row for every non-missing_in_a id; deletes: the rest
    upsert_ids = diff.filter(F.col("diff_status") != "missing_in_a").select("k")
    delete_ids = diff.filter(F.col("diff_status") == "missing_in_a").select("k")
    touched = upsert_ids.unionByName(delete_ids)
    repaired = (
        b.join(touched, "k", "left_anti")
        .unionByName(a.join(upsert_ids, "k", "left_semi"))
    )
    assert table_diff(a, repaired, "k", ["grp", "val"]).count() == 0
    assert repaired.count() == a.count()


def test_xxhash64_family_matches_md5_results(spark):
    """The production xxhash64 digest family must find EXACTLY the same
    row-level diffs as the md5 (oracle-replayable) family, including
    the adversarial separator/NULL-shift cases."""
    rows_a = [
        (0, "a|b", "c"),
        (64, "x", None),
        (128, "same", "same"),
        (192, "only-in-a", "p"),
    ]
    rows_b = [
        (0, "a", "b|c"),          # separator forgery attempt
        (64, None, "x"),          # NULL-shift forgery attempt
        (128, "same", "same"),    # genuinely equal
        (256, "only-in-b", "q"),
    ]
    a = spark.createDataFrame(rows_a, ["k", "c1", "c2"])
    b = spark.createDataFrame(rows_b, ["k", "c1", "c2"])
    md5_out = sorted(
        map(tuple, table_diff(a, b, "k", ["c1", "c2"], hash_fn="md5").collect())
    )
    xx_out = sorted(
        map(tuple, table_diff(a, b, "k", ["c1", "c2"], hash_fn="xxhash64").collect())
    )
    assert md5_out == xx_out
    assert ("0", "payload_differs") not in md5_out  # keys are ints
    statuses = dict(md5_out)
    assert statuses[0] == "payload_differs"
    assert statuses[64] == "payload_differs"
    assert statuses[192] == "missing_in_b"
    assert statuses[256] == "missing_in_a"
    assert 128 not in statuses


def test_unknown_hash_fn_rejected(spark):
    import pytest as _pytest

    from pycasselastic_spark.core.diff import row_digest
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError, match="hash_fn"):
        row_digest(F.col("k"), [], hash_fn="sha1")
