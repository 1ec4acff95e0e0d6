"""Approximate-aggregation accuracy bounds and partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.catalog import QUERIES
from pycasselastic_spark.plans import tuning
from pycasselastic_spark.sources.corpus import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The catalog query now carries its tolerance check in-band: it
    emits exact distinct counts plus booleans asserting each sketch is
    inside its documented error bound (that is what the value oracle
    hashes). Here: the exact counts must match an independent
    recomputation and every tolerance flag must be true."""
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["u"], r["e"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("event_id").alias("e"),
        )
        .collect()
    }
    got = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct_stats_events"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(got)
    for k, (u, e) in exact.items():
        r = got[k]
        assert (r["n_users"], r["n_events"]) == (u, e), (k, r, u, e)
        assert r["users_within_3rsd"], k
        assert r["events_within_3rsd"], k
        assert r["p50_within_rank_bounds"], k


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    """dt-partitioned parquet + a dt filter must prune partitions at
    plan time (the scan's partition count drops to the selected day)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "by-day")
    ev.withColumn("dt", F.to_date("ts")).write.partitionBy("dt").parquet(path)

    one_day = spark.read.parquet(path).filter(F.col("dt") == "2024-01-05")
    plan = tuning.formatted_plan(one_day)
    assert "PartitionFilters" in plan
    # the pruned scan reads a single partition directory
    n_files_scanned = one_day.select(F.input_file_name()).distinct().count()
    all_files = (
        spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    )
    assert 0 < n_files_scanned < all_files
