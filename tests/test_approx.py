"""Approximate-aggregation accuracy bounds and partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.catalog import QUERIES
from pycasselastic_spark.plans import tuning
from pycasselastic_spark.sources.corpus import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["u"], r["e"], r["p"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("event_id").alias("e"),
            F.expr("percentile(value, 0.5)").alias("p"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: (r["approx_users"], r["approx_events"], r["approx_p50_value"])
        for r in QUERIES["approx_distinct_stats_events"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, (u, e, p) in exact.items():
        au, ae, ap = approx[k]
        assert abs(au - u) <= max(2, 0.1 * u), (k, au, u)
        assert abs(ae - e) <= max(2, 0.1 * e), (k, ae, e)
        assert abs(ap - p) <= max(1.0, 0.1 * abs(p)), (k, ap, p)


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
