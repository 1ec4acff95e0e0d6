"""SCD2 history semantics and salted-aggregation equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.core.scd2 import scd2_apply
from pycasselastic_spark.operators.skew import salted_count_sum
from pycasselastic_spark.sources.corpus import load_table

HIST_COLS = "id long, seg string, valid_from long, valid_to long"


class TestScd2:
    def _history(self, spark):
        return spark.createDataFrame(
            [
                (1, "A", 0, None),   # will change
                (2, "B", 0, None),   # update equal -> no-op
                (3, "C", 0, None),   # no update
                (4, "D", 0, 50),     # closed history row, untouched
                (4, "E", 50, None),  # current row for id 4, stale update
            ],
            HIST_COLS,
        )

    def _updates(self, spark):
        return spark.createDataFrame(
            [
                (1, 100, "A2"),  # change
                (1, 90, "A1"),   # older duplicate in batch -> ignored
                (2, 100, "B"),   # equal attrs -> no-op
                (4, 40, "F"),    # stale (40 < valid_from 50) -> ignored
                (5, 100, "N"),   # brand-new id
            ],
            "id long, version long, seg string",
        )

    def test_fold(self, spark):
        out = scd2_apply(
            self._history(spark), self._updates(spark), "id", "version", ["seg"]
        )
        rows = {(r["id"], r["seg"], r["valid_from"], r["valid_to"]) for r in out.collect()}
        assert rows == {
            (1, "A", 0, 100),    # closed
            (1, "A2", 100, None),  # opened
            (2, "B", 0, None),   # no-op
            (3, "C", 0, None),   # untouched
            (4, "D", 0, 50),     # closed history preserved
            (4, "E", 50, None),  # stale update ignored
            (5, "N", 100, None),  # new id
        }

    def test_idempotent_refold(self, spark):
        """Re-applying the same batch must change nothing (stale rule)."""
        h1 = scd2_apply(
            self._history(spark), self._updates(spark), "id", "version", ["seg"]
        )
        h2 = scd2_apply(h1, self._updates(spark), "id", "version", ["seg"])
        assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h2.collect()))


class TestSaltedAgg:
    def test_equals_plain_groupby(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        salted = {
            r["event_type"]: (r["n_rows"], r["sum_value"])
            for r in salted_count_sum(
                ev, ["event_type"], ["value"], "event_id", 16
            ).collect()
        }
        from pycasselastic_spark.functions.aggregates import money

        plain = {
            r["event_type"]: (r["n"], r["s"])
            for r in ev.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(money("value")).cast("double").alias("s"),
            )
            .collect()
        }
        assert salted == plain


class TestSaltedJoin:
    def test_equals_plain_join_on_skewed_data(self, spark):
        """90% of big-side rows share one hot key; the salted join must
        return exactly the plain join's rows."""
        from pycasselastic_spark.operators.skew import salted_join

        big = spark.range(10_000).select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        )
        small = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        got = sorted(
            tuple(r)
            for r in salted_join(big, small, ["k"], salt_col="row_id").collect()
        )
        want = sorted(tuple(r) for r in big.join(small, "k").collect())
        assert got == want and len(got) > 0

    def test_salt_spreads_hot_key_across_buckets(self, spark):
        """The hot key's rows must actually land in many salt buckets —
        the whole point of the pattern."""
        big = spark.range(10_000).select(
            F.col("id").alias("row_id"), F.lit(1).alias("k")
        )
        salted = big.withColumn(
            "_salt", F.pmod(F.crc32(F.col("row_id").cast("string")), F.lit(16))
        )
        n_buckets = salted.select("_salt").distinct().count()
        assert n_buckets == 16


class TestGlobalPrefixSum:
    def test_matches_single_partition_window(self, spark):
        from pyspark.sql import Window

        from pycasselastic_spark.operators.relational import global_prefix_sum

        df = spark.range(5_000).select(
            F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("v")
        )
        got = {
            r["k"]: r["cum"]
            for r in global_prefix_sum(df, "k", "v", "cum", num_partitions=8).collect()
        }
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["k"]: r["cum"]
            for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
        }
        assert got == want

    def test_negative_values(self, spark):
        """Partition offsets must come from the partition SUM, not the
        max of the running total — signed values are the case that
        tells them apart."""
        from pyspark.sql import Window

        from pycasselastic_spark.operators.relational import global_prefix_sum

        df = spark.range(3_000).select(
            F.col("id").alias("k"), (F.col("id") % 101 - 50).alias("v")
        )
        got = {
            r["k"]: r["cum"]
            for r in global_prefix_sum(df, "k", "v", "cum", num_partitions=8).collect()
        }
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["k"]: r["cum"]
            for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
        }
        assert got == want
