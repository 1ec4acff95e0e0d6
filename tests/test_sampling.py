"""Deterministic sampling/sharding operator tests: reproducibility,
stratum rate targeting, and shard stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.operators import sampling as SP


def test_rate_threshold_mapping():
    assert SP.rate_threshold(0.5, 4) == "8000"
    assert SP.rate_threshold(0.25, 4) == "4000"
    assert SP.rate_threshold(0.0, 4) == "0000"
    # rate 1.0 keeps everything: 'gggg' sorts above every hex digit
    assert SP.rate_threshold(1.0, 4) == "gggg"


def test_uniform_sample_is_deterministic_and_near_rate(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = SP.deterministic_sample(df, "k", 0.25)
    b = SP.deterministic_sample(df, "k", 0.25)
    got_a = {r["k"] for r in a.collect()}
    got_b = {r["k"] for r in b.collect()}
    assert got_a == got_b  # same decisions on re-run
    assert abs(len(got_a) / 10_000 - 0.25) < 0.02  # md5 is uniform


def test_sample_nests_monotonically(spark):
    """A 10% sample must be a subset of the 50% sample — hash-threshold
    sampling gives nested samples for free (rerun-friendly ramps)."""
    df = spark.range(5_000).withColumnRenamed("id", "k")
    small = {r["k"] for r in SP.deterministic_sample(df, "k", 0.1).collect()}
    big = {r["k"] for r in SP.deterministic_sample(df, "k", 0.5).collect()}
    assert small <= big


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(8_000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = SP.stratified_sample(
        df, "k", "lang", {"en": 0.5, "de": 0.125}, default_rate=0.0
    ).groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in out}
    assert abs(by["en"] / 4_000 - 0.5) < 0.04
    assert abs(by["de"] / 4_000 - 0.125) < 0.04


def test_shard_assignment_is_complete_and_stable(spark):
    df = spark.range(2_000).withColumnRenamed("id", "k")
    out = df.withColumn("shard", SP.hash_shard("k"))
    shards = out.groupBy("shard").count().collect()
    assert len(shards) == 16
    assert sum(r["count"] for r in shards) == 2_000
    # repartitioning must not change any assignment
    re = df.repartition(7).withColumn("shard", SP.hash_shard("k"))
    assert out.exceptAll(re).count() == 0


def test_weighted_sample_prefers_heavy_rows(spark):
    """A-ES correctness signal: with weights 100 vs 1, heavy rows must
    dominate a k=50 sample from a 50/50 population, and the sample must
    be identical across repartitionings (determinism)."""
    from pycasselastic_spark.operators.sampling import weighted_sample_topk

    df = spark.range(1_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 100.0).otherwise(1.0).alias("w"),
    )
    top = weighted_sample_topk(df, "k", "w", 50)
    ids = {r["k"] for r in top.collect()}
    heavy = sum(1 for i in ids if i % 2 == 0)
    assert heavy >= 45  # ~2^-25 chance of a light row beating a heavy one
    ids_repart = {
        r["k"] for r in weighted_sample_topk(df.repartition(13), "k", "w", 50).collect()
    }
    assert ids_repart == ids


class TestBalancedSample:
    def test_downsamples_toward_target_and_is_deterministic(self, spark, sf_dir):
        from pycasselastic_spark.operators.sampling import balanced_sample
        from pycasselastic_spark.sources.corpus import load_table

        docs = load_table(spark, sf_dir, "documents")
        kept = balanced_sample(docs, "doc_id", "source", target_per_stratum=10)
        per_src = {
            r["source"]: r["n"]
            for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # binomial(n, 10/n) stays near 10 — generous 4-sigma bound
        for src, n in per_src.items():
            assert n <= 10 + 4 * (10 ** 0.5), (src, n)
        # small strata pass through untouched
        for src, n in total.items():
            if n <= 10:
                assert per_src.get(src, 0) == n
        # decision is partitioning-independent
        ids_a = {r["doc_id"] for r in kept.collect()}
        ids_b = {
            r["doc_id"]
            for r in balanced_sample(
                docs.repartition(7), "doc_id", "source", target_per_stratum=10
            ).collect()
        }
        assert ids_a == ids_b


def test_temperature_mixture_rates_and_determinism(spark):
    """alpha=0.5 mixing: hand-computed per-stratum rates and the exact
    md5 keep law (rate_A = min(1, T*shareA/nA) with share ∝ sqrt(n))."""
    import hashlib
    import math

    from pycasselastic_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "A" if i < 8 else "B") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            df, "doc_id", "source", alpha=0.5, target_total=5
        ).collect()
    }
    # z is summed in Q20 fixed-point (order-independent) — replay it
    q20 = float(1 << 20)
    z = (math.floor(math.sqrt(8) * q20) + math.floor(math.sqrt(2) * q20)) / q20
    rates = {"A": min(1.0, 5.0 * math.sqrt(8) / z / 8.0),
             "B": min(1.0, 5.0 * math.sqrt(2) / z / 2.0)}

    def u(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:13], 16) / float(16 ** 13)

    want = {i for i, s in rows if u(i) < rates[s]}
    assert got == want
    # alpha=1 keeps natural proportions: every stratum gets the SAME
    # rate target/N, so the kept set is the plain global md5 sample
    got1 = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            df, "doc_id", "source", alpha=1.0, target_total=5
        ).collect()
    }
    want1 = {i for i, _ in rows if u(i) < 0.5}
    assert got1 == want1


# --- UniMax water-filling ------------------------------------------------------


def test_unimax_water_filling_caps_small_sources(spark):
    from pycasselastic_spark.operators.sampling import (
        unimax_allocation,
        unimax_sample,
    )

    rows = [(i, "tiny") for i in range(4)]
    rows += [(100 + i, "mid") for i in range(10)]
    rows += [(1000 + i, "big") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # budget 40, epochs 2: tiny caps at 8; residual 32 split between
    # mid and big = 16 each; mid gets 16 (not full: cap 20 > 16);
    # big gets 16
    out = {r["source"]: r for r in
           unimax_allocation(df, "source", 40, max_epochs=2).collect()}
    q20 = 1 << 20
    assert out["tiny"]["at_cap"] and out["tiny"]["alloc_q20"] == 8 * q20
    assert not out["mid"]["at_cap"] and out["mid"]["alloc_q20"] == 16 * q20
    assert not out["big"]["at_cap"] and out["big"]["alloc_q20"] == 16 * q20
    # rates: tiny 1.0 (epochs handled at training time), mid 1.0
    # floored from 16/10 -> capped at 1.0, big 16/100
    assert out["tiny"]["rate_q20"] == q20
    assert out["mid"]["rate_q20"] == q20
    assert out["big"]["rate_q20"] == (16 * q20) // 100
    kept = unimax_sample(df, "doc_id", "source", 40, max_epochs=2)
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["tiny"] == 4 and by_src["mid"] == 10
    assert 0 < by_src.get("big", 0) < 100


def test_unimax_all_sources_at_cap(spark):
    from pycasselastic_spark.operators.sampling import unimax_allocation

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(9)], ["doc_id", "source"]
    )
    out = unimax_allocation(df, "source", 1000, max_epochs=1).collect()
    assert all(r["at_cap"] for r in out)
    assert all(r["rate_q20"] == (1 << 20) for r in out)


def test_unimax_rejects_fractional_epochs(spark):
    from pycasselastic_spark.operators.sampling import unimax_allocation

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation(df, "source", 10, max_epochs=1.5)
