"""Count-min sketch and int8 quantization invariants: the CMS
never-underestimate / mergeability guarantees and the quantizer's
half-step error bound, checked against exact driver-side computation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pycasselastic_spark.operators import sketches as SK
from pycasselastic_spark.operators.similarity import quantize_int8_stats


def _skewed_keys(spark, n=5_000):
    # Zipf-ish: key k appears ~ n/(k+1) times — a few heavy hitters,
    # a long tail, the shape CMS exists for.
    return spark.range(n).select(
        (F.floor(F.lit(100.0) / (F.col("id") % 100 + 1))).alias("k")
    )


def test_cms_grid_is_bounded_and_estimates_never_underestimate(spark):
    df = _skewed_keys(spark)
    counters = SK.countmin_counters(df, "k", depth=4, width=64)
    assert counters.count() <= 4 * 64
    # total per hash row == input rows (each row lands in exactly one
    # bucket per row of the grid)
    per_d = {r["d"]: r["s"] for r in
             counters.groupBy("d").agg(F.sum("cnt").alias("s")).collect()}
    n = df.count()
    assert per_d == {0: n, 1: n, 2: n, 3: n}

    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = SK.countmin_estimates(df, "k", exact, depth=4, width=64)
    joined = exact.join(est, "k").collect()
    assert len(joined) == exact.count()
    for r in joined:
        assert r["cms_cnt"] >= r["exact_cnt"], r
        # classic bound: overestimate <= e/width * N, here checked at
        # 3x slack so the test never flakes on an unlucky hash family
        assert r["cms_cnt"] - r["exact_cnt"] <= 3 * math.e / 64 * n, r


def test_cms_counters_merge_by_elementwise_addition(spark):
    """The 100 TB property: per-shard grids sum to the global grid —
    partial aggregation and cross-day sketch merges are the same op."""
    df = _skewed_keys(spark)
    left = df.limit(2_000)
    right = df.exceptAll(left)
    whole = SK.countmin_counters(df, "k", depth=2, width=32)
    parts = (
        SK.countmin_counters(left, "k", depth=2, width=32)
        .unionAll(SK.countmin_counters(right, "k", depth=2, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert {tuple(r) for r in whole.collect()} == {tuple(r) for r in parts.collect()}


def test_quantize_int8_error_bound_and_fidelity(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 127.0]),
        (1, [1e-3, 2e-3, -3e-3, 4e-3]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale falls back to 1
        (3, [-5.0, 5.0, 2.5, -2.5]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in
           quantize_int8_stats(df, "vec_id", "embedding").collect()}
    assert len(got) == 4
    for vid, (_, vec) in zip(sorted(got), rows):
        r = got[vid]
        mx = max(abs(x) for x in vec)
        scale = mx / 127.0 if mx else 1.0
        assert abs(r["scale"] - scale) < 1e-12
        # half-step bound: |v - q*scale| <= scale/2 (+1ulp slack)
        assert r["max_abs_err"] <= scale * 0.5000001
        # reconstruction keeps direction: cosine ~ 1 for non-zero vecs
        if mx:
            assert r["cos_recon"] > 0.999
        exact_qsum = sum(math.floor(x / scale + 0.5) for x in vec)
        assert r["q_sum"] == exact_qsum


def test_quantize_codes_cover_full_int8_range(spark):
    # the max-|v| element must land exactly on +/-127
    df = spark.createDataFrame([(0, [63.5, -127.0])], ["vec_id", "embedding"])
    r = quantize_int8_stats(df, "vec_id", "embedding").collect()[0]
    # codes: floor(63.5/1 + 0.5)=64, floor(-127/1 + 0.5)=-127 -> sum -63
    assert r["q_sum"] == -63
    assert abs(r["scale"] - 1.0) < 1e-12


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    members = spark.range(0, 1_000).select((F.col("id") * 3).alias("k"))
    bits = SK.bloom_build(members, "k", m_bits=8192, k=6)
    assert bits.count() <= 8192
    # every member must hit (no false negatives — the Bloom law)
    hits = SK.bloom_probe(members, bits, "k", m_bits=8192, k=6)
    assert hits.filter(~F.col("bloom_hit")).count() == 0
    # non-members: FPR should be near (1 - e^{-kn/m})^k ~= 2.2% here;
    # assert at 3x slack so the test never flakes on the hash family
    non = spark.range(0, 1_000).select((F.col("id") * 3 + 1).alias("k"))
    fp = SK.bloom_probe(non, bits, "k", m_bits=8192, k=6)
    assert fp.filter(F.col("bloom_hit")).count() <= 0.066 * 1_000


def test_bloom_merges_by_bit_union(spark):
    """Per-shard filters OR together into the global filter — the same
    map-side mergeability law as the CMS grid."""
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    left, right = df.filter("k < 250"), df.filter("k >= 250")
    whole = SK.bloom_build(df, "k", m_bits=1024, k=4)
    merged = (
        SK.bloom_build(left, "k", m_bits=1024, k=4)
        .unionAll(SK.bloom_build(right, "k", m_bits=1024, k=4))
        .distinct()
    )
    assert {r["bit"] for r in whole.collect()} == {r["bit"] for r in merged.collect()}


def test_bloom_contains_matches_probe(spark):
    """The row-level mask predicate and the join-based probe are the
    same membership function."""
    members = spark.range(0, 400).select((F.col("id") * 7).alias("k"))
    bits = SK.bloom_build(members, "k", m_bits=2048, k=4)
    mask = SK.bloom_mask(bits, 2048)
    assert len(mask) == 2048 and set(mask) <= {"0", "1"}
    probes = spark.range(0, 2_800).select(F.col("id").alias("k"))
    via_probe = {
        r["k"]
        for r in SK.bloom_probe(probes, bits, "k", 2048, 4)
        .filter(F.col("bloom_hit"))
        .collect()
    }
    via_mask = {
        r["k"]
        for r in probes.filter(SK.bloom_contains(F.col("k"), mask, 4)).collect()
    }
    assert via_mask == via_probe
    # and pruning before a join never loses a true match
    assert {r["k"] for r in members.collect()} <= via_mask
