"""Z-order layout tests: key arithmetic vs a Python reference, and the
actual data-skipping payoff — per-file parquet min/max ranges must be
tight on BOTH clustered columns, which single-column sorting cannot
deliver."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.plans.layout import (
    quantize,
    repartition_by_zorder,
    zorder_key,
)


def _interleave_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _interleave_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_key_rejects_bigint_overflow():
    with pytest.raises(ValueError, match="bigint"):
        zorder_key([F.col("a"), F.col("b")], bits=32)


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "x double"
    )
    got = [r["q"] for r in df.select(
        quantize(F.col("x"), 0.0, 100.0, bits=8).alias("q")
    ).collect()]
    assert got[0] == 0          # below lo clamps to 0
    assert got[1] == 0
    assert got[2] == 127        # floor(0.5 * 255)
    assert got[3] == 255        # hi maps to the top cell
    assert got[4] == 255        # above hi clamps


def _per_file_spans(path: str, col: str) -> list[float]:
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append(float(hi) - float(lo))
    return spans


def test_zorder_layout_tightens_both_columns(spark, sf_dir, tmp_path):
    """The payoff claim, measured: after z-order clustering into 8
    files, the AVERAGE per-file min/max span of EACH clustered column
    is well under half its global span — while a layout sorted on
    user_id alone leaves value's per-file spans at ~the full range."""
    from pycasselastic_spark.sources.corpus import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ranges = {"user_id": (0.0, 1024.0), "value": (0.0, 1000.0)}

    zdir = str(tmp_path / "zorder")
    repartition_by_zorder(ev, ["user_id", "value"], ranges, 8).write.parquet(zdir)
    udir = str(tmp_path / "by_user")
    ev.repartitionByRange(8, "user_id").write.parquet(udir)

    glob_user = 150.0  # sf0.001 corpus: user_id in [1, 150]
    glob_value = max(r["m"] for r in
                     ev.select(F.max("value").alias("m")).collect())

    z_user = _per_file_spans(zdir, "user_id")
    z_value = _per_file_spans(zdir, "value")
    u_value = _per_file_spans(udir, "value")
    assert len(z_user) >= 4
    # both clustered columns tight under z-order
    assert sum(z_user) / len(z_user) < 0.5 * glob_user
    assert sum(z_value) / len(z_value) < 0.5 * glob_value
    # the single-column layout leaves the other column mostly
    # unskippable (>70% of global span per file on this corpus) and at
    # least 2x worse than z-order
    u_avg = sum(u_value) / len(u_value)
    assert u_avg > 0.7 * glob_value
    assert u_avg > 2 * (sum(z_value) / len(z_value))


def test_compact_small_files(spark, tmp_path):
    from pycasselastic_spark.plans.layout import compact_small_files

    src = str(tmp_path / "fragmented")
    spark.range(50_000).selectExpr("id", "id % 100 AS k").repartition(
        64
    ).write.parquet(src)
    n_in = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_in >= 32  # genuinely fragmented input

    out = str(tmp_path / "compacted")
    n_target = compact_small_files(spark, src, out, target_file_bytes=10**9)
    n_out = len(glob.glob(os.path.join(out, "*.parquet")))
    assert n_target == 1 and n_out == 1
    # no rows lost or duplicated
    assert spark.read.parquet(out).count() == 50_000

    # sorted compaction re-clusters while it compacts
    out2 = str(tmp_path / "compacted_sorted")
    compact_small_files(spark, src, out2, target_file_bytes=10**9,
                        sort_cols=["k"])
    got = spark.read.parquet(out2)
    assert got.count() == 50_000
    spans = _per_file_spans(out2, "k")
    assert spans and max(spans) <= 99.0


def test_zorder_key_is_bijective_and_locality_preserving(spark):
    """Property over random 16-bit pairs: the Morton key is a bijection
    (distinct pairs -> distinct keys) and nearby keys decode to nearby
    points (each key step of 4 moves at most one step in each
    coordinate's bit lane above the lowest)."""
    import random

    rng = random.Random(11)
    pairs = list({(rng.randrange(65536), rng.randrange(65536)) for _ in range(500)})
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=16).alias("z")
    ).collect()
    zs = [r["z"] for r in rows]
    assert len(set(zs)) == len(pairs)  # bijective on the sample
    # round-trip: de-interleave recovers the inputs exactly
    for r in rows:
        a = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r["a"], r["b"])
