"""Data-layout operators for scan pruning at scale: Z-order (Morton)
clustering of multi-column keys.

Why this exists: parquet data skipping works off per-file (and
per-row-group) min/max statistics. Sorting by ONE column makes its
ranges tight per file but leaves every other filter column with
full-range stats — a filter on the second column still reads every
file. Interleaving the bits of several columns into one Morton key and
range-partitioning + sorting by it bounds EVERY participating column's
range within each file (a file covering a contiguous Z-range spans at
most a small hyper-rectangle of the key space), so conjunctive and
single-column filters alike skip most files. This is the layout
technique behind clustering features in modern lakehouse formats; here
it is built from public primitives only: a pure bit-arithmetic key +
``repartitionByRange`` + an in-partition sort.

Everything is integer arithmetic on JVM-side column expressions —
deterministic, shuffle-free to compute, and exactly replayable in the
DuckDB oracle (same shifts, same masks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    input column round-robin (col 0 gets the least-significant lane).

    Inputs must already be non-negative integers in ``[0, 2^bits)`` —
    use :func:`quantize` to map arbitrary numeric columns onto that
    grid. The result fits a bigint for ``len(cols) * bits <= 63``.

    The expression is a fixed fan-in of shift/mask terms (no UDF, no
    loop at runtime): bit ``i`` of column ``c`` lands at position
    ``i * n_cols + c``.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed bigint")
    terms = []
    for c_idx, col in enumerate(cols):
        v = col.cast("bigint")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + c_idx)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column onto the ``[0, 2^bits)`` integer grid by
    linear scaling over ``[lo, hi]`` (clamped). Deterministic floor
    quantization — same arithmetic replays in SQL."""
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * F.lit(float(cells))).cast("bigint")


def repartition_by_zorder(
    df: DataFrame,
    cols: list[str],
    ranges: dict[str, tuple[float, float]],
    num_partitions: int,
    bits: int = 16,
    key_col: str = "_zkey",
) -> DataFrame:
    """Cluster ``df`` for multi-column data skipping: attach the Morton
    key of the quantized ``cols``, range-partition by it, and sort
    within partitions — so a subsequent parquet write produces files
    whose min/max stats are tight on EVERY clustered column.

    ``ranges`` gives the quantization domain per column (at 100 TB you
    would take these from table statistics). The key column is kept so
    downstream readers can range-prune on it directly; drop it after
    writing if unwanted."""
    key = zorder_key(
        [quantize(F.col(c), *ranges[c], bits=bits) for c in cols], bits=bits
    )
    return (
        df.withColumn(key_col, key)
        .repartitionByRange(num_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
    )


def compact_small_files(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a parquet directory's small files into ~target-size
    files; returns the output file count.

    Small files are the operational tax of incremental pipelines —
    every scan pays per-file open/footer costs and the driver pays
    listing. Sizing uses the INPUT bytes on disk (cheap listing, no
    data read), so the repartition count reflects compressed reality
    rather than a row-count guess. Optional ``sort_cols`` re-clusters
    while compacting (pair with :func:`repartition_by_zorder` for
    multi-column skipping). Output goes to a new directory — at scale
    the swap is a metastore/table-format pointer flip, not an in-place
    rewrite, so readers never see a half-compacted state.
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return n_files
