"""Plan inspection and tuning helpers: the feedback loop for keeping
physical plans scale-shaped (pushdown reaching the scan, broadcasts
where intended, codegen spans wide, parallelism matching cores).

Public-API only: plan text comes from capturing ``df.explain(...)``
(PySpark's own supported rendering of the query execution), and the
parallelism probe estimates scan splits from ``df.inputFiles()`` —
no ``_jdf`` touches, so nothing here can break on a Spark minor bump.
"""

from __future__ import annotations

import contextlib
import io
import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def _explain_capture(df: DataFrame, **kwargs) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(**kwargs)
    return buf.getvalue()


def physical_plan(df: DataFrame) -> str:
    """The physical plan as text (``df.explain()`` output, captured)."""
    return _explain_capture(df)


def formatted_plan(df: DataFrame) -> str:
    """The formatted-mode plan: operator tree plus per-node details
    (PushedFilters, ReadSchema, ...), same text ``explain("formatted")``
    prints."""
    return _explain_capture(df, mode="formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet/DSv2 scan carries a pushed filter mentioning
    ``fragment`` (e.g. a column name)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line:
            return True
    return False


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists the scans actually read (one entry per scan)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    raw = raw.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    try:
        if raw.endswith("b") and raw[:-1].isdigit():
            return int(raw[:-1])
        if raw and raw[-1] in units:
            return int(raw[:-1]) * units[raw[-1]]
        return int(raw)
    except ValueError:
        return 128 << 20


def estimate_scan_partitions(df: DataFrame, spark: SparkSession) -> int | None:
    """Estimated split count of ``df``'s file scan, from public APIs.

    Per file: ceil(size / maxPartitionBytes) when the file is local and
    statable, else 1. The estimate can only OVERcount vs the real scan
    (Spark additionally packs small files together via openCostInBytes),
    so using it as a lower-bound gate never triggers a spurious
    repartition on data that already has enough splits. Returns None
    for non-file sources (no estimate possible).
    """
    files = df.inputFiles()
    if not files:
        return None
    max_bytes = _max_partition_bytes(spark)
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        splits = 1
        if parsed.scheme in ("file", ""):
            path = unquote(parsed.path)
            try:
                splits = max(1, math.ceil(os.path.getsize(path) / max_bytes))
            except OSError:
                splits = 1
        total += splits
    return total


def ensure_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the scan
    yields fewer partitions than cores.

    Needed because the local corpus is one row-group per table — a
    single input split — which would serialize every narrow compute
    stage (minhash signatures, simhash, dot products) on one core. On
    real multi-row-group / multi-file data the scan already yields
    many splits and this is a no-op (the estimate never undercounts
    splits, so big inputs are never down-shuffled)."""
    target = spark.sparkContext.defaultParallelism
    n_parts = estimate_scan_partitions(df, spark)
    if n_parts is not None and n_parts < target:
        return df.repartition(target)
    return df
