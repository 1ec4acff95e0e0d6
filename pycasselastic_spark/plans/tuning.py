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
import re
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


_BYTE_UNITS = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
               "t": 1 << 40, "p": 1 << 50}
_BYTE_RE = re.compile(r"^(\d+)\s*([kmgtp]?)b?$")


def _parse_byte_string(raw: str, default: int) -> int:
    """Parse a Spark byte-string config value ('134217728b', '64mb',
    '128m', '2g', '1t', plain digits) the way the JVM side does.
    Unparseable input falls back to ``default``."""
    m = _BYTE_RE.match(str(raw).strip().lower())
    if not m:
        return default
    return int(m.group(1)) * _BYTE_UNITS[m.group(2)]


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    return _parse_byte_string(raw, 128 << 20)


def _open_cost_bytes(spark: SparkSession) -> int:
    raw = spark.conf.get("spark.sql.files.openCostInBytes", "4194304b")
    return _parse_byte_string(raw, 4 << 20)


def estimate_scan_partitions(df: DataFrame, spark: SparkSession) -> int | None:
    """Estimated split count of ``df``'s file scan, from public APIs.

    Simulates Spark's ``FilePartition.getFilePartitions`` exactly:
    ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    sum(size + openCost) / parallelism))``; files larger than that are
    pre-split into chunks of at most ``maxSplitBytes``; chunks are
    sorted by size descending and bin-packed — a bin closes when the
    next chunk's RAW size would push the accumulated ``size +
    openCost`` total past ``maxSplitBytes`` (Spark checks the raw size
    but accumulates the padded one — that asymmetry is why a naive
    padded-ceil overcounts ~2x on tiny files). This tracks BOTH
    failure modes the old per-file floor had: one giant file still
    estimates many splits, and a many-tiny-files layout no longer
    estimates one split per file (Spark packs those — the overcount
    that used to make ``ensure_parallelism`` skip exactly the case it
    exists for). Unstatable/remote files count size 0 (pure
    open-cost). Returns None for non-file sources.
    """
    files = df.inputFiles()
    if not files:
        return None
    open_cost = _open_cost_bytes(spark)
    sizes = []
    for uri in files:
        parsed = urlparse(uri)
        size = 0
        if parsed.scheme in ("file", ""):
            path = unquote(parsed.path)
            try:
                size = os.path.getsize(path)
            except OSError:
                size = 0
        sizes.append(size)
    total_padded = sum(sizes) + open_cost * len(sizes)
    max_split = min(
        _max_partition_bytes(spark),
        max(open_cost,
            total_padded // max(1, spark.sparkContext.defaultParallelism)),
    )
    chunks = []
    for size in sizes:
        while size > max_split:
            chunks.append(max_split)
            size -= max_split
        chunks.append(size)
    chunks.sort(reverse=True)
    n_parts, current = 0, 0
    for c in chunks:
        if current + c > max_split and current > 0:
            n_parts += 1
            current = 0
        current += c + open_cost
    if current > 0:
        n_parts += 1
    return max(1, n_parts)


def ensure_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the scan
    yields fewer partitions than cores.

    Needed because the local corpus is one row-group per table — a
    single input split — which would serialize every narrow compute
    stage (minhash signatures, simhash, dot products) on one core. On
    real multi-row-group / multi-file data the scan already yields
    many splits and this is a no-op. Non-file sources (inputFiles()
    empty) fall back to the actual RDD partition count, so an
    in-memory or DSv2 DataFrame with one partition is still widened."""
    target = spark.sparkContext.defaultParallelism
    n_parts = estimate_scan_partitions(df, spark)
    if n_parts is None:
        n_parts = df.rdd.getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


def run_actions_concurrently(thunks) -> list:
    """Run INDEPENDENT Spark actions (writes/aggs over already-derived
    frames) from a small driver thread pool, returning their results in
    thunk order.

    Spark's scheduler happily runs several jobs inside one application;
    actions are only sequential because driver code calls them
    sequentially (optimization guide §2.6). An ingest that must write
    postings, docstats, doc-values and superseded relations — four
    independent jobs over different output directories — gains nothing
    from running them back to back: each job's straggler tail leaves
    the rest of the cluster idle. Submitting them together lets the
    next write's tasks back-fill executors freed by the current one.

    Safety notes:
    - Shared persisted parents are materialized AT MOST once: the
      BlockManager takes a per-block write lock, so a second job
      needing the same cached partition blocks and then reads it.
    - Default FIFO scheduling gives the earlier job resources first
      and later jobs the remainder — exactly the back-fill behaviour
      wanted here.
    - The pool is bounded (<= 4): enough to fill the tail, not enough
      to thrash execution memory with many concurrent shuffles.
    - Thunks run through ``pyspark.inheritable_thread_target`` so the
      CALLER's JVM local properties (job group/description, scheduler
      pool — thread-local under PySpark's pinned-thread mode) propagate
      to the pool threads: concurrent writes stay inside any job
      group/cancellation scope the caller established instead of
      escaping it.
    - Partial failure: when one thunk raises, sibling writes that
      already ran have still landed on disk. Callers rely on the
      generation-commit protocol (visibility flips only on the manifest
      row, and every lazy read filters on committed generations) for
      cleanup — a crashed overlap window leaves unreferenced files,
      never a visible half-written relation.
    The first raised exception propagates after every thread settles
    (no write is left mid-flight when the caller's finally runs)."""
    thunks = list(thunks)
    if len(thunks) <= 1:
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    # passing the session (Spark 4 form) also propagates session tags;
    # without it pyspark warns "Tags will not be inherited" per thunk
    wrap = inheritable_thread_target(session) if session else (
        inheritable_thread_target
    )
    thunks = [wrap(t) for t in thunks]
    with ThreadPoolExecutor(max_workers=min(4, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        # collect every outcome before raising so no thread is abandoned
        # mid-write; re-raise the first failure in submission order
        results, first_exc = [], None
        for f in futures:
            try:
                results.append(f.result())
            except Exception as exc:  # noqa: BLE001 — re-raised below
                results.append(None)
                if first_exc is None:
                    first_exc = exc
        if first_exc is not None:
            raise first_exc
        return results
