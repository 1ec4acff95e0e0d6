"""Benchmark harness: runs the catalog's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is fully materialized through the ``noop`` sink (forces
every operator, writes nothing). One tiny warmup action first so JVM
startup isn't billed to the first query.

Steady-state timing: a query's FIRST execution pays one-time
compilation of its generated code (janino + HotSpot JIT of the giant
whole-stage methods the md5/array-heavy operators produce). Measured
on an idle host: ``simhash_neardup`` 35.8 s cold vs 5.3 s on the very
next run in the same session; ``cosine_topk_lsh`` 13.7/13.7/5.4 s over
three consecutive runs. That one-time cost — amortized to zero on any
long-lived cluster — is what produced the phantom 1.7-3.1x
"regressions" between rounds 1 and 2 (same plans, different JIT luck).
So: any query whose first run exceeds ``RERUN_THRESHOLD`` is run again
and reported at the min of the two; BENCH_DETAIL.json keeps both
numbers (``queries_first_run``) for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pycasselastic_spark.catalog import QUERIES  # noqa: E402
from pycasselastic_spark.session import get_spark  # noqa: E402

# Every catalog query by default; $SPARK_GRAFT_BENCH_QUERIES (comma
# separated) restricts the set for straggler hunting.
_only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
BENCH_QUERIES = _only.split(",") if _only else list(QUERIES)


RERUN_THRESHOLD = float(os.environ.get("SPARK_GRAFT_BENCH_RERUN_SEC", "4.0"))

# Load1 above this at bench START means something else was already
# running; the numbers are then flagged rather than trusted. (SCALING.md
# documents up to 4x wall-clock swings on this shared host; round 7's
# driver bench ran 8-90% above same-code quiet-window numbers with no
# way to tell drift from regression after the fact.)
LOAD1_CONTENDED = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD1_MAX", "8.0"))


def _spark_jvms() -> int:
    """Concurrent Spark JVMs on the host (java processes whose cmdline
    mentions spark), via /proc — the playbook's ps-not-pgrep rule, sans
    the shell."""
    n = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "java" in cmd.split("\x00", 1)[0] and "spark" in cmd.lower():
            n += 1
    return n


def _host_sample() -> dict:
    return {
        "load1": round(os.getloadavg()[0], 2),
        "spark_jvms": _spark_jvms(),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Sample host conditions BEFORE our own session exists: any Spark
    # JVM counted here belongs to someone else, and load1 reflects what
    # was running as we started.
    host_pre = _host_sample()
    # Code-cache headroom for ~100 queries' worth of generated classes:
    # JDK17 defaults to 240 MB reserved code cache and refuses to JIT
    # methods over 8000 bytecode bytes (DontCompileHugeMethods) — both
    # hostile to Spark's whole-stage-codegen output.
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.driver.extraJavaOptions": (
                "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing "
                "-XX:-DontCompileHugeMethods"
            )
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # Python-worker warmup: the first Arrow-batched UDF stage pays the
    # worker spawn + numpy/pandas import across all cores (~10s on 32
    # local workers; amortized to zero on a long-lived cluster). Warm it
    # here so per-query timings reflect steady-state, same as the JVM
    # warmup above.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return s + float(np.float64(0.0))

    spark.range(10_000).repartition(64).selectExpr("cast(id as double) as d").select(
        _warm("d")
    ).write.format("noop").mode("overwrite").save()

    # Direct comparable for BASELINE.md's sync throughput (697-1,323
    # rows/s in the reference): a 2M-row bidirectional LWW merge,
    # in-memory generated so it measures the engine, not parquet I/O.
    # Measured right after warmup — before the 70+-query catalog sweep
    # fills the session with GC debris — so the headline number is
    # stable run-to-run. Best of 3 for the same reason.
    from pyspark.sql import functions as F

    from pycasselastic_spark.core.merge import lww_merge

    n_rows = 2_000_000
    inc = spark.range(n_rows).select(
        (F.col("id") % 200_000).alias("key"),
        F.col("id").alias("version"),
        (F.col("id") % 2).alias("side"),
    )
    merged = lww_merge(
        [inc.filter(F.col("side") == 0), inc.filter(F.col("side") == 1)],
        "key",
        "version",
    )
    sync_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        merged.write.format("noop").mode("overwrite").save()
        sync_dt = min(sync_dt, time.perf_counter() - t0)

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        # per-query isolation: one broken query must not zero out the
        # timings of the other ~95 (round 3 lost its whole bench to the
        # first query's AnalysisException)
        try:
            dt = run_once(name)
            first_run[name] = round(dt, 3)
            if dt > RERUN_THRESHOLD:
                # steady state: the retry reuses the now-compiled generated
                # code, so it measures the plan rather than the JIT
                dt = min(dt, run_once(name))
                if name.startswith("streaming_"):
                    # streaming queries pay a one-time per-session
                    # micro-batch-engine + state-store init that can
                    # dominate BOTH early runs under load (round-9's
                    # streaming_stream_stream_join read 9.6 s in the
                    # driver window vs 3.7 s solo min-of-3 on the same
                    # code — SCALING.md §stream-stream-join-drift), so
                    # take min-of-3 for this family to keep the
                    # round-over-round deltas meaningful
                    dt = min(dt, run_once(name))
        except Exception as exc:  # noqa: BLE001 — record and move on
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"  {name}: ERR {errors[name]}", file=sys.stderr, flush=True)
            continue
        timings[name] = round(dt, 3)
        total += dt
        print(
            f"  {name}: {dt:.2f}s (first {first_run[name]:.2f}s)",
            file=sys.stderr,
            flush=True,
        )
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # post-run sample: our own JVM is still up, so subtract it
    host_post = _host_sample()
    host_post["spark_jvms"] = max(0, host_post["spark_jvms"] - 1)
    host = {
        "pre": host_pre,
        "post": host_post,
        # flagged = the run started on a busy host or shared it with
        # another Spark JVM at either sample; readers should treat the
        # numbers as upper bounds, not steady state
        "contended": bool(
            host_pre["spark_jvms"] > 0
            or host_post["spark_jvms"] > 0
            or host_pre["load1"] > LOAD1_CONTENDED
        ),
    }
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    # The driver machine-reads the LAST stdout line through a bounded tail
    # buffer (round 1 recorded parsed:null on the 59-entry map), so the
    # summary line stays short: top-10 slowest queries inline, the full
    # per-query map in BENCH_DETAIL.json and on stderr.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "sf": sf,
                "queries": timings,
                "queries_first_run": first_run,
                "errors": errors,
                "host": host,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"full per-query timings: {detail_path}", file=sys.stderr)
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "catalog_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": top,
                "n_queries": len(timings),
                "n_errors": len(errors),
                "queries_detail_file": "BENCH_DETAIL.json",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "sync_merge_rows_per_sec": int(n_rows / sync_dt),
                "host": host,
            }
        )
    )
    spark.stop()
    if errors:
        # the summary above still carries every green timing; nonzero
        # exit just flags that some queries erred
        sys.exit(1)


if __name__ == "__main__":
    main()
