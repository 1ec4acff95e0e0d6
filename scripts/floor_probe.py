"""Decompose the per-query fixed-overhead floor (round-15, guide §1).

For each named catalog query: time fn() construction (driver-side plan
building, py4j chatter, any eager ingest) separately from the noop-sink
execution, and count the Spark jobs the execution submits. Also times
the primitive session operations that every query pays (read.parquet
listing+schema, a 1-job count, a 2-job shuffle) so the floor has a
bottom-up decomposition next to the per-query top-down numbers.

Usage: python scripts/floor_probe.py [--sf DIR] [names...]
Prints one JSON line; meant for OPTIMIZATION_r15.md evidence, never
imported by bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    # representative 1-2.5 s tail members (different families)
    "t_test_documents",            # indexed probe + stats agg
    "has_child_documents",         # indexed probe + join-field join
    "string_stats_documents",      # indexed doc-values scan + agg
    "matrix_stats_events",         # plain events scan + agg
    "geohash_grid_events",         # events scan + udf-free geo agg
    "q14_promo_revenue",           # tpch join+agg
    "search_template_documents",   # indexed probe
    "multi_terms_agg_documents",   # ES terms agg
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT_QUERIES

    from pycasselastic_spark.catalog import QUERIES
    from pycasselastic_spark.session import get_spark

    spark = get_spark(app_name="floor_probe")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # Python-worker warmup mirrors bench.py
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s + 0.0

    spark.range(10_000).repartition(64).selectExpr(
        "cast(id as double) as d").select(_warm("d")).write.format(
        "noop").mode("overwrite").save()

    def job_ids() -> set[int]:
        return set(sc.statusTracker().getJobIdsForGroup(None) or [])

    out: dict = {"sf": args.sf, "primitives": {}, "queries": {}}

    # ---- primitives ----
    t0 = time.perf_counter()
    df = spark.read.parquet(f"{args.sf}/documents.parquet")
    out["primitives"]["read_parquet_documents_s"] = round(
        time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    spark.read.parquet(f"{args.sf}/documents.parquet")
    out["primitives"]["read_parquet_documents_again_s"] = round(
        time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    out["primitives"]["noop_scan_only_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    df.groupBy("source").count().write.format("noop").mode(
        "overwrite").save()
    out["primitives"]["noop_one_shuffle_s"] = round(
        time.perf_counter() - t0, 4)

    # ---- queries: first and second runs, fn vs action, job counts ----
    for name in names:
        if name not in QUERIES:
            out["queries"][name] = {"err": "unknown"}
            continue
        rec: dict = {}
        for attempt in ("run1", "run2"):
            before = job_ids()
            t0 = time.perf_counter()
            q = QUERIES[name].fn(spark, args.sf)
            t_fn = time.perf_counter()
            mid = job_ids()
            q.write.format("noop").mode("overwrite").save()
            t_done = time.perf_counter()
            after = job_ids()
            rec[attempt] = {
                "fn_s": round(t_fn - t0, 3),
                "exec_s": round(t_done - t_fn, 3),
                "jobs_in_fn": len(mid - before),
                "jobs_in_exec": len(after - mid),
            }
        out["queries"][name] = rec
        print(f"  {name}: {json.dumps(rec)}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
