"""Side-by-side Spark-vs-DuckDB oracle checker — replicates the driver's
correctness gate (row count + sorted-by-name schema + order-insensitive
value multiset) locally.

Usage: python scripts/check_oracles.py [--sf DIR] [query names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def as_multiset(cols, rows):
    from collections import Counter

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = Counter(tuple(normalize(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pycasselastic_spark.catalog import render_oracle
    from pycasselastic_spark.session import get_spark

    qs = entrymod.queries()
    names = args.names or list(qs)
    # render per sf: data-derived oracles (IVF centroids) depend on it
    oracles = {
        name: sql
        for name in names
        if (sql := render_oracle(name, args.sf)) is not None
    }

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    spark = get_spark(app_name="check-oracles")
    failures = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, args.sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if not srows:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        s_cols, s_vals = as_multiset(scols, srows)
        o_cols, o_vals = as_multiset(ocols, orows)
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(orows)}")
        if s_cols != o_cols:
            status.append(f"SCHEMA {s_cols} vs {o_cols}")
        if not status and s_vals != o_vals:
            only_s = list((s_vals - o_vals).elements())
            only_o = list((o_vals - s_vals).elements())
            status.append(
                f"VALUES {len(only_s)}+{len(only_o)} differ; "
                f"spark-only: {only_s[:2]!r} oracle-only: {only_o[:2]!r}"
            )
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name}: FAIL {'; '.join(status)}")
        else:
            print(f"  {name}: OK ({len(srows)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
