"""Capture .explain("formatted") for catalog queries into plans/<dir>/.

Usage: python scripts/capture_plans.py --out plans/r14 --suffix _before q1 q2 ...

Each query's fn is executed (index-building queries run their builds —
side effects land in temp dirs exactly as in the bench) and the RETURNED
DataFrame's formatted plan is written to <out>/<query><suffix>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pycasselastic_spark.catalog import QUERIES
    from pycasselastic_spark.session import get_spark

    outdir = os.path.join(REPO, args.out)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.queries:
        df = QUERIES[name].fn(spark, args.sf)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
