"""Round-11 verdict item 6: pin the three soft round-10 bench drifts
(`bm25_delta_indexed_documents` +9%, `reindex_upgrade_fuzzy2_documents`
+19%, `embedding_lsh_neardup` +16% vs round 9) with the same protocol
that pinned stream_stream_join in round 10: solo (no concurrent Spark
session), discarded warmup, min-of-3, quiet window, sf0.1.

Usage: python scripts/pin_regressions.py [--sf DIR] [names...]
Prints one JSON line per query: {"query": ..., "runs": [...],
"min_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "bm25_delta_indexed_documents",
    "reindex_upgrade_fuzzy2_documents",
    "embedding_lsh_neardup",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT

    from pycasselastic_spark.catalog import QUERIES
    from pycasselastic_spark.session import get_spark

    spark = get_spark()
    # discarded warmup on a cheap query: session init, codegen, JIT
    QUERIES["q1_pricing_summary"].fn(spark, args.sf).collect()

    for name in names:
        fn = QUERIES[name].fn
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, args.sf).collect()
            runs.append(round(time.time() - t0, 2))
        print(json.dumps({
            "query": name, "sf": args.sf, "runs": runs,
            "min_s": min(runs),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
