"""Round-12 verdict items 4+7: daemon-cadence rollover soak — prove
the per-ingest cost of ``ingest_with_rollover`` stays FLAT across many
roll boundaries once retention bounds the family and the id routing
bloom prunes the retraction loop.

The round-11 verdict flagged the growth term: every ingest paid one
docstats scan per older generation (O(n_generations) Spark jobs, and
n_generations was unbounded without a retention phase). This soak
drives the same managed-run harness as the 256-ingest compaction curve
through the rollover family: N disjoint-id batches (the time-series
shape — ids never revisit an old generation) with ``max_docs`` sized
to roll every other batch and ``max_indexes`` retention on, then a
final OVERLAPPING batch to show a genuine cross-generation re-ingest
still pays exactly one retraction scan.

Usage: python scripts/rollover_soak.py [--batches 16] [--out FILE]
Prints one JSON object: per-ingest seconds, generation count over
time, and the overlap-batch cost.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--rows-per-batch", type=int, default=400)
    ap.add_argument("--max-docs", type=int, default=800)
    ap.add_argument("--max-indexes", type=int, default=4,
                    help="0 = no retention (the pre-round-12 shape)")
    ap.add_argument("--no-bloom", action="store_true",
                    help="strip routing blooms before every ingest, "
                    "forcing the per-generation retraction scans the "
                    "bloom exists to skip (the pre-round-12 cost)")
    ap.add_argument("--out", default="ROLLOVER_SOAK_r12.json")
    args = ap.parse_args()

    from pycasselastic_spark.operators import search_rollover as RO
    from pycasselastic_spark.session import get_spark

    spark = get_spark(app_name="rollover-soak")
    fam = os.path.join(tempfile.mkdtemp(prefix="ro_soak_"), "fam")
    pol = RO.RolloverPolicy(
        max_docs=args.max_docs,
        max_indexes=args.max_indexes or None,
    )

    def strip_blooms() -> None:
        if not os.path.isdir(fam):
            return
        for e in os.listdir(fam):
            if e.endswith(".idbloom.json"):
                os.remove(os.path.join(fam, e))

    def batch_df(lo: int, n: int):
        rows = [
            (lo + i, f"common doc{lo + i} text alpha beta w{(lo + i) % 7}")
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    # discarded warmup ingest into a throwaway family (JIT/codegen)
    RO.ingest_with_rollover(
        batch_df(10_000_000, 50), "doc_id", "text",
        os.path.join(tempfile.gettempdir(), "ro_warm"), pol, n_buckets=8,
    )
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "ro_warm"),
                  ignore_errors=True)

    per_ingest = []
    for b in range(args.batches):
        if args.no_bloom:
            strip_blooms()
        t0 = time.perf_counter()
        RO.ingest_with_rollover(
            batch_df(b * args.rows_per_batch, args.rows_per_batch),
            "doc_id", "text", fam, pol, n_buckets=8,
        )
        dt = round(time.perf_counter() - t0, 2)
        gens = len(RO._read_manifest(fam))
        per_ingest.append({"batch": b, "sec": dt, "generations": gens})
        print(f"  ingest {b}: {dt}s, {gens} generations", flush=True)

    # one overlapping batch: re-ingest ids that live in the OLDEST
    # retained generation — exactly one retraction scan should fire
    oldest = RO._read_manifest(fam)[0]
    gen_no = int(oldest.split("-", 1)[1])
    # ids of the first batch that landed in the oldest retained gen:
    # batches fill max_docs/rows_per_batch per gen in order
    per_gen = args.max_docs // args.rows_per_batch
    overlap_lo = (gen_no - 1) * per_gen * args.rows_per_batch
    t0 = time.perf_counter()
    RO.ingest_with_rollover(
        batch_df(overlap_lo, 50), "doc_id", "text", fam, pol, n_buckets=8,
    )
    overlap_sec = round(time.perf_counter() - t0, 2)
    print(f"  overlap ingest: {overlap_sec}s", flush=True)

    # family probe stays correct after the whole soak
    k = RO.rollover_bm25_topk(spark, fam, ["common"], k=10).count()

    halves = [r["sec"] for r in per_ingest]
    mid = len(halves) // 2
    result = {
        "batches": args.batches,
        "rows_per_batch": args.rows_per_batch,
        "max_docs": args.max_docs,
        "max_indexes": args.max_indexes,
        "per_ingest": per_ingest,
        "overlap_ingest_sec": overlap_sec,
        "first_half_mean_s": round(sum(halves[:mid]) / mid, 2),
        "second_half_mean_s": round(sum(halves[mid:]) / (len(halves) - mid), 2),
        "probe_rows": k,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "per_ingest"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
