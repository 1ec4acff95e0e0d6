"""Scaling probe: measures wall time of the headline operators across
synthetic size doublings to demonstrate their growth curves (linear for
scans/merges/LSH, quadratic only for the documented baselines).

Writes one JSON line per (operator, n) to stdout; SCALING.md summarizes
a committed run. Synthetic inputs are generated with spark.range (no
parquet I/O) so the numbers isolate operator cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import lww_merge
from pycasselastic_spark.operators import dedup as D
from pycasselastic_spark.operators import similarity as S
from pycasselastic_spark.session import get_spark

WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup row data slow filter customer line value agg "
    "column big vector query group"
).split()


def bench(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="scaling-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    out = []

    # LWW merge: rows double, distinct keys = rows/10
    for n in (2_000_000, 8_000_000, 32_000_000):
        inc = spark.range(n).select(
            (F.col("id") % (n // 10)).alias("key"),
            F.col("id").alias("version"),
            (F.col("id") % 2).alias("side"),
        )
        dt = bench(
            lambda: noop(
                lww_merge(
                    [inc.filter(F.col("side") == 0), inc.filter(F.col("side") == 1)],
                    "key",
                    "version",
                )
            )
        )
        out.append({"op": "lww_merge", "n": n, "sec": dt})

    # synthetic documents: ~60-word texts from a small vocab, with
    # planted near-dups (every 50th doc repeats the previous text)
    def docs(n):
        words_arr = F.array(*[F.lit(w) for w in WORDS])
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda i: F.element_at(
                        words_arr,
                        ((F.xxhash64(F.col("id") * 1000 + i) % 28 + 28) % 28 + 1).cast(
                            "int"
                        ),
                    ),
                ),
            ).alias("text"),
        )
        return base.withColumn(
            "text",
            F.when(
                (F.col("doc_id") % 50 == 0) & (F.col("doc_id") > 0),
                # near-dup of the previous doc: same words, one appended
                F.concat(F.col("text"), F.lit(" extra")),
            ).otherwise(F.col("text")),
        ).repartition(32)

    for n in (5_000, 20_000, 80_000):
        d = docs(n).cache()
        d.count()
        dt = bench(
            lambda: noop(D.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.6))
        )
        out.append({"op": "minhash_lsh", "n": n, "sec": dt})
        dt = bench(lambda: noop(D.simhash_pairs(d, "doc_id", "text", max_hamming=3)))
        out.append({"op": "simhash", "n": n, "sec": dt})
        d.unpersist()

    # similarity: corpus doubles, 10 queries, k=5
    def vecs(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    ((F.xxhash64(F.col("id") * 100 + i) % 1000) + 1000) % 1000
                ).cast("float")
                / 1000.0,
            ).alias("embedding"),
        ).repartition(32)

    for n in (2_000, 8_000, 32_000):
        v = vecs(n).cache()
        v.count()
        q = v.filter(F.col("vec_id") < 10)
        dt = bench(lambda: noop(S.brute_force_topk(v, q, "vec_id", "embedding", 5)))
        out.append({"op": "cosine_bruteforce_topk", "n": n, "sec": dt})
        dt = bench(
            lambda: noop(
                S.lsh_topk(v, q, "vec_id", "embedding", 5, dim=64, num_planes=12, num_bands=6)
            )
        )
        out.append({"op": "cosine_lsh_topk", "n": n, "sec": dt})
        v.unpersist()

    for rec in out:
        print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
