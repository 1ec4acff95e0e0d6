"""Decade probe (1M -> 10M synthetic docs) for the round-14
training-data operators: BPE merge induction and the Naive Bayes
classifier.

The claim under test is the SCALE LAW, not the constant: BPE's merge
rounds operate on the VOCAB-bounded word-frequency table, so a 10x
corpus should cost ~the one extra corpus pass (word counting), far
below 10x total; NB is one tokenize pass + a vocab-sized join, so
~linear or below. Synthetic docs use a FIXED 28-word vocabulary with
deterministic id-arithmetic word choices (no RNG) so the distinct-word
table is constant across scales — the honest vocab-bounded point.

Usage: python scripts/decade_probe_bpe_nb.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pycasselastic_spark.operators.bpe import bpe_train
from pycasselastic_spark.operators.classify import nb_score, nb_train
from pycasselastic_spark.session import get_spark

WORDS = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark dup row data slow filter customer line "
    "value agg column big vector"
).split()


def synth_docs(spark, n):
    # 12 words per doc chosen by id arithmetic over the fixed vocab;
    # a deterministic 'lang' label splits ~1/3 positive for NB
    # doc content cycles every 9973 ids, so a 10x corpus repeats the
    # SAME word multiset 10x over — relative pair frequencies (and
    # therefore the induced merge table) are scale-invariant, which
    # the merge_tables_equal flag then genuinely checks
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    cyc = F.col("id") % 9973
    cols = [
        F.element_at(
            words_arr,
            ((cyc * (2 * k + 1) + k * k) % len(WORDS) + 1).cast("int"),
        )
        for k in range(12)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("xx").alias("lang"),
    )


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 2), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SF10_r14cont.json")
    ap.add_argument("--small", type=int, default=1_000_000)
    ap.add_argument("--big", type=int, default=10_000_000)
    args = ap.parse_args()
    spark = get_spark()
    rec = {"probe": "bpe+nb decade", "small_n": args.small,
           "big_n": args.big, "ops": {}}
    for name, n in (("small", args.small), ("big", args.big)):
        docs = synth_docs(spark, n)
        t_bpe, merges = timed(lambda: bpe_train(docs, "text", 5))
        t_nb, cnt = timed(lambda: (
            nb_score(docs, "doc_id", "text",
                     *nb_train(docs, "doc_id", "text",
                               F.col("lang") == "en"))
            .agg(F.sum("score_q30"), F.count(F.lit(1))).collect()
        ))
        rec["ops"].setdefault("bpe_train_k5", {})[name] = t_bpe
        rec["ops"].setdefault("nb_train_score", {})[name] = t_nb
        rec.setdefault("_merges", {})[name] = [m[3] for m in merges]
    for op, d in rec["ops"].items():
        d["ratio"] = round(d["big"] / d["small"], 2)
    # the vocab-bounded sanity: identical merge tables at both scales
    rec["merge_tables_equal"] = (
        rec["_merges"]["small"] == rec["_merges"]["big"]
    )
    del rec["_merges"]
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
