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


def emit(out, rec):
    out.append(rec)
    print(json.dumps(rec), flush=True)  # incremental: survive timeouts


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # argv selects probe families (default: all) so a noisy-host run can
    # re-measure one family without paying for the rest.
    families = set(sys.argv[1:]) or {
        "merge", "zipf", "text", "vecs", "posorthant", "sketch", "r5ops",
        "search",
    }
    spark = get_spark(app_name="scaling-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    out = []

    # LWW merge: rows double, distinct keys = rows/10
    for n in (2_000_000, 8_000_000, 32_000_000) if "merge" in families else ():
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
        emit(out, {"op": "lww_merge", "n": n, "sec": dt})

    # Zipf-skew merge probe: the SAME 32M-row LWW merge, ids drawn from
    # a Zipf-like power law (inverse-CDF of u^-5, s≈1.2; md5-derived u
    # so the draw is deterministic). The hottest id holds ~13% of ALL
    # rows — the worst realistic shuffle-key skew. The merge's argmax
    # is a hash aggregation with map-side partial combine, so hot keys
    # collapse per input partition BEFORE the shuffle; the claim under
    # test is skewed wall ≈ uniform wall (within ~1.5x), i.e. no
    # salting needed for the merge path (AQE covers residual reducer
    # skew). Hygiene: discarded warmup leg first, then min-of-2 per
    # leg (playbook: first run pays JIT).
    for n in (32_000_000,) if "zipf" in families else ():
        u = (
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
            ).cast("double")
            + 1.0
        ) / 4294967296.0
        zipf_key = F.least(
            F.floor(F.pow(u, F.lit(-5.0))), F.lit(n // 10)
        ).cast("long")
        legs = {"uniform": (F.col("id") % (n // 10)), "zipf": zipf_key}

        def merge_of(key):
            inc = spark.range(n).select(
                key.alias("key"),
                F.col("id").alias("version"),
                (F.col("id") % 2).alias("side"),
            )
            return lww_merge(
                [inc.filter(F.col("side") == 0), inc.filter(F.col("side") == 1)],
                "key",
                "version",
            )

        noop(merge_of(legs["uniform"]))  # discarded warmup
        for label, key in legs.items():
            dt = min(bench(lambda: noop(merge_of(key))) for _ in range(2))
            emit(out, {"op": f"lww_merge_{label}_keys", "n": n, "sec": dt})
        # document the skew actually exercised: hottest-key row share
        hot = (
            spark.range(n)
            .select(zipf_key.alias("key"))
            .groupBy("key")
            .count()
            .orderBy(F.col("count").desc())
            .limit(1)
            .collect()[0]
        )
        emit(
            out,
            {
                "op": "zipf_hottest_key_share",
                "n": n,
                "share": round(hot["count"] / n, 4),
            },
        )

    # sketches: rows double, sketch STATE stays fixed (the point) —
    # bloom bit-set <= m rows, count-min grid <= depth*width rows, so
    # wall time should track the scan, not the key cardinality
    from pycasselastic_spark.operators import sketches as SK

    for n in (2_000_000, 8_000_000, 32_000_000) if "sketch" in families else ():
        keys = spark.range(n).select((F.col("id") % (n // 4)).alias("k"))
        dt = bench(lambda: noop(SK.bloom_build(keys, "k", m_bits=1 << 20, k=5)))
        emit(out, {"op": "bloom_build", "n": n, "sec": dt})
        dt = bench(
            lambda: noop(SK.countmin_counters(keys, "k", depth=4, width=4096))
        )
        emit(out, {"op": "countmin_counters", "n": n, "sec": dt})

    # Persisted postings index vs corpus-scan BM25 (round 8): the
    # point of storing the index is that a QUERY costs pruned-postings
    # work instead of a full corpus re-tokenize. Measure, per corpus
    # size: (a) corpus-scan bm25_topk, (b) indexed bm25_topk_indexed
    # probe (build paid once, amortized), (c) a 1%-batch delta update.
    # Discarded warmup per leg, min-of-2 (playbook hygiene).
    if "search" in families:
        import shutil
        import tempfile as _tf

        from pycasselastic_spark.operators import search as SRCH

        words_arr = F.array(*[F.lit(w) for w in WORDS])

        def sdocs(lo, n):
            return spark.range(lo, lo + n).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(60)),
                        lambda i: F.element_at(
                            words_arr,
                            ((F.xxhash64(F.col("id") * 1000 + i) % 28 + 28) % 28
                             + 1).cast("int"),
                        ),
                    ),
                ).alias("text"),
            )

        q = ["merge", "window", "spark"]
        for n in (20_000, 80_000, 320_000):
            corpus = sdocs(0, n)
            idx_path = os.path.join(_tf.mkdtemp(prefix="probe_idx_"), "idx")
            t0 = time.perf_counter()
            SRCH.build_postings_index(corpus, "doc_id", "text", idx_path, 16)
            build_s = round(time.perf_counter() - t0, 2)
            idx = SRCH.load_postings_index(spark, idx_path)

            noop(SRCH.bm25_topk(corpus, "doc_id", "text", q))  # warmup
            scan_s = min(
                bench(lambda: noop(SRCH.bm25_topk(corpus, "doc_id", "text", q)))
                for _ in range(2)
            )
            noop(SRCH.bm25_topk_indexed(idx, q))  # warmup
            probe_s = min(
                bench(lambda: noop(SRCH.bm25_topk_indexed(idx, q)))
                for _ in range(2)
            )
            delta = sdocs(n, n // 100)
            t0 = time.perf_counter()
            SRCH.update_postings_index(delta, "text", idx_path)
            delta_s = round(time.perf_counter() - t0, 2)
            emit(out, {
                "op": "bm25_index", "n": n, "build_sec": build_s,
                "corpus_scan_query_sec": scan_s,
                "indexed_query_sec": probe_s,
                "delta_update_1pct_sec": delta_s,
            })
            shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)

    # Index lifecycle at DAEMON CADENCE (round-8 verdict item 1): the
    # reference daemon commits every minute (SyncCassElastic.py:45-47),
    # so the index's production shape is MANY small generations. This
    # family measures what that does to the probe: wall latency and
    # files-per-bucket vs committed-generation count, the recovery a
    # single compaction buys, and that CompactionPolicy keeps both
    # bounded without an operator guessing.
    if "lifecycle" in families:
        import shutil
        import tempfile as _tf

        from pycasselastic_spark.operators import search as SRCH

        words_arr = F.array(*[F.lit(w) for w in WORDS])

        def sdocs2(lo, n):
            return spark.range(lo, lo + n).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(60)),
                        lambda i: F.element_at(
                            words_arr,
                            ((F.xxhash64(F.col("id") * 1000 + i) % 28 + 28) % 28
                             + 1).cast("int"),
                        ),
                    ),
                ).alias("text"),
            )

        q = ["merge", "window", "spark"]
        n0, batch = 80_000, 200  # corpus + minute-sized ingest

        def files_per_bucket(path, rel):
            return SRCH._max_files_per_bucket(os.path.join(path, rel))

        def probe_sec(path):
            idx = SRCH.load_postings_index(spark, path)
            noop(SRCH.bm25_topk_indexed(idx, q))  # warmup (plan/JIT)
            return min(
                bench(lambda: noop(SRCH.bm25_topk_indexed(idx, q)))
                for _ in range(2)
            )

        # leg 1: unmanaged growth — eager variants (worst-case file
        # pressure: 3 partitioned relations per ingest)
        idx_path = os.path.join(_tf.mkdtemp(prefix="lifec_idx_"), "idx")
        SRCH.build_postings_index(sdocs2(0, n0), "doc_id", "text", idx_path, 16)
        checkpoints = {1, 4, 8, 16, 32, 64}
        gens = 1
        emit(out, {
            "op": "index_lifecycle", "gens": gens,
            "probe_sec": probe_sec(idx_path),
            "postings_files_per_bucket": files_per_bucket(idx_path, "postings"),
            "variants_files_per_bucket": files_per_bucket(idx_path, "variants"),
        })
        for i in range(63):
            SRCH.update_postings_index(
                sdocs2(n0 + i * batch, batch), "text", idx_path
            )
            gens += 1
            if gens in checkpoints:
                emit(out, {
                    "op": "index_lifecycle", "gens": gens,
                    "probe_sec": probe_sec(idx_path),
                    "postings_files_per_bucket":
                        files_per_bucket(idx_path, "postings"),
                    "variants_files_per_bucket":
                        files_per_bucket(idx_path, "variants"),
                })
        t0 = time.perf_counter()
        SRCH.compact_postings_index(spark, idx_path)
        compact_s = round(time.perf_counter() - t0, 2)
        emit(out, {
            "op": "index_lifecycle_post_compact", "gens": 1,
            "compact_sec": compact_s,
            "probe_sec": probe_sec(idx_path),
            "postings_files_per_bucket": files_per_bucket(idx_path, "postings"),
            "variants_files_per_bucket": files_per_bucket(idx_path, "variants"),
        })
        shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)

        # leg 2: managed — CompactionPolicy + deferred variants (the
        # recommended daemon deployment); generations and files stay
        # bounded across the same ingest count with no manual compact
        idx_path = os.path.join(_tf.mkdtemp(prefix="lifec_auto_"), "idx")
        policy = SRCH.CompactionPolicy(max_committed_gens=16)
        worst_gens = worst_files = 0
        t0 = time.perf_counter()
        SRCH.ingest_into_postings_index(
            sdocs2(0, n0), "doc_id", "text", idx_path, 16,
            policy=policy, defer_variants=True,
        )
        for i in range(63):
            SRCH.ingest_into_postings_index(
                sdocs2(n0 + i * batch, batch), "doc_id", "text", idx_path, 16,
                policy=policy, defer_variants=True,
            )
            import json as _json

            with open(os.path.join(idx_path, "stats.json")) as fh:
                worst_gens = max(
                    worst_gens, len(_json.load(fh)["committed_gens"])
                )
            worst_files = max(
                worst_files, files_per_bucket(idx_path, "postings")
            )
        total_s = round(time.perf_counter() - t0, 2)
        emit(out, {
            "op": "index_lifecycle_autopolicy", "ingests": 64,
            "total_sec": total_s,
            "max_gens_observed": worst_gens,
            "max_postings_files_per_bucket_observed": worst_files,
            "probe_sec": probe_sec(idx_path),
            "variants_files_per_bucket": files_per_bucket(idx_path, "variants"),
        })
        shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)

    # Day-scale daemon run (round-9 verdict item 4): the 64-ingest
    # curve above bounds the managed leg at 16 generations, but the
    # reference daemon produces ~1,440 generations/day
    # (SyncCassElastic.py:45-47) and the day-scale claim was only
    # extrapolated. This family runs 256 minute-sized ingests under
    # the recommended policy (max_committed_gens=16,
    # defer_variants=True), checkpointing probe latency, files/bucket,
    # and the amortized per-ingest cost — the bound must hold FLAT
    # across 4x the measured horizon, and compaction cost must stay
    # corpus-sized (not generations-sized).
    if "lifecycle256" in families:
        import json as _json
        import shutil
        import tempfile as _tf

        from pycasselastic_spark.operators import search as SRCH

        words_arr = F.array(*[F.lit(w) for w in WORDS])

        def sdocs3(lo, n):
            return spark.range(lo, lo + n).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(60)),
                        lambda i: F.element_at(
                            words_arr,
                            ((F.xxhash64(F.col("id") * 1000 + i) % 28 + 28) % 28
                             + 1).cast("int"),
                        ),
                    ),
                ).alias("text"),
            )

        q = ["merge", "window", "spark"]
        n0, batch = 80_000, 200

        def probe_sec3(path):
            idx = SRCH.load_postings_index(spark, path)
            noop(SRCH.bm25_topk_indexed(idx, q))  # warmup (plan/JIT)
            return min(
                bench(lambda: noop(SRCH.bm25_topk_indexed(idx, q)))
                for _ in range(2)
            )

        idx_path = os.path.join(_tf.mkdtemp(prefix="lifec256_"), "idx")
        policy = SRCH.CompactionPolicy(max_committed_gens=16)
        worst_gens = worst_files = 0
        checkpoints = {16, 32, 64, 128, 192, 256}
        t0 = time.perf_counter()
        SRCH.ingest_into_postings_index(
            sdocs3(0, n0), "doc_id", "text", idx_path, 16,
            policy=policy, defer_variants=True,
        )
        for i in range(255):
            SRCH.ingest_into_postings_index(
                sdocs3(n0 + i * batch, batch), "doc_id", "text", idx_path,
                16, policy=policy, defer_variants=True,
            )
            with open(os.path.join(idx_path, "stats.json")) as fh:
                worst_gens = max(
                    worst_gens, len(_json.load(fh)["committed_gens"])
                )
            worst_files = max(
                worst_files,
                SRCH._max_files_per_bucket(
                    os.path.join(idx_path, "postings")
                ),
            )
            ing = i + 2
            if ing in checkpoints:
                emit(out, {
                    "op": "index_lifecycle_256", "ingests": ing,
                    "elapsed_sec": round(time.perf_counter() - t0, 2),
                    "sec_per_ingest": round(
                        (time.perf_counter() - t0) / ing, 2
                    ),
                    "max_gens_observed": worst_gens,
                    "max_postings_files_per_bucket_observed": worst_files,
                    "probe_sec": probe_sec3(idx_path),
                })
        shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)

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
        # genuine planted near-dup: every 50th doc re-derives the
        # PREVIOUS doc's words (same xxhash stream, id-1) plus one
        # appended token -> jaccard ~= 58/61 well above 0.6. (An older
        # version appended to the doc's OWN text, which plants nothing.)
        prev_text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda i: F.element_at(
                    words_arr,
                    (
                        (F.xxhash64((F.col("doc_id") - 1) * 1000 + i) % 28 + 28)
                        % 28
                        + 1
                    ).cast("int"),
                ),
            ),
        )
        return base.withColumn(
            "text",
            F.when(
                (F.col("doc_id") % 50 == 0) & (F.col("doc_id") > 0),
                F.concat(prev_text, F.lit(" extra")),
            ).otherwise(F.col("text")),
        ).repartition(32)

    for n in (5_000, 20_000, 80_000) if "text" in families else ():
        d = docs(n).cache()
        d.count()
        dt = bench(
            lambda: noop(D.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.6))
        )
        emit(out, {"op": "minhash_lsh", "n": n, "sec": dt})
        dt = bench(lambda: noop(D.simhash_pairs(d, "doc_id", "text", max_hamming=3)))
        emit(out, {"op": "simhash", "n": n, "sec": dt})
        dt = bench(lambda: noop(D.passage_duplicate_stats(d, "doc_id", "text")))
        emit(out, {"op": "passage_dedup", "n": n, "sec": dt})
        # incremental ingest: dedup a fixed 2.5k-doc delta against a
        # growing base — cost must track the DELTA (flat-ish as the
        # base doubles), the whole point of base x delta banding
        base = d.filter(F.col("doc_id") % 8 != 0)
        delta = d.filter(F.col("doc_id") % 8 == 0).limit(2_500)
        dt = bench(
            lambda: noop(
                D.minhash_lsh_pairs_between(base, delta, "doc_id", "text")
            )
        )
        emit(out, {"op": "incremental_neardup_2500delta", "n": n, "sec": dt})
        d.unpersist()

    # similarity: corpus doubles, 10 queries, k=5. Components are
    # CENTERED (in [-0.5, 0.5)): sign-hyperplane LSH is uninformative on
    # positive-orthant vectors (every signature collides -> quadratic
    # candidates); real embedding pipelines mean-center for the same
    # reason, and the operator docstrings call this out.
    def vecs(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    ((F.xxhash64(F.col("id") * 100 + i) % 1000) + 1000) % 1000
                ).cast("float")
                / 1000.0
                - 0.5,
            ).alias("embedding"),
        ).repartition(32)

    for n in (2_000, 8_000, 32_000) if "vecs" in families else ():
        v = vecs(n).cache()
        v.count()
        q = v.filter(F.col("vec_id") < 10)
        dt = bench(lambda: noop(S.brute_force_topk(v, q, "vec_id", "embedding", 5)))
        emit(out, {"op": "cosine_bruteforce_topk", "n": n, "sec": dt})
        dt = bench(
            lambda: noop(
                S.lsh_topk(v, q, "vec_id", "embedding", 5, dim=64, num_planes=12, num_bands=6)
            )
        )
        emit(out, {"op": "cosine_lsh_topk", "n": n, "sec": dt})
        dt = bench(
            lambda: noop(
                S.ivf_topk(v, q, "vec_id", "embedding", 5, n_cells=16, n_probe=4)
            )
        )
        emit(out, {"op": "cosine_ivf_topk", "n": n, "sec": dt})
        if n <= 8_000:
            # sign-band LSH pruning is a CONSTANT factor on unstructured
            # vectors (~80% of random pairs share a 2-bit band with
            # 12 planes / 6 bands) — kept small here to document that;
            # embedding_ivf_pairs below is the asymptotic scale path.
            dt = bench(
                lambda: noop(
                    D.embedding_lsh_pairs(
                        v, "vec_id", "embedding", threshold=0.9, dim=64
                    )
                )
            )
            emit(out, {"op": "embedding_lsh_pairs", "n": n, "sec": dt})
        # cell count grows with the corpus (constant cell SIZE), so
        # candidate volume stays linear: cells * size^2 ~ n * size
        dt = bench(
            lambda: noop(
                D.embedding_ivf_pairs(
                    v, "vec_id", "embedding", threshold=0.9,
                    n_cells=max(16, n // 125), n_assign=3,
                )
            )
        )
        emit(out, {"op": "embedding_ivf_pairs", "n": n, "sec": dt})
        v.unpersist()

    # positive-orthant vectors (components in [0, 1)) — the historical
    # degenerate case for sign-hyperplane banding: every raw vector lies
    # on the same side of every plane, every signature collides, and the
    # candidate space is ALL pairs (pre-round-3 behavior, fraction 6.0
    # with one giant bucket per band). The operator now (a) mean-centers
    # signatures internally — restoring uniform bucket occupancy — and
    # (b) offers corpus-scaled parameters (lsh_params_for: band width
    # ~log2 n) that drive the cross-pair collision rate per band to
    # ~1/n, making total candidates ~bands*n (subquadratic). Every 50th
    # vector is a planted near-dup of its predecessor so recall at the
    # 0.9 threshold is measured alongside the candidate volume.
    def pos_vecs(n):
        base = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    ((F.xxhash64(F.col("id") * 100 + i) % 1000) + 1000) % 1000
                ).cast("float")
                / 1000.0,
            ).alias("embedding"),
        )
        # planted near-dup: copy the previous vector, nudge one component
        prev = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                ((F.xxhash64((F.col("vec_id") - 1) * 100 + i) % 1000) + 1000) % 1000
            ).cast("float")
            / 1000.0
            + F.when(i == 1, F.lit(0.01)).otherwise(F.lit(0.0)),
        )
        return base.withColumn(
            "embedding",
            F.when(
                (F.col("vec_id") % 50 == 0) & (F.col("vec_id") > 0), prev
            ).otherwise(F.col("embedding")),
        ).repartition(32)

    for n in (2_000, 8_000, 32_000) if "posorthant" in families else ():
        from pycasselastic_spark.operators.similarity import lsh_params_for

        v = pos_vecs(n).cache()
        v.count()
        for label, (planes, bands) in (
            ("fixed_12_6", (12, 6)),
            ("auto", lsh_params_for(n, 0.9, target_recall=0.9)),
        ):
            cand = (
                D.embedding_lsh_band_stats(
                    v, "vec_id", "embedding", dim=64,
                    num_planes=planes, num_bands=bands,
                )
                .agg(
                    F.sum(
                        F.col("bucket_size") * (F.col("bucket_size") - 1) / 2
                    ).alias("c")
                )
                .collect()[0]["c"]
            )
            emit(
                out,
                {
                    "op": f"lsh_posorthant_candidates_{label}",
                    "n": n,
                    "planes": planes,
                    "bands": bands,
                    "candidates": int(cand),
                    "all_pairs": n * (n - 1) // 2,
                    "fraction": round(cand / (n * (n - 1) / 2), 5),
                },
            )
        t0 = time.perf_counter()
        found = (
            D.embedding_lsh_pairs_auto(
                v, "vec_id", "embedding", threshold=0.9, dim=64, target_recall=0.9
            )
            .filter(
                (F.col("doc_b") == F.col("doc_a") + 1)
                & (F.col("doc_b") % 50 == 0)
            )
            .count()
        )
        planted = (n - 1) // 50
        emit(
            out,
            {
                "op": "embedding_lsh_pairs_auto_posorthant",
                "n": n,
                "sec": round(time.perf_counter() - t0, 2),
                "planted_recall": round(found / planted, 3),
            },
        )
        v.unpersist()

    # ---- round-5 operators: anti-entropy diff, bloom-pruned join, CC ----

    # anti-entropy: table doubles, drift FIXED (100 mutations in bucket
    # 0 + 100 deletions in bucket 1). Payloads are WIDE (~256 chars,
    # replica-row realistic): the digest path scans twice but shuffles
    # only 64 digest rows/side plus the 2-bucket slice, while the naive
    # full-outer diff shuffles all 2n wide rows — the volume gap that
    # decides the contest on a network-bound cluster, measured here as
    # wall time with both paths on identical inputs.
    from pycasselastic_spark.core.diff import table_diff

    for n in (2_000_000, 8_000_000, 32_000_000) if "r5ops" in families else ():
        a = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("grp"),
            F.repeat(
                F.concat(F.lit("v"), (F.col("id") % 1013).cast("string")), 50
            ).alias("val"),
        )
        b = (
            a.filter(~((F.col("k") >= 64) & (F.col("k") < 6464) & (F.col("k") % 64 == 1)))
            .withColumn(
                "val",
                F.when(
                    (F.col("k") < 6400) & (F.col("k") % 64 == 0),
                    F.lit("drifted"),
                ).otherwise(F.col("val")),
            )
        )
        # analytic shuffle volume (a property of the plan, not a
        # measurement): the digest path shuffles 64 digest rows/side
        # plus the 2 flagged buckets' slice (~n/32 narrow rows); the
        # naive full-outer shuffles all 2n WIDE rows. Local wall time
        # hides this (shuffle is a memory copy on local[32] while the
        # md5 digest pass is CPU-bound) — which is exactly why both
        # numbers are recorded: wall here, volume for the
        # network-bound cluster case.
        for hash_fn in ("md5", "xxhash64"):
            dt = bench(
                lambda: noop(
                    table_diff(
                        a, b, "k", ["grp", "val"], n_buckets=64, hash_fn=hash_fn
                    )
                )
            )
            emit(
                out,
                {
                    "op": f"anti_entropy_diff_{hash_fn}",
                    "n": n,
                    "sec": dt,
                    "digest_shuffle_rows": 2 * 64 + n // 32,
                    "naive_shuffle_rows": 2 * n,
                },
            )
        naive = (
            a.alias("a")
            .join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
            .filter(
                F.col("a.k").isNull()
                | F.col("b.k").isNull()
                | (F.col("a.grp") != F.col("b.grp"))
                | (F.col("a.val") != F.col("b.val"))
            )
        )
        dt = bench(lambda: noop(naive))
        emit(out, {"op": "anti_entropy_diff_naive_fullouter", "n": n, "sec": dt})

    # bloom-pruned join: facts double, dim fixed at 2k keys. The
    # bloom_contains LUT is a codegen array lookup — constant per row —
    # so wall time must track the fact scan linearly.
    from pycasselastic_spark.operators import sketches as SK

    for n in (4_000_000, 16_000_000, 64_000_000) if "r5ops" in families else ():
        facts = spark.range(n).select(
            (F.col("id") % 1_000_000).alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        dim = spark.range(2_000).select((F.col("id") * 499).alias("custkey"))
        mask = SK.bloom_mask(SK.bloom_build(dim, "custkey", 4096, 5), 4096)
        pruned = facts.filter(SK.bloom_contains(F.col("user_id"), mask, 5))
        joined = pruned.join(F.broadcast(dim), pruned["user_id"] == dim["custkey"])
        dt = bench(lambda: noop(joined.groupBy("custkey").agg(F.sum("value"))))
        emit(out, {"op": "bloom_pruned_join", "n": n, "sec": dt})

    # dedup-graph connected components: LSH pair graph of the synthetic
    # near-dup corpus, doubling docs. Observables: wall time AND the
    # number of large/small-star round pairs — the O(log n) claim.
    from pycasselastic_spark.operators.components import (
        connected_components_with_rounds,
    )

    for n in (10_000, 40_000, 160_000) if "r5ops" in families else ():
        d = docs(n).cache()
        d.count()
        pairs = D.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.6)
        t0 = time.perf_counter()
        labels, rounds = connected_components_with_rounds(
            pairs, driver_max_edges=0
        )
        n_nodes = labels.count()
        emit(
            out,
            {
                "op": "dedup_graph_cc",
                "n": n,
                "sec": round(time.perf_counter() - t0, 2),
                "rounds": rounds,
                "labeled_nodes": n_nodes,
            },
        )
        d.unpersist()

    # adversarial diameter: a PATH graph of n nodes (diameter n-1) is
    # the worst case for label propagation (O(n) rounds); the star
    # alternation must stay logarithmic — rounds should grow by ~+1
    # per 4x nodes while wall time stays near-linear.
    for n in (10_000, 40_000, 160_000, 640_000) if "r5ops" in families else ():
        path_edges = spark.range(n - 1).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        t0 = time.perf_counter()
        labels, rounds = connected_components_with_rounds(
            path_edges, driver_max_edges=0
        )
        one = labels.select("component").distinct().count()
        emit(
            out,
            {
                "op": "cc_path_graph",
                "n": n,
                "sec": round(time.perf_counter() - t0, 2),
                "rounds": rounds,
                "components": one,  # must be 1
            },
        )

    spark.stop()


if __name__ == "__main__":
    main()
