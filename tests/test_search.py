"""Unit tests for the round-7 operators: search (inverted index, BM25,
TF-IDF, phrase), containment dedup, group-consistent split, per-group
cap, hybrid skew join, multi-snapshot LWW."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import lww_merge, lww_snapshots
from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.operators import search_index as SRCH_INDEX
from pycasselastic_spark.operators.dedup import containment_pairs
from pycasselastic_spark.operators.sampling import (
    group_consistent_split,
    per_group_cap,
)
from pycasselastic_spark.operators.skew import hybrid_skew_join


def _docs(spark):
    rows = [
        (1, "a b c a"),
        (2, "a b"),
        (3, "c d e"),
        (4, "a a a a"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_inverted_index_stats(spark):
    out = {
        r["term"]: r
        for r in SRCH.inverted_index_stats(_docs(spark), "doc_id", "text").collect()
    }
    assert out["a"]["df"] == 3 and out["a"]["total_tf"] == 7 and out["a"]["max_tf"] == 4
    assert out["d"]["df"] == 1 and out["d"]["total_tf"] == 1


def test_bm25_matches_hand_formula(spark):
    docs = _docs(spark)
    out = {
        r["doc_id"]: r
        for r in SRCH.bm25_topk(docs, "doc_id", "text", ["a"], k=10).collect()
    }
    # hand BM25: N=4, df(a)=3, avgdl=(4+2+3+4)/4=3.25
    idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 3.25))

    assert out[1]["score_q20"] == math.floor(score(2, 4) * (1 << 20))
    assert out[4]["score_q20"] == math.floor(score(4, 4) * (1 << 20))
    assert 3 not in out  # no hit term
    # more occurrences => higher BM25, saturating not linear
    assert out[4]["score_q20"] > out[1]["score_q20"] > out[2]["score_q20"] * 0


def test_tfidf_top_terms_ranks_rare_terms_first(spark):
    out = SRCH.tfidf_top_terms(_docs(spark), "doc_id", "text", k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # doc 3's rarest terms are d/e (df=1); ties broken by term asc
    assert top[3] == "d"


def test_phrase_search_counts_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x"), (2, "x y"), (3, "zzz")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in SRCH.phrase_search(docs, "doc_id", "text", "x y").collect()
    }
    assert out == {1: 2, 2: 1}


def test_containment_asymmetric(spark):
    # doc 1's shingles all appear in doc 2 (A contained in B), but B
    # has many extra shingles so Jaccard is low and B is NOT contained
    # in A.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e f g h i j k l m n o p q r s t"),
        ],
        ["doc_id", "text"],
    )
    out = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
    pairs = {(r["doc_inner"], r["doc_outer"]): r["containment"] for r in out}
    assert pairs[(1, 2)] == 1.0
    assert (2, 1) not in pairs


def test_containment_df_cap_only_lowers(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(5)], ["doc_id", "text"]
    )
    # every shingle appears in all 5 docs; a df cap of 4 drops them all
    uncapped = containment_pairs(docs, "doc_id", "text", threshold=0.8)
    capped = containment_pairs(
        docs, "doc_id", "text", threshold=0.8, max_shingle_df=4
    )
    assert uncapped.count() == 20  # 5*4 directed pairs
    assert capped.count() == 0


def test_group_consistent_split_is_group_constant(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], ["row_id", "grp"]
    ).withColumn("split", group_consistent_split(F.col("grp"), train_pct=50))
    per_group = df.groupBy("grp").agg(
        F.count_distinct("split").alias("n_splits")
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0


def test_per_group_cap(spark):
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(30)], ["row_id", "grp", "prio"]
    )
    out = per_group_cap(df, "grp", [F.col("prio").desc(), F.col("row_id")], 4)
    assert out.count() == 12
    # keeps the top-prio rows of each group
    kept = {r["row_id"] for r in out.filter(F.col("grp") == 0).collect()}
    assert kept == {27, 24, 21, 18}


def test_hybrid_skew_join_equals_plain_join(spark):
    import random

    rng = random.Random(7)
    big = spark.createDataFrame(
        [(rng.choice([1, 1, 1, 1, 2, 3, 4, 5]), i) for i in range(500)],
        ["k", "payload"],
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(8)], ["k", "attr"]
    )
    hybrid = hybrid_skew_join(big, small, ["k"], hot_threshold=100)
    plain = big.join(small, ["k"])
    assert (
        sorted(map(tuple, hybrid.collect()))
        == sorted(map(tuple, plain.collect()))
    )


def test_lww_snapshots_match_filtered_merges(spark):
    rows = [
        (1, 10, "v10"),
        (1, 20, "v20"),
        (1, 30, "v30"),
        (2, 15, "w15"),
        (2, 25, "w25"),
    ]
    df = spark.createDataFrame(rows, ["id", "version", "payload"])
    snaps = lww_snapshots([df], "id", "version", [12, 22, 35])
    got = {
        (r["snapshot_version"], r["id"]): (r["version"], r["payload"])
        for r in snaps.collect()
    }
    # naive per-snapshot filtered merges must agree
    for v in (12, 22, 35):
        naive = lww_merge([df.filter(F.col("version") <= v)], "id", "version")
        for r in naive.collect():
            assert got[(v, r["id"])] == (r["version"], r["payload"])
    # id 2 has no increment at version <= 12 -> absent, not NULL
    assert (12, 2) not in got
    assert len(got) == 5


def test_funnel_stages_are_strictly_nested(spark, sf_dir):
    """The funnel counts must be monotone non-increasing by stage on
    the real corpus (a later stage's population is a subset of the
    earlier stage's, by construction of the stagewise joins)."""
    from pycasselastic_spark.catalog import QUERIES

    row = QUERIES["funnel_analysis_events"].fn(spark, sf_dir).collect()[0]
    assert row["n_signup"] >= row["n_view_24h"] >= row["n_purchase_24h"] >= 0


def test_funnel_requires_strict_order(spark):
    """A user whose view precedes their signup (or purchase precedes
    the view) must not convert — order, not mere presence."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: proper order, inside the 24h windows
        (1, base, 10, "signup", 1.0, "{}"),
        (2, base + dt.timedelta(hours=1), 10, "view", 1.0, "{}"),
        (3, base + dt.timedelta(hours=2), 10, "purchase", 1.0, "{}"),
        # u2: view BEFORE signup -> stops at signup
        (4, base + dt.timedelta(hours=5), 20, "view", 1.0, "{}"),
        (5, base + dt.timedelta(hours=6), 20, "signup", 1.0, "{}"),
        # u3: view ok, purchase 3 days later -> outside the 24h bound
        (6, base, 30, "signup", 1.0, "{}"),
        (7, base + dt.timedelta(hours=1), 30, "view", 1.0, "{}"),
        (8, base + dt.timedelta(days=3), 30, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os

    d = os.path.join(tempfile.mkdtemp(), "events.parquet")
    df.write.parquet(d)
    from pycasselastic_spark.catalog import QUERIES

    out = QUERIES["funnel_analysis_events"].fn(
        spark, os.path.dirname(d)
    ).collect()[0]
    assert (out["n_signup"], out["n_view_24h"], out["n_purchase_24h"]) == (3, 2, 1)


# --- persisted / incremental postings index --------------------------------


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_indexed_bm25_equals_corpus_scan(spark, tmp_path):
    """Full build then probe: identical rows to the corpus-scan
    ``bm25_topk`` (same scoring law, different physical plan)."""
    docs = _corpus(spark, [
        (1, "spark join shuffle join"),
        (2, "spark filter scan"),
        (3, "join join join broadcast"),
        (4, "scan scan filter pushdown spark"),
        (5, "unrelated words only here"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    q = ["join", "spark"]
    want = sorted(map(tuple, SRCH.bm25_topk(docs, "doc_id", "text", q).collect()))
    got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx, q).collect()))
    assert got == want and len(got) == 4


def test_indexed_probe_plan_reads_postings_not_corpus(spark, tmp_path):
    """The query-side plan must contain NO Generate (explode) node and
    must scan only the pruned postings partitions — the entire point of
    persisting the index."""
    docs = _corpus(spark, [(i, f"w{i % 7} common t{i}") for i in range(50)])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=8)
    idx = SRCH.load_postings_index(spark, path)
    plan = idx.live_postings_for(["common"])._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    bucket = SRCH._term_bucket_py("common", 8)
    assert f"pbucket#" in plan or "PartitionFilters" in plan
    full_plan = (
        SRCH.bm25_topk_indexed(idx, ["common", "w3"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in full_plan
    # partition pruning reached the scan: only the query terms' buckets
    assert "PartitionFilters: [" in full_plan and str(bucket) in full_plan


def test_incremental_update_parity_with_rebuild(spark, tmp_path):
    """The maintenance law: build(base) + update(delta1) + update(delta2)
    must answer every query exactly like a fresh build over the CURRENT
    corpus — including re-ingested ids (text changed) and pure
    duplicates (text identical)."""
    base = [(i, f"alpha w{i % 5} beta") for i in range(20)]
    docs0 = _corpus(spark, base)
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs0, "doc_id", "text", path, n_buckets=4)

    # delta 1: 5 brand-new docs + 3 re-ingested UNCHANGED docs
    delta1 = [(20 + i, f"gamma w{i} alpha") for i in range(5)] + base[:3]
    SRCH.update_postings_index(_corpus(spark, delta1), "text", path)
    # delta 2: 2 re-ingested docs with CHANGED text
    delta2 = [(0, "delta epsilon zeta"), (21, "alpha alpha alpha")]
    SRCH.update_postings_index(_corpus(spark, delta2), "text", path)

    current = {i: t for i, t in base}
    for i, t in delta1 + delta2:
        current[i] = t
    fresh_docs = _corpus(spark, sorted(current.items()))
    fresh_path = str(tmp_path / "fresh")
    SRCH.build_postings_index(fresh_docs, "doc_id", "text", fresh_path, n_buckets=4)

    idx = SRCH.load_postings_index(spark, path)
    fresh = SRCH.load_postings_index(spark, fresh_path)
    assert (idx.n_docs, idx.total_dl) == (fresh.n_docs, fresh.total_dl)
    for q in (["alpha"], ["alpha", "beta"], ["gamma", "w3"], ["zeta"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx, q, k=30).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, q, k=30).collect()))
        assert got == want, q
    # the superseded side stays delta-sized: 3 unchanged + 2 changed ids
    assert idx.superseded.count() == 5


def test_phrase_slop_search_semantics(spark, tmp_path):
    """slop=0 is exact adjacency in order; slop widens the allowed gap;
    order still required; n_hits counts distinct start positions."""
    docs = _corpus(spark, [
        (1, "big red fox"),          # exact "big red"
        (2, "big ugly red fox"),     # gap 2: needs slop >= 1
        (3, "red big fox"),          # wrong order: never matches
        (4, "big red big red"),      # two exact starts
        (5, "big very very red"),    # gap 3: needs slop >= 2
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)

    def hits(slop):
        return {
            r["doc_id"]: r["n_hits"]
            for r in SRCH.phrase_slop_search(idx, ["big", "red"], slop).collect()
        }

    assert hits(0) == {1: 1, 4: 2}
    assert hits(1) == {1: 1, 2: 1, 4: 2}
    assert hits(2) == {1: 1, 2: 1, 4: 2, 5: 1}


def test_phrase_slop_three_terms_and_updates(spark, tmp_path):
    """A 3-term phrase chains two position joins; an index update
    replacing a doc's text changes its matches (stale positions must
    not survive)."""
    docs = _corpus(spark, [
        (1, "one two three"),
        (2, "one two x three"),
        (3, "three two one"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    terms = ["one", "two", "three"]
    assert {r["doc_id"] for r in SRCH.phrase_slop_search(idx, terms, 0).collect()} == {1}
    assert {r["doc_id"] for r in SRCH.phrase_slop_search(idx, terms, 1).collect()} == {1, 2}
    SRCH.update_postings_index(
        _corpus(spark, [(1, "nothing here"), (3, "one two three")]), "text", path
    )
    idx2 = SRCH.load_postings_index(spark, path)
    assert {r["doc_id"] for r in SRCH.phrase_slop_search(idx2, terms, 0).collect()} == {3}


def test_conjunctive_bm25_requires_all_terms(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),       # missing gamma
        (3, "alpha gamma"),      # missing beta
        (4, "beta gamma alpha alpha"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = {r["doc_id"] for r in
           SRCH.bm25_topk_conjunctive(idx, ["alpha", "beta", "gamma"]).collect()}
    assert got == {1, 4}
    # disjunctive twin still returns partial matches
    assert len(SRCH.bm25_topk_indexed(idx, ["alpha", "beta", "gamma"]).collect()) == 4


def test_compact_postings_index_preserves_answers_and_drops_antijoin(
    spark, tmp_path
):
    """Compaction folds superseded generations away: identical query
    results, superseded relation emptied, generation reset to 0 so the
    probe plan loses its anti-join."""
    base = [(i, f"alpha w{i % 5} beta") for i in range(20)]
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(_corpus(spark, base), "doc_id", "text", path, n_buckets=4)
    SRCH.update_postings_index(
        _corpus(spark, [(0, "delta epsilon"), (25, "alpha zeta")] + base[1:4]),
        "text", path,
    )
    idx = SRCH.load_postings_index(spark, path)
    before = {
        q: sorted(map(tuple, SRCH.bm25_topk_indexed(idx, list(q), k=30).collect()))
        for q in (("alpha",), ("alpha", "beta"), ("delta", "zeta"))
    }
    n_sup, _ = SRCH.compact_postings_index(spark, path)
    assert n_sup == 4  # doc 0 + re-ingested docs 1-3
    idx2 = SRCH.load_postings_index(spark, path)
    assert idx2.generation == 0 and idx2.superseded.count() == 0
    assert (idx2.n_docs, idx2.total_dl) == (idx.n_docs, idx.total_dl)
    for q, want in before.items():
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx2, list(q), k=30).collect()))
        assert got == want, q
    # post-compaction probe plan: no anti-join (generation 0 short-circuit)
    plan = (
        idx2.live_postings_for(["alpha"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join LeftAnti" not in plan and "Generate" not in plan


def test_streaming_index_maintenance_converges_and_absorbs_replay(
    spark, tmp_path
):
    """The reference's sync loop over the index: stream the corpus in
    4 micro-batches through foreachBatch maintenance; the final index
    answers like a fresh full build. Then replay a batch (at-least-once
    delivery) and assert the probe state is unchanged."""
    rows = [(i, f"w{i % 7} common t{i % 3}") for i in range(40)]
    docs = _corpus(spark, rows)
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)
    path = str(tmp_path / "idx")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = SRCH.start_streaming_index_maintenance(
        stream, "doc_id", "text", path, str(tmp_path / "ckpt"), n_buckets=4
    )
    q.awaitTermination()
    assert (q.lastProgress or {}).get("batchId", 0) >= 3  # really multi-batch

    fresh_path = str(tmp_path / "fresh")
    SRCH.build_postings_index(docs, "doc_id", "text", fresh_path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    fresh = SRCH.load_postings_index(spark, fresh_path)
    assert (idx.n_docs, idx.total_dl) == (fresh.n_docs, fresh.total_dl)
    for terms in (["common"], ["w1", "w2"], ["t0", "common"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx, terms, k=50).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, terms, k=50).collect()))
        assert got == want, terms

    # replayed micro-batch: re-ingest a slice that was already indexed
    replayed = _corpus(spark, rows[:10])
    SRCH.ingest_into_postings_index(replayed, "doc_id", "text", path, n_buckets=4)
    idx2 = SRCH.load_postings_index(spark, path)
    assert (idx2.n_docs, idx2.total_dl) == (fresh.n_docs, fresh.total_dl)
    for terms in (["common"], ["w1", "w2"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx2, terms, k=50).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, terms, k=50).collect()))
        assert got == want, terms


def test_index_health_stats(spark, tmp_path):
    """Per-bucket stats over LIVE postings only: a superseded doc's
    postings must not count."""
    docs = _corpus(spark, [(1, "a b"), (2, "a c c")])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=2)
    SRCH.update_postings_index(_corpus(spark, [(2, "a")]), "text", path)
    idx = SRCH.load_postings_index(spark, path)
    rows = SRCH.index_health(idx).collect()
    # live postings: doc1 {a,b}, doc2(new) {a} -> 3 postings, df(a)=2
    assert sum(r["n_postings"] for r in rows) == 3
    assert max(r["max_df"] for r in rows) == 2
    assert sum(r["total_tf"] for r in rows) == 3  # c:2 from old doc2 gone


def test_highlight_snippets(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "x y spark z w q"),
        (2, "merge a b c d e f"),
        (3, "nothing here"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = {
        r["doc_id"]: (r["first_pos"], r["n_hit_terms"], r["snippet"])
        for r in SRCH.highlight_snippets(
            idx, docs, "text", ["spark", "merge"], window=3
        ).collect()
    }
    assert got == {
        1: (2, 1, "spark z w"),
        2: (0, 1, "merge a b"),
    }


def test_update_crash_before_commit_is_invisible_and_retryable(
    spark, tmp_path, monkeypatch
):
    """The index's exactly-once contract: an update that dies AFTER
    appending data files but BEFORE the stats commit must leave probe
    answers unchanged (orphan generation invisible), and a retried
    update must converge with no duplicates; compaction physically
    drops the orphans."""
    base = [(i, f"alpha w{i % 3}") for i in range(12)]
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(_corpus(spark, base), "doc_id", "text", path, n_buckets=4)
    idx0 = SRCH.load_postings_index(spark, path)
    before = sorted(map(tuple, SRCH.bm25_topk_indexed(idx0, ["alpha"], k=20).collect()))

    # crash point: the COMMIT stats write (the update's ONLY
    # _write_stats call — the generation claim is an O_EXCL claim
    # file since round 9, not a stats rewrite)
    real_write = SRCH._write_stats
    calls = {"n": 0}

    def exploding_write(p, stats):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash before index commit")
        return real_write(p, stats)

    monkeypatch.setattr(SRCH_INDEX, "_write_stats", exploding_write)
    delta = _corpus(spark, [(0, "beta gamma"), (20, "alpha beta")])
    import pytest as _p
    with _p.raises(OSError, match="injected crash"):
        SRCH.update_postings_index(delta, "text", path)
    monkeypatch.setattr(SRCH_INDEX, "_write_stats", real_write)

    # orphan generation: invisible to probes, scalars unchanged
    idx1 = SRCH.load_postings_index(spark, path)
    assert (idx1.n_docs, idx1.total_dl) == (idx0.n_docs, idx0.total_dl)
    assert sorted(
        map(tuple, SRCH.bm25_topk_indexed(idx1, ["alpha"], k=20).collect())
    ) == before
    assert SRCH.bm25_topk_indexed(idx1, ["beta"], k=5).count() == 0

    # retry (the claimed-but-uncommitted number is skipped, not reused)
    SRCH.update_postings_index(delta, "text", path)
    fresh_path = str(tmp_path / "fresh")
    current = dict(base)
    current.update({0: "beta gamma", 20: "alpha beta"})
    SRCH.build_postings_index(
        _corpus(spark, sorted(current.items())), "doc_id", "text",
        fresh_path, n_buckets=4,
    )
    idx2 = SRCH.load_postings_index(spark, path)
    fresh = SRCH.load_postings_index(spark, fresh_path)
    assert (idx2.n_docs, idx2.total_dl) == (fresh.n_docs, fresh.total_dl)
    for terms in (["alpha"], ["beta"], ["gamma", "alpha"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx2, terms, k=30).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, terms, k=30).collect()))
        assert got == want, terms

    # compaction drops the orphan rows physically
    SRCH.compact_postings_index(spark, path)
    import pyspark.sql.functions as _F
    raw = spark.read.parquet(path + "/postings")
    assert raw.select(_F.collect_set("gen")).collect()[0][0] == [0]
    idx3 = SRCH.load_postings_index(spark, path)
    got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx3, ["alpha"], k=30).collect()))
    want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, ["alpha"], k=30).collect()))
    assert got == want


def test_more_like_this_from_forward_index(spark, tmp_path):
    """MLT: doc 1's dominant terms find its thematic neighbors, the
    source doc never appears, and an update changing the doc re-routes
    the probe (stale forward rows superseded)."""
    docs = _corpus(spark, [
        (1, "cat cat cat dog"),
        (2, "cat dog mouse"),
        (3, "cat fish"),
        (4, "zebra lion"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    assert SRCH.doc_top_terms(idx, 1, m=2) == ["cat", "dog"]
    got = [r["doc_id"] for r in SRCH.more_like_this(idx, 1, m=2, k=10).collect()]
    assert 1 not in got and set(got) == {2, 3}  # zebra/lion never match
    # doc 2 matches both terms, doc 3 one -> 2 ranks first
    assert got[0] == 2

    SRCH.update_postings_index(_corpus(spark, [(1, "zebra zebra")]), "text", path)
    idx2 = SRCH.load_postings_index(spark, path)
    assert SRCH.doc_top_terms(idx2, 1, m=2) == ["zebra"]
    got2 = [r["doc_id"] for r in SRCH.more_like_this(idx2, 1, m=2, k=10).collect()]
    assert got2 == [4]  # only the zebra doc is similar now


def test_fuzzy_bm25_expands_typos_and_respects_updates(spark, tmp_path):
    """ES fuzziness: a 1-edit typo finds the intended term's docs via
    the stored variant dictionary; distance-2 strings do not match;
    exact terms still work; newly ingested vocabulary becomes fuzzy-
    matchable."""
    docs = _corpus(spark, [
        (1, "spark engine"),
        (2, "spark spark core"),
        (3, "shark tank"),     # 'shark' is 1 substitution from 'spark'
        (4, "unrelated words"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)

    # 'sparkk' (1 insertion): matches 'spark' AND NOT 'shark' (d=2)
    assert SRCH.expand_fuzzy_terms(idx, ["sparkk"]) == ["spark"]
    got = {r["doc_id"] for r in SRCH.bm25_topk_fuzzy(idx, ["sparkk"]).collect()}
    assert got == {1, 2}
    # 'spark' itself expands to its d<=1 dictionary neighbors
    assert SRCH.expand_fuzzy_terms(idx, ["spark"]) == ["shark", "spark"]
    # no dictionary term within 1 edit -> empty result, no error
    assert SRCH.bm25_topk_fuzzy(idx, ["zzzzzz"]).count() == 0

    SRCH.update_postings_index(_corpus(spark, [(9, "sparky things")]), "text", path)
    idx2 = SRCH.load_postings_index(spark, path)
    assert SRCH.expand_fuzzy_terms(idx2, ["sparkk"]) == ["spark", "sparky"]
    got2 = {r["doc_id"] for r in SRCH.bm25_topk_fuzzy(idx2, ["sparkk"]).collect()}
    assert got2 == {1, 2, 9}


# --- round-9 ES-parity additions ------------------------------------------


def test_min_should_match_between_disjunctive_and_conjunctive(spark, tmp_path):
    """minimum_should_match=2 of 3 terms: supersets the conjunctive
    (all-3) result, subsets the disjunctive (any) result, and every
    returned doc matched >= 2 terms."""
    docs = _corpus(spark, [
        (1, "a b c"), (2, "a b x"), (3, "a y z"), (4, "q r s"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    terms = ["a", "b", "c"]
    got = SRCH.bm25_topk_min_should_match(idx, terms, 2, k=10).collect()
    ids = {r["doc_id"] for r in got}
    assert ids == {1, 2}
    assert all(r["n_hit_terms"] >= 2 for r in got)


def test_search_after_paginates_the_exact_total_order(spark, tmp_path):
    """Cursor pagination: walking 2-row pages with each page's last
    (score_q20, id) as the next cursor reproduces the full ranking
    exactly, with no overlaps or gaps."""
    docs = _corpus(spark, [
        (i, " ".join(["alpha"] * (i % 4 + 1) + [f"w{i}"])) for i in range(9)
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    full = SRCH.bm25_topk_indexed(idx, ["alpha"], k=100).collect()
    assert len(full) == 9
    pages, cursor = [], None
    while True:
        if cursor is None:
            page = SRCH.bm25_topk_indexed(idx, ["alpha"], k=2).collect()
        else:
            page = SRCH.bm25_search_after(
                idx, ["alpha"], cursor["score_q20"], cursor["doc_id"], k=2
            ).collect()
        if not page:
            break
        pages.extend(page)
        cursor = page[-1]
    assert [tuple(r) for r in pages] == [tuple(r) for r in full]


def test_multifield_most_fields_combines_boosted_field_scores(spark, tmp_path):
    """multi_match most_fields: per-field indexes keep their own
    statistics, the combined score is the exact integer
    boost-weighted sum of the per-field Q20 scores, and a doc matching
    in only one field still ranks."""
    rows = [
        (1, "spark title", "body about other things"),
        (2, "unrelated title", "spark spark in the body"),
        (3, "spark here", "spark there"),
        (4, "nothing", "nothing again"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "title", "body"])
    tpath, bpath = str(tmp_path / "t"), str(tmp_path / "b")
    SRCH.build_postings_index(docs.select("doc_id", "title"), "doc_id", "title", tpath, 4)
    SRCH.build_postings_index(docs.select("doc_id", "body"), "doc_id", "body", bpath, 4)
    tidx = SRCH.load_postings_index(spark, tpath)
    bidx = SRCH.load_postings_index(spark, bpath)
    got = SRCH.bm25_topk_multifield(
        {"title": tidx, "body": bidx}, {"title": 2, "body": 1}, ["spark"], k=10
    ).collect()
    assert {r["doc_id"] for r in got} == {1, 2, 3}
    t = {r["doc_id"]: r["score_q20"]
         for r in SRCH._bm25_scored(tidx, ["spark"], 1.2, 0.75).collect()}
    b = {r["doc_id"]: r["score_q20"]
         for r in SRCH._bm25_scored(bidx, ["spark"], 1.2, 0.75).collect()}
    for r in got:
        want = 2 * t.get(r["doc_id"], 0) + b.get(r["doc_id"], 0)
        assert r["score_q20"] == want, r
    # non-integral boosts raise instead of silently truncating
    # (int(0.5) -> 0 would zero the field; ES float semantics differ)
    import pytest as _p
    with _p.raises(ValueError, match="integral"):
        SRCH.bm25_topk_multifield(
            {"title": tidx, "body": bidx}, {"title": 2.5, "body": 1},
            ["spark"], k=10,
        )


def test_reindex_changes_buckets_and_depth_without_raw_text(spark, tmp_path):
    """reindex_postings_index = ES reindex into a FRESH path: re-bucket
    4 -> 8 and deepen the fuzzy dictionary 1 -> 2 from the stored
    postings alone; probes must answer exactly like a fresh build at
    the new settings, fuzziness=2 starts working on an index
    originally built at depth 1, and the in-place settings change is
    rejected (the atomicity hazard the advisor flagged)."""
    rows = [(i, f"spark merge w{i % 6} catalog") for i in range(24)]
    docs = _corpus(spark, rows)
    src = str(tmp_path / "idx_v1")
    SRCH.build_postings_index(docs, "doc_id", "text", src, n_buckets=4)
    SRCH.update_postings_index(
        _corpus(spark, [(0, "window shuffle spark"), (50, "scan merge")]),
        "text", src,
    )
    import pytest as _p
    with _p.raises(ValueError, match="reindex_postings_index"):
        SRCH.compact_postings_index(spark, src, n_buckets=8)
    with _p.raises(ValueError, match="reindex_postings_index"):
        SRCH.compact_postings_index(spark, src, variant_depth=2)
    path = str(tmp_path / "idx_v2")
    new_stats = SRCH.reindex_postings_index(
        spark, src, path, n_buckets=8, variant_depth=2
    )
    assert (new_stats["n_buckets"], new_stats["variant_depth"]) == (8, 2)
    assert new_stats["committed_gens"] == [0]
    # the source index is untouched (readers keep working mid-reindex)
    src_idx = SRCH.load_postings_index(spark, src)
    assert (src_idx.n_buckets, src_idx.variant_depth) == (4, 1)

    current = dict(rows)
    current.update({0: "window shuffle spark", 50: "scan merge"})
    fresh_path = str(tmp_path / "fresh")
    SRCH.build_postings_index(
        _corpus(spark, sorted(current.items())), "doc_id", "text",
        fresh_path, n_buckets=8, variant_depth=2,
    )
    idx = SRCH.load_postings_index(spark, path)
    fresh = SRCH.load_postings_index(spark, fresh_path)
    assert (idx.n_buckets, idx.variant_depth) == (8, 2)
    for terms in (["spark"], ["merge", "catalog"], ["shuffle"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx, terms, k=40).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, terms, k=40).collect()))
        assert got == want, terms
    # fuzziness=2 now works on the originally-depth-1 index
    assert SRCH.expand_fuzzy_terms(idx, ["spakr"], max_dist=2) == ["spark"]
    # the new bucket layout is physical (partition dirs re-hashed)
    import os as _os
    buckets = {d for d in _os.listdir(path + "/postings") if d.startswith("pbucket=")}
    assert buckets == {f"pbucket={b}" for b in range(8)} & buckets and len(buckets) > 4


def test_bool_query_must_should_must_not(spark, tmp_path):
    """ES bool semantics: all must terms required; should adds score
    but is not required; a must_not hit vetoes even a perfect must
    match; must_not terms never contribute score."""
    docs = _corpus(spark, [
        (1, "a b"),        # must only
        (2, "a b c"),      # must + should -> outranks 1
        (3, "a b c x"),    # must + should but vetoed by x
        (4, "a c"),        # missing must 'b'
        (5, "q r"),        # nothing
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.bm25_bool_query(
        idx, must=["a", "b"], should=["c"], must_not=["x"], k=10
    ).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert set(by_id) == {1, 2}
    assert by_id[2]["n_hit_terms"] == 3 and by_id[1]["n_hit_terms"] == 2
    assert by_id[2]["score_q20"] > by_id[1]["score_q20"]


def test_search_facets_counts_hit_docs_per_value(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "spark x", "web"),
            (2, "spark y", "web"),
            (3, "merge z", "book"),
            (4, "other", "web"),
        ],
        ["doc_id", "text", "source"],
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs.select("doc_id", "text"), "doc_id", "text", path, n_buckets=4
    )
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.search_facets(idx, docs, ["spark", "merge"], "source").collect()
    assert [(r["source"], r["n_docs"]) for r in got] == [("web", 2), ("book", 1)]


def test_suggest_terms_ranks_by_distance_then_frequency(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "spark spark"), (2, "spark stark"), (3, "sparks stark"),
        (4, "spork"), (5, "unrelated"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, variant_depth=2
    )
    idx = SRCH.load_postings_index(spark, path)
    got = [(r["term"], r["dist"], r["df"])
           for r in SRCH.suggest_terms(idx, "spark", k=5, max_dist=2).collect()]
    # exact match first (dist 0), then dist-1 candidates by df desc
    assert got[0] == ("spark", 0, 2)
    assert got[1][1] == 1 and got[1][0] in ("stark", "sparks", "spork")
    dists = [d for _, d, _ in got]
    assert dists == sorted(dists)


def test_significant_terms_finds_cooccurring_term(spark, tmp_path):
    """'b' appears in every 'a' doc but rarely elsewhere -> high JLH;
    the uniform term 'c' scores lower; the query term is excluded."""
    rows = [(i, "a b c") for i in range(5)]
    rows += [(10 + i, "x c") for i in range(20)]
    docs = _corpus(spark, rows)
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.significant_terms(idx, ["a"], m=5, min_fg_df=2).collect()
    terms = [r["term"] for r in got]
    assert "a" not in terms
    assert terms[0] == "b"  # fg% 100, bg% 5/25 -> dominant JLH
    by = {r["term"]: r for r in got}
    assert by["b"]["fg_df"] == 5 and by["b"]["bg_df"] == 5
    assert by["b"]["jlh_q20"] > by["c"]["jlh_q20"]


def test_significant_text_heuristics_hand_counted(spark, tmp_path):
    """6 docs, query 'q' hits docs 0-2. 'z' lives only in the slice
    (a=2,b=1,c=0,d=3 -> chi2 = 36*6/(3*3*4*2) = 3.0); 'w' is MORE
    common outside (2/3 fg vs 3/3 out) so include_negatives=false
    drops it; percentage is fg_df/bg_df; jlh equals the
    significant_terms operator exactly."""
    Q20 = 1 << 20
    docs = _corpus(spark, [
        (0, "q z w"), (1, "q z w"), (2, "q y"),
        (3, "w"), (4, "w"), (5, "w"),
    ])
    path = str(tmp_path / "sigtext")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    chi = {r["term"]: r for r in SRCH.significant_text(
        idx, ["q"], m=10, min_fg_df=2, heuristic="chi_square"
    ).collect()}
    assert set(chi) == {"z"}  # 'w' dropped by include_negatives
    assert chi["z"]["fg_df"] == 2 and chi["z"]["bg_df"] == 2
    assert chi["z"]["score_q20"] == 3 * Q20
    pct = {r["term"]: r["score_q20"] for r in SRCH.significant_text(
        idx, ["q"], m=10, min_fg_df=2, heuristic="percentage"
    ).collect()}
    assert pct["z"] == Q20          # 2/2
    assert pct["w"] == (2 * Q20) // 5  # 2/5
    jlh_text = {(r["term"], r["fg_df"], r["bg_df"], r["score_q20"])
                for r in SRCH.significant_text(
                    idx, ["q"], m=10, min_fg_df=2).collect()}
    jlh_terms = {(r["term"], r["fg_df"], r["bg_df"], r["jlh_q20"])
                 for r in SRCH.significant_terms(
                     idx, ["q"], m=10, min_fg_df=2).collect()}
    assert jlh_text == jlh_terms
    with pytest.raises(ValueError, match="heuristic"):
        SRCH.significant_text(idx, ["q"], heuristic="gnd")


def test_function_score_multiplies_before_quantization(spark, tmp_path):
    """function_score = BM25 * ln(1 + factor), floored ONCE: a
    low-BM25 doc with a big factor outranks a high-BM25 doc with a
    tiny factor, and the scores equal the hand formula against the
    raw probe."""
    import math

    docs = spark.createDataFrame(
        [(1, "spark spark spark", 2), (2, "spark x y", 1000), (3, "z", 5)],
        ["doc_id", "text", "prio"],
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs.select("doc_id", "text"), "doc_id", "text", path, n_buckets=4
    )
    idx = SRCH.load_postings_index(spark, path)
    got = {r["doc_id"]: r for r in SRCH.bm25_function_score(
        idx, docs, ["spark"], "prio", k=10
    ).collect()}
    assert set(got) == {1, 2}
    raw = {r["doc_id"]: r["score_raw"]
           for r in SRCH._bm25_scored_raw(idx, ["spark"], 1.2, 0.75).collect()}
    for i, prio in ((1, 2), (2, 1000)):
        assert got[i]["score_q20"] == math.floor(
            raw[i] * math.log(1.0 + prio) * (1 << 20)
        )
    assert got[2]["score_q20"] > got[1]["score_q20"]  # factor dominates


def test_boosted_bm25_reranks_toward_boosted_term(spark, tmp_path):
    """With equal df/tf structure, boosting 'b' must outrank the
    b-heavy doc over the a-heavy doc (unboosted they tie by
    symmetry), and boost=1 on every term equals the plain probe."""
    docs = _corpus(spark, [(1, "a a c"), (2, "b b c"), (3, "c c c")])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.bm25_topk_boosted(idx, {"a": 1.0, "b": 4.0}, k=10).collect()
    assert got[0]["doc_id"] == 2
    plain = sorted(map(tuple, SRCH.bm25_topk_indexed(idx, ["a", "b"], k=10).collect()))
    unit = sorted(map(tuple, SRCH.bm25_topk_boosted(idx, {"a": 1.0, "b": 1.0}, k=10).collect()))
    assert plain == unit


def test_prefix_expansion_caps_and_scores(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "spark sport"), (2, "spark spark"), (3, "spoon"), (4, "other"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.bm25_topk_prefix(idx, "sp", k=10)
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == {1, 2, 3}
    # expansion cap: with max_expansions=1 only the highest-df term
    # ('spark', df=2) survives
    capped = SRCH.bm25_topk_prefix(idx, "sp", k=10, max_expansions=1)
    assert {r["doc_id"] for r in capped.collect()} == {1, 2}
    # no match -> empty frame with the probe schema
    assert SRCH.bm25_topk_prefix(idx, "zz", k=10).count() == 0


def test_wildcard_expansion_and_translation(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "spark shark"), (2, "spork spork"), (3, "stack"), (4, "other"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    # *ark matches spark + shark (doc 1 only); s??rk matches spark/spork
    assert {r["doc_id"] for r in SRCH.bm25_topk_wildcard(idx, "*ark").collect()} == {1}
    assert {r["doc_id"] for r in SRCH.bm25_topk_wildcard(idx, "s???k").collect()} == {1, 2, 3}
    assert SRCH.bm25_topk_wildcard(idx, "zz*").count() == 0
    # LIKE metacharacters in the pattern are literals, not wildcards
    assert SRCH._wildcard_to_like("a%b_c*d?") == "a\\%b\\_c%d_"


def test_match_phrase_prefix_expands_last_position(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "fast table scan"),
        (2, "fast table scramble"),
        (3, "fast table join"),
        (4, "table scan fast"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.match_phrase_prefix(idx, ["fast", "table"], "sc")
    assert {r["doc_id"] for r in got.collect()} == {1, 2}
    # lexicographic expansion cap: with max_expansions=1 only 'scan'
    # (alphabetically first among sc*) survives
    capped = SRCH.match_phrase_prefix(idx, ["fast", "table"], "sc", max_expansions=1)
    assert {r["doc_id"] for r in capped.collect()} == {1}
    assert SRCH.match_phrase_prefix(idx, ["fast", "table"], "zz").count() == 0


def test_rescore_reranks_only_the_window(spark, tmp_path):
    """Doc 3 wins the base query but has no rescore term; doc 1 is in
    the window and gains the rescore boost, overtaking it. A doc
    outside the window can never enter the result."""
    docs = _corpus(spark, [
        (1, "alpha beta"),
        (2, "alpha gamma"),
        (3, "alpha alpha alpha"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.bm25_rescore(
        idx, ["alpha"], ["beta"], window_size=3, rescore_weight=5.0
    ).collect()
    assert got[0]["doc_id"] == 1
    # window_size=1 keeps only the base winner (doc 3): doc 1 excluded
    top1 = SRCH.bm25_rescore(
        idx, ["alpha"], ["beta"], window_size=1, rescore_weight=5.0
    ).collect()
    assert [r["doc_id"] for r in top1] == [3]
    # zero rescore weight == base order truncated to the window
    base = SRCH.bm25_topk_indexed(idx, ["alpha"], k=3).collect()
    neutral = SRCH.bm25_rescore(
        idx, ["alpha"], ["beta"], window_size=3, rescore_weight=0.0
    ).collect()
    assert [r["doc_id"] for r in neutral] == [r["doc_id"] for r in base]


def test_top_hits_by_facet_ranks_within_buckets(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha", "news"),
            (2, "alpha", "news"),
            (3, "alpha alpha alpha", "blog"),
            (4, "other", "blog"),
        ],
        ["doc_id", "text", "source"],
    )
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + "/idx"
        SRCH.build_postings_index(
            docs.select("doc_id", "text"), "doc_id", "text", path, n_buckets=4
        )
        idx = SRCH.load_postings_index(spark, path)
        got = SRCH.top_hits_by_facet(
            idx, docs, ["alpha"], "source", hits_per_bucket=1
        ).collect()
        by_facet = {r["facet"]: r["doc_id"] for r in got}
        assert by_facet == {"news": 1, "blog": 3}
        assert all(r["rank"] == 1 for r in got)


def test_search_facets_after_pages_in_key_order(spark):
    docs = spark.createDataFrame(
        [(i, "alpha", f"src{i % 4}") for i in range(8)] + [(99, "other", "srcZ")],
        ["doc_id", "text", "source"],
    )
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + "/idx"
        SRCH.build_postings_index(
            docs.select("doc_id", "text"), "doc_id", "text", path, n_buckets=4
        )
        idx = SRCH.load_postings_index(spark, path)
        page1 = SRCH.search_facets_after(idx, docs, ["alpha"], "source", size=2)
        assert [(r["facet"], r["n_docs"]) for r in page1.collect()] == [
            ("src0", 2), ("src1", 2)
        ]
        page2 = SRCH.search_facets_after(
            idx, docs, ["alpha"], "source", size=2, after="src1"
        )
        assert [(r["facet"], r["n_docs"]) for r in page2.collect()] == [
            ("src2", 2), ("src3", 2)
        ]
        # srcZ doc doesn't match the query -> never a bucket
        page3 = SRCH.search_facets_after(
            idx, docs, ["alpha"], "source", size=2, after="src3"
        )
        assert page3.count() == 0


def test_regexp_is_anchored_like_es(spark, tmp_path):
    """'a.b' must match whole terms only — 'axb' yes, 'xaxbx' no
    (an unanchored rlike would match both)."""
    docs = _corpus(spark, [(1, "axb ayb"), (2, "xaxbx"), (3, "ab")])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    assert {r["doc_id"] for r in SRCH.bm25_topk_regexp(idx, "a.b").collect()} == {1}
    # alternation + anchoring together
    got = SRCH.bm25_topk_regexp(idx, "ab|xaxbx")
    assert {r["doc_id"] for r in got.collect()} == {2, 3}
    assert SRCH.bm25_topk_regexp(idx, "zz+").count() == 0


def test_decay_score_at_origin_and_scale(spark):
    """A doc AT the origin keeps its BM25 score exactly; a doc one
    scale away scores ~decay x BM25 (same tf/dl so base scores are
    equal); monotone in distance."""
    import math
    docs = spark.createDataFrame(
        [(1, "alpha x", 100), (2, "alpha y", 300), (3, "alpha z", 500)],
        ["doc_id", "text", "n_val"],
    )
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + "/idx"
        SRCH.build_postings_index(
            docs.select("doc_id", "text"), "doc_id", "text", path, n_buckets=4
        )
        idx = SRCH.load_postings_index(spark, path)
        got = {
            r["doc_id"]: r["score_q20"]
            for r in SRCH.bm25_decay_score(
                idx, docs, ["alpha"], "n_val",
                origin=100.0, scale=200.0, decay=0.5,
            ).collect()
        }
        base = {
            r["doc_id"]: r["score_q20"]
            for r in SRCH.bm25_topk_indexed(idx, ["alpha"], k=10).collect()
        }
        assert got[1] == base[1]  # at origin: decay factor exactly 1
        # one scale away: factor == decay (0.5) within quantization
        assert abs(got[2] - base[2] * 0.5) <= 1
        assert got[1] > got[2] > got[3]


def test_collapse_keeps_one_hit_per_field_value(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha", "a"),
            (2, "alpha alpha", "a"),
            (3, "alpha", "b"),
            (4, "other", "b"),
        ],
        ["doc_id", "text", "source"],
    )
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + "/idx"
        SRCH.build_postings_index(
            docs.select("doc_id", "text"), "doc_id", "text", path, n_buckets=4
        )
        idx = SRCH.load_postings_index(spark, path)
        got = SRCH.bm25_collapse(idx, docs, ["alpha"], "source", k=10).collect()
        assert [(r["doc_id"], r["collapsed"]) for r in got] == [
            (1, "a"), (3, "b")
        ]


def test_snapshot_is_point_in_time_and_restorable(spark, tmp_path):
    """ES snapshot/restore: the copy is frozen at the captured
    committed set — later source updates don't leak in — and the
    restored index accepts its own updates independently."""
    base = [(i, f"alpha w{i % 3}") for i in range(12)]
    src = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    SRCH.build_postings_index(_corpus(spark, base), "doc_id", "text", src, n_buckets=4)
    SRCH.update_postings_index(_corpus(spark, [(20, "alpha beta")]), "text", src)
    before = sorted(map(tuple, SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, src), ["alpha", "beta"], k=30
    ).collect()))

    stats = SRCH.snapshot_postings_index(src, snap)
    assert stats["committed_gens"] == [0, 1]
    import os as _os
    assert not any(f.endswith(".claim") for f in _os.listdir(snap))

    # mutate the SOURCE after the snapshot: the snapshot must not move
    SRCH.update_postings_index(_corpus(spark, [(21, "alpha gamma")]), "text", src)
    got = sorted(map(tuple, SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, snap), ["alpha", "beta"], k=30
    ).collect()))
    assert got == before
    assert SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, snap), ["gamma"], k=5
    ).count() == 0

    # restore-then-update: the snapshot is a full index in its own right
    SRCH.update_postings_index(_corpus(spark, [(22, "alpha delta")]), "text", snap)
    assert SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, snap), ["delta"], k=5
    ).count() == 1


def test_snapshot_excludes_uncommitted_orphans(spark, tmp_path, monkeypatch):
    """A snapshot taken while an update crashed mid-flight carries the
    orphan's data files but NOT its generation in the captured
    committed set — probes of the snapshot never see it (the
    crash-contract extended to snapshots)."""
    src = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    SRCH.build_postings_index(
        _corpus(spark, [(1, "alpha"), (2, "alpha beta")]),
        "doc_id", "text", src, n_buckets=4,
    )
    real_write = SRCH._write_stats

    def exploding_write(p, stats):
        raise OSError("injected crash before index commit")

    monkeypatch.setattr(SRCH_INDEX, "_write_stats", exploding_write)
    import pytest as _p
    with _p.raises(OSError, match="injected crash"):
        SRCH.update_postings_index(_corpus(spark, [(3, "zeta")]), "text", src)
    monkeypatch.setattr(SRCH_INDEX, "_write_stats", real_write)

    stats = SRCH.snapshot_postings_index(src, snap)
    assert stats["committed_gens"] == [0]
    sidx = SRCH.load_postings_index(spark, snap)
    assert SRCH.bm25_topk_indexed(sidx, ["zeta"], k=5).count() == 0
    assert SRCH.bm25_topk_indexed(sidx, ["alpha"], k=5).count() == 2


def test_percolate_min_match_semantics(spark):
    docs = _corpus(spark, [
        (1, "spark merge fast"), (2, "spark only"), (3, "other words"),
    ])
    queries = spark.createDataFrame(
        [
            ("both", ["spark", "merge"], 2),     # conjunctive
            ("any", ["spark", "merge"], 1),      # disjunctive
            ("two_of", ["spark", "merge", "fast"], 2),
        ],
        "query_id STRING, terms ARRAY<STRING>, min_match INT",
    )
    got = {
        (r["doc_id"], r["query_id"]): r["n_matched"]
        for r in SRCH.percolate(docs, "doc_id", "text", queries).collect()
    }
    assert set(got) == {(1, "both"), (1, "any"), (1, "two_of"), (2, "any")}
    assert got[(1, "both")] == 2 and got[(2, "any")] == 1
    # duplicate terms in a doc count once (distinct matching)
    dup_doc = _corpus(spark, [(9, "spark spark spark")])
    got2 = SRCH.percolate(dup_doc, "doc_id", "text", queries).collect()
    assert {(r["doc_id"], r["query_id"]) for r in got2} == {(9, "any")}


def test_term_vectors_tf_and_df_from_stored_state(spark, tmp_path):
    docs = _corpus(spark, [
        (1, "alpha alpha beta"), (2, "alpha gamma"), (3, "beta beta"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = {r["term"]: (r["tf"], r["df"]) for r in SRCH.term_vectors(idx, 1).collect()}
    assert got == {"alpha": (2, 2), "beta": (1, 2)}
    assert SRCH.term_vectors(idx, 99).count() == 0


def test_index_alias_swaps_atomically(spark, tmp_path):
    """ES alias cutover: probes through the alias see index A, then
    after one set_index_alias call index B — resolution is a file
    read, the swap one rename."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    alias = str(tmp_path / "docs.alias")
    SRCH.build_postings_index(
        _corpus(spark, [(1, "alpha")]), "doc_id", "text", a, n_buckets=2
    )
    SRCH.build_postings_index(
        _corpus(spark, [(2, "beta")]), "doc_id", "text", b, n_buckets=2
    )
    SRCH.set_index_alias(alias, a)
    assert SRCH.resolve_index_alias(alias) == a
    idx = SRCH.load_postings_index_by_alias(spark, alias)
    assert SRCH.bm25_topk_indexed(idx, ["alpha"], k=5).count() == 1
    SRCH.set_index_alias(alias, b)  # the cutover
    idx2 = SRCH.load_postings_index_by_alias(spark, alias)
    assert SRCH.bm25_topk_indexed(idx2, ["beta"], k=5).count() == 1
    assert SRCH.bm25_topk_indexed(idx2, ["alpha"], k=5).count() == 0
    # the already-resolved handle keeps serving the OLD index
    assert SRCH.bm25_topk_indexed(idx, ["alpha"], k=5).count() == 1


def test_phrase_suggester_ranks_by_bigram_frequency(spark, tmp_path):
    """'fsat tabel' must suggest 'fast table' (frequent bigram) above
    'fast cable' (rarer) even though both are within distance; a slot
    with no dictionary neighbor yields no suggestions."""
    docs = _corpus(spark, [
        (1, "fast table fast table fast table"),
        (2, "fact table"),
        (3, "table fast"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4,
                              variant_depth=2)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.suggest_phrase(idx, ["fsat", "tabel"], k=5, max_dist=2).collect()
    # lev(fsat,fast)=2 and lev(fsat,fact)=2; bigram frequency decides
    assert [(r["suggestion"], r["n_occurrences"]) for r in got] == [
        ("fast table", 3), ("fact table", 1)
    ]
    assert got[0]["dist_sum"] == 2 + 2
    # doc 3's reversed order contributes no chain
    assert SRCH.suggest_phrase(idx, ["zzzzzz", "tabel"], k=5, max_dist=2).count() == 0


def test_explain_score_breakdown_matches_probe(spark, tmp_path):
    """The explain rows' raw sum reproduces the ranking probe's score
    (within per-term quantization), and tf/df/dl are exact."""
    docs = _corpus(spark, [
        (1, "alpha alpha beta"), (2, "alpha gamma"), (3, "beta beta"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    rows = {r["term"]: r for r in SRCH.explain_score(idx, 1, ["alpha", "beta"]).collect()}
    assert rows["alpha"]["tf"] == 2 and rows["alpha"]["df"] == 2
    assert rows["beta"]["tf"] == 1 and rows["beta"]["dl"] == 3
    probe = {r["doc_id"]: r["score_q20"] for r in
             SRCH.bm25_topk_indexed(idx, ["alpha", "beta"], k=10).collect()}
    total = sum(r["term_score_q20"] for r in rows.values())
    # each term floored independently -> within n_terms of the probe
    assert 0 <= probe[1] - total <= len(rows)
    assert SRCH.explain_score(idx, 99, ["alpha"]).count() == 0


def test_hybrid_rrf_fuses_ranks_symmetrically(spark, tmp_path):
    """Text leg ranks doc2 first, kNN leg ranks doc1 first: RRF ties
    them (1/61+1/62 each) and the id tiebreak puts doc1 on top;
    a doc present in only one leg ranks below both."""
    docs = _corpus(spark, [
        (1, "alpha beta"), (2, "alpha alpha alpha"), (3, "other"),
    ])
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
            (9, [1.0, 0.0]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.hybrid_rrf_search(idx, emb, ["alpha"], 9, k=10).collect()
    assert [r["doc_id"] for r in got] == [1, 2, 3]
    assert got[0]["rrf_q20"] == got[1]["rrf_q20"]  # symmetric fusion tie
    assert (got[0]["text_rank"], got[0]["knn_rank"]) == (2, 1)
    assert got[2]["text_rank"] is None and got[2]["knn_rank"] == 3


def test_msearch_matches_individual_probes(spark, tmp_path):
    """Each query's msearch slice equals its standalone bm25 top-k."""
    docs = _corpus(spark, [
        (1, "spark join shuffle join"),
        (2, "spark filter scan"),
        (3, "join join join broadcast"),
        (4, "scan scan filter pushdown spark"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    batch = {"q_spark": ["spark", "join"], "q_scan": ["scan"]}
    got = SRCH.bm25_msearch(idx, batch, k=3).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_hit_terms"], r["score_q20"])
        )
    for qid, terms in batch.items():
        solo = [
            (r["doc_id"], r["n_hit_terms"], r["score_q20"])
            for r in SRCH.bm25_topk_indexed(idx, terms, k=3).collect()
        ]
        assert by_q[qid] == solo, qid


# --- round-10: analyzer chain (lowercase / punct-strip / stopwords) --------


_AN = None


def _analyzer():
    global _AN
    if _AN is None:
        _AN = SRCH.Analyzer(
            lowercase=True, strip_punct=True, stopwords=("a", "the")
        )
    return _AN


def test_analyzer_applied_identically_at_ingest_and_query(spark, tmp_path):
    """The one invariant a search engine lives by: 'SPARK,' at ingest
    and 'Spark!' at query time meet at the same stored term. Stopwords
    leave position gaps (phrase slop over survivors unchanged), dl
    counts kept tokens only, and the python query-side twin is
    byte-identical to the ingest chain."""
    docs = _corpus(spark, [
        (1, "The SPARK, engine! runs"),
        (2, "a spark engine"),
        (3, "other words entirely"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, analyzer=_analyzer()
    )
    idx = SRCH.load_postings_index(spark, path)
    assert idx.analyzer == _analyzer()
    # query-side analysis: raw user input -> stored-term space
    terms = idx.analyze_terms(["Spark!", "THE", "engine"])
    assert terms == ["spark", "engine"]  # stopword dropped
    got = {r["doc_id"]: r["n_hit_terms"]
           for r in SRCH.bm25_topk_indexed(idx, terms, k=10).collect()}
    assert got == {1: 2, 2: 2}
    # dl = kept tokens (doc 1: the/a dropped -> 3 kept; doc 2 -> 2)
    import pyspark.sql.functions as _F
    dls = {r["doc_id"]: r["dl"] for r in
           spark.read.parquet(path + "/docstats").collect()}
    assert dls == {1: 3, 2: 2, 3: 3}
    # positions keep their slots: doc 1 'spark' at slot 1, 'engine' 2
    pos = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in idx.live_postings_for(["spark", "engine"]).collect()
    }
    assert pos[(1, "spark")] == [1] and pos[(1, "engine")] == [2]
    # phrase over survivors: 'spark engine' adjacent in BOTH docs
    hits = SRCH.phrase_slop_search(idx, ["spark", "engine"], slop=0)
    assert {r["doc_id"] for r in hits.collect()} == {1, 2}
    # ingest through update applies the SAME stored chain
    SRCH.update_postings_index(
        _corpus(spark, [(9, "THE Spark? engine.")]), "text", path
    )
    idx2 = SRCH.load_postings_index(spark, path)
    got2 = {r["doc_id"] for r in
            SRCH.bm25_topk_indexed(idx2, ["spark"], k=10).collect()}
    assert 9 in got2


def test_analyzer_reindex_upgrade_matches_from_birth(spark, tmp_path):
    """reindex_postings_index(analyzer=...) upgrades a legacy
    exact-token index from stored postings alone; every probe answer
    must equal an analyzed-from-birth build on the same raw text,
    including merged terms (The/the), dl, scalars, and the fuzzy
    dictionary."""
    rows = [
        (1, "The SPARK, engine! runs fast"),
        (2, "a spark engine runs"),
        (3, "THE the a a"),          # every token drops -> dl 0
        (4, "merge, MERGE merge."),  # three instances fold into one term
    ]
    docs = _corpus(spark, rows)
    legacy, upgraded, birth = (
        str(tmp_path / "legacy"), str(tmp_path / "up"), str(tmp_path / "birth")
    )
    SRCH.build_postings_index(docs, "doc_id", "text", legacy, n_buckets=4)
    SRCH.reindex_postings_index(
        spark, legacy, upgraded, analyzer=_analyzer()
    )
    SRCH.build_postings_index(
        docs, "doc_id", "text", birth, n_buckets=4, analyzer=_analyzer()
    )
    up = SRCH.load_postings_index(spark, upgraded)
    fb = SRCH.load_postings_index(spark, birth)
    assert (up.n_docs, up.total_dl) == (fb.n_docs, fb.total_dl)
    assert up.analyzer == _analyzer()
    for terms in (["spark"], ["merge"], ["engine", "runs"], ["fast"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(up, terms, k=10).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fb, terms, k=10).collect()))
        assert got == want, terms
    # merged postings: doc 4's three 'merge' instances -> tf 3, slots 0..2
    p = {(r["doc_id"], r["term"]): (r["tf"], list(r["positions"]), r["dl"])
         for r in up.live_postings_for(["merge"]).collect()}
    assert p[(4, "merge")] == (3, [0, 1, 2], 3)
    # all-dropped doc kept with dl 0
    dls = {r["doc_id"]: r["dl"] for r in
           __import__("pyspark").sql.SparkSession.getActiveSession()
           .read.parquet(upgraded + "/docstats").collect()}
    assert dls[3] == 0
    # fuzzy dictionary rebuilt over analyzed terms (depth-1 typo)
    assert SRCH.expand_fuzzy_terms(up, ["spak"], max_dist=1) == ["spark"]
    # changing the chain on an ALREADY-analyzed index is refused
    import pytest as _p
    with _p.raises(ValueError, match="compound"):
        SRCH.reindex_postings_index(
            spark, upgraded, str(tmp_path / "nope"),
            analyzer=SRCH.Analyzer(lowercase=False, strip_punct=True),
        )


def test_legacy_index_unchanged_by_analyzer_machinery(spark, tmp_path):
    """analyzer=None is byte-stable legacy behavior: stats carry
    analyzer null, dl keeps the historical slot count, and
    analyze_terms is the identity."""
    docs = _corpus(spark, [(1, "Spark SPARK x")])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    assert idx.analyzer is None
    assert idx.analyze_terms(["Spark!"]) == ["Spark!"]
    # case-sensitive: 'Spark' and 'SPARK' are distinct terms
    assert SRCH.bm25_topk_indexed(idx, ["Spark"], k=5).count() == 1
    assert SRCH.bm25_topk_indexed(idx, ["spark"], k=5).count() == 0


def test_snapshot_is_incremental_via_hard_links(spark, tmp_path):
    """ES-style incremental snapshots: data files are hard-linked, not
    copied — a snapshot after one delta ingest allocates new storage
    only for stats.json (every data inode is shared with the source /
    the previous snapshot), and the restored index answers exactly
    like the live one even after the source is later compacted (links
    keep inodes alive past the rmtree)."""
    import os as _os

    def data_inodes(root):
        out = {}
        for dirpath, _, files in _os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = _os.path.join(dirpath, f)
                    out[_os.stat(p).st_ino] = p
        return out

    docs = _corpus(spark, [(i, f"alpha w{i % 5} snap") for i in range(20)])
    src = str(tmp_path / "idx")
    s1, s2 = str(tmp_path / "snap1"), str(tmp_path / "snap2")
    SRCH.build_postings_index(docs, "doc_id", "text", src, n_buckets=4)
    SRCH.snapshot_postings_index(src, s1)
    SRCH.update_postings_index(
        _corpus(spark, [(100, "beta alpha"), (0, "gamma w0")]), "text", src
    )
    SRCH.snapshot_postings_index(src, s2)

    src_ino, s1_ino, s2_ino = data_inodes(src), data_inodes(s1), data_inodes(s2)
    # every snapshot data file is a hard link (no bytes copied)
    for ino, p in {**s1_ino, **s2_ino}.items():
        assert _os.stat(p).st_nlink >= 2, p
    # snapshot 2 = snapshot 1's inodes + ONLY the delta's new files
    assert set(s1_ino) <= set(s2_ino)
    new = set(s2_ino) - set(s1_ino)
    assert new == set(src_ino) - set(s1_ino)
    assert len(new) >= 1  # the delta really added files

    # point-in-time truth: s1 ranks like the pre-delta corpus
    before = SRCH.load_postings_index(spark, s1)
    assert SRCH.bm25_topk_indexed(before, ["beta"], k=5).count() == 0
    # s2 matches the live index...
    live = SRCH.load_postings_index(spark, src)
    want = sorted(map(tuple,
        SRCH.bm25_topk_indexed(live, ["alpha", "beta"], k=30).collect()))
    after = SRCH.load_postings_index(spark, s2)
    got = sorted(map(tuple,
        SRCH.bm25_topk_indexed(after, ["alpha", "beta"], k=30).collect()))
    assert got == want
    # ...and SURVIVES the source's later compaction (rmtree of the
    # linked files' original paths)
    SRCH.compact_postings_index(spark, src)
    again = sorted(map(tuple,
        SRCH.bm25_topk_indexed(
            SRCH.load_postings_index(spark, s2), ["alpha", "beta"], k=30
        ).collect()))
    assert again == want



# --- round-10: the ES _search request-body dispatcher ----------------------


class TestEsSearchApi:
    @staticmethod
    def _idx(spark, tmp_path):
        docs = _corpus(spark, [
            (1, "The SPARK, engine runs fast"),
            (2, "a spark engine runs"),
            (3, "merge window scan"),
            (4, "spark scan merge"),
        ])
        path = str(tmp_path / "api_idx")
        SRCH.build_postings_index(
            docs, "doc_id", "text", path, n_buckets=4,
            analyzer=SRCH.Analyzer(
                lowercase=True, strip_punct=True, stopwords=("a", "the")
            ),
        )
        return SRCH.load_postings_index(spark, path), docs

    def test_body_maps_to_operator_results(self, spark, tmp_path):
        """Each supported body shape must return exactly what the
        underlying operator returns — the dispatcher adds no Spark
        work of its own."""
        from pycasselastic_spark.operators.search_api import es_search

        idx, docs = self._idx(spark, tmp_path)

        def rows(df):
            return sorted(map(tuple, df.collect()))

        # match analyzes the query string through the stored chain
        got = rows(es_search(idx, {"query": {"match": {"text": "Spark! THE engine"}}}))
        want = rows(SRCH.bm25_topk_indexed(idx, ["spark", "engine"], k=10))
        assert got == want and len(got) >= 2
        # term is exact (no analysis): uppercase misses
        assert es_search(idx, {"query": {"term": {"text": "SPARK"}}}).count() == 0
        # bool with must/must_not
        got = rows(es_search(idx, {"query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "must_not": [{"term": {"text": "window"}}],
        }}}))
        want = rows(SRCH.bm25_bool_query(idx, must=["spark"], must_not=["window"], k=10))
        assert got == want
        # match_phrase with slop
        got = rows(es_search(idx, {"query": {"match_phrase": {
            "text": {"query": "spark engine", "slop": 0}}}}))
        want = rows(SRCH.phrase_slop_search(idx, ["spark", "engine"], slop=0))
        assert got == want and len(got) == 2
        # fuzziness + minimum_should_match + size + search_after
        got = rows(es_search(idx, {"query": {"match": {
            "text": {"query": "spak", "fuzziness": 1}}}}))
        want = rows(SRCH.bm25_topk_fuzzy(idx, ["spak"], max_dist=1, k=10))
        assert got == want and len(got) >= 2
        page1 = es_search(idx, {"query": {"match": {"text": "spark"}}, "size": 1}).collect()
        page2 = es_search(idx, {
            "query": {"match": {"text": "spark"}}, "size": 1,
            "search_after": [page1[0]["score_q20"], page1[0]["doc_id"]],
        }).collect()
        assert page2 and (page2[0]["doc_id"] != page1[0]["doc_id"])
        # aggs: terms facet (+ top_hits) against the docs frame
        facet_docs = docs.withColumn("src", F.col("doc_id") % 2)
        got = rows(es_search(idx, {
            "query": {"match": {"text": "spark scan"}},
            "aggs": {"by_src": {"terms": {"field": "src"}}},
        }, docs=facet_docs))
        want = rows(SRCH.search_facets(idx, facet_docs, ["spark", "scan"], "src", k=10))
        assert got == want
        got = rows(es_search(idx, {
            "query": {"match": {"text": "spark scan"}},
            "aggs": {"by_src": {"terms": {"field": "src"},
                                 "aggs": {"best": {"top_hits": {"size": 2}}}}},
        }, docs=facet_docs))
        want = rows(SRCH.top_hits_by_facet(idx, facet_docs, ["spark", "scan"], "src", hits_per_bucket=2))
        assert got == want

    def test_unsupported_features_raise_loudly(self, spark, tmp_path):
        from pycasselastic_spark.operators.search_api import es_search

        idx, docs = self._idx(spark, tmp_path)
        import pytest as _p
        for body, frag in [
            # span_near/span_first are dispatched since round 13 —
            # script_score is the representative unsupported type
            # (no sandboxed script engine here), and an empty
            # span_near raises its own named error
            ({"query": {"script_score": {"script": "1"}}}, "query type"),
            ({"query": {"span_near": {"clauses": []}}},
             "at least two clauses"),
            ({"query": {"match": {"text": "x"}}, "highlight": {}}, "highlight"),
            # filter IS supported, but only in the simple must+filter
            # shape — combining it with must_not/should raises rather
            # than silently approximating ES's composed semantics
            ({"query": {"bool": {
                "filter": [{"term": {"source": "web"}}],
                "must_not": [{"term": {"text": "x"}}],
            }}}, "filter combined"),
            ({"query": {"bool": {"filter": [
                {"range": {"n_chars": {"gte": 1, "boost": 2}}},
            ]}}}, "range options"),
            # exists/nested ARE dispatched in filter context since
            # round 12 (this fixture just stores no doc values) — a
            # script filter is the representative still-unsupported
            # clause type
            ({"query": {"bool": {"filter": [
                {"exists": {"field": "n_chars"}},
            ]}}}, "stores no doc values"),
            ({"query": {"bool": {"filter": [
                {"script": {"script": "doc['n'].value > 1"}},
            ]}}}, "filter clause type"),
            # operator=and IS dispatched now (conjunctive probe) —
            # an unknown operator value is the strict case
            ({"query": {"match": {"text": {"query": "x", "operator": "xor"}}}}, "operator"),
            ({"query": {"term": {"text": "x"}}, "search_after": [0, 0]}, "search_after"),
        ]:
            with _p.raises(ValueError, match=frag):
                es_search(idx, body, docs=docs)


def test_docvalues_filter_context(spark, tmp_path):
    """Stored doc-values serve ES filter-context queries end-to-end:
    range/term predicates push into the docvalues scan, filters never
    change scores, delta ingests keep doc values LWW-current, and
    compaction/snapshot/reindex carry the relation."""
    rows = [
        (i, f"spark merge w{i % 4}", i * 10, "web" if i % 2 else "pdf")
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars", "source"])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["n_chars", "source"],
    )
    idx = SRCH.load_postings_index(spark, path)
    assert idx.stored_fields == ("n_chars", "source")
    got = SRCH.bm25_topk_filtered(
        idx, ["spark"], [("n_chars", ">=", 40), ("source", "=", "web")], k=20
    ).collect()
    assert sorted(r["doc_id"] for r in got) == [5, 7, 9, 11]
    # scores match the unfiltered probe exactly (filters never score)
    unf = {r["doc_id"]: r["score_q20"]
           for r in SRCH.bm25_topk_indexed(idx, ["spark"], k=20).collect()}
    assert all(r["score_q20"] == unf[r["doc_id"]] for r in got)
    # the es_search bool+filter body dispatches to the same result
    from pycasselastic_spark.operators.search_api import es_search
    via_api = es_search(idx, {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"range": {"n_chars": {"gte": 40}}},
                    {"term": {"source": "web"}}],
    }}, "size": 20}).collect()
    assert sorted(map(tuple, via_api)) == sorted(map(tuple, got))
    # delta re-ingest updates the doc's values (LWW supersede)
    delta = spark.createDataFrame(
        [(5, "spark merge w1", 5, "pdf")],
        ["doc_id", "text", "n_chars", "source"],
    )
    SRCH.update_postings_index(delta, "text", path)
    idx2 = SRCH.load_postings_index(spark, path)
    got2 = {r["doc_id"] for r in SRCH.bm25_topk_filtered(
        idx2, ["spark"], [("n_chars", ">=", 40), ("source", "=", "web")], k=20
    ).collect()}
    assert got2 == {7, 9, 11}  # doc 5 now n_chars=5/pdf -> filtered out
    # compaction and snapshot carry the relation
    SRCH.compact_postings_index(spark, path)
    snap = str(tmp_path / "snap")
    SRCH.snapshot_postings_index(path, snap)
    for p in (path, snap):
        idx3 = SRCH.load_postings_index(spark, p)
        got3 = {r["doc_id"] for r in SRCH.bm25_topk_filtered(
            idx3, ["spark"], [("n_chars", ">=", 40), ("source", "=", "web")],
            k=20,
        ).collect()}
        assert got3 == {7, 9, 11}, p
    # reindex (re-bucket) carries it too, re-hashed to the new modulus
    v2 = str(tmp_path / "v2")
    SRCH.reindex_postings_index(spark, path, v2, n_buckets=8)
    idx4 = SRCH.load_postings_index(spark, v2)
    got4 = {r["doc_id"] for r in SRCH.bm25_topk_filtered(
        idx4, ["spark"], [("n_chars", ">=", 40)], k=20).collect()}
    assert got4 == {4, 6, 7, 8, 9, 10, 11}
    # unknown field / missing docvalues raise loudly
    import pytest as _p
    with _p.raises(ValueError, match="not stored"):
        SRCH.bm25_topk_filtered(idx4, ["spark"], [("nope", ">=", 1)])
    bare = str(tmp_path / "bare")
    SRCH.build_postings_index(docs, "doc_id", "text", bare, n_buckets=4)
    with _p.raises(ValueError, match="stored_fields"):
        SRCH.load_postings_index(spark, bare).live_docvalues()


def test_analyzer_regex_tokenizer_parity(spark, tmp_path):
    """Analyzer(split_regex=r'\\s+'): the tokenizer is an index setting
    too. Multi-space/tab text must tokenize identically on the Spark
    ingest side and the Python query-side twin (slots, dl, terms), and
    match queries through analyze_text find the docs."""
    an = SRCH.Analyzer(
        lowercase=True, strip_punct=True, stopwords=("the",),
        split_regex=r"\s+",
    )
    docs = spark.createDataFrame(
        [(1, "The  SPARK,\tengine   runs"), (2, "spark\t\tengine")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, analyzer=an
    )
    idx = SRCH.load_postings_index(spark, path)
    assert idx.analyzer.split_regex == r"\s+"
    # query text with messy whitespace analyzes to the stored terms
    assert idx.analyze_text("THE  Spark!\tengine") == ["spark", "engine"]
    got = {r["doc_id"]: r["n_hit_terms"] for r in SRCH.bm25_topk_indexed(
        idx, idx.analyze_text("THE  Spark!\tengine"), k=10).collect()}
    assert got == {1: 2, 2: 2}
    # dl = kept tokens under the regex split ('the' dropped in doc 1)
    dls = {r["doc_id"]: r["dl"] for r in
           spark.read.parquet(path + "/docstats").collect()}
    assert dls == {1: 3, 2: 2}
    # positions are regex-split slots: Spark side == Python twin
    import re
    for doc_id, text in [(1, "The  SPARK,\tengine   runs")]:
        py_slots = [
            i for i, t in enumerate(re.split(r"\s+", text))
            if an.apply_py(t) == "spark"
        ]
        stored = idx.live_postings_for(["spark"]).filter(
            F.col("doc_id") == doc_id).collect()[0]
        assert list(stored["positions"]) == py_slots
    # phrase adjacency works across the regex slots
    assert {r["doc_id"] for r in SRCH.phrase_slop_search(
        idx, ["spark", "engine"], slop=0).collect()} == {1, 2}


def test_stats_and_histogram_aggs_from_docvalues(spark, tmp_path):
    """ES stats/histogram metric aggregations served from stored
    doc-values: exact min/max/sum, Q20 avg, floor-bucket law, and the
    es_search aggs dispatch — all without a docs frame."""
    rows = [(i, "spark" if i % 2 else "other", i * 10) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, stored_fields=["n_chars"]
    )
    idx = SRCH.load_postings_index(spark, path)
    # hits: odd ids -> n_chars 10,30,50,70,90
    s = SRCH.search_stats_agg(idx, ["spark"], "n_chars").collect()[0]
    assert (s["n_docs"], s["min_val"], s["max_val"], s["sum_val"]) == (
        5, 10, 90, 250)
    assert s["avg_q20"] == int(50.0 * (1 << 20))
    h = {r["bucket"]: r["n_docs"] for r in
         SRCH.search_histogram_agg(idx, ["spark"], "n_chars", 40).collect()}
    assert h == {0.0: 2, 40.0: 2, 80.0: 1}  # 10,30 | 50,70 | 90
    # es_search dispatch, no docs frame needed
    from pycasselastic_spark.operators.search_api import es_search
    via = es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"c": {"stats": {"field": "n_chars"}}},
    }).collect()[0]
    assert tuple(via) == tuple(s)
    via_h = {r["bucket"]: r["n_docs"] for r in es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"c": {"histogram": {"field": "n_chars", "interval": 40}}},
    }).collect()}
    assert via_h == h
    import pytest as _p
    with _p.raises(ValueError, match="not stored"):
        SRCH.search_stats_agg(idx, ["spark"], "nope")


def test_sort_by_field_and_analyzed_percolate(spark, tmp_path):
    """Field sort from stored doc-values (scores disabled, id
    tiebreak), and the percolator under an analyzer (docs tokenize
    through the same chain the stored queries speak)."""
    rows = [(i, "spark engine" if i % 2 else "other", 100 - i) for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, stored_fields=["n_chars"]
    )
    idx = SRCH.load_postings_index(spark, path)
    got = [(r["doc_id"], r["n_chars"]) for r in
           SRCH.search_sort_by_field(idx, ["spark"], "n_chars", False, 3).collect()]
    assert got == [(1, 99), (3, 97), (5, 95)]
    from pycasselastic_spark.operators.search_api import es_search
    via = [(r["doc_id"], r["n_chars"]) for r in es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "sort": [{"n_chars": "desc"}], "size": 3,
    }).collect()]
    assert via == got
    import pytest as _p
    with _p.raises(ValueError, match="sort direction"):
        es_search(idx, {"query": {"match": {"text": "x"}},
                         "sort": [{"n_chars": "down"}]})
    # analyzed percolation: 'SPARK,' in a doc matches the stored
    # query term 'spark' once the doc side runs the chain
    an = SRCH.Analyzer(lowercase=True, strip_punct=True)
    messy = spark.createDataFrame(
        [(1, "The SPARK, engine!"), (2, "nothing here")],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame(
        [("q1", ["spark", "engine"], 2)],
        "query_id STRING, terms ARRAY<STRING>, min_match INT",
    )
    got = SRCH.percolate(messy, "doc_id", "text", queries, analyzer=an).collect()
    assert [(r["doc_id"], r["query_id"]) for r in got] == [(1, "q1")]
    # without the analyzer the messy doc does NOT match
    assert SRCH.percolate(messy, "doc_id", "text", queries).count() == 0


# ---------------------------------------------------------------------------
# ROUND 11: advisor-finding regression tests — per-clause bool.must
# semantics, strict match-option combinations, guarded rescore
# broadcast, analyzer-aware highlighting, streaming bootstrap settings.
# ---------------------------------------------------------------------------


def test_bool_query_multi_term_match_clause_is_or_within(spark, tmp_path):
    """ES semantics: a multi-term match clause inside ``must`` is
    satisfied when ANY of its analyzed terms occurs (default operator
    OR) — flattening it into per-term conjunction silently returned a
    strict subset (round-10 advisor finding). Flat string elements
    keep the historical every-term-required behavior."""
    docs = _corpus(spark, [
        (1, "quick brown fox"),
        (2, "quick dog"),
        (3, "brown bear"),
        (4, "slow snail"),
        (5, "quick brown dog x"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)

    # one clause ['quick','brown'] -> any of the two suffices
    got = SRCH.bm25_bool_query(idx, must=[["quick", "brown"]], k=10).collect()
    assert {r["doc_id"] for r in got} == {1, 2, 3, 5}
    # flat list -> per-term conjunction, unchanged historical behavior
    got = SRCH.bm25_bool_query(idx, must=["quick", "brown"], k=10).collect()
    assert {r["doc_id"] for r in got} == {1, 5}
    # two multi-term clauses AND-compose; must_not still vetoes
    got = SRCH.bm25_bool_query(
        idx, must=[["quick", "slow"], ["brown", "dog"]], must_not=["x"], k=10
    ).collect()
    assert {r["doc_id"] for r in got} == {1, 2}
    # scoring sums over ALL matched scoring terms (clause OR never
    # drops a matched term's contribution): doc 1 matched both terms
    one = {r["doc_id"]: r for r in
           SRCH.bm25_bool_query(idx, must=[["quick", "brown"]], k=10).collect()}
    assert one[1]["n_hit_terms"] == 2

    # es_search passes the clause structure through
    from pycasselastic_spark.operators.search_api import es_search
    via = es_search(idx, {"query": {"bool": {
        "must": [{"match": {"text": "quick brown"}}],
    }}, "size": 10}).collect()
    assert {r["doc_id"] for r in via} == {1, 2, 3, 5}


def test_es_search_match_option_combinations_raise(spark, tmp_path):
    """search_after combined with match options would silently re-serve
    page one (the cursor never reached the fuzzy/min-match probes), and
    fuzziness+minimum_should_match together would drop one option —
    both now raise naming the feature (round-10 advisor finding)."""
    import pytest as _p

    from pycasselastic_spark.operators.search_api import es_search

    docs = _corpus(spark, [(1, "spark engine"), (2, "spark runs")])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)

    with _p.raises(ValueError, match="search_after combined with match"):
        es_search(idx, {
            "query": {"match": {"text": {"query": "spak", "fuzziness": 1}}},
            "search_after": [100, 1],
        })
    with _p.raises(ValueError, match="search_after combined with match"):
        es_search(idx, {
            "query": {"match": {"text": {
                "query": "spark engine", "minimum_should_match": 1}}},
            "search_after": [100, 1],
        })
    with _p.raises(ValueError, match="BOTH fuzziness and minimum"):
        es_search(idx, {"query": {"match": {"text": {
            "query": "spark", "fuzziness": 1, "minimum_should_match": 1}}}})
    # a multi-term match clause alongside filter context raises (the
    # filter probe's min_match dial is per-term, not per-clause)
    path2 = str(tmp_path / "idx2")
    dv = spark.createDataFrame(
        [(1, "spark engine", 10)], ["doc_id", "text", "n_chars"]
    )
    SRCH.build_postings_index(
        dv, "doc_id", "text", path2, n_buckets=4, stored_fields=["n_chars"]
    )
    idx2 = SRCH.load_postings_index(spark, path2)
    with _p.raises(ValueError, match="multi-term match clause"):
        es_search(idx2, {"query": {"bool": {
            "must": [{"match": {"text": "spark engine"}}],
            "filter": [{"range": {"n_chars": {"gte": 5}}}],
        }}})
    # an all-stopword must clause raises instead of returning empty
    an_path = str(tmp_path / "idx3")
    SRCH.build_postings_index(
        docs, "doc_id", "text", an_path, n_buckets=4,
        analyzer=SRCH.Analyzer(stopwords=("the",)),
    )
    idx3 = SRCH.load_postings_index(spark, an_path)
    with _p.raises(ValueError, match="no terms"):
        es_search(idx3, {"query": {"bool": {
            "must": [{"match": {"text": "the"}}]}}})


def test_highlight_snippets_analyzer_aware_offsets(spark, tmp_path):
    """Stored positions are slots of the index's tokenizer split; an
    index built with split_regex=r'\\s+' must slice the raw text in
    the SAME slot space or snippets cut at wrong offsets on
    multi-space/tab text (round-10 advisor finding)."""
    docs = _corpus(spark, [(1, "alpha  beta\tgamma target delta end")])
    path = str(tmp_path / "idx")
    an = SRCH.Analyzer(
        lowercase=True, strip_punct=True, split_regex=r"\s+"
    )
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, analyzer=an
    )
    idx = SRCH.load_postings_index(spark, path)
    got = SRCH.highlight_snippets(idx, docs, "text", ["target"], window=2)
    row = got.collect()[0]
    # regex-split slots: alpha=0 beta=1 gamma=2 target=3 -> snippet
    # starts AT the match in slot space, showing the raw tokens there
    assert row["first_pos"] == 3
    assert row["snippet"] == "target delta"


def test_streaming_bootstrap_carries_analyzer_and_docvalues(spark, tmp_path):
    """A streaming-born index (first micro-batch bootstraps) must be
    able to carry an analyzer and stored_fields (round-10 advisor
    finding: the bootstrap branch pinned both to None forever); a
    later conflicting setting raises instead of silently diverging."""
    import pytest as _p

    an = SRCH.Analyzer(lowercase=True, strip_punct=True)
    rows = [(i, f"The W{i % 5}, common", i * 10) for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    src = str(tmp_path / "src")
    docs.repartition(2).write.parquet(src)
    path = str(tmp_path / "idx")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = SRCH.start_streaming_index_maintenance(
        stream, "doc_id", "text", path, str(tmp_path / "ckpt"),
        n_buckets=4, analyzer=an, stored_fields=["n_chars"],
    )
    q.awaitTermination()
    idx = SRCH.load_postings_index(spark, path)
    assert idx.analyzer == an and idx.stored_fields == ("n_chars",)
    # the analyzed probe sees chain-normalized terms from every batch
    got = SRCH.bm25_topk_indexed(idx, ["w3"], k=50).collect()
    assert {r["doc_id"] for r in got} == {3, 8, 13, 18}
    # filter context works on the streaming-born doc-values
    f = SRCH.bm25_topk_filtered(
        idx, ["common"], [("n_chars", ">=", 150)], k=50
    ).collect()
    assert {r["doc_id"] for r in f} == {15, 16, 17, 18, 19}
    # conflicting settings on a LATER ingest raise loudly
    with _p.raises(ValueError, match="analyzer differs"):
        SRCH.ingest_into_postings_index(
            docs.limit(1), "doc_id", "text", path, n_buckets=4,
            analyzer=SRCH.Analyzer(lowercase=False),
        )
    with _p.raises(ValueError, match="stored_fields differ"):
        SRCH.ingest_into_postings_index(
            docs.limit(1), "doc_id", "text", path, n_buckets=4,
            stored_fields=["doc_id"],
        )


def test_analyzer_stem_and_synonym_stages(spark, tmp_path):
    """Round-11 chain stages: the S-stemmer folds -ies/-es/-s suffixes
    (with the us/ss/aes/ees/oes/eies/aies exclusions and the len>=4
    guard), synonyms rewrite sequentially in rule order (a later rule
    sees earlier rewrites), and the Spark column expression equals the
    Python twin byte-for-byte."""
    an = SRCH.Analyzer(
        stem=True, stopwords=("the",),
        synonyms=(("join", "merge"), ("merge", "fold")),
    )
    cases = {
        "Ties,": "ty",        # ies -> y
        "values": "value",    # es -> e (drop s)
        "goes": "goes",       # oes excluded
        "glass": "glass",     # ss excluded
        "bus": "bus",         # us excluded
        "its": "its",         # len < 4 guard
        "scans": "scan",      # plain s drop
        "join": "fold",       # synonym cascade join->merge->fold
        "merge": "fold",      # second rule directly
        "the": "",            # stopword drops before synonyms/stem
    }
    for raw, want in cases.items():
        assert an.apply_py(raw) == want, (raw, an.apply_py(raw), want)
    df = spark.createDataFrame([(" ".join(cases),)], ["text"])
    got = df.select(
        SRCH_INDEX.analyze_tokens("text", an).alias("a")
    ).collect()[0]["a"]
    assert got == [an.apply_py(t) for t in cases]
    # settings round-trip through stats.json preserves RULE ORDER
    rt = SRCH.Analyzer.from_dict(an.to_dict())
    assert rt == an
    # legacy round-10 serialization stays byte-stable (no new keys)
    legacy = SRCH.Analyzer(stopwords=("a",))
    assert set(legacy.to_dict()) == {
        "lowercase", "strip_punct", "stopwords", "split_regex"
    }
    import pytest as _p
    # round-12: multi-word SOURCES are now the phrase-synonym filter;
    # the remaining validation surface — multi-word targets, empty
    # phrase tokens, and phrase rules without the charset guarantee —
    # still raises by name
    SRCH.Analyzer(synonyms=(("big data", "bigdata"),))  # ok now
    with _p.raises(ValueError, match="synonym rules"):
        SRCH.Analyzer(synonyms=(("bigdata", "big data"),))
    with _p.raises(ValueError, match="empty token"):
        SRCH.Analyzer(synonyms=(("big  data", "bigdata"),))
    with _p.raises(ValueError, match="strip_punct"):
        SRCH.Analyzer(
            strip_punct=False, synonyms=(("big data", "bigdata"),)
        )
    # a phrase analyzer refuses the per-token forms by name
    phr = SRCH.Analyzer(synonyms=(("big data", "bigdata"),))
    with _p.raises(ValueError, match="per-token"):
        phr.apply_py("big")


def test_stemmed_index_folds_plurals_end_to_end(spark, tmp_path):
    """An index built with stem=True must score singular+plural as ONE
    term (tf folds), and a legacy index upgraded via
    reindex_postings_index(stem analyzer) must rank identically to the
    stemmed-from-birth build."""
    docs = _corpus(spark, [
        (1, "merge merges sorts"),
        (2, "merge other words"),
        (3, "sort sort nothing"),
    ])
    born = str(tmp_path / "born")
    an = SRCH.Analyzer(lowercase=True, strip_punct=True, stem=True)
    SRCH.build_postings_index(docs, "doc_id", "text", born, n_buckets=4,
                              analyzer=an)
    idx = SRCH.load_postings_index(spark, born)
    assert idx.analyze_terms(["Merges,", "sorts"]) == ["merge", "sort"]
    got = {r["doc_id"]: r for r in
           SRCH.bm25_topk_indexed(idx, ["merge", "sort"], k=10).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_hit_terms"] == 2  # merges+sorts folded in
    # tf folded: doc 1 has tf(merge)=2 -> outscores doc 2's tf=1
    assert got[1]["score_q20"] > got[2]["score_q20"]
    # legacy -> reindex upgrade ranks identically
    legacy = str(tmp_path / "legacy")
    upgraded = str(tmp_path / "upgraded")
    SRCH.build_postings_index(docs, "doc_id", "text", legacy, n_buckets=4)
    SRCH.reindex_postings_index(spark, legacy, upgraded, analyzer=an)
    idx2 = SRCH.load_postings_index(spark, upgraded)
    got2 = sorted(map(tuple,
        SRCH.bm25_topk_indexed(idx2, ["merge", "sort"], k=10).collect()))
    assert got2 == sorted(map(tuple, (r for r in (
        SRCH.bm25_topk_indexed(idx, ["merge", "sort"], k=10).collect()))))


def test_synonym_index_merges_statistics(spark, tmp_path):
    """Index-time synonyms fold variants into one stored term: df/idf
    count the merged posting set and a doc holding both variants sums
    tf — never two separate terms."""
    docs = _corpus(spark, [
        (1, "join merge x"),   # both variants -> tf 2 after fold
        (2, "join y z"),
        (3, "merge w v"),
        (4, "other stuff q"),
    ])
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        analyzer=SRCH.Analyzer(synonyms=(("join", "merge"),)),
    )
    idx = SRCH.load_postings_index(spark, path)
    assert idx.analyze_terms(["join"]) == ["merge"]
    rows = {r["doc_id"]: r for r in
            SRCH.bm25_topk_indexed(idx, ["merge"], k=10).collect()}
    assert set(rows) == {1, 2, 3}
    # doc 1's folded tf=2 must outscore the single-variant docs
    assert rows[1]["score_q20"] > rows[2]["score_q20"]
    assert rows[2]["score_q20"] == rows[3]["score_q20"]  # same dl, tf
    # stored postings hold ONLY the canonical term
    terms = {r["term"] for r in idx.live_postings().select("term").collect()}
    assert "join" not in terms and "merge" in terms


def test_docvalues_dotted_object_fields(spark, tmp_path):
    """ES object-field mapping: a stored_fields entry may be a dotted
    path into a struct column, flattened under its literal dotted name
    at ingest; filters/sort/stats accept the dotted name end-to-end
    (search_index.py:dv_col quoting), delta ingests re-resolve the
    path, and nested ARRAY fields raise naming the ES feature."""
    import pytest as _p

    rows = [
        (i, f"spark w{i % 3}", {"lang": "en" if i % 2 else "de",
                                 "src": f"s{i % 2}"}, i * 10)
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id LONG, text STRING, "
        "meta STRUCT<lang: STRING, src: STRING>, n_chars LONG",
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["meta.lang", "n_chars"],
    )
    idx = SRCH.load_postings_index(spark, path)
    assert idx.stored_fields == ("meta.lang", "n_chars")
    got = SRCH.bm25_topk_filtered(
        idx, ["spark"],
        [("meta.lang", "=", "en"), ("n_chars", ">=", 30)], k=20,
    ).collect()
    assert sorted(r["doc_id"] for r in got) == [3, 5, 7, 9]
    # es_search dispatches the dotted path in a term filter
    from pycasselastic_spark.operators.search_api import es_search
    via = es_search(idx, {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"term": {"meta.lang": "en"}},
                    {"range": {"n_chars": {"gte": 30}}}],
    }}, "size": 20}).collect()
    assert sorted(map(tuple, via)) == sorted(map(tuple, got))
    # sort and stats aggs work on the dotted field too
    s = SRCH.search_sort_by_field(idx, ["spark"], "meta.lang", True, 3)
    assert [r["doc_id"] for r in s.collect()] == [0, 2, 4]  # 'de' first
    st = SRCH.search_stats_agg(idx, ["spark"], "n_chars").collect()[0]
    assert (st["n_docs"], st["min_val"], st["max_val"]) == (10, 0, 90)
    # delta ingest re-resolves the struct path (LWW doc-values)
    delta = spark.createDataFrame(
        [(3, "spark w0", {"lang": "de", "src": "s1"}, 30)],
        docs.schema,
    )
    SRCH.update_postings_index(delta, "text", path)
    idx2 = SRCH.load_postings_index(spark, path)
    got2 = SRCH.bm25_topk_filtered(
        idx2, ["spark"], [("meta.lang", "=", "en")], k=20
    ).collect()
    assert 3 not in {r["doc_id"] for r in got2}
    # nested ARRAY fields refuse by name (ES 'nested' type)
    arr = docs.withColumn("tags", F.array(F.lit("a"), F.lit("b")))
    with _p.raises(ValueError, match="array"):
        SRCH.build_postings_index(
            arr, "doc_id", "text", str(tmp_path / "arr"), n_buckets=4,
            stored_fields=["tags"],
        )


def test_rollover_trigger_and_cross_generation_lww(spark, tmp_path):
    """ILM rollover: the policy opens a fresh generation exactly when
    the live index holds max_docs, the write alias swaps to it, the
    old generation stays probe-able, the family probe spans the
    boundary, and a doc re-ingested AFTER a rollover serves only its
    newest copy (cross-generation LWW)."""
    import os as _os

    from pycasselastic_spark.operators import search_rollover as RO

    fam = str(tmp_path / "fam")
    pol = RO.RolloverPolicy(max_docs=4)
    batches = [
        [(1, "common alpha"), (2, "common beta")],
        [(3, "common gamma"), (4, "common delta")],   # fills gen 1 (4)
        [(5, "common epsilon"), (6, "common zeta")],  # triggers gen 2
        [(7, "common eta")],                          # stays in gen 2
    ]
    for rows in batches:
        RO.ingest_with_rollover(
            _corpus(spark, rows), "doc_id", "text", fam, pol, n_buckets=4
        )
    names = RO._read_manifest(fam)
    assert names == ["ix-00000001", "ix-00000002"]
    assert RO.write_index_path(fam).endswith("ix-00000002")
    gen1, gen2 = RO.load_family(spark, fam)
    assert (gen1.n_docs, gen2.n_docs) == (4, 3)
    # the old generation answers probes on its own (stays searchable)
    assert SRCH.bm25_topk_indexed(gen1, ["alpha"], k=5).count() == 1
    # the family probe spans the rollover boundary
    got = RO.rollover_bm25_topk(spark, fam, ["common"], k=10).collect()
    assert {r["doc_id"] for r in got} == {1, 2, 3, 4, 5, 6, 7}
    # per-generation statistics: gen1 docs score with gen1's N/avgdl
    one = {r["doc_id"]: r["score_q20"] for r in got}
    g1 = {r["doc_id"]: r["score_q20"]
          for r in SRCH.bm25_topk_indexed(gen1, ["common"], k=5).collect()}
    assert all(one[d] == g1[d] for d in (1, 2, 3, 4))
    # cross-generation LWW: re-ingest doc 1 with NEW text after the
    # rollover — the family probe must serve only the new copy
    RO.ingest_with_rollover(
        _corpus(spark, [(1, "common fresh text here")]),
        "doc_id", "text", fam, pol, n_buckets=4,
    )
    got2 = RO.rollover_bm25_topk(spark, fam, ["common"], k=10).collect()
    by_id = {r["doc_id"]: r for r in got2}
    assert len(got2) == 7  # still one row per doc
    gen2b = RO.load_family(spark, fam)[1]
    fresh = {r["doc_id"]: r["score_q20"] for r in
             SRCH.bm25_topk_indexed(gen2b, ["common"], k=10).collect()}
    assert by_id[1]["score_q20"] == fresh[1]  # newest generation's score
    # an 'alpha' probe still finds the STALE gen-1 copy? It must NOT:
    # doc 1's live version has no 'alpha'
    assert RO.rollover_bm25_topk(spark, fam, ["alpha"], k=5).count() == 0
    # the empty-family probe raises by name
    import pytest as _p
    with _p.raises(ValueError, match="no rollover family"):
        RO.rollover_bm25_topk(spark, str(tmp_path / "nofam"), ["x"])


def test_rollover_retention_drops_oldest_generations(spark, tmp_path):
    """ES ILM's delete phase (round-12): max_indexes bounds the family
    — a roll beyond the bound drops the OLDEST generations (manifest
    first, directories after), the write alias stays on the newest,
    and the family probe serves exactly the retained docs."""
    import os as _os

    from pycasselastic_spark.operators import search_rollover as RO

    fam = str(tmp_path / "fam")
    pol = RO.RolloverPolicy(max_docs=2, max_indexes=2)
    # disjoint id batches; each fills a generation and rolls the next
    for lo in (1, 3, 5, 7):
        RO.ingest_with_rollover(
            _corpus(spark, [(lo, f"common w{lo}"), (lo + 1, f"common w{lo + 1}")]),
            "doc_id", "text", fam, pol, n_buckets=4,
        )
    names = RO._read_manifest(fam)
    assert names == ["ix-00000003", "ix-00000004"]
    assert RO.write_index_path(fam).endswith("ix-00000004")
    # dropped generation state is gone from disk (dir + bloom)
    assert not _os.path.exists(_os.path.join(fam, "ix-00000001"))
    assert not _os.path.exists(_os.path.join(fam, "ix-00000002"))
    assert not _os.path.exists(RO._bloom_path(fam, "ix-00000001"))
    assert _os.path.exists(RO._bloom_path(fam, "ix-00000003"))
    got = RO.rollover_bm25_topk(spark, fam, ["common"], k=10).collect()
    assert {r["doc_id"] for r in got} == {5, 6, 7, 8}
    # retention validation
    import pytest as _p
    with _p.raises(ValueError, match="max_indexes"):
        RO.RolloverPolicy(max_docs=2, max_indexes=0)
    with _p.raises(ValueError, match="max_docs"):
        RO.RolloverPolicy(max_docs=0)


def test_rollover_bloom_prunes_retraction_scans(spark, tmp_path, monkeypatch):
    """The per-generation id routing bloom (round-12): an ingest whose
    ids provably overlap NO older generation runs zero retraction
    Spark jobs; an overlapping ingest still retracts (no false
    negatives), and results match the pre-bloom semantics exactly."""
    from pycasselastic_spark.operators import search_rollover as RO

    fam = str(tmp_path / "fam")
    pol = RO.RolloverPolicy(max_docs=2)
    for lo in (1, 3):
        RO.ingest_with_rollover(
            _corpus(spark, [(lo, f"common w{lo}"), (lo + 1, f"common w{lo + 1}")]),
            "doc_id", "text", fam, pol, n_buckets=4,
        )
    calls = []
    real = RO._retract_ids

    def counting(batch_ids, path, id_col):
        calls.append(path)
        return real(batch_ids, path, id_col)

    monkeypatch.setattr(RO, "_retract_ids", counting)
    # disjoint ids: bloom AND is empty for both older generations —
    # the retraction loop must not launch a single Spark job
    RO.ingest_with_rollover(
        _corpus(spark, [(100, "common disjoint")]),
        "doc_id", "text", fam, pol, n_buckets=4,
    )
    assert calls == []
    # overlapping id: the generation holding it MUST be scanned, and
    # the stale copy retracts (cross-generation LWW unchanged)
    RO.ingest_with_rollover(
        _corpus(spark, [(1, "fresh only")]),
        "doc_id", "text", fam, pol, n_buckets=4,
    )
    assert any(p.endswith("ix-00000001") for p in calls)
    assert RO.rollover_bm25_topk(spark, fam, ["common"], k=10).count() == 4
    got = RO.rollover_bm25_topk(spark, fam, ["fresh"], k=10).collect()
    assert [r["doc_id"] for r in got] == [1]
    # a legacy generation WITHOUT a bloom file is always scanned
    import os as _os

    _os.remove(RO._bloom_path(fam, "ix-00000002"))
    calls.clear()
    RO.ingest_with_rollover(
        _corpus(spark, [(200, "common disjoint again")]),
        "doc_id", "text", fam, pol, n_buckets=4,
    )
    assert any(p.endswith("ix-00000002") for p in calls)
    assert not any(p.endswith("ix-00000001") for p in calls)


def test_multiword_synonym_chain_and_reindex_parity(spark, tmp_path):
    """Round-12 phrase synonyms: the stream-level contraction folds a
    token phrase into one stored term at ingest AND query time, the
    Python twin is byte-identical to the Column pass, and upgrading a
    legacy index via reindex (slot-stream reconstruction from stored
    positions) ranks exactly like the contracted-from-birth build."""
    from pycasselastic_spark.operators import search_index as SI

    an = SRCH.Analyzer(
        lowercase=True, strip_punct=True, stopwords=("the",),
        synonyms=(("big data", "bigdata"), ("join", "merge")),
    )
    texts = [
        (1, "The Big Data, join wins"),
        (2, "big data big data"),
        (3, "big killer data join"),   # non-adjacent: no contraction
        (4, "bigdata merge"),
    ]
    docs = _corpus(spark, texts)
    got = docs.select(
        "doc_id", SI.analyze_tokens("text", an).alias("a")
    ).collect()
    for r in got:
        raw = dict(texts)[r["doc_id"]]
        assert r["a"] == an.apply_tokens_py(an.split_py(raw)), raw
    assert dict(texts)[2] == "big data big data"
    by_id = {r["doc_id"]: r["a"] for r in got}
    assert by_id[1] == ["", "bigdata", "", "merge", "wins"]
    assert by_id[2] == ["bigdata", "", "bigdata", ""]
    assert by_id[3] == ["big", "killer", "data", "merge"]
    # query-side: adjacent raw terms contract exactly like ingest
    assert SI.analyze_terms_py(["Big", "Data,", "JOIN"], an) == [
        "bigdata", "merge"
    ]
    # from-birth vs reindex-upgraded ranking parity
    born, v2 = str(tmp_path / "born"), str(tmp_path / "v2")
    legacy = str(tmp_path / "legacy")
    SRCH.build_postings_index(
        docs, "doc_id", "text", born, n_buckets=4, analyzer=an
    )
    SRCH.build_postings_index(docs, "doc_id", "text", legacy, n_buckets=4)
    SRCH.reindex_postings_index(spark, legacy, v2, analyzer=an)
    a = SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, born), ["bigdata", "merge"], k=10
    ).collect()
    b = SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, v2), ["bigdata", "merge"], k=10
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # phrase positions: contraction keeps the FIRST slot (gap after),
    # so phrase search over the contracted term still works
    idx = SRCH.load_postings_index(spark, born)
    p = idx.live_postings_for(["bigdata"]).collect()
    pos = {r["doc_id"]: sorted(r["positions"]) for r in p}
    assert pos[1] == [1] and pos[2] == [0, 2] and pos[4] == [0]


def test_exists_ids_terms_set_and_missing_bucket(spark, tmp_path):
    """Round-12 stored-doc-values query surface: exists (NULL-aware),
    ids (live docs only — superseded copies don't match), terms_set
    (per-doc threshold), and the terms-agg missing bucket; unsupported
    variants raise by name."""
    import pytest as _p

    from pycasselastic_spark.operators.search_api import es_search

    rows = [
        (1, "alpha beta gamma", "t1", 1),
        (2, "alpha beta", None, 2),
        (3, "alpha", "t1", 3),
        (4, "delta", "t2", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, opt_tag string, req long"
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["opt_tag", "req"],
    )
    idx = SRCH.load_postings_index(spark, path)
    # exists: NULL opt_tag (doc 2) is excluded
    got = es_search(idx, {"query": {"exists": {"field": "opt_tag"}}})
    assert [r["doc_id"] for r in got.collect()] == [1, 3, 4]
    # ids: absent id ignored
    got = es_search(idx, {"query": {"ids": {"values": [2, 3, 99]}}})
    assert [r["doc_id"] for r in got.collect()] == [2, 3]
    # terms_set: per-doc threshold from the stored req field
    got = es_search(idx, {"query": {"terms_set": {"text": {
        "terms": ["alpha", "beta", "gamma"],
        "minimum_should_match_field": "req",
    }}}}).collect()
    # doc1 hits 3 >= 1; doc2 hits 2 >= 2; doc3 hits 1 < 3; doc4 0 < 1
    assert {r["doc_id"] for r in got} == {1, 2}
    # missing bucket: NULL facet folds under the substitute; without
    # it the NULL-facet doc is excluded (ES default)
    from pycasselastic_spark.operators.search_ext import search_facets

    with_missing = search_facets(
        idx, docs, ["alpha"], "opt_tag", missing="(none)"
    ).collect()
    assert {(r["opt_tag"], r["n_docs"]) for r in with_missing} == {
        ("t1", 2), ("(none)", 1)
    }
    without = search_facets(idx, docs, ["alpha"], "opt_tag").collect()
    assert {(r["opt_tag"], r["n_docs"]) for r in without} == {("t1", 2)}
    # strict dispatch: unsupported variants raise by name
    with _p.raises(ValueError, match="terms_set"):
        es_search(idx, {"query": {"terms_set": {"text": {
            "terms": ["alpha"],
        }}}})
    with _p.raises(ValueError, match="exists"):
        es_search(idx, {"query": {"exists": {"field": "opt_tag", "boost": 2}}})
    with _p.raises(ValueError, match="not stored"):
        es_search(idx, {"query": {"exists": {"field": "nope"}}})
    # after a delta ingest, ids serves the LIVE copy set (superseded
    # rows never resurface) — reloaded handle, standard LWW contract
    SRCH.update_postings_index(
        spark.createDataFrame(
            [(3, "omega only", "t9", 1)],
            "doc_id long, text string, opt_tag string, req long",
        ),
        "text", path,
    )
    idx2 = SRCH.load_postings_index(spark, path)
    got = es_search(idx2, {"query": {"ids": {"values": [3, 99]}}})
    assert [r["doc_id"] for r in got.collect()] == [3]


def test_range_and_terms_dv_queries(spark, tmp_path):
    """Round-12 tail: top-level range and terms queries over stored
    doc-values — constant-score id pages, strict guards."""
    import pytest as _p

    from pycasselastic_spark.operators.search_api import es_search

    docs = spark.createDataFrame(
        [(1, "alpha", "t1", 10), (2, "beta", "t2", 20),
         (3, "gamma", "t1", 30), (4, "delta", None, 40)],
        "doc_id long, text string, tag string, score long",
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["tag", "score"],
    )
    idx = SRCH.load_postings_index(spark, path)
    got = es_search(idx, {"query": {"range": {"score": {"gte": 20, "lt": 40}}}})
    assert [r["doc_id"] for r in got.collect()] == [2, 3]
    got = es_search(idx, {"query": {"terms": {"tag": ["t1", "t9"]}}})
    assert [r["doc_id"] for r in got.collect()] == [1, 3]
    with _p.raises(ValueError, match="range options"):
        es_search(idx, {"query": {"range": {"score": {"gte": 1, "boost": 2}}}})
    with _p.raises(ValueError, match="not stored"):
        es_search(idx, {"query": {"terms": {"text": ["alpha"]}}})


def test_nested_type_per_element_semantics(spark, tmp_path):
    """Round-12: ES nested type — declared array-of-struct doc values
    with per-element match (one element satisfies EVERY leaf); a doc
    that only matches across DIFFERENT elements must NOT match, and
    undeclared arrays keep refusing by name."""
    import pytest as _p

    from pycasselastic_spark.operators.search_api import es_search

    docs = spark.createDataFrame(
        [(1, "alpha", [("fr", 4), ("en", 1)]),
         (2, "beta", [("fr", 1), ("en", 9)]),   # cross-element only
         (3, "gamma", [("de", 5)]),
         (4, "delta", [])],
        "doc_id long, text string, "
        "anns array<struct<alang string, ascore long>>",
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4, nested_fields=["anns"],
    )
    idx = SRCH.load_postings_index(spark, path)
    assert idx.nested_fields == ("anns",)
    got = es_search(idx, {"query": {"nested": {
        "path": "anns",
        "query": {"bool": {"must": [
            {"term": {"anns.alang": "fr"}},
            {"range": {"anns.ascore": {"gte": 3}}},
        ]}},
    }}})
    # doc 2 has alang='fr' (score 1) and score>=3 ('en' 9) on
    # DIFFERENT elements — flattened matching would include it
    assert [r["doc_id"] for r in got.collect()] == [1]
    got = es_search(idx, {"query": {"nested": {
        "path": "anns",
        "query": {"range": {"anns.ascore": {"gte": 5}}},
    }}})
    assert [r["doc_id"] for r in got.collect()] == [2, 3]
    # guards: undeclared arrays, out-of-path leaves, unknown paths
    with _p.raises(ValueError, match="nested_fields"):
        SRCH.build_postings_index(
            docs.select("doc_id", "text",
                        F.col("anns").alias("plain_arr")),
            "doc_id", "text", str(tmp_path / "i2"), n_buckets=4,
            stored_fields=["plain_arr"],
        )
    with _p.raises(ValueError, match="outside path"):
        es_search(idx, {"query": {"nested": {
            "path": "anns", "query": {"term": {"other.f": 1}},
        }}})
    with _p.raises(ValueError, match="declared nested"):
        es_search(idx, {"query": {"nested": {
            "path": "nope", "query": {"term": {"nope.f": 1}},
        }}})
    # LWW: a re-ingested doc's nested values follow the newest copy
    SRCH.update_postings_index(
        spark.createDataFrame(
            [(2, "beta2", [("fr", 8)])],
            "doc_id long, text string, "
            "anns array<struct<alang string, ascore long>>",
        ),
        "text", path,
    )
    idx2 = SRCH.load_postings_index(spark, path)
    got = es_search(idx2, {"query": {"nested": {
        "path": "anns",
        "query": {"bool": {"must": [
            {"term": {"anns.alang": "fr"}},
            {"range": {"anns.ascore": {"gte": 3}}},
        ]}},
    }}})
    assert [r["doc_id"] for r in got.collect()] == [1, 2]


def test_rollover_max_age_condition(spark, tmp_path):
    """Round-12: ES rollover's max_age — a live write index older than
    the policy age rolls on the next ingest even when not full; the
    clock is injected so the test is deterministic, and manifests
    without timestamps (legacy families) never age-roll."""
    from pycasselastic_spark.operators import search_rollover as RO

    fam = str(tmp_path / "fam")
    pol = RO.RolloverPolicy(max_docs=1000, max_age_s=60)
    clock = {"t": 1_000.0}
    now = lambda: clock["t"]  # noqa: E731
    RO.ingest_with_rollover(
        _corpus(spark, [(1, "common a")]), "doc_id", "text", fam, pol,
        n_buckets=4, now_fn=now,
    )
    clock["t"] += 30  # young: same generation
    RO.ingest_with_rollover(
        _corpus(spark, [(2, "common b")]), "doc_id", "text", fam, pol,
        n_buckets=4, now_fn=now,
    )
    assert RO._read_manifest(fam) == ["ix-00000001"]
    clock["t"] += 61  # past max_age: rolls despite being nearly empty
    RO.ingest_with_rollover(
        _corpus(spark, [(3, "common c")]), "doc_id", "text", fam, pol,
        n_buckets=4, now_fn=now,
    )
    assert RO._read_manifest(fam) == ["ix-00000001", "ix-00000002"]
    assert RO.write_index_path(fam).endswith("ix-00000002")
    # probes span the age-rolled boundary as usual
    got = RO.rollover_bm25_topk(spark, fam, ["common"], k=10)
    assert {r["doc_id"] for r in got.collect()} == {1, 2, 3}
    # legacy manifest without timestamps: age can never trigger
    import json as _json
    import os as _os

    mp = _os.path.join(fam, "family.json")
    doc = _json.load(open(mp))
    doc.pop("created")
    _json.dump(doc, open(mp, "w"))
    clock["t"] += 10_000
    RO.ingest_with_rollover(
        _corpus(spark, [(4, "common d")]), "doc_id", "text", fam, pol,
        n_buckets=4, now_fn=now,
    )
    assert RO._read_manifest(fam) == ["ix-00000001", "ix-00000002"]
    import pytest as _p
    with _p.raises(ValueError, match="max_age_s"):
        RO.RolloverPolicy(max_docs=1, max_age_s=0)


def test_exists_and_nested_in_filter_context(spark, tmp_path):
    """Round-12 tail: exists and nested clauses compose with scoring
    inside bool.filter — non-scoring (scores equal the unfiltered
    probe's for survivors), and strict guards hold."""
    import pytest as _p

    from pycasselastic_spark.operators.search_api import es_search

    docs = spark.createDataFrame(
        [(1, "alpha common", "t1", [("fr", 4)]),
         (2, "alpha common", None, [("fr", 9)]),
         (3, "alpha common", "t1", [("fr", 1)])],
        "doc_id long, text string, tag string, "
        "anns array<struct<alang string, ascore long>>",
    )
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["tag"], nested_fields=["anns"],
    )
    idx = SRCH.load_postings_index(spark, path)
    body = {"query": {"bool": {
        "must": [{"match": {"text": "alpha"}}],
        "filter": [
            {"exists": {"field": "tag"}},
            {"nested": {"path": "anns", "query": {
                "range": {"anns.ascore": {"gte": 3}}}}},
        ],
    }}}
    got = es_search(idx, body).collect()
    assert [r["doc_id"] for r in got] == [1]  # 2 fails exists, 3 nested
    # non-scoring: survivor's score equals the unfiltered probe's
    unfiltered = {r["doc_id"]: r["score_q20"] for r in
                  SRCH.bm25_topk_indexed(idx, ["alpha"], k=10).collect()}
    assert got[0]["score_q20"] == unfiltered[1]
    with _p.raises(ValueError, match="declared nested"):
        es_search(idx, {"query": {"bool": {
            "must": [{"match": {"text": "alpha"}}],
            "filter": [{"nested": {"path": "tag", "query": {
                "term": {"tag.x": 1}}}}],
        }}})


def test_buckets_for_scales_with_corpus():
    """Round-15 guard for the one-exchange ingest's parallelism cap:
    the bucket count must scale with the corpus (power of two, ~1M
    docs per bucket) so the pbucket-keyed aggregation never folds a
    large corpus through a constant-width shuffle, while small corpora
    keep the 16-bucket local layout."""
    from pycasselastic_spark.operators.search import buckets_for

    assert buckets_for(0) == 16
    assert buckets_for(5_000) == 16
    assert buckets_for(20_000_000) == 32          # 20 buckets -> pow2
    assert buckets_for(1_000_000_000) == 1024
    assert buckets_for(10_000_000_000) == 16384   # ~100 TB corpus
    # monotone and power-of-two
    prev = 0
    for n in (1, 10**6, 10**7, 10**8, 10**9, 10**10):
        b = buckets_for(n)
        assert b >= prev and (b & (b - 1)) == 0
        prev = b
