"""Unit tests for the round-7 operators: search (inverted index, BM25,
TF-IDF, phrase), containment dedup, group-consistent split, per-group
cap, hybrid skew join, multi-snapshot LWW."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import lww_merge, lww_snapshots
from pycasselastic_spark.operators import search as SRCH
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
