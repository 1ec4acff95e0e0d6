"""Dedup / similarity operator tests: planted-duplicate recovery, LSH
vs brute-force equivalence, pigeonhole-blocking exactness, ANN recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.operators import dedup as D
from pycasselastic_spark.operators import similarity as S
from pycasselastic_spark.sources.corpus import load_table


def pairs_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


class TestExactDedup:
    def test_planted_duplicates(self, spark):
        rows = [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),  # dup of 1
            (3, "delta epsilon"),
            (4, "alpha beta gamma"),  # dup of 1
            (5, "delta epsilon zeta"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = D.exact_dedup(df, ["text"], "doc_id")
        got = {r["doc_id"] for r in out.collect()}
        assert got == {1, 3, 5}  # min doc_id survives

    def test_multi_column_content(self, spark):
        rows = [(1, "a", "x"), (2, "a", "y"), (3, "a", "x")]
        df = spark.createDataFrame(rows, ["doc_id", "t1", "t2"])
        got = {r["doc_id"] for r in D.exact_dedup(df, ["t1", "t2"], "doc_id").collect()}
        assert got == {1, 2}


class TestNearDup:
    def test_lsh_equals_bruteforce(self, spark, sf_dir):
        """The LSH candidate path must find every qualifying pair the
        exact all-pairs scan finds (deterministic md5 hashing => this is
        a fixed property of the corpus, not a flaky probability)."""
        docs = load_table(spark, sf_dir, "documents")
        brute = pairs_set(
            D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
        )
        lsh = pairs_set(
            D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
        )
        assert lsh == brute
        assert len(brute) > 0

    def test_simhash_blocking_is_exact(self, spark, sf_dir):
        """Pigeonhole chunk blocking must find exactly the pairs a
        brute-force hamming scan finds."""
        docs = load_table(spark, sf_dir, "documents").limit(200)
        via_blocking = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
        }
        fp = D.simhash_fingerprints(docs, "doc_id", "text").collect()
        brute = {}
        for i, a in enumerate(fp):
            for b in fp[i + 1 :]:
                x, y = (a, b) if a["_id"] < b["_id"] else (b, a)
                h = bin(x["fp_hi"] ^ y["fp_hi"]).count("1") + bin(
                    x["fp_lo"] ^ y["fp_lo"]
                ).count("1")
                if h <= 3:
                    brute[(x["_id"], y["_id"])] = h
        assert via_blocking == brute

    def test_simhash_rejects_loose_hamming(self, spark):
        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        import pytest as _pytest

        with _pytest.raises(ValueError):
            D.simhash_pairs(df, "doc_id", "text", max_hamming=5)

    def test_shingles_short_doc(self, spark):
        df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
        row = df.select(D.shingles("text", 3).alias("s")).collect()[0]
        assert row["s"] == []


class TestSimilarity:
    def test_bruteforce_topk_sanity(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        out = S.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
        rows = out.collect()
        assert len(rows) == 15
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, matches in by_q.items():
            assert all(m["match_id"] != qid for m in matches)
            cosines = [m["cosine"] for m in matches]
            assert cosines == sorted(cosines, reverse=True)

    def test_lsh_topk_recall(self, spark, sf_dir):
        """LSH-bucketed ANN must recover most of the true top-5."""
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        brute = S.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
        approx = S.lsh_topk(
            emb, q, "vec_id", "embedding", k=5, dim=64, num_planes=12, num_bands=6
        )
        truth = {(r["query_id"], r["match_id"]) for r in brute.collect()}
        got = {(r["query_id"], r["match_id"]) for r in approx.collect()}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = S.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    approx = S.ivf_topk(emb, q, "vec_id", "embedding", k=5, n_cells=16, n_probe=8)
    truth = {(r["query_id"], r["match_id"]) for r in brute.collect()}
    got = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_exact_dedup_null_vs_empty_not_collided(spark):
    """NULL and adjacent-column shifts must not collide in the content
    digest (concat_ws would have skipped NULLs)."""
    rows = [
        (1, "a", None),
        (2, None, "a"),
        (3, "", "b"),
        (4, None, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t1 string, t2 string")
    got = {r["doc_id"] for r in D.exact_dedup(df, ["t1", "t2"], "doc_id").collect()}
    assert got == {1, 2, 3, 4}  # all distinct contents survive


class TestEmbeddingLshNearDup:
    def test_recall_vs_bruteforce(self, spark, sf_dir):
        """The banded-LSH candidate path must recover nearly all pairs
        the all-pairs baseline finds at cosine >= 0.4, and every pair
        it emits must be a true positive with the identical cosine."""
        emb = load_table(spark, sf_dir, "embeddings")
        brute = D.embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)
        lsh = D.embedding_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.4, dim=64,
            num_planes=12, num_bands=6,
        )
        truth = pairs_set(brute)
        got = pairs_set(lsh)
        assert got <= truth  # no false positives (exact verify stage)
        assert len(got) >= 0.85 * len(truth)

    def test_cosines_match_bruteforce(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        brute = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in D.embedding_cosine_pairs(
                emb, "vec_id", "embedding", threshold=0.4
            ).collect()
        }
        for r in D.embedding_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.4, dim=64
        ).collect():
            assert brute[(r["doc_a"], r["doc_b"])] == r["cosine"]


class TestEmbeddingIvfNearDup:
    def test_pairs_are_exact_subset_with_recall(self, spark, sf_dir):
        """Cell blocking must emit only true pairs (exact verify) and
        recover most of the brute-force answer; near-identical vectors
        share a cell with probability -> 1."""
        emb = load_table(spark, sf_dir, "embeddings")
        brute = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in D.embedding_cosine_pairs(
                emb, "vec_id", "embedding", threshold=0.4
            ).collect()
        }
        got = D.embedding_ivf_pairs(
            emb, "vec_id", "embedding", threshold=0.4, n_cells=8, n_assign=3
        ).collect()
        assert got
        for r in got:
            assert brute[(r["doc_a"], r["doc_b"])] == r["cosine"]
        # isotropic corpus at threshold 0.4 (66 deg) is the hardest
        # case for cell blocking; 3-way multi-assignment still recovers
        # nearly everything (98% measured)
        assert len(got) >= 0.8 * len(brute)


def test_let_binds_value_once(spark):
    """functions/expr.py:let — the bound body sees the evaluated value
    (semantics check; the perf property is covered by the operators
    that rely on it)."""
    from pycasselastic_spark.functions.expr import let

    df = spark.range(10).select(
        let(
            F.split(F.concat(F.lit("a b c "), F.col("id").cast("string")), " "),
            lambda ws: F.size(ws) + F.element_at(ws, 1).isNotNull().cast("int"),
        ).alias("v")
    )
    assert {r["v"] for r in df.collect()} == {5}


def test_signature_bits_sequential_matches_unrolled(spark, sf_dir):
    """The >32-plane signature path (transform over one literal array)
    must produce bit-identical signatures to the <=32-plane unrolled
    path — both are sequential folds, so running 40 planes as 32 + 8
    must concatenate to the 40-plane result."""
    from pycasselastic_spark.operators.similarity import (
        _hyperplane,
        signature_bits,
        with_unit_vector,
    )
    from pycasselastic_spark.sources.corpus import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    unit = with_unit_vector(emb, "embedding", "_u").localCheckpoint(eager=True)
    planes = [_hyperplane(64, p) for p in range(40)]
    wide = unit.select(
        "vec_id", signature_bits(F.col("_u"), planes).alias("sig")
    )
    narrow = unit.select(
        "vec_id",
        F.concat(
            signature_bits(F.col("_u"), planes[:32]),
            signature_bits(F.col("_u"), planes[32:]),
        ).alias("sig"),
    )
    got = {r["vec_id"]: r["sig"] for r in wide.collect()}
    want = {r["vec_id"]: r["sig"] for r in narrow.collect()}
    assert got == want and len(got) == 50


def test_signature_bits_arrow_matches_hof_reference(spark):
    """The round-14 Arrow signature path must be BYTE-IDENTICAL to the
    expression fold it replaced (``_signature_bits_hof``) — including
    the degenerate rows where the fold's null-poisoning semantics
    matter: a null vector, a wrong-length vector, an empty vector and
    a NaN element must all produce the all-zeros signature, and
    near-zero dots must land on the same side of >= 0."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from pycasselastic_spark.operators.similarity import (
        _hyperplane,
        _signature_bits_arrow,
        _signature_bits_hof,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    rows += [
        (100, None),                      # null vector
        (101, []),                        # empty
        (102, [0.5] * 3),                 # too short
        (103, [0.5] * 12),                # too long
        (104, [float("nan")] + [0.1] * 7),  # NaN element
        (105, [0.0] * 8),                 # exact-zero dots (>= 0 edge)
        (106, [-0.0] * 8),                # negative-zero dots
        (107, [0.5, None] + [0.1] * 6),   # SQL NULL element (round-15
        # advisor fix: Arrow nulls become NaN inside the UDF, so the
        # Column-level guard must emit the HOF's all-'0', not all-'1')
    ]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("v", ArrayType(DoubleType())),
    ])
    df = spark.createDataFrame(rows, schema).localCheckpoint(eager=True)
    planes = [_hyperplane(8, p) for p in range(40)]
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", _signature_bits_arrow(F.col("v"), planes).alias("sig")
        ).collect()
    }
    want = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", _signature_bits_hof(F.col("v"), planes).alias("sig")
        ).collect()
    }
    assert got == want and len(got) == len(rows)
    assert got[100] == "0" * 40  # null fold is not >= 0
    assert got[104] == "1" * 40  # Spark orders NaN above every number
    assert got[105] == "1" * 40  # 0.0 >= 0 on every plane
    assert got[107] == "0" * 40  # null ELEMENT poisons the fold


class TestEditDistancePairs:
    def test_distance1_recall_is_exact(self, spark):
        """Every substitution/insert/delete-1 pair must surface; the
        distance-2 pair must not."""
        rows = [
            (1, "kitten"),
            (2, "mitten"),   # substitution -> dist 1
            (3, "kitte"),    # deletion -> dist 1 of kitten
            (4, "kittens"),  # insertion -> dist 1 of kitten
            (5, "mittes"),   # dist 2 from kitten, 1 from mitten
            (6, "zebra"),
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        from pycasselastic_spark.operators.dedup import edit_distance_pairs

        got = {
            (r["id_a"], r["id_b"])
            for r in edit_distance_pairs(df, "id", "name").collect()
        }
        import itertools

        def lev(a, b):
            d = {(i, 0): i for i in range(len(a) + 1)}
            d.update({(0, j): j for j in range(len(b) + 1)})
            for i, j in itertools.product(range(1, len(a) + 1), range(1, len(b) + 1)):
                d[i, j] = min(
                    d[i - 1, j] + 1,
                    d[i, j - 1] + 1,
                    d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
            return d[len(a), len(b)]

        want = {
            (x[0], y[0])
            for x, y in itertools.combinations(rows, 2)
            if lev(x[1], y[1]) <= 1
        }
        assert got == want
        assert (1, 2) in got and (1, 3) in got and (1, 4) in got
        assert all(6 not in p for p in got)

    def test_no_cartesian_in_plan(self, spark):
        from pycasselastic_spark.operators.dedup import edit_distance_pairs

        df = spark.createDataFrame([(1, "ab"), (2, "ac")], ["id", "name"])
        from pycasselastic_spark.plans import tuning

        plan = tuning.physical_plan(edit_distance_pairs(df, "id", "name"))
        assert "CartesianProduct" not in plan

    def test_distance2_recall_is_exact(self, spark):
        """Depth-2 FastSS blocking (shared with the search family's
        fuzzy dictionary): every pair within Levenshtein distance 2 —
        double substitution, transposition, insert+delete mixes —
        surfaces; distance-3 pairs must not."""
        rows = [
            (1, "kitten"),
            (2, "mitten"),   # dist 1
            (3, "mittes"),   # dist 2 from kitten
            (4, "kittne"),   # transposition -> dist 2
            (5, "kit"),      # dist 3 from kitten
            (6, "sitting"),  # dist 3 from kitten
            (7, "zebra"),
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        from pycasselastic_spark.operators.dedup import edit_distance_pairs

        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, "id", "name", max_dist=2).collect()
        }
        import itertools

        def lev(a, b):
            d = {(i, 0): i for i in range(len(a) + 1)}
            d.update({(0, j): j for j in range(len(b) + 1)})
            for i, j in itertools.product(
                range(1, len(a) + 1), range(1, len(b) + 1)
            ):
                d[i, j] = min(
                    d[i - 1, j] + 1,
                    d[i, j - 1] + 1,
                    d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
            return d[len(a), len(b)]

        want = {
            (x[0], y[0], lev(x[1], y[1]))
            for x, y in itertools.combinations(rows, 2)
            if lev(x[1], y[1]) <= 2
        }
        assert got == want
        assert (1, 4, 2) in got  # the transposition the depth-1 blocker misses
        import pytest as _p
        with _p.raises(ValueError, match="1 or 2"):
            edit_distance_pairs(df, "id", "name", max_dist=3)


class TestEditDistanceGrouped:
    def test_grouped_pairs_preserve_id_pair_multiset(self, spark):
        """Dedup-before-verify must lose NOTHING: expanding each
        grouped row's n_pairs reproduces exactly the ungrouped
        operator's pair count per (text_a, text_b, dist) — and the
        within-group dist-0 rows carry C(cnt, 2)."""
        from collections import Counter

        from pycasselastic_spark.operators.dedup import (
            edit_distance_pairs,
            edit_distance_pairs_grouped,
        )

        # 'kitten' x3, 'mitten' x2 (dist 1 across, dist 0 within),
        # 'zebra' x1 (no matches)
        rows = [
            (1, "kitten"), (2, "kitten"), (3, "kitten"),
            (4, "mitten"), (5, "mitten"), (6, "zebra"),
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        flat = Counter(
            (min(r["text_a"], r["text_b"]), max(r["text_a"], r["text_b"]),
             r["dist"])
            for r in edit_distance_pairs(df, "id", "name").collect()
        )
        grouped = {
            (r["text_a"], r["text_b"], r["dist"]): r["n_pairs"]
            for r in edit_distance_pairs_grouped(df, "id", "name").collect()
        }
        assert grouped == dict(flat)
        assert grouped[("kitten", "kitten", 0)] == 3  # C(3, 2)
        assert grouped[("kitten", "mitten", 1)] == 6  # 3 x 2
        # the grouped output is one row per TEXT pair — the collapse
        assert sum(grouped.values()) == sum(flat.values()) == 10
        assert len(grouped) == 3


class TestPassageDedup:
    def test_shared_passages_counted_cross_doc_only(self, spark):
        # docs 1 and 2 share their first 10-token passage exactly; doc 3
        # repeats its own passage twice (within-doc repeat is NOT a dup)
        shared = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame(
            [
                (1, shared + " tail1 a b c"),
                (2, shared + " tail2 d e f"),
                (3, " ".join(["x"] * 10) + " " + " ".join(["x"] * 10)),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in D.passage_duplicate_stats(df, "doc_id", "text").collect()
        }
        assert rows[1]["n_passages"] == 2 and rows[1]["n_dup_passages"] == 1
        assert rows[2]["n_passages"] == 2 and rows[2]["n_dup_passages"] == 1
        # doc 3's two identical passages come from ONE doc -> not dups
        assert rows[3]["n_passages"] == 2 and rows[3]["n_dup_passages"] == 0
        assert rows[1]["dup_share"] == 0.5

    def test_short_doc_is_one_passage(self, spark):
        df = spark.createDataFrame(
            [(1, "only three tokens"), (2, "only three tokens")],
            "doc_id long, text string",
        )
        rows = D.passage_duplicate_stats(df, "doc_id", "text").collect()
        assert all(r["n_passages"] == 1 and r["n_dup_passages"] == 1 for r in rows)


class TestIncrementalMinhash:
    def test_cross_dataframe_banding_collides(self, spark):
        """Regression: the minhash salt must be a plan-independent
        literal. A (element, index)-bound lambda made every plan hash
        with its own unresolved-Column repr as the salt, so two
        separately-built DataFrames NEVER shared a band key and
        minhash_lsh_pairs_between returned zero rows for identical
        texts."""
        text = " ".join(f"tok{i}" for i in range(30))
        base = spark.createDataFrame([(1, text)], "doc_id long, text string")
        delta = spark.createDataFrame([(2, text)], "doc_id long, text string")
        rows = D.minhash_lsh_pairs_between(
            base, delta, "doc_id", "text"
        ).collect()
        assert len(rows) == 1
        assert rows[0]["jaccard"] == 1.0

    def test_no_base_base_or_delta_delta_pairs(self, spark):
        text = " ".join(f"w{i}" for i in range(30))
        base = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        delta = spark.createDataFrame(
            [(10, text), (11, text)], "doc_id long, text string"
        )
        rows = D.minhash_lsh_pairs_between(base, delta, "doc_id", "text").collect()
        got = {(r["base_id"], r["delta_id"]) for r in rows}
        # all four cross pairs, never (1,2) or (10,11)
        assert got == {(1, 10), (1, 11), (2, 10), (2, 11)}

    def test_mismatched_base_index_is_rejected(self, spark):
        """A prebuilt index carries its (n, num_hashes, band_rows);
        probing with a different family would silently yield zero band
        collisions (the salt-bug failure mode), so it must raise."""
        import pytest

        text = " ".join(f"tok{i}" for i in range(30))
        base = spark.createDataFrame([(1, text)], "doc_id long, text string")
        delta = spark.createDataFrame([(2, text)], "doc_id long, text string")
        idx = D.minhash_band_index(base, "doc_id", "text", n=3, num_hashes=24)
        with pytest.raises(ValueError, match="hash-family mismatch"):
            D.minhash_lsh_pairs_between(
                base, delta, "doc_id", "text", n=3, num_hashes=16,
                base_index=idx,
            )
        # and the matching family still works through the index path
        rows = D.minhash_lsh_pairs_between(
            base, delta, "doc_id", "text", n=3, num_hashes=24,
            base_index=idx,
        ).collect()
        assert len(rows) == 1

    def test_signature_distinguishes_hash_functions(self, spark):
        """The 24 salts must produce genuinely different hash functions
        (the degenerate form collapsed them all to one)."""
        df = spark.createDataFrame(
            [(1, ["a b c", "b c d", "c d e"])], "id long, sh array<string>"
        )
        sig = df.select(
            *[c.alias(f"h{i}") for i, c in enumerate(D.minhash_signature(F.col("sh"), 8))]
        ).collect()[0]
        assert len(set(sig)) > 1


class TestMinhashRecallAtThreshold:
    def test_recall_on_pairs_just_above_design_threshold(self, spark):
        """Recall stress at the 0.6 design threshold (the salt bug
        hid behind a corpus whose qualifying pairs were all >= 0.95
        Jaccard): 40 planted pairs at Jaccard ~= 0.613; with 24
        hashes in 12 bands of 2 the per-pair miss probability is
        (1 - 0.613^2)^12 ~= 0.4%, so demanding >= 36/40 found leaves
        ~10x slack while a single-hash degenerate (expected recall
        ~= J ~= 0.61) fails decisively."""
        rows = []
        for p in range(40):
            a = [f"p{p}w{i}" for i in range(52)]
            b = a[:40] + [f"p{p}v{i}" for i in range(12)]
            rows.append((2 * p, " ".join(a)))
            rows.append((2 * p + 1, " ".join(b)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = D.minhash_lsh_pairs(
            df, "doc_id", "text", n=3, num_hashes=24, band_rows=2, threshold=0.6
        ).collect()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        planted = {(2 * p, 2 * p + 1) for p in range(40)}
        assert found <= planted  # nothing spurious at this Jaccard
        for r in pairs:
            assert abs(r["jaccard"] - 38 / 62) < 1e-9
        assert len(found & planted) >= 36


class TestContainmentDenominator:
    def test_max_shingle_df_can_only_lower_containment(self, spark):
        """The precision-safety law: pruning boilerplate shingles from
        the join must never RAISE measured containment. Doc A shares
        7 of its 10 words with B (true containment 0.7 < 0.8); its
        other 3 words are boilerplate spread across filler docs. If
        the denominator were counted AFTER the df filter, A would
        score 7/7 = 1.0 and leak through the 0.8 threshold."""
        w = " ".join(f"w{i}" for i in range(7))
        boiler = "b1 b2 b3"
        rows = [
            (0, f"{w} {boiler}"),                                 # A
            (1, f"{w} " + " ".join(f"x{i}" for i in range(20))),  # B
            (2, w),                                               # C ⊂ A, B
        ]
        rows += [(10 + i, boiler) for i in range(5)]  # boilerplate fillers
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_inner"], r["doc_outer"]): (r["containment"], r["n_inner"])
            for r in D.containment_pairs(
                df, "doc_id", "text", n=1, threshold=0.8, max_shingle_df=5
            ).collect()
        }
        # A→B must NOT pass: denominator stays |A| = 10, containment 0.7
        assert (0, 1) not in got
        # the genuinely-contained doc still surfaces, with the full
        # (unfiltered) denominator reported
        assert got[(2, 0)] == (1.0, 7) and got[(2, 1)] == (1.0, 7)
        # filler-filler pairs were pruned away entirely (boilerplate
        # shingles never reach the join)
        assert all(a < 10 and b < 10 for a, b in got)


def test_semdedup_keeps_the_most_atypical_member(spark):
    from pycasselastic_spark.operators.dedup import semdedup_prune

    # a tight trio (near-identical directions) + two unrelated vectors
    base = [1.0] * 32 + [0.0] * 32
    tweak1 = list(base); tweak1[0] = 1.05
    tweak2 = list(base); tweak2[1] = 0.9
    other = [0.0] * 32 + [1.0] * 32
    lone = [1.0 if i % 2 else -1.0 for i in range(64)]
    df = spark.createDataFrame(
        [(1, base), (2, tweak1), (3, tweak2), (4, other), (5, lone)],
        ["vec_id", "embedding"],
    )
    out = semdedup_prune(df, "vec_id", "embedding", threshold=0.95)
    rows = out.collect()
    trio = [r for r in rows if r["vec_id"] in (1, 2, 3)]
    assert len(trio) == 3 and len({r["component"] for r in trio}) == 1
    keepers = [r["vec_id"] for r in trio if r["keep"]]
    assert len(keepers) == 1
    # the keeper is the member with the LOWEST cosine to the centroid
    by_cos = sorted(trio, key=lambda r: (r["cos_c_q20"], r["vec_id"]))
    assert keepers[0] == by_cos[0]["vec_id"]
    # unrelated vectors are not emitted (implicitly kept)
    assert all(r["vec_id"] not in (4, 5) for r in rows) or not any(
        r["vec_id"] in (4, 5) for r in rows
    )


def test_hard_negative_mining_picks_closest_other_label(spark):
    from pycasselastic_spark.operators.similarity import (
        hard_negative_mining,
    )

    a = [1.0] + [0.0] * 63
    near_a = [0.9] + [0.1] + [0.0] * 62      # other label, very close
    far = [0.0] * 32 + [1.0] + [0.0] * 31    # other label, orthogonal
    df = spark.createDataFrame(
        [(1, a, 0), (2, near_a, 1), (3, far, 1), (4, a, 0)],
        ["vec_id", "embedding", "label"],
    )
    out = {r["anchor_id"]: r for r in hard_negative_mining(
        df, "vec_id", "embedding", "label", n_anchors=4
    ).collect()}
    # every label-0 anchor's hardest negative is the near-duplicate
    # from label 1, never the orthogonal one
    assert out[1]["neg_id"] == 2 and out[4]["neg_id"] == 2
    # label-1 anchors mine from label 0 (ids 1 and 4 tie on cosine ->
    # smallest id wins)
    assert out[2]["neg_id"] == 1 and out[3]["neg_id"] == 1
