"""kNN retrieval composition (operators/search_hybrid.py) and its
``es_search`` dispatch: filtered kNN, the default additive hybrid,
and the ``rank: {rrf}`` retriever — plus the round-12 advisor fixes
(dict match bodies under sort/aggs/collapse, floor-quantized
constant_score boost, Q20-summed fractional facet metrics).

Semantics are checked against the engine's own standalone legs: the
hybrid laws are pure integer combinations of already-pinned probes,
so each test recomputes the combination from the legs and demands
exact equality.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.operators.search_api import es_search
from pycasselastic_spark.operators.search_hybrid import (
    filtered_ids,
    hybrid_knn_bm25,
    hybrid_rrf_from_vector,
    knn_literal_topk,
)
from pycasselastic_spark.operators.search_index import Q20


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "spark join shuffle join", 10, "x"),
            (2, "spark filter scan", 20, "y"),
            (3, "join join broadcast window", 30, "x"),
            (4, "scan scan filter pushdown spark", 40, "z"),
            (5, "unrelated words only here", 50, None),
        ],
        "doc_id long, text string, val long, tag string",
    )
    path = str(tmp_path_factory.mktemp("hybrid") / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["val", "tag"],
    )
    return SRCH.load_postings_index(spark, path)


@pytest.fixture(scope="module")
def emb(spark):
    # vec_id aligns with doc_id; vectors chosen so cosine order vs
    # [1, 0, 0] is hand-readable: 1 ~ exact, 2 close, 3 orthogonal-ish
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.5, 0.5, 0.0]),
        (5, [0.1, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


QV = [1.0, 0.0, 0.0]


def test_knn_literal_topk_exact_order(emb):
    got = knn_literal_topk(emb, QV, k=3).collect()
    assert [r["match_id"] for r in got] == [1, 2, 4]
    assert got[0]["cosine"] == pytest.approx(1.0)


def test_knn_filter_restricts_before_topk(idx, emb):
    # filter tag='x' allows only docs 1 and 3 — doc 2 (closer than 3)
    # must NOT appear: the filter applies DURING search, not after
    allowed = filtered_ids(idx, [("tag", "=", "x")]).withColumnRenamed(
        "doc_id", "vec_id"
    )
    got = knn_literal_topk(emb, QV, k=2, allowed_ids=allowed).collect()
    assert [r["match_id"] for r in got] == [1, 3]


def test_knn_literal_missing_columns_raise(emb):
    with pytest.raises(ValueError, match="knn column"):
        knn_literal_topk(emb.withColumnRenamed("vec_id", "id"), QV, k=2)
    with pytest.raises(ValueError, match="knn column"):
        knn_literal_topk(emb, QV, k=2, vec_col="vector")


def test_hybrid_additive_is_lex_plus_boosted_cosine(idx, emb):
    terms = ["spark", "join"]
    lex = {
        r["doc_id"]: r["score_q20"]
        for r in SRCH.bm25_topk_indexed(idx, terms, k=100).collect()
    }
    knn = {
        r["match_id"]: r["cosine"]
        for r in knn_literal_topk(emb, QV, k=3).collect()
    }
    got = hybrid_knn_bm25(
        idx, emb, terms, QV, k=10, knn_k=3, knn_boost=0.5
    ).collect()
    ids = set(lex) | set(knn)
    assert {r["doc_id"] for r in got} == ids
    for r in got:
        want_knn = (
            math.floor(knn[r["doc_id"]] * 0.5 * Q20)
            if r["doc_id"] in knn else None
        )
        assert r["knn_q20"] == want_knn
        assert r["lex_q20"] == lex.get(r["doc_id"])
        assert r["score_q20"] == (r["lex_q20"] or 0) + (r["knn_q20"] or 0)


def test_hybrid_rrf_fuses_leg_ranks(idx, emb):
    terms = ["spark", "join"]
    lex_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            SRCH.bm25_topk_indexed(idx, terms, k=3).collect()
        )
    }
    knn_rank = {
        r["match_id"]: i + 1
        for i, r in enumerate(knn_literal_topk(emb, QV, k=3).collect())
    }
    got = hybrid_rrf_from_vector(
        idx, emb, terms, QV, k=10, k_rrf=60, n_text=3, n_knn=3
    ).collect()
    for r in got:
        want = math.floor(
            (
                (1.0 / (60.0 + lex_rank[r["doc_id"]])
                 if r["doc_id"] in lex_rank else 0.0)
                + (1.0 / (60.0 + knn_rank[r["doc_id"]])
                   if r["doc_id"] in knn_rank else 0.0)
            ) * Q20
        )
        assert r["rrf_q20"] == want


def test_es_search_dispatches_hybrid_and_rrf(idx, emb):
    body = {
        "query": {"match": {"text": "spark join"}},
        "knn": {"field": "embedding", "query_vector": QV, "k": 3,
                "boost": 0.5},
        "size": 10,
    }
    via_api = es_search(idx, body, embeddings=emb).collect()
    direct = hybrid_knn_bm25(
        idx, emb, ["spark", "join"], QV, k=10, knn_k=3, knn_boost=0.5
    ).collect()
    assert via_api == direct

    body_rrf = {
        "query": {"match": {"text": "spark join"}},
        "knn": {"field": "embedding", "query_vector": QV, "k": 3},
        "rank": {"rrf": {"rank_window_size": 3, "rank_constant": 60}},
        "size": 10,
    }
    via_api = es_search(idx, body_rrf, embeddings=emb).collect()
    direct = hybrid_rrf_from_vector(
        idx, emb, ["spark", "join"], QV, k=10, k_rrf=60, n_text=3, n_knn=3
    ).collect()
    assert via_api == direct


def test_es_search_dispatches_knn_filter(idx, emb):
    got = es_search(idx, {
        "knn": {"field": "embedding", "query_vector": QV, "k": 2,
                "filter": {"term": {"tag": "x"}}},
    }, embeddings=emb).collect()
    assert [r["vec_id"] for r in got] == [1, 3]


def test_knn_similarity_cutoff(idx, emb):
    # without the cutoff: [1, 2, 4]; cosine of doc 4 ([.5,.5,0]) vs
    # [1,0,0] is ~0.707 — a 0.9 cutoff keeps only 1 and 2
    got = es_search(idx, {
        "knn": {"field": "embedding", "query_vector": QV, "k": 3,
                "similarity": 0.9},
    }, embeddings=emb).collect()
    assert [r["vec_id"] for r in got] == [1, 2]
    assert all(r["cosine"] >= 0.9 for r in got)
    with pytest.raises(ValueError, match="similarity under a hybrid"):
        es_search(idx, {
            "query": {"match": {"text": "spark"}},
            "knn": {"field": "embedding", "query_vector": QV,
                    "similarity": 0.9},
        }, embeddings=emb)


def test_hybrid_dispatch_strictness(idx, emb):
    with pytest.raises(ValueError, match="rank without"):
        es_search(idx, {
            "query": {"match": {"text": "spark"}},
            "rank": {"rrf": {}},
        })
    with pytest.raises(ValueError, match="knn boost without"):
        es_search(idx, {
            "knn": {"field": "embedding", "query_vector": QV, "boost": 2.0},
        }, embeddings=emb)
    with pytest.raises(ValueError, match="query type"):
        es_search(idx, {
            "query": {"term": {"text": "spark"}},
            "knn": {"field": "embedding", "query_vector": QV},
        }, embeddings=emb)
    with pytest.raises(ValueError, match="rank type"):
        es_search(idx, {
            "query": {"match": {"text": "spark"}},
            "knn": {"field": "embedding", "query_vector": QV},
            "rank": {"linear": {}},
        }, embeddings=emb)
    with pytest.raises(ValueError, match="rrf options"):
        es_search(idx, {
            "query": {"match": {"text": "spark"}},
            "knn": {"field": "embedding", "query_vector": QV},
            "rank": {"rrf": {"window": 9}},
        }, embeddings=emb)
    with pytest.raises(ValueError, match="knn options"):
        # query_vector_builder (server-side embedding) has no model
        # to run here — must raise, never silently skip
        es_search(idx, {
            "knn": {"field": "embedding", "query_vector": QV,
                    "query_vector_builder": {"text_embedding": {}}},
        }, embeddings=emb)


def test_multi_knn_sums_leg_contributions(idx, emb):
    from pycasselastic_spark.operators.search_hybrid import multi_knn_bm25

    qa, qb = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    legs = {
        v: {
            r["match_id"]: math.floor(r["cosine"] * b * Q20)
            for r in knn_literal_topk(emb, v_, k=2).collect()
        }
        for v, (v_, b) in {"a": (qa, 1.0), "b": (qb, 0.5)}.items()
    }
    # recompute leg b with its boost
    legs["b"] = {
        r["match_id"]: math.floor(r["cosine"] * 0.5 * Q20)
        for r in knn_literal_topk(emb, qb, k=2).collect()
    }
    got = {
        r["doc_id"]: r["score_q20"]
        for r in multi_knn_bm25(
            idx, emb, None,
            [{"vec": qa, "k": 2, "boost": 1.0, "vec_col": "embedding"},
             {"vec": qb, "k": 2, "boost": 0.5, "vec_col": "embedding"}],
            k=10,
        ).collect()
    }
    want = {}
    for leg in legs.values():
        for i, s in leg.items():
            want[i] = want.get(i, 0) + s
    assert got == want
    # dispatch: list form of the knn key
    via_api = es_search(idx, {
        "knn": [
            {"field": "embedding", "query_vector": qa, "k": 2},
            {"field": "embedding", "query_vector": qb, "k": 2,
             "boost": 0.5},
        ],
    }, embeddings=emb).collect()
    direct = multi_knn_bm25(
        idx, emb, None,
        [{"vec": qa, "k": 2, "boost": 1.0, "vec_col": "embedding"},
         {"vec": qb, "k": 2, "boost": 0.5, "vec_col": "embedding"}],
        k=10,
    ).collect()
    assert via_api == direct
    with pytest.raises(ValueError, match="rank with a multi-clause"):
        es_search(idx, {
            "query": {"match": {"text": "spark"}},
            "knn": [{"field": "embedding", "query_vector": qa}],
            "rank": {"rrf": {}},
        }, embeddings=emb)


# --- round-12 advisor fixes --------------------------------------------------


def test_dict_match_body_under_aggs_sort_collapse_raises(idx):
    # a dict match spec with operator/fuzziness must RAISE in the
    # sort/aggs/collapse branches — its repr used to be analyzed as
    # query text, silently yielding a garbage hit set
    dict_q = {"match": {"text": {"query": "spark", "operator": "and"}}}
    with pytest.raises(ValueError, match="match options"):
        es_search(idx, {
            "query": dict_q,
            "aggs": {"v": {"stats": {"field": "val"}}},
        })
    with pytest.raises(ValueError, match="match options"):
        es_search(idx, {"query": dict_q, "sort": [{"val": "asc"}]})
    # the bare {"query": ...} dict form IS dispatched (it carries no
    # undispatchable options)
    plain = es_search(idx, {
        "query": {"match": {"text": {"query": "spark"}}},
        "aggs": {"v": {"stats": {"field": "val"}}},
    }).collect()
    via_text = es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"v": {"stats": {"field": "val"}}},
    }).collect()
    assert plain == via_text


def test_constant_score_boost_floor_quantizes(idx):
    from pycasselastic_spark.operators.search_compose import (
        constant_score_search,
    )

    got = constant_score_search(
        idx, [("val", ">=", 10)], boost=0.3, k=10
    ).collect()
    assert all(r["score_q20"] == math.floor(0.3 * Q20) for r in got)


def test_facet_metric_fractional_sum_is_q20(spark, tmp_path):
    from pycasselastic_spark.operators.search_compose import (
        search_facet_metric_agg,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", "x", 0.5), (2, "alpha", "x", 0.25),
         (3, "alpha", "y", 1.75)],
        "doc_id long, text string, tag string, score double",
    )
    path = str(tmp_path / "fracidx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=2,
        stored_fields=["tag", "score"],
    )
    fidx = SRCH.load_postings_index(spark, path)
    got = {
        r["bucket"]: r["sum_val"]
        for r in search_facet_metric_agg(
            fidx, ["alpha"], "tag", "score"
        ).collect()
    }
    # fractional metric: per-value Q20 pre-quantization, integer sum
    # (order-independent) — NOT a truncating cast of a double sum
    assert got == {
        "x": math.floor(0.5 * Q20) + math.floor(0.25 * Q20),
        "y": math.floor(1.75 * Q20),
    }
