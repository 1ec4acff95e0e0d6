"""ES join-field (has_child / has_parent) laws over a hand-counted
fixture: score modes, type validation, and the mapping contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.operators.search_api import es_search

Q20 = 1 << 20


@pytest.fixture(scope="module")
def join_idx(spark, tmp_path_factory):
    # posts 10, 20 (parents); comments 11,12 -> 10 and 21 -> 20;
    # doc 30 is a comment whose parent is ABSENT from the corpus
    rows = [
        (10, "post about spark"),
        (20, "post about ducks"),
        (11, "alpha alpha"),
        (12, "alpha beta"),
        (21, "alpha"),
        (30, "alpha orphan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("joinidx") / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    idx = SRCH.load_postings_index(spark, path)
    jf = spark.createDataFrame(
        [
            (10, "post", None),
            (20, "post", None),
            (11, "comment", 10),
            (12, "comment", 10),
            (21, "comment", 20),
            (30, "comment", 99),
        ],
        "doc_id long, join_name string, parent long",
    )
    return idx, jf


REL = {"post": "comment"}


def _scores(idx, terms):
    rows = SRCH.bm25_topk_indexed(idx, terms, k=100).collect()
    return {r["doc_id"]: r["score_q20"] for r in rows}


def test_has_child_sum_and_count(join_idx):
    idx, jf = join_idx
    out = es_search(idx, {
        "query": {"has_child": {
            "type": "comment",
            "query": {"match": {"text": "alpha"}},
            "score_mode": "sum",
        }},
    }, join_field=jf, join_relations=REL).collect()
    s = _scores(idx, ["alpha"])
    got = {r["parent_id"]: (r["n_children"], r["score_q20"]) for r in out}
    # orphan comment 30's parent 99 is not a post -> dropped
    assert got == {
        10: (2, s[11] + s[12]),
        20: (1, s[21]),
    }


def test_has_child_score_modes(join_idx):
    idx, jf = join_idx
    s = _scores(idx, ["alpha"])

    def run(mode):
        out = es_search(idx, {
            "query": {"has_child": {
                "type": "comment",
                "query": {"match": {"text": "alpha"}},
                "score_mode": mode,
            }},
        }, join_field=jf, join_relations=REL).collect()
        return {r["parent_id"]: r["score_q20"] for r in out}

    assert run("none") == {10: Q20, 20: Q20}
    assert run("max") == {10: max(s[11], s[12]), 20: s[21]}
    assert run("min") == {10: min(s[11], s[12]), 20: s[21]}
    assert run("avg") == {10: (s[11] + s[12]) // 2, 20: s[21]}


def test_has_parent_propagates_parent_score(join_idx):
    idx, jf = join_idx
    out = es_search(idx, {
        "query": {"has_parent": {
            "parent_type": "post",
            "query": {"match": {"text": "spark"}},
            "score": True,
        }},
    }, join_field=jf, join_relations=REL).collect()
    s = _scores(idx, ["spark"])
    # only post 10 matches 'spark'; its two comments inherit its score
    assert {(r["child_id"], r["parent_id"], r["score_q20"])
            for r in out} == {(11, 10, s[10]), (12, 10, s[10])}


def test_has_parent_filter_context_constant_score(join_idx):
    idx, jf = join_idx
    out = es_search(idx, {
        "query": {"has_parent": {
            "parent_type": "post",
            "query": {"match": {"text": "post"}},
            "score": False,
        }},
    }, join_field=jf, join_relations=REL).collect()
    assert all(r["score_q20"] == Q20 for r in out)
    assert {r["child_id"] for r in out} == {11, 12, 21}


def test_join_field_strictness(join_idx):
    idx, jf = join_idx
    base = {"query": {"match": {"text": "alpha"}}}
    with pytest.raises(ValueError, match="join_field"):
        es_search(idx, {"query": {"has_child": {
            "type": "comment", "query": base["query"],
        }}})
    with pytest.raises(ValueError, match="not a declared child"):
        es_search(idx, {"query": {"has_child": {
            "type": "nope", "query": base["query"],
        }}}, join_field=jf, join_relations=REL)
    with pytest.raises(ValueError, match="not a declared parent"):
        es_search(idx, {"query": {"has_parent": {
            "parent_type": "comment", "query": base["query"],
        }}}, join_field=jf, join_relations=REL)
    with pytest.raises(ValueError, match="score_mode"):
        es_search(idx, {"query": {"has_child": {
            "type": "comment", "query": base["query"],
            "score_mode": "median",
        }}}, join_field=jf, join_relations=REL)
    # a child type declared under two parents violates the ES mapping
    with pytest.raises(ValueError, match="two parents"):
        es_search(idx, {"query": {"has_child": {
            "type": "comment", "query": base["query"],
        }}}, join_field=jf,
            join_relations={"post": "comment", "page": ["comment"]})
    # join relation missing the parent column raises by name
    with pytest.raises(ValueError, match="parent"):
        es_search(idx, {"query": {"has_child": {
            "type": "comment", "query": base["query"],
        }}}, join_field=jf.drop("parent"), join_relations=REL)
