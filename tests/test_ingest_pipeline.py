"""ES ingest-processor chain: hand-checked processor laws, order
sensitivity, and raise-by-name strictness."""

from __future__ import annotations

import pytest

from pycasselastic_spark.operators.ingest_pipeline import simulate_pipeline


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "  Hello World 42 ", None), (2, "ABC", "keep")],
        "doc_id long, text string, tag string",
    )


def test_processors_apply_in_order(spark, docs):
    out = {r["doc_id"]: r for r in simulate_pipeline(docs, [
        {"trim": {"field": "text"}},
        {"lowercase": {"field": "text"}},
        {"gsub": {"field": "text", "pattern": "[0-9]+",
                  "replacement": "N"}},
        {"split": {"field": "text", "separator": " "}},
    ]).collect()}
    assert out[1]["text"] == ["hello", "world", "N"]
    assert out[2]["text"] == ["abc"]


def test_set_override_false_only_fills_nulls(spark, docs):
    out = {r["doc_id"]: r["tag"] for r in simulate_pipeline(docs, [
        {"set": {"field": "tag", "value": "filled", "override": False}},
    ]).collect()}
    assert out == {1: "filled", 2: "keep"}
    # override (default true) replaces everything
    out = {r["doc_id"]: r["tag"] for r in simulate_pipeline(docs, [
        {"set": {"field": "tag", "value": "x"}},
    ]).collect()}
    assert out == {1: "x", 2: "x"}


def test_rename_remove_convert(spark, docs):
    out = simulate_pipeline(docs, [
        {"rename": {"field": "tag", "target_field": "label"}},
        {"remove": {"field": "text"}},
        {"convert": {"field": "doc_id", "type": "string"}},
    ])
    assert set(out.columns) == {"doc_id", "label"}
    assert dict(out.dtypes)["doc_id"] == "string"
    # a malformed value FAILS the job (ANSI cast = ES's default
    # fail-the-document); ignore_failure=true maps to try_cast -> NULL
    bad = spark.createDataFrame([("x",), ("7",)], "v string")
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        simulate_pipeline(
            bad, [{"convert": {"field": "v", "type": "long"}}]
        ).collect()
    got = {r["v"] for r in simulate_pipeline(
        bad, [{"convert": {"field": "v", "type": "long",
                           "ignore_failure": True}}]
    ).collect()}
    assert got == {None, 7}


@pytest.mark.parametrize("procs,needle", [
    ([{"script": {"source": "ctx.x = 1"}}], "processor 'script'"),
    ([{"set": {"field": "tag", "value": 1, "if": "ctx.x"}}], "options"),
    ([{"convert": {"field": "tag", "type": "ip"}}], "convert type"),
    ([{"remove": {"field": "nope"}}], "remove field"),
    ([{"rename": {"field": "tag", "target_field": "text"}}],
     "already exists"),
    ([{"set": {"field": "a", "value": 1},
       "remove": {"field": "a"}}], "one name per entry"),
])
def test_pipeline_strictness(spark, docs, procs, needle):
    with pytest.raises(ValueError, match=needle):
        simulate_pipeline(docs, procs)


def test_pipeline_is_one_projection(spark, docs):
    """The whole chain must collapse into a single stage: no
    shuffles, no extra exchanges — the scan plus one projection."""
    out = simulate_pipeline(docs, [
        {"trim": {"field": "text"}},
        {"lowercase": {"field": "text"}},
        {"set": {"field": "tag", "value": "t"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
