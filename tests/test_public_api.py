"""The top-level import surface: every name in ``__all__`` resolves,
and the quickstart (session -> corpus -> LWW merge -> dedup) runs
importing ONLY from the package top level — the "library a real user
imports" contract (reference ergonomics: ``PyCassElastic(config).run()``)."""

from __future__ import annotations

import pycasselastic_spark as pce


def test_all_exports_resolve():
    for name in pce.__all__:
        assert getattr(pce, name) is not None, name


def test_dir_lists_exports():
    listing = dir(pce)
    for name in ("lww_merge", "minhash_lsh_pairs", "get_spark"):
        assert name in listing


def test_unknown_attribute_raises():
    import pytest

    with pytest.raises(AttributeError):
        pce.definitely_not_an_export


def test_quickstart_top_level_only(spark, sf_dir):
    from pyspark.sql import functions as F

    events = pce.load_table(spark, sf_dir, "events")
    state = pce.lww_merge(
        [events.select("event_id", "ts", "user_id", "value")], "event_id", "ts"
    )
    assert state.count() == state.select("event_id").distinct().count()

    docs = pce.load_table(spark, sf_dir, "documents")
    survivors = pce.exact_dedup(docs, ["text"], "doc_id")
    assert 0 < survivors.count() <= docs.count()

    pairs = pce.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    assert pairs.filter(F.col("jaccard") < 0.6).count() == 0
