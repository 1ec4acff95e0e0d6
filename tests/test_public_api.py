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


def test_quickstart_search_and_store_surface(spark, sf_dir, tmp_path):
    """The round-7 README quickstart lines must work verbatim through
    top-level imports: BM25 search over the corpus, and the daemon
    loop through the pluggable lwwstore (batch write + streaming
    read)."""
    docs = pce.load_table(spark, sf_dir, "documents")
    hits = pce.bm25_topk(docs, "doc_id", "text", ["spark", "merge"], k=10)
    assert 0 < hits.count() <= 10

    pce.register_lwwstore(spark)
    store = str(tmp_path / "store")
    events = pce.load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    state = events.select(
        F.col("event_id").alias("id"),
        F.unix_millis("ts").alias("version"),
        F.col("event_type").alias("text"),
        F.lit("S").alias("source"),
    )
    # .mode is required: Python data sources reject the default
    # ErrorIfExists save mode (only Append/Overwrite) — the README
    # quickstart shows .mode("append") for exactly this reason
    state.write.format("lwwstore").option("path", store).mode("append").save()
    increments = (
        spark.readStream.format("lwwstore").option("path", store).load()
    )
    assert increments.isStreaming
    back = spark.read.format("lwwstore").option("path", store).load()
    assert back.count() == state.count()
