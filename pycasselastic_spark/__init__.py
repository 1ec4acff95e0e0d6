"""pycasselastic_spark — a PySpark-native analytics/sync engine.

Re-expresses the capabilities of the reference sync daemon
(AdrianoW/PyCassElastic, surveyed in SURVEY.md) as lazy
DataFrame -> DataFrame operators, and extends the surface with
relational, streaming, and LLM-data-pipeline operators designed for
cluster scale.

Quickstart (the reference's ``PyCassElastic(config).run()`` story)::

    from pycasselastic_spark import get_spark, load_table, lww_merge

    spark = get_spark()
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    state = lww_merge([events], "event_id", "ts")   # argmax per id

The stable operator surface is importable from the top level (lazily —
``import pycasselastic_spark`` itself stays cheap); everything else
lives in the documented submodules:

    core/       sync semantics: incremental scans, LWW merge, schema
                alignment, scalar conversions, anti-entropy diff
    operators/  relational & pipeline operators: top-k, as-of join,
                dedup (exact/minhash/simhash/embedding), similarity
                search, sampling, sketches, connected components,
                multimodal column plumbing
    functions/  scalar/column function suites (text analysis, money)
    sources/    source/sink registry (parquet/csv/json/jdbc; Cassandra &
                Elasticsearch adapters behind import-guards)
    plans/      plan-inspection helpers (pushdown/broadcast assertions)
    streaming/  Structured Streaming pipelines (windowed aggs,
                stateful operators, foreachBatch LWW sync)
    pipeline/   batch sync-cycle orchestration (the reference's run())
"""

from __future__ import annotations

__version__ = "0.7.0"

# name -> (submodule, attr); resolved lazily on first access (PEP 562)
# so `import pycasselastic_spark` does not pull pyspark until used.
_EXPORTS: dict[str, str] = {
    # session + corpus
    "get_spark": "session",
    "load_table": "sources.corpus",
    "register_views": "sources.corpus",
    # reference sync semantics (SURVEY.md §2.1)
    "lww_merge": "core.merge",
    "anti_echo": "core.merge",
    "conflict_losers": "core.merge",
    "scan_increment": "core.incremental",
    "WatermarkStore": "core.incremental",
    "schema_diff": "core.schema",
    "align_schemas": "core.schema",
    "append_with_evolution": "core.schema",
    "sync_once": "pipeline.sync",
    "run_cycle": "pipeline.sync",
    # anti-entropy
    "table_diff": "core.diff",
    "bucket_digests": "core.diff",
    # dedup family
    "exact_dedup": "operators.dedup",
    "ngram_jaccard_pairs": "operators.dedup",
    "minhash_lsh_pairs": "operators.dedup",
    "minhash_band_index": "operators.dedup",
    "minhash_lsh_pairs_between": "operators.dedup",
    "simhash_pairs": "operators.dedup",
    "embedding_cosine_pairs": "operators.dedup",
    "embedding_lsh_pairs": "operators.dedup",
    "embedding_ivf_pairs": "operators.dedup",
    "passage_duplicate_stats": "operators.dedup",
    "connected_components": "operators.components",
    "dedup_by_components": "operators.components",
    # similarity search
    "brute_force_topk": "operators.similarity",
    "lsh_topk": "operators.similarity",
    "ivf_topk": "operators.similarity",
    # relational extras
    "topk_per_group": "operators.relational",
    "asof_join": "operators.relational",
    "sessionize": "operators.relational",
    # sampling / sketches
    "deterministic_sample": "operators.sampling",
    "stratified_sample": "operators.sampling",
    "hash_shard": "operators.sampling",
    "bloom_build": "operators.sketches",
    "bloom_probe": "operators.sketches",
    "countmin_counters": "operators.sketches",
    "countmin_estimates": "operators.sketches",
    # text analysis
    "quality_score": "functions.text",
    "lang_id": "functions.text",
    "word_token_count": "functions.text",
    "content_fingerprint": "functions.text",
    # streaming
    "start_streaming_sync": "streaming.sync",
    "read_event_stream": "streaming.sync",
    "read_table_stream": "streaming.sync",
    # round-7 surface: search, containment, splits/caps, skew routing,
    # time travel
    "lww_snapshots": "core.merge",
    "containment_pairs": "operators.dedup",
    "inverted_index_stats": "operators.search",
    "bm25_topk": "operators.search",
    "tfidf_top_terms": "operators.search",
    "phrase_search": "operators.search",
    "per_group_cap": "operators.sampling",
    "group_consistent_split": "operators.sampling",
    "hybrid_skew_join": "operators.skew",
    "salted_join": "operators.skew",
    "register_lwwstore": "sources.pyds",
    "compact_lwwstore": "sources.pyds",
    # round-8 surface: the persisted, incrementally-maintained
    # postings index (always-fresh search — the reference's reason
    # for syncing into ES, natively)
    "PostingsIndex": "operators.search",
    "build_postings_index": "operators.search",
    "update_postings_index": "operators.search",
    "load_postings_index": "operators.search",
    "compact_postings_index": "operators.search",
    "bm25_topk_indexed": "operators.search",
    "bm25_topk_conjunctive": "operators.search",
    "phrase_slop_search": "operators.search",
    "index_health": "operators.search",
    "highlight_snippets": "operators.search",
    "start_streaming_index_maintenance": "operators.search",
    "more_like_this": "operators.search",
    "doc_top_terms": "operators.search",
    "bm25_topk_fuzzy": "operators.search",
    "expand_fuzzy_terms": "operators.search",
    # round-9 surface: daemon-cadence self-maintenance and the rest of
    # the ES query DSL, all served from the stored index
    "CompactionPolicy": "operators.search",
    "ingest_into_postings_index": "operators.search",
    "bm25_topk_min_should_match": "operators.search",
    "bm25_search_after": "operators.search",
    "bm25_topk_multifield": "operators.search",
    "bm25_bool_query": "operators.search",
    "bm25_function_score": "operators.search",
    "search_facets": "operators.search",
    "suggest_terms": "operators.search",
    "significant_terms": "operators.search",
    "bm25_topk_boosted": "operators.search",
    "bm25_topk_prefix": "operators.search",
    "bm25_topk_wildcard": "operators.search",
    "bm25_topk_regexp": "operators.search",
    "match_phrase_prefix": "operators.search",
    "bm25_rescore": "operators.search",
    "top_hits_by_facet": "operators.search",
    "search_facets_after": "operators.search",
    "bm25_decay_score": "operators.search",
    "bm25_collapse": "operators.search",
    "snapshot_postings_index": "operators.search",
    "percolate": "operators.search",
    "term_vectors": "operators.search",
    "set_index_alias": "operators.search",
    "resolve_index_alias": "operators.search",
    "load_postings_index_by_alias": "operators.search",
    "suggest_phrase": "operators.search",
    "explain_score": "operators.search",
    "hybrid_rrf_search": "operators.search",
    "bm25_msearch": "operators.search",
    # round-10/11 surface: the ES _search dispatcher, analyzer chain,
    # doc-values filter context, and ILM rollover families
    "es_search": "operators.search",
    "Analyzer": "operators.search",
    "bm25_topk_filtered": "operators.search",
    "search_stats_agg": "operators.search",
    "search_histogram_agg": "operators.search",
    "search_sort_by_field": "operators.search",
    "reindex_postings_index": "operators.search",
    "RolloverPolicy": "operators.search",
    "ingest_with_rollover": "operators.search",
    "rollover_bm25_topk": "operators.search",
    "load_family": "operators.search",
    "write_index_path": "operators.search",
    # round-12 surface: stored-doc-values queries
    "search_exists": "operators.search",
    "search_ids": "operators.search",
    "terms_set_search": "operators.search",
    "search_dv_range": "operators.search",
    "search_dv_terms": "operators.search",
    "search_nested": "operators.search",
    # round-13 surface: the Lucene query_string grammar, the _count /
    # _mget endpoints, and the training-data curation additions
    "query_string_search": "operators.search",
    "es_count": "operators.search",
    "es_mget": "operators.search",
    "semdedup_prune": "operators.dedup",
    "unimax_allocation": "operators.sampling",
    "unimax_sample": "operators.sampling",
    "hard_negative_mining": "operators.similarity",
    # round-14 surface: geo queries, join-field parent/child, the
    # template/ingest/analyze APIs, and the pipeline-agg completions
    "geo_bounding_box": "operators.geo",
    "geo_distance": "operators.geo",
    "geo_distance_ranges": "operators.geo",
    "geotile_cells": "operators.geo",
    "geohash_cells": "operators.geo",
    "es_search_template": "operators.search",
    "es_msearch_template": "operators.search",
    "has_child_search": "operators.search",
    "has_parent_search": "operators.search",
    "matrix_stats_2d": "operators.search",
    "search_string_stats_agg": "operators.search",
    "update_by_query": "operators.search",
    "es_analyze": "operators.search",
    "suggest_completion": "operators.search",
    "simulate_pipeline": "operators.ingest_pipeline",
    "nb_train": "operators.classify",
    "nb_score": "operators.classify",
    "bpe_train": "operators.bpe",
    "bpe_segment": "operators.bpe",
}

__all__ = ["__version__", *sorted(_EXPORTS)]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f"{__name__}.{mod}"), name)


def __dir__() -> list[str]:
    return sorted(set(globals()) | set(_EXPORTS))
