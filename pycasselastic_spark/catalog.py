"""Query catalog: the engine's operator coverage as named, oracle-checked
queries over the driver corpus.

Every entry pairs a Spark implementation ``fn(spark, sf_dir) ->
DataFrame`` with (where SQL-expressible) an ANSI-SQL oracle DuckDB runs
on the same parquet tables. Column names/aliases are kept identical on
both sides — the driver's compare sorts columns by name and hashes
values.

Cross-engine determinism rules used throughout:
  * money doubles are summed in exact DECIMAL(18,2) space and cast back
    to double (see functions/aggregates.py) — float-sum order noise
    would break the value-hash;
  * every top-k / limit has a unique tiebreak column;
  * ``events.ts`` is nanos in parquet: Spark converts via
    sources/corpus.py (ns -> us truncation), oracles use
    ``CAST(ts AS TIMESTAMP)`` (same truncation);
  * timestamp gaps compare in exact integer microseconds.
"""


from __future__ import annotations

# The query definitions live in per-domain modules under
# ``pycasselastic_spark/queries/`` (split from the 6,600-line monolith
# in round 8); importing the package populates the shared registry.
# This module remains the single public entry point AND the single
# ordering authority (the driver gate hashes the first 50 dict entries;
# ``_GATE_PRIORITY`` below decides them).
import pycasselastic_spark.queries  # noqa: F401  (registration side-effects)
from pycasselastic_spark.queries.base import (  # noqa: F401
    QUERIES,
    QuerySpec,
    register,
    render_oracle,
    _STORES_SQL,
    _event_stores,
    _t,
)
from pycasselastic_spark.queries.pipeline_text import (  # noqa: F401
    _PII_EMAIL,
    _PII_PHONE,
    _PII_SSN,
    _jaccard_posting_sql,
    _SHINGLES_SQL,
)
from pycasselastic_spark.queries.streaming_q import (  # noqa: F401
    ROCKSDB_PROVIDER,
    _run_stream_to_parquet,
)
from pycasselastic_spark.queries.events_ops import (  # noqa: F401
    _transform_with_state_available,
)

# ---------------------------------------------------------------------------
# Driver-gate registration order. The driver's correctness gate hashes
# only the FIRST 50 registered queries per round (verified in round 4:
# CORRECTNESS_r04 covers registration indices 0-49 exactly), so
# registration order decides which queries get a hard driver-green row.
# Rounds 1-4 gated the same first 50; the 60 later registrations were
# verified only by the local sweep (scripts/check_oracles.py) and the
# sf0.001 pytest pass. This list moves those 60 to the front for round
# 5 — slots 0-49 are the 50 never-driver-checked queries with the most
# semantic risk (TPC-H join/agg shapes, sampling, layout, skew, scd2,
# streaming, multimodal, IVF/LSH embedding dedup); slots 50-59 are the
# remaining 10 (pure scalar-function suites, the lowest-risk family),
# picked up together with the original 50 in round 6. ``entry()`` and
# every test look queries up BY NAME, so reordering is behavior-neutral
# everywhere except the gate's slot assignment.
_GATE_PRIORITY: list[str] = [
    # ROUND 10 gate rotation (COVERAGE.md round-10 plan, executed):
    # slots 0-26 are the 27 post-gate round-9 registrations in their
    # registration order (judge-replayed green in the r9 oracle
    # replay, so any failure is a NEW regression); slots 27-41 the 15
    # stale-r6 queries that did not fit in round 9, in their
    # CORRECTNESS_r06 order; slots 42-44 the three NEW round-10
    # queries (the analyzer chain + its reindex-upgrade twin, and
    # depth-2 fuzzy entity matching); slots 45-49 the first 5
    # stale-r7 queries in CORRECTNESS_r07 order (the remaining 45
    # rotate in later rounds).
    # --- slots 0-26: post-gate round-9 registrations -----------------
    "min_should_match_bm25_documents",
    "search_after_bm25_documents",
    "multifield_bm25_documents",
    "reindex_upgrade_fuzzy2_documents",
    "bool_query_bm25_documents",
    "search_facets_documents",
    "suggest_terms_documents",
    "significant_terms_documents",
    "function_score_bm25_documents",
    "boosted_bm25_documents",
    "prefix_bm25_documents",
    "wildcard_bm25_documents",
    "match_phrase_prefix_documents",
    "rescore_bm25_documents",
    "top_hits_by_facet_documents",
    "composite_facets_after_documents",
    "regexp_bm25_documents",
    "decay_bm25_documents",
    "collapse_bm25_documents",
    "snapshot_probe_bm25_documents",
    "percolate_documents",
    "term_vectors_documents",
    "phrase_suggest_documents",
    "explain_score_documents",
    "hybrid_rrf_documents",
    "streaming_percolate_documents",
    "msearch_bm25_documents",
    # --- slots 27-41: stale-r6 rows, CORRECTNESS_r06 order -----------
    "streaming_approx_distinct_windows",
    "null_safe_join_events",
    "map_function_suite_documents",
    "dedup_graph_stats",
    "lww_merge_events",
    "incremental_scan_events",
    "anti_echo_documents",
    "conflict_losers_events",
    "convert_roundtrip_events",
    "schema_drift_union",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "streaming_lww_sync_events",
    "minhash_lsh_neardup",
    # --- slots 42-44: NEW round-10 queries ---------------------------
    "analyzed_bm25_documents",
    "reindex_upgrade_analyzer_documents",
    "fuzzy2_match_customer_names",
    # --- slots 45-49: stale-r7 rows, CORRECTNESS_r07 order -----------
    "inverted_index_documents",
    "bm25_search_documents",
    "tfidf_top_terms_documents",
    "phrase_search_documents",
    "containment_neardup_documents",
]


def _prioritize(order: list[str]) -> None:
    unknown = [n for n in order if n not in QUERIES]
    if unknown:
        raise ValueError(f"gate priority names not in catalog: {unknown}")
    seen: set[str] = set()
    front = [n for n in order if not (n in seen or seen.add(n))]
    rest = [n for n in QUERIES if n not in seen]
    reordered = {n: QUERIES[n] for n in [*front, *rest]}
    QUERIES.clear()
    QUERIES.update(reordered)


_prioritize(_GATE_PRIORITY)
