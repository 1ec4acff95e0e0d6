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
    # ROUND 12 gate rotation (COVERAGE.md round-12 plan): slots 0-4
    # retire the LAST five stale-r7 rows (after this, no driver row in
    # the catalog is older than round 8); slots 5-10 the six NEW
    # round-12 queries (multi-word phrase synonyms + their
    # slot-stream-reconstruction reindex twin, and the stored
    # doc-values surface exists / ids / terms_set / terms-agg missing
    # bucket); slots 11-23 the THIRTEEN round-12 continuation queries
    # (never driver-checked: the late-r12 nested-type / top-level
    # range+terms / filter-context composition five, then the
    # compound-scoring + aggregation + span-coverage eight); slots
    # 24-30 the last seven continuation queries (simple_query_string,
    # best_fields, span rewrite, knn API, match_all, facet+stats
    # sub-agg, temperature mixing); slots 31-49 the first 19 stale-r8
    # rows in their CORRECTNESS_r08 order (the remaining 31 r8 rows
    # head the round-13 rotation — enumerated in COVERAGE.md).
    # --- slots 0-4: the last stale-r7 rows ---------------------------
    "range_join_value_buckets",
    "running_totals_orders",
    "pivot_orders_status",
    "percentile_stats_lineitem",
    "applyinpandas_rank_events",
    # --- slots 5-10: NEW round-12 queries ----------------------------
    "multiword_synonym_bm25_documents",
    "reindex_upgrade_multiword_documents",
    "exists_query_documents",
    "ids_query_documents",
    "terms_set_documents",
    "missing_bucket_facets_documents",
    # --- slots 11-15: late round-12 additions (nested type, dv
    # queries, filter-context composition) ----------------------------
    "range_query_documents",
    "terms_query_documents",
    "nested_query_documents",
    "nested_filtered_bm25_documents",
    "exists_filtered_bm25_documents",
    # --- slots 16-23: round-12 continuation (compound scoring, aggs,
    # span coverage) ---------------------------------------------------
    "dis_max_bm25_documents",
    "boosting_query_documents",
    "constant_score_sync_documents",
    "percentiles_agg_documents",
    "cardinality_agg_documents",
    "range_agg_documents",
    "date_histogram_agg_documents",
    "duplicate_span_coverage_documents",
    # --- slots 24-30: last continuation additions ---------------------
    "simple_query_string_documents",
    "best_fields_bm25_documents",
    "span_dedup_rewrite_documents",
    "knn_search_api_embeddings",
    "match_all_page_documents",
    "facet_stats_agg_documents",
    "temperature_mixture_sample_documents",
    # --- slots 31-49: stale-r8 rows, CORRECTNESS_r08 order -----------
    "streaming_lwwstore_replicate_events",
    "term_cooccurrence_pmi_documents",
    "json_extract_events",
    "full_outer_join_customer_orders",
    "bm25_indexed_search_documents",
    "bm25_delta_indexed_documents",
    "phrase_slop_search_documents",
    "approx_distinct_stats_events",
    "scd2_customer_history",
    "session_stats_events",
    "funnel_conversion_events",
    "retention_cohorts_events",
    "q2_min_price_supplier",
    "q4_priority_with_big_lineitem",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
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
