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
    # ROUND 15 gate rotation (exactly the plan committed in round 14,
    # COVERAGE.md, with ONE documented swap): slots 0-28 are the 29
    # round-14 registrations in their registration order — none has
    # ever held a driver-green row; slots 29-49 take 21 of the 36
    # remaining stale-r9 rows. Per the committed plan those 21 are the
    # OLDEST in CORRECTNESS_r09 order; the one swap is
    # `bloom_pruned_join_events` (r9-stale, position 34 of 36) in
    # place of `bloom_prefilter_customers` (position 21): the
    # round-14 verdict (item 7) requires a driver-green row for the
    # r14-optimized bloom_pruned one-pass aggregation, and it is
    # itself a stale-r9 row, so the swap stays within the same cohort.
    # The remaining 15 stale-r9 rows (bloom_prefilter_customers,
    # ivf_cell_quality_embeddings, incremental_neardup_delta,
    # decontaminate_documents, neardup_text_embedding_agreement,
    # streaming_countmin_events, streaming_incremental_neardup,
    # anti_entropy_diff_events, anti_entropy_repair_events,
    # key_skew_report_events, gopher_rules_documents,
    # canonical_exact_dedup_documents, exact_k_per_source_sample,
    # time_rollup_events, user_value_outliers_events) head the
    # round-16 rotation (COVERAGE.md).
    # --- slots 0-28: round-14 registrations, registration order ------
    "query_string_fielded_documents",
    "moving_fn_documents",
    "span_or_documents",
    "span_not_documents",
    "significant_text_documents",
    "geo_bounding_box_events",
    "geo_distance_events",
    "rate_agg_documents",
    "boxplot_agg_documents",
    "top_metrics_documents",
    "geotile_grid_events",
    "geo_distance_ranges_events",
    "update_by_query_documents",
    "span_containing_documents",
    "ingest_pipeline_documents",
    "completion_suggest_documents",
    "runtime_field_documents",
    "bucket_script_documents",
    "normalize_agg_documents",
    "has_child_documents",
    "has_parent_documents",
    "string_stats_documents",
    "matrix_stats_events",
    "diversified_sampler_documents",
    "search_template_documents",
    "geohash_grid_events",
    "t_test_documents",
    "nb_classifier_documents",
    "bpe_train_documents",
    # --- slots 29-48: oldest stale-r9 rows, CORRECTNESS_r09 order ----
    "auto_compacted_bm25_documents",
    "string_suite_documents",
    "regex_suite_events",
    "null_handling_suite",
    "date_arithmetic_suite_orders",
    "window_function_suite_orders",
    "array_function_suite_embeddings",
    "explode_shingles_sample",
    "grouping_sets_orders",
    "range_frame_event_counts",
    "vocab_top_terms",
    "bigram_lm_score_documents",
    "ngram_novelty_documents",
    "source_balanced_sample_documents",
    "deterministic_shuffle_documents",
    "countmin_heavy_hitters_events",
    "embedding_quantize_stats",
    "histogram_order_prices",
    "fuzzy_match_customer_names",
    "passage_dedup_documents",
    # --- slot 49: documented swap (r14 verdict item 7) ---------------
    "bloom_pruned_join_events",
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
