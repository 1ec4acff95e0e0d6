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
    # ROUND 9 gate rotation (COVERAGE.md): slots 0-3 are the four
    # post-gate round-8 registrations (judge-replayed green in r8, so
    # any failure is a NEW regression); slots 4-12 the nine queries
    # whose newest driver row is r5 (deferred from the r8 set);
    # slots 13-14 the two NEW round-9 queries (ES fuzziness=2 via the
    # depth-2 FastSS dictionary, and the daemon-cadence
    # auto-compaction maintenance contract); slots 15-49 the first 35
    # stale-r6 queries in their CORRECTNESS_r06 order (the remaining
    # 15 rotate in round 10).
    # --- slots 0-3: post-gate round-8 registrations ------------------
    "postings_index_health_documents",
    "search_highlight_documents",
    "more_like_this_documents",
    "fuzzy_bm25_search_documents",
    # --- slots 4-12: stale-r5 rows (newest driver row = r5) ----------
    "gap_fill_hourly_events",
    "stratified_sample_documents",
    "weighted_sample_documents",
    "shard_assignment_documents",
    "zorder_key_events",
    "label_centroid_embeddings",
    "tfidf_top_terms_per_doc",
    "streaming_sliding_window_events",
    "streaming_dedup_events",
    # --- slots 13-14: NEW round-9 queries ----------------------------
    "fuzzy2_bm25_search_documents",
    "auto_compacted_bm25_documents",
    # --- slots 15-49: stale-r6 rows, CORRECTNESS_r06 order -----------
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
    "bloom_prefilter_customers",
    "ivf_cell_quality_embeddings",
    "incremental_neardup_delta",
    "decontaminate_documents",
    "neardup_text_embedding_agreement",
    "streaming_countmin_events",
    "streaming_incremental_neardup",
    "anti_entropy_diff_events",
    "anti_entropy_repair_events",
    "key_skew_report_events",
    "gopher_rules_documents",
    "canonical_exact_dedup_documents",
    "exact_k_per_source_sample",
    "bloom_pruned_join_events",
    "time_rollup_events",
    "user_value_outliers_events",
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
