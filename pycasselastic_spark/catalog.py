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
    # ROUND 13 gate rotation (exactly the plan committed in round 12,
    # COVERAGE.md): slots 0-30 retire the LAST 31 stale-r8 rows in
    # their CORRECTNESS_r08 order — after CORRECTNESS_r13 lands green,
    # no driver row in the catalog is older than round 9; slots 31-37
    # the seven NEW round-13 queries (kNN composition: filtered /
    # additive hybrid / rrf retriever; simple_query_string
    # phrase+prefix grammar; date_histogram fixed_interval with
    # zero-fill; multi_match phrase / cross_fields); slots 38-49 the
    # 12 OLDEST stale-r9 rows in their CORRECTNESS_r09 order (the
    # remaining 38 r9 rows head the round-14 rotation — enumerated in
    # COVERAGE.md).
    # --- slots 0-30: the last stale-r8 rows, CORRECTNESS_r08 order ---
    "q11_important_stock",
    "q12_late_lines_by_priority",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q20_part_supplier_chain",
    "q21_sole_supplier_orders",
    "q22_idle_rich_customers",
    "orders_above_customer_avg",
    "having_frequent_buyers",
    "skew_salted_agg_events",
    "salted_join_events_customer",
    "neardup_cluster_dedup",
    "embedding_lsh_neardup",
    "embedding_ivf_neardup",
    "cosine_topk_ivf",
    "contamination_overlap",
    "curation_pipeline_documents",
    "udtf_chunk_documents",
    "multimodal_ppm_decode_stats",
    "multimodal_ppm_resize",
    "multimodal_image_resize",
    "multimodal_audio_resample",
    "streaming_stateful_first_event",
    "streaming_session_window_events",
    "conjunctive_bm25_indexed_documents",
    "streaming_indexed_search_documents",
    # --- slots 31-37: NEW round-13 queries ----------------------------
    "knn_filtered_search_embeddings",
    "hybrid_knn_bm25_documents",
    "hybrid_rrf_api_documents",
    "sqs_phrase_prefix_documents",
    "date_histogram_fixed_documents",
    "phrase_multi_match_documents",
    "cross_fields_bm25_documents",
    # --- slots 38-49: oldest stale-r9 rows, CORRECTNESS_r09 order -----
    "postings_index_health_documents",
    "search_highlight_documents",
    "more_like_this_documents",
    "fuzzy_bm25_search_documents",
    "gap_fill_hourly_events",
    "stratified_sample_documents",
    "weighted_sample_documents",
    "shard_assignment_documents",
    "zorder_key_events",
    "label_centroid_embeddings",
    "tfidf_top_terms_per_doc",
    "streaming_sliding_window_events",
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
