"""Catalog smoke tests at sf0.001: every query runs, returns rows, has
stable column names, and the entry() contract holds. Full value-level
oracle verification runs via scripts/check_oracles.py at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from pycasselastic_spark.catalog import QUERIES

# Every catalog query currently returns rows at sf0.001 — that is a
# deliberate property (an accidentally-empty result would make the
# oracle hash trivially green), so the smoke test asserts non-empty
# for ALL queries. If a future query is legitimately empty at the tiny
# sf (selectivity-dependent), list it here WITH a comment saying why,
# and the smoke test will only check it runs.
MAY_BE_EMPTY: set[str] = set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "version", "text", "event_id", "source"}


def test_contract_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} returned no rows at {sf_dir}"
    # column names must be duplicate-free for the oracle hash compare
    assert len(df.columns) == len(set(df.columns))


def test_round12_gate_slots():
    """The driver hashes the FIRST 50 registered queries; the round-12
    rotation retires the LAST five stale-r7 rows in slots 0-4, puts
    the six NEW round-12 queries (phrase synonyms + reindex twin,
    exists/ids/terms_set, missing bucket) in slots 5-10, the twenty
    round-12 continuation queries in slots 11-30 (late nested-type /
    dv-query five + compound-scoring / aggregation / span-coverage /
    simple_query_string / best_fields / span-rewrite / knn-API /
    match_all / facet-stats / temperature-mixing fifteen), and the
    first 19 stale-r8 rows in slots 31-49
    (CORRECTNESS_r08 order). Pin the boundary slots so an accidental
    registration reorder is caught before the driver runs
    (COVERAGE.md enumerates the full list)."""
    names = list(QUERIES)
    assert names[0] == "range_join_value_buckets"
    assert names[4] == "applyinpandas_rank_events"
    assert names[5] == "multiword_synonym_bm25_documents"
    assert names[6] == "reindex_upgrade_multiword_documents"
    assert names[7] == "exists_query_documents"
    assert names[8] == "ids_query_documents"
    assert names[9] == "terms_set_documents"
    assert names[10] == "missing_bucket_facets_documents"
    assert names[11] == "range_query_documents"
    assert names[15] == "exists_filtered_bm25_documents"
    assert names[16] == "dis_max_bm25_documents"
    assert names[23] == "duplicate_span_coverage_documents"
    assert names[24] == "simple_query_string_documents"
    assert names[26] == "span_dedup_rewrite_documents"
    assert names[27] == "knn_search_api_embeddings"
    assert names[28] == "match_all_page_documents"
    assert names[29] == "facet_stats_agg_documents"
    assert names[30] == "temperature_mixture_sample_documents"
    assert names[31] == "streaming_lwwstore_replicate_events"
    assert names[49] == "q10_returned_items"
    # the gate is the FIRST 50; post-gate registrations grow the tail
    # every round (COVERAGE.md enumerates them), so pin a floor, not
    # an exact count — an accidental DEregistration still fails here
    assert len(names) >= 211
