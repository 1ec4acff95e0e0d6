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


def test_round13_gate_slots():
    """The driver hashes the FIRST 50 registered queries; the round-13
    rotation retires the LAST 31 stale-r8 rows in slots 0-30 (their
    CORRECTNESS_r08 order — after this lands green no driver row is
    older than round 9), puts the seven NEW round-13 queries (kNN
    composition x3, sqs grammar, date_histogram fixed/zero-fill,
    multi_match phrase/cross_fields) in slots 31-37, and backfills
    slots 38-49 with the 12 OLDEST stale-r9 rows (CORRECTNESS_r09
    order). Pin the boundary slots so an accidental registration
    reorder is caught before the driver runs (COVERAGE.md enumerates
    the full list)."""
    names = list(QUERIES)
    assert names[0] == "q11_important_stock"
    assert names[13] == "having_frequent_buyers"
    assert names[14] == "skew_salted_agg_events"
    assert names[29] == "conjunctive_bm25_indexed_documents"
    assert names[30] == "streaming_indexed_search_documents"
    assert names[31] == "knn_filtered_search_embeddings"
    assert names[32] == "hybrid_knn_bm25_documents"
    assert names[33] == "hybrid_rrf_api_documents"
    assert names[34] == "sqs_phrase_prefix_documents"
    assert names[35] == "date_histogram_fixed_documents"
    assert names[36] == "phrase_multi_match_documents"
    assert names[37] == "cross_fields_bm25_documents"
    assert names[38] == "postings_index_health_documents"
    assert names[49] == "streaming_sliding_window_events"
    # the gate is the FIRST 50; post-gate registrations grow the tail
    # every round (COVERAGE.md enumerates them), so pin a floor, not
    # an exact count — an accidental DEregistration still fails here
    assert len(names) >= 238
