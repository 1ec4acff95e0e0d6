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
    from conftest import build_query_df

    df = build_query_df(spark, sf_dir, name)
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} returned no rows at {sf_dir}"
    # column names must be duplicate-free for the oracle hash compare
    assert len(df.columns) == len(set(df.columns))


def test_round15_gate_slots():
    """The driver hashes the FIRST 50 registered queries; the round-15
    rotation puts the 29 round-14 registrations (never driver-gated)
    in slots 0-28 in their registration order, backfills slots 29-48
    with the 20 OLDEST stale-r9 rows (CORRECTNESS_r09 order), and
    slot 49 holds the documented swap (`bloom_pruned_join_events`,
    r14 verdict item 7). Pin the boundary slots so an accidental
    registration reorder is caught before the driver runs
    (COVERAGE.md enumerates the full list)."""
    names = list(QUERIES)
    assert names[0] == "query_string_fielded_documents"
    assert names[12] == "update_by_query_documents"
    assert names[28] == "bpe_train_documents"
    assert names[29] == "auto_compacted_bm25_documents"
    assert names[39] == "vocab_top_terms"
    assert names[48] == "passage_dedup_documents"
    assert names[49] == "bloom_pruned_join_events"
    # the gate is the FIRST 50; post-gate registrations grow the tail
    # every round (COVERAGE.md enumerates them), so pin a floor, not
    # an exact count — an accidental DEregistration still fails here
    assert len(names) >= 238
