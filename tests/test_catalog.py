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


def test_round11_gate_slots():
    """The driver hashes the FIRST 50 registered queries; the round-11
    rotation puts the five post-gate round-10 registrations in slots
    0-4, the five NEW round-11 queries in slots 5-9, and the first 40
    of the 45 stale-r7 rows in slots 10-49 (CORRECTNESS_r07 order).
    Pin the boundary slots so an accidental registration reorder is
    caught before the driver runs (COVERAGE.md enumerates the full
    list)."""
    names = list(QUERIES)
    assert names[0] == "es_dsl_search_documents"
    assert names[4] == "sorted_search_documents"
    assert names[5] == "stemmed_bm25_documents"
    assert names[6] == "synonym_bm25_documents"
    assert names[7] == "reindex_upgrade_stemmer_documents"
    assert names[8] == "object_field_search_documents"
    assert names[9] == "rollover_bm25_documents"
    assert names[10] == "cluster_aware_split_documents"
    assert names[49] == "streaming_stream_stream_join"
    # the gate is the FIRST 50; post-gate registrations grow the tail
    # every round (COVERAGE.md enumerates them), so pin a floor, not
    # an exact count — an accidental DEregistration still fails here
    assert len(names) >= 205
