"""Oracle output-type lint: the driver hashes TYPED DuckDB values, so an
oracle output column whose DuckDB type has no exact Spark twin silently
breaks the value-hash even when the numbers are equal.  Round-1 regression:
``sessionize_events`` emitted an uncast window ``SUM`` (DuckDB HUGEINT) that
hashed differently from Spark's BIGINT while the local checker — which
coerces to Python ints — stayed green.

This test plans every registered oracle through DuckDB (relation API — no
execution of the full query) and rejects any output column typed as
HUGEINT / unsigned-int / DECIMAL.  The catalog's determinism rules require
SUM/COUNT-derived outputs cast to BIGINT and money sums cast to DOUBLE.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FORBIDDEN = ("HUGEINT", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_hash_unsafe_oracle_output_types(con):
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        if sql is None:
            continue
        rel = con.sql(sql)
        flagged = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if any(k in str(typ) for k in FORBIDDEN)
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracle output columns with hash-unsafe DuckDB types "
        f"(cast to BIGINT/DOUBLE): {offenders}"
    )
