from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycasselastic_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Test-session core count: the suite runs at sf0.001, where wall
    # time is per-task/per-job fixed overhead, not compute — measured
    # on test_index_lifecycle.py: 152.7 s at local[32], 113.5 s at
    # local[8], 117.2 s at local[4]. Default to 8 so the driver's
    # verify completes inside its time budget (round-14 verdict item
    # 1); $SPARK_GRAFT_TEST_CPUS overrides (deliberately NOT
    # $SPARK_GRAFT_CPUS — the bench's core-count contract must not
    # leak into test plumbing, and vice versa). Tests that reason
    # about parallelism read spark.sparkContext.defaultParallelism
    # dynamically, so they hold at any setting.
    spark = get_spark(
        app_name="pycasselastic-tests",
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Shared catalog-query DataFrames. Index-building query fns execute their
# ingest ACTIONS eagerly when called, so every test that needs a query's
# DataFrame used to re-run the full ingest — the catalog smoke run and
# the catalog-wide plan lint together paid every ingest twice (~7 min of
# redundant suite wall at round-14 sizes). Tests that only READ the
# result (count, schema, plan text) share one built DataFrame per query
# name instead. Keyed by (sf_dir, name) so a non-default
# SPARK_GRAFT_TEST_SF_DIR run can't cross-contaminate; the cache lives
# for the pytest session only (it is process-local test plumbing, not a
# bench/oracle artifact — bench.py and check_oracles.py never import
# tests/).
_QUERY_DF_CACHE: dict = {}


def build_query_df(spark, sf_dir, name):
    """Build (or reuse) the DataFrame of catalog query ``name``."""
    from pycasselastic_spark.catalog import QUERIES

    key = (sf_dir, name)
    df = _QUERY_DF_CACHE.get(key)
    if df is None:
        df = QUERIES[name].fn(spark, sf_dir)
        _QUERY_DF_CACHE[key] = df
    return df
