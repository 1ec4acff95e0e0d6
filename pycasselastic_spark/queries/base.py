"""Query registry + shared corpus fixtures for the catalog package.

Split out of the monolithic catalog.py (round 8). The engine's operator coverage as named, oracle-checked
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

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import anti_echo, conflict_losers, lww_merge
from pycasselastic_spark.core.incremental import scan_increment
from pycasselastic_spark.core.schema import align_schemas
from pycasselastic_spark.functions.aggregates import money, money_expr_sum, money_sum
from pycasselastic_spark.operators.relational import (
    asof_join,
    sessionize,
    topk_per_group,
)
from pycasselastic_spark.sources.corpus import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    # str: static ANSI SQL; callable: rendered per sf_dir at check time
    # (for oracles that embed data-derived constants, e.g. trained IVF
    # centroids); None: rows-only check
    oracle: str | Callable[[str], str | None] | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def render_oracle(name: str, sf_dir: str) -> str | None:
    """The DuckDB oracle SQL for ``name`` against the corpus at
    ``sf_dir`` — static SQL as-is, callable oracles rendered (they may
    return None to degrade to a rows-only check, e.g. when a
    data-derived constant can't be replayed at this scale)."""
    oracle = QUERIES[name].oracle
    if callable(oracle):
        return oracle(sf_dir)
    return oracle


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Sync core (reference operators O1-O8, SURVEY.md §2.1) modeled on the
# events table: id = user_id, version = epoch millis of ts, two "stores"
# split by event_id parity with provenance tags.
# ---------------------------------------------------------------------------

_STORES_SQL = """
base AS (
  SELECT user_id AS id,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS version,
         event_type AS text,
         event_id,
         CASE WHEN event_id % 2 = 1 THEN 'CASSANDRA' ELSE 'Elastic' END AS source
  FROM events
)
"""


def _event_stores(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    base = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("id"),
        F.unix_millis("ts").alias("version"),
        F.col("event_type").alias("text"),
        "event_id",
        F.when(F.col("event_id") % 2 == 1, "CASSANDRA")
        .otherwise("Elastic")
        .alias("source"),
    )
    return (
        base.filter(F.col("event_id") % 2 == 1),
        base.filter(F.col("event_id") % 2 == 0),
    )
