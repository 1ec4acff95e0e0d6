"""Loader for the driver-generated parquet corpus (TESTDATA.md).

``events.ts`` has been written two different ways across corpus
generations, and this loader absorbs both so every downstream operator
sees a plain UTC ``TimestampType``:

- parquet TIMESTAMP(NANOS): Spark SQL has no nanosecond type. With
  ``spark.sql.legacy.parquet.nanosAsLong`` (set in ``session.get_spark``)
  it scans as a long of nanoseconds; we convert via exact integer
  division to microsecond TimestampType.
- parquet ``timestamp[us]`` with no timezone: Spark 4 infers
  TIMESTAMP_NTZ by default, which ``unix_millis``/``withWatermark``
  reject. We disable ``spark.sql.parquet.inferTimestampNTZ.enabled``
  before the read (runtime-settable, covers sessions built elsewhere)
  and also cast defensively when a prior read already cached NTZ.

Either way the DuckDB oracle (``CAST(ts AS TIMESTAMP)``, UTC-naive)
agrees bit-for-bit because the session timezone is pinned UTC.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Relation memo: ``spark.read.parquet`` pays a fresh file listing +
#: footer schema inference on EVERY call (~0.1 s driver-side even when
#: the OS cache is warm — measured in scripts/floor_probe.py), and a
#: catalog sweep calls ``load_table`` ~600 times over the same ten
#: immutable corpus paths. Memoizing the LAZY relation per (session,
#: table path) removes that repeated metadata work; it caches no data —
#: every action on the returned DataFrame still scans the parquet
#: files. Spark's own catalog-table FileIndex cache is the precedent
#: (optimization guide §6 "file listing"); plain ``read.parquet``
#: bypasses it, so we key our own.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamps collect in the session timezone; the DuckDB oracle is
    # UTC-naive — pin UTC even when the caller's session didn't
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    # mtime in the key: a rewritten table (tests build tiny corpora in
    # tmp dirs) re-lists instead of serving a stale file set; for a
    # directory table the mtime bumps on any file add/remove
    try:
        st = os.stat(path)
        fingerprint = (st.st_mtime_ns, st.st_size)
    except OSError:
        fingerprint = None
    cache_key = (
        spark.sparkContext.applicationId, os.path.realpath(path), fingerprint
    )
    cached = _TABLE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    if name == "events":
        # set at runtime too: callers (e.g. the driver harness) may hand
        # us a session built without these configs
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp[us] with no tz would otherwise scan as TIMESTAMP_NTZ,
        # which unix_millis/withWatermark reject at analysis time
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # exact integer division — float division of ~1.7e18 ns values
            # rounds in the last microseconds
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # belt-and-braces: a cached FileIndex/schema from before the
            # conf flip can still surface NTZ; session tz is pinned UTC
            # above so the cast is value-preserving
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[cache_key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
