"""Loader for the driver-generated parquet corpus (TESTDATA.md).

One quirk: ``events.ts`` is written as parquet TIMESTAMP(NANOS), a type
Spark SQL does not have. With ``spark.sql.legacy.parquet.nanosAsLong``
(set in ``session.get_spark``) it scans as a long of nanoseconds; this
loader converts it to a proper microsecond TimestampType so downstream
operators and the DuckDB oracle (``CAST(ts AS TIMESTAMP)`` truncates
ns -> us identically) agree.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamps collect in the session timezone; the DuckDB oracle is
    # UTC-naive — pin UTC even when the caller's session didn't
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # set at runtime too: callers (e.g. the driver harness) may hand
        # us a session built without this config
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # exact integer division — float division of ~1.7e18 ns values
        # rounds in the last microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
