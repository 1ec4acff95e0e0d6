"""Plan inspection and tuning helpers: the feedback loop for keeping
physical plans scale-shaped (pushdown reaching the scan, broadcasts
where intended, codegen spans wide, parallelism matching cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet/DSv2 scan carries a pushed filter mentioning
    ``fragment`` (e.g. a column name)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line:
            return True
    return False


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists the scans actually read (one entry per scan)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def ensure_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the scan
    yields fewer partitions than cores.

    Needed because the local corpus is one row-group per table — a
    single input split — which would serialize every narrow compute
    stage (minhash signatures, simhash, dot products) on one core. On
    real multi-row-group / multi-file data the scan already yields
    many splits and this is a no-op."""
    target = spark.sparkContext.defaultParallelism
    # partition count read from the JVM plan's RDD handle: the Python
    # df.rdd property would additionally build a javaToPython
    # conversion RDD (serializer setup per call) just to ask for a
    # number; this stays a metadata probe on the JVM side
    n_parts = df._jdf.rdd().getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df
