"""Schema alignment and drift reconciliation.

The reference diffs the Cassandra table schema against the ES mapping
and ``ALTER TABLE ADD``s missing columns with a type translation
(``pyCassElastic.py:412-446``; introspection ``:448-495``; type map
``:497-506``). In a DataFrame engine the in-flight equivalent is
``unionByName(allowMissingColumns=True)``: widening, never narrowing,
missing column = NULL — the same semantics, with the at-rest DDL left to
the sink (Delta/iceberg ``mergeSchema`` or connector DDL).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Minimal logical-type vocabulary for cross-store mapping. The
# reference's map was a one-entry TODO ({'string': 'varchar'},
# pyCassElastic.py:497-506); this covers the types its fixtures exercise
# plus the driver corpus.
ES_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "keyword": T.StringType(),
    "text": T.StringType(),
    "long": T.LongType(),
    "integer": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "binary": T.BinaryType(),
}

CASSANDRA_TO_SPARK: dict[str, T.DataType] = {
    "varchar": T.StringType(),
    "text": T.StringType(),
    "ascii": T.StringType(),
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "blob": T.BinaryType(),
}


def schema_diff(a: T.StructType, b: T.StructType) -> dict[str, T.DataType]:
    """Columns present in ``b`` but not in ``a`` — the set the reference
    would ALTER-ADD (``pyCassElastic.py:432-437``). Name-keyed, case
    preserved."""
    have = {f.name for f in a.fields}
    return {f.name: f.dataType for f in b.fields if f.name not in have}


def evolve_table_schema(
    spark, table: str, incoming: T.StructType
) -> dict[str, T.DataType]:
    """At-rest DDL evolution: ``ALTER TABLE <table> ADD COLUMNS`` for
    every incoming column the stored table lacks — the reference's
    physical schema reconciliation (``pyCassElastic.py:438-444``), with
    Spark SQL DDL standing in for CQL. Widening only: existing columns
    are never dropped or retyped, and the reference's ES→C* type map
    becomes ``DataType.simpleString()`` (no translation table needed —
    both sides already speak Spark types). Returns the added columns."""
    existing = spark.table(table).schema
    missing = schema_diff(existing, incoming)
    if missing:
        cols = ", ".join(
            f"`{name}` {dtype.simpleString()}" for name, dtype in missing.items()
        )
        spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({cols})")
    return missing


def append_with_evolution(df: DataFrame, table: str) -> dict[str, T.DataType]:
    """Append ``df`` to a warehouse table, first evolving the table's
    at-rest schema to cover any new columns (rows already stored read
    the added columns as NULL, exactly like Cassandra after ALTER ADD).
    Creates the table on first write. Returns the columns added."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        df.write.saveAsTable(table)
        return {}
    added = evolve_table_schema(spark, table, df.schema)
    target = spark.table(table).schema
    have = set(df.columns)
    aligned = df.select(
        [
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target.fields
        ]
    )
    aligned.write.mode("append").insertInto(table)
    return added


def align_schemas(dfs: Sequence[DataFrame]) -> list[DataFrame]:
    """Project every input onto the union of all columns (NULL-filled,
    consistently ordered) so they can be unioned/compared positionally.

    Unlike a pairwise ``unionByName`` chain this computes the target
    schema once; column order is first-seen order for stability.
    """
    if not dfs:
        return []
    target: dict[str, T.DataType] = {}
    for df in dfs:
        for field in df.schema.fields:
            target.setdefault(field.name, field.dataType)
    out = []
    for df in dfs:
        have = set(df.columns)
        cols = [
            F.col(name) if name in have else F.lit(None).cast(dtype).alias(name)
            for name, dtype in target.items()
        ]
        out.append(df.select(cols))
    return out
