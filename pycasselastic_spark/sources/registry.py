"""Source/sink registry.

The reference crosses process boundaries exactly twice per leg: a
pushed-down scan out of one store and a batched upsert into the other
(SURVEY.md §3 step 6). Here those edges are pluggable formats; the
engine core only ever sees DataFrames.

Parquet/CSV/JSON/ORC are first-class (the driver corpus is parquet).
Cassandra and Elasticsearch adapters express the same scan/upsert
contracts via their public Spark connectors — which are NOT in this
container, so they are import/availability-guarded and documented, not
exercised by tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_FILE_FORMATS = {"parquet", "csv", "json", "orc", "xml"}

# Public Spark connector format names (not bundled in this environment).
CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"
ELASTICSEARCH_FORMAT = "org.elasticsearch.spark.sql"


@dataclass(frozen=True)
class TableRef:
    """A resolvable table: file path or connector table."""

    fmt: str
    path_or_table: str
    options: dict[str, str] = field(default_factory=dict)


def read_table(spark: SparkSession, ref: TableRef) -> DataFrame:
    """Scan a table. File formats read by path; connector formats read
    by table/keyspace options so the connector can accept pushed-down
    predicates (the Spark equivalent of the reference's hand-built CQL
    range scan, ``pyCassElastic.py:199-212``)."""
    if ref.fmt in _FILE_FORMATS:
        reader = spark.read.options(**ref.options)
        return getattr(reader, ref.fmt)(ref.path_or_table)
    if ref.fmt == "cassandra":
        keyspace, _, table = ref.path_or_table.rpartition(".")
        return (
            spark.read.format(CASSANDRA_FORMAT)
            .options(keyspace=keyspace, table=table, **ref.options)
            .load()
        )
    if ref.fmt == "elasticsearch":
        return (
            spark.read.format(ELASTICSEARCH_FORMAT)
            .options(**ref.options)
            .load(ref.path_or_table)
        )
    return spark.read.format(ref.fmt).options(**ref.options).load(ref.path_or_table)


def write_table(
    df: DataFrame,
    ref: TableRef,
    mode: str = "overwrite",
    id_col: str | None = None,
    version_col: str | None = None,
) -> None:
    """Sink a DataFrame.

    For connector sinks the id/version columns carry the reference's
    upsert semantics as connector options instead of per-row driver
    loops: ES external versioning (``es.mapping.id`` +
    ``es.mapping.version``, replacing ``pyCassElastic.py:332-344``) and
    Cassandra per-row write timestamps (``writetime`` option, replacing
    ``USING TIMESTAMP`` at ``pyCassElastic.py:244-251``). Writes are
    partition-parallel — the reference's single-threaded 5000-row
    batches (``:288-301``) become per-executor connector batching.
    """
    if ref.fmt in _FILE_FORMATS:
        writer = df.write.mode(mode).options(**ref.options)
        getattr(writer, ref.fmt)(ref.path_or_table)
        return
    if ref.fmt == "elasticsearch":
        opts = dict(ref.options)
        if id_col:
            opts.setdefault("es.mapping.id", id_col)
        if version_col:
            opts.setdefault("es.mapping.version", version_col)
            opts.setdefault("es.mapping.version.type", "external")
        df.write.format(ELASTICSEARCH_FORMAT).options(**opts).mode(mode).save(
            ref.path_or_table
        )
        return
    if ref.fmt == "cassandra":
        keyspace, _, table = ref.path_or_table.rpartition(".")
        opts = dict(ref.options, keyspace=keyspace, table=table)
        if version_col:
            opts.setdefault("writetime", version_col)
        df.write.format(CASSANDRA_FORMAT).options(**opts).mode(mode).save()
        return
    df.write.format(ref.fmt).options(**ref.options).mode(mode).save(ref.path_or_table)
