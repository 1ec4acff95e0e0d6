"""In-process fake Cassandra / Elasticsearch stores as Python Data
Sources (PySpark 4 ``pyspark.sql.datasource`` API).

The real connector jars are not available in this environment, so the
adapters in ``sources/registry.py`` could never actually execute their
read/write paths. These fakes register under the REAL format names
(``org.apache.spark.sql.cassandra`` / ``org.elasticsearch.spark.sql``)
— Python data-source registration takes precedence over classpath
lookup — so ``read_table``/``write_table`` run end-to-end unchanged,
and the store-side upsert semantics the options encode are actually
enforced:

- Cassandra ``writetime`` option (the Spark-connector analog of the
  reference's ``USING TIMESTAMP`` batches, ``pyCassElastic.py:244-251``):
  a row only replaces the stored row for its key when its
  writetime-column value is strictly greater.
- Elasticsearch ``es.mapping.id`` + ``es.mapping.version`` with
  ``es.mapping.version.type=external`` (the reference's per-document
  version check, ``pyCassElastic.py:332-344``): a stale document
  (version <= stored) is dropped, exactly like a bulk 409 conflict
  the reference's sync treats as "other side already newer".

Storage is a JSON file per table under the ``fake.root`` option —
executors stage per-task files in ``write()`` and the driver-side
``commit()`` folds them into the store with the semantics above, the
same task-stage/driver-commit split a real connector performs against
a cluster. Every write also records the exact option set it received
under ``meta.last_write_options`` so tests can assert the contract
options really reached the source. Known simplifications vs the real
stores (documented, deliberate): a single read partition instead of
token-range/shard splits, and strings-only JSON-safe cell values.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
)

from pycasselastic_spark.sources.registry import (
    CASSANDRA_FORMAT,
    ELASTICSEARCH_FORMAT,
)

ROOT_OPTION = "fake.root"


def _store_file(root: str, resource: str) -> str:
    return os.path.join(root, re.sub(r"[^A-Za-z0-9_.-]", "_", resource) + ".json")


def _load_store(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _ddl(schema) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


class _StagedMessage(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class _FakeStoreReader(DataSourceReader):
    """Single-partition scan of the JSON store (a real connector would
    expose token-range / shard splits here via ``partitions()``)."""

    def __init__(self, store_path: str, schema):
        self.store_path = store_path
        self.names = [f.name for f in schema.fields]

    def read(self, partition):
        if not os.path.exists(self.store_path):
            return
        store = _load_store(self.store_path)
        # sorted by key: deterministic scan order for tests
        for key in sorted(store["rows"]):
            row = store["rows"][key]
            yield tuple(row.get(name) for name in self.names)


class _FakeStoreWriter(DataSourceWriter):
    """Task-staged, driver-committed upsert writer.

    ``write()`` runs on executors and only stages rows; ``commit()``
    runs once on the driver and applies the store's conflict rule
    (injected as ``accepts``) — mirroring how a real connector defers
    visibility to a commit protocol."""

    def __init__(self, store_path, schema, overwrite, options, key_col, accepts):
        self.store_path = store_path
        self.names = [f.name for f in schema.fields]
        self.schema_ddl = _ddl(schema)
        self.overwrite = overwrite
        self.options = dict(options)
        self.key_col = key_col
        self.accepts = accepts

    def write(self, iterator):
        staged = self.store_path + f".staged-{uuid.uuid4().hex}"
        rows = [row.asDict(recursive=True) for row in iterator]
        with open(staged, "w") as f:
            json.dump(rows, f)
        return _StagedMessage(staged)

    def commit(self, messages):
        if self.overwrite or not os.path.exists(self.store_path):
            store = {"schema": self.schema_ddl, "rows": {}, "meta": {}}
        else:
            store = _load_store(self.store_path)
        for m in messages:
            with open(m.path) as f:
                rows = json.load(f)
            os.remove(m.path)
            for row in rows:
                key = str(row.get(self.key_col)) if self.key_col else uuid.uuid4().hex
                old = store["rows"].get(key)
                if old is None or self.accepts(old, row):
                    store["rows"][key] = row
        store["meta"]["last_write_options"] = self.options
        with open(self.store_path, "w") as f:
            json.dump(store, f)

    def abort(self, messages):
        for m in messages:
            if os.path.exists(m.path):
                os.remove(m.path)


class _FakeStoreDataSource(DataSource):
    """Shared plumbing: schema from the stored DDL, resource resolution
    via subclass hooks."""

    def _root(self) -> str:
        try:
            return self.options[ROOT_OPTION]
        except KeyError:
            raise ValueError(
                f"fake connector requires the '{ROOT_OPTION}' option "
                "(directory holding the JSON stores)"
            ) from None

    def _resource(self) -> str:
        raise NotImplementedError

    def _store_path(self) -> str:
        return _store_file(self._root(), self._resource())

    def schema(self):
        path = self._store_path()
        if os.path.exists(path):
            return _load_store(path)["schema"]
        raise ValueError(f"fake store {path} does not exist; write it first")

    def reader(self, schema):
        return _FakeStoreReader(self._store_path(), schema)


class FakeCassandraDataSource(_FakeStoreDataSource):
    """Cassandra-shaped store: table addressed by keyspace/table
    options; upserts honor the ``writetime`` column option — a new row
    wins only with a strictly greater writetime, like a cell written
    ``USING TIMESTAMP``. The key column is the first schema field (the
    partition key leads a C* primary key) unless ``fake.key`` says
    otherwise."""

    @classmethod
    def name(cls):
        return CASSANDRA_FORMAT

    def _resource(self) -> str:
        return f"{self.options.get('keyspace')}.{self.options.get('table')}"

    def writer(self, schema, overwrite):
        os.makedirs(self._root(), exist_ok=True)
        key_col = self.options.get("fake.key") or schema.fields[0].name
        wt = self.options.get("writetime")

        def accepts(old: dict, new: dict) -> bool:
            if wt is None:
                return True  # no timestamp contract: plain upsert
            if new.get(wt) is None:
                return False
            return old.get(wt) is None or new[wt] > old[wt]

        return _FakeStoreWriter(
            self._store_path(), schema, overwrite, self.options, key_col, accepts
        )


class FakeElasticsearchDataSource(_FakeStoreDataSource):
    """Elasticsearch-shaped store: index addressed by the save/load
    path; documents keyed by ``es.mapping.id``; with
    ``es.mapping.version.type=external`` a document whose
    ``es.mapping.version`` column is <= the stored version is dropped,
    like a bulk item 409 the reference's sync ignores."""

    @classmethod
    def name(cls):
        return ELASTICSEARCH_FORMAT

    def _resource(self) -> str:
        return self.options.get("path", "default-index")

    def writer(self, schema, overwrite):
        os.makedirs(self._root(), exist_ok=True)
        key_col = self.options.get("es.mapping.id")
        vcol = self.options.get("es.mapping.version")
        external = self.options.get("es.mapping.version.type") == "external"

        def accepts(old: dict, new: dict) -> bool:
            if not (vcol and external):
                return True  # internal versioning: last write wins
            if new.get(vcol) is None:
                return False
            return old.get(vcol) is None or new[vcol] > old[vcol]

        return _FakeStoreWriter(
            self._store_path(), schema, overwrite, self.options, key_col, accepts
        )


def register_fake_connectors(spark) -> None:
    """Register both fakes on the session under the real connector
    format names. Safe to call repeatedly (re-registration replaces)."""
    spark.dataSource.register(FakeCassandraDataSource)
    spark.dataSource.register(FakeElasticsearchDataSource)


def read_store_meta(root: str, resource: str) -> dict:
    """Test hook: the raw store record (schema DDL, rows keyed by id,
    and the option set the last write delivered to the source)."""
    return _load_store(_store_file(root, resource))
