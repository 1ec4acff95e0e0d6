"""Connector contract tests: the Cassandra/Elasticsearch adapters in
``sources/registry.py`` cannot run here (no connector jars in the
container), but their entire value is the exact format + option sets
they hand Spark — ES external versioning replacing the reference's
per-document version loop (``pyCassElastic.py:332-344``) and Cassandra
per-row write timestamps replacing ``USING TIMESTAMP``
(``pyCassElastic.py:244-251``). These tests drive the adapters against
recording fakes and pin those option sets."""

from __future__ import annotations

import pytest

from pycasselastic_spark.sources.registry import (
    CASSANDRA_FORMAT,
    ELASTICSEARCH_FORMAT,
    TableRef,
    read_table,
    write_table,
)


class FakeReader:
    def __init__(self, rec):
        self.rec = rec
        self.rec.setdefault("options", {})

    def format(self, fmt):
        self.rec["format"] = fmt
        return self

    def options(self, **kw):
        self.rec["options"].update({k: str(v) for k, v in kw.items()})
        return self

    def load(self, path=None):
        self.rec["load_path"] = path
        return "DF"

    def parquet(self, path):
        self.rec["format"] = "parquet"
        self.rec["load_path"] = path
        return "DF"


class FakeSpark:
    def __init__(self, rec):
        self.read = FakeReader(rec)


class FakeWriter:
    def __init__(self, rec):
        self.rec = rec
        self.rec.setdefault("options", {})

    def mode(self, m):
        self.rec["mode"] = m
        return self

    def format(self, fmt):
        self.rec["format"] = fmt
        return self

    def options(self, **kw):
        self.rec["options"].update({k: str(v) for k, v in kw.items()})
        return self

    def save(self, path=None):
        self.rec["save_path"] = path

    def parquet(self, path):
        self.rec["format"] = "parquet"
        self.rec["save_path"] = path


class FakeDF:
    def __init__(self, rec):
        self.write = FakeWriter(rec)


def test_cassandra_read_splits_keyspace_and_table():
    rec = {}
    read_table(FakeSpark(rec), TableRef("cassandra", "ks.tbl", {"x": "1"}))
    assert rec["format"] == CASSANDRA_FORMAT
    assert rec["options"]["keyspace"] == "ks"
    assert rec["options"]["table"] == "tbl"
    assert rec["options"]["x"] == "1"
    assert rec["load_path"] is None  # table comes from options, not path


def test_elasticsearch_read_loads_index_path():
    rec = {}
    read_table(FakeSpark(rec), TableRef("elasticsearch", "idx/doc", {}))
    assert rec["format"] == ELASTICSEARCH_FORMAT
    assert rec["load_path"] == "idx/doc"


def test_elasticsearch_write_uses_external_versioning():
    """The LWW contract at the ES edge: es.mapping.version + external
    version type make the store reject stale writes server-side —
    the reference's version check (pyCassElastic.py:332-344) without a
    read-modify-write loop."""
    rec = {}
    write_table(
        FakeDF(rec), TableRef("elasticsearch", "idx/doc", {}),
        mode="append", id_col="id", version_col="version",
    )
    assert rec["format"] == ELASTICSEARCH_FORMAT
    assert rec["mode"] == "append"
    assert rec["save_path"] == "idx/doc"
    assert rec["options"]["es.mapping.id"] == "id"
    assert rec["options"]["es.mapping.version"] == "version"
    assert rec["options"]["es.mapping.version.type"] == "external"


def test_elasticsearch_write_respects_explicit_options():
    rec = {}
    write_table(
        FakeDF(rec),
        TableRef("elasticsearch", "idx/doc", {"es.mapping.id": "custom"}),
        id_col="id", version_col="version",
    )
    # explicit ref options win over the derived defaults
    assert rec["options"]["es.mapping.id"] == "custom"
    assert rec["options"]["es.mapping.version"] == "version"


def test_cassandra_write_uses_writetime():
    """C* timestamped upsert: the writetime option gives every row the
    version as its cell timestamp — the reference's USING TIMESTAMP
    batches (pyCassElastic.py:244-251), executor-parallel."""
    rec = {}
    write_table(
        FakeDF(rec), TableRef("cassandra", "ks.tbl", {}),
        mode="append", id_col="id", version_col="version",
    )
    assert rec["format"] == CASSANDRA_FORMAT
    assert rec["options"]["keyspace"] == "ks"
    assert rec["options"]["table"] == "tbl"
    assert rec["options"]["writetime"] == "version"
    assert rec["save_path"] is None


def test_file_formats_roundtrip_by_path():
    rec = {}
    read_table(FakeSpark(rec), TableRef("parquet", "/tmp/x.parquet", {}))
    assert (rec["format"], rec["load_path"]) == ("parquet", "/tmp/x.parquet")
    rec = {}
    write_table(FakeDF(rec), TableRef("parquet", "/tmp/y.parquet", {}), mode="overwrite")
    assert (rec["format"], rec["mode"], rec["save_path"]) == (
        "parquet", "overwrite", "/tmp/y.parquet"
    )


def test_unknown_format_passes_through():
    rec = {}
    read_table(FakeSpark(rec), TableRef("delta", "/tmp/t", {"a": "b"}))
    assert rec["format"] == "delta"
    assert rec["load_path"] == "/tmp/t"
    assert rec["options"] == {"a": "b"}
