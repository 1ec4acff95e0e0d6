"""Config validation (the reference validated nothing until runtime —
SURVEY.md §3 EP1) and file-format source/sink round-trips."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.core.specs import SyncSpec, StoreSpec, load_config, parse_spec
from pycasselastic_spark.sources.registry import TableRef, read_table, write_table


class TestSpecs:
    def test_parse_reference_shape(self):
        spec = parse_spec(
            {
                "name": "sync_name1",
                "id_col": "id",
                "version_col": "version",
                "date_col": "date",
                "filter_date": True,
                "ignore_same_source": True,
                "cassandra": {"table": "ks.t", "source_id": "CASSANDRA"},
                "elasticsearch": {"table": "idx/doc", "source_id": "Elastic"},
            }
        )
        assert spec.left.table == "ks.t" and spec.right.source_id == "Elastic"
        assert spec.filter_date and spec.ignore_same_source

    @pytest.mark.parametrize(
        "payload",
        [
            {"name": "", "id_col": "id", "version_col": "v",
             "left": {"table": "a"}, "right": {"table": "b"}},
            {"name": "x", "id_col": "id", "version_col": "v",
             "left": {}, "right": {"table": "b"}},
            {"name": "x", "id_col": "", "version_col": "v",
             "left": {"table": "a"}, "right": {"table": "b"}},
        ],
    )
    def test_invalid_specs_rejected_at_load(self, payload):
        with pytest.raises(ValueError):
            parse_spec(payload)

    def test_load_config_file(self, tmp_path):
        path = tmp_path / "config.json"
        path.write_text(
            json.dumps(
                {
                    "sync": [
                        {
                            "name": "s1",
                            "id_col": "id",
                            "version_col": "v",
                            "left": {"table": "a"},
                            "right": {"table": "b"},
                        }
                    ]
                }
            )
        )
        specs = load_config(str(path))
        assert len(specs) == 1 and isinstance(specs[0], SyncSpec)

    def test_load_config_rejects_non_list(self, tmp_path):
        path = tmp_path / "bad.json"
        path.write_text('{"sync": {"not": "a list"}}')
        with pytest.raises(ValueError):
            load_config(str(path))


class TestFileFormats:
    @pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc", "xml"])
    def test_round_trip(self, spark, tmp_path, fmt):
        df = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 7).alias("k"), F.lit("payload").alias("s")
        )
        opts = {"header": "true"} if fmt == "csv" else {}
        if fmt == "xml":
            opts = {"rowTag": "row"}  # Spark 4 native XML
        ref = TableRef(fmt=fmt, path_or_table=str(tmp_path / f"t.{fmt}"), options=opts)
        write_table(df, ref)
        back = read_table(spark, ref)
        assert back.count() == 100
        got = {int(r["id"]) for r in back.collect()}
        assert got == set(range(100))


class TestBinaryFileIngestion:
    def test_media_files_flow_through_binary_source(self, spark, tmp_path):
        """Real files on disk -> binaryFile source -> mapInPandas decode:
        the ingestion path a production multimodal pipeline uses (the
        synthesize_media fixture only bypasses the filesystem)."""
        from pycasselastic_spark.operators import multimodal as M
        from pycasselastic_spark.sources.registry import TableRef, read_table

        media_dir = tmp_path / "media"
        media_dir.mkdir()
        for i in range(6):
            (media_dir / f"m{i}.fimg").write_bytes(
                f"FIMG|{4 + i}|{2 + i}|1;".encode() + b"ab" * 8
            )
        ref = TableRef(fmt="binaryFile", path_or_table=str(media_dir))
        raw = read_table(spark, ref)
        assert {"path", "content", "length"} <= set(raw.columns)
        media = raw.select(
            F.regexp_extract(F.col("path"), r"m(\d+)\.fimg", 1)
            .cast("long")
            .alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("content"),
        )
        feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
        assert len(feats) == 6
        for i in range(6):
            assert feats[i]["width"] == 4 + i
            assert feats[i]["payload_bytes"] == 16
