"""Daemon CLI integration: two file-backed snapshot stores driven to
convergence through ``pycasselastic_spark.sync.main`` — the reference's
``SyncCassElastic.py`` surface (config file, period loop, pid file) on
the Spark engine."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from pycasselastic_spark.streaming.sync import SnapshotStore
from pycasselastic_spark.sync import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _seed(spark, path, rows, id_col="id", version_col="version"):
    store = SnapshotStore(spark, path, id_col, version_col)
    store.merge(spark.createDataFrame(rows, "id long, version long, text string"))
    return store


def _config(tmp_path, left, right, **spec_overrides):
    spec = {
        "name": "t",
        "id_col": "id",
        "version_col": "version",
        "filter_date": True,
        "left": {"table": left},
        "right": {"table": right},
    }
    spec.update(spec_overrides)
    cfg = {"period": 1, "syncs": [spec]}
    path = str(tmp_path / "config.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(cfg, fh)
    return path


def test_cli_once_converges_two_stores(spark, tmp_path):
    left_dir = str(tmp_path / "storeA")
    right_dir = str(tmp_path / "storeB")
    left = _seed(spark, left_dir, [(1, 100, "a"), (2, 500, "b-new")])
    right = _seed(spark, right_dir, [(1, 300, "a-new"), (3, 200, "c")])
    cfg = _config(tmp_path, left_dir, right_dir)
    pid_file = str(tmp_path / "sync.pid")

    rc = main([cfg, "--once", "--pid-file", pid_file], spark=spark)
    assert rc == 0
    assert int(open(pid_file).read()) == os.getpid()

    want = {(1, 300, "a-new"), (2, 500, "b-new"), (3, 200, "c")}
    for store in (left, right):
        got = {tuple(r) for r in store.current().collect()}
        assert got == want

    # the watermark committed next to the config
    wm_path = str(tmp_path / "watermark.json")
    wm = json.load(open(wm_path))
    assert isinstance(wm["watermark_millis"], int)


def test_cli_second_cycle_windows_on_watermark(spark, tmp_path):
    """A second cycle only syncs rows versioned after the committed
    watermark: a stale update (version below the watermark) written into
    one store after cycle 1 must NOT propagate."""
    left_dir = str(tmp_path / "storeA")
    right_dir = str(tmp_path / "storeB")
    left = _seed(spark, left_dir, [(1, 100, "a")])
    right = _seed(spark, right_dir, [(1, 300, "a-new")])
    cfg = _config(tmp_path, left_dir, right_dir)

    assert main([cfg, "--once"], spark=spark) == 0
    wm_path = str(tmp_path / "watermark.json")
    wm1 = json.load(open(wm_path))["watermark_millis"]

    # new increment BELOW the watermark — outside the next half-open
    # window, so cycle 2 must not ship it to the right store
    left.merge(
        spark.createDataFrame([(9, wm1 - 10_000, "stale")],
                              "id long, version long, text string")
    )
    assert main([cfg, "--once"], spark=spark) == 0
    right_ids = {r["id"] for r in right.current().collect()}
    assert 9 not in right_ids
    # ...but it stays in the left store itself (stores only ever gain
    # merged winners; nothing is clobbered)
    assert 9 in {r["id"] for r in left.current().collect()}


def test_cli_help_runs_without_spark():
    out = subprocess.run(
        [sys.executable, "-m", "pycasselastic_spark.sync", "--help"],
        capture_output=True, text=True, timeout=60, cwd=REPO,
    )
    assert out.returncode == 0
    assert "SyncCassElastic" in out.stdout


def test_plain_file_format_refused_as_sink(spark, tmp_path):
    src = str(tmp_path / "plain.parquet")
    spark.createDataFrame(
        [(1, 100, "a")], "id long, version long, text string"
    ).write.parquet(src)
    right = _seed(spark, str(tmp_path / "storeB"), [(1, 300, "b")])
    cfg = _config(tmp_path, src, str(tmp_path / "storeB"))
    cfg_payload = json.load(open(cfg))
    cfg_payload["syncs"][0]["left"] = {
        "table": src, "options": {"format": "parquet"},
    }
    with open(cfg, "w", encoding="utf-8") as fh:
        json.dump(cfg_payload, fh)
    # per-spec error isolation: the cycle reports failure, not a crash
    rc = main([cfg, "--once"], spark=spark)
    assert rc == 1
    # the healthy store is untouched by the failed spec
    assert {r["id"] for r in right.current().collect()} == {1}


def test_empty_snapshot_store_errors_cleanly(spark, tmp_path):
    left_dir = str(tmp_path / "empty")
    os.makedirs(left_dir)
    right_dir = str(tmp_path / "storeB")
    _seed(spark, right_dir, [(1, 300, "b")])
    cfg = _config(tmp_path, left_dir, right_dir)
    assert main([cfg, "--once"], spark=spark) == 1


def test_cli_converges_cassandra_and_elasticsearch_fakes(spark, tmp_path):
    """The reference's actual deployment shape — the periodic daemon
    syncing a Cassandra table with an Elasticsearch index — executed
    end-to-end: config file -> CLI -> incremental scan -> LWW merge ->
    connector writes, against the in-process fake stores registered
    under the real connector format names (sources/fake_connectors.py).
    Convergence AND the store-side upsert contracts (writetime /
    external versioning) are both exercised."""
    from pycasselastic_spark.sources.fake_connectors import (
        read_store_meta,
        register_fake_connectors,
    )
    from pycasselastic_spark.sources.registry import TableRef, write_table

    register_fake_connectors(spark)
    root = str(tmp_path / "stores")
    cass_ref = TableRef("cassandra", "ks.docs", {"fake.root": root})
    es_ref = TableRef("elasticsearch", "docs/doc", {"fake.root": root})
    schema = "id long, version long, text string"
    write_table(
        spark.createDataFrame([(1, 100, "a"), (2, 500, "b-new")], schema),
        cass_ref, mode="overwrite", id_col="id", version_col="version",
    )
    write_table(
        spark.createDataFrame([(1, 300, "a-new"), (3, 200, "c")], schema),
        es_ref, mode="overwrite", id_col="id", version_col="version",
    )
    cfg = str(tmp_path / "config.json")
    with open(cfg, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "period": 1,
                "syncs": [{
                    "name": "t",
                    "id_col": "id",
                    "version_col": "version",
                    "filter_date": True,
                    "left": {"table": "ks.docs",
                             "options": {"format": "cassandra",
                                         "fake.root": root}},
                    "right": {"table": "docs/doc",
                              "options": {"format": "elasticsearch",
                                          "fake.root": root}},
                }],
            },
            fh,
        )

    assert main([cfg, "--once"], spark=spark) == 0

    want = {(1, 300, "a-new"), (2, 500, "b-new"), (3, 200, "c")}
    from pycasselastic_spark.sources.registry import read_table

    for ref in (cass_ref, es_ref):
        got = {tuple(r) for r in read_table(spark, ref).collect()}
        assert got == want
    # the daemon's sink leg delivered the upsert contracts to the stores
    cass_opts = read_store_meta(root, "ks.docs")["meta"]["last_write_options"]
    assert cass_opts["writetime"] == "version"
    es_opts = read_store_meta(root, "docs_doc")["meta"]["last_write_options"]
    assert es_opts["es.mapping.version.type"] == "external"


def test_status_and_stop_lifecycle(tmp_path):
    """--status/--stop operational parity with the reference's
    status.sh/kill.sh: status reads the pid file and probes the
    process; stop signals it and removes the pid file. Driven against
    a real child process (a sleeping python) so the signal path is
    exercised end-to-end without paying a Spark startup."""
    import signal
    import time

    pid_file = str(tmp_path / "sync.pid")

    # no pid file yet
    assert main(["--status", "--pid-file", pid_file]) == 1
    assert main(["--stop", "--pid-file", pid_file]) == 1

    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(300)"])
    try:
        with open(pid_file, "w", encoding="utf-8") as fh:
            fh.write(str(child.pid))
        assert main(["--status", "--pid-file", pid_file]) == 0

        assert main(["--stop", "--pid-file", pid_file]) == 0
        assert not os.path.exists(pid_file)
        # the child actually received SIGTERM
        assert child.wait(timeout=30) == -signal.SIGTERM
    finally:
        if child.poll() is None:
            child.kill()

    # stale pid file (process already gone)
    with open(pid_file, "w", encoding="utf-8") as fh:
        fh.write(str(child.pid))
    time.sleep(0.1)
    assert main(["--status", "--pid-file", pid_file]) == 1
    assert main(["--stop", "--pid-file", pid_file]) == 0  # cleans up
    assert not os.path.exists(pid_file)


def test_status_requires_pid_file():
    with pytest.raises(SystemExit):
        main(["--status"])
