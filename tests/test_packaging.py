"""Packaging smoke tests: the declared distribution metadata must
resolve to real, runnable code — the console script's entry point
imports and the CLI answers ``--help`` — and, where the build
toolchain exists, ``pip install`` of the repo actually succeeds."""

from __future__ import annotations

import importlib
import importlib.util
import os
import subprocess
import sys
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project_table() -> dict:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_script_entry_point_resolves():
    """[project.scripts] pycasselastic-sync -> module:attr must import
    and be callable — the exact resolution an installed console script
    performs."""
    scripts = _project_table()["project"]["scripts"]
    assert "pycasselastic-sync" in scripts
    target = scripts["pycasselastic-sync"]
    mod_name, attr = target.split(":")
    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, attr))


def test_cli_help_runs():
    """The README quickstart's daemon CLI: ``python -m
    pycasselastic_spark.sync --help`` exits 0 and prints usage (no
    Spark session needed for --help, so this is fast)."""
    proc = subprocess.run(
        [sys.executable, "-m", "pycasselastic_spark.sync", "--help"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert proc.returncode == 0
    assert "usage:" in proc.stdout and "--once" in proc.stdout


def test_package_discovery_matches_layout():
    """setuptools' package finder (driven by [tool.setuptools.packages
    .find]) must discover the full package tree — a missing
    __init__.py would silently ship a partial wheel."""
    from setuptools import find_packages

    found = set(find_packages(where=REPO, include=["pycasselastic_spark*"]))
    assert "pycasselastic_spark" in found
    for sub in ("core", "operators", "sources", "streaming", "pipeline",
                "functions", "plans"):
        assert f"pycasselastic_spark.{sub}" in found, sub


@pytest.mark.skipif(
    importlib.util.find_spec("wheel") is None,
    reason="'wheel' not in this container: PEP-660 editable builds need "
    "it and installing packages is out of scope here; the entry-point "
    "and CLI smoke tests above cover the resolvable surface",
)
def test_pip_editable_install_smoke(tmp_path):
    """Where the build toolchain exists: an offline editable install
    into a scratch target must succeed and expose the package."""
    target = str(tmp_path / "site")
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-build-isolation",
         "--no-deps", "--no-index", "--target", target, "-e", REPO],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    probe = subprocess.run(
        [sys.executable, "-c", "import pycasselastic_spark, sys; sys.exit(0)"],
        env={**os.environ, "PYTHONPATH": target},
        capture_output=True,
        timeout=120,
    )
    assert probe.returncode == 0
