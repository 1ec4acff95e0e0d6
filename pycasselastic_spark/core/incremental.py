"""Incremental (watermark-windowed) scans and watermark persistence.

The reference reads "rows changed since the last run" with a pushed-down
range predicate on a version column (Cassandra leg:
``pyCassElastic.py:188-221``; ES leg: ``pyCassElastic.py:356-410``) and
persists a single watermark timestamp to a text file between runs
(``pyCassElastic.py:140-170``).

Spark-natively the scan is just a filter — Catalyst pushes it into the
source (parquet min/max row-group pruning, or connector pushdown), which
is exactly what the hand-rolled ``ALLOW FILTERING`` CQL and the ES
``constant_score`` range DSL were emulating. The watermark store stays a
tiny driver-side artifact: one value, read at job start, advanced at
commit. The window contract is half-open ``(lo, hi]`` — identical to the
reference's ``version > last AND version <= this`` — which makes reruns
idempotent (no row is in two windows).
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scan_increment(
    df: DataFrame,
    version_col: str,
    lo: int | None,
    hi: int | None,
) -> DataFrame:
    """Half-open version-window scan: ``lo < version <= hi``.

    Either bound may be None (unbounded). Reference operators O1/O3
    (``pyCassElastic.py:205-212`` and ``:367-384``); the predicate is
    declarative so Catalyst pushes it to the scan.
    """
    out = df
    if lo is not None:
        out = out.filter(F.col(version_col) > F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(version_col) <= F.lit(hi))
    return out


def minute_floor_millis(dt: datetime | None = None) -> int:
    """Unix epoch millis truncated to the minute — the reference's
    watermark granularity (``pyCassElastic.py:161``)."""
    dt = dt or datetime.now(timezone.utc)
    dt = dt.replace(second=0, microsecond=0)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


class WatermarkStore:
    """Persisted watermark: the upper bound of the last committed window.

    The reference stores ``YYYYMMDD HH:MM`` text in ``lastruntime.log``
    (``pyCassElastic.py:140-170``) and hard-errors when it is missing.
    Here the value is epoch millis in a small JSON file, written
    atomically (write-temp + rename) so a crash mid-write can't corrupt
    the committed watermark; a missing file means "never ran" and
    yields ``default`` instead of an error so first runs bootstrap.

    On a cluster this would be a table/checkpoint path; the API is the
    same: ``last()`` at job start, ``commit(hi)`` after the sinks
    succeed — commit-after-write gives at-least-once across crashes,
    and the half-open window plus idempotent LWW merge upgrades that to
    effectively-once.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def last(self, default: int | None = None) -> int | None:
        try:
            with open(self.path, encoding="utf-8") as fh:
                payload = json.load(fh)
        except FileNotFoundError:
            return default
        value = payload.get("watermark_millis")
        if not isinstance(value, int):
            raise ValueError(f"corrupt watermark file {self.path!r}: {payload!r}")
        return value

    def commit(self, hi: int) -> None:
        directory = os.path.dirname(os.path.abspath(self.path))
        fd, tmp = tempfile.mkstemp(dir=directory, prefix=".watermark-")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump({"watermark_millis": int(hi)}, fh)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
