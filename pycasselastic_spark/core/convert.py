"""Scalar conversion suite — the reference's hand-rolled datetime/UUID
glue (``utils.py:58-74``, parse sites ``pyCassElastic.py:275-277``),
re-expressed as built-in Spark SQL column expressions (JVM-side,
codegen'd — no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference serializes ES dates as ISO-8601 with microseconds
# ('%Y-%m-%dT%H:%M:%S.%f', pyCassElastic.py:275).
ISO_MICROS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def to_epoch_millis(ts: Column | str) -> Column:
    """timestamp -> unix epoch millis (reference utils.py:68-74)."""
    return F.unix_millis(F.col(ts) if isinstance(ts, str) else ts)


def from_epoch_millis(millis: Column | str) -> Column:
    """unix epoch millis -> timestamp."""
    return F.timestamp_millis(F.col(millis) if isinstance(millis, str) else millis)


def to_epoch_seconds(ts: Column | str) -> Column:
    """timestamp -> unix epoch seconds (reference utils.py:58-66)."""
    return F.unix_seconds(F.col(ts) if isinstance(ts, str) else ts)


def parse_iso_micros(s: Column | str) -> Column:
    """Parse the reference's ISO-8601-with-microseconds string form
    (pyCassElastic.py:275)."""
    return F.to_timestamp(F.col(s) if isinstance(s, str) else s, ISO_MICROS_FMT)


def format_iso_micros(ts: Column | str) -> Column:
    """Render a timestamp in the reference's ISO wire format."""
    return F.date_format(F.col(ts) if isinstance(ts, str) else ts, ISO_MICROS_FMT)


def normalize_uuid(s: Column | str) -> Column:
    """Canonical lowercase 36-char UUID string, NULL if malformed.

    The reference round-trips ids through ``uuid.UUID(...)``
    (pyCassElastic.py:276) which both validates and canonicalizes;
    here that is a regex + lowercase, all JVM-side. Accepts with or
    without hyphens.
    """
    col = F.col(s) if isinstance(s, str) else s
    bare = F.lower(F.regexp_replace(col, "-", ""))
    valid = bare.rlike("^[0-9a-f]{32}$")
    canonical = F.concat_ws(
        "-",
        F.substring(bare, 1, 8),
        F.substring(bare, 9, 4),
        F.substring(bare, 13, 4),
        F.substring(bare, 17, 4),
        F.substring(bare, 21, 12),
    )
    return F.when(valid, canonical).otherwise(F.lit(None))


def truncate_to_second(ts: Column | str) -> Column:
    """Second-precision truncation — the comparison granularity the
    reference uses because "C* truncates the date"
    (tests/testSyncClass.py:311-319)."""
    return F.date_trunc("second", F.col(ts) if isinstance(ts, str) else ts)


def truncate_to_minute(ts: Column | str) -> Column:
    """Minute truncation — the reference's watermark granularity
    (pyCassElastic.py:161)."""
    return F.date_trunc("minute", F.col(ts) if isinstance(ts, str) else ts)
