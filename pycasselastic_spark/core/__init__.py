"""Core sync semantics: the DataFrame-native re-expression of the
reference daemon's operators (SURVEY.md §2)."""

from pycasselastic_spark.core.incremental import WatermarkStore, scan_increment
from pycasselastic_spark.core.merge import anti_echo, conflict_losers, lww_merge
from pycasselastic_spark.core.schema import align_schemas, schema_diff
from pycasselastic_spark.core.specs import SyncSpec, load_config

__all__ = [
    "SyncSpec",
    "WatermarkStore",
    "align_schemas",
    "anti_echo",
    "conflict_losers",
    "load_config",
    "lww_merge",
    "scan_increment",
    "schema_diff",
]
