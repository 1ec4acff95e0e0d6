"""Sync-core queries: the reference operators O1-O8 (SURVEY.md S2.1) modeled on the events table.

Split out of the monolithic catalog.py (round 8); registration
side-effects populate the shared QUERIES dict in queries.base.
"""

from __future__ import annotations

import os  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.core.merge import (  # noqa: F401
    anti_echo,
    conflict_losers,
    lww_merge,
)
from pycasselastic_spark.core.incremental import scan_increment  # noqa: F401
from pycasselastic_spark.core.schema import align_schemas  # noqa: F401
from pycasselastic_spark.functions.aggregates import (  # noqa: F401
    money,
    money_expr_sum,
    money_sum,
)
from pycasselastic_spark.operators.relational import (  # noqa: F401
    asof_join,
    sessionize,
    topk_per_group,
)
from pycasselastic_spark.queries.base import (  # noqa: F401
    QUERIES,
    _STORES_SQL,
    _event_stores,
    _t,
    register,
)
from pycasselastic_spark.core import convert as CV  # noqa: F401,E402
from pycasselastic_spark.functions import text as TX  # noqa: F401,E402
from pycasselastic_spark.operators import dedup as D  # noqa: F401,E402
from pycasselastic_spark.operators import multimodal as M  # noqa: F401,E402
from pycasselastic_spark.operators import sampling as SP  # noqa: F401,E402
from pycasselastic_spark.operators import similarity as S  # noqa: F401,E402
from pycasselastic_spark.operators import sketches as SK  # noqa: F401,E402
from pycasselastic_spark.plans.tuning import ensure_parallelism  # noqa: F401,E402




@register(
    "lww_merge_events",
    f"""
WITH {_STORES_SQL}
SELECT id, version, text, event_id, source
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY id ORDER BY version DESC, event_id DESC) AS rn
      FROM base)
WHERE rn = 1
""",
    doc="Flagship: bidirectional LWW merge (reference O5+O6+O7 collapsed; "
    "pyCassElastic.py:316-354,223-314,508-582) as union + argmax-per-id.",
)
def lww_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cass, es = _event_stores(spark, sf_dir)
    return lww_merge([cass, es], "id", "version", tiebreak_cols=["event_id"])


@register(
    "incremental_scan_events",
    f"""
WITH {_STORES_SQL}
SELECT id, version, text, event_id, source FROM base
WHERE version > 1705000000000 AND version <= 1706000000000
""",
    doc="Half-open watermark-window scan (reference O1/O3, "
    "pyCassElastic.py:205-212,367-384); predicate pushes to the parquet scan.",
)
def incremental_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cass, es = _event_stores(spark, sf_dir)
    both = cass.unionByName(es)
    return scan_increment(both, "version", 1705000000000, 1706000000000)


@register(
    "anti_echo_documents",
    """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE source IS NULL OR source <> 'src7'
""",
    doc="Provenance echo suppression (reference O4, pyCassElastic.py:386-399): "
    "negated equi-predicate, pushed down — not a join.",
)
def anti_echo_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    return anti_echo(docs, "source", "src7")


@register(
    "conflict_losers_events",
    f"""
WITH {_STORES_SQL},
winners AS (
  SELECT id, version, event_id FROM (
    SELECT id, version, event_id, ROW_NUMBER() OVER (
      PARTITION BY id ORDER BY version DESC, event_id DESC) AS rn
    FROM base) WHERE rn = 1
)
SELECT b.id, b.version, b.text, b.event_id, b.source
FROM base b
WHERE b.source = 'CASSANDRA'
  AND NOT EXISTS (SELECT 1 FROM winners w
                  WHERE w.id = b.id AND w.version = b.version
                    AND w.event_id = b.event_id)
""",
    doc="Conflict-loser retraction set (reference O7, pyCassElastic.py:508-582) "
    "as a left-anti join against the merge winners.",
)
def conflict_losers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cass, es = _event_stores(spark, sf_dir)
    winners = lww_merge([cass, es], "id", "version", tiebreak_cols=["event_id"])
    return conflict_losers(cass, winners, "id", "version", tiebreak_cols=["event_id"])


@register(
    "schema_drift_union",
    """
SELECT doc_id, text, lang, CAST(NULL AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang, n_chars
FROM documents WHERE doc_id % 2 = 1
""",
    doc="Schema-drift reconciliation (reference O8, pyCassElastic.py:412-446): "
    "widen-only union with NULL fill via align_schemas.",
)
def schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    b = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", "n_chars")
    aa, bb = align_schemas([a, b])
    return aa.unionByName(bb)


