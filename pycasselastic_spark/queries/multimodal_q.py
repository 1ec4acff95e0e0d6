"""Multimodal binary columns: decode/feature/resize/frame-sample over opaque binary payloads (wire-format fakes; Spark plumbing real).

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


# ---------------------------------------------------------------------------
# Multimodal binary columns (decode stubbed behind a deterministic fake
# wire format; Spark plumbing — binary transport, Arrow batches — real).
# ---------------------------------------------------------------------------

from pycasselastic_spark.operators import multimodal as M  # noqa: E402


@register(
    "multimodal_meta_stats",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         (doc_id % 16 + 4) AS width,
         octet_length(encode(
           concat_ws('|',
             CASE WHEN doc_id % 3 = 0 THEN 'FIMG'
                  WHEN doc_id % 3 = 1 THEN 'FAUD'
                  ELSE 'FVID' END,
             CAST(doc_id % 16 + 4 AS VARCHAR),
             CAST(doc_id % 8 + 2 AS VARCHAR),
             CAST(doc_id % 5 + 1 AS VARCHAR))
           || ';' || repeat(substring(md5(text), 1, 8), 8))) AS nbytes
  FROM documents)
SELECT kind, COUNT(*) AS n_media,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       CAST(SUM(width) AS BIGINT) AS total_width
FROM m GROUP BY kind
""",
    doc="Metadata aggregation over the media table without touching "
    "decode — binary length + typed meta only (column pruning keeps "
    "real scans narrow).",
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).cast("long").alias("total_bytes"),
        F.sum(F.col("meta.width")).cast("long").alias("total_width"),
    )


@register(
    "multimodal_image_features",
    """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         (doc_id % 16 + 4) AS width,
         (doc_id % 8 + 2) AS height,
         (doc_id % 5 + 1) AS n_frames,
         repeat(substring(md5(text), 1, 8), 8) AS payload
  FROM documents)
SELECT doc_id AS media_id, kind,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(n_frames AS INT) AS n_frames,
       CAST(length(payload) AS INT) AS payload_bytes,
       CAST(list_sum(list_transform(range(1, length(payload) + 1),
                     i -> ord(substring(payload, i, 1)))) AS DOUBLE)
         / length(payload) AS mean_byte
FROM m
""",
    doc="Arrow-batched decode + feature extraction over binary media "
    "columns (operators/multimodal.py:extract_features). The decode runs "
    "in Python mapInPandas, but the fake wire format lets the oracle "
    "replay header parsing and payload byte statistics in SQL — the "
    "whole Python path is value-checked, not just row-counted.",
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ensure_parallelism(M.synthesize_media(spark, sf_dir), spark)
    return M.extract_features(media)


@register(
    "multimodal_frame_sample",
    """
WITH v AS (
  SELECT doc_id AS media_id,
         (doc_id % 5 + 1) AS n_frames,
         repeat(substring(md5(text), 1, 8), 8) AS payload
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT media_id, payload,
         greatest(1, length(payload) // n_frames) AS fsize,
         unnest(range(0, n_frames, 2)) AS frame_idx
  FROM v)
SELECT media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(fsize AS INT) AS frame_bytes,
       md5(substring(payload, frame_idx * fsize + 1, fsize)) AS frame_md5
FROM f
""",
    doc="Frame sampling for video media (every 2nd frame): 1:N "
    "mapInPandas emitting per-frame binary slices "
    "(operators/multimodal.py:sample_frames). The fake wire format makes "
    "the explosion SQL-replayable: the oracle re-derives each kept "
    "frame's slice with unnest(range(...)) and value-checks per-frame "
    "length and md5 (frames are ASCII hex, so VARCHAR md5 == binary md5).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ensure_parallelism(M.synthesize_media(spark, sf_dir), spark)
    frames = M.sample_frames(media, every_k=2)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame").cast("int").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


