"""Operational / events-side queries rotated out of corpus_quality.py in round 9 (the module-size split, round-8 verdict item 7): anti-entropy diff + repair, key-skew reporting, Gopher-style quality rules, canonical dedup, exact-k sampling, bloom-pruned joins, time rollups, outlier detection, streaming approx-distinct windows, null-safe joins, the map-function suite, dedup graph stats, and the protobuf-gated transformWithState query.

Registration side-effects populate the shared QUERIES dict in queries.base; gate slots are decided solely by catalog._GATE_PRIORITY.
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
from pycasselastic_spark.queries.pipeline2 import (  # noqa: F401,E402
    contamination_overlap,
)
from pycasselastic_spark.streaming.sync import (  # noqa: F401,E402
    SnapshotStore,
    read_event_stream,
    read_table_stream,
    start_streaming_sync,
)
from pycasselastic_spark.queries.pipeline_text import (  # noqa: F401
    _CDOT_SQL,
    _DOT_SQL,
    _JACCARD_POSTING_SQL,
    _SHINGLES_SQL,
    _STOPS_SQL,
    _UNIT_SQL,
    _ivf_centroids_sql,
)
from pycasselastic_spark.queries.streaming_q import (  # noqa: F401
    _run_stream_to_parquet,
)



@register(
    "anti_entropy_diff_events",
    """
WITH a AS (SELECT event_id, user_id, event_type FROM events),
b AS (SELECT event_id, user_id,
             CASE WHEN event_id % 101 = 0 THEN event_type || '_x'
                  ELSE event_type END AS event_type
      FROM events WHERE event_id % 97 <> 0)
SELECT COALESCE(a.event_id, b.event_id) AS event_id,
       CASE WHEN b.event_id IS NULL THEN 'missing_in_b'
            WHEN a.event_id IS NULL THEN 'missing_in_a'
            ELSE 'payload_differs' END AS diff_status
FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
WHERE b.event_id IS NULL OR a.event_id IS NULL
   OR a.user_id <> b.user_id OR a.event_type <> b.event_type
""",
    doc="Anti-entropy replica comparison (core/diff.py:table_diff) — "
    "the scale rebuild of the reference's driver-side checkSync dict "
    "probe (tests/testSyncClass.py:286-331): each store collapses to "
    "<= 64 (bucket, bit_xor-digest, count) rows map-side, agreement is "
    "proven by joining the digest tables alone, and the row-level "
    "full-outer join runs only inside disagreeing buckets (broadcast "
    "semi-join prune). Store B is store A with event_id%97 rows "
    "dropped and event_id%101 payloads mutated; the oracle is the "
    "GROUND-TRUTH direct diff, so a digest collision or an "
    "over-pruned bucket would hash-mismatch — the check proves the "
    "Merkle shortcut loses nothing.",
)
def anti_entropy_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.core.diff import table_diff

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    mutated = ev.filter(F.col("event_id") % 97 != 0).withColumn(
        "event_type",
        F.when(
            F.col("event_id") % 101 == 0,
            F.concat(F.col("event_type"), F.lit("_x")),
        ).otherwise(F.col("event_type")),
    )
    return table_diff(
        ev, mutated, "event_id", ["user_id", "event_type"], n_buckets=64
    )


@register(
    "anti_entropy_repair_events",
    """
WITH a AS (SELECT event_id, user_id, event_type FROM events),
b AS (SELECT event_id, user_id,
             CASE WHEN event_id % 101 = 0 THEN event_type || '_x'
                  ELSE event_type END AS event_type
      FROM events WHERE event_id % 97 <> 0),
d AS (
  SELECT COALESCE(a.event_id, b.event_id) AS event_id,
         CASE WHEN b.event_id IS NULL THEN 'missing_in_b'
              WHEN a.event_id IS NULL THEN 'missing_in_a'
              ELSE 'payload_differs' END AS diff_status
  FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
  WHERE b.event_id IS NULL OR a.event_id IS NULL
     OR a.user_id <> b.user_id OR a.event_type <> b.event_type)
SELECT d.event_id,
       CASE WHEN d.diff_status = 'missing_in_a' THEN 'delete'
            ELSE 'upsert' END AS action,
       a.user_id, a.event_type
FROM d LEFT JOIN a ON a.event_id = d.event_id
""",
    doc="Anti-entropy REPAIR plan: the diff composed into the actions "
    "that converge replica B to replica A — upsert A's row where B is "
    "missing or stale, delete where B has a row A lacks (the "
    "reference's delete-on-conflict made declarative). The action "
    "stream is exactly what sources/registry.py's connector sinks "
    "consume (per-row writetime upsert / id-keyed delete); at scale "
    "it is diff-sized, not table-sized, because the digest prune "
    "already proved the rest of the table converged.",
)
def anti_entropy_repair_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.core.diff import table_diff

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    mutated = ev.filter(F.col("event_id") % 97 != 0).withColumn(
        "event_type",
        F.when(
            F.col("event_id") % 101 == 0,
            F.concat(F.col("event_type"), F.lit("_x")),
        ).otherwise(F.col("event_type")),
    )
    diff = table_diff(
        ev, mutated, "event_id", ["user_id", "event_type"], n_buckets=64
    )
    return diff.join(ev, "event_id", "left").select(
        "event_id",
        F.when(F.col("diff_status") == "missing_in_a", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("action"),
        "user_id",
        "event_type",
    )


@register(
    "key_skew_report_events",
    """
WITH per_key AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       quantile_cont(cnt, 0.5) AS p50_cnt,
       quantile_cont(cnt, 0.99) AS p99_cnt,
       CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt) AS skew_ratio,
       CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top1_share
FROM per_key
""",
    doc="Join-key skew pre-flight: per-key frequency distribution of "
    "the prospective shuffle key (count of keys, hottest-key count, "
    "exact p50/p99 of per-key counts, hottest/mean ratio, top-1 "
    "share). At 100 TB this one cheap aggregation decides the plan — "
    "skew_ratio near 1 means plain hash join; large means salt the "
    "key (operators/skew.py) or lean on AQE skew-join splitting. One "
    "map-side-combined groupBy + a singleton aggregate; nothing "
    "shuffles twice.",
)
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
        (
            F.max("cnt").cast("double") * F.count(F.lit(1)) / F.sum("cnt")
        ).alias("skew_ratio"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top1_share"),
    )


@register(
    "gopher_rules_documents",
    f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       length(replace(text, ' ', '')) / len(w) AS mean_word_len,
       len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w)
         AS alpha_word_share,
       CAST(len(list_intersect(list_distinct(w), {_STOPS_SQL})) AS BIGINT)
         AS n_stopwords,
       (len(w) BETWEEN 50 AND 100000) AS wc_ok,
       (length(replace(text, ' ', '')) / len(w) BETWEEN 3 AND 10) AS mwl_ok,
       (len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) >= 0.8)
         AS alpha_ok,
       (len(list_intersect(list_distinct(w), {_STOPS_SQL})) >= 2) AS stop_ok,
       ((len(w) BETWEEN 50 AND 100000)
        AND (length(replace(text, ' ', '')) / len(w) BETWEEN 3 AND 10)
        AND (len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) >= 0.8)
        AND (len(list_intersect(list_distinct(w), {_STOPS_SQL})) >= 2)) AS keep
FROM t
""",
    doc="Gopher-style quality rule filter (Rae et al. 2021, adapted to "
    "the single-line corpus): word count in [50, 100k], mean word "
    "length in [3, 10], >= 80% of words containing an alphabetic "
    "character, >= 2 distinct stopwords present — per-doc rule flags "
    "plus the conjunctive keep decision. All pure JVM expressions "
    "(int/int divisions are IEEE-exact cross-engine), one narrow "
    "scan, no shuffle: the shape of a 100 TB first-pass filter.",
)
def gopher_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    w = TX.words("text")
    stops = F.array(*[F.lit(s) for s in ("the", "is", "and", "of", "to", "a", "in")])
    n_words = F.size(w)
    mwl = F.length(F.regexp_replace(F.col("text"), " ", "")) / n_words
    alpha_share = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))) / n_words
    n_stop = F.size(F.array_intersect(F.array_distinct(w), stops))
    wc_ok = n_words.between(50, 100000)
    mwl_ok = (mwl >= 3) & (mwl <= 10)
    alpha_ok = alpha_share >= 0.8
    stop_ok = n_stop >= 2
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha_share.alias("alpha_word_share"),
        n_stop.cast("long").alias("n_stopwords"),
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (wc_ok & mwl_ok & alpha_ok & stop_ok).alias("keep"),
    )


@register(
    "canonical_exact_dedup_documents",
    """
SELECT doc_id, canon_fp FROM (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), ' +', ' '))) AS canon_fp,
         ROW_NUMBER() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), ' +', ' ')))
           ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
""",
    doc="Canonicalized exact dedup: documents normalize (lowercase, "
    "collapse runs of spaces, trim) BEFORE fingerprinting, so "
    "case/whitespace variants of the same text collapse to one "
    "representative — the standard canonicalization pass that "
    "byte-exact dedup misses. Same single-shuffle min_by shape as "
    "exact_dedup (operators/dedup.py:exact_dedup) keyed on the "
    "canonical md5.",
)
def canonical_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    canon = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    )
    return (
        docs.select("doc_id", canon.alias("canon_fp"))
        .groupBy("canon_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "canon_fp")
    )


@register(
    "exact_k_per_source_sample",
    """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) WHERE rn <= 5
""",
    doc="Exact-k-per-group sampling: 5 documents per source, chosen by "
    "rank over the md5 of the id — deterministic, reproducible, and "
    "uniform-ish without any RNG state. Complements the rate-based "
    "samplers (stratified/source-balanced): per-group windows "
    "partition by the group key so no single-task sort; at 100 TB "
    "prefer this shape over ORDER BY rand() LIMIT k per group, which "
    "is neither deterministic nor partitionable.",
)
def exact_k_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source")
    )


@register(
    "bloom_pruned_join_events",
    """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY c.c_mktsegment
""",
    doc="Bloom-PRUNED join (the apply side of bloom_prefilter_"
    "customers): the fact stream filters through a row-level "
    "bloom_contains predicate (operators/sketches.py — densified "
    "4096-bit mask closed over in codegen, no join, no shuffle) "
    "BEFORE joining the selective dim. Because a Bloom filter has no "
    "false negatives, the pruned join's result is IDENTICAL to the "
    "plain join — so the oracle is the plain join, and any dropped "
    "true match would hash-mismatch. At 100 TB this is runtime row "
    "filtering ahead of the exchange: only possibly-matching fact "
    "rows shuffle.",
)
def bloom_pruned_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators import sketches as SK

    ev = _t(spark, sf_dir, "events")
    dim = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    mask = SK.bloom_mask(SK.bloom_build(dim, "c_custkey", 4096, 5), 4096)
    pruned = ev.filter(SK.bloom_contains(F.col("user_id"), mask, 5))
    joined = pruned.join(
        F.broadcast(dim), pruned["user_id"] == dim["c_custkey"]
    )
    # ONE pass: the per-(segment, user) level carries the event count
    # and the exact decimal partial sum, the second level folds both
    # and counts the groups — distinct users WITHOUT countDistinct
    # (which beside other aggregates makes Catalyst rewrite the whole
    # agg through Expand) and, unlike the former two-branch
    # aggregate-then-join-back shape, without scanning the events
    # table and evaluating the 5-hash bloom filter TWICE (round-14,
    # guide §2.3: aggregate before you shuffle — the branches re-ran
    # the pruned scan per consumer). Counts are exact longs and the
    # decimal partial sums refold exactly (integer-exact decimal
    # space), so the result is bit-identical to the two-branch form.
    per_user = joined.groupBy("c_mktsegment", "user_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_v"),
    )
    return per_user.groupBy("c_mktsegment").agg(
        F.sum("_n").alias("n_events"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum("_v").cast("double").alias("total_value"),
    ).select("c_mktsegment", "n_events", "n_users", "total_value")


@register(
    "time_rollup_events",
    """
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP),
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP))
""",
    doc="Time-hierarchy rollup: event counts and exact decimal value "
    "totals at hour, day and grand-total grains in ONE pass "
    "(ROLLUP(day, hour) — the partial aggregates compose, so Spark "
    "computes the hierarchy without rescanning; at 100 TB this "
    "replaces three separate aggregation jobs).",
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    return (
        ev.select(day, hour, "value")
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "user_value_outliers_events",
    """
WITH c AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events),
m AS (
  SELECT user_id, quantile_cont(cents, 0.5) AS med_cents FROM c GROUP BY user_id)
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       m.med_cents,
       CAST(SUM(CASE WHEN abs(c.cents - m.med_cents) > 2000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM c JOIN m USING (user_id)
GROUP BY c.user_id, m.med_cents
""",
    doc="Per-entity outlier flagging on an exact, integer-safe basis: "
    "values quantize to cents (decimal, not a lossy double cast), the "
    "per-user median comes from the exact interpolated percentile "
    "(int inputs -> at worst .5 halves, bit-identical cross-engine), "
    "and an event is an outlier when it sits more than $20 from its "
    "user's median. Median + flags in two shuffles on the same key "
    "(AQE reuses the partitioning); no variance/stddev — those are "
    "order-dependent float sums and cannot back a value oracle.",
)
def user_value_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = ev.select("user_id", cents.alias("cents"))
    med = c.groupBy("user_id").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    return (
        c.join(med, "user_id")
        .groupBy("user_id", "med_cents")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med_cents")) > 2000, 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("user_id", "n_events", "med_cents", "n_outliers")
    )


@register(
    "streaming_approx_distinct_windows",
    """
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       true AS users_within_3rsd
FROM events GROUP BY 1
""",
    doc="Streaming sketch aggregation: per-tumbling-hour HLL++ distinct "
    "users maintained by Structured Streaming (distinct aggregates are "
    "unsupported in streaming — the SKETCH is precisely what makes "
    "windowed cardinality feasible there, with bounded per-window "
    "state). The converged estimates join the batch exact counts and "
    "the value oracle checks the tolerance flag (|HLL - exact| <= "
    "3*rsd*exact), the approx_distinct_stats_events pattern applied "
    "to the stream.",
)
def streaming_approx_distinct_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = stream.groupBy(F.window("ts", "1 hour")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
        F.count(F.lit(1)).alias("n_events"),
    )
    streamed = _run_stream_to_parquet(spark, agg, "complete").select(
        F.col("window.start").alias("window_start"), "_hll", "n_events"
    )
    ev = _t(spark, sf_dir, "events")
    exact = (
        ev.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)))
        .groupBy(F.col("window.start").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return streamed.join(exact, "window_start").select(
        "window_start",
        "n_events",
        "n_users",
        # 3*rsd relative band with an absolute floor of 3: hourly
        # windows hold 10-20 users, where 6% is under one count and
        # HLL's +/-1 discretization would trip a purely relative band
        (
            F.abs(F.col("_hll") - F.col("n_users"))
            <= F.greatest(F.lit(3.0), 0.06 * F.col("n_users"))
        ).alias("users_within_3rsd"),
    )


@register(
    "null_safe_join_events",
    """
WITH a AS (
  SELECT NULLIF(event_type, 'click') AS k, CAST(COUNT(*) AS BIGINT) AS n_a
  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
b AS (
  SELECT NULLIF(event_type, 'click') AS k, CAST(COUNT(*) AS BIGINT) AS n_b
  FROM events WHERE event_id % 2 = 1 GROUP BY 1)
SELECT a.k, a.n_a, b.n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL "
    "group joins the NULL group instead of silently dropping — the "
    "semantics a sync engine needs when the merge key can be absent "
    "on both sides. Null-safe equality is still a hashable equi-key, "
    "so the plan stays a hash join, not a nested loop.",
)
def null_safe_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("click")).alias("k")
    a = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["k"], "n_a", "n_b")


@register(
    "map_function_suite_documents",
    """
SELECT doc_id,
       lang AS lang_v,
       CAST(2 AS INT) AS n_keys,
       true AS has_source,
       upper(source) AS src_upper,
       'lang,source' AS keys_sorted
FROM documents
""",
    doc="Map-typed column surface: create_map / element_at / size / "
    "map_contains_key / transform_values / map_keys + array_sort — "
    "the semi-structured shape for per-row attribute bags. The oracle "
    "verifies the VALUES through map-free projections (the map here "
    "is constructed from known columns, so every map op has a scalar "
    "ground truth), keeping the check engine-portable while the Spark "
    "side exercises the real map operators.",
)
def map_function_suite_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    upper_m = F.transform_values(m, lambda _k, v: F.upper(v))
    return docs.select(
        "doc_id",
        F.element_at(m, F.lit("lang")).alias("lang_v"),
        F.size(m).alias("n_keys"),
        F.map_contains_key(m, F.lit("source")).alias("has_source"),
        F.element_at(upper_m, F.lit("source")).alias("src_upper"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@register(
    "dedup_graph_stats",
    f"""
WITH {_JACCARD_POSTING_SQL},
pairs AS (SELECT doc_a, doc_b FROM jpairs),
edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
comp AS (
  WITH RECURSIVE reach(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
  )
  SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node),
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS comp_size
  FROM comp GROUP BY component)
SELECT comp_size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY comp_size
""",
    doc="Dedup-graph observability: the component-SIZE histogram of "
    "the near-dup pair graph (size 1 = unique docs, 2+ = dup "
    "clusters) — the one-look answer to 'how aggressive is this "
    "dedup pass', and the skew check for the clustering itself (a "
    "giant component means boilerplate shingles are bridging "
    "unrelated docs). Composes the banded-LSH pair generation with "
    "large-star/small-star components (operators/components.py) and "
    "two bounded aggregations; the oracle recomputes the closure "
    "with recursive SQL.",
)
def dedup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.components import assign_components

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    labeled = assign_components(
        docs.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b"
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return sizes.groupBy("comp_size").agg(
        F.count(F.lit(1)).alias("n_components")
    )


def _transform_with_state_available() -> bool:
    """transformWithStateInPandas runs a protobuf-speaking state server
    worker-side; without ``google.protobuf`` the query crashes at
    runtime, so registration is gated on the import. This container
    ships no protobuf — the explicit environment pin lives here (and in
    COVERAGE.md); on a protobuf-equipped deployment the query registers
    and the driver gate picks it up with no code change. The
    applyInPandasWithState twin (streaming_stateful_first_event) covers
    the custom-stateful-streaming surface in the gate everywhere."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _transform_with_state_available():

    @register(
        "streaming_running_totals_events",
        """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""",
        doc="Spark 4 typed-state streaming operator "
        "(transformWithStateInPandas): per-user running count + exact "
        "cents total in a ValueState; each batch emits the cumulative "
        "totals, so the converged answer per user is the emission with "
        "the highest count (streaming/stateful.py:"
        "RunningTotalsProcessor). Registered only where "
        "google.protobuf exists (the state server requires it).",
    )
    def streaming_running_totals_events(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pycasselastic_spark.streaming.stateful import running_totals_per_key

        stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
        updates = _run_stream_to_parquet(
            spark, running_totals_per_key(stream.select("user_id", "value")), "append"
        )
        # cumulative emissions are monotone in n_events; the converged
        # answer is the latest (highest-count) emission per user
        return updates.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )


