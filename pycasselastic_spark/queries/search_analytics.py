"""Search + analytics: inverted index, BM25 (corpus-scan AND persisted-index probes), TF-IDF, phrase/slop, PMI, funnel / cohort, multi-as-of LWW, hybrid skew join, lwwstore Python Data Source contract queries.

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
from pycasselastic_spark.streaming.sync import (  # noqa: F401,E402
    SnapshotStore,
    read_event_stream,
    read_table_stream,
    start_streaming_sync,
)
from pycasselastic_spark.queries.pipeline_text import (  # noqa: F401
    _JACCARD_POSTING_SQL,
    _SHINGLES_SQL,
)


# ---------------------------------------------------------------------------
# Round-7 additions: the search side of the ES story (inverted index,
# BM25 ranking, TF-IDF, phrase match — the reference syncs INTO
# Elasticsearch precisely so ES can run these; SURVEY.md §1), plus the
# remaining pipeline primitives (containment dedup, leakage-safe split,
# per-source caps, hybrid skew join, funnel/cohort analytics,
# multi-as-of LWW snapshots).
# ---------------------------------------------------------------------------

from pycasselastic_spark.core.merge import lww_snapshots  # noqa: E402
from pycasselastic_spark.operators import search as SRCH  # noqa: E402
from pycasselastic_spark.operators.components import assign_components  # noqa: E402
from pycasselastic_spark.operators.skew import hybrid_skew_join  # noqa: E402

_TOKENS_SQL = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
)
"""


@register(
    "inverted_index_documents",
    f"""
WITH {_TOKENS_SQL}
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       CAST(MAX(tf) AS BIGINT) AS max_tf
FROM postings GROUP BY term
""",
    doc="Inverted-index dictionary stats (term -> df / total_tf / "
    "max_tf): the search-engine side of the reference's ES sync "
    "(pyCassElastic.py:316-354 ships documents to ES for exactly "
    "this). Explode + two hash aggregations, both with map-side "
    "partials; the postings shuffle is keyed by (term, doc) so hot "
    "terms spread over reducers (operators/search.py).",
)
def inverted_index_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return SRCH.inverted_index_stats(docs, "doc_id", "text")


@register(
    "bm25_search_documents",
    f"""
WITH {_TOKENS_SQL},
qt AS (SELECT * FROM postings WHERE term IN ('spark', 'merge', 'window')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM(
         ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (qt.tf * 2.2)
         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
       ) * 1048576.0) AS BIGINT) AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
GROUP BY doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="BM25 top-10 for the query 'spark merge window' — ES/Lucene's "
    "default ranking, natively (operators/search.py:bm25_topk). "
    "Postings filtered to the query's terms before any join; df and "
    "the N/avgdl scalars ride broadcasts; top-k is "
    "TakeOrderedAndProject. Scores Q20-quantized for cross-engine "
    "determinism (ln agrees to 1 ulp, far inside the step).",
)
def bm25_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return SRCH.bm25_topk(docs, "doc_id", "text", ["spark", "merge", "window"], k=10)


@register(
    "tfidf_top_terms_documents",
    f"""
WITH {_TOKENS_SQL},
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT p.doc_id, p.term, p.tf,
         CAST(FLOOR(p.tf * ln(n.n_docs / dfreq.df) * 1048576.0) AS BIGINT)
           AS tfidf_q20
  FROM postings p JOIN dfreq USING (term) CROSS JOIN n)
SELECT doc_id, term, tf, tfidf_q20
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf_q20 DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
""",
    doc="Per-document top-3 TF-IDF terms (tf * ln(N/df), Q20): the "
    "keyword-extraction / relevance-weighting primitive. The term "
    "dictionary joins back BROADCAST (tiny vs postings, Heaps' law); "
    "the per-doc top-k is a window partitioned by doc — no global "
    "sort (operators/search.py:tfidf_top_terms).",
)
def tfidf_top_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return SRCH.tfidf_top_terms(docs, "doc_id", "text", k=3)


@register(
    "phrase_search_documents",
    """
SELECT doc_id,
       CAST((len(text) - len(replace(text, 'fast table', ''))) / 10
            AS BIGINT) AS n_hits
FROM documents
WHERE len(text) <> len(replace(text, 'fast table', ''))
""",
    doc="Exact phrase search ('match_phrase', the other ES query type "
    "the reference feeds): occurrence counts via pure string ops "
    "(len - len(replace))/len(phrase) — identical integers on any "
    "engine, no regex. Narrow scan predicate, zero shuffles "
    "(operators/search.py:phrase_search).",
)
def phrase_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return SRCH.phrase_search(docs, "doc_id", "text", "fast table")


@register(
    "containment_neardup_documents",
    f"""
WITH {_SHINGLES_SQL},
e AS (SELECT doc_id, unnest(s) AS g FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_inner, b.doc_id AS doc_outer,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_inner FROM sh)
SELECT doc_inner, doc_outer, shared, n_inner,
       CAST(shared AS DOUBLE) / n_inner AS containment
FROM pairs JOIN n ON n.doc_id = pairs.doc_inner
WHERE CAST(shared AS DOUBLE) / n_inner >= 0.8
""",
    doc="ASYMMETRIC containment near-dup: |A∩B|/|A| >= 0.8 catches 'A "
    "quoted inside a much longer B', which symmetric Jaccard "
    "structurally misses (Broder's resemblance-vs-containment "
    "distinction). Candidates from a posting-list equi-join on "
    "exploded shingles — same single-key shuffle as the LSH band "
    "join, never all-pairs; at corpus scale the max_shingle_df dial "
    "drops boilerplate shingles pre-join "
    "(operators/dedup.py:containment_pairs).",
)
def containment_neardup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return D.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@register(
    "cluster_aware_split_documents",
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
  SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node)
SELECT doc_id, component,
       CASE WHEN substring(md5(CAST(component AS VARCHAR)), 1, 4) < 'cccc'
            THEN 'train' ELSE 'heldout' END AS split
FROM comp
""",
    doc="Leakage-safe train/heldout split: the COMPONENT of the "
    "near-dup graph decides (md5 of the component label under an 80% "
    "threshold), so a heldout doc can never have a near-duplicate in "
    "train — the eval-contamination bug a row-hash split silently "
    "permits. Composes banded-LSH pairs + large/small-star components "
    "+ one pure hash expression (operators/sampling.py:"
    "group_consistent_split); oracle replays the closure with "
    "recursive SQL.",
)
def cluster_aware_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    labeled = assign_components(docs.select("doc_id"), pairs, "doc_id")
    return labeled.select(
        "doc_id",
        "component",
        SP.group_consistent_split(F.col("component"), train_pct=80).alias("split"),
    )


@register(
    "per_source_cap_documents",
    """
SELECT doc_id, source, n_chars
FROM (SELECT doc_id, source, n_chars, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
WHERE rn <= 10
""",
    doc="Per-source document cap (keep the 10 longest per source, "
    "deterministic ties): the per-domain cap every web-corpus "
    "pipeline applies so one boilerplate-heavy domain can't dominate "
    "the mix. One window shuffle on the group key, rank streamed per "
    "partition (operators/sampling.py:per_group_cap).",
)
def per_source_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return SP.per_group_cap(
        docs, "source", [F.col("n_chars").desc(), F.col("doc_id").asc()], 10
    ).select("doc_id", "source", "n_chars")


@register(
    "funnel_analysis_events",
    """
WITH s AS (SELECT user_id, MIN(ts) AS ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
v AS (SELECT e.user_id, MIN(e.ts) AS ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.ts
        AND e.ts <= s.ts + INTERVAL 24 HOUR
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.ts
        AND e.ts <= v.ts + INTERVAL 24 HOUR
      GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view_24h,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_24h
""",
    doc="Ordered conversion funnel (signup -> first view within 24h -> "
    "first purchase within 24h of that view): each stage is a "
    "groupBy-min on the REDUCED previous stage joined back equi on "
    "user_id — per-user relations shrink monotonically, no window "
    "over raw events, no collect.",
)
def funnel_analysis_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter((F.col("ts") > F.col("s_ts")) & (F.col("ts") <= F.col("s_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(F.broadcast(v.agg(F.count(F.lit(1)).alias("n_view_24h"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase_24h"))))
    )


@register(
    "cohort_retention_events",
    """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.week) / 7 AS BIGINT)
         AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM cohort c JOIN active a USING (user_id)
GROUP BY 1, 2
""",
    doc="Weekly cohort retention (cohort = week of first event; one "
    "row per cohort x offset with active-user counts): the "
    "product-analytics staple. Two aggregations over the events scan "
    "plus an equi-join of two per-user reduced relations — the join "
    "inputs are |users| rows, not |events|.",
)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        cohort.join(active, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "hybrid_skew_join_events_customer",
    """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Differentiated skew join: keys with > 80 fact rows broadcast-"
    "join (they never shuffle), the cold tail takes the normal hash "
    "join, union of both routes — salting's sibling for when a few "
    "keys carry most of the volume (operators/skew.py:"
    "hybrid_skew_join). The oracle is the PLAIN join: routing must "
    "not change semantics. Sum floor-scaled to cents (exact on "
    "IEEE doubles).",
)
def hybrid_skew_join_events_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = hybrid_skew_join(ev, cust, ["user_id"], hot_threshold=80)
    # per-row cents BEFORE the sum: floor(v*100) is bit-identical
    # cross-engine and the integer sum is order-independent, while
    # floor(SUM(double)*100) flips at the boundary when aggregation
    # order differs (measured: off-by-one at sf0.1)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
    )


_SNAPSHOT_MS = (1704844800000, 1705449600000, 1706054400000)  # Jan 10/17/24 2024


@register(
    "multi_snapshot_lww_events",
    f"""
WITH {_STORES_SQL}
SELECT snap.v AS snapshot_version, w.id, w.version, w.text, w.event_id, w.source
FROM (VALUES ({_SNAPSHOT_MS[0]}), ({_SNAPSHOT_MS[1]}), ({_SNAPSHOT_MS[2]}))
     AS snap(v)
JOIN LATERAL (
  SELECT id, version, text, event_id, source
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY id ORDER BY version DESC, event_id DESC) AS rn
        FROM base WHERE version <= snap.v)
  WHERE rn = 1) w ON true
""",
    doc="Multi-as-of time travel: the LWW-merged store state at three "
    "audit watermarks in ONE groupBy(id) shuffle — each snapshot is a "
    "conditional max(when(version <= v, ordered-struct)) aggregate "
    "with map-side partials, unpivoted on the REDUCED per-id relation "
    "(core/merge.py:lww_snapshots). The k-shuffle naive plan this "
    "replaces re-scans the table per snapshot.",
)
def multi_snapshot_lww_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cass, es = _event_stores(spark, sf_dir)
    return lww_snapshots(
        [cass, es], "id", "version", list(_SNAPSHOT_MS), tiebreak_cols=["event_id"]
    )


@register(
    "lwwstore_roundtrip_events",
    f"""
WITH {_STORES_SQL},
winners AS (
  SELECT id, version, text, event_id, source
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY id ORDER BY version DESC, event_id DESC) AS rn
        FROM base)
  WHERE rn = 1)
SELECT id, version, text, event_id, source
FROM winners
WHERE version > 1704844800000 AND version <= 1706659200000
""",
    doc="The reference's store semantics as a REAL pluggable Spark "
    "source/sink (PySpark 4 Python Data Source API, "
    "sources/pyds.py): both event stores bulk-write into one "
    "log-structured lwwstore (append-only segments, atomic manifest "
    "commit — O5/O6 versioned upsert); the read back resolves per-id "
    "LWW winners inside bucket-partitioned scans (O7 losers never "
    "surface) with the O1-style half-open version window PUSHED into "
    "the reader via pushFilters. The oracle is the same argmax law "
    "the relational lww_merge obeys — sink+source and operator must "
    "agree exactly.",
)
def lwwstore_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from pycasselastic_spark.sources.pyds import register_lwwstore

    register_lwwstore(spark)
    store = os.path.join(_tf.mkdtemp(prefix="lwwstore_"), "events")
    cass, es = _event_stores(spark, sf_dir)
    schema_ddl = "id BIGINT, version BIGINT, text STRING, event_id BIGINT, source STRING"
    for bulk in (cass, es):
        (
            bulk.select("id", "version", "text", "event_id", "source")
            .write.format("lwwstore")
            .option("path", store)
            .option("schema", schema_ddl)
            .option("tiebreak_col", "event_id")
            .option("n_buckets", "8")
            .mode("append")
            .save()
        )
    out = (
        spark.read.format("lwwstore")
        .option("path", store)
        .option("schema", schema_ddl)
        .option("tiebreak_col", "event_id")
        .option("n_buckets", "8")
        .load()
    )
    return out.filter(
        (F.col("version") > 1704844800000) & (F.col("version") <= 1706659200000)
    )


@register(
    "streaming_lwwstore_sync_events",
    QUERIES["lww_merge_events"].oracle,
    doc="The reference daemon rebuilt END-TO-END through real "
    "pluggable machinery: both event stores bulk-write into an "
    "lwwstore (Python Data Source sink, atomic manifest commits), a "
    "STREAMING read of the same store emits the committed increments "
    "(generation offsets = the reference's lastruntime.log watermark, "
    "O10), and foreachBatch folds them into the LWW snapshot store "
    "(O9). The converged snapshot must equal the batch merge oracle — "
    "source, sink, offsets, and merge all exercised through Spark's "
    "own planner/commit/checkpoint protocol (sources/pyds.py).",
)
def streaming_lwwstore_sync_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.sources.pyds import register_lwwstore
    from pycasselastic_spark.streaming.sync import SnapshotStore, start_streaming_sync

    register_lwwstore(spark)
    workdir = tempfile.mkdtemp(prefix="lwwstore_sync_")
    store_path = os.path.join(workdir, "store")
    schema_ddl = (
        "id BIGINT, version BIGINT, text STRING, event_id BIGINT, source STRING"
    )
    cass, es = _event_stores(spark, sf_dir)
    for bulk in (cass, es):
        (
            bulk.select("id", "version", "text", "event_id", "source")
            .write.format("lwwstore")
            .option("path", store_path)
            .option("schema", schema_ddl)
            .option("n_buckets", "8")
            .mode("append")
            .save()
        )
    increments = (
        spark.readStream.format("lwwstore")
        .option("path", store_path)
        .option("schema", schema_ddl)
        .load()
    )
    snapshot = SnapshotStore(
        spark,
        os.path.join(workdir, "snapshot"),
        "id",
        "version",
        tiebreak_cols=["event_id"],
    )
    q = start_streaming_sync(
        increments, snapshot, os.path.join(workdir, "checkpoint")
    )
    q.awaitTermination()
    return snapshot.current()


@register(
    "term_cooccurrence_pmi_documents",
    f"""
WITH {_TOKENS_SQL},
dterm AS (SELECT DISTINCT term, doc_id FROM postings),
c1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dterm GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS c12
  FROM dterm a JOIN dterm b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
  HAVING COUNT(*) >= 5)
SELECT term_a, term_b, c12,
       CAST(FLOOR(ln(c12 * n.n_docs / (ca.df * cb.df)) * 1048576.0) AS BIGINT)
         AS pmi_q20
FROM pairs JOIN c1 ca ON ca.term = pairs.term_a
           JOIN c1 cb ON cb.term = pairs.term_b
           CROSS JOIN n
ORDER BY pmi_q20 DESC, term_a, term_b
LIMIT 20
""",
    doc="Term co-occurrence mining: top-20 within-document term pairs "
    "by pointwise mutual information (PMI = ln(c12*N/(c1*c2)), Q20 "
    "fixed point) with a minimum-support floor — the corpus-statistics "
    "primitive behind collocation extraction and phrase induction. "
    "Pairs come from a doc-keyed self-join of DISTINCT (term, doc) "
    "postings — bounded per doc by distinct-terms², never corpus-"
    "quadratic (at web scale the standard prune is per-doc top-k terms "
    "first); support floor applied before the df join; top-k is "
    "TakeOrderedAndProject.",
)
def term_cooccurrence_pmi_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    dterm = SRCH.term_postings(docs, "doc_id", "text").select("term", "doc_id")
    c1 = dterm.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    a = dterm.select(F.col("term").alias("term_a"), "doc_id")
    b = dterm.select(F.col("term").alias("term_b"), "doc_id")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    scored = (
        pairs.join(
            F.broadcast(c1.select(F.col("term").alias("term_a"), F.col("df").alias("_dfa"))),
            "term_a",
        )
        .join(
            F.broadcast(c1.select(F.col("term").alias("term_b"), F.col("df").alias("_dfb"))),
            "term_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "c12",
            F.floor(
                F.log(F.col("c12") * F.col("n_docs") / (F.col("_dfa") * F.col("_dfb")))
                * float(1 << 20)
            )
            .cast("long")
            .alias("pmi_q20"),
        )
    )
    return scored.orderBy(
        F.col("pmi_q20").desc(), F.col("term_a"), F.col("term_b")
    ).limit(20)


@register(
    "streaming_lwwstore_replicate_events",
    QUERIES["lwwstore_roundtrip_events"].oracle,
    doc="Continuous store-to-store replication — the reference's "
    "actual topology (C* -> ES) — through real pluggable machinery: "
    "both event stores bulk-write into lwwstore A, a STREAMING read "
    "of A feeds a STREAMING lwwstore write into B (per-micro-batch "
    "manifest commits, batchId-idempotent — at-least-once delivery "
    "becomes exactly-once visibility, sources/pyds.py:"
    "LwwStoreStreamWriter), and B is read back with the O1-style "
    "pushed version window. B's winners must value-match the same "
    "argmax oracle as the direct roundtrip: replication through the "
    "streaming path must be invisible in the result.",
)
def streaming_lwwstore_replicate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from pycasselastic_spark.sources.pyds import register_lwwstore

    register_lwwstore(spark)
    workdir = _tf.mkdtemp(prefix="lwwstore_repl_")
    src_store = os.path.join(workdir, "a")
    dst_store = os.path.join(workdir, "b")
    schema_ddl = (
        "id BIGINT, version BIGINT, text STRING, event_id BIGINT, source STRING"
    )
    cass, es = _event_stores(spark, sf_dir)
    for bulk in (cass, es):
        (
            bulk.select("id", "version", "text", "event_id", "source")
            .write.format("lwwstore")
            .option("path", src_store)
            .option("schema", schema_ddl)
            .option("n_buckets", "8")
            .mode("append")
            .save()
        )
    q = (
        spark.readStream.format("lwwstore")
        .option("path", src_store)
        .option("schema", schema_ddl)
        .load()
        .writeStream.format("lwwstore")
        .option("path", dst_store)
        .option("schema", schema_ddl)
        .option("n_buckets", "8")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        spark.read.format("lwwstore")
        .option("path", dst_store)
        .option("schema", schema_ddl)
        .option("tiebreak_col", "event_id")
        .option("n_buckets", "8")
        .load()
    )
    return out.filter(
        (F.col("version") > 1704844800000) & (F.col("version") <= 1706659200000)
    )
