"""ES API surface served from the stored index — snapshot-probe,
percolator (batch + streaming), term vectors, phrase suggester,
explain, hybrid RRF retrieval, msearch.

Split out of ``search_dsl.py`` (round-9, same invariants: name set
unchanged, global registration order byte-identical — imported
immediately after ``search_es_queries``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.queries.base import QUERIES, _t, register
from pycasselastic_spark.queries.search_dsl import (
    _BM25_ORACLE_TEMPLATE,
    _INDEX_CACHE,
    _postings_index_for,
)

@register(
    "snapshot_probe_bm25_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'group', 'sort'"),
    doc="ES snapshot/restore: a crash-consistent point-in-time copy "
    "of the stored index (capture stats.json FIRST — freezing the "
    "committed-generation set — copy relation dirs, write the "
    "captured stats LAST into a temp dir that becomes the snapshot "
    "via one atomic rename; operators/search.py:"
    "snapshot_postings_index), then a normal pruned BM25 probe of the "
    "RESTORED index ('restore' is just load_postings_index — a "
    "snapshot IS a full index). An update committing mid-copy stays "
    "invisible because its generation is outside the captured set — "
    "the crash-orphan contract extended to backups. The oracle "
    "replaying full-corpus BM25 against the probe proves the copy is "
    "lossless. The snapshot is taken fresh in-window (heavy-by-design "
    "like the delta/reindex maintenance queries).",
)
def snapshot_probe_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _INDEX_CACHE.get(sf_dir) or (_postings_index_for(spark, sf_dir) and _INDEX_CACHE[sf_dir])
    dst = os.path.join(tempfile.mkdtemp(prefix="idx_snapshot_"), "snap")
    SRCH.snapshot_postings_index(src, dst)
    snap = SRCH.load_postings_index(spark, dst)
    return SRCH.bm25_topk_indexed(snap, ["group", "sort"], k=10)


@register(
    "percolate_documents",
    """
WITH tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
q AS (
  SELECT * FROM (VALUES
    ('both_spark_merge', 'spark', 2),
    ('both_spark_merge', 'merge', 2),
    ('rare_dup', 'dup', 1),
    ('two_of_three', 'fast', 2),
    ('two_of_three', 'table', 2),
    ('two_of_three', 'vector', 2)
  ) t(query_id, term, min_match)
)
SELECT doc_id, query_id, CAST(COUNT(*) AS BIGINT) AS n_matched
FROM tok JOIN q USING (term)
GROUP BY doc_id, query_id, min_match
HAVING COUNT(*) >= min_match
""",
    doc="ES percolator — search REVERSED (operators/search.py:"
    "percolate): three stored queries (a bool-must pair, a "
    "single-term alert on rare 'dup', a 2-of-3 minimum_should_match) "
    "matched against every incoming document. The query table "
    "explodes to (query_id, term) — query-table-sized — and "
    "broadcasts to the corpus's distinct (doc, term) pairs, so the "
    "corpus is tokenized once and shuffles only on the match-bounded "
    "(doc, query) aggregation; a huge saved-search table falls back "
    "to a term shuffle join. Oracle replays the match-count algebra "
    "over a VALUES literal of the same stored queries.",
)
def percolate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            ("both_spark_merge", ["spark", "merge"], 2),
            ("rare_dup", ["dup"], 1),
            ("two_of_three", ["fast", "table", "vector"], 2),
        ],
        "query_id STRING, terms ARRAY<STRING>, min_match INT",
    )
    return SRCH.percolate(docs, "doc_id", "text", queries)


@register(
    "term_vectors_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
p AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
mine AS (SELECT term, tf FROM p WHERE doc_id = 42),
d AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p
  WHERE term IN (SELECT term FROM mine) GROUP BY term
)
SELECT term, tf, df FROM mine JOIN d USING (term)
""",
    doc="ES _termvectors with term_statistics=true for doc 42 "
    "(operators/search.py:term_vectors): the doc's terms with in-doc "
    "tf and corpus-wide df, entirely from stored state — the FORWARD "
    "relation (ibucket partition pruning + pushed id filter) gives "
    "the terms/tfs, and those few terms probe the postings for df "
    "exactly like a BM25 query. Raw text never read. Oracle rebuilds "
    "both statistics from the corpus.",
)
def term_vectors_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.term_vectors(idx, 42)


@register(
    "phrase_suggest_documents",
    """
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(len(toks))) AS i) t
  WHERE toks[i+1] <> ''
),
dict AS (SELECT DISTINCT term FROM tok),
c1 AS (SELECT term FROM dict WHERE levenshtein(term, 'fsat') <= 2),
c2 AS (SELECT term FROM dict WHERE levenshtein(term, 'tabel') <= 2),
a AS (SELECT doc_id, pos, term FROM tok WHERE term IN (SELECT term FROM c1)),
b AS (SELECT doc_id, pos, term FROM tok WHERE term IN (SELECT term FROM c2))
SELECT a.term || ' ' || b.term AS suggestion,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(levenshtein(a.term, 'fsat') + levenshtein(b.term, 'tabel')
            AS BIGINT) AS dist_sum
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.term, b.term
ORDER BY n_occurrences DESC, dist_sum ASC, suggestion ASC LIMIT 3
""",
    doc="ES phrase suggester for misspelled 'fsat tabel' "
    "(operators/search.py:suggest_phrase): each slot expands to its "
    "dictionary neighborhood via the stored FastSS probe + exact "
    "levenshtein verify, then candidate phrases rank by how often "
    "they occur IN ORDER corpus-wide — the position-adjacency chain "
    "join over only the candidate terms' postings, counting every "
    "chain instance. Did-you-mean quality comes from bigram "
    "frequency, not per-word closeness. Oracle rebuilds positions "
    "from raw text and replays neighborhood + adjacency + ranking.",
)
def phrase_suggest_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.suggest_phrase(idx, ["fsat", "tabel"], k=3, max_dist=2)


@register(
    "explain_score_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('spark', 'merge', 'window')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents)
SELECT qt.term,
       qt.tf,
       dfreq.df,
       CAST(dl.dl AS BIGINT) AS dl,
       CAST(FLOOR(
         ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * 1048576.0) AS BIGINT) AS idf_q20,
       CAST(FLOOR(
         ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (qt.tf * 2.2)
         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         * 1048576.0) AS BIGINT) AS term_score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
WHERE qt.doc_id = 42
""",
    doc="ES _explain for doc 42 against 'spark merge window' "
    "(operators/search.py:explain_score): the per-term BM25 breakdown "
    "— tf, df, dl, quantized idf and term contribution — so an "
    "operator sees WHY a doc ranked where it did. One pruned postings "
    "probe supplies the query's df rows AND the target doc's tf/dl; "
    "query-bounded, no corpus scan, no raw text. Oracle replays the "
    "identical per-term arithmetic from the corpus.",
)
def explain_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.explain_score(idx, 42, ["spark", "merge", "window"])


from pycasselastic_spark.queries.pipeline_text import (  # noqa: E402
    _DOT_SQL,
    _UNIT_SQL,
)


@register(
    "hybrid_rrf_documents",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('spark', 'merge')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents),
scored AS (
  SELECT doc_id,
         CAST(FLOOR(SUM(
           ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (qt.tf * 2.2)
           / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         ) * 1048576.0) AS BIGINT) AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id, sc.n_docs
),
text_leg AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS text_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_q20 DESC, doc_id ASC) AS rn
    FROM scored) WHERE rn <= 50
),
{_UNIT_SQL.strip().rstrip()},
knn AS (
  SELECT c.vec_id AS doc_id,
         {_DOT_SQL.format(a='q.u', b='c.u')} AS cosine
  FROM eu c CROSS JOIN (SELECT u FROM eu WHERE vec_id = 7) q
  WHERE c.vec_id <> 7
),
knn_leg AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS knn_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS rn
    FROM knn) WHERE rn <= 50
)
SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
       CAST(FLOOR(
         (COALESCE(1.0 / (60.0 + CAST(t.text_rank AS DOUBLE)), 0.0)
          + COALESCE(1.0 / (60.0 + CAST(v.knn_rank AS DOUBLE)), 0.0))
         * 1048576.0) AS BIGINT) AS rrf_q20,
       t.text_rank,
       v.knn_rank
FROM text_leg t FULL OUTER JOIN knn_leg v USING (doc_id)
ORDER BY rrf_q20 DESC, doc_id ASC LIMIT 10
""",
    doc="ES hybrid search with reciprocal rank fusion (the 8.8+ rrf "
    "retriever, the standard RAG retrieval pattern): lexical BM25 "
    "top-50 for 'spark merge' fused with exact-cosine kNN top-50 "
    "around vector 7 by sum(1/(60+rank)) over the legs a doc appears "
    "in — ranks, not scores, so the legs' scales never need "
    "calibrating (operators/search.py:hybrid_rrf_search). Both legs "
    "bounded (pruned postings probe; one broadcast query vector over "
    "the embeddings scan), fusion a full outer join of two <=50-row "
    "relations. Oracle replays BM25 ranks, the bit-replayable "
    "unit-normalize + sequential-dot cosine ranks, and the fused "
    "reciprocals in identical operation order.",
)
def hybrid_rrf_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    return SRCH.hybrid_rrf_search(
        idx, emb, ["spark", "merge"], 7, k=10, n_text=50, n_knn=50
    )


_PERCOLATE_ORACLE = QUERIES["percolate_documents"].oracle


@register(
    "streaming_percolate_documents",
    _PERCOLATE_ORACLE,
    doc="The percolator as the reference's daemon would run it: an "
    "alerting loop over a DOCUMENT STREAM — each micro-batch matches "
    "its new docs against the same stored queries and appends the "
    "alerts (operators/search.py:percolate under foreachBatch). "
    "Percolation is a per-document decision with NO cross-batch "
    "state, so the streamed union is exactly the batch answer — the "
    "oracle is the batch percolate SQL verbatim, making the "
    "stream/batch equivalence a checked value identity, not a claim.",
)
def streaming_percolate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    workdir = tempfile.mkdtemp(prefix="stream_perc_")
    src = os.path.join(workdir, "src")
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    queries = spark.createDataFrame(
        [
            ("both_spark_merge", ["spark", "merge"], 2),
            ("rare_dup", ["dup"], 1),
            ("two_of_three", ["fast", "table", "vector"], 2),
        ],
        "query_id STRING, terms ARRAY<STRING>, min_match INT",
    )
    out = os.path.join(workdir, "matches")

    def handle(batch, _bid):
        SRCH.percolate(batch, "doc_id", "text", queries).write.mode(
            "append"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@register(
    "msearch_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qmap AS (
  SELECT * FROM (VALUES
    ('q_joins', 'spark'), ('q_joins', 'merge'),
    ('q_scans', 'scan'), ('q_scans', 'hash'),
    ('q_windows', 'fast'), ('q_windows', 'table'), ('q_windows', 'window')
  ) t(query_id, term)
),
qt AS (SELECT * FROM postings
       WHERE term IN (SELECT DISTINCT term FROM qmap)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents),
scored AS (
  SELECT qmap.query_id, qt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(FLOOR(SUM(
           ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (qt.tf * 2.2)
           / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         ) * 1048576.0) AS BIGINT) AS score_q20
  FROM qt JOIN dfreq USING (term) JOIN qmap USING (term)
       JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY qmap.query_id, qt.doc_id, sc.n_docs
)
SELECT query_id, doc_id, n_hit_terms, score_q20, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_q20 DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="ES _msearch: three named queries answered in ONE pass over "
    "the stored index (operators/search.py:bm25_msearch) — the "
    "postings probe, the query-independent per-term df, and the "
    "scoring shuffle are paid once for the UNION of all query terms; "
    "the (query_id, term) membership map rides as a broadcast "
    "literal, and ranking is one window PARTITIONED by query_id so "
    "the batch spreads across the cluster. Per-query slices are "
    "pinned equal to standalone probes in tests. Oracle replays the "
    "shared-probe algebra with the same VALUES map.",
)
def msearch_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_msearch(
        idx,
        {
            "q_joins": ["spark", "merge"],
            "q_scans": ["scan", "hash"],
            "q_windows": ["fast", "table", "window"],
        },
        k=5,
    )
