"""Analyzer-stage search queries: the round-11 family — stemmer and
synonym chain stages, their reindex-upgrade twin, object/dotted-field
doc-values, and the ILM rollover query.

Split out of ``search_dsl.py`` (round-12 verdict item 8, same
invariants as every catalog split: registered name set unchanged,
global registration order byte-identical — this module is imported
immediately AFTER ``search_dsl`` and BEFORE ``search_es_queries``,
which is exactly where these registrations sat inside the old
monolith). Shared helpers (the per-sf base index cache and the BM25
oracle template) stay in ``search_dsl``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.plans.tuning import ensure_parallelism
from pycasselastic_spark.queries.base import _t, register

# ---------------------------------------------------------------------------
# ROUND 11: stemmer + synonym analyzer stages (round-10 verdict item
# 2). The reference delegates analysis wholesale to ES
# (pyCassElastic.py:329,334 — index auto-creation with default
# analyzers), and a real ES migration corpus routinely carries a
# stemmer or synonym filter; both are now chain stages persisted in
# stats.json like everything else (operators/search_index.py:Analyzer
# — synonyms fold at index AND query time, the stemmer is Harman's
# S-stemmer, ES minimal_english's shape). The corpus fixture has no
# plural forms, so the stemmer queries derive deterministic plural
# noise (every 4th token slot gains an 's') the oracle replays with
# 1-based list arithmetic — the same messy-text pattern as the
# round-10 analyzer queries.
# ---------------------------------------------------------------------------

# branch-internal exception guards: an exception TERMINATES its
# suffix class ('goes' stays 'goes', never falling through to the
# bare -s rule) — byte-identical to Analyzer._apply_col/apply_py
_STEM_SQL_CASE = """
      x -> CASE WHEN x LIKE '%ies' THEN
                  CASE WHEN len(x) >= 4 AND x NOT LIKE '%eies'
                            AND x NOT LIKE '%aies'
                       THEN substring(x, 1, len(x) - 3) || 'y'
                       ELSE x END
                WHEN x LIKE '%es' THEN
                  CASE WHEN len(x) >= 4 AND x NOT LIKE '%aes'
                            AND x NOT LIKE '%ees' AND x NOT LIKE '%oes'
                       THEN substring(x, 1, len(x) - 1)
                       ELSE x END
                WHEN x LIKE '%s' THEN
                  CASE WHEN len(x) >= 4 AND x NOT LIKE '%us'
                            AND x NOT LIKE '%ss'
                       THEN substring(x, 1, len(x) - 1)
                       ELSE x END
                ELSE x END
"""

_STEMMED_ORACLE_TEMPLATE = (
    """
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
mt AS (SELECT doc_id,
  list_transform(range(1, len(t) + 1), i ->
    CASE WHEN (i - 1) % 4 = 0 THEN t[i] || 's' ELSE t[i] END) AS m
  FROM t0),
an AS (SELECT doc_id,
  list_filter(
    list_transform(
      list_transform(m, x ->
        regexp_replace(lower(x), '[^a-zA-Z0-9]', '', 'g')),
"""
    + _STEM_SQL_CASE
    + """),
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
)


def _stem_analyzer() -> "SRCH.Analyzer":
    return SRCH.Analyzer(lowercase=True, strip_punct=True, stem=True)


def _plural_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic plural noise: token slot i
    (0-based) gains a trailing 's' when i % 4 == 0 — the oracle
    derives the identical bytes with 1-based list arithmetic. No base
    corpus token ends in 's', so only the injected plurals stem."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    toks = F.split(F.col("text"), " ")
    plural = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                i % 4 == 0, F.concat(x, F.lit("s"))
            ).otherwise(x),
        ),
        " ",
    )
    return docs.select("doc_id", plural.alias("text"))


_STEMMED_INDEX_CACHE: dict[str, str] = {}


def _stemmed_index_for(
    spark: SparkSession, sf_dir: str
) -> "SRCH.PostingsIndex":
    path = _STEMMED_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="stemmed_idx_"), "idx")
        SRCH.build_postings_index(
            _plural_documents(spark, sf_dir), "doc_id", "text", path,
            n_buckets=16, analyzer=_stem_analyzer(),
        )
        _STEMMED_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "stemmed_bm25_documents",
    _STEMMED_ORACLE_TEMPLATE.format(terms="'merge', 'sort'"),
    doc="A stemmer stage in the analyzer chain "
    "(operators/search_index.py:Analyzer(stem=True), round-11 verdict "
    "item 2): Harman's S-stemmer — the shape of ES's minimal_english "
    "filter — folds '-ies'/'-es'/'-s' suffixes at ingest AND query "
    "time, so the injected plural forms ('merges', 'sorts') and their "
    "singulars score as ONE term (tf folds exactly like a re-ingested "
    "token). Pure CASE-on-suffix string arithmetic: the Spark column "
    "expression, the Python query-side twin, and the DuckDB oracle "
    "compute it byte-identically. The probe analyzes the raw query "
    "['Merges,', 'sorts'] driver-side so partition pruning still sees "
    "literal terms.",
)
def stemmed_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _stemmed_index_for(spark, sf_dir)
    terms = idx.analyze_terms(["Merges,", "sorts"])
    assert terms == ["merge", "sort"]
    return SRCH.bm25_topk_indexed(idx, terms, k=10)


_SYNONYM_ORACLE_TEMPLATE = """
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
an AS (SELECT doc_id,
  list_filter(
    list_transform(
      list_transform(t, x ->
        CASE WHEN regexp_replace(lower(x), '[^a-zA-Z0-9]', '', 'g')
                  IN ('a', 'the')
             THEN ''
             ELSE regexp_replace(lower(x), '[^a-zA-Z0-9]', '', 'g') END),
      x -> CASE WHEN x = 'join' THEN 'merge'
                WHEN x = 'agg' THEN 'group' ELSE x END),
    x -> x <> '') AS toks
  FROM t0),
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


def _syn_analyzer() -> "SRCH.Analyzer":
    return SRCH.Analyzer(
        lowercase=True, strip_punct=True, stopwords=("a", "the"),
        synonyms=(("join", "merge"), ("agg", "group")),
    )


_SYNONYM_INDEX_CACHE: dict[str, str] = {}


def _synonym_index_for(
    spark: SparkSession, sf_dir: str
) -> "SRCH.PostingsIndex":
    path = _SYNONYM_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="synonym_idx_"), "idx")
        SRCH.build_postings_index(
            ensure_parallelism(_t(spark, sf_dir, "documents"), spark),
            "doc_id", "text", path, n_buckets=16, analyzer=_syn_analyzer(),
        )
        _SYNONYM_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "synonym_bm25_documents",
    _SYNONYM_ORACLE_TEMPLATE.format(terms="'merge', 'window'"),
    doc="A synonym stage in the analyzer chain "
    "(operators/search_index.py:Analyzer(synonyms=...), round-11 "
    "verdict item 2): ordered single-token rewrites applied at BOTH "
    "index and query time — ES's synonym filter in its index-time "
    "form — fold 'join' into 'merge' (and 'agg' into 'group'), so a "
    "doc containing either variant scores under ONE stored term with "
    "tf summed and position slots unioned, and the raw user query "
    "['Join,', 'window'] analyzes to ['merge', 'window'] driver-side. "
    "df/idf therefore count the MERGED posting set — the oracle "
    "replays the fold from raw text, proving index-time synonyms "
    "change statistics exactly like a bigger corpus of the canonical "
    "term, never like two separate terms.",
)
def synonym_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _synonym_index_for(spark, sf_dir)
    terms = idx.analyze_terms(["Join,", "window"])
    assert terms == ["merge", "window"]
    return SRCH.bm25_topk_indexed(idx, terms, k=10)


@register(
    "reindex_upgrade_stemmer_documents",
    _STEMMED_ORACLE_TEMPLATE.format(terms="'scan', 'row'"),
    doc="Adding a stemmer is a REINDEX, not an ingest (round-11 "
    "verdict item 2, same contract as the round-10 analyzer upgrade): "
    "a LEGACY exact-token index over the plural-noised corpus "
    "upgrades to the lowercase/punct/stem chain via "
    "reindex_postings_index(analyzer=...) from stored postings alone "
    "— legacy terms are the original token bytes, so mapping them "
    "through the new chain (suffixes folded, tf summed, position "
    "slots unioned) is exact; re-analyzing an ALREADY-analyzed index "
    "still raises (lossy tokens), the guard this query's twin pinned "
    "in round 10. The staged-tmp-dir + single-rename + alias-swap "
    "crash contract is unchanged. Proof: the probe through the "
    "swapped alias ranks exactly like the stemmed-from-birth oracle.",
)
def reindex_upgrade_stemmer_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    plural = _plural_documents(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="reindex_stem_")
    v1, v2 = os.path.join(base, "idx_v1"), os.path.join(base, "idx_v2")
    alias = os.path.join(base, "docs.alias")
    SRCH.build_postings_index(plural, "doc_id", "text", v1, n_buckets=16)
    SRCH.set_index_alias(alias, v1)
    SRCH.reindex_postings_index(spark, v1, v2, analyzer=_stem_analyzer())
    SRCH.set_index_alias(alias, v2)
    idx = SRCH.load_postings_index_by_alias(spark, alias)
    terms = idx.analyze_terms(["Scans,", "rows"])
    assert terms == ["scan", "row"]
    return SRCH.bm25_topk_indexed(idx, terms, k=10)


# ---------------------------------------------------------------------------
# ROUND 11: object/dotted-field search (round-10 verdict item 3). The
# ES ``_source`` is nested JSON in principle (SURVEY §1.2); the
# reference only ever read flat fields (pyCassElastic.py:272-274)
# because its corpus was flat — a real migration corpus carries
# object fields like {"meta": {"lang": "en"}}, which ES flattens to
# the dotted path ``meta.lang``. The index now does the same: a
# stored_fields entry may be a dotted path into a struct column,
# resolved through the struct at ingest and stored FLATTENED under
# its literal dotted name in the doc-values relation; every
# doc-values probe quotes literal names (search_index.py:dv_col), so
# filter/term/sort/aggs accept dotted paths end-to-end from the ES
# request body. Nested ARRAYS of objects (ES ``nested`` type) raise
# by name.
# ---------------------------------------------------------------------------

_OBJECT_INDEX_CACHE: dict[str, str] = {}


def _object_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an ES-style object column: meta = {lang, source}
    (the flat fixture columns folded INTO a struct, so the dotted-path
    resolution does real work)."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id", "text", "n_chars",
        F.struct(F.col("lang"), F.col("source")).alias("meta"),
    )


def _object_index_for(
    spark: SparkSession, sf_dir: str
) -> "SRCH.PostingsIndex":
    path = _OBJECT_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="object_idx_"), "idx")
        SRCH.build_postings_index(
            _object_documents(spark, sf_dir), "doc_id", "text", path,
            n_buckets=16,
            # one dotted path + one flat column: both forms coexist in
            # the same doc-values relation
            stored_fields=["meta.lang", "n_chars"],
        )
        _OBJECT_INDEX_CACHE[sf_dir] = path
    return SRCH.load_postings_index(spark, path)


@register(
    "object_field_search_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('merge',)),
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
  SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars >= 300
)
GROUP BY doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES object-field search over struct columns (round-11 verdict "
    "item 3): the docs frame folds lang/source into a ``meta`` struct, "
    "the index stores the DOTTED PATH ``meta.lang`` as a doc-values "
    "field (resolved through the struct at ingest, flattened under its "
    "literal dotted name — exactly ES's object-field mapping), and the "
    "ES request body {'term': {'meta.lang': 'en'}} dispatches through "
    "es_search's filter context against stored state: pushed parquet "
    "predicates, non-scoring, no raw docs frame at query time. A flat "
    "field (n_chars range) rides the same filter list, proving dotted "
    "and flat doc-values coexist. Nested arrays (ES 'nested' type) "
    "raise naming the feature. The oracle replays the filters from the "
    "flat fixture columns — the struct fold must be semantically "
    "invisible.",
)
def object_field_search_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.search_api import es_search

    idx = _object_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"bool": {
            "must": [{"match": {"text": "merge"}}],
            "filter": [
                {"term": {"meta.lang": "en"}},
                {"range": {"n_chars": {"gte": 300}}},
            ],
        }},
        "size": 10,
    })


@register(
    "rollover_bm25_documents",
    """
WITH RECURSIVE
counts AS (
  SELECT CAST(doc_id % 3 AS BIGINT) AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
),
m AS (SELECT CAST(FLOOR((COUNT(*) + 1) / 2.0) AS BIGINT) AS max_docs
      FROM documents),
sim(b, gen, n) AS (
  SELECT CAST(-1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT s.b + 1,
         CASE WHEN s.n >= m.max_docs THEN s.gen + 1 ELSE s.gen END,
         CASE WHEN s.n >= m.max_docs THEN 0 ELSE s.n END + c.c
  FROM sim s, m, counts c
  WHERE c.b = s.b + 1 AND s.b < 2
),
assign AS (SELECT b, gen FROM sim WHERE b >= 0),
docgen AS (
  SELECT doc_id, gen FROM documents
  JOIN assign ON assign.b = doc_id % 3
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
gsc AS (
  SELECT gen, CAST(COUNT(*) AS DOUBLE) AS n_docs,
         AVG(CAST(dl.dl AS DOUBLE)) AS avgdl
  FROM dl JOIN docgen USING (doc_id) GROUP BY gen
),
qt AS (
  SELECT p.term, p.doc_id, p.tf, dg.gen
  FROM postings p JOIN docgen dg USING (doc_id)
  WHERE p.term IN ('merge', 'scan')
),
dfreq AS (
  SELECT gen, term, CAST(COUNT(*) AS BIGINT) AS df
  FROM qt GROUP BY gen, term
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM(
         ln(1.0 + (gsc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (qt.tf * 2.2)
         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / gsc.avgdl))
       ) * 1048576.0) AS BIGINT) AS score_q20
FROM qt
JOIN dfreq ON dfreq.gen = qt.gen AND dfreq.term = qt.term
JOIN dl USING (doc_id)
JOIN gsc ON gsc.gen = qt.gen
GROUP BY doc_id, qt.gen
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ILM-style index ROLLOVER (operators/search_rollover.py, "
    "round-11 verdict item 4): three daemon-cadence ingests flow "
    "through ingest_with_rollover under RolloverPolicy(max_docs = "
    "half the corpus) — the third ingest finds the live index full, "
    "opens generation ix-00000002, appends the family manifest (one "
    "atomic rename) and swaps the write alias (set_index_alias's "
    "single rename), while ix-00000001 stays fully probe-able. The "
    "probe (rollover_bm25_topk) is the SEARCH alias spanning both "
    "generations: per-index pruned probes score with each "
    "generation's OWN n_docs/avgdl/df (exactly ES across a "
    "multi-index alias), unioned query-bounded, cross-generation LWW "
    "window, TakeOrderedAndProject. The oracle replays the rollover "
    "trigger itself — a recursive-CTE fold over the batch counts "
    "reproduces the generation assignment at any scale factor — then "
    "per-generation BM25, proving the rolled family ranks exactly "
    "like the simulated one.",
)
def rollover_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    max_docs = (docs.count() + 1) // 2
    family = os.path.join(tempfile.mkdtemp(prefix="rollover_fam_"), "fam")
    for b in range(3):
        SRCH.ingest_with_rollover(
            docs.filter(F.col("doc_id") % 3 == b), "doc_id", "text",
            family, SRCH.RolloverPolicy(max_docs=max_docs), n_buckets=16,
        )
    return SRCH.rollover_bm25_topk(spark, family, ["merge", "scan"], k=10)
