"""ES query-DSL shapes served from the stored postings index — the
round-9 post-gate family (match controls, pagination, multi-field,
bool, facets, suggesters, significant terms, scoring variants,
expansion queries, rescore, top_hits, composite, collapse).

Split out of ``search_dsl.py`` (round-9, same invariants as every
catalog split: registered name set unchanged, global registration
order byte-identical — this module is imported immediately after
``search_dsl``). Shared helpers (the per-sf index cache and the BM25
oracle template) stay in ``search_dsl``.
"""

from __future__ import annotations

import os  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.plans.tuning import ensure_parallelism
from pycasselastic_spark.queries.base import QUERIES, _t, register  # noqa: F401
from pycasselastic_spark.queries.search_dsl import (
    _BM25_ORACLE_TEMPLATE,
    _postings_index_for,
)

@register(
    "min_should_match_bm25_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'scan', 'hash', 'join'").replace(
        "GROUP BY doc_id, sc.n_docs",
        "GROUP BY doc_id, sc.n_docs HAVING COUNT(*) >= 2",
    ),
    doc="ES minimum_should_match: BM25 top-10 over docs matching at "
    "least 2 of the 3 query terms "
    "(operators/search.py:bm25_topk_min_should_match) — the middle "
    "ground between the disjunctive and conjunctive (bool-must) "
    "probes, completing that ES match-control surface. Same pruned "
    "stored-postings probe; the constraint is one filter on the "
    "per-doc hit count riding the existing aggregation, no extra "
    "shuffle. Oracle adds HAVING COUNT(*) >= 2 to the scoring SQL.",
)
def min_should_match_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_min_should_match(idx, ["scan", "hash", "join"], 2, k=10)


@register(
    "search_after_bm25_documents",
    _BM25_ORACLE_TEMPLATE.format(terms="'table', 'row', 'key'").replace(
        """SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,""",
        """SELECT doc_id, n_hit_terms, score_q20 FROM (
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,""",
    ).replace(
        """ORDER BY score_q20 DESC, doc_id LIMIT 10""",
        """) WHERE 1=1 QUALIFY ROW_NUMBER()
     OVER (ORDER BY score_q20 DESC, doc_id) BETWEEN 11 AND 20
ORDER BY score_q20 DESC, doc_id""",
    ),
    doc="ES search_after cursor pagination: page TWO of the BM25 "
    "ranking for 'table row key' — the driver collects page one's "
    "last (score_q20, doc_id) as the cursor, then "
    "operators/search.py:bm25_search_after returns the next 10 "
    "STRICTLY after it in the total order (score desc, id asc; the "
    "unique tiebreak is what makes the cursor unambiguous — the "
    "reason ES requires a tiebreak sort field). Stateless deep "
    "paging: no scroll context, the same partition-pruned probe as "
    "page one with everything at-or-before the cursor filtered out. "
    "Oracle: rows ranked 11-20 of the identical total order via "
    "QUALIFY ROW_NUMBER().",
)
def search_after_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    terms = ["table", "row", "key"]
    page1 = SRCH.bm25_topk_indexed(idx, terms, k=10).collect()
    cursor = page1[-1]
    return SRCH.bm25_search_after(
        idx, terms, cursor["score_q20"], cursor["doc_id"], k=10
    )


_MF_INDEX_CACHE: dict[str, tuple] = {}

_MF_FIELD_SCORE_SQL = """
{p}tok AS (SELECT doc_id, unnest(string_split({field}, ' ')) AS term FROM f),
{p}post AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM {p}tok WHERE term <> '' GROUP BY term, doc_id),
{p}qt AS (SELECT * FROM {p}post WHERE term IN ({terms})),
{p}df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM {p}qt GROUP BY term),
{p}dl AS (SELECT doc_id, len(string_split({field}, ' ')) AS dl FROM f),
{p}sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 AVG(CAST(len(string_split({field}, ' ')) AS DOUBLE)) AS avgdl
          FROM f),
{p}score AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hits,
         CAST(FLOOR(SUM(
           ln(1.0 + ({p}sc.n_docs - {p}df.df + 0.5) / ({p}df.df + 0.5))
           * ({p}qt.tf * 2.2)
           / ({p}qt.tf + 1.2 * (0.25 + 0.75 * {p}dl.dl / {p}sc.avgdl))
         ) * 1048576.0) AS BIGINT) AS s
  FROM {p}qt JOIN {p}df USING (term) JOIN {p}dl USING (doc_id)
       CROSS JOIN {p}sc
  GROUP BY doc_id, {p}sc.n_docs)
"""


def _mf_indexes_for(spark: SparkSession, sf_dir: str):
    """The shared title/body per-field index pair (first 8 tokens vs
    the rest) used by the most_fields and best_fields multi_match
    queries — built once per sf_dir like every corpus fixture."""
    cached = _MF_INDEX_CACHE.get(sf_dir)
    if cached is None:
        docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
        toks = F.split(F.col("text"), " ")
        fields = docs.select(
            "doc_id",
            F.array_join(F.slice(toks, 1, 8), " ").alias("title"),
            F.array_join(
                F.expr(
                    "slice(split(text, ' '), 9,"
                    " greatest(size(split(text, ' ')) - 8, 0))"
                ),
                " ",
            ).alias("body"),
        )
        base = tempfile.mkdtemp(prefix="mf_idx_")
        tpath, bpath = os.path.join(base, "title"), os.path.join(base, "body")
        SRCH.build_postings_index(
            fields.select("doc_id", "title"), "doc_id", "title", tpath, 16
        )
        SRCH.build_postings_index(
            fields.select("doc_id", "body"), "doc_id", "body", bpath, 16
        )
        cached = (tpath, bpath)
        _MF_INDEX_CACHE[sf_dir] = cached
    return (
        SRCH.load_postings_index(spark, cached[0]),
        SRCH.load_postings_index(spark, cached[1]),
    )


@register(
    "multifield_bm25_documents",
    "WITH f AS (SELECT doc_id,\n"
    "  array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')"
    " AS title,\n"
    "  array_to_string(list_slice(string_split(text, ' '), 9,"
    " len(string_split(text, ' '))), ' ') AS body\n"
    "  FROM documents),\n"
    + _MF_FIELD_SCORE_SQL.format(p="t", field="title",
                                 terms="'spark', 'merge'")
    + ",\n"
    + _MF_FIELD_SCORE_SQL.format(p="b", field="body",
                                 terms="'spark', 'merge'")
    + """
SELECT COALESCE(tscore.doc_id, bscore.doc_id) AS doc_id,
       CAST(GREATEST(COALESCE(tscore.hits, 0), COALESCE(bscore.hits, 0))
            AS BIGINT) AS n_hit_terms,
       CAST(2 * COALESCE(tscore.s, 0) + COALESCE(bscore.s, 0) AS BIGINT)
         AS score_q20
FROM tscore FULL OUTER JOIN bscore ON tscore.doc_id = bscore.doc_id
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES multi_match in most_fields mode over a title field (first "
    "8 tokens, boost 2) and a body field (the rest, boost 1), each "
    "backed by its OWN stored postings index with its own df/dl/avgdl "
    "statistics — exactly how Lucene scores per-field "
    "(operators/search.py:bm25_topk_multifield). Per-field scores "
    "combine as an exact-integer boost-weighted sum of the Q20 "
    "scores (determinism preserved); docs matching in either field "
    "rank. One pruned probe per field, combined by a full outer join "
    "on query-bounded outputs — no corpus scan. Oracle replays both "
    "field derivations and the weighted combine.",
)
def multifield_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    tidx, bidx = _mf_indexes_for(spark, sf_dir)
    return SRCH.bm25_topk_multifield(
        {"title": tidx, "body": bidx}, {"title": 2, "body": 1},
        ["spark", "merge"], k=10,
    )


@register(
    "reindex_upgrade_fuzzy2_documents",
    QUERIES["fuzzy2_bm25_search_documents"].oracle,
    doc="ES zero-downtime REINDEX (settings change + alias swap) from "
    "the stored postings alone: build the index at variant_depth=1 / "
    "8 buckets, then reindex_postings_index(n_buckets=16, "
    "variant_depth=2) stages a COMPLETE new index (relations + "
    "stats.json) in a temp directory and commits it to a FRESH path "
    "with one atomic os.rename — readers can never pair old bucket "
    "moduli with new bucket values (round-9 advisor fix; the in-place "
    "settings change is now rejected by compact_postings_index). The "
    "alias then swaps atomically, exactly ES's reindex cutover. "
    "The proof: a fuzziness=2 probe through the swapped alias must "
    "rank exactly like the depth-2-from-birth oracle "
    "(fuzzy2_bm25_search_documents's raw-text SQL, reused verbatim).",
)
def reindex_upgrade_fuzzy2_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    base = tempfile.mkdtemp(prefix="reindex_idx_")
    v1, v2 = os.path.join(base, "idx_v1"), os.path.join(base, "idx_v2")
    alias = os.path.join(base, "docs.alias")
    SRCH.build_postings_index(
        docs, "doc_id", "text", v1, n_buckets=8, variant_depth=1
    )
    SRCH.set_index_alias(alias, v1)
    SRCH.reindex_postings_index(spark, v1, v2, n_buckets=16, variant_depth=2)
    SRCH.set_index_alias(alias, v2)
    idx = SRCH.load_postings_index_by_alias(spark, alias)
    return SRCH.bm25_topk_fuzzy(idx, ["spakr", "mrege"], k=10, max_dist=2)


@register(
    "bool_query_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('scan', 'join', 'hash')),
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
WHERE must_hits = 2
  AND doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'window')
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="The full ES bool query in one probe: must=['scan','join'] "
    "(every one required), should=['hash'] (adds relevance, not "
    "required), must_not=['window'] (vetoes the doc outright, never "
    "scores) — operators/search.py:bm25_bool_query. ONE pruned "
    "postings probe fetches all three clauses' terms; the must-hit "
    "count rides the scoring aggregation as a conditional count and "
    "the veto is a broadcast anti-join against the query-bounded "
    "must_not doc list. Oracle replays the same clause algebra from "
    "raw text.",
)
def bool_query_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_bool_query(
        idx, must=["scan", "join"], should=["hash"], must_not=["window"], k=10
    )


@register(
    "search_facets_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'merge'))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM hits JOIN documents USING (doc_id)
GROUP BY source
ORDER BY n_docs DESC, source LIMIT 10
""",
    doc="ES search + aggregations (a terms facet over the hit set): "
    "per-source doc counts for every document matching 'spark' OR "
    "'merge' (operators/search.py:search_facets). The hit set comes "
    "from the pruned STORED postings — no corpus scan to find "
    "matches — and only the query-bounded candidate ids "
    "broadcast-join back to the docs table for the facet column, the "
    "same candidate-bounded stored-field fetch shape as "
    "highlighting. Oracle derives the identical hit set from raw "
    "text.",
)
def search_facets_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.search_facets(idx, docs, ["spark", "merge"], "source", k=10)


@register(
    "suggest_terms_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
dict AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
         FROM postings GROUP BY term)
SELECT term,
       CAST(levenshtein(term, 'spakr') AS INT) AS dist,
       df
FROM dict
WHERE levenshtein(term, 'spakr') <= 2
ORDER BY dist ASC, df DESC, term ASC LIMIT 5
""",
    doc="ES term suggester (did-you-mean) for the typo 'spakr': "
    "dictionary terms within 2 edits ranked closer-first then "
    "more-frequent then lexicographic — ES's suggestion order "
    "(operators/search.py:suggest_terms). Candidates come from the "
    "STORED depth-2 FastSS variant probe (no full-dictionary scan), "
    "their document frequencies from the term-bucket-pruned postings "
    "probe. Oracle replays the ranking with DuckDB levenshtein over "
    "the raw-corpus dictionary.",
)
def suggest_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.suggest_terms(idx, "spakr", k=5, max_dist=2)


@register(
    "significant_terms_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
hits AS (SELECT DISTINCT doc_id FROM postings WHERE term = 'spark'),
nfg AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hits),
ndocs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
fg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS fg_df
       FROM postings JOIN hits USING (doc_id)
       WHERE term <> 'spark' GROUP BY term HAVING COUNT(*) >= 2),
bg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS bg_df
       FROM postings GROUP BY term)
SELECT term, fg_df, bg_df,
       CAST(FLOOR(
         ((fg_df / nfg.n) - (bg_df / ndocs.n))
         * ((fg_df / nfg.n) / (bg_df / ndocs.n)) * 1048576.0
       ) AS BIGINT) AS jlh_q20
FROM fg JOIN bg USING (term) CROSS JOIN nfg CROSS JOIN ndocs
ORDER BY jlh_q20 DESC, term ASC LIMIT 10
""",
    doc="ES significant_terms aggregation over the hits for 'spark': "
    "terms overrepresented in the hit set vs the corpus under ES's "
    "JLH score ((fg%% - bg%%) * (fg%% / bg%%), Q20), query term "
    "excluded, support floor fg_df >= 2 "
    "(operators/search.py:significant_terms). Index-only analytics: "
    "hit set from the pruned postings probe, foreground counts from "
    "the FORWARD relation joined to the broadcast hit list, "
    "background counts one aggregation over stored postings (the "
    "global-ordinals pass ES pays too) — raw text never read. "
    "Oracle replays the clause algebra and the exact double "
    "arithmetic from raw text.",
)
def significant_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.significant_terms(idx, ["spark"], m=10, min_fg_df=2)


@register(
    "function_score_bm25_documents",
    """
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
       FROM documents)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM(
         ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (qt.tf * 2.2)
         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
       ) * ln(1.0 + d.n_chars) * 1048576.0) AS BIGINT) AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
     JOIN documents d USING (doc_id)
GROUP BY doc_id, sc.n_docs, d.n_chars
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES function_score with field_value_factor(modifier=ln1p) on "
    "n_chars: final score = BM25 * ln(1 + n_chars) (ES's ln1p — its log1p is base 10; the full modifier set dispatches since round 13) — the relevance × "
    "document-signal reranking (recency/popularity/length priors) "
    "every production search deploys "
    "(operators/search.py:bm25_function_score). The probe scores "
    "candidates RAW from stored postings, only the query-bounded "
    "candidates broadcast-join back to the docs table for the factor "
    "column, and a single Q20 floor lands after the multiply so the "
    "oracle replays the exact arithmetic. No corpus scan.",
)
def function_score_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.bm25_function_score(
        idx, docs, ["spark", "merge"], "n_chars", k=10
    )


@register(
    "boosted_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
qt AS (SELECT * FROM postings WHERE term IN ('scan', 'hash')),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(FLOOR(SUM(
         (CASE qt.term WHEN 'scan' THEN 3.0 ELSE 1.0 END
          * ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)))
         * (qt.tf * 2.2)
         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
       ) * 1048576.0) AS BIGINT) AS score_q20
FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
GROUP BY doc_id, sc.n_docs
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES query-time per-term boosts (match with boost): 'scan'^3 "
    "vs 'hash'^1 (operators/search.py:bm25_topk_boosted) — each "
    "term's BM25 contribution scales by its boost BEFORE the per-doc "
    "sum, re-ranking toward boosted-term-heavy docs. The boosts ride "
    "the broadcast |query|-row df join as one more column; single "
    "Q20 floor after the weighted sum; no extra shuffle. Oracle "
    "replays the weighting with a CASE in the identical operation "
    "order.",
)
def boosted_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_boosted(idx, {"scan": 3.0, "hash": 1.0}, k=10)


@register(
    "prefix_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM postings WHERE term LIKE 's%'
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM exp)),
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
    doc="ES prefix query + relevance for 's*' "
    "(operators/search.py:bm25_topk_prefix): the prefix expands to "
    "matching dictionary terms capped at 50 by (df desc, term) — "
    "ES's rewrite cap — then BM25 over the expansion with per-term "
    "df. The expansion honestly cannot use the md5 term-bucket "
    "pruning (a prefix scatters across buckets), so it scans the "
    "stored postings DICTIONARY with the startswith predicate pushed "
    "to parquet — postings-sized, never raw text — and the scoring "
    "probe afterwards is the normal pruned shape. Oracle replays the "
    "capped expansion and scoring.",
)
def prefix_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_prefix(idx, "s", k=10, max_expansions=50)


@register(
    "wildcard_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM postings WHERE term LIKE '_a__'
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM exp)),
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
    doc="ES wildcard query '?a??' + relevance "
    "(operators/search.py:bm25_topk_wildcard): the pattern translates "
    "to LIKE (* -> %, ? -> _, LIKE metachars escaped) and expands to "
    "matching dictionary terms capped at 50 by (df desc, term) — the "
    "scoring_boolean rewrite — then BM25 over the expansion. The "
    "leading wildcard is ES's worst case too: no prefix to seek on, "
    "so the expansion scans the stored postings DICTIONARY "
    "(postings-sized, never raw text); the scoring probe afterwards "
    "is the normal pruned shape. Oracle replays expansion + scoring.",
)
def wildcard_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_wildcard(idx, "?a??", k=10, max_expansions=50)


@register(
    "match_phrase_prefix_documents",
    """
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i+1] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(len(toks))) AS i) t
  WHERE toks[i+1] <> ''
),
exp AS (SELECT term FROM (
  SELECT DISTINCT term FROM tok WHERE term LIKE 's%'
  ORDER BY term LIMIT 50)),
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term IN (SELECT term FROM exp))
SELECT a.doc_id,
       CAST(COUNT(DISTINCT a.pos) AS BIGINT) AS n_hits
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.doc_id
""",
    doc="ES match_phrase_prefix 'fast s*' — search-as-you-type "
    "(operators/search.py:match_phrase_prefix): the phrase's LAST "
    "position matches any dictionary term starting with 's', "
    "expansion capped at 50 in term-dictionary (lexicographic) order "
    "exactly like ES. Fixed terms probe pruned postings partitions; "
    "the expansion scans the stored dictionary once; the chain join "
    "shape is phrase_slop_search's with the final step's positions "
    "unioned over the expansion. Oracle rebuilds positions from raw "
    "text and replays the capped expansion + adjacency join.",
)
def match_phrase_prefix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.match_phrase_prefix(idx, ["fast"], "s", max_expansions=50)


@register(
    "rescore_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
       FROM documents),
bq AS (SELECT * FROM postings WHERE term IN ('spark', 'merge')),
bdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM bq GROUP BY term),
base AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         SUM(
           ln(1.0 + (sc.n_docs - bdf.df + 0.5) / (bdf.df + 0.5))
           * (bq.tf * 2.2)
           / (bq.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         ) AS score_raw
  FROM bq JOIN bdf USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id, sc.n_docs
),
win AS (
  SELECT *, CAST(FLOOR(score_raw * 1048576.0) AS BIGINT) AS base_q20
  FROM base
  QUALIFY ROW_NUMBER() OVER (ORDER BY base_q20 DESC, doc_id ASC) <= 20
),
rq AS (SELECT * FROM postings WHERE term IN ('window')),
rdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM rq GROUP BY term),
sec AS (
  SELECT doc_id,
         SUM(
           ln(1.0 + (sc.n_docs - rdf.df + 0.5) / (rdf.df + 0.5))
           * (rq.tf * 2.2)
           / (rq.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         ) AS rescore_raw
  FROM rq JOIN rdf USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id, sc.n_docs
)
SELECT win.doc_id,
       win.n_hit_terms,
       CAST(FLOOR(
         (win.score_raw * 1.0 + COALESCE(sec.rescore_raw, 0.0) * 2.0)
         * 1048576.0
       ) AS BIGINT) AS score_q20
FROM win LEFT JOIN sec ON win.doc_id = sec.doc_id
ORDER BY score_q20 DESC, win.doc_id ASC LIMIT 10
""",
    doc="ES rescore: the cheap base query ('spark merge') selects a "
    "top-20 window in the quantized (score_q20, id) cursor order, "
    "then only that window is reranked by query_weight*base + "
    "rescore_weight*secondary ('window', weight 2) with ONE Q20 floor "
    "after the weighted combine "
    "(operators/search.py:bm25_rescore). The window is <= window_size "
    "rows and broadcasts to the secondary probe's query-bounded "
    "output — docs outside the window can never enter the result, no "
    "corpus-side shuffle. Oracle replays window membership via "
    "QUALIFY and the combine in identical operation order.",
)
def rescore_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_rescore(
        idx, ["spark", "merge"], ["window"],
        window_size=20, query_weight=1.0, rescore_weight=2.0, k=10,
    )


@register(
    "top_hits_by_facet_documents",
    """
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
)
SELECT d.source AS facet,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY d.source ORDER BY s.score_q20 DESC, s.doc_id ASC
       ) AS BIGINT) AS rank,
       s.doc_id,
       s.score_q20
FROM scored s JOIN documents d USING (doc_id)
QUALIFY rank <= 2
""",
    doc="ES terms aggregation with a top_hits sub-aggregation: for "
    "every source in the hit set of 'spark merge', the 2 best docs "
    "by BM25 (operators/search.py:top_hits_by_facet). The "
    "query-bounded scored candidates broadcast-join to the docs "
    "table for the facet column — the stored-field fetch shape — "
    "then ONE window partitioned by facet over the candidate set; "
    "the corpus is never shuffled. Oracle replays scoring + the "
    "QUALIFY window.",
)
def top_hits_by_facet_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.top_hits_by_facet(
        idx, docs, ["spark", "merge"], "source", hits_per_bucket=2
    )


@register(
    "composite_facets_after_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'dup')
SELECT d.source AS facet,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM hits JOIN documents d USING (doc_id)
WHERE d.source > 'src1'
GROUP BY d.source
ORDER BY facet ASC LIMIT 5
""",
    doc="ES composite aggregation over the hit set of rare term "
    "'dup': facet buckets in facet-key total order with after-key "
    "cursor pagination (after='src1', size=5) — the aggregation twin "
    "of search_after "
    "(operators/search.py:search_facets_after). Because the bucket "
    "order IS the group key, each page filters to buckets after the "
    "cursor BEFORE aggregating, so every page is the same bounded "
    "probe — exactly why ES offers composite for deep bucket "
    "pagination where ranked facets would need the full bucket "
    "table. Oracle replays hit set, cursor filter, and key order.",
)
def composite_facets_after_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.search_facets_after(
        idx, docs, ["dup"], "source", size=5, after="src1"
    )


@register(
    "regexp_bm25_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY term, doc_id
),
exp AS (SELECT term FROM (
  SELECT term, COUNT(*) AS df FROM postings
  WHERE regexp_full_match(term, 's.*a.*')
  GROUP BY term ORDER BY df DESC, term LIMIT 50)),
qt AS (SELECT * FROM postings WHERE term IN (SELECT term FROM exp)),
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
    doc="ES regexp query 's.*a.*' + relevance "
    "(operators/search.py:bm25_topk_regexp): like ES/Lucene the "
    "pattern matches the WHOLE term (Spark's unanchored rlike is "
    "wrapped in ^(?:...)$ for parity with DuckDB's anchored "
    "regexp_full_match), expansion capped at 50 by (df desc, term), "
    "then BM25 over the expansion. Completes the term-level query "
    "family: term/terms, prefix, wildcard, regexp, fuzzy. Like ES — "
    "whose regexp automaton walks the whole term dictionary — the "
    "expansion is a full dictionary scan, postings-sized, never raw "
    "text.",
)
def regexp_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return SRCH.bm25_topk_regexp(idx, "s.*a.*", k=10, max_expansions=50)


# gauss decay constants for decay_bm25_documents, computed once so the
# EXACT same double literal lands in the Spark plan and the oracle SQL
# (repr() round-trips doubles; sigma^2 = -scale^2 / (2 ln decay))
_DECAY_ORIGIN = 400.0
_DECAY_SCALE = 200.0
_DECAY_DENOM = 2.0 * (-(_DECAY_SCALE ** 2) / (2.0 * __import__("math").log(0.5)))


@register(
    "decay_bm25_documents",
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
raw AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         SUM(
           ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (qt.tf * 2.2)
           / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / sc.avgdl))
         ) AS score_raw
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id, sc.n_docs
),
dist AS (
  SELECT doc_id,
         GREATEST(0.0, ABS(CAST(n_chars AS DOUBLE) - {_DECAY_ORIGIN!r}) - 0.0)
           AS d
  FROM documents
)
SELECT raw.doc_id,
       raw.n_hit_terms,
       CAST(FLOOR(
         raw.score_raw * EXP(-(dist.d * dist.d) / {_DECAY_DENOM!r}) * 1048576.0
       ) AS BIGINT) AS score_q20
FROM raw JOIN dist ON raw.doc_id = dist.doc_id
ORDER BY score_q20 DESC, raw.doc_id ASC LIMIT 10
""",
    doc="ES function_score gauss decay on n_chars (origin=400, "
    "scale=200, decay=0.5): final score = BM25 * "
    "exp(-max(0,|x-origin|)^2 / (2 sigma^2)) — the recency/distance "
    "boost shape (operators/search.py:bm25_decay_score). sigma^2 is "
    "computed driver-side and inlined as the SAME double literal in "
    "the Spark plan and the oracle (repr round-trip), ONE Q20 floor "
    "after the multiply; candidates broadcast back to the docs table "
    "for the decay field, never a corpus scan.",
)
def decay_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.bm25_decay_score(
        idx, docs, ["spark", "merge"], "n_chars",
        origin=_DECAY_ORIGIN, scale=_DECAY_SCALE, decay=0.5, k=10,
    )


@register(
    "collapse_bm25_documents",
    """
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
)
SELECT doc_id, collapsed, score_q20 FROM (
  SELECT s.doc_id, d.source AS collapsed, s.score_q20,
         ROW_NUMBER() OVER (
           PARTITION BY d.source ORDER BY s.score_q20 DESC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN documents d USING (doc_id)
) WHERE rn = 1
ORDER BY score_q20 DESC, doc_id ASC LIMIT 10
""",
    doc="ES field collapse on source: the ranked list keeps only each "
    "source's single best hit — dedup-by-field IN the ranking, e.g. "
    "one result per domain (operators/search.py:bm25_collapse). "
    "Query-bounded scored candidates broadcast-join the docs table "
    "for the collapse field, ONE window partitioned by it picks each "
    "group's best, then the global top-k is a TakeOrderedAndProject "
    "over <= distinct-field-value rows. Oracle replays scoring + the "
    "collapse window.",
)
def collapse_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return SRCH.bm25_collapse(idx, docs, ["spark", "merge"], "source", k=10)
