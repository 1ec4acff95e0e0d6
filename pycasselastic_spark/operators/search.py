"""Full-text search primitives: inverted index, BM25 ranking, TF-IDF
term weighting, exact phrase matching.

The reference's whole purpose is keeping Elasticsearch in sync so ES
can SEARCH the data (SURVEY.md §1; reference ``pyCassElastic.py:316-354``
writes documents into ES indices for exactly this). These operators
re-express the search side natively: the inverted index is a plain
aggregation over exploded tokens, and BM25 — ES/Lucene's default
ranking function — is a two-join scalar pipeline over it.

Scale shape (100 TB corpus):

- ``term_postings`` is explode + one hash aggregation on (term, doc) —
  the same single-shuffle pattern as every dedup signature here. At
  corpus scale the postings table is bounded by total token count, and
  partial aggregation collapses per-partition repeats map-side.
- ``bm25_topk`` filters postings to the QUERY'S terms before anything
  else (a handful of terms → the filter prunes the postings scan), the
  per-term document frequencies arrive as a broadcast join (query terms
  are few by construction), and the global doc-count/avgdl scalars ride
  a broadcast one-row join. Top-k executes as TakeOrderedAndProject —
  per-partition heaps, no global sort.
- Scores are quantized to Q20 fixed point (``floor(score * 2^20)``,
  power-of-two scaling is exact on IEEE doubles) so ranking and
  equality are deterministic cross-engine and the DuckDB oracle can
  replay them; ``ln`` differs by at most 1 ulp between engines, far
  inside the quantization step except on exact boundary hits (none in
  the test corpus — pinned by the oracle gate).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import (  # noqa: E402,F401
    Q20,
    _tokens,
)



def term_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(term, id_col, tf)`` — the posting-list table.

    One explode + one hash aggregation; partial aggregation combines
    repeated (term, doc) pairs map-side before the shuffle.
    """
    return (
        docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def inverted_index_stats(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-term index statistics: ``(term, df, total_tf, max_tf)``.

    The dictionary/posting-summary a search engine keeps per term; df
    drives idf, max_tf bounds per-doc impact (Lucene's skip data
    analog). Second aggregation runs over the already-collapsed
    postings table, not the raw tokens.
    """
    return (
        term_postings(docs, id_col, text_col)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.max("tf").alias("max_tf"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under BM25 (the
    ES/Lucene default similarity), scored as::

        sum over q in query:  idf(q) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(q) = ln(1 + (N - df + 0.5)/(df + 0.5))

    Returns ``(id_col, n_hit_terms, score_q20)`` with the score in Q20
    fixed point (see module docstring). Postings are filtered to the
    query's terms FIRST; the df side is a broadcast (|query| rows); N
    and avgdl arrive via a broadcast one-row scalar join.
    """
    postings = term_postings(docs, id_col, text_col).filter(
        F.col("term").isin(query_terms)
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = docs.select(
        F.col(id_col), F.size(_tokens(text_col)).alias("dl")
    )
    scalars = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl"),
    )

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.floor(F.sum("term_score") * Q20).cast("long").alias("score_q20"),
        )
    )
    return scored.orderBy(
        F.col("score_q20").desc(), F.col(id_col).asc()
    ).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms:
    ``(id_col, term, tf, tfidf_q20)``, tie-broken by term.

    tfidf = tf * ln(N / df), Q20-quantized. The df table is built from
    the same postings aggregation and joined back BROADCAST — at corpus
    scale the term dictionary is tiny relative to the postings (Heaps'
    law), and the per-doc top-k is a window over the doc's own terms
    (partitioned by doc — no global sort).
    """
    from pyspark.sql.window import Window

    postings = term_postings(docs, id_col, text_col)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_q20",
            F.floor(
                F.col("tf")
                * F.log(F.col("n_docs") / F.col("df"))
                * Q20
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_q20").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "tfidf_q20")
    )


def phrase_count(text_col: Column | str, phrase: str) -> Column:
    """Number of (non-overlapping) occurrences of the exact ``phrase``,
    counted with pure string ops — ``(len(t) - len(replace(t, p, '')))
    / len(p)`` — so any engine computes the identical integer. The
    match-phrase primitive, minus positions."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(phrase), F.lit(""))))
        / F.lit(len(phrase))
    ).cast("long")


def phrase_search(
    docs: DataFrame, id_col: str, text_col: str, phrase: str
) -> DataFrame:
    """Documents containing ``phrase`` with their occurrence counts:
    ``(id_col, n_hits)``. The contains-filter is a narrow scan predicate
    (pushable where the source supports it); no shuffle at all."""
    return docs.select(
        F.col(id_col),
        phrase_count(text_col, phrase).alias("n_hits"),
    ).filter(F.col("n_hits") > 0)


# ---------------------------------------------------------------------------
# Facade re-exports (round-10 module split). The stored-index lifecycle,
# the probe family, and the DSL extensions live in sibling modules;
# every name stays importable from here — `operators.search` remains the
# single public entry point for the search surface.
# ---------------------------------------------------------------------------

from pycasselastic_spark.operators.search_index import (  # noqa: E402,F401
    Analyzer,
    PostingsIndex,
    analyze_terms_py,
    analyze_tokens,
    analyzed_dl,
    _claim_generation,
    _deletion_variants_expr,
    _deletion_variants_py,
    _positional_postings,
    _term_bucket_col,
    _term_bucket_py,
    _write_index_relations,
    _write_stats,
    buckets_for,
    build_postings_index,
    dv_col,
    load_postings_index,
    load_postings_index_by_alias,
    resolve_index_alias,
    set_index_alias,
    update_postings_index,
)
from pycasselastic_spark.operators.search_lifecycle import (  # noqa: E402,F401
    CompactionPolicy,
    _max_files_per_bucket,
    compact_postings_index,
    delete_by_query,
    delete_ids_from_index,
    index_health,
    ingest_into_postings_index,
    reindex_postings_index,
    snapshot_postings_index,
    start_streaming_index_maintenance,
    update_by_query,
)
from pycasselastic_spark.operators.search_probes import (  # noqa: E402,F401
    _bm25_scored,
    _bm25_scored_raw,
    _wildcard_to_like,
    bm25_bool_query,
    bm25_msearch,
    bm25_rescore,
    bm25_search_after,
    bm25_topk_boosted,
    bm25_topk_conjunctive,
    bm25_topk_fuzzy,
    bm25_topk_indexed,
    bm25_topk_min_should_match,
    bm25_topk_multifield,
    bm25_topk_prefix,
    bm25_topk_regexp,
    bm25_topk_wildcard,
    conjunctive_filter,
    doc_top_terms,
    expand_fuzzy_terms,
    explain_score,
    match_phrase_prefix,
    more_like_this,
    phrase_slop_search,
    term_vectors,
)
from pycasselastic_spark.operators.search_ext import (  # noqa: E402,F401
    bm25_collapse,
    bm25_decay_score,
    bm25_function_score,
    es_analyze,
    highlight_snippets,
    hybrid_rrf_search,
    percolate,
    search_facets,
    search_facets_after,
    significant_terms,
    significant_text,
    suggest_completion,
    suggest_phrase,
    suggest_terms,
    top_hits_by_facet,
)
from pycasselastic_spark.operators.search_api import (  # noqa: E402,F401
    es_count,
    es_mget,
    es_search,
)
from pycasselastic_spark.operators.search_qs import (  # noqa: E402,F401
    query_string_search,
)
from pycasselastic_spark.operators.search_ext import (  # noqa: E402,F401
    bm25_topk_filtered,
)
from pycasselastic_spark.operators.search_ext import (  # noqa: E402,F401
    search_histogram_agg,
    search_stats_agg,
)
from pycasselastic_spark.operators.search_ext import (  # noqa: E402,F401
    search_sort_by_field,
)
from pycasselastic_spark.operators.search_ext import (  # noqa: E402,F401
    search_dv_range,
    search_dv_terms,
    search_exists,
    search_ids,
    search_nested,
    terms_set_search,
)
from pycasselastic_spark.operators.search_compose import (  # noqa: E402,F401
    boosting_search,
    constant_score_search,
    dis_max_search,
    multi_match_best_fields,
    search_cardinality_agg,
    search_date_histogram_agg,
    search_percentiles_agg,
    search_range_agg,
)
from pycasselastic_spark.operators.search_rollover import (  # noqa: E402,F401
    RolloverPolicy,
    ingest_with_rollover,
    load_family,
    rollover_bm25_topk,
    write_index_path,
)
from pycasselastic_spark.operators.search_api import (  # noqa: E402,F401
    es_search_template,
)
from pycasselastic_spark.operators.search_join import (  # noqa: E402,F401
    has_child_search,
    has_parent_search,
)
from pycasselastic_spark.operators.search_ext import (  # noqa: E402,F401
    matrix_stats_2d,
    search_matrix_stats_agg,
    search_string_stats_agg,
)
from pycasselastic_spark.operators.search_api import (  # noqa: E402,F401
    es_msearch_template,
)
