"""Round-14 queries: the query_string grammar completed (field
scoping, boosts, ranges), ``moving_fn``/``moving_avg`` pipeline
smoothing, the remaining span combinators, and ``significant_text``.

All dispatch end-to-end through the ``es_search`` request-body API;
every oracle replays the exact integer-score law from raw parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_api import es_search
from pycasselastic_spark.queries.base import register
from pycasselastic_spark.queries.search_dsl import _postings_index_for
from pycasselastic_spark.queries.search_r12b import (
    _BM25_TERM_SCORE,
    _TOK_POSTINGS,
)
from pycasselastic_spark.queries.search_r13 import (
    _TOKPOS_SQL,
    _TS0,
    _TS_STEP,
    _ts_index_for,
)
from pycasselastic_spark.queries.search_r13b import (
    _HITS_MERGE,
    _cf_indexes_for,
)


@register(
    "query_string_fielded_documents",
    f"""
WITH {_TOK_POSTINGS},
-- default-field leaf: 'spark' on the legacy whitespace index
qt AS (SELECT * FROM postings WHERE term = 'spark'),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY term),
mainleaf AS (SELECT qt.doc_id,
  CAST(FLOOR(({_BM25_TERM_SCORE}) * 1048576.0) AS BIGINT) AS s
  FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc),
-- title field leaf: 'merge' on the ANALYZED title index (first 8
-- whitespace tokens; kept-token dl law), boosted x2
f AS (SELECT doc_id,
  array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS title
  FROM documents),
tdl AS (SELECT doc_id,
  CAST(len(list_filter(string_split(title, ' '), x -> x <> ''))
    AS BIGINT) AS dl FROM f),
tsc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
  AVG(CAST(len(list_filter(string_split(title, ' '), x -> x <> ''))
    AS DOUBLE)) AS avgdl FROM f),
tpost AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(title, ' ')) AS term FROM f)
  WHERE term <> '' GROUP BY doc_id, term),
tqt AS (SELECT * FROM tpost WHERE term = 'merge'),
tdf AS (SELECT CAST(COUNT(*) AS BIGINT) AS df FROM tqt),
titleleaf AS (SELECT tqt.doc_id,
  2 * CAST(FLOOR(
    ln(1.0 + (tsc.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
    * (tqt.tf * 2.2)
    / (tqt.tf + 1.2 * (0.25 + 0.75 * tdl.dl / tsc.avgdl))
    * 1048576.0) AS BIGINT) AS s
  FROM tqt JOIN tdl USING (doc_id) CROSS JOIN tsc CROSS JOIN tdf),
pos AS (SELECT COALESCE(t.doc_id, m.doc_id) AS doc_id,
        CAST(COALESCE(t.s, 0) + COALESCE(m.s, 0) AS BIGINT) AS s
  FROM titleleaf t FULL OUTER JOIN mainleaf m ON t.doc_id = m.doc_id),
rng AS (SELECT doc_id FROM documents
        WHERE n_chars >= 150 AND n_chars <= 350)
SELECT pos.doc_id, CAST(pos.s + 1048576 AS BIGINT) AS score_q20
FROM pos JOIN rng USING (doc_id)
ORDER BY score_q20 DESC, doc_id LIMIT 10
""",
    doc="ES ``query_string`` with the grammar COMPLETED — "
    "'(title:merge^2 OR spark) AND n_chars:[150 TO 350]': "
    "``field:`` scoping resolves against the per-field index "
    "registry multi_match uses (title = the analyzed 8-token field "
    "index), ``^2`` multiplies the leaf's exact Q20 score (INTEGER "
    "boosts only — fractional raise by name, the combined_fields "
    "law), and the range leaf is a constant-score (1.0 = one Q20) "
    "doc-values scan with both bounds pushed into the columnar "
    "scan, Lucene's constant-score multi-term rewrite. The three "
    "leaf relations combine through the same hit-relation algebra "
    "as every other query_string composition: OR full-outer "
    "coalesce-sum, AND inner-join sum. Field scoping was the "
    "single most-typed Kibana grammar the round-13 dispatcher "
    "refused (VERDICT r13 gap #2). operators/search_qs.py:"
    "_lex/_compile/_compile_range. Plan: two query-bounded pruned "
    "probes + one pushed-predicate doc-values scan, two bounded "
    "joins, TakeOrderedAndProject.",
)
def query_string_fielded_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    tidx, bidx = _cf_indexes_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"query_string": {
            "query": "(title:merge^2 OR spark) AND n_chars:[150 TO 350]",
        }},
        "size": 10,
    }, field_indexes={"title": tidx, "body": bidx})


@register(
    "moving_fn_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
c AS (SELECT CAST(FLOOR(ts / 43200) * 43200 AS BIGINT) AS bucket_s,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id) GROUP BY 1)
SELECT bucket_s, n_docs,
       CAST(FLOOR(AVG(n_docs) OVER (ORDER BY bucket_s
         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) * 1048576.0)
         AS BIGINT) AS mov_avg_q20,
       CAST(COALESCE(SUM(n_docs) OVER (ORDER BY bucket_s
         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS mov_sum
FROM c ORDER BY bucket_s
""",
    doc="ES ``moving_fn`` — the sliding-window smoother on every "
    "dashboard (the round-13 verdict's #4 gap): window=3, shift=0 "
    "covers the PREVIOUS three buckets excluding the current one, "
    "script MovingFunctions.unweightedAvg(values) (Q20-floored avg) "
    "riding beside MovingFunctions.sum(values) (exact long; empty "
    "window -> 0.0, Lucene's MovingFunctions.sum law, while "
    "avg/min/max go NULL). One rowsBetween(-3, -1) frame per "
    "function over the RESPONSE-sized bucket relation (ES caps it "
    "at search.max_buckets) — the corpus-sized reduction happened "
    "in the date_histogram. operators/search_compose.py:"
    "apply_bucket_pipelines; dispatched from "
    "aggs.<name>.aggs.<p>.moving_fn (the legacy moving_avg 'simple' "
    "model dispatches onto the same frame anchored to include the "
    "current bucket; ewma/holt raise by name — state fits, not "
    "exact reductions).",
)
def moving_fn_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"halfdays": {
            "date_histogram": {
                "field": "ingest_ts", "fixed_interval": "12h",
            },
            "aggs": {
                "mov_avg_q20": {"moving_fn": {
                    "buckets_path": "_count", "window": 3,
                    "script": "MovingFunctions.unweightedAvg(values)",
                }},
                "mov_sum": {"moving_fn": {
                    "buckets_path": "_count", "window": 3,
                    "script": "MovingFunctions.sum(values)",
                }},
            },
        }},
    })
    return out.select(
        F.col("bucket").cast("long").alias("bucket_s"),
        "n_docs", "mov_avg_q20", "mov_sum",
    ).orderBy("bucket_s")


@register(
    "span_or_documents",
    "WITH "
    + _TOKPOS_SQL
    + """,
sel AS (SELECT DISTINCT doc_id, pos FROM tok
        WHERE term IN ('fast', 'slow'))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM sel GROUP BY doc_id ORDER BY doc_id
""",
    doc="ES ``span_or``: the UNION of its clauses' spans (Lucene "
    "SpanOrQuery) — 'fast' or 'slow' occurrence positions per doc, "
    "identical spans from duplicate clauses collapsing exactly like "
    "Lucene's ordered-spans dedup. Completes the span family next "
    "to span_near/span_first (round-13 verdict gap #4). n_spans = "
    "distinct union spans. operators/search_ext.py:span_or_search, "
    "dispatched from query.span_or with span_term clauses. Plan: "
    "ONE pruned postings probe covering every clause term (the "
    "union is one IN filter pushed to the scan), explode stored "
    "positions, distinct, one reduction — query-bounded, no raw "
    "text. Oracle replays positions from raw text.",
)
def span_or_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"span_or": {"clauses": [
            {"span_term": {"text": "fast"}},
            {"span_term": {"text": "slow"}},
        ]}},
    })
    return out.orderBy("doc_id")


@register(
    "span_not_documents",
    "WITH "
    + _TOKPOS_SQL
    + """,
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'merge'),
inc AS (SELECT DISTINCT a.doc_id, a.pos AS ps, b.pos AS pe
        FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos > a.pos
             AND b.pos - a.pos <= 3),
exc AS (SELECT doc_id, pos - 1 AS xs, pos + 1 AS xe FROM tok
        WHERE term = 'slow'),
sur AS (SELECT inc.doc_id, inc.ps, inc.pe FROM inc
        WHERE NOT EXISTS (
          SELECT 1 FROM exc
          WHERE exc.doc_id = inc.doc_id
            AND inc.ps <= exc.xe AND inc.pe >= exc.xs))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM sur GROUP BY doc_id ORDER BY doc_id
""",
    doc="ES ``span_not``: include spans that do NOT overlap any "
    "exclude span (Lucene SpanNotQuery) — here 'fast then merge "
    "within total stretch slop=2' (the span_near include, spans "
    "[p_start, p_end]) EXCLUDING matches within dist=1 of a 'slow' "
    "occurrence (dist widens the exclusion window both ways; "
    "pre/post are the one-sided dials, and dist beside pre/post "
    "raises — ES rejects both). n_spans = surviving include spans. "
    "operators/search_ext.py:span_not_search, dispatched from "
    "query.span_not. Plan: two query-bounded span relations; the "
    "exclusion is ONE left-anti join on (doc, interval overlap) — "
    "the exclude side is a pruned probe of the exclude terms only, "
    "never the corpus. Oracle replays positions from raw text.",
)
def span_not_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"span_not": {
            "include": {"span_near": {"clauses": [
                {"span_term": {"text": "fast"}},
                {"span_term": {"text": "merge"}},
            ], "slop": 2}},
            "exclude": {"span_term": {"text": "slow"}},
            "dist": 1,
        }},
    })
    return out.orderBy("doc_id")


@register(
    "significant_text_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
postings AS (
  SELECT term, doc_id FROM tok WHERE term <> '' GROUP BY term, doc_id
),
hits AS (SELECT DISTINCT doc_id FROM postings WHERE term = 'merge'),
nfg AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hits),
nall AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
fg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS fg_df
       FROM postings JOIN hits USING (doc_id)
       WHERE term <> 'merge' GROUP BY term HAVING COUNT(*) >= 2),
bg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS bg_df
       FROM postings GROUP BY term),
cells AS (SELECT term, fg_df, bg_df,
         CAST(fg_df AS DOUBLE) AS a,
         nfg.n - CAST(fg_df AS DOUBLE) AS b,
         CAST(bg_df - fg_df AS DOUBLE) AS c,
         (nall.n - nfg.n) - CAST(bg_df - fg_df AS DOUBLE) AS d
       FROM fg JOIN bg USING (term) CROSS JOIN nfg CROSS JOIN nall
       WHERE CAST(fg_df AS DOUBLE) * (nall.n - nfg.n)
             > CAST(bg_df - fg_df AS DOUBLE) * nfg.n)
SELECT term, fg_df, bg_df,
       CAST(FLOOR(
         (a * d - b * c) * (a * d - b * c) * (a + b + c + d)
         / ((a + b) * (c + d) * (b + d) * (a + c)) * 1048576.0
       ) AS BIGINT) AS score_q20
FROM cells
ORDER BY score_q20 DESC, term ASC LIMIT 10
""",
    doc="ES ``significant_text`` aggregation with the CHI-SQUARE "
    "significance heuristic (include_negatives=false, "
    "background_is_superset=true — the out-set 2x2 contingency "
    "(ad-bc)^2(a+b+c+d)/((a+b)(c+d)(b+d)(a+c)), squared via "
    "multiplication because pow()'s libm rounding is not pinned "
    "cross-engine): the 'what's unusual in this slice' exploration "
    "agg over the hits for 'merge' (round-13 verdict gap #5). ES "
    "re-analyzes hit text on the fly because text fields lack "
    "fielddata; here the analyzed tokens are STORED (forward "
    "relation), so the same statistics come index-only — terms less "
    "frequent in the slice than outside drop before scoring. "
    "operators/search_ext.py:significant_text (heuristics jlh / "
    "chi_square / percentage dispatched by name; gnd and "
    "mutual_information raise). Plan: pruned probe -> broadcast hit "
    "join on the forward relation, one background aggregation over "
    "stored postings — the global-ordinals pass ES pays too.",
)
def significant_text_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.search_ext import significant_text

    idx = _postings_index_for(spark, sf_dir)
    return significant_text(
        idx, ["merge"], m=10, min_fg_df=2, heuristic="chi_square"
    )


# --- geo queries over synthesized event coordinates --------------------------
# The corpus carries no lat/lon (checked every parquet schema — the
# round-13 verdict's gap #6 names this), so coordinates derive
# DETERMINISTICALLY from event_id with identical integer arithmetic
# in both engines: lat = ((id*7919) % 18001)/100 - 90 in [-90, 90],
# lon = ((id*104729) % 36001)/100 - 180 in [-180, 180] — exact-double
# two-decimal grid points, no RNG, replayable at any sf.

_GEO_SQL = """g AS (SELECT event_id,
  CAST((event_id * 7919) % 18001 AS DOUBLE) / 100.0 - 90.0 AS lat,
  CAST((event_id * 104729) % 36001 AS DOUBLE) / 100.0 - 180.0 AS lon
  FROM events)"""


def _geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.queries.base import _t

    ev = _t(spark, sf_dir, "events").select("event_id")
    lat = ((F.col("event_id") * 7919) % 18001).cast("double") / 100.0 - 90.0
    lon = (
        ((F.col("event_id") * 104729) % 36001).cast("double") / 100.0 - 180.0
    )
    return ev.select("event_id", lat.alias("lat"), lon.alias("lon"))


@register(
    "geo_bounding_box_events",
    "WITH "
    + _GEO_SQL
    + """
SELECT event_id, lat, lon FROM g
WHERE lat >= 10.0 AND lat <= 20.0 AND (lon >= 170.0 OR lon <= -170.0)
ORDER BY event_id
""",
    doc="ES ``geo_bounding_box`` — the map-viewport filter "
    "(operators/geo.py:geo_bounding_box): points inside the box "
    "lat [10, 20] x lon [170, -170], which CROSSES the antimeridian "
    "— left > right becomes one OR of two pushed longitude ranges, "
    "exactly ES's dateline split; bounds inclusive; NULL points "
    "never match. Pure comparisons: all four bounds reach the "
    "columnar scan, so at 100 TB the row-group min/max stats prune "
    "everything outside the viewport. Coordinates synthesized "
    "deterministically from event_id (identical integer arithmetic "
    "in the oracle; the corpus stores no geo fields).",
)
def geo_bounding_box_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.geo import geo_bounding_box

    g = _geo_events(spark, sf_dir)
    return geo_bounding_box(
        g, "lat", "lon", top=20.0, left=170.0, bottom=10.0, right=-170.0
    ).orderBy("event_id")


@register(
    "geo_distance_events",
    "WITH "
    + _GEO_SQL
    + """,
d AS (SELECT event_id,
  CAST(FLOOR(12742000.0 * asin(sqrt(
    sin((0.0 - lat) * 0.017453292519943295 / 2.0)
      * sin((0.0 - lat) * 0.017453292519943295 / 2.0)
    + cos(lat * 0.017453292519943295) * cos(0.0 * 0.017453292519943295)
      * sin((0.0 - lon) * 0.017453292519943295 / 2.0)
      * sin((0.0 - lon) * 0.017453292519943295 / 2.0)
  )) * 1048576.0) AS BIGINT) AS dist_q20
  FROM g)
SELECT event_id, dist_q20 FROM d
WHERE dist_q20 <= CAST(FLOOR(2500000.0 * 1048576.0) AS BIGINT)
ORDER BY dist_q20, event_id LIMIT 20
""",
    doc="ES ``geo_distance`` with the ``_geo_distance`` sort — the "
    "nearest-k page every store-locator issues (operators/geo.py:"
    "geo_distance): the 20 events nearest (0, 0) within 2 500 km, "
    "haversine at the fixed 6 371 000 m radius (documented API "
    "constant; ES's GeoUtils mean is 6 371 008.77). Determinism: "
    "ONE identical expression tree in both engines — squares via "
    "multiplication (pow's libm rounding is not pinned), radians "
    "via the pi/180 literal, Q20-floored meters compared in integer "
    "space. Plan: a conservative lat/lon box prefilter pushed into "
    "the scan (latitude band exact, longitude band from the widest "
    "parallel, dropped near poles), exact haversine on survivors "
    "only, TakeOrderedAndProject for the page.",
)
def geo_distance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.geo import geo_distance

    g = _geo_events(spark, sf_dir)
    return geo_distance(
        g, "lat", "lon", center_lat=0.0, center_lon=0.0,
        distance_m=2_500_000.0, id_col="event_id", k=20,
    ).select("event_id", "dist_q20")


@register(
    "rate_agg_documents",
    f"""
WITH {_HITS_MERGE},
d AS (SELECT doc_id,
        {_TS0} + (doc_id % 7) * {_TS_STEP} AS ts FROM documents),
c AS (SELECT CAST(FLOOR(ts / 43200) * 43200 AS BIGINT) AS bucket_s,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM d JOIN hits USING (doc_id) GROUP BY 1)
SELECT bucket_s, n_docs,
       CAST(FLOOR(n_docs * (3600.0 / 43200.0) * 1048576.0) AS BIGINT)
         AS per_hour_q20
FROM c ORDER BY bucket_s
""",
    doc="ES ``rate`` aggregation (7.10) riding a date_histogram: the "
    "bucket count scaled to a time unit — 'docs per hour' off 12h "
    "buckets, the normalization every throughput dashboard does by "
    "hand. Fixed-interval parents only (a calendar bucket has no "
    "constant width; ES restricts the calendar case to matching "
    "calendar units — raises by name here), units "
    "second/minute/hour/day/week. One row-local expression "
    "FLOOR(n_docs x (unit/interval) x Q20) with the division "
    "grouped identically in both engines. Dispatched from "
    "aggs.<name>.aggs.<p>.rate.",
)
def rate_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ts_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"halfdays": {
            "date_histogram": {
                "field": "ingest_ts", "fixed_interval": "12h",
            },
            "aggs": {"per_hour_q20": {"rate": {"unit": "hour"}}},
        }},
    })
    return out.select(
        F.col("bucket").cast("long").alias("bucket_s"),
        "n_docs", "per_hour_q20",
    ).orderBy("bucket_s")


@register(
    "boxplot_agg_documents",
    f"""
WITH {_HITS_MERGE}
SELECT CAST(COUNT(n_chars) AS BIGINT) AS n_vals,
       MIN(n_chars) AS min_val,
       MAX(n_chars) AS max_val,
       CAST(FLOOR(quantile_cont(n_chars, 0.25) * 1048576.0) AS BIGINT)
         AS q1_q20,
       CAST(FLOOR(quantile_cont(n_chars, 0.5) * 1048576.0) AS BIGINT)
         AS q2_q20,
       CAST(FLOOR(quantile_cont(n_chars, 0.75) * 1048576.0) AS BIGINT)
         AS q3_q20
FROM documents JOIN hits USING (doc_id)
""",
    doc="ES ``boxplot`` aggregation over the hit set: min / max / "
    "exact interpolated quartiles of n_chars — the five-number "
    "summary behind every distribution widget. ES ships a t-digest "
    "approximation forced by its segment architecture; one Spark "
    "reduction computes the exact limit, and Spark ``percentile`` "
    "shares DuckDB ``quantile_cont``'s interpolation law "
    "(bit-equality pinned since percentile_stats_lineitem). "
    "Quartiles Q20-quantized; min/max exact raw picks; NULLs "
    "excluded per ES's value-count law. operators/search_compose.py:"
    "search_boxplot_agg; dispatched from aggs.<name>.boxplot. Plan: "
    "pruned probe -> broadcast hit join -> ONE reduction.",
)
def boxplot_agg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"chars": {"boxplot": {"field": "n_chars"}}},
    })


@register(
    "top_metrics_documents",
    f"""
WITH {_HITS_MERGE},
ranked AS (
  SELECT d.lang AS bucket, d.n_chars, d.source, d.doc_id,
         COUNT(*) OVER (PARTITION BY d.lang) AS n_docs,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
  FROM documents d JOIN hits USING (doc_id)
  WHERE d.lang IS NOT NULL AND d.n_chars IS NOT NULL
)
SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs,
       n_chars AS top_sort, source AS top_metric
FROM ranked WHERE rn = 1 ORDER BY bucket
""",
    doc="ES ``top_metrics`` riding a terms aggregation — 'per lang: "
    "the source of the LONGEST doc' (metric carried by the doc atop "
    "a sort; the one-value sibling of top_hits). ES breaks sort "
    "ties arbitrarily; this engine breaks them by id ascending so "
    "the answer is total-ordered and replayable. size=1 only "
    "(the multi-row page is top_hits' job); multiple metrics/sorts "
    "raise by name. operators/search_compose.py:"
    "search_facet_top_metrics; dispatched from "
    "aggs.<name>.terms + aggs.<sub>.top_metrics. Plan: hit ids join "
    "ONE column-pruned doc-values scan, a single partial-aggregated "
    "max_by reduction — no window, no second pass.",
)
def top_metrics_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"per_lang": {
            "terms": {"field": "lang"},
            "aggs": {"longest": {"top_metrics": {
                "metrics": {"field": "source"},
                "sort": {"n_chars": "desc"},
            }}},
        }},
    })


@register(
    "geotile_grid_events",
    "WITH "
    + _GEO_SQL
    + """,
t AS (SELECT
  CONCAT('4', '/',
    CAST(CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * 16.0), 0),
      15) AS BIGINT) AS VARCHAR), '/',
    CAST(CAST(LEAST(GREATEST(FLOOR(
      (1.0 - ln((sin(LEAST(GREATEST(lat, -85.05112878), 85.05112878)
                   * 0.017453292519943295) + 1.0)
                / cos(LEAST(GREATEST(lat, -85.05112878), 85.05112878)
                      * 0.017453292519943295)) / 3.141592653589793)
      / 2.0 * 16.0), 0), 15) AS BIGINT) AS VARCHAR)) AS tile
  FROM g)
SELECT tile, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM t GROUP BY tile
ORDER BY n_docs DESC, tile ASC LIMIT 15
""",
    doc="ES ``geotile_grid`` aggregation: points bucketed into "
    "Web-Mercator map tiles at zoom 4 — the 'z/x/y' keys every "
    "slippy-map heat layer consumes — top-15 cells by (count desc, "
    "tile asc), ES's bucket order with a deterministic key "
    "tiebreak; latitudes clamp to ±85.05112878 exactly like ES "
    "GeoTileUtils. Determinism: the y tile uses "
    "ln((sin phi + 1)/cos phi) — the tan+sec identity rewritten "
    "onto the sin/cos/ln set the haversine already pins "
    "cross-engine — pi and the clamp as literals. operators/geo.py:"
    "geotile_cells. Plan: one scan, two row-local expressions, ONE "
    "partial-aggregated groupBy + TakeOrderedAndProject.",
)
def geotile_grid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.geo import geotile_cells

    g = _geo_events(spark, sf_dir)
    return geotile_cells(g, "lat", "lon", zoom=4, k=15)


@register(
    "geo_distance_ranges_events",
    "WITH "
    + _GEO_SQL
    + """,
d AS (SELECT CAST(FLOOR(12742000.0 * asin(sqrt(
    sin((0.0 - lat) * 0.017453292519943295 / 2.0)
      * sin((0.0 - lat) * 0.017453292519943295 / 2.0)
    + cos(lat * 0.017453292519943295) * cos(0.0 * 0.017453292519943295)
      * sin((0.0 - lon) * 0.017453292519943295 / 2.0)
      * sin((0.0 - lon) * 0.017453292519943295 / 2.0)
  )) * 1048576.0) AS BIGINT) AS dq FROM g),
e AS (SELECT CAST(FLOOR(1000000.0 * 1048576.0) AS BIGINT) AS e1,
             CAST(FLOOR(3000000.0 * 1048576.0) AS BIGINT) AS e2,
             CAST(FLOOR(8000000.0 * 1048576.0) AS BIGINT) AS e3)
SELECT * FROM (
  SELECT '*-1000000.0' AS bucket,
         CAST(SUM(CASE WHEN dq < e1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs FROM d CROSS JOIN e
  UNION ALL
  SELECT '1000000.0-3000000.0',
         CAST(SUM(CASE WHEN dq >= e1 AND dq < e2 THEN 1 ELSE 0 END)
           AS BIGINT) FROM d CROSS JOIN e
  UNION ALL
  SELECT '3000000.0-8000000.0',
         CAST(SUM(CASE WHEN dq >= e2 AND dq < e3 THEN 1 ELSE 0 END)
           AS BIGINT) FROM d CROSS JOIN e
  UNION ALL
  SELECT '8000000.0-*',
         CAST(SUM(CASE WHEN dq >= e3 THEN 1 ELSE 0 END) AS BIGINT)
         FROM d CROSS JOIN e)
ORDER BY bucket
""",
    doc="ES ``geo_distance`` AGGREGATION — ring buckets around an "
    "origin ('how many events within 1 000 / 3 000 / 8 000 km'), "
    "from inclusive / to exclusive exactly ES's range-agg law, "
    "bucket keys in ES's *-to / from-to / from-* format, empty "
    "rings kept at 0. One haversine per row (the same pinned "
    "libm-neutral expression tree as geo_distance_events), compared "
    "in Q20 INTEGER space against Q20-floored edges. operators/"
    "geo.py:geo_distance_ranges. Plan: one scan, one row-local "
    "distance, one partial-aggregated conditional-sum reduction to "
    "n+1 cells — the filters-agg shape, never a shuffle per ring.",
)
def geo_distance_ranges_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.geo import geo_distance_ranges

    g = _geo_events(spark, sf_dir)
    return geo_distance_ranges(
        g, "lat", "lon", center_lat=0.0, center_lon=0.0,
        edges_m=[1_000_000.0, 3_000_000.0, 8_000_000.0],
    ).orderBy("bucket")


@register(
    "update_by_query_documents",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
winners AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window'),
eff AS (SELECT d.doc_id,
        CASE WHEN w.doc_id IS NOT NULL THEN 'curated' ELSE d.source END
          AS source
        FROM documents d LEFT JOIN winners w USING (doc_id)),
hits AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge')
SELECT eff.source AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(d.n_chars) AS min_val,
       MAX(d.n_chars) AS max_val,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_val,
       CAST(FLOOR(AVG(d.n_chars) * 1048576.0) AS BIGINT) AS avg_q20
FROM eff JOIN hits USING (doc_id) JOIN documents d USING (doc_id)
WHERE eff.source IS NOT NULL
GROUP BY eff.source ORDER BY n_docs DESC, bucket
""",
    doc="ES ``_update_by_query`` — the bulk re-tag request every "
    "index operator runs ('mark every doc matching window as "
    "curated'): the matched docs re-index as a NEW generation with "
    "ONE stored doc-values field rewritten (supported Painless: the "
    "set/increment shapes ctx._source.f = params.v / += params.v; "
    "anything else raises by name), postings/positions/norms "
    "byte-identical copies so every probe ranks exactly as before, "
    "old versions superseded through the standard LWW machinery "
    "under the claim/append/commit crash protocol — replay "
    "supersedes itself and converges. The query then reads the "
    "update BACK through a terms+stats aggregation keyed by the "
    "rewritten field; the oracle computes the effective field with a CASE "
    "over raw text. operators/search_lifecycle.py:update_by_query. "
    "Scale: matched (id, gen) pairs join each relation on its own "
    "bucketed layout — the matched set, not the corpus, bounds the "
    "work.",
)
def update_by_query_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from pycasselastic_spark.operators import search as SRCH2
    from pycasselastic_spark.plans.tuning import ensure_parallelism
    from pycasselastic_spark.queries.base import _t

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"), spark)
    path = os.path.join(tempfile.mkdtemp(prefix="updq_idx_"), "idx")
    SRCH2.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=16,
        stored_fields=["n_chars", "source"],
    )
    SRCH2.update_by_query(spark, path, {
        "query": {"match": {"text": "window"}},
        "script": {"source": "ctx._source.source = params.s",
                   "params": {"s": "curated"}},
    })
    idx = SRCH2.load_postings_index(spark, path)
    return es_search(idx, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"by_source": {
            "terms": {"field": "source"},
            "aggs": {"chars": {"stats": {"field": "n_chars"}}},
        }},
    })


@register(
    "span_containing_documents",
    "WITH "
    + _TOKPOS_SQL
    + """,
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'merge'),
big AS (SELECT DISTINCT a.doc_id, a.pos AS ps, b.pos AS pe
        FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos > a.pos
             AND b.pos - a.pos <= 3),
little AS (SELECT doc_id, pos FROM tok
           WHERE term IN ('scan', 'slow', 'hash', 'sort')),
keep AS (SELECT DISTINCT big.doc_id, big.ps, big.pe FROM big
         WHERE EXISTS (
           SELECT 1 FROM little l WHERE l.doc_id = big.doc_id
             AND big.ps <= l.pos AND l.pos <= big.pe))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM keep GROUP BY doc_id ORDER BY doc_id
""",
    doc="ES ``span_containing`` (Lucene SpanContainingQuery): big "
    "spans — 'fast then merge' within total stretch slop=2 — that "
    "ENCLOSE at least one little span ('scan'/'slow'/'hash'/'sort' "
    "via span_or), Lucene's enclosure law big.start <= little.start "
    "AND little.end <= big.end; ``span_within`` flips which side "
    "returns, dispatched from the same operator. Completes the span "
    "combinator family (span_near/span_first r13, span_or/span_not "
    "earlier this round). operators/search_ext.py:"
    "span_containing_search. Plan: the span_near position chain "
    "(stretch-pruned intermediate joins) semi-joined against ONE "
    "pruned little-side probe on (doc, interval enclosure) — both "
    "sides query-bounded, no raw text. Oracle replays positions "
    "from raw text with the identical EXISTS enclosure.",
)
def span_containing_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    out = es_search(idx, {
        "query": {"span_containing": {
            "big": {"span_near": {"clauses": [
                {"span_term": {"text": "fast"}},
                {"span_term": {"text": "merge"}},
            ], "slop": 2}},
            "little": {"span_or": {"clauses": [
                {"span_term": {"text": "scan"}},
                {"span_term": {"text": "slow"}},
                {"span_term": {"text": "hash"}},
                {"span_term": {"text": "sort"}},
            ]}},
        }},
    })
    return out.orderBy("doc_id")


@register(
    "ingest_pipeline_documents",
    """
WITH p AS (
  SELECT doc_id,
         string_split(trim(lower(regexp_replace(text, '[aeiou]', '',
                                                'g'))), ' ') AS toks,
         source, lang,
         CAST(n_chars AS DOUBLE) AS n_chars_d,
         'pipelined' AS tag
  FROM documents)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       source, lang, n_chars_d, tag
FROM p ORDER BY doc_id LIMIT 50
""",
    doc="ES ingest pipeline (``_ingest/pipeline`` / ``_simulate``) — "
    "the processor chain every doc passes before indexing, applied "
    "at corpus scale: gsub (strip vowels) -> lowercase -> trim -> "
    "split -> convert(n_chars to double) -> set(tag), IN ORDER, "
    "each processor seeing the previous one's output exactly like "
    "ES; unsupported processors, options ('if', on_failure) and "
    "convert types raise by name — a silently-skipped processor is "
    "how pipelines corrupt downstream data. This is the type-"
    "coercion layer the reference hand-rolled as its convert_xxx "
    "helpers (SURVEY §2.1 O13). operators/ingest_pipeline.py:"
    "simulate_pipeline. Plan: the whole chain collapses into ONE "
    "Catalyst projection riding the scan — zero shuffles, "
    "whole-stage codegen, identical cost at any corpus size.",
)
def ingest_pipeline_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pycasselastic_spark.operators.ingest_pipeline import (
        simulate_pipeline,
    )
    from pycasselastic_spark.queries.base import _t

    docs = _t(spark, sf_dir, "documents")
    out = simulate_pipeline(docs, [
        {"gsub": {"field": "text", "pattern": "[aeiou]",
                  "replacement": ""}},
        {"lowercase": {"field": "text"}},
        {"trim": {"field": "text"}},
        {"split": {"field": "text", "separator": " "}},
        {"convert": {"field": "n_chars", "type": "double"}},
        {"set": {"field": "tag", "value": "pipelined"}},
    ])
    return out.select(
        "doc_id", F.size("text").cast("long").alias("n_toks"),
        "source", "lang", F.col("n_chars").alias("n_chars_d"), "tag",
    ).orderBy("doc_id").limit(50)


@register(
    "completion_suggest_documents",
    f"""
WITH {_TOK_POSTINGS}
SELECT term AS suggestion, CAST(COUNT(*) AS BIGINT) AS weight
FROM postings WHERE term LIKE 's%'
GROUP BY term ORDER BY weight DESC, suggestion LIMIT 5
""",
    doc="ES ``completion`` suggester — search-box autocomplete: "
    "dictionary terms starting with s- ranked by popularity "
    "(document frequency as the weight — the signal ES users most "
    "often feed the FST's author-supplied weight with; duplicates "
    "impossible by construction, so skip_duplicates is the free "
    "default and =false raises). The prefix normalizes through the "
    "analyzer's character pipeline, the same Analyzer.normalize "
    "contract query_string bases use. operators/search_ext.py:"
    "suggest_completion; dispatched from "
    "suggest.<name>.prefix + completion. Plan: one dictionary scan "
    "with the prefix pushed as a StartsWith filter, a query-bounded "
    "term aggregation, TakeOrderedAndProject.",
)
def completion_suggest_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "suggest": {"autocomplete": {
            "prefix": "s",
            "completion": {"field": "text", "size": 5},
        }},
    })


@register(
    "runtime_field_documents",
    f"""
WITH {_HITS_MERGE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(d.n_chars * 2) AS min_val,
       MAX(d.n_chars * 2) AS max_val,
       CAST(SUM(d.n_chars * 2) AS BIGINT) AS sum_val,
       CAST(FLOOR(AVG(d.n_chars * 2) * 1048576.0) AS BIGINT) AS avg_q20
FROM documents d JOIN hits USING (doc_id)
""",
    doc="ES ``runtime_mappings`` — query-time computed fields: "
    "``n2 = emit(doc['n_chars'].value * 2)`` declared in the request "
    "body, then used by a stats aggregation exactly like a stored "
    "field (ranges/terms/exists filters see it too — the wrapper "
    "index exposes the computed column as first-class doc-values). "
    "The natural Catalyst fit: the expression rides the doc-values "
    "scan's PROJECTION, same stage, base-column pushdown unchanged — "
    "where ES re-executes the Painless script per doc per query. "
    "Supported grammar: one emit of one doc-value through at most "
    "one arithmetic op with a literal; richer scripts, shadowing "
    "names, unknown source fields and divide-by-zero raise by name. "
    "operators/search_api.py:_with_runtime_fields. Oracle replays "
    "the arithmetic inline.",
)
def runtime_field_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _postings_index_for(spark, sf_dir)
    return es_search(idx, {
        "runtime_mappings": {"n2": {
            "type": "long",
            "script": {"source": "emit(doc['n_chars'].value * 2)"},
        }},
        "query": {"match": {"text": "merge"}},
        "aggs": {"s": {"stats": {"field": "n2"}}},
    })
