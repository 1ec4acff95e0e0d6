"""Relational + suite queries rotated out of pipeline2.py in round 9 (the module-size split, round-8 verdict item 7): TPC-H shapes q2/q8/q9/q13/q15/q16/q17/q20/q21, the window/date/regex/array function suites, and the funnel / retention / session event analytics.

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
from pycasselastic_spark.streaming.windows import (  # noqa: F401,E402
    sliding_event_counts,
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
    _MEAN_SQL,
    _STOPS_SQL,
    _UNIT_SQL,
    _ivf_centroids_sql,
)
from pycasselastic_spark.queries.streaming_q import (  # noqa: F401
    _run_stream_to_parquet,
)



@register(
    "window_function_suite_orders",
    """
SELECT o_orderkey, o_custkey,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       FIRST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Window-function breadth: lag/lead/ntile/percent_rank/cume_dist "
    "+ framed first/last_value per customer, unique (orderdate, "
    "orderkey) tiebreak everywhere. percent_rank and cume_dist are "
    "int/int divisions — exactly rounded in both engines.",
)
def window_function_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
    )


@register(
    "date_arithmetic_suite_orders",
    """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS o_day,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS o_quarter,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + 30 AS plus_30d,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS BIGINT) AS days_since_1995
FROM orders
""",
    doc="Scalar date/time arithmetic breadth: extract fields, month "
    "truncation, last_day, day offsets and day differences — all "
    "calendar-exact (no timezone arithmetic; session pinned UTC).",
)
def date_arithmetic_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("o_year"),
        F.month(d).cast("bigint").alias("o_month"),
        F.dayofmonth(d).cast("bigint").alias("o_day"),
        F.quarter(d).cast("bigint").alias("o_quarter"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("plus_30d"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_1995"),
    )


@register(
    "q8_market_share",
    """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'ECONOMY') all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 shape: 8-way join, region-filtered customers, "
    "share-of-total CASE ratio per year. Decimal sums, double division "
    "once at the end.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = money("l_extendedprice") * (1 - money("l_discount"))
    share_vol = F.when(F.col("nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            (F.sum(share_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q9_product_profit",
    """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           - CAST(p_retailprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%e%') profit
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 shape: profit per supplier-nation per year with a "
    "LIKE filter on part names (p_retailprice stands in for the absent "
    "partsupp supplycost). Exercises LIKE pushdown + 5-way join + "
    "two-column rollup.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = money("l_extendedprice") * (1 - money("l_discount")) - money(
        "p_retailprice"
    ) * money("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money_expr_sum(F.col("amount"), "sum_profit"))
    )


@register(
    "q13_order_count_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: left outer join with an extra join-side "
    "predicate, then a two-level aggregation (orders per customer -> "
    "histogram of counts). COUNT(col) counts non-NULL only — customers "
    "with no qualifying orders land in the 0 bucket.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 shape: aggregate-derived view joined back against "
    "its own MAX (scalar subquery over a CTE) — the classic "
    "top-supplier query; the revenue view computes once per branch.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    vol = money("l_extendedprice") * (1 - money("l_discount"))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_expr_sum(vol, "total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity), decorrelated into an aggregate + join; the average is "
    "exact-decimal-sum / count so both engines agree bitwise.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("_pk"))
        .agg(
            (
                F.lit(0.2)
                * (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)))
            ).alias("_qty_bar")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_bar"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "funnel_conversion_events",
    """
WITH stage AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_buy
  FROM events GROUP BY user_id)
SELECT
  COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
    AS purchased_after_click
FROM stage
""",
    doc="Funnel conversion (view -> click -> purchase in strict time "
    "order, by first occurrence per stage): one conditional-MIN "
    "aggregation per user, then counting stage survivors — the "
    "product-analytics sequence query as two partial-aggregated "
    "shuffles, no self-joins.",
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    stage = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_int(viewed).alias("viewed"),
        as_int(clicked).alias("clicked_after_view"),
        as_int(bought).alias("purchased_after_click"),
    )


@register(
    "retention_cohorts_events",
    """
WITH firsts AS (
  SELECT user_id,
         CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
  FROM events)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.week) // 7 AS BIGINT) AS week_offset,
       COUNT(*) AS active_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort, week_offset
""",
    doc="Retention cohorts: users bucketed by first-activity week, "
    "counted per subsequent active week offset — first-touch "
    "aggregation joined back to distinct weekly activity; all shuffles "
    "keyed by user or (cohort, offset), calendar-exact week truncation "
    "(both engines start weeks on Monday).",
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort")) / 7)
            .cast("bigint"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "session_stats_events",
    """
WITH e AS (SELECT user_id, event_type, value,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
g AS (
  SELECT user_id, us, event_type, value,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us, event_type, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         max(us) - min(us) AS duration_us,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
  FROM s GROUP BY user_id, session_id)
SELECT
  COUNT(*) AS n_sessions,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
  CAST(SUM(n_events) AS BIGINT) AS total_events,
  CAST(SUM(duration_us) // 1000000 AS BIGINT)
    AS total_duration_s,
  CAST(SUM(n_purchases) AS BIGINT) AS total_purchases,
  CAST(SUM(CAST(session_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM per_session
""",
    doc="Session-level rollup composed on the sessionize operator: "
    "per-session duration/bounce/purchase/value stats, then a global "
    "summary — integer-microsecond durations and decimal-exact money "
    "keep the two-level rollup hashable cross-engine.",
)
def session_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.unix_micros("ts").alias("us")
    )
    sess = sessionize(ev, ["user_id"], "us", gap_seconds=1_800_000_000)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        money_sum("value", "session_value"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("bounces"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        # INTEGER division micros -> whole seconds: routing through a
        # double + cast was a latent cross-engine trap (DuckDB's
        # double->bigint CAST rounds, Spark's truncates — they diverged
        # by 1 s at sf0.001 when the fraction crossed .5)
        F.expr("CAST(sum(duration_us) DIV 1000000 AS BIGINT)")
        .alias("total_duration_s"),
        F.sum("n_purchases").cast("bigint").alias("total_purchases"),
        money_sum("session_value", "total_value"),
    )


@register(
    "q21_sole_supplier_orders",
    """
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_suppkey, s_name
""",
    doc="TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the "
    "same fact table (multi-supplier orders where this supplier shipped "
    "strictly last), planned as a semi join + anti join on the order "
    "key. The classic late-supplier blame query.",
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = _t(spark, sf_dir, "supplier")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    others = li.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_suppkey").alias("_sk"),
        F.col("l_shipdate").alias("_sd"),
    )
    with_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
        "left_semi",
    )
    not_latest = with_other.join(
        others,
        (F.col("l_orderkey") == F.col("_ok"))
        & (F.col("l_suppkey") != F.col("_sk"))
        & (F.col("_sd") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        not_latest.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "array_function_suite_embeddings",
    """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       list_sum(list_transform(embedding, x -> x::DOUBLE)) AS vec_sum,
       list_sum(list_transform(
         list_filter(embedding, x -> x > 0), x -> x::DOUBLE)) AS pos_sum,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       CAST(embedding[1] AS DOUBLE) AS first_comp,
       CAST(list_sort(embedding)[len(embedding)] AS DOUBLE) AS max_comp,
       list_sum(list_transform(embedding[1:8],
                x -> x::DOUBLE * x::DOUBLE)) AS head_sq_sum
FROM embeddings
""",
    doc="Array higher-order-function breadth over the embedding column: "
    "transform / filter / slice / sort / element access / sequential "
    "fold — the JVM-side array toolkit ANN and dedup are built from, "
    "exercised directly. Sequential-double folds keep sums bit-exact "
    "cross-engine.",
)
def array_function_suite_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    pos = F.filter(e, lambda x: x > 0)
    return emb.select(
        "vec_id",
        F.size(e).cast("int").alias("dim"),
        fold(e).alias("vec_sum"),
        fold(pos).alias("pos_sum"),
        F.size(pos).cast("int").alias("n_pos"),
        F.element_at(e, 1).cast("double").alias("first_comp"),
        F.element_at(F.array_sort(e), F.size(e)).cast("double").alias("max_comp"),
        F.aggregate(
            F.slice(e, 1, 8),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("head_sq_sum"),
    )


@register(
    "q20_part_supplier_chain",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
""",
    doc="TPC-H Q20 shape: two-level nested IN chain (parts by LIKE -> "
    "suppliers by shipped-quantity HAVING -> supplier projection), "
    "planned as stacked semi joins with the aggregate in the middle.",
)
def q20_part_supplier_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    big_suppliers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
    )
    return supplier.join(
        F.broadcast(big_suppliers),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


@register(
    "regex_suite_events",
    """
SELECT event_id,
       regexp_extract(props, '[0-9]+', 0) AS first_number,
       regexp_replace(props, '[0-9]+', '#') AS masked,
       CAST(regexp_matches(props, '"k": [0-9]{2}') AS INT) AS has_2digit,
       CAST(len(regexp_extract_all(props, '[0-9]')) AS INT) AS n_digits
FROM events WHERE event_id < 500
""",
    doc="Regex breadth over the props JSON strings: extract, replace, "
    "boolean match, match counting — simple character-class patterns "
    "whose semantics are identical across the Java and RE2-style "
    "engines.",
)
def regex_suite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    p = F.col("props")
    return ev.select(
        "event_id",
        F.regexp_extract(p, "[0-9]+", 0).alias("first_number"),
        F.regexp_replace(p, "[0-9]+", "#").alias("masked"),
        p.rlike('"k": [0-9]{2}').cast("int").alias("has_2digit"),
        F.size(F.regexp_extract_all(p, F.lit("[0-9]"), F.lit(0)))
        .cast("int")
        .alias("n_digits"),
    )


@register(
    "q2_min_price_supplier",
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey, l_extendedprice
  FROM lineitem),
best AS (
  SELECT l_partkey AS bp, MIN(l_extendedprice) AS min_price
  FROM offers GROUP BY l_partkey)
SELECT p_partkey, p_name, s_suppkey, s_name, o.l_extendedprice AS price
FROM offers o, best, part, supplier
WHERE o.l_partkey = bp AND o.l_extendedprice = min_price
  AND p_partkey = o.l_partkey AND s_suppkey = o.l_suppkey
  AND p_size <= 5
  AND o.l_suppkey = (SELECT MIN(o2.l_suppkey) FROM offers o2
                     WHERE o2.l_partkey = o.l_partkey
                       AND o2.l_extendedprice = best.min_price)
""",
    doc="TPC-H Q2 shape: argmin-per-group with join-back (cheapest "
    "offer per part, supplier-key tiebreak making the argmin unique) — "
    "the relational dual of the LWW argmax merge, expressed with "
    "min_by(struct) so the shuffle carries one candidate per key.",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    supplier = _t(spark, sf_dir, "supplier")
    best = (
        li.groupBy("l_partkey")
        .agg(
            F.min_by(
                F.struct(
                    F.col("l_extendedprice").alias("price"),
                    F.col("l_suppkey").alias("supp"),
                ),
                F.struct("l_extendedprice", "l_suppkey"),
            ).alias("_b")
        )
        .select(
            "l_partkey",
            F.col("_b.price").alias("price"),
            F.col("_b.supp").alias("l_suppkey"),
        )
    )
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "price")
    )


@register(
    "q16_supplier_variety",
    """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape: NOT IN subquery + COUNT(DISTINCT) per part "
    "attribute triple — supplier variety excluding negative-balance "
    "suppliers. NOT IN is null-aware in general; the subquery key is "
    "non-nullable here, so the plain (broadcast) anti join is exactly "
    "equivalent and is the plan used.",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 13))
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


