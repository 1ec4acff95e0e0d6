"""Relational coverage absent from the reference (SURVEY.md S2.2): joins of every flavor, aggregation/rollup/cube/pivot, windows, sorts/top-k, set ops, event-time sessionization, as-of join, scalar conversions, percentiles, applyInPandas, semi-structured JSON, outer joins, skew mitigation, SCD2.

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
# Relational coverage (absent from the reference — SURVEY.md §2.2):
# hash aggregation, joins of every flavor, windows, sorts, set ops.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2)))
       * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: filtered scan -> hash agg with 8 aggregates; "
    "map-side partial aggregation, decimal-exact money sums.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (1 - money("l_discount"))
    charge = disc_price * (1 + money("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            money_expr_sum(disc_price, "sum_disc_price"),
            money_expr_sum(charge, "sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(money("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
""",
    doc="TPC-H Q3 shape: selective dim filter -> join -> agg. customer is "
    "broadcast (small side); lineitem never shuffles on the join key.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = money("l_extendedprice") * (1 - money("l_discount"))
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_expr_sum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_region_revenue",
    """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
""",
    doc="TPC-H Q5 shape: 6-way join with a region filter; all dims "
    "broadcast, lineitem/orders are the only big relations.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (1 - money("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money_expr_sum(revenue, "revenue"))
    )


@register(
    "topk_orders_per_priority",
    """
SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
    doc="Top-k per group via windowed row_number; single shuffle on the "
    "group key, streaming evaluation (no per-group materialization).",
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return topk_per_group(
        orders,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


@register(
    "semi_join_customers_with_orders",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="Left-semi join (EXISTS).",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join_customers_without_orders",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
""",
    doc="Left-anti join (NOT EXISTS): customers with no large order.",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "rollup_lineitem_status",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    doc="Hierarchical rollup aggregation (grouping sets).",
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), money_sum("l_quantity", "sum_qty")
    )


@register(
    "cube_orders_status_priority",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    doc="Full cube over two dimensions.",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), money_sum("o_totalprice", "sum_price")
    )


@register(
    "distinct_counts_events",
    """
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_types,
       COUNT(*) AS n_events
FROM events
""",
    doc="Exact distinct aggregation.",
)
def distinct_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "except_customers_minus_buyers",
    """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
""",
    doc="Set difference (EXCEPT DISTINCT): customers minus big spenders.",
)
def except_customers_minus_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.subtract(buyers)


@register(
    "intersect_buyers_and_customers",
    """
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey AS custkey FROM customer
""",
    doc="Set intersection (INTERSECT DISTINCT).",
)
def intersect_buyers_and_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    buyers = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return buyers.intersect(cust)


@register(
    "top10_orders_by_price",
    """
SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    doc="Global sort + limit (Spark runs TakeOrderedAndProject — a "
    "per-partition top-k then a k-row merge, no full sort at scale).",
)
def top10_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Event-time windowing, sessionization, as-of join.
# ---------------------------------------------------------------------------


@register(
    "tumbling_window_events",
    """
SELECT time_bucket(INTERVAL 5 MINUTES, CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Event-time tumbling window aggregation (batch form of the "
    "streaming windowed agg; epoch-aligned 5-minute buckets).",
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sessionize_events",
    """
WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
g AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       min(us) AS start_us, max(us) AS end_us
FROM s GROUP BY user_id, session_id
""",
    doc="Batch sessionization (30-min inactivity gap) via lag + "
    "conditional cumsum; gaps compared in exact integer microseconds.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_micros("ts").alias("us")
    )
    sess = sessionize(ev.drop("ts"), ["user_id"], "us", gap_seconds=1_800_000_000)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


@register(
    "asof_join_last_signup",
    """
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
s AS (SELECT user_id, event_id AS signup_event_id, CAST(ts AS TIMESTAMP) AS signup_ts
      FROM events WHERE event_type = 'signup')
SELECT e.event_id, e.user_id, e.ts, s.signup_event_id, s.signup_ts
FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
""",
    doc="As-of (backward) join: each event matched to the user's most "
    "recent signup at-or-before it. Union + last-non-null window trick — "
    "one shuffle, no Python (operators/relational.py:asof_join).",
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    signups = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_event_id"),
            F.col("ts").alias("signup_ts"),
        )
    )
    return asof_join(
        ev, signups, on=["user_id"], left_ts="ts", right_ts="signup_ts",
        right_prefix="",
    )


# ---------------------------------------------------------------------------
# Additional SURVEY §2.2 coverage: scalar-conversion suite, range join,
# running window aggregates, pivot, exact percentiles, applyInPandas.
# ---------------------------------------------------------------------------

from pycasselastic_spark.core import convert as CV  # noqa: E402


@register(
    "convert_roundtrip_events",
    """
SELECT event_id,
       epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_millis,
       CAST(to_timestamp(CAST(floor(epoch_ms(CAST(ts AS TIMESTAMP)) / 1000) AS BIGINT)) AS TIMESTAMP) AS ts_from_secs,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso,
       lower(concat(
         substring(md5(CAST(event_id AS VARCHAR)), 1, 8), '-',
         substring(md5(CAST(event_id AS VARCHAR)), 9, 4), '-',
         substring(md5(CAST(event_id AS VARCHAR)), 13, 4), '-',
         substring(md5(CAST(event_id AS VARCHAR)), 17, 4), '-',
         substring(md5(CAST(event_id AS VARCHAR)), 21, 12))) AS synthetic_uuid
FROM events
""",
    doc="Scalar conversion suite (reference O13, utils.py:58-74 + "
    "pyCassElastic.py:275-277): epoch millis, second-precision round "
    "trip, ISO-8601 micros formatting, UUID canonicalization (here over "
    "md5-derived hex; core/convert.py:normalize_uuid).",
)
def convert_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    raw_hex = F.md5(F.col("event_id").cast("string"))
    return ev.select(
        "event_id",
        CV.to_epoch_millis("ts").alias("ts_millis"),
        F.timestamp_seconds(F.floor(CV.to_epoch_millis("ts") / 1000)).alias(
            "ts_from_secs"
        ),
        CV.format_iso_micros("ts").alias("ts_iso"),
        CV.normalize_uuid(raw_hex).alias("synthetic_uuid"),
    )


@register(
    "range_join_value_buckets",
    """
WITH buckets(bucket, lo, hi) AS (
  VALUES ('small', 0.0, 50.0), ('medium', 50.0, 200.0),
         ('large', 200.0, 1000.0), ('huge', 1000.0, 1e9)
)
SELECT b.bucket, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bucket
""",
    doc="Range (interval) join: events matched to value buckets via "
    "inequality predicates — broadcast nested loop on the tiny dim "
    "(at scale: bucketize-then-equi-join rewrite).",
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ensure_parallelism(_t(spark, sf_dir, "events"), spark)
    buckets = spark.createDataFrame(
        [
            ("small", 0.0, 50.0),
            ("medium", 50.0, 200.0),
            ("large", 200.0, 1000.0),
            ("huge", 1000.0, 1e9),
        ],
        ["bucket", "lo", "hi"],
    )
    return (
        ev.join(
            F.broadcast(buckets),
            (ev.value >= buckets.lo) & (ev.value < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "sum_value"),
        )
    )


@register(
    "running_totals_orders",
    """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
    doc="Running (cumulative) window aggregates per key — decimal-exact "
    "prefix sums, deterministic ordering.",
)
def running_totals_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(money("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "pivot_orders_status",
    """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
""",
    doc="Pivot (wide aggregation): order counts by status per priority.",
)
def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@register(
    "percentile_stats_lineitem",
    """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_quantity, 0.5) AS p50_qty
FROM lineitem GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles (Spark `percentile` == DuckDB "
    "`quantile_cont`, bit-identical); at 100 TB swap to "
    "`percentile_approx` + a documented tolerance.",
)
def percentile_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
    )


@register(
    "applyinpandas_rank_events",
    """
SELECT event_id, event_type,
       ROW_NUMBER() OVER (PARTITION BY event_type
                          ORDER BY value DESC, event_id) AS value_rank
FROM events
""",
    doc="Grouped-map Pandas UDF (applyInPandas): per-group dense value "
    "ranking computed in Arrow batches — the UDAF/UDTF escape hatch "
    "demonstrated on a deterministic, oracle-checkable computation.",
)
def applyinpandas_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def rank_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["value_rank"] = pdf.index + 1
        return pdf[["event_id", "event_type", "value_rank"]]

    return ev.groupBy("event_type").applyInPandas(
        rank_group, schema="event_id long, event_type string, value_rank long"
    )


# ---------------------------------------------------------------------------
# Semi-structured data, outer joins, skew mitigation, SCD2 history.
# ---------------------------------------------------------------------------

from pycasselastic_spark.core.scd2 import scd2_apply  # noqa: E402
from pycasselastic_spark.operators.skew import salted_count_sum  # noqa: E402


@register(
    "json_extract_events",
    """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
    doc="Semi-structured extraction: JSON path into the props column "
    "(get_json_object, JVM-side) feeding a hash aggregation.",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "full_outer_join_customer_orders",
    """
WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100),
o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      WHERE o_custkey >= 50 GROUP BY o_custkey)
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name, o.n_orders
FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
""",
    doc="Full outer join with unmatched rows on both sides (NULL-filled).",
)
def full_outer_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", "c_name")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") >= 50)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_orders",
    )


@register(
    "skew_salted_agg_events",
    """
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
    doc="Skew-salted two-stage aggregation (operators/skew.py): hot keys "
    "split across 16 salt buckets, partials re-aggregated; decimal "
    "partial sums make the result bit-identical to the plain GROUP BY "
    "oracle.",
)
def skew_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return salted_count_sum(
        ev, ["event_type"], ["value"], salt_col="event_id", salt_buckets=16
    )


@register(
    "salted_join_events_customer",
    """
SELECT e.event_id, e.user_id, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
    doc="Skew-salted inner join (operators/skew.py:salted_join): the big "
    "side salted 16 ways on a row-level column, the dimension replicated "
    "per salt, joined on (key, salt) — a hot key's probe work spreads "
    "over 16 tasks. The oracle is the PLAIN join: salting must change "
    "partitioning only, never semantics.",
)
def salted_join_events_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pycasselastic_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return salted_join(ev, dim, ["user_id"], salt_col="event_id", salt_buckets=16)


@register(
    "gap_fill_hourly_events",
    """
WITH h AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT user_id, min(hour) AS lo, max(hour) AS hi FROM h GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
  FROM spans)
SELECT g.user_id, epoch_us(g.hour) AS hour_us,
       COALESCE(h.n, 0) AS n_events
FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.hour = h.hour
""",
    doc="Time-series gap fill: per-user dense hourly grid from first to "
    "last event (sequence + explode — generated distributed, per key, "
    "never on the driver), left-joined against observed hourly counts "
    "with zeros filled. The regularized-series input shape for "
    "downstream window/forecast ops.",
)
def gap_fill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select("user_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .groupBy("user_id", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.unix_micros("hour").alias("hour_us"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "scd2_customer_history",
    """
WITH cur AS (SELECT c_custkey AS id, c_mktsegment AS segment,
                    0 AS valid_from FROM customer),
upd AS (
  SELECT id, version, segment FROM (
    SELECT o_custkey AS id, epoch_ms(o_orderdate) AS version,
           o_orderpriority AS segment,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY epoch_ms(o_orderdate) DESC,
                                       o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1
),
j AS (SELECT cur.id AS cid, cur.segment AS cseg, cur.valid_from,
             upd.id AS uid, upd.version, upd.segment AS useg
      FROM cur FULL OUTER JOIN upd ON cur.id = upd.id)
SELECT cid AS c_custkey, cseg AS segment,
       CAST(valid_from AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
FROM j WHERE cid IS NOT NULL
  AND NOT (uid IS NOT NULL AND version > valid_from AND useg IS DISTINCT FROM cseg)
UNION ALL
SELECT cid, cseg, CAST(valid_from AS BIGINT), CAST(version AS BIGINT)
FROM j WHERE cid IS NOT NULL AND uid IS NOT NULL
  AND version > valid_from AND useg IS DISTINCT FROM cseg
UNION ALL
SELECT uid, useg, CAST(version AS BIGINT), CAST(NULL AS BIGINT)
FROM j WHERE uid IS NOT NULL
  AND (cid IS NULL OR (version > valid_from AND useg IS DISTINCT FROM cseg))
""",
    doc="SCD2 history maintenance (core/scd2.py): CDC MERGE emulated as "
    "full-outer join + change detection + close/open rows; the SCD2 "
    "twin of the LWW (SCD1) merge.",
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    history = cust.select(
        F.col("c_custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    orders = _t(spark, sf_dir, "orders")
    updates = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        # o_orderdate scans as TIMESTAMP_NTZ; session TZ is UTC so this
        # cast matches DuckDB's epoch_ms of the naive timestamp
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("version"),
        F.col("o_orderpriority").alias("segment"),
        "o_orderkey",
    )
    return scd2_apply(
        history,
        updates,
        id_col="c_custkey",
        version_col="version",
        attr_cols=["segment"],
        tiebreak_cols=["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# Wider SQL surface: EXISTS-agg, decorrelated comparison to a per-key
# aggregate, HAVING, RANGE window frames, string & null function suites.
# ---------------------------------------------------------------------------


@register(
    "q4_priority_with_big_lineitem",
    """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_extendedprice > 90000)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS (left-semi join) feeding an aggregation.",
)
def q4_priority_with_big_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 90000)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "orders_above_customer_avg",
    """
WITH stats AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS s,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders)
SELECT o_orderkey, o_custkey, o_totalprice
FROM stats
WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n > s
""",
    doc="Correlated-subquery shape (decorrelated): orders above their "
    "customer's average price — compared exactly via cross-"
    "multiplication in decimal space (no float-average boundary).",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        orders.withColumn("_s", F.sum(money("o_totalprice")).over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(money("o_totalprice") * F.col("_n") > F.col("_s"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "having_frequent_buyers",
    """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
""",
    doc="Aggregation with HAVING (post-aggregation filter).",
)
def having_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "range_frame_event_counts",
    """
WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
         AS n_last_10min
FROM e
""",
    doc="RANGE window frame: per user, events in the trailing 10 minutes "
    "(value-range frame over integer microseconds — exact cross-engine).",
)
def range_frame_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_10min")
    )


@register(
    "string_suite_documents",
    """
SELECT doc_id,
       upper(split_part(text, ' ', 1)) AS first_word_upper,
       length(text) AS text_len,
       strpos(text, 'data') AS data_pos,
       levenshtein(lang, 'en') AS lang_dist,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       reverse(lang) AS lang_rev,
       substring(text, 1, 12) AS prefix12
FROM documents
""",
    doc="Scalar string-function suite: case, length, substring search, "
    "edit distance, padding, reverse — all JVM built-ins.",
)
def string_suite_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.split_part(F.col("text"), F.lit(" "), F.lit(1))).alias(
            "first_word_upper"
        ),
        F.length("text").cast("long").alias("text_len"),
        F.instr(F.col("text"), "data").cast("long").alias("data_pos"),
        F.levenshtein(F.col("lang"), F.lit("en")).cast("long").alias("lang_dist"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.substring(F.col("text"), 1, 12).alias("prefix12"),
    )


@register(
    "null_handling_suite",
    """
SELECT doc_id,
       COALESCE(NULLIF(source, 'src7'), 'suppressed') AS source_or_flag,
       CASE WHEN n_chars IS NULL THEN -1 ELSE n_chars END AS chars_or_neg,
       GREATEST(n_chars, 100) AS at_least_100,
       LEAST(n_chars, 500) AS at_most_500,
       (source IS NOT NULL AND n_chars > 200) AS is_long_sourced
FROM documents
""",
    doc="NULL-handling suite: coalesce/nullif/case/greatest/least and "
    "three-valued boolean logic.",
)
def null_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.coalesce(F.nullif(F.col("source"), F.lit("src7")), F.lit("suppressed")).alias(
            "source_or_flag"
        ),
        F.when(F.col("n_chars").isNull(), -1).otherwise(F.col("n_chars")).alias(
            "chars_or_neg"
        ),
        F.greatest(F.col("n_chars"), F.lit(100)).alias("at_least_100"),
        F.least(F.col("n_chars"), F.lit(500)).alias("at_most_500"),
        (F.col("source").isNotNull() & (F.col("n_chars") > 200)).alias(
            "is_long_sourced"
        ),
    )


@register(
    "grouping_sets_orders",
    """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc="Explicit GROUPING SETS with grouping() indicator columns "
    "(disambiguates real NULLs from subtotal rows).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               COUNT(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


