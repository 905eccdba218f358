"""Relational operator coverage (SURVEY §2.4 checklist) over the TPC-H-ish
star schema + the ``events`` stream table: scans, projection/filter,
broadcast / shuffle / semi / anti / as-of joins, hash + rollup aggregation,
window functions (sessionization, as-of lookback), sorts/top-k, distinct,
string/date functions.

Cross-engine determinism notes (the driver value-hashes Spark vs DuckDB):

* money sums go through DECIMAL so they are exact and order-independent
  (double sums would differ in the last ulp between engines);
* timestamps are emitted as formatted strings (engine-native timestamp
  encodings differ);
* event-time arithmetic uses integer microseconds (`unix_micros` /
  `epoch_us`) — second-granularity truncation would misclassify session
  gaps near the boundary;
* every top-k orders by a unique tiebreaker so LIMIT selects a
  deterministic set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# TPC-H-style
# ---------------------------------------------------------------------------

def q_rel_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter + hash aggregate (partial agg
    map-side; no skew risk: 6 groups)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))
                   * (1 + F.col("l_tax"))).cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_rel_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast("decimal(18,4)")).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_rel_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join, dims broadcast, local-supplier condition
    (c_nationkey = s_nationkey)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast("decimal(18,4)")).cast("double").alias("revenue"))
    )


def q_rel_customers_without_orders(spark, sf_dir):
    """Anti join (the reference's dict-miss split shape,
    lemma/trainer.py:236-250)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") >= "2001-01-01")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti") \
               .select("c_custkey", "c_name")


def q_rel_orders_rollup(spark, sf_dir):
    """ROLLUP aggregation (grouping sets)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n", "total")
    )


def q_rel_users_per_event_type(spark, sf_dir):
    """Exact distinct aggregation."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"))


# ---------------------------------------------------------------------------
# Event-stream analytics (window functions)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_rel_value_quantiles(spark, sf_dir):
    """Exact distribution statistics per group: Spark's `percentile`
    (exact linear interpolation) matches DuckDB's quantile_cont
    bit-for-bit after 6-dp rounding — the exact-twin of the
    approx_percentile pattern (approximate sketches can't be
    cross-engine value-checked; at 100 TB swap in approx_percentile and
    keep this as the verification-scale twin)."""
    ev = _t(spark, sf_dir, "events")
    qs = F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.99))")
    return ev.groupBy("event_type").agg(
        F.round(qs[0], 6).alias("p25"),
        F.round(qs[1], 6).alias("p50"),
        F.round(qs[2], 6).alias("p75"),
        F.round(qs[3], 6).alias("p99"),
        F.count(F.lit(1)).alias("n"))


def q_rel_event_pivot(spark, sf_dir):
    """Pivot (wide aggregation): daily event counts, one column per event
    type — the explicit value list keeps the output schema deterministic
    (and lets Catalyst skip the extra distinct-values job)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format(F.col("ts").cast("timestamp"),
                                           "yyyy-MM-dd"))
        .groupBy("day").pivot("event_type", EVENT_TYPES).count()
        .select("day", *[F.coalesce(t, F.lit(0)).alias(f"n_{t}")
                         for t in EVENT_TYPES])
    )


def q_rel_event_unpivot(spark, sf_dir):
    """Unpivot (stack): the wide daily table back to long
    (day, event_type, n) — zero-count cells become explicit rows."""
    wide = q_rel_event_pivot(spark, sf_dir)
    expr = ("stack(5, " + ", ".join(f"'{t}', n_{t}" for t in EVENT_TYPES)
            + ") AS (event_type, n)")
    return wide.selectExpr("day", expr)


def q_rel_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag + running sum —
    the relational form of stateful stream sessionization; the streaming
    variant lives in stanza_spark.streaming."""
    ev = _t(spark, sf_dir, "events").withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = 30 * 60 * 1_000_000
    sess = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .withColumn("is_new",
                    F.when(F.col("prev_us").isNull()
                           | (F.col("us") - F.col("prev_us") > gap), 1)
                    .otherwise(0))
        .withColumn("session_id", F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
             F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"))
    )


def q_rel_hourly_counts(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming windowed
    count)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                 "yyyy-MM-dd HH:mm:ss").alias("hour"),
                   "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
    )


def q_rel_asof_last_purchase(spark, sf_dir):
    """As-of join: each event annotated with the user's most recent prior
    'purchase' timestamp — expressed as a lookback window max, the
    shuffle-minimal form (one exchange on user_id; a join formulation would
    shuffle twice)."""
    ev = _t(spark, sf_dir, "events").withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = (Window.partitionBy("user_id").orderBy("us", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        ev.withColumn(
            "last_purchase_us",
            F.max(F.when(F.col("event_type") == "purchase", F.col("us"))).over(w))
        .select(
            "event_id", "user_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            F.date_format(F.timestamp_micros(F.col("last_purchase_us")),
                          "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_purchase_ts"))
    )


def q_rel_event_props(spark, sf_dir):
    """Semi-structured access: JSON property extraction + aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("total_k"),
             F.max("k").alias("max_k"),
             F.count(F.lit(1)).alias("n"))
    )


RELATIONAL_QUERIES = {
    "rel_event_props": q_rel_event_props,
    "rel_pricing_summary": q_rel_pricing_summary,
    "rel_top_orders": q_rel_top_orders,
    "rel_region_revenue": q_rel_region_revenue,
    "rel_customers_without_orders": q_rel_customers_without_orders,
    "rel_orders_rollup": q_rel_orders_rollup,
    "rel_users_per_event_type": q_rel_users_per_event_type,
    "rel_value_quantiles": q_rel_value_quantiles,
    "rel_event_pivot": q_rel_event_pivot,
    "rel_event_unpivot": q_rel_event_unpivot,
    "rel_sessionize": q_rel_sessionize,
    "rel_hourly_counts": q_rel_hourly_counts,
    "rel_asof_last_purchase": q_rel_asof_last_purchase,
}


def relational_oracles() -> dict[str, str]:
    return {
        "rel_event_props": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS total_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS max_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "rel_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "rel_top_orders": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "rel_region_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "rel_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2001-01-01')
        """,
        "rel_orders_rollup": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "rel_users_per_event_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "rel_value_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 6) AS p25,
                   round(quantile_cont(value, 0.50), 6) AS p50,
                   round(quantile_cont(value, 0.75), 6) AS p75,
                   round(quantile_cont(value, 0.99), 6) AS p99,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "rel_event_pivot": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY 1
        """,
        "rel_event_unpivot": """
            WITH wide AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY 1
)
            SELECT day, 'click' AS event_type, n_click AS n FROM wide UNION ALL SELECT day, 'error' AS event_type, n_error AS n FROM wide UNION ALL SELECT day, 'purchase' AS event_type, n_purchase AS n FROM wide UNION ALL SELECT day, 'signup' AS event_type, n_signup AS n FROM wide UNION ALL SELECT day, 'view' AS event_type, n_view AS n FROM wide
        """,
        "rel_sessionize": """
            WITH e AS (
              SELECT *, epoch_us(ts) AS us FROM events
            ), flagged AS (
              SELECT *, CASE WHEN lag(us) OVER w IS NULL
                              OR us - lag(us) OVER w > 30*60*1000000
                         THEN 1 ELSE 0 END AS is_new
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ), sess AS (
              SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM flagged
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
            FROM sess GROUP BY user_id, session_id
        """,
        "rel_hourly_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "rel_asof_last_purchase": """
            WITH e AS (SELECT *, epoch_us(ts) AS us FROM events)
            SELECT event_id, user_id, event_type,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                   strftime(make_timestamp(
                     max(CASE WHEN event_type = 'purchase' THEN us END)
                       OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
                     '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts
            FROM e
        """,
    }
