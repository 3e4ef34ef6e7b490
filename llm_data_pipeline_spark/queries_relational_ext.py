"""Extended relational coverage: semi-joins, set ops, top-k, distinct aggs.

The reference has no relational surface at all (SURVEY.md §2.5/§2.9); these
queries pin the generic DataFrame/SQL capabilities a Spark-native engine
exposes for free, each against a DuckDB oracle. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.queries import query, table


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-07-01'
      AND o_orderdate < DATE '1995-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("relational", "semi-join"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: the lineitem side is pre-filtered
    before the join (returned items stand in for the late-delivery
    predicate, which the synthetic schema lacks), so the shuffle carries only
    qualifying orderkeys."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-07-01")
        & (F.col("o_orderdate") < "1995-10-01")
    )
    late = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "scan-agg"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-aggregate: every predicate pushes into the parquet scan,
    the aggregation is a single partial+final pair — the minimal-shuffle
    shape that should dominate any 100 TB fact-table query."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "lineitem_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    tags=("relational", "top-k"),
)
def lineitem_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition heaps then a k-row merge, never a full sort."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            "l_extendedprice",
        )
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
        .drop("l_extendedprice")
    )


@query(
    "orders_distinct_customers_by_status",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "distinct-agg"),
)
def orders_distinct_customers_by_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact distinct-count (two-phase expand under the hood). The
    approx_count_distinct variant is the 100 TB default; it is exercised in
    tests rather than here because HLL results are engine-specific."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "nations_setops_suppliers_customers",
    oracle="""
    WITH sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier),
         cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer)
    SELECT 'both' AS which, nationkey FROM (SELECT nationkey FROM sn INTERSECT SELECT nationkey FROM cn)
    UNION ALL
    SELECT 'customer_only' AS which, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
    ORDER BY which, nationkey
    """,
    tags=("relational", "set-ops"),
)
def nations_setops_suppliers_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INTERSECT / EXCEPT over nation keys — set operations the reference
    lacked entirely (SURVEY.md §2.5)."""
    sn = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    cn = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    both = sn.intersect(cn).select(F.lit("both").alias("which"), "nationkey")
    conly = cn.exceptAll(sn).select(
        F.lit("customer_only").alias("which"), "nationkey"
    )
    return both.unionByName(conly).orderBy("which", "nationkey")


@query(
    "events_asof_last_value",
    oracle="""
    WITH lefts AS (
      SELECT user_id, ts AS probe_ts, event_id
      FROM events WHERE event_type = 'purchase'
    ), rights AS (
      SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'view'
    )
    SELECT l.user_id, l.event_id,
           round(coalesce(r.value, -1.0), 3) AS last_view_value
    FROM lefts l
    ASOF LEFT JOIN rights r
      ON l.user_id = r.user_id AND r.ts <= l.probe_ts
    ORDER BY l.user_id, l.event_id
    """,
    tags=("relational", "asof-join", "custom-operator"),
)
def events_asof_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark has no built-in): for every
    purchase event, the value of that user's latest view at-or-before it.
    The oracle is DuckDB's native ASOF JOIN; the Spark side is the
    union+window construction in operators/asof.py."""
    from llm_data_pipeline_spark.operators.asof import asof_join

    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("probe_ts"), "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        views,
        left_key="user_id",
        right_key="user_id",
        left_ts="probe_ts",
        right_ts="ts",
        value_cols=["value"],
    )
    # unmatched lefts -> -1.0 sentinel (the driver's value-hash normalizes
    # NULL and NaN differently across engines, so nulls stay out of doubles)
    return joined.select(
        "user_id",
        "event_id",
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 3).alias(
            "last_view_value"
        ),
    ).orderBy("user_id", "event_id")


@query(
    "events_range_join_pairs",
    oracle="""
    SELECT a.user_id,
           a.event_id AS u, b.event_id AS v,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS dt_micros
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 120000000
    ORDER BY a.user_id, u, v
    """,
    tags=("relational", "range-join", "custom-operator"),
)
def events_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (custom operator): per-user event pairs within
    2 minutes of each other, via bucket-join instead of an O(n^2) per-key
    inequality join. Oracle is the direct inequality join in DuckDB."""
    from llm_data_pipeline_spark.operators.rangejoin import range_join_within

    e = table(spark, sf_dir, "events")
    pairs = range_join_within(
        e, key_col="user_id", ts_col="ts", band_micros=120_000_000,
        id_col="event_id",
    )
    return pairs.select("user_id", "u", "v", "dt_micros").orderBy(
        "user_id", "u", "v"
    )


@query(
    "supplier_part_grouping_sets",
    oracle="""
    SELECT coalesce(p_brand, 'ALL') AS mfgr,
           coalesce(p_type, 'ALL') AS container,
           count(*) AS n_parts,
           round(avg(p_retailprice), 3) AS avg_price
    FROM part
    GROUP BY GROUPING SETS ((p_brand, p_type), (p_brand), ())
    ORDER BY mfgr, container
    """,
    tags=("relational", "grouping-sets"),
)
def supplier_part_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (subsumes rollup) — one shuffle with an Expand node,
    not three scans."""
    p = table(spark, sf_dir, "part")
    return (
        p.groupingSets(
            [["p_brand", "p_type"], ["p_brand"], []],
            "p_brand",
            "p_type",
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 3).alias("avg_price"),
        )
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("mfgr"),
            F.coalesce("p_type", F.lit("ALL")).alias("container"),
            "n_parts",
            "avg_price",
        )
        .orderBy("mfgr", "container")
    )


@query(
    "scalar_function_gallery",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderstatus, 1, 1)) AS status_u,
           length(o_orderpriority) AS prio_len,
           CAST(replace(o_orderpriority, '-', '_') AS VARCHAR) AS prio_norm,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(extract(dow FROM o_orderdate) AS BIGINT) AS order_dow,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
           round(sqrt(o_totalprice), 4) AS price_sqrt,
           round(ln(o_totalprice + 1), 6) AS price_ln,
           round(pow(o_totalprice, 0.25), 6) AS price_pow,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
           abs(CAST(o_custkey AS BIGINT) - 750) AS cust_dist,
           o_custkey % 7 AS cust_mod,
           concat(o_orderstatus, ':', o_orderpriority) AS status_tag
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    tags=("relational", "scalar-functions"),
)
def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar-function gallery (SURVEY.md §2.9: a library
    the reference lacks entirely; every expression is engine-native and
    must agree cross-engine bit-for-bit or to fixed rounding)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderstatus", 1, 1)).alias("status_u"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias(
            "prio_norm"
        ),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.year("o_orderdate").cast("long").alias("order_year"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("o_totalprice", F.lit(0.25)), 6).alias("price_pow"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k"),
        F.abs(F.col("o_custkey") - 750).alias("cust_dist"),
        (F.col("o_custkey") % 7).alias("cust_mod"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("status_tag"),
    ).orderBy("o_orderkey")


@query(
    "events_pivot_type_by_hour",
    oracle="""
    SELECT CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    ORDER BY hour_of_day
    """,
    tags=("relational", "pivot"),
)
def events_pivot_type_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event-type counts fanned out to columns per hour-of-day.
    Explicit pivot values keep the plan single-pass (no extra distinct
    scan) and the output schema static."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.hour("ts").alias("hour_of_day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("hour_of_day")
    )


@query(
    "events_from_json_typed",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
    """,
    tags=("relational", "json"),
)
def events_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: from_json into a typed struct (vs the
    path-extraction twin events_json_extract), then typed aggregation."""
    e = table(spark, sf_dir, "events")
    parsed = e.withColumn(
        "props_s", F.from_json("props", "k INT")
    )
    return (
        parsed.groupBy((F.col("props_s.k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("props_s.k").alias("k_sum"))
        .orderBy("k_bucket")
    )
