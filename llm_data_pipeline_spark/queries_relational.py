"""Generic relational query surface (SURVEY.md §2.9).

TPC-H-style analytics over the synthetic star schema plus event-stream
queries. These exist to prove the engine exposes plain DataFrame/SQL
alongside the pipeline operators; each is written so Catalyst broadcasts
the small dimensions and pushes filters/projections into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.intmath import rounded_div_sql
from llm_data_pipeline_spark.queries import query, table


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregation"),
)
def tpch_q1(spark: SparkSession, sf_dir: str):
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("relational", "join"),
)
def tpch_q3(spark: SparkSession, sf_dir: str):
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    # customer is tiny relative to lineitem at every sf: broadcast it so the
    # customer⋈orders join is shuffle-free; orders⋈lineitem shuffles on the
    # orderkey only after both sides were filtered (predicate pushdown).
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("relational", "join"),
)
def tpch_q5(spark: SparkSession, sf_dir: str):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # dims (region/nation/supplier/customer) all broadcast; only the
    # orders⋈lineitem join shuffles — the right shape at 100 TB where
    # lineitem dominates.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 3
    ORDER BY o_custkey, rk
    """,
    tags=("relational", "window"),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    tags=("relational", "anti-join"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "part_type_rollup",
    oracle="""
    SELECT coalesce(p_brand, 'ALL') AS brand,
           coalesce(p_type,  'ALL') AS ptype,
           count(*)                 AS n_parts,
           round(avg(p_retailprice), 4) AS avg_price
    FROM part
    GROUP BY ROLLUP (p_brand, p_type)
    ORDER BY brand, ptype
    """,
    tags=("relational", "rollup"),
)
def part_type_rollup(spark: SparkSession, sf_dir: str):
    p = table(spark, sf_dir, "part")
    return (
        p.rollup("p_brand", "p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce("p_type", F.lit("ALL")).alias("ptype"),
            "n_parts",
            "avg_price",
        )
        .orderBy("brand", "ptype")
    )


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           count(*)                    AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 3)        AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
    tags=("relational", "events", "aggregation"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("relational", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str):
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           round(sum(value), 3) AS session_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("relational", "events", "window"),
)
def events_sessionization(spark: SparkSession, sf_dir: str):
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the batch equivalent of a streaming session window."""
    from llm_data_pipeline_spark.functions.time import epoch_us

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(e, "ts")
    gap = us - F.lag(us).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(w2))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "events_dwell_transition_stats",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT from_type, event_type AS to_type,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           {rounded_div_sql('CAST(sum(gap_us) AS BIGINT)', 'count(*)')}
             AS avg_gap_us
    FROM seq
    WHERE from_type IS NOT NULL AND gap_us <= 7200000000
    GROUP BY from_type, event_type
    ORDER BY from_type, to_type
    """,
    tags=("relational", "events", "window", "analytics"),
)
def events_dwell_transition_stats(spark: SparkSession, sf_dir: str):
    """User-journey dwell analysis: for every consecutive event pair per
    user (lag window over (ts, event_id)), the transition (from_type ->
    to_type) and its dwell gap in exact integer microseconds; per
    transition edge, count / min / max and the exact-integer rounded
    average (gaps over 2h are dropped as session breaks — the bound is
    explicit in the predicate). This is the event-stream counterpart of
    funnel conversion: it weighs the edges of the journey graph. One
    window + one aggregate; all arithmetic BIGINT."""
    from llm_data_pipeline_spark.functions.intmath import rounded_div_col
    from llm_data_pipeline_spark.functions.time import epoch_us

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(e, "ts")
    seq = e.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
        (us - F.lag(us).over(w)).cast("long").alias("gap_us"),
    ).where(
        F.col("from_type").isNotNull() & (F.col("gap_us") <= 7_200_000_000)
    )
    return (
        seq.groupBy("from_type", "to_type")
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.sum("gap_us").cast("long").alias("_sum"),
        )
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            "min_gap_us",
            "max_gap_us",
            rounded_div_col(F.col("_sum"), F.col("n_transitions")).alias(
                "avg_gap_us"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "event_sequence_training_pairs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type,
             list(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS ctx
      FROM events
    )
    SELECT user_id, event_id,
           coalesce(array_to_string(ctx, ' '), '') AS context,
           event_type AS target,
           CAST(coalesce(len(ctx), 0) AS INT) AS n_context
    FROM seq WHERE coalesce(len(ctx), 0) >= 1
    ORDER BY user_id, event_id
    """,
    tags=("relational", "events", "training"),
)
def event_sequence_training_pairs(spark: SparkSession, sf_dir: str):
    """Next-event-prediction training pairs from the event log: per user,
    (last <=3 event types as context, current type as target) — the
    sequence-model example constructor. One window over (user, ts) with a
    bounded ROWS frame: state per row is O(context), the shuffle is the
    same user-keyed exchange sessionization already pays, and context
    order is deterministic because the ordering key (ts, event_id) is
    unique."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, -1)
    )
    staged = e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("target"),
        F.collect_list("event_type").over(w).alias("_ctx"),
    )
    return (
        staged.where(F.size("_ctx") >= 1)
        .select(
            "user_id",
            "event_id",
            F.array_join("_ctx", " ").alias("context"),
            "target",
            F.size("_ctx").alias("n_context"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t_view,
             min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    ),
    reach AS (
      SELECT user_id,
             CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view
                  THEN 1 ELSE 0 END AS s2,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click
                  THEN 1 ELSE 0 END AS s3
      FROM firsts
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(s1) AS BIGINT) AS r1,
             CAST(sum(s2) AS BIGINT) AS r2,
             CAST(sum(s3) AS BIGINT) AS r3
      FROM reach
    )
    SELECT stage, reached,
           CAST(CASE WHEN prev >= 0
                THEN (reached * 1000000 + prev // 2) // greatest(prev, 1)
                ELSE 0 END AS BIGINT) AS conversion_ppm
    FROM (
      SELECT 'stage1_view' AS stage, r1 AS reached, n_users AS prev FROM agg
      UNION ALL
      SELECT 'stage2_click_after_view', r2, r1 FROM agg
      UNION ALL
      SELECT 'stage3_purchase_after_click', r3, r2 FROM agg
    ) ORDER BY stage
    """,
    tags=("relational", "events", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str):
    """Ordered funnel analysis (view -> click-after-view ->
    purchase-after-click): per user the FIRST timestamp of each stage,
    stage k counts only when it strictly follows stage k-1 — the
    time-ordering constraint a naive per-type count ignores. One
    conditional-min aggregation per user (no self-joins, no explode),
    then a 3-row rollup with per-stage conversion in ppm."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    agg = firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(s1.cast("int")).cast("long").alias("r1"),
        F.sum(s2.cast("int")).cast("long").alias("r2"),
        F.sum(s3.cast("int")).cast("long").alias("r3"),
    )
    rows = (
        agg.select(
            F.lit("stage1_view").alias("stage"),
            F.col("r1").alias("reached"),
            F.col("n_users").alias("prev"),
        )
        .unionByName(
            agg.select(
                F.lit("stage2_click_after_view").alias("stage"),
                F.col("r2").alias("reached"),
                F.col("r1").alias("prev"),
            )
        )
        .unionByName(
            agg.select(
                F.lit("stage3_purchase_after_click").alias("stage"),
                F.col("r3").alias("reached"),
                F.col("r2").alias("prev"),
            )
        )
    )
    from llm_data_pipeline_spark.functions.intmath import rounded_div_col

    return rows.select(
        "stage",
        "reached",
        rounded_div_col(
            F.col("reached") * F.lit(1_000_000).cast("long"),
            F.greatest(F.col("prev"), F.lit(1).cast("long")),
        ).alias("conversion_ppm"),
    ).orderBy("stage")


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS act_day
      FROM events
    ),
    joined AS (
      SELECT f.cohort_day,
             date_diff('day', f.cohort_day, a.act_day) AS day_offset,
             a.user_id
      FROM firsts f JOIN activity a USING (user_id)
      WHERE date_diff('day', f.cohort_day, a.act_day) BETWEEN 0 AND 7
    ),
    sizes AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_day
    ),
    ret AS (
      SELECT j.cohort_day, CAST(j.day_offset AS INT) AS day_offset,
             CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_users
      FROM joined j GROUP BY 1, 2
    )
    SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
           r.day_offset, r.n_users, s.cohort_size,
           CAST((r.n_users * 1000000 + s.cohort_size // 2) // s.cohort_size
                AS BIGINT) AS retention_ppm
    FROM ret r JOIN sizes s USING (cohort_day)
    ORDER BY r.cohort_day, r.day_offset
    """,
    tags=("relational", "events", "cohorts"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str):
    """Cohort retention: users grouped by first-seen day, distinct-active
    share at day offsets 0..7 — the user-analytics staple, shaped for
    scale: one min-aggregation for cohorts, one distinct projection for
    activity, a user-keyed join, and an offset rollup; nothing quadratic,
    nothing collected."""
    from llm_data_pipeline_spark.functions.intmath import rounded_div_col

    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("act_day")
    ).distinct()
    joined = firsts.join(activity, "user_id").select(
        "cohort_day",
        F.datediff("act_day", "cohort_day").alias("day_offset"),
        "user_id",
    ).where(F.col("day_offset").between(0, 7))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
    return (
        ret.join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_users",
            "cohort_size",
            rounded_div_col(
                F.col("n_users") * F.lit(1_000_000).cast("long"),
                F.col("cohort_size"),
            ).alias("retention_ppm"),
        )
        .orderBy("cohort_day", "day_offset")
    )


_THS_TRAIN_PPM = 700_000  # time axis split: first 70% train
_THS_VAL_PPM = 850_000    # next 15% val, rest test


@query(
    "events_temporal_holdout_split",
    oracle=f"""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
    ),
    cuts AS (
      SELECT t0, t1,
             t0 + ((t1 - t0) * {_THS_TRAIN_PPM}) // 1000000 AS c_train,
             t0 + ((t1 - t0) * {_THS_VAL_PPM}) // 1000000 AS c_val
      FROM bounds
    ),
    labeled AS (
      SELECT CASE WHEN epoch_us(e.ts) <= c.c_train THEN 'train'
                  WHEN epoch_us(e.ts) <= c.c_val THEN 'val'
                  ELSE 'test' END AS split,
             e.user_id, e.ts
      FROM events e CROSS JOIN cuts c
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
    FROM labeled
    GROUP BY split
    ORDER BY split
    """,
    tags=("relational", "events", "split", "curation"),
)
def events_temporal_holdout_split(spark: SparkSession, sf_dir: str):
    """Temporal holdout split — the split an EVENT/sequence model must
    use (a hashed-id split leaks the future into training): the time axis
    cuts at 70%/85% of the [min, max] event-time span (exact integer
    microsecond arithmetic on the boundaries, floor-div — no float ever
    touches a cut), events label train/val/test by their timestamp, and
    the manifest reports per-split volumes, user reach, and the actual
    time ranges (ISO strings — DATE/TIMESTAMP canonicalize differently
    across engines, strings do not). One two-value aggregate broadcast
    into a narrow labeling map + one rollup."""
    from llm_data_pipeline_spark.functions.time import epoch_us

    e = table(spark, sf_dir, "events")
    us = epoch_us(e, "ts")
    bounds = e.agg(
        F.min(us).alias("t0"), F.max(us).alias("t1")
    ).select(
        "t0",
        "t1",
        (
            F.col("t0")
            + F.expr(f"((t1 - t0) * {_THS_TRAIN_PPM}) div 1000000")
        ).alias("c_train"),
        (
            F.col("t0")
            + F.expr(f"((t1 - t0) * {_THS_VAL_PPM}) div 1000000")
        ).alias("c_val"),
    )
    labeled = e.crossJoin(F.broadcast(bounds)).select(
        F.when(us <= F.col("c_train"), F.lit("train"))
        .when(us <= F.col("c_val"), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "user_id",
        "ts",
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "min_ts"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "max_ts"
            ),
        )
        .orderBy("split")
    )
