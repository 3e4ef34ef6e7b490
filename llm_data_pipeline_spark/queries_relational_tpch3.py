"""Third wave of TPC-H-style relational queries — the 10 shapes the first two
waves didn't cover, completing the 22-query suite (SURVEY.md §2.9).

Adapted to the driver's synthetic star schema: there is no ``partsupp``
table, so queries that need the part↔supplier relation (q2/q11/q16/q20)
derive it as ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` — at
scale this is one shuffle on (partkey, suppkey) and is reused per query.
Missing columns are stood in for by semantically-equivalent ones
(``l_linestatus`` for l_shipmode, ``s_acctbal < 0`` for supplier
complaints, ``p_retailprice``-derived cost for ps_supplycost,
``l_shipdate - o_orderdate`` lateness for commit/receipt lag).

Determinism policy follows queries.py: money sums go through
DECIMAL(18,4) so both engines add exactly, then round(2) to double;
count/int aggregates stay BIGINT; quantity averages are computed in
DECIMAL so threshold comparisons are engine-independent.

Plan shapes for 100 TB: the lineitem scan carries every pushable filter,
dimension sides broadcast, correlated subqueries become window functions
(one shuffle, no re-scan), and scalar aggregate subqueries become a
1-row broadcast crossJoin instead of a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.queries import query, table


def _money(col):
    """Exact-addition revenue term: DECIMAL(18,4) product."""
    return col.cast("decimal(18,4)")


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived part↔supplier relation (reference has no partsupp table).

    One distinct over (l_partkey, l_suppkey): a single shuffle whose
    width is bounded by |part|×|suppliers-per-part|, not |lineitem|.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size = 15 AND p.p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM (
      SELECT *, max(s_acctbal) OVER (PARTITION BY p_partkey) AS best_bal
      FROM cand
    )
    WHERE s_acctbal = best_bal
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("relational", "join", "window"),
)
def tpch_q2(spark: SparkSession, sf_dir: str):
    """Best-account-balance supplier per part in a region (Q2 shape).

    The reference's correlated MIN(ps_supplycost) subquery becomes a
    window max over p_partkey — one shuffle on partkey instead of a
    second scan+join of the partsupp relation.
    """
    ps = _partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("best_bal", F.max("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("best_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8_national_market_share",
    oracle="""
    WITH purchases AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(round(
             CAST(round(sum(CASE WHEN supp_nation = 'NATION_5'
                                 THEN volume ELSE 0 END), 2) AS DOUBLE)
             / CAST(round(sum(volume), 2) AS DOUBLE), 6) AS DOUBLE)
             AS mkt_share
    FROM purchases
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("relational", "join", "agg"),
)
def tpch_q8(spark: SparkSession, sf_dir: str):
    """NATION_5's share of ASIA's ECONOMY-part purchase volume by year (Q8).

    Both sums are exact decimals rounded before the double division, so
    the share is bit-identical across engines regardless of add order.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = table(spark, sf_dir, "supplier")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nation_vol = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )),
        2,
    ).cast("double")
    total_vol = F.round(F.sum("volume"), 2).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(F.round(nation_vol / total_vol, 6).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  - p.p_retailprice * 0.1 * l.l_quantity
                  AS DECIMAL(18,4)) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_type = 'PROMO'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "join", "agg"),
)
def tpch_q9(spark: SparkSession, sf_dir: str):
    """Profit on PROMO parts by supplier nation and year (Q9 shape).

    ps_supplycost is stood in by 10% of p_retailprice (the schema has no
    partsupp); the join tree keeps lineitem⋈orders as the only
    fact-fact shuffle, everything else broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = _money(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_part_values",
    oracle="""
    WITH natps AS (
      SELECT l.l_partkey,
             CAST(l.l_extendedprice AS DECIMAL(18,4)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    byp AS (
      SELECT l_partkey AS p_partkey,
             CAST(round(sum(val), 2) AS DOUBLE) AS part_value
      FROM natps GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(round(sum(val), 2) AS DOUBLE) AS total_value FROM natps
    )
    SELECT p_partkey, part_value
    FROM byp, tot
    WHERE part_value > 0.002 * total_value
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("relational", "agg", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str):
    """Parts representing a significant share of one nation's supply value
    (Q11 shape: grouped sum filtered by a scalar-aggregate threshold).

    The scalar total is a 1-row aggregate broadcast-crossJoined onto the
    grouped frame — no driver collect, no second scan of lineitem
    (Spark reuses the shuffled natps exchange for both aggregations).
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    natps = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "l_partkey", F.col("l_extendedprice").cast("decimal(18,4)").alias("val")
        )
    )
    byp = natps.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.round(F.sum("val"), 2).cast("double").alias("part_value")
    )
    tot = natps.agg(
        F.round(F.sum("val"), 2).cast("double").alias("total_value")
    )
    return (
        byp.crossJoin(F.broadcast(tot))
        .where(F.col("part_value") > 0.002 * F.col("total_value"))
        .select("p_partkey", "part_value")
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("relational", "join", "agg"),
)
def tpch_q12(spark: SparkSession, sf_dir: str):
    """Late shipments split by order priority (Q12 shape).

    l_linestatus stands in for l_shipmode and shipdate-vs-orderdate lag
    for the commit/receipt columns the schema lacks. Pure integer
    aggregates — no float determinism concerns.
    """
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 10, 20, 30, 40, 49)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("relational", "agg", "antijoin"),
)
def tpch_q16(spark: SparkSession, sf_dir: str):
    """Distinct supplier counts per (brand, type, size) excluding flagged
    suppliers (Q16 shape; negative account balance stands in for the
    complaints predicate).

    The NOT IN is a broadcast left-anti join (the flagged-supplier list
    is tiny at any scale); count(DISTINCT) shuffles once on the group
    keys.
    """
    ps = _partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 10, 20, 30, 40, 49)
    )
    flagged = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(flagged), ps.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH branded AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23'
    )
    SELECT CAST(round(CAST(round(sum(l_extendedprice), 2) AS DOUBLE) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM (
      SELECT *,
             avg(CAST(l_quantity AS DECIMAL(18,2)))
               OVER (PARTITION BY l_partkey) AS avg_qty
      FROM branded
    )
    WHERE CAST(l_quantity AS DECIMAL(18,2)) < 0.5 * avg_qty
    """,
    tags=("relational", "window", "agg"),
)
def tpch_q17(spark: SparkSession, sf_dir: str):
    """Average yearly revenue lost if small-quantity orders stopped (Q17).

    The per-part correlated AVG subquery is a window average — one
    shuffle on l_partkey, no second scan. Quantities are compared in
    DECIMAL so the 0.5×avg threshold is engine-exact; the final revenue
    sum goes through DECIMAL then a rounded double division.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price"),
    )
    w = Window.partitionBy("l_partkey")
    return (
        branded.withColumn("avg_qty", F.avg("qty").over(w))
        .where(F.col("qty") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.round(F.round(F.sum("price"), 2).cast("double") / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("relational", "join", "filter"),
)
def tpch_q19(spark: SparkSession, sf_dir: str):
    """Revenue from three brand/size/quantity bands (Q19 shape: a
    disjunction of conjunctions spanning both join sides).

    The part-side disjunction (brand, size) prunes the broadcast build
    side; the lineitem quantity bounds (1..30 overall) are pushed into
    the scan, and the full OR is evaluated post-join in codegen.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    p_pruned = p.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 15)
    )
    return (
        li.where(F.col("l_quantity").between(1, 30))
        .join(F.broadcast(p_pruned), li.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.round(
                F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q20_excess_stock_suppliers",
    oracle="""
    WITH psq AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    thresh AS (SELECT 1.5 * avg(qty) AS t FROM psq),
    small_parts AS (SELECT p_partkey FROM part WHERE p_type = 'SMALL'),
    heavy AS (
      SELECT DISTINCT psq.l_suppkey
      FROM psq, thresh
      WHERE psq.qty > thresh.t
        AND psq.l_partkey IN (SELECT p_partkey FROM small_parts)
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_name
    """,
    tags=("relational", "semijoin", "subquery"),
)
def tpch_q20(spark: SparkSession, sf_dir: str):
    """Suppliers in a region who moved outsized volumes of SMALL parts in
    1996 (Q20 shape: a semi-join chain gated by a scalar-aggregate
    threshold).

    Quantity sums and the 1.5×avg threshold are DECIMAL-exact on both
    engines, so the heavy-supplier set is deterministic. The heavy set
    semi-joins (left_semi) onto supplier — nothing wider than supplier
    rows ever shuffles.
    """
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    psq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    thresh = psq.agg((F.lit(1.5) * F.avg("qty")).alias("t"))
    small = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    heavy = (
        psq.join(F.broadcast(small), psq.l_partkey == small.p_partkey, "left_semi")
        .crossJoin(F.broadcast(thresh))
        .where(F.col("qty") > F.col("t"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH marked AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    by_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
               AS n_late,
             max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      FROM marked GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM by_order b
    JOIN supplier s ON s.s_suppkey = b.late_supp
    WHERE b.n_supp > 1 AND b.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("relational", "agg", "join"),
)
def tpch_q21(spark: SparkSession, sf_dir: str):
    """Suppliers who alone delayed a multi-supplier finalized order (Q21).

    The reference shape's EXISTS / NOT EXISTS self-joins collapse into
    two stacked aggregations: per (order, supplier) — did this supplier
    ship anything late — then per order (supplier count, late count,
    the sole late supplier). Mixing countDistinct with max in one agg
    would trigger an Expand that triples the fact rows through the
    map-side partials; the two-level form keeps every row single-width.
    Integer-only output.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    marked = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
        ).alias("is_late"),
    )
    per_supp = marked.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("supp_late")
    )
    by_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late"),
        F.max(F.when(F.col("supp_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    s = table(spark, sf_dir, "supplier")
    return (
        by_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
