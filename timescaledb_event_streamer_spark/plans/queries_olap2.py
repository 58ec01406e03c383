"""OLAP benchmark queries, part 2 (SURVEY.md §2.C, C7-C16) — the
remaining TPC-H query shapes adapted to the driver's star schema
(there is no partsupp table and lineitem has no
commitdate/receiptdate/shipmode, so predicates are re-targeted onto
existing columns while keeping each query's *plan shape*: the
EXISTS semi-join of Q4, the double-nation join of Q7, the
market-share CASE ratio of Q8, the groupwise-average correlated
shape of Q17, the disjunctive pushdown of Q19, the NOT EXISTS
anti-join + scalar subquery of Q22, …).

Scale posture: nation/region always broadcast (metadata-sized at
every SF); part (fact-scale in real TPC-H) joins hash-wise on
partkey and is left to AQE to broadcast when a filter makes it
small; lineitem⋈orders always shuffles on orderkey — the one
unavoidable fact-to-fact shuffle — and groupwise-aggregate shapes
(Q15/Q17/Q18) reuse that same key so the exchange is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load


@register(
    "q4_order_priority",
    family="olap",
    doc="TPC-H Q4 shape: EXISTS semi-join (orders with a late-shipped "
    "lineitem), count by priority. Semi-join on orderkey — no row "
    "multiplication, map-side distinct on the probe side.",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            how="left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    family="olap",
    doc="TPC-H Q7 shape: nation joined twice (supplier side + customer "
    "side), both broadcast; revenue by nation pair and ship year",
    oracle="""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    family="olap",
    doc="TPC-H Q8 shape: market share of one supplier nation within a "
    "customer region, conditional-sum ratio per year",
    oracle="""
        SELECT year(o.o_orderdate) AS o_year,
               round(
                 sum(CASE WHEN sn.n_name = 'NATION_3'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY year(o.o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p.select("p_partkey"), li["l_partkey"] == F.col("p_partkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    family="olap",
    doc="TPC-H Q9 shape (no partsupp → cost modeled from p_retailprice): "
    "profit by supplier nation and order year for matching parts",
    oracle="""
        SELECT n.n_name AS nation,
               year(o.o_orderdate) AS o_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity * 0.1), 2) AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(p.select("p_partkey", "p_retailprice"), li["l_partkey"] == F.col("p_partkey"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


@register(
    "q14_promo_revenue",
    family="olap",
    doc="TPC-H Q14: promo revenue share for one ship month; part joins "
    "on partkey (AQE-broadcast when filtered side fits)",
    oracle="""
        SELECT round(
                 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    family="olap",
    doc="TPC-H Q15: supplier(s) with max quarterly revenue — groupwise "
    "agg then broadcast scalar-max join (no global window)",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # scalar max via single-row broadcast cross join — avoids the
    # all-to-one-partition global window at scale
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"])
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    family="olap",
    doc="TPC-H Q16 shape (lineitem as the part↔supplier link): distinct "
    "supplier count per (brand, type, size) excluding one brand",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#9'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9") & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p.select("p_partkey", "p_brand", "p_type", "p_size"),
                li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    family="olap",
    doc="TPC-H Q17: correlated groupwise-average — lineitem rows below "
    "half their part's average quantity; the per-part avg reuses the "
    "partkey shuffle of the main join",
    oracle="""
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (
            SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
            FROM lineitem GROUP BY l_partkey
        ) a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13' AND l.l_quantity < a.half_avg
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(p.select("p_partkey"), li["l_partkey"] == F.col("p_partkey"))
        .join(avg_q, li["l_partkey"] == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "q19_discount_revenue",
    family="olap",
    doc="TPC-H Q19 shape: disjunctive brand/size/quantity predicate — "
    "the OR-of-ANDs stays a single scan + join, no union",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity >= 10 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q22_global_sales_opportunity",
    family="olap",
    doc="TPC-H Q22 shape: anti-join (customers with no recent orders) against a "
    "broadcast scalar-avg threshold, grouped by nation",
    oracle="""
        WITH thr AS (
            SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey,
               count(*) AS numcust,
               round(sum(c.c_acctbal), 2) AS totacctbal
        FROM customer c, thr
        WHERE c.c_acctbal > thr.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        c.join(F.broadcast(thr), c["c_acctbal"] > thr["avg_bal"])
        .join(o, c["c_custkey"] == o["o_custkey"], how="left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q12_late_shipment_priority",
    family="olap",
    doc="TPC-H Q12 shape (no shipmode/receiptdate columns: lateness class "
    "from shipdate-vs-orderdate lag instead of shipmode): high/low "
    "priority order counts per lateness class. One fact-fact shuffle on "
    "orderkey, all aggregation map-side partial.",
    oracle="""
        SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 'late' ELSE 'ontime' END AS ship_class,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                F.lit("late"),
            ).otherwise(F.lit("ontime")),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    family="olap",
    doc="TPC-H Q13: distribution of order counts per customer including "
    "zero-order customers (left join + double aggregation; the second "
    "agg shuffles only #distinct-counts rows)",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ) cc
        GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q21_suppliers_who_kept_orders_waiting",
    family="olap",
    doc="TPC-H Q21 shape (lateness = shipped >60 days after order date): "
    "suppliers that were the sole late supplier on a multi-supplier "
    "finished order — semi-join (another supplier exists) + anti-join "
    "(no OTHER late supplier). All three probes share the orderkey "
    "shuffle key.",
    oracle="""
        WITH late AS (
            SELECT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        SELECT s.s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        )
        GROUP BY s.s_name
    """,
)
def q21_suppliers_who_kept_orders_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    s = load(spark, sf_dir, "supplier")
    qualified = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        how="left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        how="left_anti",
    )
    return (
        qualified.join(s, F.col("l1.l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q2_min_cost_supplier",
    family="olap",
    doc="TPC-H Q2 shape (no partsupp: lineitem links part-supplier, "
    "s_acctbal as the cost proxy): for each EUROPE-region part of size "
    "30, the supplier(s) with the region-min account balance — "
    "correlated per-group min via a groupwise agg joined back on the "
    "same key (the shuffle is shared), nation/region broadcast.",
    oracle="""
        WITH links AS (
            SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
            FROM lineitem l
        ),
        eligible AS (
            SELECT k.partkey, k.suppkey, s.s_acctbal, s.s_name, n.n_name
            FROM links k
            JOIN part p ON p.p_partkey = k.partkey AND p.p_size = 30
            JOIN supplier s ON s.s_suppkey = k.suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
        ),
        mn AS (
            SELECT partkey, min(s_acctbal) AS min_bal FROM eligible GROUP BY partkey
        )
        SELECT e.partkey AS p_partkey, e.suppkey AS s_suppkey,
               e.s_name, e.n_name, e.s_acctbal
        FROM eligible e
        JOIN mn ON e.partkey = mn.partkey AND e.s_acctbal = mn.min_bal
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 30).select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        li.join(p, li["partkey"] == p["p_partkey"])
        .join(s, li["suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("partkey", "suppkey", "s_acctbal", "s_name", "n_name")
    )
    mn = eligible.groupBy(F.col("partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        eligible.join(
            mn,
            (eligible["partkey"] == mn["m_partkey"])
            & (eligible["s_acctbal"] == mn["min_bal"]),
        )
        .select(
            F.col("partkey").alias("p_partkey"),
            F.col("suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            "s_acctbal",
        )
    )


@register(
    "q11_important_stock",
    family="olap",
    doc="TPC-H Q11 shape (value = lineitem extendedprice by supplier "
    "nation): partkeys whose value within one nation exceeds a fraction "
    "of that nation's total — HAVING vs a broadcast scalar subquery.",
    oracle="""
        WITH v AS (
            SELECT l.l_partkey, sum(l.l_extendedprice) AS val
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_1'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, round(val, 2) AS value
        FROM v
        WHERE val > (SELECT sum(val) * 0.001 FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    v = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    thr = v.agg((F.sum("val") * 0.001).alias("thr"))
    return (
        v.join(F.broadcast(thr), v["val"] > thr["thr"])
        .select("l_partkey", F.round("val", 2).alias("value"))
    )
