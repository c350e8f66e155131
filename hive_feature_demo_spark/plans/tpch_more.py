"""Remaining TPC-H query shapes expressible on the driver star schema.

Adaptations are forced only by absent columns (no ``partsupp`` table, no
``o_shippriority``/``c_phone``/``l_commitdate``): Q3 keeps the mktsegment +
two-sided date predicate + grouped top-k; Q10 the returned-items quarter
report; Q18 the HAVING-subquery large-volume scan; Q22 the above-average-
balance dormant-customer anti join (dormancy = no order since a cutoff,
since every customer here has at least one order ever).

Scale shapes: dimensions broadcast (customer/nation at 100 TB: customer is
bucketable on the join key instead — see q120); lineitem<->orders co-shuffle
on orderkey; money sums are scaled-long fixed point (order-independent at
1000 executors); every top-k carries full tiebreaks so results are
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import (
    exact_avg,
    exact_sum_fixed,
    sql_exact_avg,
    sql_exact_sum_fixed,
)
from hive_feature_demo_spark.plans.registry import register

#: revenue expression used by Q3/Q10: extendedprice * (1 - discount) has 4
#: decimal digits exactly (2dp price x 2dp discount), so the scaled-long
#: path is lossless.
_REV_SQL = sql_exact_sum_fixed("l.l_extendedprice * (1 - l.l_discount)", 4)


def _revenue_col():
    return exact_sum_fixed(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
    )


# ---------------------------------------------------------------------------
# q123 — TPC-H Q3 (shipping priority): one mktsegment, orders placed before
# the cutoff with lines shipped after it, top-10 open-revenue orders.
# ---------------------------------------------------------------------------


@register(
    "q123_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {_REV_SQL} AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-06-01'
      AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, order_date, l.l_orderkey
    LIMIT 10
    """,
    category="relational",
)
def q123_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(_revenue_col())
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "order_date", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q124 — TPC-H Q10 (returned items): customers who returned goods in a
# quarter, ranked by lost revenue; nation broadcast onto the winner set.
# ---------------------------------------------------------------------------


@register(
    "q124_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_REV_SQL} AS revenue,
           c.c_acctbal, n.n_name AS nation_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1998-01-01'
      AND o.o_orderdate < DATE '1998-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    category="relational",
)
def q124_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-04-01")
    ).select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation_name")
        .agg(_revenue_col())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q125 — TPC-H Q18 (large-volume customers): orders whose total quantity
# exceeds a threshold, found with a grouped-HAVING semi join (the IN
# subquery decorrelates to an aggregate + semi join — one extra shuffle on
# orderkey, which the main join already needs).
# ---------------------------------------------------------------------------


@register(
    "q125_large_volume_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice,
           {sql_exact_sum_fixed('l.l_quantity', 2)} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE),
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    category="relational",
)
def q125_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(exact_sum_fixed("l_quantity", 2, "qty_sum"))
        .filter(F.col("qty_sum") > 300)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "big_key"),
               F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .agg(exact_sum_fixed("l_quantity", 2, "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q126 — TPC-H Q22 shape (dormant high-balance customers): balance above
# the global positive-balance average (exact-decimal scalar so the cut is
# engine-independent) AND no order since the cutoff (null-safe anti join).
# Per-nation rollup stands in for Q22's phone-prefix grouping (no c_phone).
# ---------------------------------------------------------------------------


@register(
    "q126_dormant_high_balance",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_exact_avg('c_acctbal')} AS threshold
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= DATE '2000-01-01'
    )
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           {sql_exact_sum_fixed('c.c_acctbal', 2)} AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    category="relational",
)
def q126_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name")
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(exact_avg("c_acctbal", "threshold"))
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select(
        "o_custkey"
    ).distinct()
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("nation_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum_fixed("c_acctbal", 2, "total_balance"),
        )
        .orderBy("nation_name")
    )
