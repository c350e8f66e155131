"""The remaining classic TPC-H query shapes (Q2/Q4/Q6/Q8/Q9/Q11/Q12/Q14/
Q15/Q16/Q19/Q21) adapted to the driver star schema.

The schema has no ``partsupp`` table and no ``l_commitdate`` /
``l_receiptdate`` / ``l_shipmode`` / ``p_container`` columns, so shapes
that need them are re-expressed on what exists while keeping the plan
structure that makes each query a distinct optimizer exercise:

- Q2's correlated-min subquery -> supply costs derived from lineitem
  (min observed unit price per (part, supplier)), window-min per part.
- Q4's EXISTS  -> late shipment = shipped >60 days after order date.
- Q21's EXISTS + NOT EXISTS -> sole-late-shipper on the same definition.
- Q12's shipmode buckets -> ship-delay buckets.
- Q9's ps_supplycost -> 80% of p_retailprice as the unit cost proxy.
- Q11's stock value -> lineitem-observed sales value per part.

Scale shapes (100 TB audit): part/supplier/nation/region are broadcast
dims; every lineitem<->orders join co-shuffles on orderkey; the Q2/Q15
"equal to the group min/max" filters use one window over the already-
shuffled key rather than a join-back (no second shuffle); Q21's
exists/not-exists are semi/anti joins on orderkey with the supplier
inequality as a residual condition — no cross join anywhere. Money sums
use the scaled-long exact path (order-independent under any
partitioning; see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import (
    exact_avg,
    exact_sum_fixed,
    sql_exact_sum_fixed,
)
from hive_feature_demo_spark.plans.registry import register

_REV_SQL = sql_exact_sum_fixed("l.l_extendedprice * (1 - l.l_discount)", 4)


def _revenue_col():
    return exact_sum_fixed(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
    )


# ---------------------------------------------------------------------------
# q172 — TPC-H Q2 shape (min-cost supplier): for STANDARD parts of small
# size, the EUROPE supplier(s) whose observed unit price (min over their
# lineitem sales of that part) is the minimum for the part. The correlated
# scalar-min subquery decorrelates to one window over p_partkey — the
# partition key the supply table is already shuffled on.
# ---------------------------------------------------------------------------


@register(
    "q172_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name AS nation_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), priced AS (
      SELECT p.p_partkey, p.p_name, eu.s_name, eu.s_acctbal, eu.nation_name,
             supply.unit_cost,
             MIN(supply.unit_cost) OVER (PARTITION BY p.p_partkey) AS best_cost
      FROM supply
      JOIN eu ON supply.l_suppkey = eu.s_suppkey
      JOIN part p ON supply.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
    )
    SELECT s_acctbal, s_name, nation_name, p_partkey, p_name, unit_cost
    FROM priced
    WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, nation_name, s_name, p_partkey
    LIMIT 100
    """,
    category="relational",
)
def q172_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supply = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name"), "n_regionkey"
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "nation_name")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    w = Window.partitionBy("p_partkey")
    return (
        supply.join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
        .join(F.broadcast(p), supply.l_partkey == p.p_partkey)
        .withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "nation_name", "p_partkey", "p_name",
                "unit_cost")
        .orderBy(F.desc("s_acctbal"), "nation_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q173 — TPC-H Q4 shape (order priority checking): orders from one quarter
# having at least one line shipped >60 days after the order date. The
# EXISTS becomes a left-semi join on orderkey with the date comparison as
# a residual join condition — one shuffle, no decorrelation pass needed.
# ---------------------------------------------------------------------------


@register(
    "q173_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    category="relational",
)
def q173_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (o.o_orderkey == l.l_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q174 — TPC-H Q6 (forecast revenue change): pure scan-side predicate
# aggregation — every filter (year, discount band, quantity cap) reaches
# the parquet scan as a pushed filter; the answer is one exact-decimal sum.
# The plan should be Scan -> Filter -> partial agg -> single exchange.
# ---------------------------------------------------------------------------


@register(
    "q174_forecast_revenue",
    oracle=f"""
    SELECT {sql_exact_sum_fixed('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
      AND l.l_discount BETWEEN 0.05 AND 0.07
      AND l.l_quantity < 24
    """,
    category="relational",
)
def q174_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum_fixed(
                F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q175 — TPC-H Q8 shape (national market share): among ECONOMY-part orders
# by ASIA customers in 1996-1997, the revenue share supplied by NATION_2,
# per order year. Share = exact-sum numerator / exact-sum denominator in
# one conditional aggregate — a single pass, no self-join.
# ---------------------------------------------------------------------------


@register(
    "q175_market_share",
    oracle=f"""
    WITH flat AS (
      SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
             l.l_extendedprice * (1 - l.l_discount) AS rev,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE cr.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
    )
    SELECT order_year,
           {sql_exact_sum_fixed("CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0 END", 4)}
             AS nation_revenue,
           {sql_exact_sum_fixed('rev', 4)} AS total_revenue,
           {sql_exact_sum_fixed("CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0 END", 4)}
             / {sql_exact_sum_fixed('rev', 4)} AS mkt_share
    FROM flat
    GROUP BY order_year
    ORDER BY order_year
    """,
    category="relational",
)
def q175_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cr = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    asia_cust = (
        c.join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
        .join(F.broadcast(cr), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = s.join(F.broadcast(sn), s.s_nationkey == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), l.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            exact_sum_fixed(nation_rev, 4, "nation_revenue"),
            exact_sum_fixed(rev, 4, "total_revenue"),
        )
        .withColumn("mkt_share", F.col("nation_revenue") / F.col("total_revenue"))
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# q176 — TPC-H Q9 shape (product-type profit): profit on widget parts =
# revenue - 80%-of-retail unit cost x quantity, by supplier nation and
# order year. ps_supplycost does not exist; 0.8 * p_retailprice is the
# documented stand-in (same join tree, same aggregate shape).
# ---------------------------------------------------------------------------


@register(
    "q176_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation_name,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
           {sql_exact_sum_fixed(
               'l.l_extendedprice * (1 - l.l_discount)'
               ' - 0.8 * p.p_retailprice * l.l_quantity', 4)} AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, CAST(YEAR(o.o_orderdate) AS BIGINT)
    ORDER BY nation_name, order_year DESC
    """,
    category="relational",
)
def q176_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_quantity"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name")
    )
    supp = s.join(F.broadcast(sn), s.s_nationkey == sn.n_nationkey).select(
        "s_suppkey", "nation_name"
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp), l.l_suppkey == supp.s_suppkey)
        .groupBy(
            "nation_name", F.year("o_orderdate").cast("long").alias("order_year")
        )
        .agg(exact_sum_fixed(profit, 4, "profit"))
        .orderBy("nation_name", F.desc("order_year"))
    )


# ---------------------------------------------------------------------------
# q177 — TPC-H Q11 shape (important stock): per-part sales value through
# EUROPE suppliers, kept when above 1.5x the average part value — the HAVING
# threshold is a broadcast scalar subquery computed from the SAME
# pre-aggregated per-part values (one lineitem pass feeds both sides).
# Q11's FRACTION constant is spec'd as 0.0001/SF; a mean-relative cut is
# the scale-free equivalent (stays selective-but-nonempty at any SF).
# ---------------------------------------------------------------------------


@register(
    "q177_important_stock",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey,
             {sql_exact_sum_fixed('l.l_extendedprice', 2)} AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (
      SELECT (CAST(SUM(CAST(part_value AS DECIMAL(25,10))) AS DOUBLE)
              / COUNT(part_value)) * 1.5
      FROM pv)
    ORDER BY part_value DESC, l_partkey
    """,
    category="relational",
)
def q177_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    pv = (
        l.join(F.broadcast(eu_supp), l.l_suppkey == eu_supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(exact_sum_fixed("l_extendedprice", 2, "part_value"))
    )
    # part_value is exact (scaled-long); summing the per-part doubles again
    # must stay order-independent too, so re-run the exact-decimal path
    # over them (same ops as the oracle's CAST..DECIMAL scalar subquery).
    total = pv.agg((exact_avg("part_value") * 1.5).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# q178 — TPC-H Q12 shape (shipping buckets x priority): lineitems bucketed
# by ship delay (days from order to ship), counting critical- vs normal-
# priority orders per bucket. l_shipmode does not exist; the delay bucket
# is the categorical stand-in. Single co-shuffled join + one aggregate.
# ---------------------------------------------------------------------------


@register(
    "q178_ship_delay_buckets",
    oracle="""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) < 30 THEN 'fast'
                WHEN datediff('day', o.o_orderdate, l.l_shipdate) < 90 THEN 'normal'
                ELSE 'slow' END AS delay_bucket,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    ORDER BY delay_bucket
    """,
    category="relational",
)
def q178_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate").cast("date"),
                       F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(delay < 30, "fast").when(delay < 90, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


# ---------------------------------------------------------------------------
# q179 — TPC-H Q14 (promotion effect): PROMO-part share of one month's
# revenue as a percentage — numerator and denominator from the same
# conditional exact-sum pass, part broadcast onto the lineitem scan.
# ---------------------------------------------------------------------------


@register(
    "q179_promo_revenue",
    oracle=f"""
    SELECT
      {sql_exact_sum_fixed(
          "CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount)"
          ' ELSE 0 END', 4)} AS promo_revenue,
      {_REV_SQL} AS total_revenue,
      100.0 * {sql_exact_sum_fixed(
          "CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount)"
          ' ELSE 0 END', 4)} / {_REV_SQL} AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-09-01' AND l.l_shipdate < DATE '1997-10-01'
    """,
    category="relational",
)
def q179_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            exact_sum_fixed(promo, 4, "promo_revenue"),
            exact_sum_fixed(rev, 4, "total_revenue"),
        )
        .withColumn(
            "promo_pct", 100.0 * F.col("promo_revenue") / F.col("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q180 — TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
# those equal to the maximum. The view+max of the spec becomes one global
# window-max over the 10..10k-row per-supplier aggregate (cheap: runs
# AFTER aggregation, on |suppliers| rows, not |lineitem|).
# ---------------------------------------------------------------------------


@register(
    "q180_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey,
             {sql_exact_sum_fixed('l.l_extendedprice * (1 - l.l_discount)', 4)}
               AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1997-04-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    category="relational",
)
def q180_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy("l_suppkey").agg(
        exact_sum_fixed(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "total_revenue"
        )
    )
    w = Window.partitionBy()  # global max over the small aggregate
    return (
        rev.withColumn("best", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q181 — TPC-H Q16 shape (supplier counts by part attribute): distinct
# suppliers observed selling each (brand, type, size) combo, excluding one
# brand, a size whitelist, and low-balance suppliers (NOT IN -> anti
# join). The supplier-part relation is the distinct projection of
# lineitem — at 100 TB that distinct is the dominant shuffle and runs on
# exactly two int columns.
# ---------------------------------------------------------------------------


@register(
    "q181_supplier_part_counts",
    oracle="""
    WITH sp AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT sp.l_suppkey) AS supplier_cnt
    FROM sp
    JOIN part p ON sp.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (5, 10, 15, 20, 25, 30)
      AND sp.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    category="relational",
)
def q181_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    return (
        sp.join(F.broadcast(bad_supp), sp.l_suppkey == bad_supp.s_suppkey,
                "left_anti")
        .join(F.broadcast(p), sp.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q182 — TPC-H Q19 shape (disjunctive predicates): revenue from three
# OR-ed brand/size/quantity windows. The whole disjunction evaluates
# inside one whole-stage-codegen filter after a single broadcast join —
# Catalyst can also extract the common l_quantity bounds for pushdown.
# ---------------------------------------------------------------------------


@register(
    "q182_disjunctive_revenue",
    oracle=f"""
    SELECT {_REV_SQL} AS revenue, COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    category="relational",
)
def q182_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & size.between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & size.between(10, 30)
           & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#4") & size.between(20, 50)
           & qty.between(20, 40))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_revenue_col(), F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# q183 — TPC-H Q21 shape (sole late shipper): suppliers whose line shipped
# >90 days after the order date, in multi-supplier orders where NO other
# supplier was late. EXISTS -> left-semi, NOT EXISTS -> left-anti, both on
# orderkey with the supplier inequality as residual — the classic
# double-correlated-subquery plan with zero cross joins.
# ---------------------------------------------------------------------------


@register(
    "q183_sole_late_shipper",
    oracle="""
    WITH flat AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM flat WHERE is_late = 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late t
    JOIN supplier s ON t.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM flat f
        WHERE f.l_orderkey = t.l_orderkey AND f.l_suppkey <> t.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM flat f
        WHERE f.l_orderkey = t.l_orderkey AND f.l_suppkey <> t.l_suppkey
          AND f.is_late = 1
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    category="relational",
)
def q183_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # The (order, supplier, any_late) summary is everything all three
    # correlated predicates need. Reduce to it in ONE lineitem pass and
    # materialize (naive: the late/semi/anti branches each re-scan
    # lineitem+orders — 3 full fact scans, 0 ReusedExchange, observed);
    # the checkpointed pair set is bounded by suppliers-per-order, tiny
    # next to lineitem.
    sup = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
                ).cast("int")
            ).alias("any_late")
        )
        .localCheckpoint(eager=True)
    )
    late = sup.filter(F.col("any_late") == 1).select("l_orderkey", "l_suppkey")
    others = sup.select(
        F.col("l_orderkey").alias("f_orderkey"),
        F.col("l_suppkey").alias("f_suppkey"),
        "any_late",
    )
    has_other = (F.col("l_orderkey") == F.col("f_orderkey")) & (
        F.col("l_suppkey") != F.col("f_suppkey")
    )
    return (
        late.join(others, has_other, "left_semi")
        .join(
            others.filter(F.col("any_late") == 1),
            has_other,
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
