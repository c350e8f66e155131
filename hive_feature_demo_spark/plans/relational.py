"""Relational core: SURVEY.md §2.3 operator inventory over the star schema.

These queries ARE the engine's relational layer — expressed declaratively on
the DataFrame API so Catalyst supplies predicate pushdown, column pruning,
partial aggregation, join selection, and AQE. Per SURVEY §4.3 no custom
optimizer code is needed; the engineering here is in plan shape:

- dimension tables (region/nation/customer/supplier/part) are broadcast —
  at 100 TB only the fact tables (lineitem/orders/events) are large;
- money aggregates use exact decimal accumulation (`functions.numeric`) so
  results are order-independent — a correctness property, not a test hack:
  a 1000-executor sum of doubles is otherwise nondeterministic run-to-run;
- every limit is preceded by a total order (SURVEY §7.4 trap 4);
- int-typed window/rank outputs are cast to long to keep one schema across
  engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import (
    exact_avg,
    exact_avg_fixed,
    exact_sum,
    exact_sum_fixed,
    exact_sum_merge,
    exact_sum_partial,
    round_det,
    sql_exact_avg,
    sql_exact_avg_fixed,
    sql_exact_sum,
    sql_exact_sum_fixed,
    sql_round_det,
)
from hive_feature_demo_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): filter + groupBy + 8 aggregates.
# Reference analog: the global filtered aggregate of query_crm (tools.py:73-76)
# generalized to grouped aggregation.
# ---------------------------------------------------------------------------

_Q01_CUTOFF = "2001-09-02 00:00:00"


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum_fixed('l_quantity', 0)} AS sum_qty,
           {sql_exact_sum_fixed('l_extendedprice', 2)} AS sum_base_price,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_exact_sum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
           {sql_exact_avg_fixed('l_quantity', 0)} AS avg_qty,
           {sql_exact_avg_fixed('l_extendedprice', 2)} AS avg_price,
           {sql_exact_avg_fixed('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q01_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # raw columns have known decimal precision (qty integral, money 2dp):
    # lossless fixed-point long sums, ~2x the decimal path's throughput;
    # the derived products keep DECIMAL(25,10) exactness
    from hive_feature_demo_spark.operators.skew import fan_out_scan

    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # single-row-group local testdata arrives as ONE scan split, so the
    # whole scan+aggregate ran on one core (guide §2.5 input skew; the
    # 8-vs-32-core bench ratio read 1.0). Hash fan-out on the
    # high-cardinality PK parallelizes the aggregation — keyed, not
    # round-robin, so no sort-before-repartition tax — and is a no-op
    # once scan splits exceed cores (always at 100 TB). Decimal/fixed
    # sums are order-independent, so results are bit-identical.
    # Measured r13 (interleaved min-of-4): 1.43 s -> 0.87 s.
    filtered = fan_out_scan(
        l.filter(F.col("l_shipdate") <= F.lit(_Q01_CUTOFF).cast("timestamp")),
        "l_orderkey",
    )
    return (
        filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum_fixed("l_quantity", 0, "sum_qty"),
            exact_sum_fixed("l_extendedprice", 2, "sum_base_price"),
            exact_sum(disc_price, "sum_disc_price"),
            exact_sum(charge, "sum_charge"),
            exact_avg_fixed("l_quantity", 0, "avg_qty"),
            exact_avg_fixed("l_extendedprice", 2, "avg_price"),
            exact_avg_fixed("l_discount", 2, "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — revenue by market segment: 3-way join (dim broadcast) + grouped agg.
# ---------------------------------------------------------------------------


@register(
    "q02_segment_revenue",
    oracle=f"""
    SELECT c.c_mktsegment,
           {sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q02_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    # Pre-aggregate lineitem on the join key BEFORE the join (Catalyst
    # does not push aggregates below joins): the map-side partial combine
    # compresses ~4 lineitems/order before the shuffle, the orders join
    # becomes 1:1, and COUNT(DISTINCT o_orderkey) over the joined fact —
    # which Spark plans as an Expand (×2 rows) plus a second wide
    # (segment, orderkey) shuffle — degenerates to a plain COUNT(*).
    # exact_sum_partial/merge keep the re-associated sum in decimal space
    # so the value is bit-identical to the single-pass exact_sum (decimal
    # addition is exact); o_orderkey is the orders PK (TPC-H), so each
    # per-order row joins at most once and COUNT(*) = COUNT(DISTINCT).
    # customer is a dimension (1.5k rows/GB-scale even at SF100k) -> broadcast.
    # fan the single-split local scan out on the grouping key BEFORE the
    # per-order aggregate (guide §2.5): the repartition provides exactly
    # the hashpartitioning the aggregation needs, so the plan still has
    # ONE exchange below the join — the 600k-row partial aggregation just
    # runs on every core instead of the lone scan task. No-op at scale;
    # measured r13 (interleaved min-of-4): 1.49 s -> 0.85 s.
    from hive_feature_demo_spark.operators.skew import fan_out_scan

    per_order = fan_out_scan(l, "l_orderkey").groupBy("l_orderkey").agg(
        exact_sum_partial(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "_rev"
        )
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            exact_sum_merge("_rev", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q03 — top-10 orders by revenue (join + grouped agg + deterministic top-k).
# ---------------------------------------------------------------------------


@register(
    "q03_top_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority,
           {sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"), "o_orderpriority"
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "order_date", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        # total order before limit: Spark limit without order is
        # partition-nondeterministic (SURVEY §7.4); o_orderkey breaks ties.
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — region/nation rollup over a 4-way join (TPC-H Q5 shape + ROLLUP).
# ---------------------------------------------------------------------------


@register(
    "q04_region_rollup",
    oracle=f"""
    SELECT COALESCE(r.r_name, '__ALL__') AS region_name,
           COALESCE(n.n_name, '__ALL__') AS nation_name,
           {sql_exact_sum('o.o_totalprice')} AS total_sales,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name, nation_name
    """,
)
def q04_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # pre-aggregate to the FINEST grouping set before the rollup (r11
    # Expand audit): a bare rollup makes Catalyst plan an Expand that
    # multiplies every joined FACT row x3 (one copy per grouping set)
    # before the partial aggregate. Aggregating to (r_name, n_name) first
    # — map-side combine, one tiny shuffle of <= |region x nation| rows —
    # leaves the Expand multiplying the ~30 pre-aggregated rows instead.
    # Decimal partial sums re-associate exactly (exact_sum_partial/merge,
    # the q02 bit-identity argument); COUNT(*) re-associates as SUM.
    pre = joined.groupBy("r_name", "n_name").agg(
        exact_sum_partial("o_totalprice", "_ts"),
        F.count("*").alias("_n"),
    )
    return (
        pre.rollup("r_name", "n_name")
        .agg(
            exact_sum_merge("_ts", "total_sales"),
            F.sum("_n").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("__ALL__")).alias("region_name"),
            F.coalesce("n_name", F.lit("__ALL__")).alias("nation_name"),
            "total_sales",
            "n_orders",
        )
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# q05 — semi join (EXISTS): customers with at least one big urgent order.
# ---------------------------------------------------------------------------


@register(
    "q05_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_totalprice > 400000
        AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c.c_custkey
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") > 400000) & (F.col("o_orderpriority") == "1-URGENT")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q06 — anti join (NOT EXISTS): customers with no orders at all.
# ---------------------------------------------------------------------------


@register(
    "q06_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c.c_custkey
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q07 — top-k per group: 3 biggest orders per customer (ranking window).
# ---------------------------------------------------------------------------


@register(
    "q07_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q07_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# q08 — analytic windows on the event stream: lag/lead + running aggregates.
# Running sums accumulate in exact decimal so the frame-ordered fold is
# engine-independent.
# ---------------------------------------------------------------------------


@register(
    "q08_event_windows",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(SUM(CAST(value AS DECIMAL(25,10))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS BIGINT) AS seq
    FROM events
    ORDER BY user_id, seq
    """,
)
def q08_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.sum(F.col("value").cast("decimal(25,10)")).over(run).cast("double").alias("running_value"),
            F.lag("event_type").over(w).alias("prev_type"),
            F.row_number().over(w).cast("long").alias("seq"),
        )
        .orderBy("user_id", "seq")
    )


# ---------------------------------------------------------------------------
# q09 — cube: order counts/value over status x priority with subtotals.
# ---------------------------------------------------------------------------


@register(
    "q09_status_priority_cube",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '__ALL__') AS status,
           COALESCE(o_orderpriority, '__ALL__') AS priority,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice')} AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q09_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # pre-aggregate to (status, priority) before the cube (r11 Expand
    # audit): a bare cube Expands every FACT row x4; over the ~15
    # pre-aggregated groups the Expand is free. Same exactness argument
    # as q04 (decimal partials re-associate exactly, COUNT -> SUM).
    pre = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("_n"),
        exact_sum_partial("o_totalprice", "_tv"),
    )
    return (
        pre.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n_orders"),
            exact_sum_merge("_tv", "total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("__ALL__")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("__ALL__")).alias("priority"),
            "n_orders",
            "total_value",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# q10 — set operations: urgent-1995 customers vs low-2000 customers.
# ---------------------------------------------------------------------------


@register(
    "q10_set_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT'
                 AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '5-LOW'
                 AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    SELECT 'both' AS bucket, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'only_urgent' AS bucket, o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    UNION ALL
    SELECT 'only_low' AS bucket, o_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    ORDER BY bucket, o_custkey
    """,
)
def q10_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    a = (
        o.filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") < cut))
        .select("o_custkey")
        .distinct()
    )
    b = (
        o.filter((F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderdate") >= cut))
        .select("o_custkey")
        .distinct()
    )
    both = a.intersect(b).select(F.lit("both").alias("bucket"), "o_custkey")
    only_a = a.exceptAll(b).distinct().select(F.lit("only_urgent").alias("bucket"), "o_custkey")
    only_b = b.exceptAll(a).distinct().select(F.lit("only_low").alias("bucket"), "o_custkey")
    return both.unionByName(only_a).unionByName(only_b).orderBy("bucket", "o_custkey")


# ---------------------------------------------------------------------------
# q11 — distinct aggregation: exact distinct + per-nation supplier/customer mix.
# ---------------------------------------------------------------------------


@register(
    "q11_distinct_by_nation",
    oracle=f"""
    WITH cust AS (
      SELECT c_nationkey,
             COUNT(DISTINCT c_custkey) AS n_customers,
             {sql_exact_sum('c_acctbal')} AS customer_balance
      FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey, COUNT(DISTINCT s_suppkey) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name,
           COALESCE(cust.n_customers, 0) AS n_customers,
           COALESCE(supp.n_suppliers, 0) AS n_suppliers,
           cust.customer_balance
    FROM nation n
    LEFT JOIN cust ON cust.c_nationkey = n.n_nationkey
    LEFT JOIN supp ON supp.s_nationkey = n.n_nationkey
    ORDER BY n.n_name
    """,
)
def q11_distinct_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # NOTE: the c x s join per nation duplicates rows; distinct-counts are
    # unaffected and the balance sum must de-duplicate, so sum over distinct
    # (custkey, acctbal) pairs is wrong in general — instead aggregate
    # customers per nation first, then join supplier counts (also the
    # shuffle-minimal plan: two small aggs + a broadcast join, no fanout).
    cust = c.groupBy("c_nationkey").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        exact_sum("c_acctbal", "customer_balance"),
    )
    supp = s.groupBy("s_nationkey").agg(F.countDistinct("s_suppkey").alias("n_suppliers"))
    return (
        n.join(F.broadcast(cust), n.n_nationkey == cust.c_nationkey, "left")
        .join(F.broadcast(supp), n.n_nationkey == supp.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            "customer_balance",
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q12 — scalar function gauntlet: string/date/math built-ins, one pass.
# ---------------------------------------------------------------------------


@register(
    "q12_scalar_functions",
    oracle=f"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CAST(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           {sql_round_det('p_retailprice * 1.1', 2)} AS marked_up,
           ABS(p_size - 25) AS size_dist,
           CAST(p_size % 5 AS BIGINT) AS size_mod
    FROM part
    WHERE p_size BETWEEN 10 AND 40 AND p_name LIKE '%a%'
    ORDER BY p_partkey
    """,
)
def q12_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_size").between(10, 40) & F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws(":", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("long").alias("brand_num"),
            round_det(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
            F.abs(F.col("p_size") - 25).alias("size_dist"),
            (F.col("p_size") % 5).cast("long").alias("size_mod"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q13 — date/time functions over orders.
# ---------------------------------------------------------------------------


@register(
    "q13_date_functions",
    oracle=f"""
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice')} AS total_value,
           CAST(MIN(o_orderdate) AS DATE) AS first_day,
           CAST(MAX(o_orderdate) AS DATE) AS last_day
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q13_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice", "total_value"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        )
        .orderBy("order_year", "order_quarter")
    )


# ---------------------------------------------------------------------------
# q14 — supplier/customer nation match (TPC-H Q5 core): 6-way join where the
# supplying and ordering nation coincide.
# ---------------------------------------------------------------------------


@register(
    "q14_local_supply_revenue",
    oracle=f"""
    SELECT n.n_name,
           {sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
                 AND s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q14_local_supply_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q15 — pivot: order counts per year x status (wide table from long).
# ---------------------------------------------------------------------------

_STATUSES = ["F", "O", "P"]


@register(
    "q15_pivot_year_status",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_f,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_o,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_p
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q15_pivot_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        # explicit pivot values -> single-pass, no extra distinct job
        .pivot("o_orderstatus", _STATUSES)
        .count()
    )
    return pivoted.select(
        "order_year",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s.lower()}")
            for s in _STATUSES
        ],
    ).orderBy("order_year")
