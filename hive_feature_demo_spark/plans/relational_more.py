"""Relational coverage completions: array-agg, full outer join, map/JSON
functions, analytic windows with frames (SURVEY.md §2.3 rows not yet
exercised by earlier plan modules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q74 — collect_list / collect_set: per-nation supplier rosters.
# Spark's collect_* have nondeterministic element order (arrival order
# across partitions); sorting before serialization is the only
# reproducible contract — encoded here as the operator's output shape.
# ---------------------------------------------------------------------------


@register(
    "q74_collect_arrays",
    oracle="""
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_suppliers,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS roster,
           string_agg(DISTINCT CAST(s.s_nationkey AS VARCHAR), ',') AS distinct_keys
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    category="relational",
)
def q74_collect_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("roster"),
            F.concat_ws(
                ",", F.array_sort(F.collect_set(F.col("s_nationkey").cast("string")))
            ).alias("distinct_keys"),
        )
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------------------
# q75 — FULL OUTER join: reconcile two per-nation profiles whose key sets
# differ (high-balance customers vs high-balance suppliers).
# ---------------------------------------------------------------------------


@register(
    "q75_full_outer_reconcile",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY 1
    ), s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
    category="relational",
)
def q75_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# q76 — map-typed columns: JSON props -> map<string,string>, keys +
# element_at access (the map-function surface over real payload data).
# ---------------------------------------------------------------------------


@register(
    "q76_map_functions",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    ORDER BY event_id
    """,
    category="relational",
)
def q76_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select(
            "event_id",
            F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
            F.size(F.map_keys(m)).alias("n_keys"),
            F.element_at(m, "k").alias("k_str"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q77 — analytic windows with frames: lag/lead/first/last + a trailing
# 3-row sum per customer order history. Frame sums use fixed-point cents
# so the result is independent of evaluation order on both engines.
# ---------------------------------------------------------------------------


@register(
    "q77_analytic_windows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0 AS trailing3_value
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    category="relational",
)
def q77_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(-2, 0)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            (F.sum(cents).over(wf).cast("double") / F.lit(100.0)).alias(
                "trailing3_value"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q78 — deterministic hash sampling: Bernoulli-by-content-hash, the
# reproducible sampling pattern at scale (same rows selected under any
# partitioning, any engine — unlike TABLESAMPLE/rand(), which are both
# nondeterministic across engines). Rate = 5% via md5 prefix buckets.
# ---------------------------------------------------------------------------


def _sql_hex4_to_int(h: str) -> str:
    from hive_feature_demo_spark.functions.numeric import sql_hex_to_int

    return sql_hex_to_int(h, "1", 4)


@register(
    "q78_hash_sample",
    oracle=f"""
    WITH s AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      WHERE {_sql_hex4_to_int("md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))")} % 100 < 5
    )
    SELECT COUNT(*) AS n_sampled,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sampled_value
    FROM s
    """,
    category="relational",
)
def q78_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % 100
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        l.filter(bucket < 5)
        .agg(
            F.count("*").alias("n_sampled"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("sampled_value"),
        )
    )


# ---------------------------------------------------------------------------
# q79 — TPC-H Q7 shape: bilateral trade flows between two nations (supplier
# nation x customer nation x ship-year). Two broadcast dims + the
# orders<->lineitem co-shuffle; the nation-pair filter prunes early.
# ---------------------------------------------------------------------------


@register(
    "q79_nation_trade_flows",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    category="relational",
)
def q79_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg((F.sum(units).cast("double") / F.lit(10000.0)).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# q80 — TPC-H Q17 shape: revenue locked in small-quantity lineitems,
# threshold = 0.5 x per-part average quantity (correlated scalar subquery,
# expressed as an aggregate-then-join — the scalable decorrelated form).
# ---------------------------------------------------------------------------


@register(
    "q80_small_qty_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey,
             (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS locked_revenue
    FROM lineitem l JOIN pavg ON l.l_partkey = pavg.l_partkey
    WHERE l.l_quantity < 0.5 * pavg.avg_qty
    """,
    category="relational",
)
def q80_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    pavg = l.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("long")).cast("double") / F.count("*")
        ).alias("avg_qty")
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        l.join(pavg.withColumnRenamed("l_partkey", "p_key"), l.l_partkey == F.col("p_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_small"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("locked_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q81 — TPC-H Q20 shape (sans partsupp): suppliers who moved serious volume
# of a part family — IN-subquery chain decorrelated into semi-join + agg.
# ---------------------------------------------------------------------------


@register(
    "q81_part_family_suppliers",
    oracle="""
    WITH green AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%a%'
    ), vol AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM green)
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, v.total_qty
    FROM supplier s JOIN vol v ON s.s_suppkey = v.l_suppkey
    WHERE v.total_qty > 400
    ORDER BY s.s_suppkey
    """,
    category="relational",
)
def q81_part_family_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%")).select("p_partkey")
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 400)
    )
    return (
        s.join(vol, s.s_suppkey == vol.l_suppkey)
        .select("s_suppkey", "s_name", "total_qty")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q85 — TPC-H Q13 shape (custdist): orders-per-customer distribution
# INCLUDING zero-order customers — left outer join + two-level aggregation.
# ---------------------------------------------------------------------------


@register(
    "q85_custdist",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    category="relational",
)
def q85_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q97 — array-function surface over real array data (fans.genres would
# need the fixture; events props keys suffice): intersect/union/except,
# flatten, contains, reverse sort — the §2.3 array-op row end to end.
# ---------------------------------------------------------------------------


@register(
    "q97_array_functions",
    oracle="""
    WITH base AS (
      SELECT n_nationkey AS k,
             string_split(n_name, '_') AS parts,
             [n_nationkey % 5, n_nationkey % 3, n_nationkey % 5] AS nums
      FROM nation
    )
    SELECT k,
           array_to_string(parts, '|') AS parts_str,
           CAST(len(parts) AS INT) AS n_parts,
           list_contains(nums, 0) AS has_zero,
           array_to_string(list_sort(list_distinct(nums)), ',') AS distinct_sorted,
           array_to_string(list_reverse_sort(nums), ',') AS desc_sorted,
           array_to_string(list_sort(list_intersect(nums, [0, 1, 2])), ',') AS inter_012,
           CAST(list_sum(nums) AS BIGINT) AS nums_sum
    FROM base
    ORDER BY k
    """,
    category="relational",
)
def q97_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    nums = F.array(
        F.col("n_nationkey") % 5, F.col("n_nationkey") % 3, F.col("n_nationkey") % 5
    )
    parts = F.split("n_name", "_")
    # engines order set-intersection results differently: sort both sides
    inter = F.array_sort(
        F.filter(
            F.array_distinct(nums),
            lambda x: F.array_contains(F.array(F.lit(0), F.lit(1), F.lit(2)), x),
        )
    )
    return (
        n.select(
            F.col("n_nationkey").alias("k"),
            F.concat_ws("|", parts).alias("parts_str"),
            F.size(parts).alias("n_parts"),
            F.array_contains(nums, 0).alias("has_zero"),
            F.concat_ws(",", F.array_sort(F.array_distinct(nums))).alias("distinct_sorted"),
            F.concat_ws(",", F.reverse(F.array_sort(nums))).alias("desc_sorted"),
            F.concat_ws(",", inter).alias("inter_012"),
            F.aggregate(nums, F.lit(0).cast("long"), lambda a, x: a + x).alias("nums_sum"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q100 — stratified deterministic sampling (sampleBy, reproducibly):
# per-stratum rates applied via content-hash units, so the same rows are
# kept under any partitioning/engine — how a curation pipeline downsamples
# over-represented classes without a seed lottery.
# ---------------------------------------------------------------------------

_STRATA_RATES = {"view": 0.05, "click": 0.20, "error": 0.50, "signup": 1.0, "purchase": 1.0}


@register(
    "q100_stratified_sample",
    oracle=f"""
    WITH u AS (
      SELECT event_type,
             {_sql_hex4_to_int("md5(CAST(event_id AS VARCHAR))")} / 65536.0 AS unit
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_kept
    FROM u
    WHERE unit < CASE event_type
                   WHEN 'view' THEN 0.05
                   WHEN 'click' THEN 0.20
                   WHEN 'error' THEN 0.50
                   ELSE 1.0
                 END
    GROUP BY event_type
    ORDER BY event_type
    """,
    category="relational",
)
def q100_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    unit = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        / 65536.0
    )
    rate = F.when(F.col("event_type") == "view", 0.05).when(
        F.col("event_type") == "click", 0.20
    ).when(F.col("event_type") == "error", 0.50).otherwise(1.0)
    return (
        e.filter(unit < rate)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q103 — latest record per key (the SCD read-side / snapshot dedup op):
# row_number over (key, ts desc) with event_id tie-break.
# ---------------------------------------------------------------------------


@register(
    "q103_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY user_id
    """,
    category="relational",
)
def q103_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q104 — percent-of-total: each segment's share of global revenue via an
# unpartitioned window over the (tiny) aggregated frame — the window runs
# on a handful of rows, never on the fact table.
# ---------------------------------------------------------------------------


@register(
    "q104_segment_revenue_share",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment,
             SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           FLOOR((CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER () AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS revenue_share
    FROM seg
    ORDER BY c_mktsegment
    """,
    category="relational",
)
def q104_segment_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy()
    share = F.floor(
        (F.col("cents").cast("double") / F.sum("cents").over(w).cast("double"))
        * 1000000.0
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return seg.select(
        "c_mktsegment",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
        share.alias("revenue_share"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# q110 — date-spine gap filling: every calendar day in the observed range
# appears, zero-filled when no events landed (the reporting-table op;
# naive groupBy silently drops empty days). Spine = sequence/explode of
# the min..max range — never a driver-side loop.
# ---------------------------------------------------------------------------


@register(
    "q110_daily_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT s.day, COALESCE(d.n, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY s.day
    """,
    category="relational",
)
def q110_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    return (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n_events"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q111 — cumulative distinct users by day: running COUNT(DISTINCT) is not
# window-expressible at scale; the first-seen-day trick converts it to a
# cumulative sum of arrivals (one groupBy + one tiny window).
# ---------------------------------------------------------------------------


@register(
    "q111_cumulative_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ), arrivals AS (
      SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM arrivals
    ORDER BY day
    """,
    category="relational",
)
def q111_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("day"))
    arrivals = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        arrivals.withColumn("cumulative_users", F.sum("new_users").over(w).cast("long"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q112 — top-k WITH ties (RANK <= k): unlike the row_number top-k
# elsewhere, equal account balances at the cut all survive — the
# tie-inclusive ranking semantic.
# ---------------------------------------------------------------------------


@register(
    "q112_topk_with_ties",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal, rnk FROM (
      SELECT s_nationkey, s_suppkey,
             FLOOR(s_acctbal * 100 + 0.5) / 100.0 AS s_acctbal,
             CAST(RANK() OVER (PARTITION BY s_nationkey
                  ORDER BY FLOOR(s_acctbal * 100 + 0.5) DESC) AS BIGINT) AS rnk
      FROM supplier)
    WHERE rnk <= 3
    ORDER BY s_nationkey, rnk, s_suppkey
    """,
    category="relational",
)
def q112_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    cents = F.floor(F.col("s_acctbal") * 100 + F.lit(0.5))
    w = Window.partitionBy("s_nationkey").orderBy(F.desc(cents))
    return (
        s.select(
            "s_nationkey",
            "s_suppkey",
            (cents / F.lit(100.0)).alias("s_acctbal"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# q113 — importance sampling for curation: keep probability proportional
# to document length (the quality-weighted variant of q78/q100's uniform /
# stratified sampling) — still hash-deterministic, same rows under any
# partitioning or engine.
# ---------------------------------------------------------------------------


@register(
    "q113_importance_sample",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             {h4} / 65536.0 AS unit,
             LEAST(1.0, n_chars / 2000.0) AS keep_p
      FROM documents
    )
    SELECT doc_id, lang, n_chars
    FROM scored
    WHERE unit < keep_p
    ORDER BY doc_id
    """.format(h4=_sql_hex4_to_int("md5(CAST(doc_id AS VARCHAR))")),
    category="relational",
)
def q113_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    unit = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        / 65536.0
    )
    keep_p = F.least(F.lit(1.0), F.col("n_chars") / 2000.0)
    return (
        docs.filter(unit < keep_p)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q114 — referential-integrity audit: orphaned facts (lineitems without an
# order, events from unknown customers) via anti-joins — the cross-table
# complement of q92's single-table constraint report.
# ---------------------------------------------------------------------------


@register(
    "q114_referential_integrity",
    oracle="""
    SELECT 'lineitem_without_order' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'order_without_customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'event_user_not_customer',
           (SELECT COUNT(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id))
    ORDER BY check_name
    """,
    category="relational",
)
def q114_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    e = table(spark, sf_dir, "events").select("user_id")
    checks = [
        (
            "lineitem_without_order",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        (
            "order_without_customer",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
        (
            "event_user_not_customer",
            e.join(c, e.user_id == c.c_custkey, "left_anti"),
        ),
    ]
    out = None
    for name, orphans in checks:
        row = orphans.agg(F.count("*").alias("n_orphans")).select(
            F.lit(name).alias("check_name"), "n_orphans"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# q115 — multi-aggregate pivot: per order-year, each status contributes
# BOTH a count and a value sum (q15 pivots a single aggregate; real
# report matrices carry several measures per cell).
# ---------------------------------------------------------------------------


@register(
    "q115_multi_agg_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) FILTER (o_orderstatus = 'F') AS f_n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (o_orderstatus = 'F') AS DOUBLE) / 100.0 AS f_value,
           COUNT(*) FILTER (o_orderstatus = 'O') AS o_n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (o_orderstatus = 'O') AS DOUBLE) / 100.0 AS o_value,
           COUNT(*) FILTER (o_orderstatus = 'P') AS p_n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (o_orderstatus = 'P') AS DOUBLE) / 100.0 AS p_value
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    category="relational",
)
def q115_multi_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cols = []
    for st in ["F", "O", "P"]:
        is_st = F.col("o_orderstatus") == st
        cols.append(F.count(F.when(is_st, 1)).alias(f"{st.lower()}_n"))
        cols.append(
            (F.sum(F.when(is_st, cents)).cast("double") / F.lit(100.0)).alias(
                f"{st.lower()}_value"
            )
        )
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(*cols)
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# q147 — UNPIVOT (wide -> long), the inverse of q15's pivot: the three
# money measures of lineitem melt into (measure, value) rows, then
# aggregate per measure. `DataFrame.unpivot` is a narrow projection (each
# input row emits k rows in place — no shuffle until the final 3-key agg).
# The long format is what generic profilers/metric stores consume.
# ---------------------------------------------------------------------------


@register(
    "q147_unpivot_measures",
    oracle="""
    WITH long_form AS (
      SELECT 'l_discount' AS measure, l_discount AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS total,
           CAST(MIN(FLOOR(v * 100 + 0.5)) AS DOUBLE) / 100.0 AS min_v,
           CAST(MAX(FLOOR(v * 100 + 0.5)) AS DOUBLE) / 100.0 AS max_v
    FROM long_form GROUP BY measure ORDER BY measure
    """,
    category="relational",
)
def q147_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    long_form = l.unpivot(
        ids=[],
        values=["l_discount", "l_extendedprice", "l_tax"],
        variableColumnName="measure",
        valueColumnName="v",
    )
    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    return (
        long_form.select("measure", cents.alias("c"))
        .groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
            (F.min("c").cast("double") / 100.0).alias("min_v"),
            (F.max("c").cast("double") / 100.0).alias("max_v"),
        )
        .orderBy("measure")
    )


# ---------------------------------------------------------------------------
# q148 — RANGE-frame rolling window: per-user 3-day rolling totals over
# the daily event series. RANGE frames bound by the ORDER-BY *value*
# (days), not row offsets — days with no events genuinely fall out of the
# frame, which ROWS frames get wrong on gappy series. One shuffle+sort on
# user_id; the frame scan is a single pass per partition.
# ---------------------------------------------------------------------------


@register(
    "q148_rolling_range_window",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_num,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id, day,
           CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS rolling_3d_value,
           CAST(SUM(n_events) OVER w AS BIGINT) AS rolling_3d_events
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day_num
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, day
    """,
    category="stats",
)
def q148_rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("day_num"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents"
            ),
            F.count("*").alias("n_events"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-2, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        (F.sum("cents").over(w).cast("double") / 100.0).alias("rolling_3d_value"),
        F.sum("n_events").over(w).cast("long").alias("rolling_3d_events"),
    ).orderBy("user_id", "day")
