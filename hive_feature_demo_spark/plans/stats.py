"""Statistical analysis queries: histograms, correlation, edit distance.

Profile-style operators a training-data pipeline runs before/after
transformations (value distributions, feature correlation, fuzzy string
matching). All exact and hash-checked — correlation is computed from
fixed-point integer power sums rather than ``F.corr`` (whose streaming
update order differs between engines in the last ulps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import sql_round_det
from hive_feature_demo_spark.functions.temporal import epoch_micros
from hive_feature_demo_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q87 — equal-width histogram of event values (fixed [0, 500) domain, 20
# bins). Fixed bounds avoid a second pass and make bin edges stable as
# data grows — the production profile choice; clamp catches outliers.
# ---------------------------------------------------------------------------


@register(
    "q87_value_histogram",
    oracle="""
    SELECT LEAST(GREATEST(CAST(FLOOR(value / 25.0) AS BIGINT), 0), 19) AS bin,
           COUNT(*) AS n,
           (CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0)
             AS bin_value_sum
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    category="stats",
)
def q87_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 25.0).cast("long"), F.lit(0).cast("long")),
        F.lit(19).cast("long"),
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        e.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("bin_value_sum"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q88 — exact Pearson correlation from integer power sums. F.corr /
# DuckDB corr() use streaming covariance updates whose float error depends
# on row order; the closed form over fixed-point sums is order-free:
# r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)).
# ---------------------------------------------------------------------------


_CORR_NUM = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
_CORR_DEN = (
    "(SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@register(
    "q88_qty_price_correlation",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sx,
             SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                  AS DECIMAL(38,0)) * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {sql_round_det(f"{_CORR_NUM} / {_CORR_DEN}", 8)} AS qty_price_corr
    FROM s
    ORDER BY l_returnflag
    """,
    category="stats",
)
def q88_qty_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.functions.numeric import round_det

    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y.cast("decimal(38,0)") * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n_d * F.col("sxy") - sx_d * sy_d
    den = F.sqrt(n_d * F.col("sxx") - sx_d * sx_d) * F.sqrt(
        n_d * F.col("syy") - sy_d * sy_d
    )
    return s.select(
        "l_returnflag", "n", round_det(num / den, 8).alias("qty_price_corr")
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q89 — fuzzy string matching: near-identical supplier names by Levenshtein
# distance within a nation (blocking key). Integer-exact on both engines;
# blocking turns the O(n^2) comparison into per-group work — the standard
# entity-resolution shape.
# ---------------------------------------------------------------------------


@register(
    "q89_name_edit_distance",
    oracle="""
    SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
           a.s_name AS name_a, b.s_name AS name_b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 3
    ORDER BY key_a, key_b
    """,
    category="stats",
)
def q89_name_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    a = s.select(
        F.col("s_suppkey").alias("key_a"),
        F.col("s_name").alias("name_a"),
        F.col("s_nationkey").alias("nk"),
    )
    b = s.select(
        F.col("s_suppkey").alias("key_b"),
        F.col("s_name").alias("name_b"),
        F.col("s_nationkey").alias("nk"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "nk")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(dist <= 3)
        .select(
            "key_a", "key_b", "name_a", "name_b", dist.cast("long").alias("edit_dist")
        )
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# q90 — ordered funnel (view -> click -> purchase): a user advances a
# stage only with a LATER event of the next type. Chained agg->join
# stages, all co-partitioned on user_id (one shuffle key end to end) —
# the scalable funnel shape, no per-user UDFs, no self cross joins.
# ---------------------------------------------------------------------------


@register(
    "q90_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) FILTER (event_type = 'view') AS t_view
      FROM events GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(t_view) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    category="stats",
)
def q90_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        v.agg(F.count("t_view").alias("n_viewed")),
        c.agg(F.count("*").alias("n_clicked_after_view")),
        p.agg(F.count("*").alias("n_purchased_after_click")),
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


# ---------------------------------------------------------------------------
# q91 — retention cohorts: users grouped by first-seen day; next-day and
# 7-day retention per cohort. first-day agg + distinct activity days,
# both keyed on user_id — the standard cohort-matrix shape.
# ---------------------------------------------------------------------------


@register(
    "q91_retention_cohorts",
    oracle="""
    WITH fd AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT fd.cohort_day,
           COUNT(DISTINCT fd.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.d = fd.cohort_day + 1
                               THEN fd.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.d >= fd.cohort_day + 7
                               THEN fd.user_id END) AS retained_d7plus
    FROM fd JOIN act a ON fd.user_id = a.user_id
    GROUP BY fd.cohort_day
    ORDER BY fd.cohort_day
    """,
    category="stats",
)
def q91_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    fd = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    act = e.select("user_id", F.col("ts").cast("date").alias("d"))
    j = fd.join(act, "user_id")
    # pre-aggregate per user before the cohort rollup (r11 Expand audit):
    # the previous three COUNT(DISTINCT user_id)-shaped aggregates made
    # Catalyst Expand every joined event row x3 into a wide
    # (cohort_day, gid, user_id) shuffle. "Distinct users with >= 1
    # qualifying day" is per-user boolean OR, so one groupBy(user_id)
    # with MAX(flag) — map-side combine on the fact rows, no Expand, no
    # distinct — then COUNT/SUM per cohort over the one-row-per-user
    # table. The per-day .distinct() the old form needed is subsumed
    # (duplicate days can't change a MAX). Oracle keeps the
    # COUNT(DISTINCT CASE ...) formulation.
    per_user = j.groupBy("user_id", "cohort_day").agg(
        F.max(
            (F.col("d") == F.date_add(F.col("cohort_day"), 1)).cast("int")
        ).alias("_r1"),
        F.max(
            (F.col("d") >= F.date_add(F.col("cohort_day"), 7)).cast("int")
        ).alias("_r7"),
    )
    return (
        per_user.groupBy("cohort_day")
        .agg(
            F.count("*").alias("cohort_size"),
            F.sum("_r1").alias("retained_d1"),
            F.sum("_r7").alias("retained_d7plus"),
        )
        .orderBy("cohort_day")
    )


# ---------------------------------------------------------------------------
# q92 — data-quality constraint report (deequ-style): each rule becomes
# one aggregate over a single shared scan (Catalyst collapses the CASE
# aggregates into one pass); output = one row per rule with pass/fail.
# ---------------------------------------------------------------------------


@register(
    "q92_data_quality_report",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) - COUNT(o_custkey) AS null_custkey,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_orderkey,
             COUNT(*) FILTER (o_totalprice <= 0) AS nonpositive_price,
             COUNT(*) FILTER (o_orderdate < TIMESTAMP '1990-01-01 00:00:00') AS date_below_min
      FROM orders
    )
    SELECT rule, violations, violations = 0 AS passed FROM (
      SELECT 'custkey_not_null' AS rule, null_custkey AS violations FROM m
      UNION ALL SELECT 'orderkey_unique', dup_orderkey FROM m
      UNION ALL SELECT 'totalprice_positive', nonpositive_price FROM m
      UNION ALL SELECT 'orderdate_in_range', date_below_min FROM m
    )
    ORDER BY rule
    """,
    category="stats",
)
def q92_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = o.agg(
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_price"),
        F.count(
            F.when(
                F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp"), 1
            )
        ).alias("date_below_min"),
    )
    # stack(): 4 rule rows from ONE aggregate pass — a union of selects
    # would embed (and re-execute) the full orders aggregation per branch
    return (
        m.selectExpr(
            """stack(4,
                 'custkey_not_null', null_custkey,
                 'orderkey_unique', dup_orderkey,
                 'totalprice_positive', nonpositive_price,
                 'orderdate_in_range', date_below_min) AS (rule, violations)"""
        )
        .withColumn("passed", F.col("violations") == 0)
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# q102 — salted join equivalence: the skew-mitigation operator produces
# row-identical results to the plain join (oracle = plain SQL join), here
# aggregated per customer segment after attaching purchase events.
# ---------------------------------------------------------------------------


@register(
    "q102_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    category="stats",
)
def q102_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.skew import salted_join

    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("c_custkey"), "value")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        salted_join(e, c, ["c_custkey"], n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q105 — feature normalization: per-type z-scores from exact integer power
# sums (the training-data scaling op), plus |z| > 3 outlier flags. Moments
# come from one grouped pass; scoring is a broadcast join back.
# ---------------------------------------------------------------------------


@register(
    "q105_zscore_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s1,
             CAST(SUM(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  AS DECIMAL(38,0)) * CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ), stats AS (
      SELECT event_type,
             (CAST(s1 AS DOUBLE) / 100.0) / n AS mean,
             SQRT(s2 / 10000.0 / n - ((CAST(s1 AS DOUBLE) / 100.0) / n)
                  * ((CAST(s1 AS DOUBLE) / 100.0) / n)) AS std
      FROM m
    )
    SELECT e.event_id,
           FLOOR(((e.value - s.mean) / s.std) * 10000.0 + 0.5) / 10000.0 AS z,
           abs((e.value - s.mean) / s.std) > 3 AS is_outlier
    FROM events e JOIN stats s ON e.event_type = s.event_type
    ORDER BY e.event_id
    """,
    category="stats",
)
def q105_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents.cast("decimal(38,0)") * cents).cast("double").alias("s2"),
    )
    mean = (F.col("s1").cast("double") / 100.0) / F.col("n")
    std = F.sqrt(F.col("s2") / 10000.0 / F.col("n") - mean * mean)
    stats = m.select("event_type", mean.alias("mean"), std.alias("std"))
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            (F.floor(z * 10000.0 + F.lit(0.5)) / F.lit(10000.0)).alias("z"),
            (F.abs(z) > 3).alias("is_outlier"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q106 — per-group OLS trend: slope/intercept of value vs event-hour from
# the same exact power-sum machinery (closed form, no UDF, one grouped
# pass) — "is engagement rising per event type".
# ---------------------------------------------------------------------------


@register(
    "q106_trend_lines",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS x,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS yc
      FROM events
    ), m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(yc) AS sy,
             SUM(x * x) AS sxx,
             CAST(SUM(x * yc) AS DOUBLE) AS sxy
      FROM b GROUP BY event_type
    )
    SELECT event_type, n,
           FLOOR(((n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS slope_per_hour,
           FLOOR(((CAST(sy AS DOUBLE) / 100.0 / n)
                  - ((n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0)
                    * (CAST(sx AS DOUBLE) / n))
                 * 1000000.0 + 0.5) / 1000000.0 AS intercept
    FROM m
    ORDER BY event_type
    """,
    category="stats",
)
def q106_trend_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    x = (
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp")))
        / F.lit(3600)
    ).cast("long")
    yc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    m = e.select("event_type", x.alias("x"), yc.alias("yc")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("yc")).cast("double").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    slope = (
        (F.col("n") * F.col("sxy") - sx_d * sy_d)
        / (n_d * F.col("sxx").cast("double") - sx_d * sx_d)
        / 100.0
    )
    intercept = (sy_d / 100.0 / F.col("n")) - slope * (sx_d / F.col("n"))
    r6 = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    return m.select(
        "event_type",
        "n",
        r6(slope).alias("slope_per_hour"),
        r6(intercept).alias("intercept"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q107 — time-weighted average value per user (TWAP): each observation is
# held until the next event; weight = holding seconds (lead - ts). One
# window pass + exact fixed-point weighted sums.
# ---------------------------------------------------------------------------


@register(
    "q107_time_weighted_avg",
    oracle="""
    WITH w AS (
      SELECT user_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
             CAST(date_diff('second', ts,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                  AS BIGINT) AS hold_s
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_holds,
           CAST(SUM(vc * hold_s) AS DOUBLE)
             / (100.0 * CAST(SUM(hold_s) AS DOUBLE)) AS twap
    FROM w
    WHERE hold_s IS NOT NULL AND hold_s > 0
    GROUP BY user_id
    ORDER BY user_id
    """,
    category="stats",
)
def q107_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hold = (
        F.unix_timestamp(F.lead("ts").over(win)) - F.unix_timestamp("ts")
    ).cast("long")
    w = e.select("user_id", vc.alias("vc"), hold.alias("hold_s")).filter(
        F.col("hold_s").isNotNull() & (F.col("hold_s") > 0)
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count("*").alias("n_holds"),
            (
                F.sum(F.col("vc") * F.col("hold_s")).cast("double")
                / (F.lit(100.0) * F.sum("hold_s").cast("double"))
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q116 — equi-DEPTH histogram (deciles): ntile over a total order gives
# equal-population bins with their value boundaries — the profile view
# equal-width bins (q87) can't give for skewed distributions. The total
# order is computed DISTRIBUTED (operators/relational_ext.global_rank:
# range-repartition -> per-partition rank -> offset shift), so no fact row
# ever flows through a single-partition WindowExec; NTILE semantics are
# reconstructed from the rank (ntile_from_rank). Same oracle as before —
# DuckDB's native NTILE must agree with the distributed formulation.
# ---------------------------------------------------------------------------


@register(
    "q116_equidepth_histogram",
    oracle="""
    WITH ranked AS (
      SELECT value,
             CAST(NTILE(10) OVER (ORDER BY value, event_id) AS BIGINT) AS decile
      FROM events
    )
    SELECT decile,
           COUNT(*) AS n,
           FLOOR(MIN(value) * 100 + 0.5) / 100.0 AS lo,
           FLOOR(MAX(value) * 100 + 0.5) / 100.0 AS hi
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
    category="stats",
)
def q116_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.relational_ext import (
        global_rank,
        ntile_from_rank,
    )

    e = table(spark, sf_dir, "events").select("value", "event_id")
    n = e.count()
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    ranked = global_rank(e, ["value", "event_id"], rank_col="_r")
    return (
        ranked.select("value", ntile_from_rank(F.col("_r"), n, 10).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            r2(F.min("value")).alias("lo"),
            r2(F.max("value")).alias("hi"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q155 — equi-depth histogram, SKETCH PATH: the single-pass approximation
# that replaces even the distributed total order at 100 TB. One narrow
# pass bins values onto a fixed 1024-cell grid between the exact min/max;
# decile boundaries are read off the (tiny) cumulative grid histogram and
# broadcast back for one more narrow bucketing pass. Nothing wider than
# 1024 rows is ever shuffled or sorted. The algorithm is deterministic
# (integer counts + identical IEEE cell arithmetic), so the oracle replays
# it exactly — the approximation is hash-checked, not just row-counted.
# q116 stays as the exact verifier of the same report shape.
# ---------------------------------------------------------------------------

_ED_CELLS = 1024


@register(
    "q155_equidepth_histogram_approx",
    oracle=f"""
    WITH s AS (
      SELECT COUNT(*) AS n, MIN(value) AS vmin, MAX(value) AS vmax FROM events
    ),
    c AS (
      SELECT e.event_id, e.value,
             LEAST({_ED_CELLS - 1}, GREATEST(0, CAST(FLOOR(
               (e.value - s.vmin) / ((s.vmax - s.vmin) / {_ED_CELLS}.0)
             ) AS BIGINT))) AS cell
      FROM events e, s
    ),
    cum AS (
      SELECT cell, SUM(cnt) OVER (ORDER BY cell) AS cum FROM (
        SELECT cell, COUNT(*) AS cnt FROM c GROUP BY cell)
    ),
    b AS (
      SELECT g.i, MIN(cum.cell) AS bcell
      FROM cum, generate_series(1, 9) g(i), s
      WHERE cum.cum >= (g.i * s.n + 9) // 10
      GROUP BY g.i
    ),
    d AS (
      SELECT c.event_id, c.value,
             1 + COUNT(b.i) AS decile
      FROM c LEFT JOIN b ON b.bcell < c.cell
      GROUP BY c.event_id, c.value
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n,
           FLOOR(MIN(value) * 100 + 0.5) / 100.0 AS lo,
           FLOOR(MAX(value) * 100 + 0.5) / 100.0 AS hi
    FROM d
    GROUP BY decile
    ORDER BY decile
    """,
    category="stats",
)
def q155_equidepth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_id", "value")
    n, vmin, vmax = e.agg(
        F.count("*"), F.min("value"), F.max("value")
    ).collect()[0]
    step = (vmax - vmin) / float(_ED_CELLS)
    cell = F.least(
        F.lit(_ED_CELLS - 1),
        F.greatest(
            F.lit(0), F.floor((F.col("value") - F.lit(vmin)) / F.lit(step))
        ),
    ).cast("long")
    cells = e.select("value", cell.alias("cell"))
    # tiny grid histogram (<= 1024 rows) -> decile boundary cells, computed
    # driver-side with pure integer arithmetic (bounded state, like CC's
    # convergence scalars)
    hist = sorted(
        (r["cell"], r["n"])
        for r in cells.groupBy("cell").agg(F.count("*").alias("n")).collect()
    )
    targets = [(i * n + 9) // 10 for i in range(1, 10)]
    bounds, cum, t = [], 0, 0
    for c, cnt in hist:
        cum += cnt
        while t < 9 and cum >= targets[t]:
            bounds.append(c)
            t += 1
    decile = F.lit(1)
    for b in bounds:
        decile = decile + (F.col("cell") > F.lit(b)).cast("int")
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    return (
        cells.select("value", decile.cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            r2(F.min("value")).alias("lo"),
            r2(F.max("value")).alias("hi"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q117 — session conversion: q42's gaps-and-islands sessions, each flagged
# by whether it contains a purchase; conversion = converted sessions /
# sessions per user-day cohort.
# ---------------------------------------------------------------------------


@register(
    "q117_session_conversion",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), sess AS (
      SELECT *, CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM marked
    ), per_session AS (
      SELECT user_id, session_seq,
             CAST(min(ts) AS DATE) AS session_day,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM sess GROUP BY user_id, session_seq
    )
    SELECT session_day,
           COUNT(*) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           FLOOR((CAST(SUM(converted) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5)
             / 10000.0 AS conversion_rate
    FROM per_session
    GROUP BY session_day
    ORDER BY session_day
    """,
    category="stats",
)
def q117_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                epoch_micros(F.col("ts")) - epoch_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    per_session = (
        marked.withColumn("session_seq", F.sum("is_new").over(run).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.col("ts")).cast("date").alias("session_day"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    rate = F.floor(
        (F.sum("converted").cast("double") / F.count("*")) * 10000.0 + F.lit(0.5)
    ) / F.lit(10000.0)
    return (
        per_session.groupBy("session_day")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
            rate.alias("conversion_rate"),
        )
        .orderBy("session_day")
    )


# ---------------------------------------------------------------------------
# q143 — time-series linear interpolation: per-user daily value totals on a
# full date spine, with missing days filled by linear interpolation between
# the neighboring observed days (edges held to the nearest observation).
# The resample-and-fill step before feeding regularly-spaced models.
#
# Complements q110 (zero-fill): interpolation needs BOTH neighbors, built
# from two ignore-nulls window passes (backward last + forward first) — one
# shuffle on user_id, both window frames share its sort. The spine
# cross-join is users x days where days is tiny and broadcast.
# ---------------------------------------------------------------------------


@register(
    "q143_interpolate_timeseries",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             FLOOR(value * 100 + 0.5) AS cents
      FROM events WHERE user_id < 50
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM f
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), daily AS (
      SELECT user_id, day, CAST(SUM(cents) AS DOUBLE) / 100.0 AS observed
      FROM f GROUP BY 1, 2
    ), grid AS (
      SELECT u.user_id, s.day, d.observed
      FROM (SELECT DISTINCT user_id FROM f) u
      CROSS JOIN spine s
      LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day
    ), nb AS (
      SELECT user_id, day, observed,
             last_value(observed IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
             last_value(CASE WHEN observed IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
             first_value(observed IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
             first_value(CASE WHEN observed IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      FROM grid
    )
    SELECT user_id, day,
           (FLOOR((CASE
              WHEN observed IS NOT NULL THEN observed
              WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
                prev_val + (next_val - prev_val)
                  * (CAST(day - prev_day AS DOUBLE)
                     / CAST(next_day - prev_day AS DOUBLE))
              ELSE COALESCE(prev_val, next_val) END) * 10000.0 + 0.5) / 10000.0)
             AS value_filled,
           CAST(CASE WHEN observed IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_observed
    FROM nb ORDER BY user_id, day
    """,
    category="stats",
)
def q143_interpolate_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    f = e.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("cents"),
    )
    bounds = f.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        f.groupBy("user_id", "day")
        .agg((F.sum("cents").cast("double") / 100.0).alias("observed"))
    )
    grid = (
        f.select("user_id").distinct()
        .crossJoin(F.broadcast(spine))
        .join(daily, ["user_id", "day"], "left")
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("observed").isNotNull(), F.col("day"))
    nb = grid.select(
        "user_id",
        "day",
        "observed",
        F.last("observed", ignorenulls=True).over(w_back).alias("prev_val"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_day"),
        F.first("observed", ignorenulls=True).over(w_fwd).alias("next_val"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_day"),
    )
    lerp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        F.datediff("day", "prev_day").cast("double")
        / F.datediff("next_day", "prev_day").cast("double")
    )
    filled = (
        F.when(F.col("observed").isNotNull(), F.col("observed"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(), lerp
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
    )
    return nb.select(
        "user_id",
        "day",
        (F.floor(filled * 10000.0 + F.lit(0.5)) / 10000.0).alias("value_filled"),
        F.col("observed").isNotNull().cast("long").alias("is_observed"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# q150 — winsorized (clamped) robust statistics per segment: balances
# clamp to the exact [p05, p95] percentile band, then aggregate. Outlier
# handling before feature computation; the percentile pre-pass is one
# small agg joined back by broadcast (bounds table = |segments| rows), so
# the fact side is scanned twice but shuffled once. Bounds round to 4dp
# BEFORE the clamp comparison so the boundary decision is bit-identical
# across engines; clamped values quantize to cents for the exact
# integer-sum mean.
# ---------------------------------------------------------------------------


@register(
    "q150_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment,
             FLOOR(quantile_cont(c_acctbal, 0.05) * 10000 + 0.5) / 10000 AS lo,
             FLOOR(quantile_cont(c_acctbal, 0.95) * 10000 + 0.5) / 10000 AS hi
      FROM customer GROUP BY 1
    ), w AS (
      SELECT c.c_mktsegment, b.lo, b.hi,
             CASE WHEN c.c_acctbal < b.lo THEN 1 ELSE 0 END AS is_lo,
             CASE WHEN c.c_acctbal > b.hi THEN 1 ELSE 0 END AS is_hi,
             CAST(FLOOR(LEAST(GREATEST(c.c_acctbal, b.lo), b.hi) * 100 + 0.5)
               AS BIGINT) AS cents
      FROM customer c JOIN b USING (c_mktsegment)
    )
    SELECT c_mktsegment, ANY_VALUE(lo) AS p05, ANY_VALUE(hi) AS p95,
           CAST(SUM(is_lo) AS BIGINT) AS n_clamped_low,
           CAST(SUM(is_hi) AS BIGINT) AS n_clamped_high,
           FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 * 10000 + 0.5)
             / 10000 AS winsorized_mean
    FROM w GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    category="stats",
)
def q150_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    b = c.groupBy("c_mktsegment").agg(
        (F.floor(F.percentile("c_acctbal", 0.05) * 10000 + F.lit(0.5)) / 10000).alias(
            "lo"
        ),
        (F.floor(F.percentile("c_acctbal", 0.95) * 10000 + F.lit(0.5)) / 10000).alias(
            "hi"
        ),
    )
    clamped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    w = c.join(F.broadcast(b), "c_mktsegment").select(
        "c_mktsegment",
        "lo",
        "hi",
        (F.col("c_acctbal") < F.col("lo")).cast("long").alias("is_lo"),
        (F.col("c_acctbal") > F.col("hi")).cast("long").alias("is_hi"),
        F.floor(clamped * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return (
        w.groupBy("c_mktsegment")
        .agg(
            F.any_value("lo").alias("p05"),
            F.any_value("hi").alias("p95"),
            F.sum("is_lo").alias("n_clamped_low"),
            F.sum("is_hi").alias("n_clamped_high"),
            (
                F.floor(
                    F.sum("cents").cast("double") / F.count("*") / 100.0 * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("winsorized_mean"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q154 — co-occurrence (market-basket) pairs: which event types appear
# together in the same user-day "basket", counted over all baskets. Built
# WITHOUT a self-join: collect_set per basket (one shuffle), then ordered
# pairs from the sorted array by pure array ops (narrow), then one
# pair-count agg keyed on ~|types|^2 keys. The self-join formulation
# shuffles the fact table twice and explodes on hot baskets; this shape's
# explode is bounded by k^2 per basket (k = distinct types, here <= 5).
# ---------------------------------------------------------------------------


@register(
    "q154_event_cooccurrence",
    oracle="""
    WITH baskets AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             list_sort(list_distinct(list(event_type))) AS types
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.t AS type_a, b.t AS type_b
      FROM baskets, unnest(types) AS a(t), unnest(types) AS b(t)
      WHERE a.t < b.t
    )
    SELECT type_a, type_b, COUNT(*) AS n_baskets
    FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
    """,
    category="stats",
)
def q154_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    baskets = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    # ordered pairs (a < b) from the sorted array: for index i, pair with
    # every later element — flatten(transform(indices, i -> transform(tail..)))
    types = F.col("types")
    idx = F.sequence(F.lit(0), F.size(types) - 2)
    pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(types, i + 2, F.size(types)),
                lambda b: F.struct(
                    F.element_at(types, i + 1).alias("type_a"), b.alias("type_b")
                ),
            ),
        )
    )
    return (
        baskets.filter(F.size(types) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_baskets"))
        .orderBy("type_a", "type_b")
    )
