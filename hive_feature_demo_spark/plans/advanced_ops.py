"""Advanced operator families beyond the SURVEY §2 checklist: SCD type-2
history building, bounded-round graph algorithms (label propagation,
triangle counting), skew-safe salted aggregation, Pareto-skyline
selection, EWMA smoothing, and robust (MAD) outlier detection.

Determinism rules as everywhere in this repo: money/value sums go through
the exact-decimal or scaled-long path (functions/numeric.py), timestamps
serialize via date_format, iterative algorithms run a FIXED number of
rounds with integer or exactly-representable arithmetic so the DuckDB
oracle can replay them CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import (
    exact_sum,
    round_det,
    sql_exact_sum,
    sql_exact_sum_fixed,
    sql_hex_to_int,
    sql_round_det,
)
from hive_feature_demo_spark.plans.registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# Session bounds shared with q160/q162 (strict 30-minute gap) so the graph
# queries below describe the same graph.
_SESS_SQL = """
    WITH seq AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), sess AS (
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM marked
    ), s AS (
      SELECT user_id, session_seq, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_seq
    ), pairs AS MATERIALIZED (
      -- MATERIALIZED (DuckDB/Postgres CTE hint): the quadratic session
      -- self-join is referenced 2-3x by the graph oracles (q185/q186/
      -- q254/q274/q328) and DuckDB 1.0 inlines CTEs, re-executing it per
      -- reference — q328's oracle measured 117 s plain vs 35 s with
      -- pairs pinned at sf0.1. Result-identical (compare()-verified).
      SELECT a.user_id AS ua, b.user_id AS ub
      FROM s a JOIN s b
        ON a.user_id < b.user_id
       AND a.s_start <= b.s_end AND b.s_start <= a.s_end
      GROUP BY 1, 2
    )"""


def _overlap_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique undirected session-overlap edges (ua < ub), q160's definition."""
    from hive_feature_demo_spark.plans.relational_ext import (
        q160_overlapping_session_pairs,
    )

    return q160_overlapping_session_pairs(spark, sf_dir).select(
        F.col("user_a").alias("ua"), F.col("user_b").alias("ub")
    )


# ---------------------------------------------------------------------------
# q184 — SCD type-2 history build: collapse each user's consecutive run of
# equal event_type into one [valid_from, valid_to) row, open-ended for the
# current run. The standard gaps-and-islands shape (one window pass + one
# aggregate + one lead) — this is how a slowly-changing dimension is
# DERIVED from an event log, complementing q129's SCD-1 merge which
# OVERWRITES in place. Scale: everything partitions by user_id; no global
# operator anywhere.
# ---------------------------------------------------------------------------


@register(
    "q184_scd2_history",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), runs AS (
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_seq
      FROM marked
    ), spans AS (
      SELECT user_id, run_seq, event_type,
             MIN(ts) AS vf, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_seq, event_type
    )
    SELECT user_id, event_type,
           strftime(vf, '{_TS_FMT_DUCK}') AS valid_from,
           strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf),
                    '{_TS_FMT_DUCK}') AS valid_to,
           CAST(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf) IS NULL
                AS BOOLEAN) AS is_current,
           n_events
    FROM spans
    ORDER BY user_id, valid_from
    """,
    category="relational",
)
def q184_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.col("event_type") != F.lag("event_type").over(w)),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    spans = (
        marked.withColumn("run_seq", F.sum("is_new").over(run))
        .groupBy("user_id", "run_seq", "event_type")
        .agg(F.min("ts").alias("vf"), F.count("*").alias("n_events"))
    )
    ww = Window.partitionBy("user_id").orderBy("vf")
    return (
        spans.withColumn("vt", F.lead("vf").over(ww))
        .select(
            "user_id",
            "event_type",
            F.date_format("vf", _TS_FMT).alias("valid_from"),
            F.date_format("vt", _TS_FMT).alias("valid_to"),
            F.col("vt").isNull().alias("is_current"),
            "n_events",
        )
        .orderBy("user_id", "valid_from")
    )


# ---------------------------------------------------------------------------
# q185 — bounded-round min-label propagation over the session-overlap
# graph: after k rounds every node holds the minimum user_id within k hops
# — community seeds for downstream grouping. Differs from the CC operators
# (q86/q127: iterate to convergence, result = full component) in that the
# round count is FIXED, making cost predictable at 100 TB (k joins + k
# partial-agg shuffles, edge list materialized once) and the result
# exactly replayable as k unrolled CTEs in the oracle.
# ---------------------------------------------------------------------------

_LP_ITERS = 4


def _lp_oracle() -> str:
    head = (
        _SESS_SQL
        + """, edges AS MATERIALIZED (
      SELECT ua AS src, ub AS dst FROM pairs
      UNION ALL
      SELECT ub AS src, ua AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT user_id AS v FROM events
    ), l0 AS (
      SELECT v, v AS lbl FROM nodes
    )"""
    )
    # each round references the previous round's CTE twice (current label
    # + neighbor MIN) — inlined, DuckDB re-evaluates the whole prefix per
    # reference, 2^k chains for k rounds; MATERIALIZED pins each round
    steps = []
    for i in range(_LP_ITERS):
        steps.append(f""", l{i + 1} AS MATERIALIZED (
      SELECT n.v, LEAST(cur.lbl, COALESCE(nb.nlbl, cur.lbl)) AS lbl
      FROM nodes n
      JOIN l{i} cur ON n.v = cur.v
      LEFT JOIN (
        SELECT e.dst AS v, MIN(l{i}.lbl) AS nlbl
        FROM edges e JOIN l{i} ON e.src = l{i}.v
        GROUP BY e.dst
      ) nb ON n.v = nb.v
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT v AS user_id, lbl AS community_seed FROM l{_LP_ITERS}
    ORDER BY user_id
    """
    )


@register("q185_label_propagation", oracle=_lp_oracle(), category="relational")
def q185_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.graph_ops import min_label_rounds

    pairs = _overlap_edges(spark, sf_dir)
    nodes = (
        table(spark, sf_dir, "events").select(F.col("user_id").alias("v")).distinct()
    )
    lbl = min_label_rounds(nodes, pairs, _LP_ITERS)
    return lbl.select(
        F.col("v").alias("user_id"), F.col("lbl").alias("community_seed")
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q186 — per-user triangle participation on the session-overlap graph.
# Canonical a<b<c enumeration counts each triangle exactly once: wedge
# join on the shared middle vertex, closed by an inner join against the
# (a,c) edge. Scale shape: the wedge
# join shuffles on the middle vertex b (bounded by per-vertex degree; the
# classic refinement — orient edges by (degree, id) — halves wedge count
# and is noted, not needed, at driver scale); the closing join shuffles on
# the (a,c) pair. Per-user counts come from exploding each closed
# triangle's three corners.
# ---------------------------------------------------------------------------


@register(
    "q186_triangle_participation",
    oracle=_SESS_SQL
    + """, tri AS (
      SELECT e1.ua AS a, e1.ub AS b, e2.ub AS c
      FROM pairs e1
      JOIN pairs e2 ON e1.ub = e2.ua          -- wedge a<b<c via middle b
      JOIN pairs e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
    ), corners AS (
      SELECT a AS user_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT user_id, COUNT(*) AS n_triangles
    FROM corners
    GROUP BY user_id
    ORDER BY user_id
    """,
    category="relational",
)
def q186_triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.graph_ops import triangle_participation

    return triangle_participation(_overlap_edges(spark, sf_dir)).orderBy("user_id")


# ---------------------------------------------------------------------------
# q187 — skew-safe salted aggregation: the two-phase (key, salt) -> key
# pattern that keeps one hot key from pinning a single reducer at 100 TB.
# Results are bit-identical to the direct aggregate because the partial
# sums are exact decimals (associative) and counts are integers — the
# oracle IS the direct aggregate. Salt = event_id mod 32: deterministic,
# uniform, and free (no hash computation).
# ---------------------------------------------------------------------------


@register(
    "q187_salted_aggregation",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_exact_sum('value')} AS value_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    category="relational",
)
def q187_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    partial = (
        e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(32)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(25,10)")).alias("ps"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("ps").cast("double").alias("value_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q188 — Pareto skyline per language: documents not dominated on
# (n_chars, token_count) — the multi-criteria "best corpus examples"
# selector (dominated = another doc in the same language is >= on both
# axes and > on one). O(n^2) NOT EXISTS is replaced by two windows over
# n_chars: the max token_count among STRICTLY longer docs (range frame)
# and among equal-length docs — a doc survives iff it beats the former
# and matches the latter. One shuffle on (lang), single pass, no
# self-join: the 100 TB shape for 2-D skylines.
# ---------------------------------------------------------------------------


@register(
    "q188_skyline_documents",
    oracle="""
    WITH d AS (
      SELECT lang, doc_id, n_chars,
             CAST(length(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT) AS token_count
      FROM documents
    ), m AS (
      SELECT *,
             MAX(token_count) OVER (
               PARTITION BY lang ORDER BY n_chars
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS max_tc_longer,
             MAX(token_count) OVER (
               PARTITION BY lang, n_chars) AS max_tc_equal
    FROM d
    )
    SELECT lang, doc_id, n_chars, token_count
    FROM m
    WHERE (max_tc_longer IS NULL OR token_count > max_tc_longer)
      AND token_count = max_tc_equal
    ORDER BY lang, n_chars DESC, doc_id
    """,
    category="textstats",
)
def q188_skyline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0)))
        .cast("long")
        .alias("token_count"),
    )
    from hive_feature_demo_spark.operators.graph_ops import skyline_2d

    return (
        skyline_2d(d, "lang", "n_chars", "token_count")
        .select("lang", "doc_id", "n_chars", "token_count")
        .orderBy("lang", F.desc("n_chars"), "doc_id")
    )


# ---------------------------------------------------------------------------
# q189 — EWMA over each user's last 10 events (decay 0.5). Weights 0.5^k
# for k<=9 are exact powers of two (exactly representable in both double
# and DECIMAL(25,10)), so weighted terms survive the exact-decimal sum
# bit-identically on both engines — the trick that makes an EWMA
# hash-checkable at all. One window pass (row_number desc) + one grouped
# exact sum; partitions by user_id throughout.
# ---------------------------------------------------------------------------


@register(
    "q189_ewma_user_values",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), last10 AS (
      SELECT user_id, value, POWER(0.5, rn - 1) AS w
      FROM ranked WHERE rn <= 10
    )
    SELECT user_id,
           COUNT(*) AS n_used,
           {sql_round_det(
               sql_exact_sum('value * w') + ' / ' + sql_exact_sum('w'), 6)}
             AS ewma
    FROM last10
    GROUP BY user_id
    ORDER BY user_id
    """,
    category="relational",
)
def q189_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last10 = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .withColumn("w", F.pow(F.lit(0.5), F.col("rn") - 1))
    )
    return (
        last10.groupBy("user_id")
        .agg(
            F.count("*").alias("n_used"),
            round_det(
                exact_sum(F.col("value") * F.col("w")) / exact_sum(F.col("w")), 6
            ).alias("ewma"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q190 — robust outlier report per event_type: median, MAD (median
# absolute deviation), and the count beyond 3 MADs. Two grouped exact
# percentiles with a broadcast join of the 4-row median table between
# them — the robust-statistics counterpart to q105's z-scores (mean/std
# break under heavy tails; median/MAD do not). At 100 TB swap the exact
# percentile for the q155 sketch path; semantics otherwise identical.
# ---------------------------------------------------------------------------


@register(
    "q190_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS median_value
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, med.median_value,
             ABS(e.value - med.median_value) AS adev
      FROM events e JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad_value
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           {sql_round_det('ANY_VALUE(dev.median_value)', 4)} AS median_value,
           {sql_round_det('ANY_VALUE(mad.mad_value)', 4)} AS mad_value,
           COUNT(*) AS n_events,
           SUM(CASE WHEN dev.adev > 3 * mad.mad_value THEN 1 ELSE 0 END)
             AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    ORDER BY dev.event_type
    """,
    category="relational",
)
def q190_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("median_value")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("median_value"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad_value")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            round_det(F.any_value("median_value"), 4).alias("median_value"),
            round_det(F.any_value("mad_value"), 4).alias("mad_value"),
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_value"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q198 — declarative data-quality expectations (the Deequ/dbt-test
# pattern): a rule catalog evaluated in bulk, one row per rule with
# checked/violation counts and a pass flag. Scale shape: all row-level
# rules for a table fold into ONE conditional-aggregate scan of that
# table (no per-rule passes); the uniqueness and referential rules are
# the only ones needing a shuffle (distinct count / anti join). Adding a
# rule adds a column to the scan, not a job.
# ---------------------------------------------------------------------------


@register(
    "q198_data_expectations",
    oracle="""
    WITH o AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                      THEN 1 ELSE 0 END) AS bad_price,
             SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS bad_status,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys
      FROM orders
    ), l AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                      THEN 1 ELSE 0 END) AS bad_discount,
             SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS bad_qty
      FROM lineitem
    ), ref AS (
      SELECT COUNT(*) AS orphans FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ), rules AS (
      SELECT 1 AS rule_id, 'orders.totalprice_positive' AS rule_name,
             o.n AS n_checked, o.bad_price AS n_violations FROM o
      UNION ALL SELECT 2, 'orders.status_in_domain', o.n, o.bad_status FROM o
      UNION ALL SELECT 3, 'orders.orderkey_unique', o.n, o.dup_keys FROM o
      UNION ALL SELECT 4, 'lineitem.discount_in_range', l.n, l.bad_discount FROM l
      UNION ALL SELECT 5, 'lineitem.quantity_in_range', l.n, l.bad_qty FROM l
      UNION ALL SELECT 6, 'lineitem.orderkey_references_orders',
             (SELECT n FROM l), ref.orphans FROM ref
    )
    SELECT rule_id, rule_name, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM rules ORDER BY rule_id
    """,
    category="relational",
)
def q198_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    o_stats = o.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        ).alias("bad_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
    ).first()
    l_stats = l.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).alias("bad_discount"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).alias("bad_qty"),
    ).first()
    orphans = (
        l.select("l_orderkey")
        .join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .count()
    )
    rows = [
        (1, "orders.totalprice_positive", o_stats["n"], o_stats["bad_price"]),
        (2, "orders.status_in_domain", o_stats["n"], o_stats["bad_status"]),
        (3, "orders.orderkey_unique", o_stats["n"], o_stats["dup_keys"]),
        (4, "lineitem.discount_in_range", l_stats["n"], l_stats["bad_discount"]),
        (5, "lineitem.quantity_in_range", l_stats["n"], l_stats["bad_qty"]),
        (6, "lineitem.orderkey_references_orders", l_stats["n"], orphans),
    ]
    report = spark.createDataFrame(
        rows, "rule_id int, rule_name string, n_checked bigint, n_violations bigint"
    )
    return report.withColumn("passed", F.col("n_violations") == 0).orderBy(
        "rule_id"
    )


# ---------------------------------------------------------------------------
# q205 — Markov transition matrix over each user's event sequence:
# P(next_type | type) in exact basis points (integer division), the
# sequence-model estimation primitive (session simulators, next-action
# prediction baselines). One window pass per user for the lead, one
# aggregate for pair counts, one window for row totals — everything
# partitions by user_id then by from_type; probabilities are integers so
# any engine hash-matches.
# ---------------------------------------------------------------------------


@register(
    "q205_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
             AS p_bp
    FROM pairs
    ORDER BY from_type, to_type
    """,
    category="relational",
)
def q205_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("from_type")
    return (
        pairs.withColumn("total", F.sum("n").over(tot))
        .withColumn("p_bp", F.expr("CAST(n * 10000 div total AS BIGINT)"))
        .select("from_type", "to_type", "n", "p_bp")
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# q215 — SCD-2 CDC apply: given the type-2 dimension built from history
# BEFORE a cutoff (q184's derivation) and the post-cutoff change batch,
# produce the new dimension incrementally — close out current rows that
# changed, merge boundary runs that did NOT change (a user's open row
# absorbs a continuation of the same value), append the new versions.
# The invariant IS the oracle: incremental apply == q184's full
# recompute over all events. Mechanism: closed pre-cutoff rows pass
# through untouched; each user's OPEN row becomes a virtual prior run
# unioned with the post-cutoff runs, and one more gaps-and-islands pass
# over runs (merge on equal adjacent type) rebuilds the tail. Cost is
# O(closed rows pass-through + open rows + delta), never O(history) —
# the emulation of MERGE INTO for SCD-2 on engines without a
# transactional table format.
# ---------------------------------------------------------------------------

_SCD2_CUT = "2024-01-20"


def _scd2_runs(events: DataFrame) -> DataFrame:
    """Per-user consecutive equal-type runs: (user_id, event_type, vf,
    n_events), q184's gaps-and-islands core."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.col("event_type") != F.lag("event_type").over(w)),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return (
        marked.withColumn("run_seq", F.sum("is_new").over(run))
        .groupBy("user_id", "run_seq", "event_type")
        .agg(F.min("ts").alias("vf"), F.count("*").alias("n_events"))
        .drop("run_seq")
    )


@register(
    "q215_scd2_cdc_apply",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), runs AS (
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_seq
      FROM marked
    ), spans AS (
      SELECT user_id, run_seq, event_type,
             MIN(ts) AS vf, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_seq, event_type
    )
    SELECT user_id, event_type,
           strftime(vf, '{_TS_FMT_DUCK}') AS valid_from,
           strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf),
                    '{_TS_FMT_DUCK}') AS valid_to,
           CAST(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf) IS NULL
                AS BOOLEAN) AS is_current,
           n_events
    FROM spans
    ORDER BY user_id, valid_from
    """,
    category="relational",
)
def q215_scd2_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    base_runs = _scd2_runs(e.filter(F.col("ts") < _SCD2_CUT))
    delta_runs = _scd2_runs(e.filter(F.col("ts") >= _SCD2_CUT))
    # the CLOSED base rows (all but each user's last run) never change;
    # the OPEN row re-enters the merge as a virtual prior run
    w_last = Window.partitionBy("user_id").orderBy(F.desc("vf"))
    base = base_runs.withColumn("rn", F.row_number().over(w_last))
    closed = base.filter(F.col("rn") > 1).drop("rn")
    open_rows = base.filter(F.col("rn") == 1).drop("rn")
    # boundary merge: adjacent runs with the same type collapse (a user
    # whose post-cutoff activity continues the open row's type must not
    # spawn a new version) — one more gaps-and-islands, over RUNS
    tail = open_rows.unionByName(delta_runs)
    w_t = Window.partitionBy("user_id").orderBy("vf")
    run_t = w_t.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged_tail = (
        tail.withColumn(
            "is_new",
            F.when(
                F.lag("event_type").over(w_t).isNull()
                | (F.col("event_type") != F.lag("event_type").over(w_t)),
                1,
            ).otherwise(0),
        )
        .withColumn("grp", F.sum("is_new").over(run_t))
        .groupBy("user_id", "grp", "event_type")
        .agg(F.min("vf").alias("vf"), F.sum("n_events").alias("n_events"))
        .drop("grp")
    )
    dim = closed.unionByName(merged_tail)
    w_v = Window.partitionBy("user_id").orderBy("vf")
    return (
        dim.withColumn("vt", F.lead("vf").over(w_v))
        .select(
            "user_id",
            "event_type",
            F.date_format("vf", _TS_FMT).alias("valid_from"),
            F.date_format("vt", _TS_FMT).alias("valid_to"),
            F.col("vt").isNull().alias("is_current"),
            "n_events",
        )
        .orderBy("user_id", "valid_from")
    )


# ---------------------------------------------------------------------------
# q216 — temporal join against the SCD-2 dimension: each event looks up
# the user's state (q184's type-2 rows) valid AT the event's timestamp —
# the whole point of keeping type-2 history. Join on user_id with the
# validity interval as residual condition; per-user version chains are
# short, so the shuffled equi-join on user_id dominates and the interval
# residual filters within the join — no range machinery needed (compare
# q159's grid-cell join, which is for intervals WITHOUT an equi-key).
# Every event matches exactly one version by construction (intervals
# partition each user's timeline); the output cross-tabulates the
# user's state against the event's own type.
# ---------------------------------------------------------------------------


@register(
    "q216_scd2_temporal_join",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), runs AS (
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_seq
      FROM marked
    ), spans AS (
      SELECT user_id, run_seq, event_type AS state,
             MIN(ts) AS vf
      FROM runs GROUP BY user_id, run_seq, event_type
    ), dim AS (
      SELECT user_id, state, vf,
             LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf) AS vt
      FROM spans
    )
    SELECT d.state, e.event_type, COUNT(*) AS n_events
    FROM events e JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.vf AND (d.vt IS NULL OR e.ts < d.vt)
    GROUP BY d.state, e.event_type
    ORDER BY d.state, e.event_type
    """,
    category="relational",
)
def q216_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    runs = _scd2_runs(e).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        "vf",
    )
    w = Window.partitionBy("d_user").orderBy("vf")
    # the dimension is tiny (users x versions) — materialize it so the
    # probe side's events scan is the only fact read in the join
    dim = runs.withColumn("vt", F.lead("vf").over(w)).localCheckpoint(eager=True)
    cond = (
        (e.user_id == dim.d_user)
        & (e.ts >= dim.vf)
        & (dim.vt.isNull() | (e.ts < dim.vt))
    )
    return (
        e.join(dim, cond)
        .groupBy("state", "event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("state", "event_type")
    )


# ---------------------------------------------------------------------------
# q217 — right-to-be-forgotten cascade audit: given a deletion cohort,
# report exactly what a purge would remove from every table that
# references the subject — direct rows (customer), 1-hop facts (orders,
# events) and 2-hop facts (lineitem via orders) — plus the bytes-ish
# proxy of affected revenue. The audit runs BEFORE the destructive step
# everywhere compliance pipelines operate; each count is one semi join
# against the (broadcast) cohort, the lineitem leg semi-joins the
# affected orderkeys. Complements q140 (PII k-anonymization) on the
# deletion side of the compliance family.
# ---------------------------------------------------------------------------


@register(
    "q217_deletion_cascade_audit",
    oracle=f"""
    WITH cohort AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), aff_orders AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM cohort)
    )
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM cohort) AS n_rows,
           CAST(0.0 AS DOUBLE) AS affected_revenue
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM aff_orders),
           (SELECT COALESCE({sql_exact_sum_fixed('o_totalprice', 2)}, 0.0)
            FROM aff_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders)),
           (SELECT COALESCE({sql_exact_sum_fixed(
                'l_extendedprice * (1 - l_discount)', 4)}, 0.0)
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders))
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events
            WHERE user_id IN (SELECT c_custkey FROM cohort)),
           CAST(0.0 AS DOUBLE)
    ORDER BY table_name
    """,
    category="relational",
)
def q217_deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.functions.numeric import exact_sum_fixed

    cohort = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 97 == 0
    ).select("c_custkey")
    orders = table(spark, sf_dir, "orders")
    aff_orders = orders.join(
        F.broadcast(cohort), orders.o_custkey == cohort.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")
    lineitem = table(spark, sf_dir, "lineitem")
    aff_lines = lineitem.join(
        F.broadcast(aff_orders.select("o_orderkey")),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    events = table(spark, sf_dir, "events")
    aff_events = events.join(
        F.broadcast(cohort), events.user_id == cohort.c_custkey, "left_semi"
    )
    rows = [
        cohort.agg(
            F.lit("customer").alias("table_name"),
            F.count("*").alias("n_rows"),
            F.lit(0.0).alias("affected_revenue"),
        ),
        aff_orders.agg(
            F.lit("orders").alias("table_name"),
            F.count("*").alias("n_rows"),
            F.coalesce(
                exact_sum_fixed("o_totalprice", 2), F.lit(0.0)
            ).alias("affected_revenue"),
        ),
        aff_lines.agg(
            F.lit("lineitem").alias("table_name"),
            F.count("*").alias("n_rows"),
            F.coalesce(
                exact_sum_fixed(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ),
                F.lit(0.0),
            ).alias("affected_revenue"),
        ),
        aff_events.agg(
            F.lit("events").alias("table_name"),
            F.count("*").alias("n_rows"),
            F.lit(0.0).alias("affected_revenue"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# q218 — session path mining: the top-10 most frequent event-type paths
# (first 5 events of each session, q42's session bounds) — journey
# analysis for funnel design. Path assembly never leaves the JVM:
# array_sort over (rn, type) structs then transform+concat, one shuffle
# per stage (sessionize window -> path aggregate -> count). Full
# tiebreak (count desc, path) keeps top-10 deterministic.
# ---------------------------------------------------------------------------


@register(
    "q218_session_paths",
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
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM marked
    ), ranked AS (
      SELECT user_id, session_seq, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ), paths AS (
      SELECT user_id, session_seq,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 5
      GROUP BY user_id, session_seq
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
    category="relational",
)
def q218_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.functions.temporal import epoch_micros

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
    sess = marked.withColumn("session_seq", F.sum("is_new").over(run))
    w_s = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    paths = (
        sess.withColumn("rn", F.row_number().over(w_s))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id", "session_seq")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s.event_type,
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q219 — RFM customer scoring: recency / frequency / monetary quintiles
# and the composite segment code — THE classic CRM segmentation (and the
# reference's domain: its `query_crm` recency/spend filters are RFM
# predicates in disguise; cite backend/tools.py:31-34, 60-67). Recency
# anchors to the dataset's frozen max(o_orderdate) (the engine's frozen-
# today discipline, A4); quintiles are global ntile(5) with full
# tiebreaks — at 100 TB swap for the q116 distributed boundary
# computation, identical semantics. All-integer output hashes exactly.
# ---------------------------------------------------------------------------


@register(
    "q219_rfm_scoring",
    oracle=f"""
    WITH anchor AS (
      SELECT MAX(o_orderdate) AS today FROM orders
    ), per_cust AS (
      SELECT o.o_custkey AS c_custkey,
             datediff('day', MAX(o.o_orderdate), ANY_VALUE(a.today))
               AS recency_days,
             COUNT(*) AS frequency,
             {sql_exact_sum_fixed('o.o_totalprice', 2)} AS monetary
      FROM orders o CROSS JOIN anchor a
      GROUP BY o.o_custkey
    ), scored AS (
      SELECT c_custkey, recency_days, frequency, monetary,
             NTILE(5) OVER (ORDER BY recency_days ASC, c_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, c_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary DESC, c_custkey) AS m_score
      FROM per_cust
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           COUNT(*) AS n_customers,
           {sql_exact_sum_fixed('monetary', 2)} AS segment_revenue
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    category="relational",
)
def q219_rfm_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.functions.numeric import exact_sum_fixed

    o = table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("today"))
    per_cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.datediff(
                F.any_value("today").cast("date"),
                F.max("o_orderdate").cast("date"),
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            exact_sum_fixed("o_totalprice", 2, "monetary"),
        )
    )
    scored = (
        per_cust.withColumn(
            "r_score",
            F.ntile(5).over(Window.orderBy(F.asc("recency_days"), "c_custkey")),
        )
        .withColumn(
            "f_score",
            F.ntile(5).over(Window.orderBy(F.desc("frequency"), "c_custkey")),
        )
        .withColumn(
            "m_score",
            F.ntile(5).over(Window.orderBy(F.desc("monetary"), "c_custkey")),
        )
    )
    return (
        scored.groupBy(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum_fixed("monetary", 2, "segment_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# q220 — association rules over sessions: support / confidence / lift for
# ordered event-type pairs co-occurring in the same session (q42 bounds)
# — market-basket analysis with sessions as baskets. Counts come from
# one distinct (session, type) projection self-joined within session
# (vocabulary-bounded: |types|^2 pairs max); the probabilities are
# emitted in exact basis points (integer division) so the rule table
# hashes identically on any engine.
# ---------------------------------------------------------------------------


@register(
    "q220_association_rules",
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
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM marked
    ), sess_types AS (
      SELECT DISTINCT user_id, session_seq, event_type
      FROM sess
    ), n_sess AS (
      SELECT COUNT(DISTINCT (user_id, session_seq)) AS total FROM sess
    ), type_counts AS (
      SELECT event_type, COUNT(*) AS n FROM sess_types GROUP BY event_type
    ), pair_counts AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             COUNT(*) AS n_both
      FROM sess_types a JOIN sess_types b
        ON a.user_id = b.user_id AND a.session_seq = b.session_seq
       AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT p.antecedent, p.consequent, p.n_both,
           CAST(p.n_both * 10000 // ns.total AS BIGINT) AS support_bp,
           CAST(p.n_both * 10000 // ta.n AS BIGINT) AS confidence_bp,
           CAST((p.n_both * 10000 * ns.total) // (ta.n * tc.n) AS BIGINT)
             AS lift_centi
    FROM pair_counts p
    JOIN type_counts ta ON p.antecedent = ta.event_type
    JOIN type_counts tc ON p.consequent = tc.event_type
    CROSS JOIN n_sess ns
    ORDER BY p.antecedent, p.consequent
    """,
    category="relational",
)
def q220_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.functions.temporal import epoch_micros

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.select(
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
    ).withColumn("session_seq", F.sum("is_new").over(run))
    sess_types = sess.select("user_id", "session_seq", "event_type").distinct()
    sess_types = sess_types.localCheckpoint(eager=True)  # 3 consumers below
    n_sess = sess_types.select("user_id", "session_seq").distinct().count()
    type_counts = sess_types.groupBy("event_type").agg(F.count("*").alias("n"))
    a = sess_types.select(
        "user_id", "session_seq", F.col("event_type").alias("antecedent")
    )
    b = sess_types.select(
        F.col("user_id").alias("u2"),
        F.col("session_seq").alias("s2"),
        F.col("event_type").alias("consequent"),
    )
    pair_counts = (
        a.join(
            b,
            (a.user_id == F.col("u2"))
            & (a.session_seq == F.col("s2"))
            & (F.col("antecedent") != F.col("consequent")),
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_both"))
    )
    ta = type_counts.select(
        F.col("event_type").alias("ta_t"), F.col("n").alias("ta_n")
    )
    tc = type_counts.select(
        F.col("event_type").alias("tc_t"), F.col("n").alias("tc_n")
    )
    return (
        pair_counts.join(F.broadcast(ta), F.col("antecedent") == F.col("ta_t"))
        .join(F.broadcast(tc), F.col("consequent") == F.col("tc_t"))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.expr(f"CAST(n_both * 10000 div {n_sess} AS BIGINT)").alias(
                "support_bp"
            ),
            F.expr("CAST(n_both * 10000 div ta_n AS BIGINT)").alias(
                "confidence_bp"
            ),
            F.expr(
                f"CAST((n_both * 10000 * {n_sess}) div (ta_n * tc_n) AS BIGINT)"
            ).alias("lift_centi"),
        )
        .orderBy("antecedent", "consequent")
    )


# ---------------------------------------------------------------------------
# q221 — golden-record survivorship: for every exact-duplicate cluster
# (q30's normalized-text digests), merge the copies into ONE canonical
# record with per-attribute survivorship rules — id = earliest (min),
# lang/source = most frequent value in the cluster with deterministic
# min-value tiebreak (the "mode wins, first-seen breaks ties" MDM rule),
# n_chars = max. This is the step AFTER dedup detection: q30 finds the
# clusters, q31 keeps one row as-is; the golden record synthesizes the
# best of all copies. Mode-per-cluster = one count aggregate + one
# window max with (count desc, value asc) ordering — no sorting wars.
# ---------------------------------------------------------------------------


@register(
    "q221_golden_record",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest
      FROM documents
    ), clusters AS (
      SELECT digest FROM keyed GROUP BY digest HAVING COUNT(*) > 1
    ), members AS (
      SELECT k.* FROM keyed k JOIN clusters USING (digest)
    ), lang_mode AS (
      SELECT digest, lang FROM (
        SELECT digest, lang,
               ROW_NUMBER() OVER (PARTITION BY digest
                                  ORDER BY COUNT(*) DESC, lang) AS rn
        FROM members GROUP BY digest, lang
      ) WHERE rn = 1
    ), source_mode AS (
      SELECT digest, source FROM (
        SELECT digest, source,
               ROW_NUMBER() OVER (PARTITION BY digest
                                  ORDER BY COUNT(*) DESC, source) AS rn
        FROM members GROUP BY digest, source
      ) WHERE rn = 1
    )
    SELECT m.digest,
           MIN(m.doc_id) AS golden_id,
           COUNT(*) AS n_merged,
           ANY_VALUE(lm.lang) AS golden_lang,
           ANY_VALUE(sm.source) AS golden_source,
           MAX(m.n_chars) AS golden_n_chars
    FROM members m
    JOIN lang_mode lm ON m.digest = lm.digest
    JOIN source_mode sm ON m.digest = sm.digest
    GROUP BY m.digest
    ORDER BY golden_id
    """,
    category="curation",
)
def q221_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("digest"),
    )
    clusters = (
        keyed.groupBy("digest")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .select("digest")
    )
    members = keyed.join(clusters, "digest").localCheckpoint(eager=True)

    def mode_of(col: str) -> DataFrame:
        w = Window.partitionBy("digest").orderBy(
            F.desc("cnt"), F.asc(col)
        )
        return (
            members.groupBy("digest", col)
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("digest", F.col(col).alias(f"golden_{col}"))
        )

    return (
        members.groupBy("digest")
        .agg(
            F.min("doc_id").alias("golden_id"),
            F.count("*").alias("n_merged"),
            F.max("n_chars").alias("golden_n_chars"),
        )
        .join(mode_of("lang"), "digest")
        .join(mode_of("source"), "digest")
        .select(
            "digest",
            "golden_id",
            "n_merged",
            "golden_lang",
            "golden_source",
            "golden_n_chars",
        )
        .orderBy("golden_id")
    )


# ---------------------------------------------------------------------------
# q222 — join-blowup audit: before running a many-to-many join, predict
# its per-key output size from the two sides' key multiplicities
# (|left_k| x |right_k|) and flag the keys that dominate — here the
# click x purchase pairing per user that drives q69's stream-join state.
# Two cheap grouped counts + a 1:1 join on key, no fact-to-fact join at
# all: the diagnosis costs O(keys), the diagnosed join would cost
# O(sum of products). The top offenders are exactly the keys a salting
# or key-split strategy should target.
# ---------------------------------------------------------------------------


@register(
    "q222_join_blowup_audit",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT user_id, COUNT(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ), m AS (
      SELECT COALESCE(c.user_id, p.user_id) AS user_id,
             COALESCE(c.n_clicks, 0) AS n_clicks,
             COALESCE(p.n_purchases, 0) AS n_purchases
      FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    )
    SELECT user_id, n_clicks, n_purchases,
           CAST(n_clicks * n_purchases AS BIGINT) AS predicted_pairs
    FROM m
    ORDER BY predicted_pairs DESC, user_id
    LIMIT 10
    """,
    category="relational",
)
def q222_join_blowup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return (
        c.join(p, c.user_id == F.col("p_user"), "full_outer")
        .select(
            F.coalesce("user_id", "p_user").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .withColumn(
            "predicted_pairs",
            (F.col("n_clicks") * F.col("n_purchases")).cast("long"),
        )
        .orderBy(F.desc("predicted_pairs"), "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q223 — hierarchical share-of-parent: each nation's revenue as a share
# of its region, and each region's share of the total, in one pass —
# the drill-down ratio every BI hierarchy renders. One aggregate at the
# leaf grain, then two window sums up the hierarchy (region partition;
# global) — shares in exact basis points; no second scan, no self-join.
# ---------------------------------------------------------------------------


@register(
    "q223_share_of_parent",
    oracle=f"""
    WITH leaf AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region_name, nation_name,
           CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_cents * 10000
                // SUM(rev_cents) OVER (PARTITION BY region_name)
                AS BIGINT) AS share_of_region_bp,
           CAST(SUM(rev_cents) OVER (PARTITION BY region_name) * 10000
                // SUM(rev_cents) OVER ()
                AS BIGINT) AS region_share_of_total_bp
    FROM leaf
    ORDER BY region_name, nation_name
    """,
    category="relational",
)
def q223_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name"), "n_regionkey"
    )
    r = table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region_name")
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    leaf = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("region_name", "nation_name")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w_region = Window.partitionBy("region_name")
    w_all = Window.partitionBy()
    return (
        leaf.select(
            "region_name",
            "nation_name",
            (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
            F.expr(
                "CAST(rev_cents * 10000 div "
                "sum(rev_cents) OVER (PARTITION BY region_name) AS BIGINT)"
            ).alias("share_of_region_bp"),
            F.expr(
                "CAST(sum(rev_cents) OVER (PARTITION BY region_name) * 10000"
                " div sum(rev_cents) OVER () AS BIGINT)"
            ).alias("region_share_of_total_bp"),
        )
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# q224 — A/B exposure lift: users assigned to exposed/control by md5
# parity (deterministic, uniform, replayable — the hash-based bucketing
# every experimentation platform uses), then the difference in mean
# per-user purchase value with its two-sample z statistic. Means and
# variances go through the exact-decimal path; z rounds to 6dp (sqrt is
# correctly-rounded IEEE on both engines). A conversion-proportion test
# degenerates here (every synthetic user purchases), so the value-based
# contrast is the well-posed metric at every SF.
# ---------------------------------------------------------------------------


@register(
    "q224_ab_exposure_lift",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {sql_hex_to_int("md5(CAST(user_id AS VARCHAR))", '1', 1)} % 2 = 0
                  THEN 'exposed' ELSE 'control' END AS arm,
             {sql_exact_sum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
               AS purchase_value
      FROM events
      GROUP BY user_id
    ), arms AS (
      SELECT arm,
             COUNT(*) AS n_users,
             {sql_exact_sum('purchase_value')} AS sum_v,
             {sql_exact_sum('purchase_value * purchase_value')} AS sum_v2
      FROM per_user GROUP BY arm
    ), wide AS (
      SELECT
        (SELECT n_users FROM arms WHERE arm = 'exposed') AS n_e,
        (SELECT sum_v FROM arms WHERE arm = 'exposed') AS s_e,
        (SELECT sum_v2 FROM arms WHERE arm = 'exposed') AS q_e,
        (SELECT n_users FROM arms WHERE arm = 'control') AS n_c,
        (SELECT sum_v FROM arms WHERE arm = 'control') AS s_c,
        (SELECT sum_v2 FROM arms WHERE arm = 'control') AS q_c
    )
    SELECT CAST(n_e AS BIGINT) AS exposed_users,
           CAST(n_c AS BIGINT) AS control_users,
           {sql_round_det('s_e / n_e', 6)} AS exposed_mean,
           {sql_round_det('s_c / n_c', 6)} AS control_mean,
           {sql_round_det(
               '(s_e/n_e - s_c/n_c) / sqrt('
               '((q_e - s_e*s_e/n_e)/(n_e - 1))/n_e'
               ' + ((q_c - s_c*s_c/n_c)/(n_c - 1))/n_c)', 6)} AS z_stat
    FROM wide
    """,
    category="relational",
)
def q224_ab_exposure_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("long") % 2 == 0,
        "exposed",
    ).otherwise("control")
    pv = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
    per_user = (
        e.groupBy("user_id")
        .agg(exact_sum(pv, "purchase_value"))
        .withColumn("arm", arm)
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        exact_sum("purchase_value", "sum_v"),
        exact_sum(F.col("purchase_value") * F.col("purchase_value"), "sum_v2"),
    )
    exp = arms.filter(F.col("arm") == "exposed").select(
        F.col("n_users").alias("n_e"),
        F.col("sum_v").alias("s_e"),
        F.col("sum_v2").alias("q_e"),
    )
    ctl = arms.filter(F.col("arm") == "control").select(
        F.col("n_users").alias("n_c"),
        F.col("sum_v").alias("s_c"),
        F.col("sum_v2").alias("q_c"),
    )
    mean_e = F.col("s_e") / F.col("n_e")
    mean_c = F.col("s_c") / F.col("n_c")
    var_e = (F.col("q_e") - F.col("s_e") * F.col("s_e") / F.col("n_e")) / (
        F.col("n_e") - 1
    )
    var_c = (F.col("q_c") - F.col("s_c") * F.col("s_c") / F.col("n_c")) / (
        F.col("n_c") - 1
    )
    z = (mean_e - mean_c) / F.sqrt(
        var_e / F.col("n_e") + var_c / F.col("n_c")
    )
    return exp.crossJoin(ctl).select(
        F.col("n_e").cast("long").alias("exposed_users"),
        F.col("n_c").cast("long").alias("control_users"),
        round_det(mean_e, 6).alias("exposed_mean"),
        round_det(mean_c, 6).alias("control_mean"),
        round_det(z, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# q225 — cross-source duplication matrix: for every ordered source pair,
# how many of src_i's documents have an exact duplicate in src_j — the
# inter-feed contamination report corpus governance reads before
# assigning mixture weights (q142). One digest projection, one
# per-(digest, source) distinct, one within-digest pair join bounded by
# copies-per-digest; never touches text after the first scan.
# ---------------------------------------------------------------------------


@register(
    "q225_cross_source_dup_matrix",
    oracle="""
    WITH keyed AS (
      SELECT DISTINCT source,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_digests
    FROM keyed a JOIN keyed b
      ON a.digest = b.digest AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
    category="curation",
)
def q225_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("digest"),
    ).distinct()
    a = keyed.select(F.col("source").alias("source_a"), "digest")
    b = keyed.select(F.col("source").alias("source_b"), F.col("digest").alias("d2"))
    return (
        a.join(
            b,
            (F.col("digest") == F.col("d2"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_digests"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q226 — Kaplan-Meier churn curve: survival probability by activity day,
# where a user "churns" on the day of their last event. S(t) is the
# product-limit estimator Π(1 - d_i/n_i); the running product is
# computed as exp(Σ ln(...)) with each per-day term cast to exact
# decimal before the cumulative sum — identical binary doubles enter on
# both engines, so the 6dp-rounded curve hashes exactly. One grouped
# pass for per-day churn counts, one window for the risk set and the
# cumulative sum: O(days) state after aggregation.
# ---------------------------------------------------------------------------


@register(
    "q226_kaplan_meier_churn",
    oracle=f"""
    WITH last_day AS (
      SELECT user_id,
             datediff('day', (SELECT MIN(ts) FROM events), MAX(ts)) AS churn_day
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT churn_day, COUNT(*) AS d FROM last_day GROUP BY churn_day
    ), risk AS (
      SELECT churn_day, d,
             SUM(d) OVER (ORDER BY churn_day DESC) AS n_at_risk
      FROM daily
    )
    SELECT churn_day, d AS n_churned, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           {sql_round_det(
               "exp(SUM(CAST(ln(1.0 - CAST(d AS DOUBLE)/n_at_risk + "
               "CASE WHEN d = n_at_risk THEN 1e-12 ELSE 0 END) AS DECIMAL(25,10))"
               ") OVER (ORDER BY churn_day))", 6)} AS survival
    FROM risk
    ORDER BY churn_day
    """,
    category="relational",
)
def q226_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    t0 = e.agg(F.min("ts").alias("t0"))
    last_day = (
        e.crossJoin(F.broadcast(t0))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.max("ts").cast("date"), F.any_value("t0").cast("date")
            ).alias("churn_day")
        )
    )
    daily = last_day.groupBy("churn_day").agg(F.count("*").alias("d"))
    w_desc = Window.orderBy(F.desc("churn_day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = daily.withColumn("n_at_risk", F.sum("d").over(w_desc))
    # ln(1 - d/n) per day; the final day has d == n (everyone remaining
    # churns) where the true factor is 0 — the epsilon keeps ln finite
    # and is applied identically in the oracle
    term = F.log(
        1.0
        - F.col("d").cast("double") / F.col("n_at_risk")
        + F.when(F.col("d") == F.col("n_at_risk"), 1e-12).otherwise(0.0)
    ).cast("decimal(25,10)")
    w_asc = Window.orderBy("churn_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        risk.withColumn("survival", round_det(F.exp(F.sum(term).over(w_asc)), 6))
        .select(
            "churn_day",
            F.col("d").alias("n_churned"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            "survival",
        )
        .orderBy("churn_day")
    )


# ---------------------------------------------------------------------------
# q227 — Gini concentration of purchase value per event type: the
# inequality coefficient G = (2*Σ(i*v_i))/(n*Σv) - (n+1)/n over values
# sorted ascending (rank ties broken by event_id — fully deterministic).
# Rank-weighted products go through the exact-decimal sum; one window
# for ranks + one aggregate per group. The revenue-concentration metric
# behind "what share of spend comes from the top whales".
# ---------------------------------------------------------------------------


@register(
    "q227_gini_concentration",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rnk
      FROM events WHERE value > 0
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_round_det(
               "2.0 * " + sql_exact_sum('rnk * value')
               + " / (COUNT(*) * " + sql_exact_sum('value') + ")"
               + " - (COUNT(*) + 1.0) / COUNT(*)", 6)} AS gini
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
    category="relational",
)
def q227_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.withColumn("rnk", F.row_number().over(w))
    gini = round_det(
        2.0
        * exact_sum(F.col("rnk") * F.col("value"))
        / (F.count("*") * exact_sum("value"))
        - (F.count("*") + 1.0) / F.count("*"),
        6,
    )
    return (
        ranked.groupBy("event_type")
        .agg(F.count("*").alias("n_events"), gini.alias("gini"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q254 — bounded-round 2-core decomposition of the session-overlap graph:
# repeatedly peel nodes with fewer than 2 surviving neighbors, 3 fixed
# rounds (the full fixpoint is data-dependent; the `stable` flag reports
# per-node convergence, all-true == the peel converged). The community-
# skeleton extraction that precedes clustering at scale: each round is
# one integer-keyed degree aggregation over the checkpointed edge list.
# Completes the graph family: CC (q127), PageRank (q162), label
# propagation (q185), triangles (q186), k-core (here).
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 3


def _q254_oracle() -> str:
    rounds = "".join(
        f"""
    d{t} AS (
      SELECT e.u, COUNT(*) AS d
      FROM e JOIN a{t - 1} x ON e.u = x.u JOIN a{t - 1} y ON e.v = y.u
      GROUP BY e.u
    ),
    a{t} AS MATERIALIZED (SELECT u FROM d{t} WHERE d >= 2),"""
        for t in range(1, _KCORE_ROUNDS + 1)
    )
    return f"""
    {_SESS_SQL},
    e AS MATERIALIZED (SELECT ua AS u, ub AS v FROM pairs
          UNION ALL SELECT ub, ua FROM pairs),
    a0 AS (SELECT DISTINCT u FROM e),{rounds}
    df AS (
      SELECT e.u, COUNT(*) AS d
      FROM e JOIN a{_KCORE_ROUNDS} x ON e.u = x.u
             JOIN a{_KCORE_ROUNDS} y ON e.v = y.u
      GROUP BY e.u
    )
    SELECT a.u AS user_id,
           CAST(COALESCE(df.d, 0) AS BIGINT) AS core_degree,
           COALESCE(df.d, 0) >= 2 AS stable
    FROM a{_KCORE_ROUNDS} a LEFT JOIN df ON df.u = a.u
    ORDER BY user_id
    """


@register("q254_kcore_decomposition", oracle=_q254_oracle(), category="relational")
def q254_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.graph_ops import k_core_rounds

    pairs = _overlap_edges(spark, sf_dir)
    return k_core_rounds(pairs, k=2, rounds=_KCORE_ROUNDS).orderBy("user_id")


# ---------------------------------------------------------------------------
# q328 — the CAPPED graph-construction path (r6 verdict ask #1):
# graph_ops.cap_degree(k=8) over the session-overlap edges, then the
# same bounded-round 2-core peel as q254. cap_degree bounds the edge
# set BEFORE iteration — each node nominates its 8 smallest-id DISTINCT
# neighbors and an edge survives if either endpoint nominates it
# (nominations ≤ kN, so every peel round shuffles a linear edge set
# whatever the raw graph density). The oracle replays the nomination
# verbatim — symmetrize, DISTINCT, per-node ROW_NUMBER in neighbor-id
# order, prefix ≤ 8, least/greatest re-canonicalization, DISTINCT —
# then runs q254's round CTEs on the capped edges, so both the
# deterministic nomination SELECTION and the survivor core it induces
# are hash-gated. The cap genuinely bites at both correctness SFs
# (median overlap degree 17 at sf0.01, 180 at sf0.1 vs k=8).
# ---------------------------------------------------------------------------

_Q328_K = 8


def _q328_oracle() -> str:
    rounds = "".join(
        f"""
    d{t} AS (
      SELECT e.u, COUNT(*) AS d
      FROM e JOIN a{t - 1} x ON e.u = x.u JOIN a{t - 1} y ON e.v = y.u
      GROUP BY e.u
    ),
    a{t} AS MATERIALIZED (SELECT u FROM d{t} WHERE d >= 2),"""
        for t in range(1, _KCORE_ROUNDS + 1)
    )
    return f"""
    {_SESS_SQL},
    sym AS (
      SELECT DISTINCT u, v FROM (
        SELECT ua AS u, ub AS v FROM pairs
        UNION ALL SELECT ub, ua FROM pairs
      )
    ),
    nom AS (
      SELECT LEAST(u, v) AS ua, GREATEST(u, v) AS ub FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn
        FROM sym
      ) WHERE rn <= {_Q328_K}
    ),
    ce AS MATERIALIZED (SELECT DISTINCT ua, ub FROM nom),
    e AS (SELECT ua AS u, ub AS v FROM ce
          UNION ALL SELECT ub, ua FROM ce),
    a0 AS (SELECT DISTINCT u FROM e),{rounds}
    df AS (
      SELECT e.u, COUNT(*) AS d
      FROM e JOIN a{_KCORE_ROUNDS} x ON e.u = x.u
             JOIN a{_KCORE_ROUNDS} y ON e.v = y.u
      GROUP BY e.u
    )
    SELECT a.u AS user_id,
           CAST(COALESCE(df.d, 0) AS BIGINT) AS core_degree,
           COALESCE(df.d, 0) >= 2 AS stable
    FROM a{_KCORE_ROUNDS} a LEFT JOIN df ON df.u = a.u
    ORDER BY user_id
    """


@register("q328_capped_overlap_kcore", oracle=_q328_oracle(), category="relational")
def q328_capped_overlap_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.graph_ops import cap_degree, k_core_rounds

    pairs = _overlap_edges(spark, sf_dir)
    capped = cap_degree(pairs, k=_Q328_K)
    return k_core_rounds(capped, k=2, rounds=_KCORE_ROUNDS).orderBy("user_id")
