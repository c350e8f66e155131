"""Probabilistic-filter operators with exactly-replayable math: a Bloom
filter decontamination pre-screen and a count-min-sketch heavy-hitter
estimator. Both use md5-derived hash positions (no engine-specific hash
functions), so the DuckDB oracle reproduces the sketch bit-for-bit —
including its false positives / overestimates — and the accuracy
contracts (bloom ⊇ exact, cms >= exact) are verified value-for-value,
not just asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import sql_hex_to_int
from hive_feature_demo_spark.plans.registry import register

_N = 4  # shingle length, matching q138's decontamination definition

#: bloom geometry: 3 hash positions of 12 bits each (4096-bit filter),
#: all three sliced from ONE md5 — hex chars [1..3], [4..6], [7..9].
_BLOOM_BITS = 4096


def _bloom_pos_sql(h: str, slot: int) -> str:
    return sql_hex_to_int(h, str(1 + 3 * slot), 3)


def _bloom_pos_col(h, slot: int):
    return F.conv(F.substring(h, 1 + 3 * slot, 3), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# q195 — Bloom-filter decontamination pre-screen: benchmark (source src0)
# shingles set 3 bits each in a 4096-bit filter; every candidate shingle
# whose 3 positions are all set is a POSSIBLE benchmark hit. The exact
# join (q138's semantics) runs alongside so the report shows the false-
# positive overhead the bloom pays for its size. Scale story: the filter
# is 64 longs — built with one bounded aggregation (distinct positions
# <= 4096 rows to the driver), then carried as a plan literal into a
# map-side filter; no shuffle touches the candidate corpus until AFTER
# the bloom screen, which is the entire point at 100 TB (the exact join
# then runs only on the survivors; here it runs on everything because
# the report quantifies the FP rate).
# ---------------------------------------------------------------------------


@register(
    "q195_bloom_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               generate_series(1, len(t) - {_N - 1}),
               i -> array_to_string(t[i:i+{_N - 1}], ' ')))) AS shingle
      FROM toks WHERE len(t) >= {_N}
    ), hashed AS (
      SELECT doc_id, source, shingle,
             {_bloom_pos_sql('md5(shingle)', 0)} AS p0,
             {_bloom_pos_sql('md5(shingle)', 1)} AS p1,
             {_bloom_pos_sql('md5(shingle)', 2)} AS p2
      FROM sh
    ), bloom AS (
      SELECT DISTINCT p FROM (
        SELECT unnest([p0, p1, p2]) AS p FROM hashed WHERE source = 'src0'
      )
    ), ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    cand AS (
      SELECT h.doc_id, h.shingle,
             (h.p0 IN (SELECT p FROM bloom)
              AND h.p1 IN (SELECT p FROM bloom)
              AND h.p2 IN (SELECT p FROM bloom)) AS bloom_hit,
             h.shingle IN (SELECT shingle FROM ev) AS exact_hit
      FROM hashed h WHERE h.source <> 'src0'
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS n_bloom_hits,
           SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS n_exact_hits,
           SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END)
             AS n_false_positives
    FROM cand
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    category="curation",
)
def q195_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.withColumn("t", F.split(F.trim("text"), r"\s+"))
    sh = (
        toks.filter(F.size("t") >= _N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(0), F.size("t") - _N
                        ),
                        lambda i: F.concat_ws(
                            " ", F.slice("t", i + 1, _N)
                        ),
                    )
                )
            ).alias("shingle"),
        )
    )
    h = F.md5("shingle")
    hashed = sh.select(
        "doc_id",
        "source",
        "shingle",
        _bloom_pos_col(h, 0).alias("p0"),
        _bloom_pos_col(h, 1).alias("p1"),
        _bloom_pos_col(h, 2).alias("p2"),
    )
    # Build the 4096-bit filter as 64 longs: bounded driver collect (the
    # whole point of a bloom — the filter is tiny no matter the corpus).
    set_bits = sorted(
        r[0]
        for r in hashed.filter(F.col("source") == "src0")
        .select(F.explode(F.array("p0", "p1", "p2")).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for p in set_bits:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed longs for the Spark literal array;
    # F.shiftright only takes a literal bit count, so the probe is spelled
    # as a SQL expression (SQL shiftright accepts any int expression).
    mask_sql = "array(" + ",".join(
        f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
    ) + ")"

    def bit_set(col_name: str):
        return F.expr(
            f"shiftright(element_at({mask_sql}, cast({col_name}/64 as int)+1),"
            f" cast({col_name}%64 as int)) & 1 = 1"
        )

    ev = (
        sh.filter(F.col("source") == "src0")
        .select(F.col("shingle").alias("ev_shingle"))
        .distinct()
    )
    cand = (
        hashed.filter(F.col("source") != "src0")
        .withColumn(
            "bloom_hit",
            bit_set("p0") & bit_set("p1") & bit_set("p2"),
        )
        .join(
            F.broadcast(ev),
            F.col("shingle") == F.col("ev_shingle"),
            "left",
        )
        .withColumn("exact_hit", F.col("ev_shingle").isNotNull())
    )
    return (
        cand.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias(
                "n_bloom_hits"
            ),
            F.sum(F.when(F.col("exact_hit"), 1).otherwise(0)).alias(
                "n_exact_hits"
            ),
            F.sum(
                F.when(F.col("bloom_hit") & ~F.col("exact_hit"), 1).otherwise(0)
            ).alias("n_false_positives"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q197 — count-min-sketch heavy hitters: 3 rows x 256 counters, hash
# positions from one md5 per key (hex chars [1..2], [3..4], [5..6]).
# Estimate = min over the 3 counters a key maps to; the CMS guarantee
# (estimate >= true count, with bounded overestimate) is emitted as data
# and value-checked by the oracle, which rebuilds the identical sketch.
# Scale: the sketch build is one explode(3) + groupBy over 768 cells —
# constant-size state however many events; the per-key probe joins each
# candidate key to its 3 cells (broadcast of the 768-row sketch).
# ---------------------------------------------------------------------------

_CMS_W = 256  # counters per row (2 hex chars)
_CMS_TOPK = 10


def _cms_pos_sql(h: str, row: int) -> str:
    return sql_hex_to_int(h, str(1 + 2 * row), 2)


def _cms_pos_col(h, row: int):
    return F.conv(F.substring(h, 1 + 2 * row, 2), 16, 10).cast("long")


@register(
    "q197_cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), hashed AS (
      SELECT k,
             {_cms_pos_sql('md5(k)', 0)} AS b0,
             {_cms_pos_sql('md5(k)', 1)} AS b1,
             {_cms_pos_sql('md5(k)', 2)} AS b2
      FROM keyed
    ), cells AS (
      SELECT r, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT 0 AS r, b0 AS b FROM hashed
        UNION ALL SELECT 1, b1 FROM hashed
        UNION ALL SELECT 2, b2 FROM hashed
      ) GROUP BY r, b
    ), exact AS (
      SELECT k, COUNT(*) AS exact_count,
             {_cms_pos_sql('md5(ANY_VALUE(k))', 0)} AS b0,
             {_cms_pos_sql('md5(ANY_VALUE(k))', 1)} AS b1,
             {_cms_pos_sql('md5(ANY_VALUE(k))', 2)} AS b2
      FROM hashed GROUP BY k
    ), est AS (
      SELECT e.k, e.exact_count,
             LEAST(c0.c, c1.c, c2.c) AS cms_estimate
      FROM exact e
      JOIN cells c0 ON c0.r = 0 AND c0.b = e.b0
      JOIN cells c1 ON c1.r = 1 AND c1.b = e.b1
      JOIN cells c2 ON c2.r = 2 AND c2.b = e.b2
    )
    SELECT CAST(k AS BIGINT) AS user_id, exact_count, cms_estimate,
           cms_estimate >= exact_count AS overestimate_ok
    FROM est
    ORDER BY exact_count DESC, user_id
    LIMIT {_CMS_TOPK}
    """,
    category="relational",
)
def q197_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    h = F.md5("k")
    hashed = e.select(
        "k",
        _cms_pos_col(h, 0).alias("b0"),
        _cms_pos_col(h, 1).alias("b1"),
        _cms_pos_col(h, 2).alias("b2"),
    )
    cells = (
        hashed.select(
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("r"), F.col("b0").alias("b")),
                    F.struct(F.lit(1).alias("r"), F.col("b1").alias("b")),
                    F.struct(F.lit(2).alias("r"), F.col("b2").alias("b")),
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    exact = hashed.groupBy("k", "b0", "b1", "b2").agg(
        F.count("*").alias("exact_count")
    )
    c0 = cells.filter(F.col("r") == 0).select(
        F.col("b").alias("cb0"), F.col("c").alias("c0")
    )
    c1 = cells.filter(F.col("r") == 1).select(
        F.col("b").alias("cb1"), F.col("c").alias("c1")
    )
    c2 = cells.filter(F.col("r") == 2).select(
        F.col("b").alias("cb2"), F.col("c").alias("c2")
    )
    est = (
        exact.join(F.broadcast(c0), F.col("b0") == F.col("cb0"))
        .join(F.broadcast(c1), F.col("b1") == F.col("cb1"))
        .join(F.broadcast(c2), F.col("b2") == F.col("cb2"))
        .select(
            F.col("k").cast("long").alias("user_id"),
            "exact_count",
            F.least("c0", "c1", "c2").alias("cms_estimate"),
        )
        .withColumn(
            "overestimate_ok", F.col("cms_estimate") >= F.col("exact_count")
        )
    )
    return est.orderBy(F.desc("exact_count"), "user_id").limit(_CMS_TOPK)


# ---------------------------------------------------------------------------
# q307 — HyperLogLog from first principles, hash-exact: q54 exercises
# Spark's built-in HLL++ against a 10% tolerance; this builds the sketch
# itself from md5 bits so BOTH engines compute the identical estimate —
# the mergeability argument made concrete. Register = 2 hex chars % 64
# (uniform: 256 ≡ 0 mod 64); rank = leading-zero bits of the next 15 hex
# digits (pure string/CASE space — no float log2 on the hot path), with
# the standard small-range linear-counting correction. Scale: the ONLY
# state is 64 (register, max-rank) cells — the groupBy(register) max is
# the sketch merge a 1000-executor cluster would run map-side; the fact
# table is touched once.
# ---------------------------------------------------------------------------

_HLL_M = 64
_HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007)

#: leading-zero bits within the first nonzero hex digit (value 1..15)
_NLZ_CASE_SQL = (
    "CASE WHEN {d} >= 8 THEN 0 WHEN {d} >= 4 THEN 1"
    " WHEN {d} >= 2 THEN 2 ELSE 3 END"
)


def with_hll_reg_rank(df: DataFrame, key_col: str) -> DataFrame:
    """Append the q307 HLL ``(reg, rank)`` columns derived from
    md5(key) — shared with the streaming variant (q310) so batch and
    stream sketch the identical registers. Pure column expressions (no
    UDF); the temp md5 column is dropped before return."""
    out = df.withColumn("_hll_h", F.md5(F.col(key_col).cast("string")))
    stripped = F.expr("trim(LEADING '0' FROM substr(_hll_h, 3, 15))")
    first_nz = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    nlz = (
        F.when(first_nz >= 8, 0)
        .when(first_nz >= 4, 1)
        .when(first_nz >= 2, 2)
        .otherwise(3)
    )
    return (
        out.withColumn(
            "reg",
            F.conv(F.substring("_hll_h", 1, 2), 16, 10).cast("long") % _HLL_M,
        )
        .withColumn(
            "rank",
            F.when(stripped == "", F.lit(61))
            .otherwise((F.lit(15) - F.length(stripped)) * 4 + nlz + 1),
        )
        .drop("_hll_h")
    )



@register(
    "q307_hyperloglog_exact_replay",
    oracle=f"""
    WITH keyed AS (
      SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events
    ), ranked AS (
      SELECT {sql_hex_to_int('h', '1', 2)} % {_HLL_M} AS reg,
             CASE WHEN ltrim(substr(h, 3, 15), '0') = '' THEN 61
                  ELSE (15 - length(ltrim(substr(h, 3, 15), '0'))) * 4
                       + ({_NLZ_CASE_SQL.format(
                           d=sql_hex_to_int("ltrim(substr(h, 3, 15), '0')", "1", 1)
                       )}) + 1
             END AS rank
      FROM keyed
    ), regs AS (
      SELECT reg, MAX(rank) AS m FROM ranked GROUP BY reg
    ), agg AS (
      SELECT CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v_empty,
             SUM(power(2.0, -m)) + ({_HLL_M} - COUNT(*)) AS denom
      FROM regs
    ), est AS (
      SELECT v_empty,
             {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / denom AS raw
      FROM agg
    ), fin AS (
      SELECT v_empty, raw,
             CASE WHEN raw <= 2.5 * {_HLL_M} AND v_empty > 0
                  THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / v_empty)
                  ELSE raw END AS corrected
      FROM est
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct,
           CAST({_HLL_M} AS BIGINT) - v_empty AS registers_used,
           round(floor(raw * 10000 + 0.5) / 10000, 4) AS raw_estimate,
           round(floor(corrected * 10000 + 0.5) / 10000, 4) AS hll_estimate,
           CAST(FLOOR(10000.0 * abs(corrected
                 - (SELECT COUNT(DISTINCT user_id) FROM events))
               / (SELECT COUNT(DISTINCT user_id) FROM events)) AS BIGINT)
             AS abs_err_bp
    FROM fin
    """,
    category="stats",
)
def q307_hyperloglog_exact_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ranked = with_hll_reg_rank(
        e.select(F.col("user_id").cast("string").alias("k")).distinct(), "k"
    ).select("reg", "rank")
    regs = ranked.groupBy("reg").agg(F.max("rank").alias("m"))
    agg = regs.agg(
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("v_empty"),
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m")))
            + (F.lit(_HLL_M) - F.count("*"))
        ).alias("denom"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_distinct"))
    raw = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M / F.col("denom")
    out = agg.withColumn("raw", raw).withColumn(
        "corrected",
        F.when(
            (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v_empty") > 0),
            F.lit(_HLL_M)
            * F.log(F.lit(float(_HLL_M)) / F.col("v_empty")),
        ).otherwise(F.col("raw")),
    )
    rd = lambda c: F.round(F.floor(c * 10000 + 0.5) / 10000, 4)  # noqa: E731
    return out.crossJoin(F.broadcast(exact)).select(
        "exact_distinct",
        (F.lit(_HLL_M) - F.col("v_empty")).cast("long").alias("registers_used"),
        rd(F.col("raw")).alias("raw_estimate"),
        rd(F.col("corrected")).alias("hll_estimate"),
        F.floor(
            10000.0
            * F.abs(F.col("corrected") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        )
        .cast("long")
        .alias("abs_err_bp"),
    )
