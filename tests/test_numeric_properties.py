"""Property tests for the cross-engine determinism foundation.

Everything in the oracle-parity suite rests on ``functions.numeric``
producing bit-identical values in Spark, DuckDB, and Python. These
properties attack that claim directly with randomized inputs (batched:
one Spark job / one DuckDB query per example set, not per value).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

from hive_feature_demo_spark.functions.numeric import (
    exact_sum_fixed,
    round_det,
    sql_round_det,
)

_floats = st.floats(
    min_value=0.0, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_floats, min_size=1, max_size=50))
def test_round_det_matches_duckdb_and_python(spark, values):
    digits = 4
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v double")
    got = {
        r["i"]: r["r"]
        for r in df.select("i", round_det("v", digits).alias("r")).collect()
    }
    con = duckdb.connect()
    expr = sql_round_det("v", digits)
    duck = {
        i: con.execute(f"SELECT {expr} AS r FROM (SELECT CAST(? AS DOUBLE) AS v)", [v]).fetchone()[0]
        for i, v in enumerate(values)
    }
    py = {i: math.floor(v * 10**digits + 0.5) / 10**digits for i, v in enumerate(values)}
    assert got == duck == py


# money amounts with exactly 2 decimals, as doubles
_money = st.integers(min_value=0, max_value=10**12).map(lambda c: c / 100.0)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_money, min_size=1, max_size=100))
def test_exact_sum_fixed_is_lossless_for_2dp(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(exact_sum_fixed("v", 2, "s")).collect()[0]["s"]
    true = float(sum(Decimal(str(v)) for v in values))
    assert got == pytest.approx(true, abs=0.0)
    # and order-independence: reversed input sums identically
    df2 = spark.createDataFrame([(v,) for v in reversed(values)], "v double")
    assert df2.agg(exact_sum_fixed("v", 2, "s")).collect()[0]["s"] == got


def test_results_independent_of_shuffle_partitions(spark, sf_dir):
    """The determinism conventions exist so results never depend on
    partitioning; prove it by re-running representative queries (money
    aggs, float ranking, python-path scoring) under a different shuffle
    parallelism."""
    from hive_feature_demo_spark.plans.registry import REGISTRY

    names = ["q01_pricing_summary", "q36_cosine_topk", "q64_tfidf_top_terms",
             "q88_qty_price_correlation"]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {n: [tuple(r) for r in REGISTRY[n].fn(spark, sf_dir).collect()] for n in names}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        for n in names:
            got = [tuple(r) for r in REGISTRY[n].fn(spark, sf_dir).collect()]
            assert got == baseline[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_money_rounding_matches_duckdb_round_even(spark):
    """Layer A averages round HALF_EVEN (Python round semantics); the
    oracle spelling is DuckDB round_even — verify on exact .xx5 boundaries
    (where plain ROUND would diverge)."""
    from hive_feature_demo_spark.functions.numeric import money

    vals = [0.125, 0.135, 1000.125, 2.675, 0.005, 0.015]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {r["i"]: r["m"] for r in df.select("i", money(F.col("v").cast("decimal(25,10)")).cast("double").alias("m")).collect()}
    con = duckdb.connect()
    for i, v in enumerate(vals):
        want = con.execute(
            "SELECT round_even(CAST(? AS DECIMAL(25,10))::DOUBLE, 2)", [v]
        ).fetchone()[0]
        assert got[i] == want, (v, got[i], want)


def test_hll_sketch_merge_equals_direct(spark):
    """Sketch MERGEABILITY: the datasketches HLL estimate from per-group
    partial sketches unioned together must equal the single-pass estimate
    — the property that lets 1000 executors sketch independently and
    combine (exact distinct counts would shuffle the key universe
    instead). Estimates are approximate; merge-vs-direct must be EXACTLY
    equal (same sketch algebra), which is what this pins."""
    from pyspark.sql import functions as F

    df = spark.range(100_000).select(
        (F.col("id") % 10).alias("g"), (F.col("id") % 7919).alias("v")
    )
    direct = df.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert direct == merged
    assert abs(direct - 7919) / 7919 < 0.05


def test_exact_sum_reassociation_bit_identity(spark):
    """exact_sum_partial -> exact_sum_merge must be BIT-identical to a
    single-pass exact_sum under any grouping — the invariant that lets a
    query pre-aggregate the fact side below a join (q02's shape) without
    perturbing the driver's value hash. Decimal addition is exact, hence
    associative; doubles are not, which is why the partials must stay in
    decimal space. Adversarial values: many decimals whose double sums
    are order-dependent."""
    from hive_feature_demo_spark.functions.numeric import (
        exact_sum,
        exact_sum_merge,
        exact_sum_partial,
    )

    df = spark.range(200_000).select(
        (F.col("id") % 97).alias("k"),
        (F.col("id") % 1009).alias("g"),
        # mix of magnitudes so double addition would be order-sensitive
        (F.pow(F.lit(10.0), (F.col("id") % 13) - 6) * ((F.col("id") % 7) + 0.123456789)).alias("v"),
    )
    one_pass = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(exact_sum("v", "s")).collect()
    }
    two_pass = {
        r["k"]: r["s"]
        for r in df.groupBy("k", "g")
        .agg(exact_sum_partial("v", "p"))
        .groupBy("k")
        .agg(exact_sum_merge("p", "s"))
        .collect()
    }
    assert one_pass == two_pass  # exact equality, not approx


def test_pairwise_dim_terms_bit_identical_to_join_gram(spark):
    """similarity.pairwise_dim_terms (map-side d^2 expansion) must yield
    BIT-identical decimal Gram sums to the classic explode-then-self-join
    formulation under any partitioning — decimal addition is exact, so
    only the product MULTISET matters, and the two formulations must
    produce the same one. Adversarial values: mixed magnitudes whose
    double sums are order-sensitive."""
    from hive_feature_demo_spark.operators import similarity

    dim = 7
    df = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.pow(F.lit(10.0), (i % 5) - 2)
            * ((F.col("id") % 11) + 0.123456789),
        ).alias("embedding"),
    ).repartition(13)

    d = df.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "v")
    a = d.select("vec_id", F.col("i").alias("ai"), F.col("v").alias("av"))
    b = d.select("vec_id", F.col("i").alias("bj"), F.col("v").alias("bv"))
    via_join = {
        (r["i"], r["j"]): (r["s"], r["n"])
        for r in a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(
            F.sum((F.col("av") * F.col("bv")).cast("decimal(25,10)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    via_terms = {
        (r["i"], r["j"]): (r["s"], r["n"])
        for r in similarity.pairwise_dim_terms(df, "embedding")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("xi") * F.col("xj")).cast("decimal(25,10)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert len(via_terms) == dim * dim
    assert via_join == via_terms  # exact decimal equality
