"""A/B the driver-side power-iteration PCA vs the current per-round-job one.

The candidate collects the 4096-row covariance once and runs the 60
matvec/normalize rounds in Python decimal arithmetic that replicates the
engine semantics: each double product CAST to DECIMAL(25,10) (HALF_UP),
summed exactly, cast back to double. Verifies exact row equality vs the
registered q281 at the given SF and prints timings.
"""

import math
import sys
import time
from decimal import ROUND_HALF_UP, Decimal, localcontext

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from hive_feature_demo_spark.catalog import table  # noqa: E402
from hive_feature_demo_spark.functions.numeric import round_det  # noqa: E402
from hive_feature_demo_spark.plans.audit_ops import (  # noqa: E402
    _DEC,
    _PCA_ROUNDS,
    q281_pca_power_iteration,
)
from hive_feature_demo_spark.session import get_spark  # noqa: E402

_Q10 = Decimal("1e-10")


def _dec10(x: float) -> Decimal:
    # Spark's double->decimal cast goes through the double's shortest
    # round-trip decimal representation (BigDecimal.valueOf semantics),
    # NOT the exact binary expansion — repr(x) replicates that.
    return Decimal(repr(x)).quantize(_Q10, rounding=ROUND_HALF_UP)


def q281_driver_iterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "v")
    mu = d.groupBy("i").agg(
        (F.sum(F.col("v").cast(_DEC)).cast("double") / F.count("*")).alias("mu")
    )
    a = d.select("vec_id", F.col("i").alias("ai"), F.col("v").alias("av"))
    b = d.select("vec_id", F.col("i").alias("bj"), F.col("v").alias("bv"))
    g = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(
            (
                F.sum((F.col("av") * F.col("bv")).cast(_DEC)).cast("double")
                / F.count("*")
            ).alias("exy")
        )
    )
    ma = mu.select(F.col("i").alias("i"), F.col("mu").alias("mu_i"))
    mb = mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    cov_rows = (
        g.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select("i", "j", (F.col("exy") - F.col("mu_i") * F.col("mu_j")).alias("c"))
        .collect()
    )
    cov = {(r["i"], r["j"]): r["c"] for r in cov_rows}
    with localcontext() as ctx:
        ctx.prec = 50
        v = {i: 0.125 for i in range(1, 65)}
        n = None
        for _ in range(_PCA_ROUNDS):
            w = {
                i: float(sum(_dec10(cov[(i, j)] * v[j]) for j in range(1, 65)))
                for i in range(1, 65)
            }
            n = math.sqrt(float(sum(_dec10(wi * wi) for wi in w.values())))
            v = {i: w[i] / n for i in range(1, 65)}
        trace = float(sum(_dec10(cov[(i, i)]) for i in range(1, 65)))
    out = spark.createDataFrame(
        [(i, v[i]) for i in range(1, 65)], "i int, v double"
    )
    return out.select(
        F.col("i").cast("long").alias("dim"),
        round_det(F.col("v"), 6).alias("loading"),
        round_det(F.lit(n), 6).alias("lambda1"),
        F.floor(10000.0 * (F.lit(n) / F.lit(trace))).cast("long").alias("explained_bps"),
    ).orderBy("dim")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    t0 = time.time()
    old = q281_pca_power_iteration(spark, sf).collect()
    t_old = time.time() - t0
    t0 = time.time()
    new_df = q281_driver_iterate(spark, sf)
    new = new_df.collect()
    t_new = time.time() - t0
    assert len(old) == len(new) == 64
    mism = [
        (o, n_)
        for o, n_ in zip(sorted(old, key=lambda r: r["dim"]),
                         sorted(new, key=lambda r: r["dim"]))
        if tuple(o) != tuple(n_)
    ]
    print(f"sf={sf} old={t_old:.1f}s new={t_new:.1f}s mismatches={len(mism)}")
    for o, n_ in mism[:5]:
        print("  old", tuple(o), "new", tuple(n_))


if __name__ == "__main__":
    main()
