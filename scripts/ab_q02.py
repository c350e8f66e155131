"""A/B the q02 rewrite (aggregate-below-join) against the naive form.

Builds (or reuses) bench's ×100 corpus, then times both formulations,
alternating runs so box drift hits both arms equally.

Usage: python scripts/ab_q02.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hive_feature_demo_spark.catalog import table  # noqa: E402
from hive_feature_demo_spark.functions.numeric import exact_sum  # noqa: E402
from hive_feature_demo_spark.plans.relational import q02_segment_revenue  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def q02_naive(spark, sf_dir):
    """The pre-r10 formulation: SUM + COUNT(DISTINCT) over the joined fact."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    x100 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "bench_x100"
    )
    build = bench._ensure_built(spark, src, x100, bench._X100_COPIES, single_events=False)
    warm = bench._warm_tables(spark, x100)
    print(f"build={build}s warm={warm}s calib={bench._calibrate()}")

    arms = {"naive": q02_naive, "preagg": q02_segment_revenue}
    raws: dict[str, list[float]] = {k: [] for k in arms}
    # interleave arms each round so drift is shared
    for r in range(runs):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            rows = fn(spark, x100).collect()
            raws[name].append(round(time.perf_counter() - t0, 2))
            if r == 0:
                print(f"{name}: {len(rows)} rows, first={rows[0] if rows else None}")
    for name, rr in raws.items():
        print(f"{name}: min={min(rr)} raws={rr}")


if __name__ == "__main__":
    main()
