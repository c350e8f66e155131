"""A/B the r11 Expand-audit rewrites (q04 rollup, q91 retention cohorts)
against their pre-rewrite formulations, inlined here as the baselines.

q04: rollup over the joined fact vs pre-aggregate-to-finest-set + rollup
over partials. q91: three COUNT(DISTINCT)-shaped aggregates (Expand x3 +
wide (cohort, gid, user) shuffle) vs per-user MAX(flag) pre-aggregate.
q09/q52 follow the same shapes on smaller inputs, so q04 stands in for
the grouping-sets family.

Builds (or reuses) bench's x100 corpus, interleaves arms per round so box
drift hits both equally, and asserts both arms return identical rows.

Usage: python scripts/ab_expand_rewrites.py [runs]
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
from hive_feature_demo_spark.plans.relational import q04_region_rollup  # noqa: E402
from hive_feature_demo_spark.plans.stats import q91_retention_cohorts  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def q04_naive(spark, sf_dir):
    """Pre-r11 q04: rollup directly over the joined fact rows."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(exact_sum("o_totalprice", "total_sales"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("__ALL__")).alias("region_name"),
            F.coalesce("n_name", F.lit("__ALL__")).alias("nation_name"),
            "total_sales",
            "n_orders",
        )
        .orderBy("region_name", "nation_name")
    )


def q91_naive(spark, sf_dir):
    """Pre-r11 q91: three COUNT(DISTINCT ...) aggregates over the join."""
    e = table(spark, sf_dir, "events")
    fd = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    act = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    j = fd.join(act, "user_id")
    return (
        j.groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(F.col("d") == F.date_add(F.col("cohort_day"), 1), F.col("user_id"))
            ).alias("retained_d1"),
            F.countDistinct(
                F.when(F.col("d") >= F.date_add(F.col("cohort_day"), 7), F.col("user_id"))
            ).alias("retained_d7plus"),
        )
        .orderBy("cohort_day")
    )


PAIRS = {
    "q04": ("naive", q04_naive, "preagg", q04_region_rollup),
    "q91": ("naive", q91_naive, "preagg", q91_retention_cohorts),
}


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

    for qname, (an, afn, bn, bfn) in PAIRS.items():
        raws: dict[str, list[float]] = {an: [], bn: []}
        rows_seen: dict[str, list] = {}
        for r in range(runs):
            for name, fn in ((an, afn), (bn, bfn)):
                t0 = time.perf_counter()
                rows = fn(spark, x100).collect()
                raws[name].append(round(time.perf_counter() - t0, 2))
                if r == 0:
                    rows_seen[name] = rows
        same = rows_seen[an] == rows_seen[bn]
        print(f"{qname}: arms identical rows = {same} ({len(rows_seen[an])} rows)")
        for name, rr in raws.items():
            print(f"  {qname}/{name}: min={min(rr)} raws={rr}")
    print("calib_end:", bench._calibrate_in_subprocess())


if __name__ == "__main__":
    main()
