#!/usr/bin/env python
"""Fixed-cost attribution for the overhead-floored relational heads (r13,
verdict ask #6): q01–q03 read ~2.2 s each in BENCH_r12 with an 8-vs-32-core
ratio of ~1.0 — per-run fixed cost, not compute. This splits one bench-style
run into:

  build      REGISTRY[name].fn(spark, sf_dir) — includes spark.read.parquet
             (file listing + footer/schema read) and plan construction
  action     the noop write (analysis/optimization/codegen + execution)

and repeats N times so run-1 (cold codegen) vs steady-state is visible.

Usage: python scripts/profile_fixed_floor.py [--sf DIR] [--runs N] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402

DEFAULT = ["q01_pricing_summary", "q02_segment_revenue", "q03_top_orders"]


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    runs = 4
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[: i] + argv[i + 2 :]
    names = argv or DEFAULT

    spark = get_spark(app_name="profile-fixed-floor")
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out: dict = {"sf_dir": sf_dir, "queries": {}}
    for name in names:
        q = REGISTRY[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            samples.append(
                {"build_sec": round(t1 - t0, 3), "action_sec": round(t2 - t1, 3)}
            )
        out["queries"][name] = samples
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
