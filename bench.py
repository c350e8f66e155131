#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (foreach-noop action, results never
collected to the driver) and timed wall-clock. A warmup pass on the
smallest table absorbs JVM/codegen startup so numbers reflect steady state.

Each query runs TWICE and the MIN is reported: the benchmark's job is to
measure the PLAN, and min-of-2 is robust to transient machine contention
(BENCH_r02 recorded 64s on a box still busy with the correctness pass;
the same suite idle measures ~47s). Set SPARK_GRAFT_BENCH_RUNS to change.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402

#: headline set: one per operator category, heaviest variants included.
HEADLINE = [
    "q01_pricing_summary",
    "q02_segment_revenue",
    "q03_top_orders",
    "q04_region_rollup",
    "q07_topk_per_customer",
    "q08_event_windows",
    "q14_local_supply_revenue",
    "q16_segment_stats_fans",
    "q18_segment_customer_stats",
    "q30_dedup_exact_clusters",
    "q32_text_quality",
    "q36_cosine_topk",
    "q40_tumbling_hourly",
    "q42_sessionization",
    "q44_stream_static_join",
    "q50_asof_join",
    "q61_lsh_ann_topk",
    "q64_tfidf_top_terms",
    "q69_stream_stream_attribution",
    "q71_grouped_agg_weighted_avg",
    "q86_near_dup_clusters",
    "q90_event_funnel",
    "q93_pq_encode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")

    # warmup: JVM + whole-stage codegen + shuffle machinery + parquet
    # footer caches — a tiny agg+join compiles the common codegen paths so
    # the first measured query doesn't absorb them
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

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                # execute fully without driver-side materialization
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # fail-soft: one bad query must not erase
            # the whole round's number (BENCH_r03 lesson — the q42 crash
            # left rc=1 and NO JSON line at all)
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    if errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
