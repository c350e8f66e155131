#!/usr/bin/env python
"""Stage-level attribution for q86 near-dup clustering (r5 verdict item 1).

Times each stage of the scale path separately at 1x (sf0.1) and x10
(data/bench_x10), and records the size drivers that decide whether growth
is the WORKLOAD's (pair count) or the PLAN's (a super-linear stage):

  stage 1  shingle index build + materialize          rows = corpus shingles
  stage 2  minhash signatures + LSH banding buckets   sum(bucket^2) = join cost
  stage 3  candidate pair generation (bucket join)    candidate pairs
  stage 4  exact-Jaccard verify on candidates         verified pairs
  stage 5  connected components (min-label)           edges, iterations
  stage 6  cluster aggregation                        clusters

Usage: python scripts/profile_q86.py [--dirs DIR ...] [--collapse]

--collapse profiles the exact-dup representative-collapse variant
(dedup_exact before shingling) for comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive_feature_demo_spark.operators import dedup  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def timed(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    out[label] = round(time.perf_counter() - t0, 2)
    print(f"  {label}: {out[label]}s", file=sys.stderr)
    return r


def profile(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stages: dict[str, float] = {}
    stats: dict[str, int] = {}

    # stage 1: shingle index (the ONE corpus scan; localCheckpoint barrier)
    sh = timed(
        "s1_shingle_index",
        lambda: dedup.shingle_index(docs, "doc_id", "text", 3).localCheckpoint(
            eager=True
        ),
        stages,
    )
    stats["shingle_rows"] = sh.count()

    # stage 2: signatures + banding buckets; record sum(bucket^2) — the
    # bucket-join cost model — and the hottest bucket width
    sig = timed(
        "s2_signatures",
        lambda: dedup.minhash_signatures_from_index(sh, "doc_id", 16).localCheckpoint(
            eager=True
        ),
        stages,
    )
    stats["docs_with_signature"] = sig.count()
    band_rows = []
    for bi in range(4):
        cols = [F.col(f"mh_{bi * 4 + r}").cast("string") for r in range(4)]
        band_rows.append(
            sig.select(
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws("_", *cols)).alias("band_digest"),
            )
        )
    buckets = band_rows[0]
    for br in band_rows[1:]:
        buckets = buckets.unionByName(br)
    widths = buckets.groupBy("band", "band_digest").agg(F.count("*").alias("w"))
    row = widths.agg(
        F.sum(F.col("w") * F.col("w")).alias("sum_w2"),
        F.max("w").alias("max_w"),
        F.count("*").alias("n_buckets"),
    ).first()
    stats["sum_bucket_sq"] = int(row["sum_w2"])
    stats["max_bucket_width"] = int(row["max_w"])
    stats["n_buckets"] = int(row["n_buckets"])

    # stage 3: candidate pairs from the bucket join
    cands = timed(
        "s3_candidates",
        lambda: dedup.lsh_candidate_pairs(sig, "doc_id", 4, 4).localCheckpoint(
            eager=True
        ),
        stages,
    )
    stats["candidate_pairs"] = cands.count()

    # stage 4: exact-Jaccard verify on candidates only — the PRODUCTION
    # path (dedup.verify_jaccard_on_candidates), which semi-joins the
    # index down to candidate docs first. An earlier inline copy here
    # predated that r6 restriction and re-shuffled the FULL corpus index
    # through both verify joins: at ×100 (26M shingle rows, 28.7k
    # candidates) the stale version measured 93 s where the production
    # stage costs ~3 s — the profiler must profile what q86 actually runs.
    pairs = timed(
        "s4_verify",
        lambda: dedup.verify_jaccard_on_candidates(
            sh, cands, "doc_id", 0.5
        ).localCheckpoint(eager=True),
        stages,
    )
    stats["verified_pairs"] = pairs.count()

    # stage 5: connected components
    comp = timed(
        "s5_connected_components",
        lambda: dedup.connected_components(pairs).localCheckpoint(eager=True),
        stages,
    )
    stats["component_nodes"] = comp.count()

    # stage 6: final aggregation
    timed(
        "s6_cluster_agg",
        lambda: comp.groupBy("cluster")
        .agg(F.count("*").alias("n"), F.min("node").alias("survivor"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
        stages,
    )
    stages["total"] = round(sum(v for k, v in stages.items() if k != "total"), 2)
    return {"dir": sf_dir, "stages": stages, "stats": stats}


def profile_collapsed(spark, sf_dir: str) -> dict:
    """End-to-end timing of the collapse_exact=True cluster pipeline
    (the registered q86 path when the dup-mass probe trips), for
    comparison against the per-stage uncollapsed profile."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stages: dict[str, float] = {}
    stats: dict[str, int] = {}
    comp = timed(
        "collapsed_pipeline",
        lambda: dedup.minhash_near_dup_clusters(
            docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4,
            threshold=0.5, collapse_exact=True,
        ).localCheckpoint(eager=True),
        stages,
    )
    stats["component_nodes"] = comp.count()
    stats["docs"] = docs.count()
    stages["total"] = round(sum(v for k, v in stages.items() if k != "total"), 2)
    return {"dir": sf_dir, "collapsed": True, "stages": stages, "stats": stats}


def main():
    argv = sys.argv[1:]
    dirs = ["/root/testdata/sf0.1", "/root/repo/data/bench_x10"]
    if "--dirs" in argv:
        i = argv.index("--dirs") + 1
        dirs = []
        while i < len(argv) and not argv[i].startswith("--"):
            dirs.append(argv[i])
            i += 1
    spark = get_spark(app_name="profile_q86")
    results = []
    for d in dirs:
        print(f"profiling {d} ...", file=sys.stderr)
        results.append(profile(spark, d))
        if "--collapse" in argv:
            print(f"profiling {d} (collapsed) ...", file=sys.stderr)
            results.append(profile_collapsed(spark, d))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
