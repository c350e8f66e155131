"""A/B the hashed (60-bit int) MinHash verify index against the string one.

Interleaved rounds of the full candidates+verify pair pipeline at
data/bench_x100, plus the materialized index's storage footprint per arm.

Usage: python scripts/ab_hashed_index.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

from hive_feature_demo_spark.operators import dedup  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def _pairs(spark, sf_dir, hashed: bool):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    idx = dedup.hashed_shingle_index if hashed else dedup.shingle_index
    sh = idx(docs, "doc_id", "text", 3).localCheckpoint(eager=True)
    cands = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures_from_index(sh, "doc_id", 16, already_hashed=hashed),
        "doc_id", 4, 4
    )
    n = dedup.verify_jaccard_on_candidates(sh, cands, "doc_id", 0.5).count()
    # storage footprint of everything currently checkpointed (the index +
    # the verify-restricted index), then release for the next arm
    mem = sum(
        i.memSize() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    )
    bench._unpersist_ids(spark, bench._persistent_ids(spark))
    return n, mem


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark()
    x100 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "bench_x100"
    )
    bench._warm_tables(spark, x100)
    raws = {"string": [], "hashed": []}
    mems = {}
    for r in range(runs):
        for name, hashed in (("string", False), ("hashed", True)):
            t0 = time.perf_counter()
            n, mem = _pairs(spark, x100, hashed)
            raws[name].append(round(time.perf_counter() - t0, 2))
            mems[name] = mem
            if r == 0:
                print(f"{name}: {n} pairs, checkpoint_bytes={mem}")
    for name, rr in raws.items():
        print(f"{name}: min={min(rr)} raws={rr}")
    print("calib:", bench._calibrate())


if __name__ == "__main__":
    main()
