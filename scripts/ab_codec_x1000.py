#!/usr/bin/env python
"""zstd-vs-lz4 shuffle-codec A/B at the ×1000 tier (r13, verdict ask #5).

r12 measured the codec on q02/q64 at ×100 (zstd halves the IO-bound ones)
and on the sf0.1 headline (zstd costs ~8% CPU-bound); the ask is the
whole ×1000 flagship tier end-to-end. One invocation = ONE fresh-JVM
bench-style pass (warm scan + min-of-N noop runs) of q61+q86 on the
×1000 docs corpus under $SPARK_GRAFT_IO_CODEC; the caller interleaves
codecs across invocations so box drift cannot masquerade as a codec
effect.

Usage:
  python scripts/ab_codec_x1000.py --build          # build/keep the corpus
  SPARK_GRAFT_IO_CODEC=zstd python scripts/ab_codec_x1000.py [--runs 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
X100_DIR = os.path.join(REPO, "data", "bench_x100")
X1000_DIR = os.path.join(REPO, "data", "bench_x1000")
QUERIES = ("q61_lsh_ann_topk", "q86_near_dup_clusters")


def main() -> int:
    argv = sys.argv[1:]
    runs = 2
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-codec-x1000")
    bench._ensure_built(spark, sf_dir, X100_DIR, bench._X100_COPIES, single_events=False)
    build_sec = bench._build_x1000_docs(spark, X100_DIR, X1000_DIR)
    if "--build" in argv:
        print(json.dumps({"built": True, "build_sec": build_sec}))
        return 0
    codec = spark.conf.get("spark.io.compression.codec")
    warm_sec = bench._warm_tables(spark, X1000_DIR)
    timings: dict = {}
    errors: dict = {}
    raw: dict = {}
    bench._run_suite(spark, list(QUERIES), X1000_DIR, runs, timings, errors, raw=raw)
    print(
        json.dumps(
            {
                "codec": codec,
                "runs": runs,
                "warm_sec": warm_sec,
                "queries": timings,
                "raw": raw,
                "errors": errors,
                "load_end": [round(v, 2) for v in os.getloadavg()],
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
