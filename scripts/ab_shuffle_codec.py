"""A/B the shuffle compression codec (lz4 default vs zstd) on the
shuffle-heaviest flagships at x100 (guide §2.3: "measure shuffle bytes
written and stage time with each — there is no universal answer").

`spark.io.compression.codec` is read at SparkContext start, so each arm
runs in its own subprocess (fresh JVM) with identical warmup; arms are
interleaved per round so box drift hits both equally. Results decide
whether zstd enters session.py.

Usage:
  python scripts/ab_shuffle_codec.py [rounds]          # parent: interleave arms
  python scripts/ab_shuffle_codec.py --arm lz4|zstd    # child: one timed pass
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["q86_near_dup_clusters", "q02_segment_revenue", "q64_tfidf_top_terms"]


def child(codec: str) -> None:
    import bench  # noqa: E402
    from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
    from hive_feature_demo_spark.session import get_spark  # noqa: E402

    x100 = os.path.join(REPO, "data", "bench_x100")
    spark = get_spark(
        app_name=f"ab-codec-{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    assert spark.conf.get("spark.io.compression.codec") == codec
    bench._warm_tables(spark, x100)
    out: dict[str, list[float]] = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"ab-codec {codec} {name}")
            t0 = time.time()
            fn(spark, x100).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
        out[name] = runs
    print("ABCODEC " + json.dumps({"codec": codec, "runs": out}))


def parent(rounds: int) -> None:
    import bench  # noqa: E402
    from hive_feature_demo_spark.session import get_spark  # noqa: E402

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    x100 = os.path.join(REPO, "data", "bench_x100")
    spark = get_spark(app_name="ab-codec-build")
    build = bench._ensure_built(spark, src, x100, bench._X100_COPIES, single_events=False)
    print(f"build={build}s calib={bench._calibrate()}")
    spark.stop()
    results: dict[str, list[list[float]]] = {}
    for rnd in range(rounds):
        for codec in ("lz4", "zstd"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", codec],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith("ABCODEC ")), None
            )
            if line is None:
                print(f"round {rnd} {codec}: FAILED\n{proc.stderr[-2000:]}")
                continue
            payload = json.loads(line[len("ABCODEC ") :])
            for name, runs in payload["runs"].items():
                results.setdefault(f"{name}:{codec}", []).append(runs)
            print(f"round {rnd} {codec}: {payload['runs']}")
    print(json.dumps(results, indent=1))


def child_suite(codec: str) -> None:
    """One full headline-suite pass (runs=1) at $SPARK_GRAFT_SF_DIR."""
    import bench  # noqa: E402
    from hive_feature_demo_spark.session import get_spark  # noqa: E402

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"ab-codec-suite-{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    bench._warm_tables(spark, sf_dir)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    bench._run_suite(spark, bench.HEADLINE, sf_dir, 1, timings, errors)
    print(
        "ABSUITE "
        + json.dumps({"codec": codec, "total": round(sum(timings.values()), 3), "errors": errors})
    )


if __name__ == "__main__":
    if "--suite-arm" in sys.argv:
        child_suite(sys.argv[sys.argv.index("--suite-arm") + 1])
    elif "--arm" in sys.argv:
        child(sys.argv[sys.argv.index("--arm") + 1])
    else:
        parent(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
