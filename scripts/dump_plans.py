"""Dump `explain("formatted")` for named registry queries to files.

Used for the optimization-round deliverable `plans/r<N>/<query>_{before,after}.txt`:
run once from a worktree at the pre-optimization commit (suffix `before`) and
once at HEAD (suffix `after`).

Usage: python scripts/dump_plans.py OUTDIR SUFFIX q54_approx_sketches [...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    outdir, suffix, names = argv[0], argv[1], argv[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark()
    explain_mode = (
        spark._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(explain_mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
