"""A/B q86's exact-verify stage: two-join counting vs per-doc array intersect.

The "arrays" arm is the PRODUCTION verify
(dedup.verify_jaccard_on_candidates, the array-intersect form since
commit 09e94c7). The "two_join" baseline — the pre-09e94c7 formulation
that exploded cands x shingles rows through two equi-joins — is INLINED
below as verify_two_join so the measured ~2x claim stays reproducible
from this script at any HEAD.

Usage: python scripts/ab_verify_arrays.py [runs] [--dir DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hive_feature_demo_spark.operators import dedup  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def verify_two_join(sh, cands, id_col, threshold):
    """Baseline: the pre-09e94c7 verify, preserved verbatim.

    Explodes candidates x shingles-per-doc rows through a (id, shingle)
    equi-join and re-aggregates per pair — the formulation the production
    array-intersect verify replaced.
    """
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = sh.join(cand_ids, id_col, "left_semi").localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cands.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "bench_x100"
    )
    if "--dir" in argv:
        i = argv.index("--dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    runs = int(argv[0]) if argv else 3
    spark = get_spark()
    bench._warm_tables(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # shared prep, built once: hashed index + candidates (both arms verify
    # the same candidate set from the same materialized index)
    sh = dedup.hashed_shingle_index(docs, "doc_id", "text", 3).localCheckpoint(eager=True)
    cands = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures_from_index(sh, "doc_id", 16, already_hashed=True),
        "doc_id", 4, 4
    ).localCheckpoint(eager=True)
    print("cands:", cands.count())

    arms = {
        "two_join": lambda: verify_two_join(sh, cands, "doc_id", 0.5),
        "arrays": lambda: dedup.verify_jaccard_on_candidates(sh, cands, "doc_id", 0.5),
    }
    raws = {k: [] for k in arms}
    for r in range(runs):
        for name, fn in arms.items():
            before = bench._persistent_ids(spark)
            t0 = time.perf_counter()
            n = fn().count()
            raws[name].append(round(time.perf_counter() - t0, 2))
            bench._unpersist_ids(spark, bench._persistent_ids(spark) - before)
            if r == 0:
                print(f"{name}: {n} pairs")
    for name, rr in raws.items():
        print(f"{name}: min={min(rr)} raws={rr}")
    print("calib:", bench._calibrate())


if __name__ == "__main__":
    main()
