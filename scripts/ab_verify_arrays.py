"""A/B q86's exact-verify stage: two-join counting vs per-doc array intersect.

Profiles the CURRENT verify (cands x shingles row explosion through two
equi-joins) against a prototype that groups the candidate-restricted
index into per-doc shingle-int sets and computes n_common via
size(array_intersect) after joining the two arrays onto each pair.

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


def verify_arrays(sh, cands, id_col, threshold):
    """Prototype: set-semantics verify via array_intersect.

    Distinct (id, shingle-int) rows -> one array per candidate doc ->
    join both arrays onto each pair -> n_common = size(array_intersect).
    Avoids the candidates x shingles row explosion entirely.
    """
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sets = (
        sh.join(cand_ids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("_sh"), F.count("*").alias("n_sh"))
    )
    sa = sets.select(
        F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"), F.col("n_sh").alias("n_a")
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"), F.col("n_sh").alias("n_b")
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("_sh_a", "_sh_b"))
                / (F.col("n_a") + F.col("n_b") - F.size(F.array_intersect("_sh_a", "_sh_b")))
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
        dedup.minhash_signatures_from_index(sh, "doc_id", 16), "doc_id", 4, 4
    ).localCheckpoint(eager=True)
    print("cands:", cands.count())

    arms = {
        "two_join": lambda: dedup.verify_jaccard_on_candidates(sh, cands, "doc_id", 0.5),
        "arrays": lambda: verify_arrays(sh, cands, "doc_id", 0.5),
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
