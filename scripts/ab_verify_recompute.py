"""A/B the near-dup pipeline's index materialization strategy.

Current (arm "ckpt_index"): hashed shingle index is localCheckpointed
(DISK_ONLY) once and feeds BOTH the signature aggregation and the verify
joins — at x1000 that is ~40 GB written + read back, the dominant IO.

Prototype (arm "reshingle"): never materialize the corpus index.
Signatures aggregate the shingle stream directly (map-side partial over
the explode — the shuffle carries one row per doc, not per shingle);
candidate pairs are checkpointed (pairs-scale); verify RE-SHINGLES only
the candidate docs (semi-join then shingle). Sparse-candidate regimes
skip almost all the IO; dense regimes pay a second shingling CPU pass
over candidate docs, bounded by one corpus pass.

Both arms must return identical pair counts.

Usage: python scripts/ab_verify_recompute.py [runs] [--dir DIR]
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


def pairs_ckpt_index(spark, docs, threshold=0.5):
    """Production shape: one DISK_ONLY index checkpoint, two consumers."""
    return dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4, threshold=threshold
    )


def pairs_reshingle(spark, docs, threshold=0.5):
    """Prototype: stream signatures, checkpoint candidates, re-shingle
    candidate docs for the verify stage."""
    sig = dedup.minhash_signatures_from_index(
        dedup.hashed_shingle_index(docs, "doc_id", "text", 3),
        "doc_id",
        16,
        already_hashed=True,
    )
    cands = dedup.lsh_candidate_pairs(sig, "doc_id", 4, 4).localCheckpoint(
        eager=True
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.join(cand_ids, "doc_id", "left_semi")
    sh_c = dedup.hashed_shingle_index(cand_docs, "doc_id", "text", 3)
    return dedup.verify_jaccard_on_candidates(sh_c, cands, "doc_id", threshold)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "bench_x100",
    )
    if "--dir" in argv:
        i = argv.index("--dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    runs = int(argv[0]) if argv else 2
    spark = get_spark()
    bench._warm_tables(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print("calib:", bench._calibrate(), flush=True)

    arms = {"ckpt_index": pairs_ckpt_index, "reshingle": pairs_reshingle}
    raws = {k: [] for k in arms}
    counts = {}
    for r in range(runs):
        for name, fn in arms.items():
            before = bench._persistent_ids(spark)
            t0 = time.perf_counter()
            n = fn(spark, docs).count()
            raws[name].append(round(time.perf_counter() - t0, 1))
            bench._unpersist_ids(spark, bench._persistent_ids(spark) - before)
            counts[name] = n
            print(f"run{r} {name}: {raws[name][-1]}s ({n} pairs)", flush=True)
    print("identical:", len(set(counts.values())) == 1, counts, flush=True)
    for name, rr in raws.items():
        print(f"{name}: min={min(rr)} raws={rr}")
    print("calib_end:", bench._calibrate_in_subprocess(), flush=True)


if __name__ == "__main__":
    main()
