"""A/B the near-dup pipeline's index materialization strategy.

Baseline (arm "ckpt_index", SUPERSEDED pre-r11 production shape, inlined
verbatim below from operators/dedup.py@6421030 so it stays reproducible
at HEAD): hashed shingle index is localCheckpointed (DISK_ONLY) once and
feeds BOTH the signature aggregation and the verify joins — at x1000
that is ~40 GB written + read back, the dominant IO.

Current production (arm "reshingle", dedup.minhash_near_duplicates at
HEAD): never materialize the corpus index. Signatures aggregate the
shingle stream directly (map-side partial over the explode — the shuffle
carries one row per doc, not per shingle); candidate pairs are
checkpointed (pairs-scale); verify RE-SHINGLES only the candidate docs
(semi-join then shingle). Sparse-candidate regimes skip almost all the
IO; dense regimes pay a second shingling CPU pass over candidate docs,
bounded by one corpus pass.

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
    """Superseded baseline (pre-r11 production shape), inlined verbatim
    from operators/dedup.py@6421030: one DISK_ONLY corpus-index
    checkpoint anchors three consumers — the signature aggregation AND
    both sides of the verify join. minhash_near_duplicates no longer
    works this way (it streams signatures and re-shingles candidates),
    so the baseline must live here to stay reproducible."""
    sh = dedup._ckpt_disk(dedup.hashed_shingle_index(docs, "doc_id", "text", 3))
    cands = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures_from_index(sh, "doc_id", 16, already_hashed=True),
        "doc_id",
        4,
        4,
        None,
    )
    return dedup.verify_jaccard_on_candidates(sh, cands, "doc_id", threshold)


def pairs_reshingle(spark, docs, threshold=0.5):
    """Production shape at HEAD (r11+): stream signatures, checkpoint
    candidates (pairs-scale), re-shingle candidate docs for verify."""
    return dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4, threshold=threshold
    )


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
