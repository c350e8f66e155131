"""Regression gate for the scale-2 (×10) bench corpus generator.

The r6 stage profile caught the r5 generator inflating the true near-dup
workload 10,000× (word shuffles preserve bags of words, so repetitive
documents stayed near-identical across copies) — which was then misread
as a q86 plan problem. This pins the property the generator must keep:
a ×K document replica has EXACTLY K× the base corpus's near-dup pairs
(each copy's internal Jaccard structure preserved by the token
bijection) and ZERO cross-copy pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import bench
from hive_feature_demo_spark.operators import dedup

# repetitive docs — the r5 failure mode: small vocab, heavy repetition,
# plus a genuine near-dup pair and a shuffle-invariant short doc
DOCS = [
    (1, "spark spark hive spark hive spark spark hive spark"),
    (2, "spark spark hive spark hive spark spark hive demo"),  # near-dup of 1
    (3, "alpha beta alpha beta alpha beta alpha beta alpha"),
    (4, "tiny doc here"),
    (5, "one two three four five six seven eight nine ten"),
]


def _pairs(df):
    return {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }


def test_x10_document_transform_preserves_per_copy_pairs(spark):
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    base_pairs = _pairs(base)
    assert base_pairs, "fixture must contain at least one near-dup pair"

    copies = []
    for i in range(3):
        p = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100))
        copies.append(bench.rename_tokens(p, i))
    rep = copies[0]
    for p in copies[1:]:
        rep = rep.unionByName(p)

    rep_pairs = _pairs(rep)
    # exactly K x the base pair set, each shifted into its copy's id range
    want = {
        (a + i * 100, b + i * 100) for (a, b) in base_pairs for i in range(3)
    }
    assert rep_pairs == want
    # and in particular: zero cross-copy pairs
    assert all((a // 100) == (b // 100) for a, b in rep_pairs)


def test_x10_transform_is_token_bijection(spark):
    """Token counts and per-doc distinct-shingle counts are invariant
    under the copy transform (the bijection property itself)."""
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    renamed = bench.rename_tokens(base, 7)
    b = {
        r["doc_id"]: (r["nt"], r["ns"])
        for r in base.select(
            "doc_id",
            F.size(F.split("text", r"\s+")).alias("nt"),
            F.size(
                F.array_distinct(
                    dedup.word_shingles(dedup.tokens("text"), 3)
                )
            ).alias("ns"),
        ).collect()
    }
    r = {
        r["doc_id"]: (r["nt"], r["ns"])
        for r in renamed.select(
            "doc_id",
            F.size(F.split("text", r"\s+")).alias("nt"),
            F.size(
                F.array_distinct(
                    dedup.word_shingles(dedup.tokens("text"), 3)
                )
            ).alias("ns"),
        ).collect()
    }
    assert b == r


def test_run_stress_smoke(spark, sf_dir, tmp_path):
    """The SPARK_GRAFT_BENCH_STRESS=1 path must actually run (r7 ADVICE:
    the gated call shipped referencing an undefined _run_stress, and no
    test touched the flag). Exercises the real function on a tiny ×4
    stress corpus: structure, cap monotonicity, and sentinel reuse."""
    out_dir = str(tmp_path / "stress")
    res = bench._run_stress(spark, sf_dir, out_dir=out_dir, copies=4, cap=2)

    assert set(res["configs"]) == {"uncapped", "cap2"}
    unc, cap = res["configs"]["uncapped"], res["configs"]["cap2"]
    for cfg in (unc, cap):
        assert {"candidates", "candidates_sec", "verified_pairs", "verify_sec"} <= set(
            cfg
        )
        # per-run raws (r8 verdict ask #3): min == reported stage sec
        assert cfg["candidates_sec"] == min(cfg["candidates_raw"])
        assert cfg["verify_sec"] == min(cfg["verify_raw"])
        assert len(cfg["verify_raw"]) == res["runs"]
    # first call built the corpus; its cost is in the artifact now
    assert res["build_sec"] > 0
    # the per-bucket cap can only REMOVE candidate pairs, and verify can
    # only keep a subset of candidates
    assert cap["candidates"] <= unc["candidates"]
    assert unc["verified_pairs"] <= unc["candidates"]
    assert cap["verified_pairs"] <= cap["candidates"]
    base_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    assert res["docs"] == 4 * base_docs

    # corpus is sentinel-gated: a second run reuses the build
    sentinel = os.path.join(out_dir, bench._BUILD_SENTINEL)
    mtime = os.path.getmtime(sentinel)
    res2 = bench._run_stress(spark, sf_dir, out_dir=out_dir, copies=4, cap=2)
    assert os.path.getmtime(sentinel) == mtime
    assert res2["configs"]["uncapped"]["candidates"] == unc["candidates"]
    assert res2["build_sec"] == 0.0  # sentinel hit — no rebuild cost


def test_xn_build_gated_on_completion_sentinel(spark, sf_dir, tmp_path):
    """r7 ADVICE item 2: the ×100 gate checked lineitem.parquet — written
    third of six — so a crash mid-build left a partial dir that every
    later run treated as complete. _ensure_built must gate on a sentinel
    written AFTER the last table, and a dir with table files but NO
    sentinel must be rebuilt."""
    out_dir = str(tmp_path / "x2")
    bench._ensure_built(spark, sf_dir, out_dir, copies=2)
    sentinel = os.path.join(out_dir, bench._BUILD_SENTINEL)
    assert os.path.exists(sentinel)
    # sentinel is last: every table landed before it
    for t in [
        "region", "nation", "supplier", "part", "customer",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        assert os.path.exists(os.path.join(out_dir, f"{t}.parquet"))

    # complete build: second call is a no-op
    mtime = os.path.getmtime(sentinel)
    bench._ensure_built(spark, sf_dir, out_dir, copies=2)
    assert os.path.getmtime(sentinel) == mtime

    # a sentinel from a different source/copies does NOT count as built
    # (a tiny smoke-run corpus must never be silently reused for sf0.1)
    assert not bench._is_built(out_dir, sf_dir, copies=3)
    assert not bench._is_built(out_dir, "/some/other/sf", copies=2)
    assert bench._is_built(out_dir, sf_dir, copies=2)

    # simulated crash AFTER lineitem (the old gate's blind spot): files
    # present, sentinel gone -> must rebuild
    os.unlink(sentinel)
    assert bench._ensure_built(spark, sf_dir, out_dir, copies=2) > 0
    assert os.path.exists(sentinel)
    # completed-build return contract: sentinel hit costs nothing
    assert bench._ensure_built(spark, sf_dir, out_dir, copies=2) == 0.0


def test_rebuild_drops_stale_sentinel_before_writing(spark, sf_dir, tmp_path):
    """r8 ADVICE: a rebuild for NEW params that crashes mid-way must not
    leave the OLD params' sentinel behind — otherwise a later run with
    the original params treats the partially-overwritten directory as
    complete. _build_xn unlinks the sentinel before its first write, so
    a crash anywhere in the build leaves the dir sentinel-less."""
    import pytest

    out_dir = str(tmp_path / "xn")
    bench._ensure_built(spark, sf_dir, out_dir, copies=2)
    sentinel = os.path.join(out_dir, bench._BUILD_SENTINEL)
    assert bench._is_built(out_dir, sf_dir, copies=2)

    # rebuild for different params against a source that explodes after
    # the sentinel-unlink point (nonexistent dir -> first read fails)
    with pytest.raises(Exception):
        bench._build_xn(spark, "/nonexistent/sf", out_dir, copies=3)
    assert not os.path.exists(sentinel)
    # the old params no longer vouch for the (potentially partial) dir
    assert not bench._is_built(out_dir, sf_dir, copies=2)


def test_calibration_probe_shape():
    """The machine-speed probe (r8 verdict ask #1) must be fast, fixed,
    and self-describing: single-core and all-core timings of the same
    deterministic kernel, plus the proc count they normalize by."""
    res = bench._calibrate()
    assert set(res) == {"kernel", "single_sec", "mt_sec", "procs"}
    assert res["kernel"] == "lcg32_5M"
    assert 0 < res["single_sec"] < 30
    # the burn runs procs copies of the SAME kernel; with any parallelism
    # at all it lands far under procs * single (on a 1-CPU box the pool
    # fork/map overhead can push mt slightly OVER single, so only assert
    # real parallelism when there is more than one core to parallelize)
    if res["procs"] > 1:
        assert res["mt_sec"] < res["procs"] * res["single_sec"]
    # and the kernel itself is deterministic
    assert bench._calib_kernel(1000) == bench._calib_kernel(1000)
