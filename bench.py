#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The line ENDS with
headline_digest/headline_errors/headline_core_total/headline_total so a
consumer that archives only the stdout tail still gets the gate numbers.

Each query is executed to completion (foreach-noop action, results never
collected to the driver) and timed wall-clock. A warmup pass on the
smallest table absorbs JVM/codegen startup so numbers reflect steady state.

Each query runs TWICE and the MIN is reported: the benchmark's job is to
measure the PLAN, and min-of-2 is robust to transient machine contention
(BENCH_r02 recorded 64s on a box still busy with the correctness pass;
the same suite idle measures ~47s). Set SPARK_GRAFT_BENCH_RUNS to change.

Representative-number rule (r9 verdict ask #6): when a round produces
multiple full runs, the representative headline is the run whose
calib_mt_sec is closest to the idle reference (_CALIB_IDLE_MT_REF, also
emitted in the artifact as calib_idle_mt_ref); the other runs are
variance samples. This is the rule the r9 round applied in prose — it
now lives here so future rounds don't re-litigate which number is real.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402

#: headline set: one per operator category, heaviest variants included.
HEADLINE = [
    "q01_pricing_summary",
    "q02_segment_revenue",
    "q03_top_orders",
    "q04_region_rollup",
    "q07_topk_per_customer",
    "q08_event_windows",
    "q14_local_supply_revenue",
    "q16_segment_stats_fans",
    "q18_segment_customer_stats",
    "q30_dedup_exact_clusters",
    "q32_text_quality",
    "q36_cosine_topk",
    "q40_tumbling_hourly",
    "q42_sessionization",
    "q44_stream_static_join",
    "q50_asof_join",
    "q61_lsh_ann_topk",
    "q64_tfidf_top_terms",
    "q69_stream_stream_attribution",
    "q71_grouped_agg_weighted_avg",
    "q86_near_dup_clusters",
    "q90_event_funnel",
    "q93_pq_encode",
]


#: scale-2 suite: the heaviest headline queries plus the families most
#: likely to hide a super-linear bend (r5 verdict item 2): inverted-index
#: text (q64/q311), sessionization (q42), window-heavy (q07/q148), exact
#: dedup (q30), funnel (q90), grid-cell interval join (q159). Run on a
#: ~10× concatenation of the configured SF (≈ sf1 when the base is
#: sf0.1: 6M lineitem rows) so PLAN quality — shuffle layout, broadcast
#: choice, bucketed candidate generation — dominates the signal instead
#: of the ~0.3 s/query fixed session cost that floors the sf0.1 numbers.
SCALE2 = [
    "q01_pricing_summary",
    "q02_segment_revenue",
    "q07_topk_per_customer",
    "q30_dedup_exact_clusters",
    "q42_sessionization",
    "q61_lsh_ann_topk",
    "q64_tfidf_top_terms",
    "q69_stream_stream_attribution",
    "q86_near_dup_clusters",
    "q90_event_funnel",
    "q148_rolling_range_window",
    "q159_concurrent_sessions",
    "q311_bm25_retrieval",
    # r13 additions (r12 verdict ask #4): the two r12 engine rewrites at
    # the tier where their plan wins matter — split-distinct sketch aggs
    # (q54) and the map-side Gram (q281). Additions-only: nothing removed
    # or renamed; scale2_total now sums 15 queries (was 13).
    "q54_approx_sketches",
    "q281_pca_power_iteration",
]

_X10_COPIES = 10

#: scale-3 suite (r6 verdict ask #4): a ×100 point for cheap headline
#: representatives — scan-agg, broadcast join, window, exact dedup,
#: sessionization, inverted-index text, range-frame window. The ×10
#: audit caught q249's bend that sf0.1 hid; a third decade catches
#: anything whose mild ×10 growth (q42 1.8×, q148 2.4×, q64 1.8×)
#: compounds. The interval-graph family (q159/q160/q254/q274) is
#: deliberately excluded: its ×100-workload behavior under densified
#: traffic is already characterized and knob-bounded (PERF.md round 6).
SCALE3 = [
    "q01_pricing_summary",
    "q02_segment_revenue",
    "q07_topk_per_customer",
    "q30_dedup_exact_clusters",
    "q42_sessionization",
    "q61_lsh_ann_topk",
    "q64_tfidf_top_terms",
    "q86_near_dup_clusters",
    "q148_rolling_range_window",
    # r13 addition (r12 verdict ask #4): q54 at the ×100 tier (~60 s/run,
    # measured 57.8/67.5 standalone warm). q281 is deliberately scale-2
    # only: its ×100 Gram measured 66.8–117.4 s across 2 runs — too
    # heavy/volatile for the default driver bench budget; the standalone
    # numbers are recorded in OPTIMIZATION_r13.md instead.
    "q54_approx_sketches",
]

_X100_COPIES = 100

#: scale-4 suite (r10 verdict ask #4, OPT-IN via SPARK_GRAFT_BENCH_SCALE4=1
#: — not part of the default bench budget): a one-off ×1000 growth point
#: for the two flagships whose sublinearity carries the 100 TB story.
#: q61 reads only embeddings, q86 only documents, so the corpus holds
#: just those two tables (×10 from the ×100 build — offsets and the
#: bijective token rename COMPOSE, so within-copy Jaccard structure is
#: still exactly the base corpus's and cross-copy shingle overlap stays
#: zero). The dataset is deleted after the probe unless
#: SPARK_GRAFT_KEEP_X1000=1 (disk budget).
SCALE4 = ["q61_lsh_ann_topk", "q86_near_dup_clusters"]

_X1000_FROM_X100_COPIES = 10

#: ×100 queries sampled min-of-3 instead of min-of-2 (r9 verdict ask #4):
#: r9's q64 raws [9.96, 49.2] showed a 5× back-to-back spread, and q86 is
#: the other growth-gating flagship.
_HIGH_VARIANCE_X100 = ("q64_tfidf_top_terms", "q86_near_dup_clusters")

#: sentinel written by _build_xn AFTER the last table lands. The
#: completeness gate checks THIS, not an individual table file: gating on
#: lineitem.parquet (written third of six) would treat a build that
#: crashed mid-way as complete forever (r7 ADVICE item 2).
_BUILD_SENTINEL = "_BUILD_SUCCESS"


def _write_single_file(df, out_dir: str, name: str, single: bool = False) -> None:
    """Write df as <name>.parquet. ``single=True`` produces ONE file (the
    layout the pathGlobFilter'd stream reader requires for events);
    everything else is written as a multi-file DIRECTORY named
    <name>.parquet so the scale-2 scans parallelize across row groups
    AND files — a single 200 MB file caps the scan at ~2 tasks."""
    import shutil

    target = os.path.join(out_dir, f"{name}.parquet")
    if os.path.isdir(target):
        shutil.rmtree(target)
    elif os.path.exists(target):
        os.unlink(target)
    if not single:
        df.write.mode("overwrite").parquet(target)
        return
    stage = os.path.join(out_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        f for f in os.listdir(stage) if f.endswith(".parquet") and f.startswith("part-")
    )
    shutil.move(os.path.join(stage, part), target)
    shutil.rmtree(stage)


def rename_tokens(p, i: int):
    """Copy-i document transform for the ×10 build: bijective token
    rename (t -> "t·i" for i>0; "·" does not occur in the corpus).
    A bijection on tokens maps shingle sets bijectively, so within-copy
    Jaccard structure is EXACTLY the base corpus's and cross-copy
    shingle overlap is zero — the property tests/test_bench_corpus.py
    pins (the r5 word-shuffle broke it for repetitive docs)."""
    from pyspark.sql import functions as F

    if i == 0:
        return p
    w = F.split(F.col("text"), " ")
    tagged = F.transform(w, lambda x: F.concat(x, F.lit(f"·{i}")))
    return p.withColumn("text", F.concat_ws(" ", tagged))


def shuffle_words(p, i: int):
    """Copy-i document transform for the STRESS corpus: md5-keyed word
    SHUFFLE — the bag of words is PRESERVED, only the order changes. This
    is deliberately the r5 ×10 generator that `rename_tokens` replaced:
    short/repetitive docs keep (nearly) all their shingles across copies,
    so every copy of such a doc is a TRUE near-dup of every other copy and
    candidate-pair density is pathological by construction (276 pairs at
    1× became 2.8M at ×10 in the r6 measurement). Kept on purpose as the
    adversarial-density regime for `_run_stress`."""
    from pyspark.sql import functions as F

    if i == 0:
        return p
    w = F.split(F.col("text"), " ")
    keyed = F.transform(
        w,
        lambda x: F.struct(
            F.md5(F.concat(x, F.lit(f"_{i}"))).alias("k"), x.alias("w")
        ),
    )
    shuffled = F.transform(F.array_sort(keyed), lambda s: s["w"])
    return p.withColumn("text", F.concat_ws(" ", shuffled))


def _calib_kernel(n: int = 5_000_000) -> int:
    """Fixed deterministic CPU kernel: a 32-bit LCG advanced ``n`` times in
    pure-Python integer math — no allocation growth, no I/O, no
    parallelism, the same instruction stream on every run. Its wall-clock
    is a box-speed constant, which is exactly what a cross-round
    comparison needs to normalize by."""
    x = 1
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


#: Idle-box reference for the calibration burn (measured on this tree's
#: 32-core container, rounds 8-9: mt_sec 0.77-0.80 idle). Representative-
#: number rule (r9 verdict ask #6): when a round produces several full
#: bench runs, the representative headline is the run whose calib_mt_sec
#: is CLOSEST to this reference; the others are variance samples. The
#: constant is emitted in the artifact so the rule is checkable from the
#: JSON alone.
_CALIB_IDLE_MT_REF = 0.78


def _calibrate() -> dict:
    """Machine-speed calibration probe (r8 verdict ask #1): the r8 judge
    saw join-free headline queries run at ~2× all historical recordings
    with 30% back-to-back scatter on a VERIFIABLY IDLE box (steal 0.3%),
    which the load fields cannot see — nothing else was running; the box
    itself was slow. Timing a fixed CPU kernel single-core and as an
    all-cores burn makes "bench regressed" vs "box got slow" decidable
    from the artifact alone: wall-clock drift that tracks
    ``calib_single_sec`` / ``calib_mt_sec`` is machine state, drift that
    doesn't is the plans. Runs BEFORE the SparkSession exists so the
    probe measures the bare box. Reference values for the r8 tree are
    recorded in PERF.md (round 9)."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    _calib_kernel()
    single = time.perf_counter() - t0
    procs = os.cpu_count() or 1
    # fork (not spawn): children inherit the interpreter directly, so the
    # burn measures CPU throughput, not 32 interpreter start-ups
    ctx = mp.get_context("fork")
    t0 = time.perf_counter()
    with ctx.Pool(procs) as pool:
        pool.map(_calib_kernel, [5_000_000] * procs)
    mt = time.perf_counter() - t0
    return {
        "kernel": "lcg32_5M",
        "single_sec": round(single, 3),
        "mt_sec": round(mt, 3),
        "procs": procs,
    }


def _calibrate_in_subprocess(timeout: float = 180.0) -> dict:
    """Run `_calibrate` in a fresh interpreter. The end-of-bench probe
    (r9 ADVICE) must not fork a multiprocessing Pool inside THIS process:
    by then the Spark JVM / py4j gateway and its background Python threads
    are live, and forking a multithreaded process can deadlock — a hang
    the in-process try/except could never catch (it would stall the bench
    after all suites completed and lose the whole artifact). A fresh
    subprocess forks only its own single-threaded self, so the kernel
    measurement stays identical to the front probe's fork-pool numbers,
    and the subprocess timeout bounds a pathological hang."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-c",
         "import json, bench; print(json.dumps(bench._calibrate()))"],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _free_local_checkpoint(df) -> None:
    """Release the block-manager storage behind a localCheckpoint()'ed
    DataFrame. `Dataset.unpersist()` only evicts CacheManager entries —
    it does NOT touch the RDD-level persistence localCheckpoint sets up
    (verified against pyspark 4.1.2: getPersistentRDDs stays at 1 after
    df.unpersist, drops to 0 after this) — so reach through the
    LogicalRDD to its backing RDD. Fail-soft: if the plan shape ever
    changes, the blocks just age out of storage memory as before."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _ckpt_rdd_id(df):
    """RDD id backing a localCheckpoint()'ed DataFrame (None if the plan
    isn't a bare LogicalRDD)."""
    try:
        return df._jdf.queryExecution().analyzed().rdd().id()
    except Exception:
        return None


def _persistent_ids(spark) -> set:
    """Ids of every RDD currently persisted in the block manager."""
    try:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    except Exception:
        return set()


def _unpersist_ids(spark, ids) -> None:
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            rdd = jmap.get(i)
            if rdd is not None:
                rdd.unpersist(False)
    except Exception:
        pass


def _run_stress(
    spark,
    sf_dir: str,
    out_dir: str | None = None,
    copies: int | None = None,
    cap: int = 16,
) -> dict:
    """Adversarial-density stress row (r6 verdict ask #7, opt-in via
    SPARK_GRAFT_BENCH_STRESS=1): measure q86's candidate-generation and
    verify stages on a hot corpus, with and without the per-bucket cap,
    so the escape hatch's effect stays a measured number instead of a
    one-off PERF.md table (the r6 numbers: candidates 2.80M → 222k,
    verify 19.3 s → 5.2 s at cap=16).

    The corpus is ``copies``× documents under the bag-preserving word
    shuffle (see `shuffle_words`), built once under data/bench_stress
    (sentinel-gated like the other bench corpora). Shingle index and
    minhash signatures are SHARED between the capped and uncapped
    configs (localCheckpoint barriers), so each recorded stage times
    only itself.
    """
    from pyspark.sql import functions as F

    from hive_feature_demo_spark.operators import dedup

    copies = copies or int(os.environ.get("SPARK_GRAFT_BENCH_STRESS_COPIES", "10"))
    out_dir = out_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "bench_stress"
    )
    sentinel = os.path.join(out_dir, _BUILD_SENTINEL)
    build_sec = 0.0
    if not _is_built(out_dir, sf_dir, copies):
        t_build = time.perf_counter()
        os.makedirs(out_dir, exist_ok=True)
        # drop any stale sentinel FIRST (r8 ADVICE): if this rebuild (for
        # new params) crashes mid-write, the old sentinel must not keep
        # vouching for the now partially-overwritten directory
        try:
            os.unlink(sentinel)
        except FileNotFoundError:
            pass
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        hi = docs.agg(F.max("doc_id")).first()[0] or 1
        off = 1
        while off <= hi:
            off *= 10
        parts = [
            shuffle_words(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * off)), i
            )
            for i in range(copies)
        ]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        _write_single_file(union, out_dir, "documents")
        os.sync()  # same writeback isolation as _ensure_built
        with open(sentinel, "w") as f:
            f.write(_build_tag(sf_dir, copies))
        build_sec = round(time.perf_counter() - t_build, 1)
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))

    # min-of-N with per-run raws (r8 verdict ask #3): the uncapped verify
    # stage has measured 19.3 s (r6) and 50.2 s (r8) on the same corpus —
    # a single sample can't say whether that's the stage or the box.
    s_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_STRESS_RUNS", "2")))

    def timed(fn):
        """min-of-N timer over fns returning (result, [checkpointed dfs]).
        Every persisted block a run creates is released as soon as the
        run's timing is recorded, EXCEPT the blocks backing the run's
        returned DataFrames (r9 ADVICE: eager localCheckpoints from
        thrown-away runs — including the operators' own internal
        checkpoints, e.g. `dedup.py:193,249` — otherwise pile up in
        storage memory across the stress suite and perturb the very
        timings being measured). Prior runs' kept blocks are freed before
        the next run starts; only the FINAL run's returned checkpoints
        survive, and internals are always releasable because every
        returned DataFrame is itself eagerly materialized."""
        raws: list[float] = []
        res, ckpts = None, []
        prev_keep: set = set()
        for _ in range(s_runs):
            _unpersist_ids(spark, prev_keep)
            before = _persistent_ids(spark)
            t0 = time.perf_counter()
            res, ckpts = fn()
            raws.append(round(time.perf_counter() - t0, 2))
            keep = {i for i in (_ckpt_rdd_id(d) for d in ckpts) if i is not None}
            _unpersist_ids(spark, (_persistent_ids(spark) - before) - keep)
            prev_keep = keep
        return res, min(raws), raws, ckpts

    def prep():
        sh = dedup.shingle_index(docs, "doc_id", "text", 3).localCheckpoint(
            eager=True
        )
        sig = dedup.minhash_signatures_from_index(sh, "doc_id", 16).localCheckpoint(
            eager=True
        )
        return (sh, sig), [sh, sig]

    (sh, sig), prep_sec, prep_raw, _ = timed(prep)
    result: dict = {
        "copies": copies,
        "docs": docs.count(),
        "cap": cap,
        "build_sec": build_sec,
        "runs": s_runs,
        "shared_prep_sec": prep_sec,
        "shared_prep_raw": prep_raw,
        "configs": {},
    }
    for label, cap_v in (("uncapped", None), (f"cap{cap}", cap)):
        def gen_cands():
            c = dedup.lsh_candidate_pairs(
                sig, "doc_id", 4, 4, max_bucket_width=cap_v
            ).localCheckpoint(eager=True)
            return (c, c.count()), [c]

        (cands, n_cand), cand_sec, cand_raw, cand_ckpts = timed(gen_cands)

        def verify():
            v = dedup.verify_jaccard_on_candidates(
                sh, cands, "doc_id", 0.5
            ).localCheckpoint(eager=True)
            return v.count(), [v]

        n_ver, ver_sec, ver_raw, ver_ckpts = timed(verify)
        result["configs"][label] = {
            "candidates": n_cand,
            "candidates_sec": cand_sec,
            "candidates_raw": cand_raw,
            "verified_pairs": n_ver,
            "verify_sec": ver_sec,
            "verify_raw": ver_raw,
        }
        # this config is done — its candidate + verify blocks must not
        # occupy storage memory while the next config is being timed
        for prev in cand_ckpts + ver_ckpts:
            _free_local_checkpoint(prev)
    return result


def _build_xn(
    spark, src_dir: str, out_dir: str, copies: int, single_events: bool = True
) -> None:
    """Materialize a ~``copies``× concatenation of src_dir (scale-2 uses
    ×10 with a single-file events layout for the stream readers; scale-3
    uses ×100 with multi-file events — no streaming queries there, and a
    directory scan parallelizes across files).

    Key columns are offset per copy so FK joins keep their selectivity
    (orders↔lineitem share the same orderkey offset; events shift
    user_id so stream-stream attribution pairs scale ×10, not ×100);
    document text gets a per-copy BIJECTIVE TOKEN RENAME (every token t
    in copy i>0 becomes "t·i", "·" = a char absent from the corpus): a
    bijection on tokens maps each copy's shingle sets bijectively, so
    every within-copy Jaccard value — and hence the near-dup pair set —
    is EXACTLY the base corpus's, per copy, while cross-copy shingle
    overlap is zero. The true near-dup workload therefore scales ×10
    like everything else. (r5 used an md5-keyed word SHUFFLE instead;
    the r6 stage profile showed that preserves the bag of words, so
    short/repetitive docs stayed near-identical across copies: 276
    candidate pairs at 1× became 2.8M at ×10 — a 10,000× workload
    explosion measured as "q86 scales badly". A rotation would NOT work
    either: it preserves every consecutive triple except the seam.)
    Dimensions (region..customer) pass through unchanged so
    broadcast-vs-shuffle decisions face the same dimension sizes with a
    10× fact side — exactly the 100 TB shape in miniature.
    """
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    # drop any stale sentinel FIRST (r8 ADVICE): a sentinel written by a
    # build with DIFFERENT (src, copies) must not survive a crash of this
    # rebuild, or a later run with the original params would treat the
    # partially-overwritten directory as complete
    try:
        os.unlink(os.path.join(out_dir, _BUILD_SENTINEL))
    except FileNotFoundError:
        pass
    for t in ["region", "nation", "supplier", "part", "customer"]:
        _write_single_file(
            spark.read.parquet(os.path.join(src_dir, f"{t}.parquet")), out_dir, t
        )

    def replicate(df, offsets: dict[str, int], extra=None):
        parts = []
        for i in range(copies):
            p = df
            for c, off in offsets.items():
                p = p.withColumn(c, F.col(c) + F.lit(i * off))
            if extra is not None:
                p = extra(p, i)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def next_pow10(df, col) -> int:
        hi = df.agg(F.max(col)).first()[0] or 1
        off = 1
        while off <= hi:
            off *= 10
        return off

    orders = spark.read.parquet(os.path.join(src_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(src_dir, "lineitem.parquet"))
    okey_off = next_pow10(orders, "o_orderkey")
    _write_single_file(replicate(orders, {"o_orderkey": okey_off}), out_dir, "orders")
    _write_single_file(
        replicate(lineitem, {"l_orderkey": okey_off}), out_dir, "lineitem"
    )

    events = spark.read.parquet(os.path.join(src_dir, "events.parquet"))
    _write_single_file(
        replicate(
            events,
            {
                "event_id": next_pow10(events, "event_id"),
                "user_id": next_pow10(events, "user_id"),
            },
        ),
        out_dir,
        "events",
        single=single_events,  # stream reader's pathGlobFilter needs one FILE
    )

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))

    _write_single_file(
        replicate(
            docs, {"doc_id": next_pow10(docs, "doc_id")}, extra=rename_tokens
        ),
        out_dir,
        "documents",
    )

    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    _write_single_file(
        replicate(emb, {"vec_id": next_pow10(emb, "vec_id")}), out_dir, "embeddings"
    )
    with open(os.path.join(out_dir, _BUILD_SENTINEL), "w") as f:
        f.write(_build_tag(src_dir, copies))


def _build_x1000_docs(spark, x100_dir: str, out_dir: str) -> float:
    """×1000 documents+embeddings corpus = the ×100 tables replicated ×10.

    Same invariants as _build_xn, composed: doc_id/vec_id get a
    power-of-10 offset per copy, and rename_tokens appends a fresh "·i"
    suffix to every token — injective on top of the ×100 suffixes, so
    each copy's shingle sets map bijectively onto the ×100 corpus's and
    cross-copy overlap is zero. Only the two flagship tables are built:
    a full ×1000 star corpus would cost ~20 GB of lineitem nobody reads.
    Sentinel-gated like _ensure_built (tag records src=x100 + copies=10).
    """
    from pyspark.sql import functions as F

    copies = _X1000_FROM_X100_COPIES
    if _is_built(out_dir, x100_dir, copies):
        return 0.0
    t0 = time.perf_counter()
    os.makedirs(out_dir, exist_ok=True)
    try:
        os.unlink(os.path.join(out_dir, _BUILD_SENTINEL))
    except FileNotFoundError:
        pass

    def replicate(df, key: str, extra=None):
        hi = df.agg(F.max(key)).first()[0] or 1
        off = 1
        while off <= hi:
            off *= 10
        parts = []
        for i in range(copies):
            p = df.withColumn(key, F.col(key) + F.lit(i * off))
            if extra is not None:
                p = extra(p, i)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    docs = spark.read.parquet(os.path.join(x100_dir, "documents.parquet"))
    _write_single_file(
        replicate(docs, "doc_id", extra=rename_tokens), out_dir, "documents"
    )
    emb = spark.read.parquet(os.path.join(x100_dir, "embeddings.parquet"))
    _write_single_file(replicate(emb, "vec_id"), out_dir, "embeddings")
    with open(os.path.join(out_dir, _BUILD_SENTINEL), "w") as f:
        f.write(_build_tag(x100_dir, copies))
    os.sync()
    build_sec = round(time.perf_counter() - t0, 1)
    print(f"bench: built x1000 docs corpus in {build_sec}s", file=sys.stderr)
    return build_sec


def _build_tag(src_dir: str, copies: int) -> str:
    return f"copies={copies}\nsrc={os.path.abspath(src_dir)}\n"


def _is_built(out_dir: str, src_dir: str, copies: int) -> bool:
    """True iff a build with THIS (src, copies) completed in out_dir.
    The sentinel content is compared, not just its existence, so a
    corpus built from a different SF (e.g. a tiny smoke run) or copy
    count is rebuilt instead of silently reused."""
    try:
        with open(os.path.join(out_dir, _BUILD_SENTINEL)) as f:
            return f.read() == _build_tag(src_dir, copies)
    except OSError:
        return False


def _ensure_built(
    spark, src_dir: str, out_dir: str, copies: int, single_events: bool = True
) -> float:
    """Build the ×``copies`` corpus unless the sentinel says a build
    COMPLETED there from the same source. A directory without a matching
    sentinel — including one holding every table file because a previous
    build died during its last write — is rebuilt (table writes are
    mode=overwrite, so rebuilding into a partial dir is safe).

    Returns the build wall seconds (0.0 on a sentinel hit) so the bench
    JSON can record it (r8 verdict ask #4): the corpora are gitignored,
    so a fresh clone pays the full rebuild inside the bench wall, and a
    stderr-only print never reaches the driver's stdout-tail archive."""
    if _is_built(out_dir, src_dir, copies):
        return 0.0
    t0 = time.perf_counter()
    _build_xn(spark, src_dir, out_dir, copies, single_events=single_events)
    # flush the build's dirty pages NOW (blocking) instead of letting
    # background writeback race the timed queries: the first post-rebuild
    # scale-3 run measured q01 at 33 s vs 6 s steady-state because ~1.5 GB
    # of freshly written corpus was still flushing during the timed scans
    os.sync()
    build_sec = round(time.perf_counter() - t0, 1)
    print(f"bench: built x{copies} dataset in {build_sec}s", file=sys.stderr)
    return build_sec


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _warm_tables(spark, sf_dir: str) -> float:
    """One untimed full scan of every parquet table in ``sf_dir`` so the
    timed scale-3 runs measure PLANS on a page-cache-warm corpus, not OS
    cache state (r7 verdict ask #3: the driver measured q64 ×100 growth
    at 9.3× warm while a cache-cold run of identical plans measured 33×).
    Returns the warm-pass wall seconds (recorded, never added to query
    timings)."""
    t0 = time.perf_counter()
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            spark.read.parquet(os.path.join(sf_dir, f)).write.format("noop").mode(
                "overwrite"
            ).save()
    return round(time.perf_counter() - t0, 2)


def _run_suite(spark, names, sf_dir, runs, timings, errors, core=None, raw=None) -> None:
    """Time each query ``runs`` times. ``timings[name]`` = min over all
    runs (the historical BENCH contract); ``core[name]`` = min over the
    POST-WARM runs (2..n) — the plan's steady-state cost with the
    per-query session/stream fixed cost already absorbed by run 1
    (r5 verdict item 7: both numbers recorded so plan quality, not setup
    floor, dominates the headline read). ``raw[name]`` = the full per-run
    list (r8 verdict ask #3): min-of-N hides variance, and "stable 2.8 s"
    vs "1.6 s and 4.0 s" is exactly the machine-drift question the
    calibration probe exists to settle."""
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            continue
        best = float("inf")
        warm_best = float("inf")
        runs_l: list[float] = []
        try:
            for i in range(runs):
                before = _persistent_ids(spark)
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                # release every block this run persisted (operators'
                # internal eager localCheckpoints — q86's CC iterations
                # above all): the result is fully materialized by the noop
                # write, and the next run rebuilds from scratch, so leaked
                # blocks only pile up in storage memory across min-of-N
                # runs and perturb the later samples (same hazard the
                # stress row's timed() fixed per r9 ADVICE).
                _unpersist_ids(spark, _persistent_ids(spark) - before)
                runs_l.append(round(dt, 3))
                best = min(best, dt)
                if i > 0:
                    warm_best = min(warm_best, dt)
            timings[name] = round(best, 3)
            if core is not None:
                core[name] = round(warm_best if runs > 1 else best, 3)
            if raw is not None:
                raw[name] = runs_l
        except Exception as exc:  # fail-soft (BENCH_r03 lesson)
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)


def _contract_line(out: dict, timings: dict[str, float]) -> str:
    """Driver-parseable contract line (r12 measurement fix, documented in
    OPTIMIZATION_r12.md).

    The driver archives AND PARSES only the last ~2000 chars of bench
    stdout. BENCH_r06..r11 all record ``"parsed": null`` because the full
    artifact line outgrew that window; r01/r02/r04/r05 — whose line was
    exactly ``{metric, value, unit, queries, sf}`` and small — parsed
    fine. The full artifact is still printed first for adjudication; this
    FINAL line repeats the contract keys in r01's parsed shape plus the
    scalar gate keys, sized to always fit the tail window whole. Same
    queries (names and numbers), same methodology — nothing is
    re-measured, only re-serialized small enough to survive the tail.
    """
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": out["sf"],
        "headline_errors": out["headline_errors"],
        "headline_core_total": out["headline_core_total"],
        "calib_mt_sec": out["calib_mt_sec"],
        "calib_idle_mt_ref": _CALIB_IDLE_MT_REF,
    }
    for blk in ("scale2", "scale3", "scale4"):
        t = out.get(blk, {}).get("total")
        if t is not None:
            compact[blk + "_total"] = t
    line = json.dumps(compact)
    if len(line) >= 1900:  # never let the contract line outgrow the window again
        # drop the per-query map — the dominant size contributor — so the
        # fallback is bounded UNCONDITIONALLY (r12 ADVICE: keeping queries
        # in the fallback left the "always fits" claim unenforced); keep
        # the scalar gate keys plus a query count, and warn loudly so a
        # silent downgrade is visible in the run log
        print(
            f"bench: contract line {len(line)} chars >= 1900 — "
            "dropping per-query map from the compact line",
            file=sys.stderr,
        )
        compact = {
            k: compact[k] for k in compact if k != "queries"
        }
        compact["n_queries"] = len(timings)
        line = json.dumps(compact)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # machine-load bookkeeping (r6 verdict ask #3): r2's 64 s and r6's
    # 29.7 s driver benches were both contention-polluted and needed
    # after-the-fact forensics. Idle criterion (PERF.md): load_start[0]
    # / cpus < ~0.3; above that, treat wall-clock drift vs the previous
    # round as contention first, plan regression second.
    load_start = list(os.getloadavg())
    # machine-speed calibration (r8 verdict ask #1) BEFORE the JVM exists:
    # a fixed CPU kernel timed single-core and as an all-cores burn, so a
    # cross-round wall-clock comparison can normalize for box speed from
    # the artifact alone. r9 reference values on an idle box: PERF.md.
    # Fail-soft: a probe failure must never erase the headline measurement.
    try:
        calib = _calibrate()
    except Exception as exc:
        calib = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    spark = get_spark(app_name="bench")

    # warmup: JVM + whole-stage codegen + shuffle machinery + parquet
    # footer caches — a tiny agg+join compiles the common codegen paths so
    # the first measured query doesn't absorb them
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    core: dict[str, float] = {}
    errors: dict[str, str] = {}
    raw_1x: dict[str, list[float]] = {}
    _run_suite(spark, HEADLINE, sf_dir, runs, timings, errors, core=core, raw=raw_1x)
    headline_errors = dict(errors)  # only these decide the exit code

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_core": core,
        "core_total": round(sum(core.values()), 3),
        "runs_raw": raw_1x,
        "calib": calib,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # second scale point: top-5 on a ~10× concatenation (≈ sf1 from
    # sf0.1). Built once and reused; disable with SPARK_GRAFT_BENCH_SCALE2=0.
    base1x = dict(timings)
    if os.environ.get("SPARK_GRAFT_BENCH_SCALE2", "1") != "0":
        x10_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data", "bench_x10"
        )
        try:
            build2_sec = _ensure_built(spark, sf_dir, x10_dir, _X10_COPIES)
            # 1× reference for scale-2 queries outside the headline set,
            # so every scale-2 entry gets a growth factor
            extra = [n for n in SCALE2 if n not in base1x]
            if extra:
                _run_suite(spark, extra, sf_dir, runs, base1x, errors, raw=raw_1x)
            # same untimed warm pass as scale-3 (r8 ADVICE): without it the
            # ×100/×10 growth ratio compares a warm-scanned numerator
            # against a possibly part-cold denominator and biases low for
            # scan-bound queries
            warm2_sec = _warm_tables(spark, x10_dir)
            t2: dict[str, float] = {}
            c2: dict[str, float] = {}
            raw2: dict[str, list[float]] = {}
            _run_suite(spark, SCALE2, x10_dir, runs, t2, errors, core=c2, raw=raw2)
            # growth factor vs the 1× timing for the same query
            # (the scale audit: ~1×–10× expected on 10× data; >12× = bend)
            growth = {
                n: round(t2[n] / base1x[n], 2)
                for n in t2
                if base1x.get(n, 0) > 0
            }
            out["scale2"] = {
                "sf": (float(sf) if sf.replace(".", "").isdigit() else 0.1)
                * _X10_COPIES,
                "build_sec": build2_sec,
                "warm_pass_sec": warm2_sec,
                "queries": t2,
                "queries_core": c2,
                "runs_raw": raw2,
                "growth_vs_1x": growth,
                "total": round(sum(t2.values()), 3),
            }
        except Exception as exc:  # scale-2 must never erase the headline line
            errors["_scale2_build"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: scale2 FAILED: {errors['_scale2_build']}", file=sys.stderr)

    # third scale point (r6 verdict ask #4): ×100 for the cheap
    # representatives — growth factors recorded against BOTH the 1× and
    # the ×10 timing of the same query, so a compounding super-linearity
    # shows up as growth_vs_x10 >> 10 even when sf0.1 hides it. Min-of-2
    # per query by default (SPARK_GRAFT_BENCH_SCALE3_RUNS, see below);
    # disable the whole suite with SPARK_GRAFT_BENCH_SCALE3=0.
    # mid-bench calibration (r10 verdict ask #3): the front probe predates
    # the suites and calib_end postdates them, so a box that degrades
    # mid-bench leaves the scale-3 numbers unadjudicable (r10: calib 1.217
    # -> calib_end 2.446 bracketed an 87.5 s scale-3 the idle re-run read
    # at 63.3 s, with nothing to say WHEN the slowdown started). A
    # subprocess probe here splits the window: headline+scale2 are judged
    # by calib..calib_mid, scale-3 by calib_mid..calib_end. Fail-soft.
    try:
        out["calib_mid"] = _calibrate_in_subprocess()
    except Exception as exc:
        out["calib_mid"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    if os.environ.get("SPARK_GRAFT_BENCH_SCALE3", "1") != "0":
        x100_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data", "bench_x100"
        )
        try:
            build3_sec = _ensure_built(
                spark, sf_dir, x100_dir, _X100_COPIES, single_events=False
            )
            extra3 = [n for n in SCALE3 if n not in base1x]
            if extra3:
                _run_suite(spark, extra3, sf_dir, runs, base1x, errors, raw=raw_1x)
            # untimed warm scan so page-cache state isn't part of the
            # measurement (cache policy: PERF.md round 8)
            warm_sec = _warm_tables(spark, x100_dir)
            t3: dict[str, float] = {}
            raw3: dict[str, list[float]] = {}
            # min-of-2 like the other suites: single-run ×100 probes on
            # the same cached corpus measured q01 at 6.1 s and 16.9 s
            # forty minutes apart (residual box load) — a growth factor
            # derived from one sample is noise, not a plan property
            s3_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SCALE3_RUNS", "2")))
            # min-of-3 for the two highest-variance ×100 queries (r9
            # verdict ask #4): q64's r9 raws were [9.96, 49.2] — a 5×
            # back-to-back spread that min-of-2 can still land inside —
            # and q86 is the other flagship whose growth factor gates the
            # scale story. Everything else stays min-of-2 so the suite's
            # wall time doesn't inflate across the board.
            hv_runs = max(3, s3_runs)
            stable3 = [n for n in SCALE3 if n not in _HIGH_VARIANCE_X100]
            hv3 = [n for n in SCALE3 if n in _HIGH_VARIANCE_X100]
            _run_suite(spark, stable3, x100_dir, s3_runs, t3, errors, raw=raw3)
            if hv3:
                _run_suite(spark, hv3, x100_dir, hv_runs, t3, errors, raw=raw3)
            x10_t = out.get("scale2", {}).get("queries", {})
            out["scale3"] = {
                "sf": (float(sf) if sf.replace(".", "").isdigit() else 0.1)
                * _X100_COPIES,
                "runs_policy": {
                    "default": s3_runs,
                    **{n: hv_runs for n in hv3},
                },
                "build_sec": build3_sec,
                "warm_pass": True,
                "warm_pass_sec": warm_sec,
                "dataset_bytes": _dir_bytes(x100_dir),
                "queries": t3,
                "runs_raw": raw3,
                "growth_vs_1x": {
                    n: round(t3[n] / base1x[n], 2)
                    for n in t3
                    if base1x.get(n, 0) > 0
                },
                "growth_vs_x10": {
                    n: round(t3[n] / x10_t[n], 2)
                    for n in t3
                    if x10_t.get(n, 0) > 0
                },
                "total": round(sum(t3.values()), 3),
            }
        except Exception as exc:  # scale-3 must never erase the headline line
            errors["_scale3_build"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: scale3 FAILED: {errors['_scale3_build']}", file=sys.stderr)

    # fourth decade, opt-in (r10 verdict ask #4): ×1000 growth point for
    # the two flagships only. Buys growth_vs_x100 measured instead of
    # extrapolated; the corpus (docs+embeddings only, ~3-4 GB) is deleted
    # after unless SPARK_GRAFT_KEEP_X1000=1.
    if os.environ.get("SPARK_GRAFT_BENCH_SCALE4", "0") == "1":
        x1000_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data", "bench_x1000"
        )
        try:
            x100_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "data", "bench_x100"
            )
            _ensure_built(spark, sf_dir, x100_dir, _X100_COPIES, single_events=False)
            build4_sec = _build_x1000_docs(spark, x100_dir, x1000_dir)
            warm4_sec = _warm_tables(spark, x1000_dir)
            t4: dict[str, float] = {}
            raw4: dict[str, list[float]] = {}
            s4_runs = max(
                1, int(os.environ.get("SPARK_GRAFT_BENCH_SCALE4_RUNS", "2"))
            )
            _run_suite(spark, SCALE4, x1000_dir, s4_runs, t4, errors, raw=raw4)
            x100_t = out.get("scale3", {}).get("queries", {})
            out["scale4"] = {
                "sf": (float(sf) if sf.replace(".", "").isdigit() else 0.1)
                * _X100_COPIES
                * _X1000_FROM_X100_COPIES,
                "tables": ["documents", "embeddings"],
                "runs": s4_runs,
                "build_sec": build4_sec,
                "warm_pass_sec": warm4_sec,
                "dataset_bytes": _dir_bytes(x1000_dir),
                "queries": t4,
                "runs_raw": raw4,
                "growth_vs_x100": {
                    n: round(t4[n] / x100_t[n], 2)
                    for n in t4
                    if x100_t.get(n, 0) > 0
                },
                "total": round(sum(t4.values()), 3),
            }
        except Exception as exc:  # scale-4 must never erase the headline line
            errors["_scale4_build"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: scale4 FAILED: {errors['_scale4_build']}", file=sys.stderr)
        finally:
            if os.environ.get("SPARK_GRAFT_KEEP_X1000", "0") != "1":
                import shutil

                shutil.rmtree(x1000_dir, ignore_errors=True)

    # adversarial-density stress row (r6 verdict ask #7, opt-in): the
    # r5-style bag-of-words-preserving ×10 documents — short/repetitive
    # docs stay TRUE near-dups across copies, so candidate density is
    # pathological by construction. Measures the q86 candidate+verify
    # stages with and without the per-bucket cap so the escape hatch's
    # effect stays a measured number, not a one-off PERF.md table.
    if os.environ.get("SPARK_GRAFT_BENCH_STRESS", "0") == "1":
        try:
            out["stress"] = _run_stress(spark, sf_dir)
        except Exception as exc:
            errors["_stress"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: stress FAILED: {errors['_stress']}", file=sys.stderr)

    out["load"] = {
        "start": [round(v, 2) for v in load_start],
        "end": [round(v, 2) for v in os.getloadavg()],
        "cpus": os.cpu_count(),
    }
    # second calibration sample AFTER the suites: the start probe can't
    # see the box slowing down DURING a multi-minute run (r9's q64 ×100
    # raws measured 9.96 s then 49.2 s back-to-back near the end of the
    # bench — calib_end tells whether that was the box). Subprocess, not
    # in-process: the JVM/py4j threads are live by now (r9 ADVICE).
    try:
        out["calib_end"] = _calibrate_in_subprocess()
    except Exception as exc:
        out["calib_end"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    if errors:
        out["errors"] = errors
    # compact calibration duplicates INSIDE the tail window: the full
    # "calib" dict sits near the JSON front, which the driver's
    # last-~2000-chars stdout archive truncates away — the numbers the
    # cross-round comparison needs must live with the trailing gate keys
    out["calib_single_sec"] = calib.get("single_sec")
    out["calib_mt_sec"] = calib.get("mt_sec")
    out["calib_mid_mt_sec"] = out.get("calib_mid", {}).get("mt_sec")
    # the representative-number rule's reference (r9 verdict ask #6): of
    # several runs, the one with calib_mt_sec closest to this idle value
    # is the representative headline; the rest are variance samples
    out["calib_idle_mt_ref"] = _CALIB_IDLE_MT_REF
    # trailing gate summary (r7 verdict ask #2): the driver archives only
    # the LAST ~2000 chars of bench stdout, and "value" sits at the JSON
    # front — BENCH_r06/r07 both lost the headline numbers to truncation.
    # These are therefore the FINAL keys, headline_total last of all.
    per_q = sorted(timings.values())
    n = len(per_q)
    out["headline_digest"] = (
        {
            "n": n,
            "min": per_q[0],
            "p25": per_q[n // 4],
            "median": per_q[n // 2],
            "p75": per_q[(3 * n) // 4],
            "max": per_q[-1],
        }
        if n
        else {"n": 0}
    )
    out["headline_errors"] = len(headline_errors)
    out["headline_core_total"] = out["core_total"]
    out["headline_total"] = total
    print(json.dumps(out))
    print(_contract_line(out, timings))
    # scale-2 problems are recorded in the JSON but must not fail the
    # bench — the headline suite is the driver's contract
    if headline_errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
