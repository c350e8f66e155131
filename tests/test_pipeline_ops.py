"""Invariant + plan-shape tests for the pipeline-analytics family
(q228-q236): weighted sampling, time-series diagnostics, containment
dedup, weighted median, Theil-Sen, chunk manifest, strip-hash near-dup.

Oracle parity is covered by test_oracle_parity.py; these tests pin the
properties the oracle can't see — selection invariants, banding
losslessness, and the physical plan shapes the 100 TB story depends on.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q228_sample_is_top_k_no_global_sort(spark):
    """A-ES sampling must plan as TakeOrdered (per-partition top-k merged
    on the driver), never a full Sort + single-partition Exchange."""
    from hive_feature_demo_spark.plans.pipeline_ops import (
        q228_weighted_reservoir_sample,
    )

    df = q228_weighted_reservoir_sample(spark, SF_DIR)
    plan = _formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) == 20
    assert len({r.o_orderkey for r in rows}) == 20


def test_q228_weight_monotonicity(spark):
    """Sampling keys must favor heavier weights: the sampled orders'
    mean totalprice should exceed the population mean (the point of
    weighted sampling). Deterministic — the md5 draw is fixed."""
    from hive_feature_demo_spark.plans.pipeline_ops import (
        q228_weighted_reservoir_sample,
    )

    sampled = q228_weighted_reservoir_sample(spark, SF_DIR).agg(
        F.avg("o_totalprice")
    ).first()[0]
    pop = table(spark, SF_DIR, "orders").agg(F.avg("o_totalprice")).first()[0]
    assert sampled > pop


def test_q230_cusum_matches_recursive_reference(spark):
    """The closed prefix form S_t = C_t - min(0, min_{j<=t} C_j) must
    equal the textbook recursion S_t = max(0, S_{t-1} + dev_t) replayed
    in plain Python over the same daily series."""
    from hive_feature_demo_spark.plans.pipeline_ops import (
        _daily,
        q230_cusum_changepoints,
    )

    daily = sorted(_daily(spark, SF_DIR).collect(), key=lambda r: r.day)
    xs = [r.rev for r in daily]
    mu = sum(xs) / len(xs)  # reference only needs approximate mu/sigma
    sigma = (sum((x - mu) ** 2 for x in xs) / len(xs)) ** 0.5
    k = 0.5 * sigma
    sp = sn = 0.0
    ref = []
    for x in xs:
        sp = max(0.0, sp + x - mu - k)
        sn = max(0.0, sn + mu - x - k)
        ref.append((sp, sn))
    got = sorted(
        q230_cusum_changepoints(spark, SF_DIR).collect(), key=lambda r: r.day
    )
    assert len(got) == len(ref)
    for (rsp, rsn), row in zip(ref, got):
        assert row.s_pos == pytest.approx(rsp, abs=1e-4)
        assert row.s_neg == pytest.approx(rsn, abs=1e-4)


def test_q233_weighted_median_invariant(spark):
    """At the picked price, cumulative weight first reaches half the
    total: weight strictly below the median is < W/2, weight up to and
    including it is >= W/2."""
    from hive_feature_demo_spark.plans.pipeline_ops import q233_weighted_median

    got = {r.l_returnflag: r for r in q233_weighted_median(spark, SF_DIR).collect()}
    li = (
        table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    for flag, row in got.items():
        rows = [r for r in li if r.l_returnflag == flag]
        w_total = sum(r.l_quantity for r in rows)
        assert row.total_weight == int(w_total)
        below = sum(
            r.l_quantity for r in rows if r.l_extendedprice < row.weighted_median_price
        )
        at_or_below = sum(
            r.l_quantity
            for r in rows
            if r.l_extendedprice <= row.weighted_median_price
        )
        assert 2 * below < w_total
        assert 2 * at_or_below >= w_total


def test_q236_banding_is_lossless(spark):
    """4x8-bit band candidate generation must find EXACTLY the pairs a
    brute-force all-pairs Hamming scan over the hashes finds at the <=3
    threshold (pigeonhole: 3 flipped bits leave one band intact)."""
    from hive_feature_demo_spark.operators import multimodal
    from hive_feature_demo_spark.plans.mediaops import q236_strip_hash_neardup

    docs = table(spark, SF_DIR, "documents")
    hashes = {
        r.asset_id: r.strip_hash
        for r in multimodal.strip_hashes(
            multimodal.assets_from_documents(docs)
        ).collect()
    }
    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b)
        for r in q236_strip_hash_neardup(spark, SF_DIR).collect()
    }
    assert got == brute


def test_q236_payloads_stay_out_of_the_join(spark):
    """The near-dup join must shuffle only (id, hash, band) rows — the
    binary content column must not appear in any exchange input."""
    from hive_feature_demo_spark.plans.mediaops import q236_strip_hash_neardup

    plan = _formatted_plan(q236_strip_hash_neardup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q235_manifest_reassembles_payload(spark):
    """Chunks must tile the payload exactly: lengths sum to the doc
    length and every chunk is full-size except the last."""
    from hive_feature_demo_spark.plans.mediaops import _CHUNK, q235_media_chunk_manifest

    docs = {r.doc_id: len(r.text) for r in table(spark, SF_DIR, "documents").collect()}
    rows = q235_media_chunk_manifest(spark, SF_DIR).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == set(docs)
    for aid, chunks in by_asset.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert sum(c.chunk_len for c in chunks) == docs[aid]
        assert all(c.chunk_len == _CHUNK for c in chunks[:-1])
        assert chunks[-1].chunk_len >= 1
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))


def test_q234_theil_sen_between_extreme_slopes(spark):
    """The Theil-Sen slope is a median of pairwise slopes — it must lie
    within [min, max] pairwise slope per group (sanity against the
    pandas kernel mangling group boundaries)."""
    from hive_feature_demo_spark.plans.pipeline_ops import (
        _daily,
        q234_theil_sen_trend,
    )

    e = table(spark, SF_DIR, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("rev"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day.toordinal(), r.rev))
    got = {r.event_type: r for r in q234_theil_sen_trend(spark, SF_DIR).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        pts.sort()
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        ]
        assert min(slopes) - 1e-6 <= got[et].theil_sen_slope <= max(slopes) + 1e-6
        assert got[et].n_days == len(pts)


def test_q229_acf_matches_numpy_reference(spark):
    """ACF values must agree with an independent numpy computation over
    the same daily series (catches sign/lag-direction mistakes the
    oracle, which shares the formulation, cannot)."""
    import numpy as np

    from hive_feature_demo_spark.plans.pipeline_ops import (
        _daily,
        q229_daily_autocorrelation,
    )

    daily = sorted(_daily(spark, SF_DIR).collect(), key=lambda r: r.day)
    days = [r.day.toordinal() for r in daily]
    x = np.array([r.rev for r in daily])
    m = x.mean()
    den = ((x - m) ** 2).sum()
    got = {r.lag: r.acf for r in q229_daily_autocorrelation(spark, SF_DIR).collect()}
    for lag in range(1, 8):
        # pairs matched on CALENDAR offset, like the query
        idx = {d: i for i, d in enumerate(days)}
        num = sum(
            (x[idx[d]] - m) * (x[idx[d - lag]] - m) for d in days if d - lag in idx
        )
        assert got[lag] == pytest.approx(num / den, abs=1e-4)


def test_q231_zipf_slope_matches_polyfit(spark):
    """The moment-sum OLS must agree with numpy.polyfit on the same
    (ln rank, ln freq) points."""
    import numpy as np

    from hive_feature_demo_spark.plans.pipeline_ops import q231_zipf_slope

    row = q231_zipf_slope(spark, SF_DIR).first()
    docs = table(spark, SF_DIR, "documents").select("text").collect()
    import collections
    import re

    tf = collections.Counter(
        t for r in docs for t in re.findall(r"[a-z0-9]+", r.text.lower())
    )
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    xs = np.log(np.arange(1, len(top) + 1, dtype=float))
    ys = np.log(np.array([c for _, c in top], dtype=float))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row.n_terms == len(top)
    assert row.slope == pytest.approx(slope, abs=1e-4)
    assert row.intercept == pytest.approx(intercept, abs=1e-4)
    assert row.slope < 0  # Zipf: frequency decays with rank


def test_q244_dynamic_gap_bridges_what_fixed_gap_breaks(spark):
    """A purchase's 60-minute window must bridge a 45-minute pause that
    the fixed 30-minute session (q43) breaks — the defining behavior of
    the dynamic gap."""
    from hive_feature_demo_spark.plans.streaming_batch import (
        q43_session_window_native,
        q244_dynamic_gap_sessions,
    )

    fixed = q43_session_window_native(spark, SF_DIR).groupBy("user_id").count()
    dyn = q244_dynamic_gap_sessions(spark, SF_DIR).groupBy("user_id").count()
    f = {r.user_id: r["count"] for r in fixed.collect()}
    d = {r.user_id: r["count"] for r in dyn.collect()}
    # longer gaps can only merge sessions, never split them
    assert all(d[u] <= f[u] for u in f)
    # and at least one user actually bridged a pause (non-degenerate data)
    assert any(d[u] < f[u] for u in f)


def test_q253_pruning_is_lossless_and_effective(spark):
    """The q-gram count bound must (a) keep every true edit<=2 pair —
    the oracle parity test proves equality with brute force — and (b)
    actually prune: candidates reaching the levenshtein verify must be
    far fewer than the per-nation all-pairs count."""
    from pyspark.sql import Window as W

    s = table(spark, SF_DIR, "supplier")
    rows = s.select("s_suppkey", "s_nationkey", "s_name").collect()
    import itertools

    by_nation: dict[int, list] = {}
    for r in rows:
        by_nation.setdefault(r.s_nationkey, []).append(r)

    def edit(a, b):
        # plain DP levenshtein
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    brute = {
        (a.s_suppkey, b.s_suppkey)
        for grp in by_nation.values()
        for a, b in itertools.combinations(
            sorted(grp, key=lambda r: r.s_suppkey), 2
        )
        if edit(a.s_name, b.s_name) <= 2
    }
    from hive_feature_demo_spark.plans.pipeline_ops import q253_qgram_fuzzy_join

    got = {
        (r.key_a, r.key_b) for r in q253_qgram_fuzzy_join(spark, SF_DIR).collect()
    }
    assert got == brute
    # the shipped generator keeps every same-nation pair within edit 2
    # (so output == all-pairs there); prove the count bound PRUNES on
    # names that differ widely, using a synthetic frame through the same
    # operator: 'Supplier#AAAAAAAAA' vs 'Supplier#BBBBBBBBB' share only
    # 8 of 17 positional bigrams (< 18 - 5 = 13) and must not surface,
    # while a 2-substitution neighbor must.
    import tempfile

    syn = spark.createDataFrame(
        [
            (1, 0, "Supplier#AAAAAAAAA"),
            (2, 0, "Supplier#BBBBBBBBB"),
            (3, 0, "Supplier#AAAAAAABB"),
        ],
        schema="s_suppkey long, s_nationkey long, s_name string",
    )
    tmp = tempfile.mkdtemp(prefix="q253_syn_")
    syn.write.mode("overwrite").parquet(f"{tmp}/supplier.parquet")
    from hive_feature_demo_spark.plans.pipeline_ops import q253_qgram_fuzzy_join

    pairs = {
        (r.key_a, r.key_b) for r in q253_qgram_fuzzy_join(spark, tmp).collect()
    }
    assert pairs == {(1, 3)}  # edit 2 kept; edit 9 pruned before verify


def test_q254_kcore_matches_python_peel(spark):
    """The 3-round distributed peel must equal a plain-Python peel of
    the same edge set, and every surviving node's degree must count
    only surviving neighbors."""
    from hive_feature_demo_spark.plans.advanced_ops import (
        _KCORE_ROUNDS,
        _overlap_edges,
        q254_kcore_decomposition,
    )

    edges = [(r.ua, r.ub) for r in _overlap_edges(spark, SF_DIR).collect()]
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    for _ in range(_KCORE_ROUNDS):
        deg = {u: sum(1 for v in adj[u] if v in alive) for u in alive}
        alive = {u for u in alive if deg[u] >= 2}
    final_deg = {u: sum(1 for v in adj[u] if v in alive) for u in alive}
    got = {
        r.user_id: (r.core_degree, r.stable)
        for r in q254_kcore_decomposition(spark, SF_DIR).collect()
    }
    assert set(got) == alive
    for u, (d, stable) in got.items():
        assert d == final_deg[u]
        assert stable == (d >= 2)


def test_hll_registers_merge_by_max(spark, sf_dir):
    """q307's scale claim is register mergeability: the sketch of a UNION
    equals the register-wise MAX of per-part sketches — verified by
    splitting events in half, sketching each, merging, and comparing to
    the whole-table registers. Also: the python-side reference estimate
    from the merged registers equals the query's output."""
    import math

    from hive_feature_demo_spark.catalog import table as _table
    from hive_feature_demo_spark.plans.sketch_ops import (
        _HLL_ALPHA,
        _HLL_M,
        q307_hyperloglog_exact_replay,
    )

    e = _table(spark, sf_dir, "events")

    def registers(df):
        h = F.md5(F.col("user_id").cast("string"))
        keyed = df.select(h.alias("h")).distinct()
        stripped = F.expr("trim(LEADING '0' FROM substr(h, 3, 15))")
        first_nz = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
        nlz = (
            F.when(first_nz >= 8, 0)
            .when(first_nz >= 4, 1)
            .when(first_nz >= 2, 2)
            .otherwise(3)
        )
        ranked = keyed.select(
            (F.conv(F.substring("h", 1, 2), 16, 10).cast("long") % _HLL_M).alias(
                "reg"
            ),
            F.when(stripped == "", F.lit(61))
            .otherwise((F.lit(15) - F.length(stripped)) * 4 + nlz + 1)
            .alias("rank"),
        )
        return dict(
            ranked.groupBy("reg").agg(F.max("rank").alias("m")).collect()
        )

    whole = registers(e)
    lo = registers(e.filter(F.col("event_id") % 2 == 0))
    hi = registers(e.filter(F.col("event_id") % 2 == 1))
    merged = {}
    for d in (lo, hi):
        for r, m in d.items():
            merged[r] = max(merged.get(r, 0), m)
    assert merged == whole  # sketch(A ∪ B) == max-merge(sketch A, sketch B)

    # reference estimate from the merged registers == the query's output
    v_empty = _HLL_M - len(whole)
    denom = sum(2.0 ** -m for m in whole.values()) + v_empty
    raw = _HLL_ALPHA * _HLL_M * _HLL_M / denom
    est = (
        _HLL_M * math.log(_HLL_M / v_empty)
        if raw <= 2.5 * _HLL_M and v_empty > 0
        else raw
    )
    row = q307_hyperloglog_exact_replay(spark, sf_dir).first()
    assert abs(row["hll_estimate"] - est) < 1e-3
    assert row["registers_used"] == len(whole)


def test_theil_sen_robust_to_outlier_month(spark, sf_dir):
    """q308's point: a least-squares slope moves when one month is
    corrupted by a huge outlier; the Theil-Sen median-of-slopes must not
    (median of pairwise slopes has a 29% breakdown point)."""
    from hive_feature_demo_spark.plans.audit_ops import q308_theil_sen_trend

    base = q308_theil_sen_trend(spark, sf_dir).first()
    assert base["n_pairs"] == base["n_months"] * (base["n_months"] - 1) // 2

    # corrupt ONE month by 1000x via a doctored orders table on disk
    import os
    import tempfile

    from hive_feature_demo_spark.catalog import table as _table

    o = _table(spark, sf_dir, "orders")
    first_month = (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
    target = o.select(F.min(first_month)).first()[0]
    doctored = o.withColumn(
        "o_totalprice",
        F.when(first_month == target, F.col("o_totalprice") * 1000).otherwise(
            F.col("o_totalprice")
        ),
    )
    tmp = tempfile.mkdtemp(prefix="q308_doctored_")
    doctored.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    try:
        spiked = q308_theil_sen_trend(spark, tmp).first()
        # slope shift stays small relative to the injected distortion:
        # the outlier month participates in (n-1) of n(n-1)/2 pairs, and
        # the MEDIAN ignores those tails entirely unless they flood half
        # the pairs (they cannot: (n-1) << n(n-1)/4 for n >= 6)
        assert spiked["n_months"] == base["n_months"]
        shift = abs(spiked["slope_per_month"] - base["slope_per_month"])
        spread = abs(base["slope_per_month"]) + 1.0
        assert shift <= 2.0 * spread, f"median slope moved too much: {shift}"
    finally:
        import shutil

        shutil.rmtree(tmp)


def test_aes_sample_inclusion_tracks_weight(spark, sf_dir):
    """q309: the A-ES key ordering must favor heavier docs — the mean
    weight of the k sampled docs exceeds the corpus mean weight (PPS
    behavior), and keys are deterministic across invocations."""
    from hive_feature_demo_spark.catalog import table as _table
    from hive_feature_demo_spark.operators.textops import word_tokens_regex
    from hive_feature_demo_spark.plans.curation import q309_weighted_sample_aes

    s1 = q309_weighted_sample_aes(spark, sf_dir).collect()
    s2 = q309_weighted_sample_aes(spark, sf_dir).collect()
    assert s1 == s2
    sample_mean_w = sum(r["weight"] for r in s1) / len(s1)
    corpus = (
        _table(spark, sf_dir, "documents")
        .select(F.size(word_tokens_regex("text")).alias("w"))
        .agg(F.avg("w"))
        .first()[0]
    )
    assert sample_mean_w > corpus
