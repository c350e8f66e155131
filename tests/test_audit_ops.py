"""Invariant and plan-shape tests for the data-audit family (q260-q271).

Oracle parity is covered by tests/test_oracle_parity.py (registry-wide);
these pin the semantic invariants the hash comparison can't see — cursor
predicate pushdown, classification totals, streak maximality, prefix-sum
equivalence — following the house style of tests/test_scale_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.plans.audit_ops import (
    q260_benford_audit,
    q261_keyset_pagination,
    q262_reconciliation_diff,
    q263_event_streaks,
    q265_vocab_richness,
    q266_sla_ship_latency,
    q267_text_chunking,
    q268_label_separability,
    q269_session_bounce_rate,
    q270_supplier_hhi,
    q271_abc_classification,
)
from tests.conftest import SF_DIR


def test_benford_frequencies_sum_to_one(spark):
    rows = q260_benford_audit(spark, SF_DIR).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    # observed shares were floor-rounded at 6dp: sum within 9 ulps of 1
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 9e-6
    assert abs(sum(r["expected"] for r in rows) - 1.0) < 9e-6
    total_n = sum(r["n"] for r in rows)
    assert total_n == table(spark, SF_DIR, "orders").count()


def test_keyset_page_equals_offset_page(spark):
    """The cursor-predicate page must equal rows 101-150 of the full sort."""
    got = [
        r["o_orderkey"]
        for r in q261_keyset_pagination(spark, SF_DIR).collect()
    ]
    full = (
        table(spark, SF_DIR, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .select("o_orderkey")
        .limit(150)
        .collect()
    )
    assert got == [r["o_orderkey"] for r in full[100:150]]


def test_keyset_cursor_predicate_reaches_scan(spark):
    """The tuple-cursor filter must appear as a data filter (pushable),
    not require a global sort before filtering."""
    df = q261_keyset_pagination(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in df._jdf.queryExecution().toString() or "Filter" in plan


def test_reconciliation_classes_cover_all_keys(spark):
    rows = {r["status"]: r for r in q262_reconciliation_diff(spark, SF_DIR).collect()}
    n_orders = table(spark, SF_DIR, "orders").count()
    n_li_keys = (
        table(spark, SF_DIR, "lineitem").select("l_orderkey").distinct().count()
    )
    covered = sum(r["n"] for r in rows.values())
    # full outer: every order key + every lineitem-only key exactly once
    n_union = (
        table(spark, SF_DIR, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .union(table(spark, SF_DIR, "lineitem").select(F.col("l_orderkey").alias("k")))
        .distinct()
        .count()
    )
    assert covered == n_union
    assert rows.get("match") is None or rows["match"]["total_abs_delta"] == 0.0
    assert n_orders <= covered and n_li_keys <= covered


def test_streaks_are_maximal_and_bounded(spark):
    e = table(spark, SF_DIR, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n"))
    bounds = {r["user_id"]: r["n"] for r in per_user.collect()}
    rows = q263_event_streaks(spark, SF_DIR).collect()
    assert len(rows) == len(bounds)
    for r in rows:
        assert 1 <= r["streak_len"] <= bounds[r["user_id"]]


def test_vocab_richness_invariants(spark):
    for r in q265_vocab_richness(spark, SF_DIR).collect():
        assert r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0 <= r["ttr_bps"] <= 10000
        assert 0 <= r["hapax_bps"] <= 10000


def test_sla_shares_monotone(spark):
    for r in q266_sla_ship_latency(spark, SF_DIR).collect():
        assert 0 <= r["within_7d_bps"] <= r["within_30d_bps"] <= 10000


def test_chunking_covers_text_exactly(spark):
    """Chunk offsets tile each document: stride 150, first chunk at 1,
    last chunk reaches the end of the text, overlap = 50 where a next
    chunk exists."""
    d = table(spark, SF_DIR, "documents").select("doc_id", F.length("text").alias("n"))
    lens = {r["doc_id"]: r["n"] for r in d.collect()}
    chunks = q267_text_chunking(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    assert set(by_doc) == set(lens)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c["chunk_idx"])
        assert [c["start_pos"] for c in cs] == [1 + 150 * i for i in range(len(cs))]
        last = cs[-1]
        assert last["start_pos"] + last["chunk_len"] - 1 == max(lens[doc_id], 0) or (
            lens[doc_id] == 0 and last["chunk_len"] == 0
        )


def test_separability_matrix_shape_and_symmetric_domain(spark):
    rows = q268_label_separability(spark, SF_DIR).collect()
    labels = [
        r["label"]
        for r in table(spark, SF_DIR, "embeddings").select("label").distinct().collect()
    ]
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert -1.0 - 1e-9 <= r["cos_ab"] <= 1.0 + 1e-9


def test_bounce_sessions_match_sessionization(spark):
    from hive_feature_demo_spark.plans.streaming_batch import q42_sessionization

    n_sessions_q42 = q42_sessionization(spark, SF_DIR).count()
    rows = q269_session_bounce_rate(spark, SF_DIR).collect()
    assert sum(r["n_sessions"] for r in rows) == n_sessions_q42
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]


def test_hhi_bounds(spark):
    for r in q270_supplier_hhi(spark, SF_DIR).collect():
        # HHI in (1/n, 1]; top share >= 1/n
        assert 0.0 < r["hhi"] <= 1.0 + 1e-9
        assert r["top_share_bps"] >= 10000 // r["n_suppliers"] - 1
        assert r["hhi"] * r["n_suppliers"] >= 1.0 - 1e-6


def test_abc_matches_single_partition_window_reference(spark):
    """global_cumsum-based classification == plain window classification."""
    o = table(spark, SF_DIR, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = (
        cust.withColumn("cum_incl", F.sum("cents").over(w))
        .crossJoin(F.broadcast(cust.agg(F.sum("cents").alias("total"))))
        .withColumn(
            "bps",
            F.floor(10000.0 * (F.col("cum_incl").cast("double") / F.col("total").cast("double"))),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("bps") <= 8000, "A")
            .when(F.col("bps") <= 9500, "B")
            .otherwise("C"),
        )
        .groupBy("abc_class")
        .agg(F.count("*").alias("n_customers"))
    )
    expect = {r["abc_class"]: r["n_customers"] for r in ref.collect()}
    got = {
        r["abc_class"]: r["n_customers"]
        for r in q271_abc_classification(spark, SF_DIR).collect()
    }
    assert got == expect
    assert sum(got.values()) == cust.count()


def test_perplexity_profile_invariants(spark):
    from hive_feature_demo_spark.plans.audit_ops import q272_unigram_perplexity

    rows = q272_unigram_perplexity(spark, SF_DIR).collect()
    assert rows, "at least one source"
    for r in rows:
        assert r["mean_ce"] > 0.0  # cross-entropy of a non-degenerate LM
        assert 0 <= r["above_corpus_mean_bps"] <= 10000


def test_mahalanobis_topk_sorted_and_nonnegative(spark):
    from hive_feature_demo_spark.plans.audit_ops import q273_mahalanobis_outliers

    rows = q273_mahalanobis_outliers(spark, SF_DIR).collect()
    assert len(rows) == 20
    dists = [r["m_dist2"] for r in rows]
    assert all(d >= 0.0 for d in dists)
    assert dists == sorted(dists, reverse=True)


def test_bfs_hops_equal_plain_python_bfs(spark):
    from collections import deque

    from hive_feature_demo_spark.plans.advanced_ops import _overlap_edges
    from hive_feature_demo_spark.plans.audit_ops import q274_bfs_hops

    edges = [(r["ua"], r["ub"]) for r in _overlap_edges(spark, SF_DIR).collect()]
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = min(a for a, _ in edges)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {r["user_id"]: r["hops"] for r in q274_bfs_hops(spark, SF_DIR).collect()}
    assert got == dist


def test_tfidf_similarity_topk_valid(spark):
    from hive_feature_demo_spark.plans.audit_ops import q278_tfidf_doc_similarity

    rows = q278_tfidf_doc_similarity(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9


def test_chisq_independence_shape(spark):
    from hive_feature_demo_spark.plans.audit_ops import q279_chisq_independence

    d = table(spark, SF_DIR, "documents")
    n_lang = d.select("lang").distinct().count()
    n_src = d.select("source").distinct().count()
    r = q279_chisq_independence(spark, SF_DIR).collect()[0]
    assert r["chi2"] >= 0.0
    assert r["dof"] == (n_lang - 1) * (n_src - 1)
    assert r["n_cells"] <= n_lang * n_src


def test_silhouette_covers_all_vectors(spark):
    from hive_feature_demo_spark.plans.audit_ops import q280_centroid_silhouette

    rows = q280_centroid_silhouette(spark, SF_DIR).collect()
    total = table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == total
    for r in rows:
        assert 0 <= r["misassigned_bps"] <= 10000
        assert -2.0 <= r["mean_margin"] <= 2.0  # cosine margins bounded


def test_pca_loading_matches_numpy_eig(spark):
    """Independent reference: the power-iteration loading must align with
    numpy's dominant eigenvector of the same covariance matrix
    (_PCA_ROUNDS=60 rounds converge well past 0.98 cosine on a spectrum
    with a clear gap)."""
    import numpy as np

    from hive_feature_demo_spark.plans.audit_ops import q281_pca_power_iteration

    rows = q281_pca_power_iteration(spark, SF_DIR).collect()
    assert len(rows) == 64
    loading = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    assert abs(float(np.linalg.norm(loading)) - 1.0) < 1e-4  # unit vector
    emb = table(spark, SF_DIR, "embeddings").select("embedding").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(C)
    top = vecs[:, -1]
    cos = abs(float(np.dot(loading, top)))
    assert cos > 0.98, f"cosine to numpy eigvec only {cos}"
    lam = rows[0]["lambda1"]
    assert abs(lam - float(vals[-1])) / float(vals[-1]) < 0.05
    assert 0 < rows[0]["explained_bps"] <= 10000


def test_seasonal_backtest_invariants(spark):
    from hive_feature_demo_spark.plans.audit_ops import q282_seasonal_backtest

    rows = q282_seasonal_backtest(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 1
        assert r["mape"] >= 0.0
        assert abs(r["mean_bias"]) <= r["mape"] + 1e-9


def test_snapshot_diff_complements_v1(spark):
    from hive_feature_demo_spark.plans.audit_ops import q283_snapshot_diff

    rows = q283_snapshot_diff(spark, SF_DIR).collect()
    added = sum(r["rows_added"] for r in rows)
    o = table(spark, SF_DIR, "orders")
    n_after = o.filter(F.col("o_orderdate") >= "1998-01-01").count()
    assert added == n_after


def test_incremental_gram_matches_numpy(spark):
    """Merged streaming partials must equal the direct covariance (numpy
    as the independent reference, at float tolerance)."""
    import numpy as np

    from hive_feature_demo_spark.plans.audit_ops import q284_incremental_gram

    rows = q284_incremental_gram(spark, SF_DIR).collect()
    assert len(rows) == 64
    assert all(r["n_batches"] == 4 for r in rows)
    emb = table(spark, SF_DIR, "embeddings").select("embedding").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    mean_np = X.mean(axis=0)
    var_np = X.var(axis=0)
    for r in sorted(rows, key=lambda r: r["dim"]):
        d = r["dim"] - 1
        assert abs(r["mean"] - mean_np[d]) < 1e-5
        assert abs(r["variance"] - var_np[d]) < 1e-5
        assert r["n_vecs"] == X.shape[0]
        assert r["offdiag_norm"] >= 0.0


def test_text_normalization_audit_bounds(spark):
    from hive_feature_demo_spark.plans.audit_ops import q285_text_normalization

    for r in q285_text_normalization(spark, SF_DIR).collect():
        assert r["chars_after"] <= r["chars_before"]
        assert 0 <= r["savings_bps"] <= 10000
        assert 0 <= r["docs_changed"] <= r["n_docs"]


def test_clr_zero_mean_per_day(spark):
    """CLR property: the transformed coordinates sum to ~0 within each
    composition (here: each day), up to the 1e-6 output rounding."""
    from collections import defaultdict

    from hive_feature_demo_spark.plans.audit_ops import q286_clr_composition

    by_day = defaultdict(list)
    for r in q286_clr_composition(spark, SF_DIR).collect():
        by_day[r["day"]].append(r)
    for day, rows in by_day.items():
        assert abs(sum(r["clr"] for r in rows)) < 1e-5 * len(rows)
        total_bps = sum(r["share_bps"] for r in rows)
        assert 10000 - len(rows) <= total_bps <= 10000


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_audit_family_plan_shapes(spark):
    """Scale guards: no cartesian/nested-loop joins anywhere in the
    family's heavy queries, and no unpartitioned window over unbounded
    rows (q271 classifies via global_cumsum, never a global sort)."""
    import re

    from hive_feature_demo_spark.plans.audit_ops import (
        q264_boilerplate_ngrams,
        q271_abc_classification,
        q276_rolling_active_users,
        q278_tfidf_doc_similarity,
        q280_centroid_silhouette,
    )

    for fn in (
        q264_boilerplate_ngrams,
        q276_rolling_active_users,
        q278_tfidf_doc_similarity,
        q280_centroid_silhouette,
    ):
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__

    plan = _plan(q271_abc_classification(spark, SF_DIR)).lower()
    for m in re.finditer(r"windowspecdefinition\(([^,]*),", plan):
        first = m.group(1)
        assert " asc" not in first and " desc" not in first, (
            f"q271: unpartitioned window in plan: {m.group(0)}"
        )


def test_migration_matrix_partitions_customers(spark):
    from hive_feature_demo_spark.plans.audit_ops import (
        q287_customer_migration_matrix,
    )

    rows = q287_customer_migration_matrix(spark, SF_DIR).collect()
    total_cust = (
        table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == total_cust
    for r in rows:
        assert 0 <= r["h1_band"] <= 3 and 0 <= r["h2_band"] <= 3
        assert not (r["h1_band"] == 0 and r["h2_band"] == 0)  # active somewhere


def test_point_in_time_features_leakage_free(spark):
    """Brute-force reference on a sample of orders: events strictly
    before the order timestamp, same user."""
    from hive_feature_demo_spark.plans.audit_ops import (
        q288_point_in_time_features,
    )

    got = {
        r["o_orderkey"]: r
        for r in q288_point_in_time_features(spark, SF_DIR).collect()
    }
    orders = table(spark, SF_DIR, "orders").limit(50).collect()
    events = table(spark, SF_DIR, "events").collect()
    from decimal import Decimal

    for o in orders:
        mine = [
            e
            for e in events
            if e["user_id"] == o["o_custkey"] and e["ts"] < o["o_orderdate"]
        ]
        r = got[o["o_orderkey"]]
        assert r["events_before"] == len(mine)
        expect = float(
            sum(
                (Decimal(e["value"]).quantize(Decimal("1e-10")) for e in mine),
                Decimal(0),
            )
        )
        assert abs(r["value_before"] - expect) < 1e-5


def test_part_affinity_symmetric_and_supported(spark):
    from hive_feature_demo_spark.plans.audit_ops import q289_part_affinity

    rows = q289_part_affinity(spark, SF_DIR).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_both"] >= 5
        assert r["lift"] > 0.0


def test_dispersion_index_positive_and_complete(spark):
    from hive_feature_demo_spark.plans.audit_ops import q290_dispersion_index

    rows = q290_dispersion_index(spark, SF_DIR).collect()
    total = sum(r["n_customers"] for r in rows)
    assert total == table(spark, SF_DIR, "customer").count()
    for r in rows:
        assert r["mean_orders"] >= 0.0
        assert r["var_orders"] >= -1e-9


def test_ks_drift_bounds(spark):
    from hive_feature_demo_spark.plans.audit_ops import q291_ks_length_drift

    rows = q291_ks_length_drift(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == table(spark, SF_DIR, "documents").count()
    for r in rows:
        assert 0 <= r["ks_bps"] <= 10000


def test_anova_eta2_in_unit_interval(spark):
    from hive_feature_demo_spark.plans.audit_ops import q292_anova_eta2

    for r in q292_anova_eta2(spark, SF_DIR).collect():
        assert -1e-9 <= r["eta2"] <= 1.0 + 1e-9
        assert 1 <= r["n_groups"] <= 7


def test_embedding_coverage_complete_here(spark):
    from hive_feature_demo_spark.plans.audit_ops import q293_embedding_coverage

    for r in q293_embedding_coverage(spark, SF_DIR).collect():
        assert r["n_with_embedding"] <= r["n_docs"]
        assert 0 <= r["coverage_bps"] <= 10000
        if r["n_with_embedding"]:
            assert r["mean_norm"] > 0.0


def test_trending_terms_sorted_by_abs_delta(spark):
    from hive_feature_demo_spark.plans.audit_ops import q294_trending_terms

    rows = q294_trending_terms(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    deltas = [abs(r["delta_bps"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    for r in rows:
        assert r["delta_bps"] == r["bps2"] - r["bps1"]
        assert r["n1"] + r["n2"] >= 20


def test_chisq_residuals_reconstruct_chi2(spark):
    """Sum of squared UNROUNDED residuals ~ q279's chi2 (rounding makes
    it approximate; tolerance scales with cell count)."""
    from hive_feature_demo_spark.plans.audit_ops import (
        q279_chisq_independence,
        q295_chisq_residuals,
    )

    chi2 = q279_chisq_independence(spark, SF_DIR).collect()[0]["chi2"]
    rows = q295_chisq_residuals(spark, SF_DIR).collect()
    approx = sum(r["std_residual"] ** 2 for r in rows)
    assert abs(approx - chi2) < 0.01 * len(rows) + 0.1


def test_dedup_roi_monotone(spark):
    """Higher threshold -> fewer removals -> more kept."""
    from hive_feature_demo_spark.plans.audit_ops import q296_dedup_roi_curve

    rows = sorted(
        q296_dedup_roi_curve(spark, SF_DIR).collect(), key=lambda r: r["threshold"]
    )
    assert [r["threshold"] for r in rows] == [0.5, 0.7, 0.9]
    kept = [r["n_kept"] for r in rows]
    assert kept == sorted(kept)
    n_docs = table(spark, SF_DIR, "documents").count()
    for r in rows:
        assert r["n_kept"] <= n_docs
        assert 0 <= r["savings_bps"] <= 10000


def test_mixture_plan_equalizes_to_min(spark):
    from hive_feature_demo_spark.plans.audit_ops import q297_mixture_rebalance_plan

    rows = q297_mixture_rebalance_plan(spark, SF_DIR).collect()
    target = min(r["chars"] for r in rows)
    for r in rows:
        assert 0 < r["keep_rate_bps"] <= 10000
        assert r["expected_chars"] <= target  # floor never overshoots
        assert r["expected_chars"] >= target - (r["chars"] // 10000) - 1


def test_binned_ks_bounds(spark):
    from hive_feature_demo_spark.plans.audit_ops import q298_binned_ks_price_drift

    r = q298_binned_ks_price_drift(spark, SF_DIR).collect()[0]
    assert r["n_first_half"] + r["n_second_half"] == table(
        spark, SF_DIR, "orders"
    ).count()
    assert 0 <= r["ks_bps"] <= 10000
    assert r["n_cells"] == 1024


def test_markov_stationary_is_fixed_point(spark):
    """pi must sum to 1 and satisfy pi ~ pi P (power iteration converged)."""
    from hive_feature_demo_spark.plans.audit_ops import q299_markov_stationary
    from hive_feature_demo_spark.plans.advanced_ops import q205_markov_transitions

    pi = {
        r["event_type"]: r["stationary"]
        for r in q299_markov_stationary(spark, SF_DIR).collect()
    }
    assert abs(sum(pi.values()) - 1.0) < 1e-4
    tm = q205_markov_transitions(spark, SF_DIR).collect()
    # rebuild exact transition probabilities from counts
    from collections import defaultdict

    row_tot = defaultdict(int)
    for r in tm:
        row_tot[r["from_type"]] += r["n"]
    nxt = defaultdict(float)
    for r in tm:
        nxt[r["to_type"]] += pi[r["from_type"]] * (r["n"] / row_tot[r["from_type"]])
    for t, v in nxt.items():
        assert abs(v - pi[t]) < 1e-3, (t, v, pi[t])


def test_curation_waterfall_monotone(spark):
    from hive_feature_demo_spark.plans.audit_ops import q300_curation_waterfall

    rows = sorted(
        q300_curation_waterfall(spark, SF_DIR).collect(), key=lambda r: r["stage_id"]
    )
    assert [r["stage"] for r in rows] == [
        "raw",
        "exact_dedup",
        "near_dedup",
        "quality",
        "rebalanced",
    ]
    docs = [r["n_docs"] for r in rows]
    chars = [r["chars"] for r in rows]
    assert docs == sorted(docs, reverse=True) or all(
        docs[i] >= docs[i + 1] for i in range(4)
    )
    assert all(chars[i] >= chars[i + 1] for i in range(4))


def test_wilson_bound_below_share(spark):
    from hive_feature_demo_spark.plans.audit_ops import q301_wilson_ranking

    rows = q301_wilson_ranking(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    lbs = [r["wilson_lb"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)
    for r in rows:
        assert 0.0 <= r["wilson_lb"] <= r["on_time_bps"] / 10000.0 + 1e-6
        assert r["k"] <= r["n"]


def test_kappa_consistent_with_accuracy(spark):
    from hive_feature_demo_spark.plans.audit_ops import q302_cohens_kappa

    r = q302_cohens_kappa(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0
    assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9
    # kappa sign agrees with (po - pe)
    assert (r["kappa"] >= 0) == (r["po"] >= r["pe"])


def test_shapley_efficiency_property(spark, sf_dir):
    """q315: Shapley credits must satisfy efficiency — the credits sum
    exactly to v(all channels) - v(empty): total conversions attributable
    to any channel exposure. Integer space (x24), so equality is exact."""
    from pyspark.sql import functions as F

    from hive_feature_demo_spark.catalog import table
    from hive_feature_demo_spark.plans.audit_ops import q315_shapley_attribution

    rows = q315_shapley_attribution(spark, sf_dir).collect()
    assert sorted(r["channel"] for r in rows) == ["click", "error", "signup", "view"]
    total_credit_x24 = sum(r["credit_x24"] for r in rows)

    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
        F.max(F.when(F.col("event_type") != "purchase", 1).otherwise(0)).alias("touched"),
    )
    v_full = per_user.filter("conv = 1").count()  # every touched-set fits in N
    v_empty = per_user.filter("conv = 1 AND touched = 0").count()
    assert total_credit_x24 == 24 * (v_full - v_empty)


def test_conformal_coverage_near_target(spark, sf_dir):
    """q316: split-conformal guarantees coverage >= 90% in expectation;
    on a finite eval window it should land within sampling noise, and
    q_hat must be a real calibration residual (positive, finite)."""
    from hive_feature_demo_spark.plans.audit_ops import q316_conformal_backtest

    rows = q316_conformal_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["q_hat"] > 0
        assert 0 <= r["coverage_bp"] <= 10000
    # average across types near the 90% target (finite-sample slack)
    mean_cov = sum(r["coverage_bp"] for r in rows) / len(rows)
    assert mean_cov >= 7000, f"coverage collapsed: {mean_cov}"


def test_psi_contributions_nonnegative_and_total(spark, sf_dir):
    """q317: every PSI contribution (p1-p2)*ln(p1/p2) is >= 0 by
    construction (same sign factors), and all bins are present."""
    from hive_feature_demo_spark.plans.audit_ops import q317_psi_value_drift

    rows = q317_psi_value_drift(spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(10))
    for r in rows:
        assert r["psi_contrib"] >= -1e-9
    total = sum(r["psi_contrib"] for r in rows)
    assert 0 <= total < 25.0  # PSI of a sane split is finite and small


def test_poisson_bootstrap_ci_brackets_point(spark, sf_dir):
    """q318: the percentile CI must bracket the point estimate, use all
    40 replicates, and have positive finite width."""
    from hive_feature_demo_spark.plans.audit_ops import q318_poisson_bootstrap_ci

    r = q318_poisson_bootstrap_ci(spark, sf_dir).first()
    assert r["n_replicates"] == 40
    assert r["boot_lo"] <= r["mean_value"] <= r["boot_hi"]
    assert 0 < r["boot_hi"] - r["boot_lo"] < r["mean_value"]  # sane width
