"""Property tests for the round-4 operator family: graph rounds, skyline,
salted aggregation — each cross-checked against a brute-force Python
reimplementation on small random inputs (seeded, deterministic).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from hive_feature_demo_spark.operators.graph_ops import (
    min_label_rounds,
    skyline_2d,
    triangle_participation,
)


def _random_graph(seed: int, n: int, p: float):
    rng = random.Random(seed)
    edges = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]
    return list(range(n)), edges


def test_min_label_rounds_matches_bfs(spark):
    for seed in (1, 2, 3):
        nodes, edges = _random_graph(seed, n=30, p=0.08)
        adj = {v: set() for v in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        k = 3
        # brute force: min vertex id within k hops (BFS per node)
        expected = {}
        for v in nodes:
            frontier, seen = {v}, {v}
            for _ in range(k):
                frontier = {
                    w for u in frontier for w in adj[u] if w not in seen
                }
                seen |= frontier
            expected[v] = min(seen)
        nodes_df = spark.createDataFrame([(v,) for v in nodes], "v long")
        pairs_df = spark.createDataFrame(
            edges or [(0, 1)], "ua long, ub long"
        )
        if not edges:
            pairs_df = pairs_df.limit(0)
        got = {
            r["v"]: r["lbl"]
            for r in min_label_rounds(nodes_df, pairs_df, k).collect()
        }
        assert got == expected, f"seed {seed}"


def test_triangle_participation_matches_brute_force(spark):
    for seed in (4, 5):
        nodes, edges = _random_graph(seed, n=25, p=0.2)
        eset = set(edges)
        expected: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in eset and (b, c) in eset and (a, c) in eset:
                for v in (a, b, c):
                    expected[v] = expected.get(v, 0) + 1
        pairs_df = spark.createDataFrame(
            edges or [(0, 1)], "ua long, ub long"
        )
        if not edges:
            pairs_df = pairs_df.limit(0)
        got = {
            r["user_id"]: r["n_triangles"]
            for r in triangle_participation(pairs_df).collect()
        }
        assert got == expected, f"seed {seed}"


def test_skyline_2d_matches_brute_force(spark):
    rng = random.Random(7)
    pts = [
        ("g1", i, rng.randrange(0, 40), rng.randrange(0, 40))
        for i in range(60)
    ] + [
        ("g2", 100 + i, rng.randrange(0, 10), rng.randrange(0, 10))
        for i in range(30)
    ]
    df = spark.createDataFrame(pts, "g string, id long, x long, y long")

    def dominated(p, others):
        _, _, px, py = p
        return any(
            (ox >= px and oy >= py and (ox > px or oy > py))
            for (_, oid, ox, oy) in others
            if oid != p[1]
        )

    expected = {
        p[1]
        for p in pts
        if not dominated(p, [q for q in pts if q[0] == p[0]])
    }
    got = {r["id"] for r in skyline_2d(df, "g", "x", "y").collect()}
    assert got == expected


def test_skyline_keeps_duplicate_optimal_points(spark):
    # two identical maximal points: neither dominates the other, both stay
    df = spark.createDataFrame(
        [("g", 1, 5, 5), ("g", 2, 5, 5), ("g", 3, 4, 9), ("g", 4, 3, 3)],
        "g string, id long, x long, y long",
    )
    got = sorted(r["id"] for r in skyline_2d(df, "g", "x", "y").collect())
    assert got == [1, 2, 3]


def test_salted_aggregation_equals_direct(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.choice(["a", "b", "c"]), rng.uniform(-100, 100))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, value double")
    direct = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,10)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in df.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("k", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(25,10)")).alias("ps"),
        )
        .groupBy("k")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("ps").cast("double").alias("s"),
        )
        .collect()
    }
    assert salted == direct  # bit-identical, not just approximately equal


def test_ewma_weights_match_python(spark):
    # 0.5^k weights are exact powers of two: the Spark EWMA must agree
    # with a plain-Python recomputation to float precision
    rng = random.Random(13)
    rows = [
        (u, i, rng.uniform(-50, 50))
        for u in range(5)
        for i in range(rng.randrange(1, 25))
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("seq"))
    last10 = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .withColumn("wt", F.pow(F.lit(0.5), F.col("rn") - 1))
    )
    got = {
        r["user_id"]: r["ewma"]
        for r in last10.groupBy("user_id")
        .agg(
            (
                F.sum((F.col("value") * F.col("wt")).cast("decimal(25,10)"))
                .cast("double")
                / F.sum(F.col("wt").cast("decimal(25,10)")).cast("double")
            ).alias("ewma")
        )
        .collect()
    }
    by_user: dict[int, list[tuple[int, float]]] = {}
    for u, i, v in rows:
        by_user.setdefault(u, []).append((i, v))
    for u, seq in by_user.items():
        last = sorted(seq, key=lambda t: -t[0])[:10]
        num = sum(v * 0.5**k for k, (_, v) in enumerate(last))
        den = sum(0.5**k for k in range(len(last)))
        assert abs(got[u] - num / den) < 1e-6, f"user {u}"


def test_cms_overestimate_property(spark):
    # the count-min guarantee (estimate >= exact) must hold for EVERY key
    # on adversarially colliding data, not just the shipped table
    rng = random.Random(17)
    keys = [str(rng.randrange(0, 40)) for _ in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    h = F.md5("k")
    hashed = df.select(
        "k",
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("b0"),
        F.conv(F.substring(h, 3, 2), 16, 10).cast("long").alias("b1"),
        F.conv(F.substring(h, 5, 2), 16, 10).cast("long").alias("b2"),
    )
    cells = (
        hashed.select(
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("r"), F.col("b0").alias("b")),
                    F.struct(F.lit(1).alias("r"), F.col("b1").alias("b")),
                    F.struct(F.lit(2).alias("r"), F.col("b2").alias("b")),
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    cell_map = {(r["r"], r["b"]): r["c"] for r in cells}
    exact = (
        hashed.groupBy("k", "b0", "b1", "b2").agg(F.count("*").alias("n")).collect()
    )
    import collections

    true_counts = collections.Counter(keys)
    for row in exact:
        est = min(
            cell_map[(0, row["b0"])],
            cell_map[(1, row["b1"])],
            cell_map[(2, row["b2"])],
        )
        assert est >= row["n"] == true_counts[row["k"]], row["k"]


def test_cap_degree_properties(spark):
    """cap_degree: survivors are a subset of the input edges, every edge
    is nominated by at least one endpoint's k-smallest list (brute-force
    check), total edges <= k*N, and a huge k is the identity."""
    from hive_feature_demo_spark.operators.graph_ops import cap_degree

    nodes, edges = _random_graph(11, 24, 0.35)
    pairs_df = spark.createDataFrame(edges, "ua long, ub long")

    full = sorted(
        (r["ua"], r["ub"]) for r in cap_degree(pairs_df, k=10_000).collect()
    )
    assert full == sorted(edges)

    k = 3
    got = sorted((r["ua"], r["ub"]) for r in cap_degree(pairs_df, k=k).collect())
    assert set(got) <= set(edges)
    assert len(got) <= k * len(nodes)

    # brute-force nomination semantics
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    nominated = set()
    for u, vs in adj.items():
        for v in sorted(vs)[:k]:
            nominated.add((min(u, v), max(u, v)))
    assert set(got) == nominated


def test_cap_degree_multigraph_duplicates_do_not_burn_slots(spark):
    """Duplicate input edges must not occupy nomination slots: the
    symmetrized list is deduplicated before ranking, so a multigraph
    caps identically to its simple-graph projection (r6 ADVICE item 3)."""
    from hive_feature_demo_spark.operators.graph_ops import cap_degree

    # node 0 has neighbors 1..5; edge (0,1) repeated 4x. With k=3 and no
    # dedup, the repeats would consume 0's slots and push 2,3 out.
    simple = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]
    multi = simple + [(0, 1)] * 3
    mdf = spark.createDataFrame(multi, "ua long, ub long")
    sdf = spark.createDataFrame(simple, "ua long, ub long")
    k = 3
    got_multi = sorted((r["ua"], r["ub"]) for r in cap_degree(mdf, k=k).collect())
    got_simple = sorted((r["ua"], r["ub"]) for r in cap_degree(sdf, k=k).collect())
    assert got_multi == got_simple
    # 0 nominates 1,2,3; 4 and 5 each nominate 0 -> all five edges survive
    assert got_multi == simple
