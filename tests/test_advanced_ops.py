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
