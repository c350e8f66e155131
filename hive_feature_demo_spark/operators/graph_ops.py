"""Graph operators over an undirected edge list (src < dst convention):
bounded-round min-label propagation and triangle participation counting.

Both are deterministic compositions of joins + aggregates (no floating
point, no iteration-to-convergence), so results are engine- and
partitioning-independent — the property tests in
tests/test_advanced_ops.py cross-check them against brute force on
random graphs.

Scale notes: label propagation materializes the symmetrized edge list
once (localCheckpoint) and then costs one join + one partial-agg shuffle
per round, all keyed on vertex id. Triangle counting enumerates each
triangle exactly once via canonical a<b<c wedges: the wedge join
shuffles on the middle vertex (degree-bounded; orientation-by-degree is
the standard refinement when degree skew demands it), and the closing
join shuffles on the (a,c) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_degree(pairs: DataFrame, k: int, u_col: str = "ua", v_col: str = "ub") -> DataFrame:
    """Bound an undirected edge list to ≈k edges per node before iterating.

    The iterative graph ops (k-core, BFS, label propagation, PageRank)
    shuffle the edge set once per round, so a density explosion in the
    graph BUILDER — e.g. ×10 traffic in the same time range densifying
    the session-overlap graph ×100 (q160) — multiplies every round. This
    is the graph-construction analogue of ``lsh_candidate_pairs``'
    ``max_bucket_width``: each node nominates its ``k`` smallest-id
    neighbors (deterministic), and an edge survives if EITHER endpoint
    nominates it — union semantics keep connectivity (a hub is never
    isolated by its own cap). Nominations total ≤ kN, so the surviving
    edge set is ≤ kN and per-round shuffle is linear in N whatever the
    raw density (mean degree ≤ 2k; an individual small-id hub may still
    exceed 2k by being nominated widely, which AQE skew-join absorbs). A
    RECALL/structure knob, never applied by default: capped
    cores/communities are a subgraph's, not the full graph's.
    Nominations are over DISTINCT neighbors (the edge list is
    deduplicated after symmetrization), so multigraph input cannot burn
    slots on repeats. Oracle-replayed by q328.
    """
    sym = (
        pairs.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .unionAll(pairs.select(F.col(v_col).alias("u"), F.col(u_col).alias("v")))
        # dedup BEFORE ranking: duplicate input edges (multigraph input)
        # must not occupy nomination slots — row_number counts rows, so a
        # repeated (u, v) would silently shrink the effective k
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("v")
    nominated = (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.least("u", "v").alias(u_col), F.greatest("u", "v").alias(v_col)
        )
    )
    return nominated.dropDuplicates([u_col, v_col])


def min_label_rounds(nodes: DataFrame, pairs: DataFrame, iters: int) -> DataFrame:
    """k rounds of synchronous min-label propagation.

    ``nodes``: one column ``v``. ``pairs``: unique undirected edges as
    ``(ua, ub)``. After k rounds each vertex holds min(v) over its k-hop
    neighborhood — community seeds with a FIXED, predictable cost (unlike
    connected components' data-dependent iteration count).
    """
    edges = pairs.select(
        F.col("ua").alias("src"), F.col("ub").alias("dst")
    ).unionByName(pairs.select(F.col("ub").alias("src"), F.col("ua").alias("dst")))
    edges = edges.localCheckpoint(eager=True)  # materialize once, reuse per round
    lbl = nodes.withColumn("lbl", F.col("v"))
    for _ in range(iters):
        nb = (
            edges.join(lbl, edges.src == lbl.v)
            .groupBy(F.col("dst").alias("nv"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        lbl = lbl.join(nb, lbl.v == nb.nv, "left").select(
            "v",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
    return lbl


def triangle_participation(pairs: DataFrame) -> DataFrame:
    """Per-vertex triangle membership counts.

    ``pairs``: unique undirected edges ``(ua, ub)`` with ua < ub. Output:
    ``(user_id, n_triangles)`` for every vertex in at least one triangle.
    """
    e = pairs.localCheckpoint(eager=True)
    e1 = e.select(F.col("ua").alias("a"), F.col("ub").alias("b"))
    e2 = e.select(F.col("ua").alias("b2"), F.col("ub").alias("c"))
    e3 = e.select(F.col("ua").alias("a3"), F.col("ub").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("user_id"))
        .unionAll(tri.select(F.col("b").alias("user_id")))
        .unionAll(tri.select(F.col("c").alias("user_id")))
    )
    return corners.groupBy("user_id").agg(F.count("*").alias("n_triangles"))


def skyline_2d(df: DataFrame, part_col: str, x_col: str, y_col: str) -> DataFrame:
    """Pareto skyline per partition: rows not dominated on (x, y).

    Dominated = another row in the same partition is >= on both axes and
    > on at least one. Computed with two windows over x (max y among
    strictly-greater x via a range frame; max y among equal x) — one
    shuffle on the partition column, single pass, no O(n^2) self-join.
    ``x_col`` must be numeric-orderable (the range frame requires it).
    """
    from pyspark.sql import Window

    w_longer = (
        Window.partitionBy(part_col)
        .orderBy(x_col)
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_equal = Window.partitionBy(part_col, x_col)
    m = df.select(
        "*",
        F.max(y_col).over(w_longer).alias("_max_y_gt_x"),
        F.max(y_col).over(w_equal).alias("_max_y_eq_x"),
    )
    return m.filter(
        (F.col("_max_y_gt_x").isNull() | (F.col(y_col) > F.col("_max_y_gt_x")))
        & (F.col(y_col) == F.col("_max_y_eq_x"))
    ).drop("_max_y_gt_x", "_max_y_eq_x")


def k_core_rounds(pairs: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly drop nodes with degree
    < ``k`` in the surviving subgraph, a FIXED number of rounds (engine-
    reproducible — the full fixpoint is data-dependent; callers pin
    ``rounds`` and surface a convergence flag instead). Returns
    ``(user_id, core_degree, stable)``: the survivors after the last
    peel, their degree within the surviving set, and whether they still
    meet the bar (all-true == converged). Each round is one degree
    aggregation over the (checkpointed) edge list — O(E) per round,
    shuffling only integer ids.
    """
    e = (
        pairs.select(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .unionAll(pairs.select(F.col("ub").alias("u"), F.col("ua").alias("v")))
        .localCheckpoint(eager=True)
    )
    alive = e.select("u").distinct()
    for _ in range(rounds):
        deg = (
            e.join(alive.withColumnRenamed("u", "au"), F.col("u") == F.col("au"))
            .drop("au")
            .join(alive.withColumnRenamed("u", "av"), F.col("v") == F.col("av"))
            .drop("av")
            .groupBy("u")
            .agg(F.count("*").alias("d"))
        )
        alive = deg.filter(F.col("d") >= k).select("u").localCheckpoint(eager=True)
    final_deg = (
        e.join(alive.withColumnRenamed("u", "au"), F.col("u") == F.col("au"))
        .drop("au")
        .join(alive.withColumnRenamed("u", "av"), F.col("v") == F.col("av"))
        .drop("av")
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    return alive.join(final_deg, "u", "left").select(
        F.col("u").alias("user_id"),
        F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("core_degree"),
        (F.coalesce(F.col("d"), F.lit(0)) >= k).alias("stable"),
    )
