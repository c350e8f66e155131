"""Relational operators Spark lacks natively: as-of join, range join.

- :func:`asof_join` — the time-series "most recent right row at or before
  the left row's time" join. Implemented as union + carry-forward window
  rather than an inequality join: one shuffle on the key, one sort, zero
  row explosion — the only formulation that survives 100 TB (an
  inequality-join plan is a BroadcastNestedLoop/cartesian per key).
- :func:`range_join` — theta join of a fact against small interval
  dimensions; broadcast so the non-equi condition never shuffles the fact.
- :func:`instant_interval_join` — the both-sides-big variant: grid-cell
  binning turns containment into an equi-join (shuffled hash join), with
  the exact predicate filtering candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    left_by: str,
    right_by: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the key group:
    ``direction="backward"`` (default) = latest right with
    ``right_time <= left_time``; ``direction="forward"`` = earliest right
    with ``right_time >= left_time``. Both bounds inclusive.

    Right rows must be unique per (key, time) — pre-aggregate otherwise, or
    the carried value is nondeterministic. All left columns are kept;
    ``value_cols`` (+ the right time as ``asof_time``) come from the right.

    Plan: tag both sides, unionByName, window per key ordered by
    (time, side) with right rows sorting first on ties (inclusive
    semantics), carry ``last(value, ignorenulls=True)``, keep left rows.
    Forward is the same plan with the time ordering reversed. Scales as one
    hash shuffle + per-partition sort.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    lt = F.col(left_time)
    # the carried payload is ONE struct per right row (never null for right
    # rows, even when individual value columns are null) so the window's
    # last(ignorenulls) always picks the latest right ROW atomically — a
    # per-column carry would skip a null value column and pair it with a
    # mismatched asof_time
    pack_type = (
        "struct<__r_time:"
        + right.schema[right_time].dataType.simpleString()
        + ","
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
        + ">"
    )
    l_tag = left.select(
        F.col(left_by).alias("__key"),
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        "*",
        F.lit(None).cast(pack_type).alias("__r_pack"),
    )
    r_tag = right.select(
        F.col(right_by).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.struct(
            F.col(right_time).alias("__r_time"),
            *[F.col(c) for c in value_cols],
        ).alias("__r_pack"),
    )
    t_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy("__key")
        .orderBy(t_order, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*", F.last("__r_pack", ignorenulls=True).over(w).alias("__asof")
    )
    return carried.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col("__asof")[c].alias(c) for c in value_cols],
        F.col("__asof")["__r_time"].alias("asof_time"),
    )


def range_join(
    fact: DataFrame, intervals: DataFrame, value: Column, lo: str = "lo", hi: str = "hi"
) -> DataFrame:
    """Join fact rows to the (broadcast) interval containing ``value``
    (half-open: lo <= value < hi)."""
    return fact.join(
        F.broadcast(intervals), (value >= F.col(lo)) & (value < F.col(hi)), "left"
    )


def instant_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    lo: str,
    hi: str,
    cell_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval CONTAINING its instant
    (``lo <= t <= hi``, inclusive) with BOTH sides arbitrarily large.

    :func:`range_join` broadcasts the interval side — correct only while
    the intervals fit in one executor's memory. This is the
    both-sides-big formulation: time is binned into fixed grid cells;
    each interval explodes into the cells it covers (rows ∝ span /
    cell_seconds), each point maps to exactly ONE cell, and the join is a
    plain equi-join on the cell id that Catalyst executes as a shuffled
    hash join — no BroadcastNestedLoop, no cartesian. The exact
    containment predicate then filters the candidates. Because a point
    lives in a single cell, each covering interval is matched exactly
    once: no post-join dedup.

    Pick ``cell_seconds`` near the median interval span: row inflation on
    the interval side is ~(span/cell + 2), while a too-fine grid multiplies
    the exploded build side. Skewed hot cells shuffle like any hot key —
    AQE skew-join splits them.
    """
    pt = F.col(point_time)
    cell = F.floor(F.unix_timestamp(pt) / cell_seconds).cast("long")
    p = points.withColumn("_cell", cell)
    span = intervals.select(
        "*",
        F.floor(F.unix_timestamp(F.col(lo)) / cell_seconds).cast("long").alias("_c0"),
        F.floor(F.unix_timestamp(F.col(hi)) / cell_seconds).cast("long").alias("_c1"),
    )
    i = span.select(
        "*", F.explode(F.sequence(F.col("_c0"), F.col("_c1"))).alias("_cell")
    ).drop("_c0", "_c1")
    return (
        p.join(i, "_cell", "inner")
        .filter((F.col(lo) <= pt) & (pt <= F.col(hi)))
        .drop("_cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    cell_seconds: int = 3600,
    max_cell_width: int | None = None,
    l_tiebreak: list[str] | None = None,
    r_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Join every left interval to every right interval it OVERLAPS
    (``l_lo <= r_hi AND r_lo <= l_hi``, inclusive) with both sides large.

    Same grid-cell strategy as :func:`instant_interval_join`, plus the
    first-common-cell trick: two overlapping intervals share every cell
    their intersection touches, which would duplicate the pair once per
    shared cell — so the join keeps a candidate only in the FIRST shared
    cell, ``max(left start-cell, right start-cell)``. Every overlapping
    pair survives exactly once (its intersection starts in that cell) and
    no distinct/dedup shuffle is needed. The pair-level filter then
    applies the exact overlap predicate.

    ``max_cell_width`` is the density escape hatch for the "×10 traffic in
    the same time range" regime, where cell populations grow linearly and
    the per-cell pair space quadratically (q160's ×100-edge phenomenon —
    the same family as ``lsh_candidate_pairs``' ``max_bucket_width``).
    When set, each (cell, side) keeps only its first ``max_cell_width``
    intervals in ``(lo, hi, *tiebreak)`` order, bounding any cell's cost
    at width² whatever the density. It is a RECALL knob, default off
    (exact semantics): a pair is lost if either member is cut from the
    pair's first common cell, even if both survive in a later shared cell
    (the first-cell rule skips later cells by design). Pass tiebreak
    columns forming a total order per side — REQUIRED when the cap is
    set: without a total order the row_number truncation keeps an
    arbitrary subset of (lo, hi)-tied intervals, so results would vary
    across runs/partitionings (raised here rather than discovered as a
    flaky diff downstream; lsh_candidate_pairs gets this for free from
    unique doc ids). Oracle-replayed by q327.

    Left/right column names must not collide (alias beforehand).
    """
    if max_cell_width is not None and (not l_tiebreak or not r_tiebreak):
        raise ValueError(
            "interval_overlap_join: max_cell_width requires l_tiebreak and "
            "r_tiebreak columns forming a total order per side — the capped "
            "truncation is otherwise nondeterministic on (lo, hi) ties"
        )
    def cells(df, lo, hi, c0):
        return df.select(
            "*",
            F.floor(F.unix_timestamp(F.col(lo)) / cell_seconds)
            .cast("long")
            .alias(c0),
        ).select(
            "*",
            F.explode(
                F.sequence(
                    F.col(c0),
                    F.floor(F.unix_timestamp(F.col(hi)) / cell_seconds).cast("long"),
                )
            ).alias("_cell"),
        )

    def cap(df, lo, hi, tiebreak):
        if max_cell_width is None:
            return df
        w = Window.partitionBy("_cell").orderBy(
            F.col(lo), F.col(hi), *[F.col(c) for c in (tiebreak or [])]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_cell_width)
            .drop("_rn")
        )

    lc = cap(cells(left, l_lo, l_hi, "_lc0"), l_lo, l_hi, l_tiebreak)
    rc = cap(cells(right, r_lo, r_hi, "_rc0"), r_lo, r_hi, r_tiebreak)
    return (
        lc.join(rc, "_cell", "inner")
        .filter(F.col("_cell") == F.greatest(F.col("_lc0"), F.col("_rc0")))
        .filter(
            (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
        )
        .drop("_cell", "_lc0", "_rc0")
    )


def _grid_cell_expr(col: str, lo, hi, cells: int):
    """Monotone value-grid bucket for ``col`` over [lo, hi] — floor of the
    linear cell index, clamped to [0, cells). (col - lo) stays in the
    column's native type; the double division is monotone, so bucket order
    is always consistent with value order."""
    if lo is None or hi == lo:
        return F.lit(0)
    step = (hi - lo) / float(cells)
    return (
        F.least(
            F.lit(cells - 1),
            F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(step))),
        )
        .cast("int")
    )


#: refinement sub-grid fan-out: 64 keeps per-level distinct-cell growth
#: <= 64 oversized x 64 sub-cells while still shrinking a hot cell 64x
#: per level (see _assign_cells driver-state bound)
_SUB_CELLS = 64


def _assign_cells(
    df: DataFrame,
    order_cols: list[str],
    cells: int,
    max_cell_rows: int | None,
) -> DataFrame:
    """Bucket rows on a deterministic value grid over ``order_cols[0]``,
    refining skewed cells one level so no cell's single-task sort exceeds
    ``max_cell_rows`` — returns ``df`` plus a long ``_cell`` column whose
    numeric order is consistent with the total ``order_cols`` order.

    Skew fallback (the global_rank docstring's former caveat, now
    handled): each refinement level re-grids every oversized cell — on
    the FIRST column's within-cell residual range while it still has
    value spread, else (pure tie skew: the cell holds a single value) on
    the SECOND order column when numeric. Refining a mixed-value cell on
    the second column would break monotonicity, so it is only used for
    single-value cells. Every level multiplies ALL cell ids by the
    sub-grid fan-out ``_SUB_CELLS`` and adds the sub-cell (0 for
    untouched cells), keeping id order consistent with the total order.
    If a cell cannot be refined (single value + no numeric tiebreak) or
    cells remain oversized when the 64-bit id space is exhausted, this
    raises with guidance rather than silently degrading to a single-task
    sort.

    Driver-state bound (r5-verdict advice — the former per-level
    ``cells``-fold fan-out could reach ~4M distinct ids at the 65536
    cap): refinement splits ≤ 64 oversized cells per level into
    ``_SUB_CELLS`` sub-cells each, so distinct cell ids grow by at most
    ``64 * (_SUB_CELLS - 1)`` ≈ 4k per level — the per-level stats
    collect and the final counts/offsets collect stay ≤
    ``cells + levels × 4k`` (~106k rows worst case), honoring the
    bounded-driver-state contract the ``cells <= 65536`` cap promises.
    A hot cell still shrinks ``_SUB_CELLS``-fold per level (64² = 4096×
    after two levels), and the smaller multiplier consumes only 6 id
    bits per level, leaving MORE refinement depth than before.

    Threshold default: ``max(8 * mean cell size, 1_000_000)`` — refinement
    engages only on genuine skew at scale, never on balanced small inputs.
    """
    import math

    from pyspark.sql import types as T

    first = order_cols[0]
    second = order_cols[1] if len(order_cols) > 1 else None
    second_numeric = second is not None and isinstance(
        df.schema[second].dataType, T.NumericType
    )
    vmin, vmax = df.agg(F.min(first), F.max(first)).collect()[0]
    cur = df.withColumn(
        "_cell", _grid_cell_expr(first, vmin, vmax, cells).cast("long")
    )
    # each level multiplies ids by _SUB_CELLS (6 bits); the base grid uses
    # log2(cells) bits; stay clear of 2^63 overflow
    max_levels = max(
        1,
        int((62 - math.log2(max(cells, 2))) // math.log2(_SUB_CELLS)),
    )
    thr = max_cell_rows
    aggs = [
        F.count("*").alias("n"),
        F.min(first).alias("lo1"),
        F.max(first).alias("hi1"),
    ]
    if second_numeric:
        aggs += [F.min(second).alias("lo2"), F.max(second).alias("hi2")]
    for level in range(max_levels + 1):
        stats = cur.groupBy("_cell").agg(*aggs).collect()  # bounded (see cap)
        if thr is None:
            total = sum(r["n"] for r in stats)
            thr = max(8 * (total // cells) + 1, 1_000_000)
        over = [r for r in stats if r["n"] > thr]
        if not over:
            return cur
        if level == max_levels:
            raise ValueError(
                f"global rank/cumsum grid: {len(over)} cells remain over "
                f"{thr} rows after {level} refinement levels — the key "
                "space is too concentrated; rank on a hash of the key "
                "instead."
            )
        if len(over) > 64:
            raise ValueError(
                f"global rank/cumsum grid: {len(over)} of {len(stats)} "
                f"cells exceed {thr} rows — the first order column "
                f"'{first}' is too concentrated for a {cells}-cell grid. "
                "Use more cells, or order by a well-spread numeric key "
                "(e.g. a hash) first."
            )
        sub = F.lit(0)
        for r in over:
            if r["lo1"] is not None and r["lo1"] < r["hi1"]:
                refine = _grid_cell_expr(first, r["lo1"], r["hi1"], _SUB_CELLS)
            elif second_numeric and r["lo2"] is not None and r["lo2"] < r["hi2"]:
                # pure tie skew: every row shares one first-column value,
                # so sub-ordering is governed by the second column
                refine = _grid_cell_expr(second, r["lo2"], r["hi2"], _SUB_CELLS)
            else:
                raise ValueError(
                    f"global rank/cumsum grid: a cell holds {r['n']} rows "
                    f"of a single '{first}' value with no numeric "
                    "tiebreak column to refine on — add a numeric unique "
                    "key (e.g. an id or hash) as the second order column."
                )
            sub = F.when(F.col("_cell") == r["_cell"], refine).otherwise(sub)
        cur = cur.withColumn("_cell", F.col("_cell") * _SUB_CELLS + sub)
    raise AssertionError("unreachable")


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "global_rank",
    cells: int = 1024,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank over a total order WITHOUT a global window.

    A single-partition ``Window.orderBy`` funnels the whole table through
    one task — fine to ~10^8 rows, fatal at 100 TB. The distributed
    formulation buckets rows on a deterministic value grid over the FIRST
    order column (grid cells are monotone in the column, so cell order is
    consistent with the total order), ranks within each cell with an
    ordinary partitioned window, and shifts each cell's ranks by the row
    count of all cells before it. The per-cell counts are ≤ ``cells``
    scalars — collected to the driver and broadcast back, the same
    bounded-state pattern as CC convergence counts.

    Buckets derive from data values, NOT from physical partitioning
    (``repartitionByRange`` samples boundaries, so two evaluations of the
    same lineage can split differently — spark_partition_id-based offsets
    are unsound without materialization). ``order_cols`` must be a unique
    key and the first column numeric. Pathological skew (most rows in one
    grid cell) is handled by :func:`_assign_cells`'s one-level grid
    refinement — oversized cells re-grid on the first column's residual
    range, or on the second order column for pure tie skew; irreparable
    concentration raises with guidance instead of silently degrading to a
    single-task sort. ``max_cell_rows`` overrides the refinement
    threshold (default ``max(8 * mean cell, 1e6)``).
    """
    if not (0 < cells <= 65536):
        # the per-cell counts round-trip through the driver; an unbounded
        # grid would turn this bounded-state pattern into a driver OOM
        raise ValueError(f"global_rank cells must be in (0, 65536], got {cells}")
    local = _assign_cells(df, order_cols, cells, max_cell_rows).withColumn(
        "_lrank",
        F.row_number().over(
            Window.partitionBy("_cell").orderBy(*[F.asc(c) for c in order_cols])
        ),
    )
    counts = dict(
        local.groupBy("_cell").agg(F.count("*").alias("n")).collect()
    )  # <= cells + levels*64*_SUB_CELLS rows (~106k max) — bounded driver state
    offsets, acc = {}, 0
    for c in sorted(counts):
        offsets[c] = acc
        acc += counts[c]
    off_df = df.sparkSession.createDataFrame(
        [(int(c), int(o)) for c, o in offsets.items()], "_cell long, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_cell")
        .withColumn(rank_col, (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_cell", "_lrank", "_off")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_before",
    cells: int = 1024,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Exclusive global prefix sum of ``value_col`` over a total order
    WITHOUT a single-partition window — ``out_col`` = sum of the value
    over all rows strictly before this one in ``order_cols`` order.

    Same bounded-state strategy as :func:`global_rank` (which is this
    operator with value ≡ 1): rows bucket on a deterministic value grid
    over the FIRST order column, an ordinary partitioned window computes
    the within-cell running sum, and each cell shifts by the total of all
    prior cells — ≤ ``cells`` scalars through the driver. First order
    column must be numeric and reasonably spread (a hash value is ideal);
    ``order_cols`` must be a unique key.
    """
    if not (0 < cells <= 65536):
        raise ValueError(f"global_cumsum cells must be in (0, 65536], got {cells}")
    w = Window.partitionBy("_cell").orderBy(*[F.asc(c) for c in order_cols])
    local = _assign_cells(df, order_cols, cells, max_cell_rows).withColumn(
        "_lcum",
        F.sum(F.col(value_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    totals = dict(
        local.groupBy("_cell")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    )  # <= cells + levels*64*_SUB_CELLS rows (~106k max) — bounded driver state
    offsets, acc = {}, 0
    for c in sorted(totals):
        offsets[c] = acc
        acc += int(totals[c])
    off_df = df.sparkSession.createDataFrame(
        [(int(c), int(o)) for c, o in offsets.items()], "_cell long, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_cell")
        .withColumn(
            out_col,
            (F.coalesce(F.col("_lcum"), F.lit(0)) + F.col("_off")).cast("long"),
        )
        .drop("_cell", "_lcum", "_off")
    )


def ntile_from_rank(rank: Column, n_rows: int, buckets: int) -> Column:
    """ANSI NTILE(buckets) from a precomputed global rank: the first
    ``n_rows % buckets`` buckets hold ``n_rows // buckets + 1`` rows, the
    rest one fewer — exactly Spark's and DuckDB's NTILE. Lets equi-depth
    bucketing run on :func:`global_rank` output instead of a
    single-partition window."""
    q, r = n_rows // buckets, n_rows % buckets
    if q == 0:
        return rank.cast("long")
    big = r * (q + 1)
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / q))
        .cast("long")
    )
