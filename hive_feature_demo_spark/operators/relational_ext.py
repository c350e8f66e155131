"""Relational operators Spark lacks natively: as-of join, range join.

- :func:`asof_join` — the time-series "most recent right row at or before
  the left row's time" join. Implemented as union + carry-forward window
  rather than an inequality join: one shuffle on the key, one sort, zero
  row explosion — the only formulation that survives 100 TB (an
  inequality-join plan is a BroadcastNestedLoop/cartesian per key).
- :func:`range_join` — theta join of a fact against small interval
  dimensions; broadcast so the non-equi condition never shuffles the fact.
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
