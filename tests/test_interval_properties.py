"""Property tests for the grid-cell interval operators and the distributed
prefix sum: randomized inputs, brute-force Python reference. The operators'
correctness argument (cell binning + first-common-cell + exact predicate)
has edge cases — boundary-aligned instants, zero-width intervals, spans
crossing many cells, negative-epoch times — that fixed examples undersample.

Batched: one Spark job per hypothesis example, small example counts (Spark
round trips are ~0.5s each).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_feature_demo_spark.operators.relational_ext import (
    global_cumsum,
    instant_interval_join,
    interval_overlap_join,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
CELL = 600  # 10-minute grid to force multi-cell spans with small minutes

# minute offsets; include exact cell boundaries (multiples of 10)
_minutes = st.integers(min_value=0, max_value=180)


def _ts(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(_minutes, min_size=1, max_size=12),
    st.lists(st.tuples(_minutes, _minutes), min_size=1, max_size=12),
)
def test_instant_interval_join_equals_bruteforce(spark, points, spans):
    pts = [(i, _ts(m)) for i, m in enumerate(points)]
    ivs = [(j, _ts(min(a, b)), _ts(max(a, b))) for j, (a, b) in enumerate(spans)]
    got = sorted(
        (r["pid"], r["iid"])
        for r in instant_interval_join(
            spark.createDataFrame(pts, "pid long, t timestamp"),
            spark.createDataFrame(ivs, "iid long, lo timestamp, hi timestamp"),
            "t", "lo", "hi", cell_seconds=CELL,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, t in pts
        for iid, lo, hi in ivs
        if lo <= t <= hi
    )
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(_minutes, _minutes), min_size=1, max_size=10),
    st.lists(st.tuples(_minutes, _minutes), min_size=1, max_size=10),
)
def test_interval_overlap_join_equals_bruteforce(spark, left, right):
    ls = [(i, _ts(min(a, b)), _ts(max(a, b))) for i, (a, b) in enumerate(left)]
    rs = [(j, _ts(min(a, b)), _ts(max(a, b))) for j, (a, b) in enumerate(right)]
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            spark.createDataFrame(ls, "lid long, a_lo timestamp, a_hi timestamp"),
            spark.createDataFrame(rs, "rid long, b_lo timestamp, b_hi timestamp"),
            "a_lo", "a_hi", "b_lo", "b_hi", cell_seconds=CELL,
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, alo, ahi in ls
        for rid, blo, bhi in rs
        if alo <= bhi and blo <= ahi
    )
    assert got == want  # exactly once per overlapping pair — no dups, no misses


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # order value
            st.integers(min_value=-50, max_value=50),      # summed weight
        ),
        min_size=1,
        max_size=30,
    )
)
def test_global_cumsum_equals_bruteforce(spark, rows):
    data = [(i, float(v), w) for i, (v, w) in enumerate(rows)]
    got = {
        r["id"]: r["cum_before"]
        for r in global_cumsum(
            spark.createDataFrame(data, "id long, v double, w long").repartition(5),
            ["v", "id"],
            "w",
            cells=8,
        ).collect()
    }
    order = sorted(data, key=lambda t: (t[1], t[0]))
    acc, want = 0, {}
    for i, _, w in order:
        want[i] = acc
        acc += w
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(_minutes, _minutes), min_size=1, max_size=12),
    st.lists(st.tuples(_minutes, _minutes), min_size=1, max_size=12),
)
def test_interval_overlap_cell_cap_properties(spark, left, right):
    """max_cell_width: a huge cap reproduces the exact join; a tight cap
    yields a subset of the exact pairs (recall knob, never false pairs)."""
    ls = [(i, _ts(min(a, b)), _ts(max(a, b))) for i, (a, b) in enumerate(left)]
    rs = [(j, _ts(min(a, b)), _ts(max(a, b))) for j, (a, b) in enumerate(right)]
    ldf = spark.createDataFrame(ls, "lid long, a_lo timestamp, a_hi timestamp")
    rdf = spark.createDataFrame(rs, "rid long, b_lo timestamp, b_hi timestamp")

    def pairs(**kw):
        return sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                ldf, rdf, "a_lo", "a_hi", "b_lo", "b_hi", cell_seconds=CELL,
                l_tiebreak=["lid"], r_tiebreak=["rid"], **kw,
            ).collect()
        )

    exact = pairs()
    assert pairs(max_cell_width=10_000) == exact
    capped = pairs(max_cell_width=2)
    assert set(capped) <= set(exact)


def test_interval_overlap_cap_requires_tiebreaks(spark):
    """max_cell_width without a per-side total order is rejected up
    front — (lo, hi) ties would make the truncation nondeterministic
    (r6 ADVICE item 2)."""
    import pytest

    df = spark.createDataFrame(
        [(1, _ts(0), _ts(10))], "lid long, a_lo timestamp, a_hi timestamp"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(0), _ts(10))], "rid long, b_lo timestamp, b_hi timestamp"
    )
    with pytest.raises(ValueError, match="tiebreak"):
        interval_overlap_join(
            df, rdf, "a_lo", "a_hi", "b_lo", "b_hi", max_cell_width=2
        )
    with pytest.raises(ValueError, match="tiebreak"):
        interval_overlap_join(
            df, rdf, "a_lo", "a_hi", "b_lo", "b_hi",
            max_cell_width=2, l_tiebreak=["lid"],  # right side still unordered
        )
