"""Regression gate for the driver-parseable bench contract line (r12).

The driver archives and parses only the LAST ~2000 chars of bench stdout:
BENCH_r01/r02/r04/r05 (small artifact line) have ``parsed`` populated with
exactly ``{metric, value, unit, queries, sf}``, while BENCH_r06..r11 all
record ``"parsed": null`` — the artifact line had outgrown the window and
was truncated mid-line. bench.main() now prints a compact FINAL line that
must always fit the window whole, after the full artifact line. This pins
that property against the headline suite growing.
"""

from __future__ import annotations

import json

import bench

_TAIL_CHARS = 2000  # the driver's stdout archive window (BENCH_r*.json "tail")


def _fake_out_and_timings():
    timings = {name: 1.234 for name in bench.HEADLINE}
    out = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "headline_errors": 0,
        "headline_core_total": 20.0,
        "calib_mt_sec": 0.81,
        "scale2": {"total": 25.5},
        "scale3": {"total": 70.1},
    }
    return out, timings


def test_contract_line_fits_driver_tail_window():
    out, timings = _fake_out_and_timings()
    line = bench._contract_line(out, timings)
    # whole line + newline must fit even when the full artifact line
    # precedes it in the same window
    assert len(line) < 1900, f"{len(line)} chars"
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert parsed["metric"] == "headline_suite_total"
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_contract_line_survives_tail_truncation_like_the_driver():
    out, timings = _fake_out_and_timings()
    # simulate bench stdout: a huge artifact line, then the contract line
    big = json.dumps({**out, "queries": timings, "runs_raw": {k: [1.2, 1.3] for k in timings}, "pad": "x" * 4000})
    stdout = big + "\n" + bench._contract_line(out, timings) + "\n"
    tail = stdout[-_TAIL_CHARS:]
    # driver-style recovery: last json-parseable line of the tail
    parsed = None
    for ln in reversed(tail.splitlines()):
        try:
            parsed = json.loads(ln)
            break
        except ValueError:
            continue
    assert parsed is not None, "no parseable line inside the tail window"
    assert parsed["value"] == out["value"]
    assert len(parsed["queries"]) == len(bench.HEADLINE)


def test_contract_line_drops_extras_rather_than_outgrow_window():
    # the fallback must be bounded UNCONDITIONALLY (r13, r12 ADVICE): an
    # arbitrarily large per-query map may not push the line past the
    # window — the queries map is dropped, a count kept in its place
    out, timings = _fake_out_and_timings()
    long_timings = {f"q{i:03d}_" + "x" * 40: 1.0 for i in range(120)}
    line = bench._contract_line(out, long_timings)
    assert len(line) < 1900, f"{len(line)} chars"
    parsed = json.loads(line)
    assert parsed["value"] == out["value"]
    assert "queries" not in parsed
    assert parsed["n_queries"] == len(long_timings)
    # the scalar gate keys survive the fallback
    for key in ("headline_errors", "headline_core_total", "calib_mt_sec"):
        assert key in parsed
