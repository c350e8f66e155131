"""Arg-parse contract for the batched selfcheck harness (r8 ADVICE: the
old --only consumed all remaining argv, so `--only q1 --category text`
silently folded '--category' and 'text' into the prefix list — the two
flags composed by accident). No Spark needed."""

from __future__ import annotations

import importlib.util
import os

_HERE = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "selfcheck_batched",
    os.path.join(_HERE, "..", "scripts", "selfcheck_batched.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
parse_args = _mod.parse_args


def test_only_stops_at_next_flag():
    a = parse_args(["--only", "q1", "q2", "--category", "text", "stats"])
    assert a["only"] == ["q1", "q2"]
    assert a["categories"] == ["text", "stats"]


def test_flags_compose_in_either_order():
    a = parse_args(["--category", "text", "--only", "q64", "--out", "X.json"])
    assert a["only"] == ["q64"]
    assert a["categories"] == ["text"]
    assert a["out_path"] == "X.json"


def test_scalar_flags_and_defaults():
    a = parse_args(["--sf", "/tmp/sfX", "--batch", "7"])
    assert a["sf_dir"] == "/tmp/sfX"
    assert a["batch_size"] == 7
    assert a["only"] == [] and a["categories"] == []
