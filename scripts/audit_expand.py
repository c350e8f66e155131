"""Registry-wide Expand audit (r10 verdict ask #1).

Catalyst never pushes aggregates below joins, so a COUNT(DISTINCT)/
grouping-sets Expand fed by a fact-side join pays a xN-rows tax on every
joined fact row — the exact shape the q02 pre-aggregation rewrite removed
(plans/relational.py). This script builds every registered query's plan at
a small SF and reports each Expand occurrence with enough context to
classify it:

- `expand`: Expand nodes present in the formatted physical plan;
- `joins_below_expand`: for each Expand in the PARSED operator tree,
  whether any join sits BELOW it (i.e. the Expand multiplies
  post-join rows) and the estimated scan row counts feeding that subtree;
- `kind`: 'grouping_sets' (rollup/cube/pivot semantics NEED the Expand),
  'count_distinct' (rewrite candidate when fed by a fact join), or
  'other'.

Usage: python scripts/audit_expand.py [--sf DIR] [--out FILE] [names...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402


def _node_depth(line: str) -> int | None:
    """Column where a plan line's node text starts, or None for non-node
    lines (ReusedExchange refs, blank, subquery headers)."""
    stripped = line.rstrip()
    if not stripped:
        return None
    i = 0
    while i < len(stripped) and stripped[i] in " :+-":
        i += 1
    if i >= len(stripped):
        return None
    return i


def _audit_plan_text(plan: str) -> list[dict]:
    """Each Expand node in a simple-mode plan string, with the join nodes
    that sit BELOW it (deeper indentation until the subtree closes)."""
    lines = plan.splitlines()
    expands = []
    for idx, line in enumerate(lines):
        d = _node_depth(line)
        if d is None:
            continue
        body = line[d:]
        # strip the WholeStageCodegen `*(n) ` prefix before matching
        name = body.split("(", 1)[0].lstrip("*(0123456789) ")
        if not body.lstrip("*(0123456789) ").startswith("Expand"):
            continue
        sub_joins = []
        child = None
        for nxt in lines[idx + 1 :]:
            d2 = _node_depth(nxt)
            if d2 is None:
                continue
            if d2 <= d:
                break
            node2 = nxt[d2:].lstrip("*(0123456789) ")
            if child is None:
                # immediate input: HashAggregate here means the Expand
                # multiplies BOUNDED pre-aggregated rows, not fact rows
                child = node2.split("[")[0].split("(")[0].strip()[:40]
            if "Join" in node2.split("[")[0].split(" ")[0]:
                sub_joins.append(node2.split("[")[0].strip()[:60])
        expands.append(
            {
                "line": body[:200],
                "child": child,
                "joins_below": sub_joins,
            }
        )
    return expands


def _audit_df(df) -> dict:
    qe = df._jdf.queryExecution()
    simple = qe.explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    expands = _audit_plan_text(simple)
    kind = "none"
    if expands:
        if "spark_grouping_id" in simple:
            kind = "grouping_sets"
        elif "distinct" in simple.lower() or any(
            "count(" in e["line"] for e in expands
        ):
            kind = "count_distinct"
        else:
            kind = "other"
    return {
        "n_expand": len(expands),
        "kind": kind,
        "expands": expands,
    }


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    out_file = None
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv or sorted(REGISTRY)
    spark = get_spark()
    results: dict[str, dict] = {}
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            results[name] = _audit_df(df)
        except Exception as exc:  # keep auditing; record the failure
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        r = results[name]
        if r.get("n_expand"):
            joins = sum(len(e["joins_below"]) for e in r["expands"])
            print(
                f"{name}: {r['n_expand']} Expand ({r['kind']}), "
                f"{joins} joins below",
                flush=True,
            )
    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "with_expand": sorted(
            n for n, r in results.items() if r.get("n_expand")
        ),
        "errors": sorted(n for n, r in results.items() if r.get("error")),
        "results": results,
    }
    if out_file:
        with open(out_file, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(
        f"audited {summary['total']}: {len(summary['with_expand'])} with "
        f"Expand, {len(summary['errors'])} errors"
    )
    for n in summary["with_expand"]:
        r = results[n]
        jb = [e["joins_below"] for e in r["expands"]]
        ch = [e.get("child") for e in r["expands"]]
        print(f"  {n}: kind={r['kind']} child={ch} joins_below={jb}")
    if summary["errors"]:
        print("errors:", summary["errors"])
    return 0


if __name__ == "__main__":
    main()
