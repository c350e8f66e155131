"""Registry-wide scan-pruning audit (guide §6): for every registered
query, parse the formatted physical plan's `Scan parquet` nodes and
report ReadSchema width vs the table's on-disk width, plus whether any
filter was pushed. Flags scans that read every column of a wide table —
the signature of an opaque operation (UDF boundary, select("*")) that
defeats column pruning and, at 100 TB, multiplies scan bytes.

Usage: python scripts/audit_scans.py [--sf DIR] [--min-width N]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_feature_demo_spark.plans import REGISTRY  # noqa: E402
from hive_feature_demo_spark.session import get_spark  # noqa: E402

_SCAN_RE = re.compile(
    r"\(\d+\) Scan parquet ?\n(?:.*\n)*?Location: \S+ \[\S*?/(\w+)\.parquet\]"
    r"(?:\n(?:.*\n)*?PushedFilters: (\[.*?\]))?(?:\n(?:.*\n)*?ReadSchema: struct<(.*?)>)?",
)


def full_width_scans(
    plan: str, widths: dict[str, int], min_width: int
) -> list[tuple[str, int, int, str]]:
    """(table, read_cols, table_cols, pushed) for each scan of a
    ``min_width``-plus-column table that reads EVERY column."""
    out = []
    for m in _SCAN_RE.finditer(plan):
        table, pushed, schema = m.group(1), m.group(2) or "[]", m.group(3) or ""
        ncols = schema.count(":") if schema else 0
        w = widths.get(table)
        if w and ncols >= w and w >= min_width:
            out.append((table, ncols, w, pushed))
    return out


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    min_width = 8
    if "--min-width" in argv:
        min_width = int(argv[argv.index("--min-width") + 1])

    spark = get_spark(app_name="audit-scans")
    # on-disk widths
    widths: dict[str, int] = {}
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            t = f[: -len(".parquet")]
            widths[t] = len(spark.read.parquet(os.path.join(sf_dir, f)).columns)
    print(f"table widths: {widths}")

    full_width = Counter()
    offenders: list[tuple[str, str, int, int, str]] = []
    errors = 0
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            errors += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:160])
            continue
        for table, ncols, w, pushed in full_width_scans(plan, widths, min_width):
            full_width[table] += 1
            offenders.append((name, table, ncols, w, pushed[:60]))
    print(f"\nplans audited: {len(REGISTRY)}, errors: {errors}")
    print(f"full-width scans of tables with >= {min_width} columns: {sum(full_width.values())}")
    print(f"by table: {dict(full_width)}")
    for name, table, ncols, w, pushed in offenders:
        print(f"  {name:42s} {table:12s} reads {ncols}/{w} pushed={pushed}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
