"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is the same gate the driver runs at sf0.01 (CORRECTNESS_r{N}.json),
replicated locally so regressions surface immediately.
"""

from __future__ import annotations

import pytest

from hive_feature_demo_spark.plans import REGISTRY
from tests.oracle import compare, duckdb_con

_WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, con):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    problems = compare(df, con, q.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_all_queries_return_rows(spark, sf_dir):
    for name, q in sorted(REGISTRY.items()):
        df = q.fn(spark, sf_dir)
        assert df.columns, f"{name} has no columns"
        # every query must at least run; emptiness is allowed only for
        # queries whose semantics can legitimately produce zero rows
        df.limit(1).collect()
