"""Named query plans — the driver-facing registry.

Each module registers queries via :func:`hive_feature_demo_spark.plans.registry.register`;
importing this package populates the registry. ``__spark_entry__.py`` exposes
it through ``queries()`` / ``oracle_sql()``.
"""

from hive_feature_demo_spark.plans import (  # noqa: F401  (import = register)
    advanced_ops,
    ann,
    audit_ops,
    engine_features,
    curation,
    llmops,
    mediaops,
    pipeline_ops,
    relational,
    relational_ext,
    relational_more,
    retrieval,
    segment,
    sketch_ops,
    sourcesink,
    stats,
    streaming_batch,
    streaming_more,
    textstats,
    tpch_more,
    tpch_rest,
    udf_surface,
)
from hive_feature_demo_spark.plans.registry import REGISTRY, oracle_sql_map, queries_map

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
