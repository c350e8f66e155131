"""spark-segment-engine: a PySpark-native analytics engine.

Reproduces and generalizes the query / data-processing capabilities of the
reference repo ``Mari5498/hive-feature-demo`` (see SURVEY.md) as an idiomatic
Spark SQL engine:

- Layer A: exact ``query_crm`` / ``generate_campaign_copy`` /
  ``schedule_campaign`` semantics (reference ``backend/tools.py:38-185``) as
  typed DataFrame operators (:mod:`.operators.segment`, :mod:`.operators.campaign`).
- Layer B: the full relational OLAP surface (joins, grouped/rollup/cube aggs,
  windows, set ops, top-k) plus LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal columns) and Structured
  Streaming — all on stock DataFrame/Catalyst primitives, designed for
  100 TB scale (partition pruning, broadcast joins, AQE; no driver-side loops).
"""

from hive_feature_demo_spark.session import get_spark
from hive_feature_demo_spark.catalog import register_testdata

__all__ = ["get_spark", "register_testdata"]

__version__ = "0.1.0"
