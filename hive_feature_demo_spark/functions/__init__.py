"""Scalar/aggregate function helpers shared by operators and query plans."""

from hive_feature_demo_spark.functions.numeric import exact_avg, exact_sum, money
from hive_feature_demo_spark.functions.temporal import months_since

__all__ = ["exact_sum", "exact_avg", "money", "months_since"]
