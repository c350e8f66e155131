"""Engine operators: Layer A segment/campaign semantics + Layer B
LLM-data-pipeline operators (dedup, similarity, text analysis, multimodal).

The relational core needs no wrappers — it is the stock DataFrame API,
demonstrated in :mod:`hive_feature_demo_spark.plans.relational`.
"""
