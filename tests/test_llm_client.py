"""Integration tests for the real-client LLM adapter (operators/llm_client).

Runs with a MOCK client in CI — no network, no SDK — exercising the full
path a real client takes: factory -> per-executor construction ->
per-prompt completion -> regex JSON extraction -> retry/fallback routing
through ``llm_generate``. A live run is the same code with
``HFD_SPARK_LLM=anthropic`` (plus the public SDK + API key on executors).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_feature_demo_spark.operators import llm_client
from hive_feature_demo_spark.operators.llm import llm_generate


def test_extract_json_block_variants():
    ok = llm_client.extract_json_block('noise {"a": 1, "b": "x"} trailing')
    assert ok == '{"a": 1, "b": "x"}'
    assert llm_client.extract_json_block("no json here") is None
    assert llm_client.extract_json_block("{not valid json") is None
    assert llm_client.extract_json_block(None) is None
    assert llm_client.extract_json_block("") is None


def test_llm_fn_from_env(monkeypatch):
    monkeypatch.delenv(llm_client.LLM_MODE_ENV, raising=False)
    assert llm_client.llm_fn_from_env() is None
    monkeypatch.setenv(llm_client.LLM_MODE_ENV, "anthropic")
    assert callable(llm_client.llm_fn_from_env())
    monkeypatch.setenv(llm_client.LLM_MODE_ENV, "bogus-provider")
    with pytest.raises(ValueError):
        llm_client.llm_fn_from_env()


def test_adapter_end_to_end_with_mock_client(spark):
    # factory defined inline: cloudpickle ships nested functions by VALUE,
    # while module-level test functions pickle by reference to a module the
    # executors cannot import
    def mock_factory():
        """Deterministic stand-in for a model client: echoes structured
        JSON for prompts mentioning 'good', markdown-fenced JSON for
        'fenced', garbage for 'bad' (-> fallback), and raises once for
        'flaky' (-> retry succeeds)."""
        calls = {"flaky": 0}

        def complete(prompt: str) -> str:
            if "flaky" in prompt:
                calls["flaky"] += 1
                if calls["flaky"] == 1:
                    raise RuntimeError("transient 429")
                return '{"title": "recovered", "score": 2}'
            if "good" in prompt:
                return 'Sure! {"title": "generated", "score": 9} hope that helps'
            if "fenced" in prompt:
                return '```json\n{"title": "fenced-reply", "score": 5}\n```'
            return "I cannot produce JSON today."

        return complete

    df = spark.createDataFrame(
        [(1, "good"), (2, "bad"), (3, "fenced"), (4, "flaky")],
        "id long, kind string",
    )
    out = llm_generate(
        df,
        prompt_template="make a {kind} thing",
        reply_schema="title string, score int",
        fallback={
            "title": F.concat(F.lit("fb-"), F.col("kind")),
            "score": F.lit(0),
        },
        llm_fn=llm_client.make_llm_fn(mock_factory, backoff_s=0.0),
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["title"] == "generated" and rows[1]["score"] == 9
    assert not rows[1]["used_fallback"]
    assert rows[2]["title"] == "fb-bad" and rows[2]["score"] == 0
    assert rows[2]["used_fallback"]
    assert rows[3]["title"] == "fenced-reply" and rows[3]["score"] == 5
    assert rows[4]["title"] == "recovered"  # retry path


def test_adapter_exhausted_retries_fall_back(spark):
    def always_raising_factory():
        def complete(prompt: str) -> str:
            raise RuntimeError("hard down")

        return complete

    df = spark.createDataFrame([(1, "x")], "id long, kind string")
    out = llm_generate(
        df,
        prompt_template="{kind}",
        reply_schema="title string",
        fallback={"title": F.lit("fallback-title")},
        llm_fn=llm_client.make_llm_fn(
            always_raising_factory, max_retries=2, backoff_s=0.0
        ),
    )
    row = out.collect()[0]
    assert row["title"] == "fallback-title" and row["used_fallback"]
