"""Generalized LLM operator: the reference's tool pattern as a Spark op.

The reference pattern (``backend/tools.py:105-154``): build a prompt from
structured fields -> call a model -> regex-extract JSON -> parse -> fall
back to a deterministic template on failure. Generalized here as
``llm_generate(df, prompt_template, reply_schema, llm_fn)``:

- deterministic mode (default, ``llm_fn=None``): the "reply" IS the
  fallback template — pure column expressions, hashable, oracle-checkable;
- LLM mode: ``llm_fn`` is an Arrow-batched ``mapInPandas`` kernel (executor
  side, batched — the only shape that scales: no driver loop, no per-row
  API call); replies are parsed with ``from_json`` against the declared
  schema and invalid replies take the fallback via ``coalesce`` — exactly
  the reference's regex+fallback semantics, but schema-validated.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def render_prompt(template: str, df: DataFrame) -> Column:
    """``format_string``-render a ``{col}``-style template from row fields.

    Literal ``%`` in the template is escaped (java.util.Formatter would
    otherwise read it as a conversion spec and fail at execution).
    """
    import re

    cols = re.findall(r"\{(\w+)\}", template)
    fmt = re.sub(r"\{\w+\}", "%s", template.replace("%", "%%"))
    return F.format_string(fmt, *[F.col(c) for c in cols])


def llm_generate(
    df: DataFrame,
    prompt_template: str,
    reply_schema: str,
    fallback: dict[str, Column],
    llm_fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] | None = None,
) -> DataFrame:
    """Attach ``prompt``, raw ``reply`` and schema-parsed reply fields.

    ``reply_schema`` is a DDL struct string (e.g. ``"subject string,
    body string"``); every schema field lands as a column, null-coalesced
    with its ``fallback`` expression. ``used_fallback`` marks rows whose
    reply failed to parse.

    When ``llm_fn`` is omitted, the env-gated real-client adapter
    (``operators/llm_client``, ``HFD_SPARK_LLM=anthropic``) is consulted;
    with the env unset this stays the deterministic, oracle-checkable mode.
    """
    if llm_fn is None:
        from hive_feature_demo_spark.operators.llm_client import llm_fn_from_env

        llm_fn = llm_fn_from_env()
    with_prompt = df.withColumn("prompt", render_prompt(prompt_template, df))
    if llm_fn is None:
        # deterministic mode: no reply; every row takes the fallback
        out = with_prompt.withColumn("reply", F.lit(None).cast("string"))
    else:
        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in with_prompt.schema.fields]
            + ["reply string"]
        )
        out = with_prompt.mapInPandas(llm_fn, schema=out_schema)
    parsed = F.from_json(F.col("reply"), reply_schema)
    # reply fields REPLACE same-named input columns (instead of producing
    # an ambiguous duplicate-name frame)
    cols = [F.col(c) for c in out.columns if c not in fallback]
    for name, fb in fallback.items():
        cols.append(F.coalesce(parsed[name], fb).alias(name))
    # malformed JSON yields a non-null struct with all-null fields
    # (PERMISSIVE from_json), so "fallback used" = no declared field parsed
    all_fields_null = F.lit(True)
    for name in fallback:
        all_fields_null = all_fields_null & parsed[name].isNull()
    cols.append(
        (F.col("reply").isNull() | parsed.isNull() | all_fields_null).alias(
            "used_fallback"
        )
    )
    return out.select(*cols)
