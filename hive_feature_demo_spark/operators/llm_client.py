"""Real-client adapter for the ``llm_generate`` operator (A13 completion).

The engine's LLM surface is deliberately split:

- ``operators/llm.llm_generate`` — the Spark operator: prompt rendering,
  Arrow-batched execution, schema parse, fallback. Deterministic and
  oracle-checkable with ``llm_fn=None``.
- THIS module — the adapter a user hands a real model client to. It turns
  any ``complete: str -> str`` callable into the ``mapInPandas`` kernel
  ``llm_generate`` expects, reproducing the reference's call semantics
  (``/root/reference/backend/tools.py:105-154``): one prompt per row, the
  first ``{...}`` block of the reply extracted as JSON, anything
  unparsable -> NULL reply so the operator's fallback template wins.

Wiring a real model is env-gated and excluded from hash checks: correctness
runs always use deterministic mode; an integration test covers this path
with a mock client (``tests/test_llm_client.py``).

Scale notes: the kernel runs executor-side per Arrow batch — no driver
loop, no collected prompts. Concurrency control at 1000 executors is
partition-level: ``df.repartition(n_api_lanes)`` bounds in-flight calls,
and the per-call ``max_retries``/backoff below handles 429s; the client is
constructed lazily per executor process (clients don't pickle).
"""

from __future__ import annotations

import json
import os
import re
import time
from collections.abc import Callable, Iterator

import pandas as pd

#: env var gating the real-client path; unset/empty -> deterministic mode.
LLM_MODE_ENV = "HFD_SPARK_LLM"
#: model used when the env selects the anthropic provider (the reference's
#: choice, tools.py:133); override with HFD_SPARK_LLM_MODEL.
DEFAULT_MODEL_ENV = "HFD_SPARK_LLM_MODEL"


def extract_json_block(text: str | None) -> str | None:
    """The reference's reply hygiene: first ``{...}`` span, validated.

    Returns the JSON substring (NOT the parsed object — ``llm_generate``
    parses with ``from_json`` against the declared schema) or None when no
    parsable block exists, which routes the row to the fallback template.
    """
    if not text:
        return None
    match = re.search(r"\{.*\}", text, re.DOTALL)
    if not match:
        return None
    block = match.group()
    try:
        json.loads(block)
    except json.JSONDecodeError:
        return None
    return block


def make_llm_fn(
    complete_factory: Callable[[], Callable[[str], str]],
    prompt_col: str = "prompt",
    max_retries: int = 3,
    backoff_s: float = 1.0,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the ``mapInPandas`` kernel from a client factory.

    ``complete_factory`` is called once per executor process (lazy client
    construction); the returned ``complete`` maps one prompt string to the
    model's raw text reply. Failures after retries yield a NULL reply —
    the operator's fallback, never an aborted job, is the failure mode,
    matching the reference's behavior on unparsable replies.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        complete = complete_factory()

        def call(prompt: str) -> str | None:
            for attempt in range(max_retries):
                try:
                    return extract_json_block(complete(prompt))
                except Exception:
                    if attempt == max_retries - 1:
                        return None
                    time.sleep(backoff_s * (2**attempt))
            return None

        for pdf in batches:
            out = pdf.copy()
            out["reply"] = [call(p) for p in pdf[prompt_col]]
            yield out

    return kernel


def anthropic_complete_factory(
    model: str | None = None, max_tokens: int = 1024
) -> Callable[[], Callable[[str], str]]:
    """Factory for the provider the reference uses (tools.py:132-136).

    Requires the public ``anthropic`` package and an API key in the
    standard env var; both live only on the executors that import this —
    the engine itself never imports the SDK at module load.
    """

    def factory() -> Callable[[str], str]:
        import anthropic  # deferred: not installed in the test container

        client = anthropic.Anthropic()
        chosen = model or os.environ.get(
            DEFAULT_MODEL_ENV, "claude-haiku-4-5-20251001"
        )

        def complete(prompt: str) -> str:
            response = client.messages.create(
                model=chosen,
                max_tokens=max_tokens,
                messages=[{"role": "user", "content": prompt}],
            )
            return response.content[0].text.strip()

        return complete

    return factory


def llm_fn_from_env() -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] | None:
    """Resolve the env-gated kernel: ``HFD_SPARK_LLM=anthropic`` -> real
    client, unset -> None (deterministic mode). Correctness gates run with
    it unset, so oracle hashes never depend on a live model."""
    mode = os.environ.get(LLM_MODE_ENV, "").strip().lower()
    if not mode:
        return None
    if mode == "anthropic":
        return make_llm_fn(anthropic_complete_factory())
    raise ValueError(f"unknown {LLM_MODE_ENV} provider: {mode!r}")
