"""The Python UDF surface: scalar pandas UDF, grouped-agg pandas UDF, UDTF.

UDFs are the engine's slow path — everything that *can* be a built-in
column expression is (see operators/*). These exist to (a) complete the
SURVEY.md §2.3 UDF surface and (b) model where real pipelines genuinely
need Python (model scoring, custom tokenizers). All three flavors are
Arrow-batched; none is a row-at-a-time ``F.udf``.

Factories, not module-level decorators: ``pandas_udf`` parses its DDL
return type against the active session, so creation is deferred (and
cached) until a session exists.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F


@lru_cache(maxsize=1)
def log1p_score():
    """Scalar pandas UDF (Series -> Series, Arrow-vectorized): a stand-in
    for per-row model scoring. Rounded floor-form for cross-engine hashes."""
    import numpy as np

    @F.pandas_udf("double")
    def _score(v: pd.Series) -> pd.Series:
        scale = 1e4
        # log(1+v), not log1p: mirrors the oracle's ln(1 + value) op-for-op
        # so the doubles are bit-identical before rounding
        return np.floor(np.log(1.0 + v) * scale + 0.5) / scale

    return _score


@lru_cache(maxsize=1)
def weighted_avg_cents():
    """Grouped-agg pandas UDF: quantity-weighted mean price.

    Accumulates integer cents (exact, order-independent) — distributed
    float summation would differ from the oracle in the last ulp.
    """

    @F.pandas_udf("double")
    def _wavg(price: pd.Series, qty: pd.Series) -> float:
        cents = [math.floor(p * 100 + 0.5) for p in price]
        total = sum(c * int(q) for c, q in zip(cents, qty))
        wsum = int(qty.sum())
        return (total / 100.0) / wsum

    return _wavg


def make_sentence_udtf():
    """Python UDTF (Spark >= 3.5): explode text into trimmed sentences.

    One input row -> N output rows with per-sentence token counts; the
    lateral-join form replaces a collect-and-loop driver pattern with a
    fully distributed operator.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_tokens int")
    class SentenceSplitter:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for raw in text.split("."):
                s = raw.strip()
                if s:
                    yield idx, s, len(s.split())
                    idx += 1

    return SentenceSplitter


def make_keyword_score_udf():
    """Iterator-form scalar pandas UDF (SCALAR_ITER): per-task setup runs
    once when the iterator opens, then every Arrow batch reuses it — the
    shape that amortizes model/tokenizer loads. Deterministic keyword
    weights so oracles can replay the scoring in SQL.
    """
    @F.pandas_udf("long")
    def keyword_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = {"spark": 7, "join": 1}  # one-time per-task "model load"
        for texts in batches:
            yield sum(
                w * texts.str.count(kw) for kw, w in weights.items()
            ).astype("int64")

    return keyword_score
