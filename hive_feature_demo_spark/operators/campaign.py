"""Layer A: campaign copy generation + scheduling as Spark operators.

- ``generate_copy`` reproduces the reference's deterministic fallback
  template (``backend/tools.py:146-154``) as a pure column projection — this
  is the default mode so results are hashable/oracle-checkable (A14). The
  LLM mode (A13, Claude call + regex JSON extraction, tools.py:105-144) is
  modeled as a pluggable row-batch callable behind ``llm_fn``; it is OFF by
  default and excluded from correctness hashing (SURVEY §7.4 trap 8).
- ``schedule_campaign`` reproduces the campaign record construction
  (tools.py:157-185) with a deterministic, idempotent ``campaign_id``
  (content hash — the reference's own stated aspiration, SCALING.md:120,
  replacing its uuid4).

Copy constraints carried from the reference prompt (tools.py:126-130) and UI
guard (CampaignPreview.tsx:92-93): subject < 50 chars, SMS < 155/160 chars —
exposed as validation columns, not silent truncation.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TONES = ("enthusiastic", "exclusive", "casual")

COPY_SCHEMA = T.StructType(
    [
        T.StructField("email", T.StructType([
            T.StructField("subject", T.StringType()),
            T.StructField("preview_text", T.StringType()),
            T.StructField("body", T.StringType()),
        ])),
        T.StructField("sms", T.StructType([T.StructField("body", T.StringType())])),
    ]
)


def generate_copy(requests: DataFrame, llm_fn: Callable | None = None) -> DataFrame:
    """Deterministic campaign copy for rows of
    ``(audience_description, event_name, event_date, tone)``.

    Template == the reference fallback (tools.py:146-154), verbatim:
      subject  = ``You're invited: {event_name}``
      preview  = ``Don't miss {event_name} on {event_date}``
      sms      = ``{event_name} — {event_date}. Get your tickets now!``
    The body in deterministic mode composes the tone + audience into a fixed
    3-paragraph shape (the reference's fallback passes raw LLM text through;
    with no LLM there is none, so the template is the contract).

    With ``llm_fn`` (an ``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]``
    batch callable), rows are Arrow-batched through ``mapInPandas`` — the
    scale path for LLM calls: batched, executor-parallel, no driver loop.
    """
    tone = F.coalesce(F.col("tone"), F.lit("enthusiastic"))
    det = requests.select(
        "*",
        F.struct(
            F.concat(F.lit("You're invited: "), F.col("event_name")).alias("subject"),
            F.format_string(
                "Don't miss %s on %s", F.col("event_name"), F.col("event_date")
            ).alias("preview_text"),
            F.format_string(
                "Hi there!\n\n%s — %s is coming up on %s. "
                "As one of our %s fans, we wanted you to hear it first.\n\n"
                "Get your tickets now!",
                tone,
                F.col("event_name"),
                F.col("event_date"),
                F.col("audience_description"),
            ).alias("body"),
        ).alias("email"),
        F.struct(
            F.format_string(
                "%s — %s. Get your tickets now!", F.col("event_name"), F.col("event_date")
            ).alias("body")
        ).alias("sms"),
    )
    out = det
    if llm_fn is not None:
        out_schema = T.StructType(list(requests.schema.fields) + list(COPY_SCHEMA.fields))

        def _batched(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            yield from llm_fn(it)

        out = requests.mapInPandas(_batched, schema=out_schema)
    # validation columns mirroring the reference's prompt constraints + UI guard
    return out.select(
        "*",
        (F.length(F.col("email.subject")) < 50).alias("subject_ok"),
        (F.length(F.col("sms.body")) <= 160).alias("sms_ok"),
    )


def schedule_campaign(drafts: DataFrame) -> DataFrame:
    """Campaign records from ``(segment_id, event_name, audience_size, send_at)``.

    Output shape == tools.py:178-185 (the authoritative shape per SURVEY §1.3):
    ``campaign_id, segment_id, event_name, audience_size, send_at, status``.
    ``campaign_id`` = ``cmp_`` + 8 hex of sha256(segment_id|event|send_at) —
    idempotent: re-scheduling the same draft mints the same id, so an
    append to a ``campaigns`` table can MERGE/insert-if-absent (SCALING.md:120).
    """
    content = F.concat_ws("|", F.col("segment_id"), F.col("event_name"), F.col("send_at"))
    return drafts.select(
        F.concat(F.lit("cmp_"), F.substring(F.sha2(content, 256), 1, 8)).alias("campaign_id"),
        "segment_id",
        "event_name",
        F.col("audience_size").cast("long").alias("audience_size"),
        "send_at",
        F.lit("scheduled").alias("status"),
    )
