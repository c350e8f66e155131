"""Structured Streaming operators over the events stream.

The batch definitions of these computations live in
``plans/streaming_batch.py`` (hash-checked against DuckDB); this module runs
the same logic incrementally with watermarks + the state store. Tests replay
parquet micro-batches through a file source (``maxFilesPerTrigger=1``) and
assert stream==batch agreement and watermark late-drop behavior.

Scale notes: watermarks bound state (windows/dedup keys older than the
watermark are evicted); ``session_window`` + watermark keeps per-user session
state finite; stream-static joins re-broadcast the dimension per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the events stream as stored (ts = epoch nanos, see catalog).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events with ns->timestamp normalization.

    In production this is a Kafka source; the file source exercises the
    identical incremental semantics (micro-batches, watermark advance).
    """
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per user (state bounded by the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once events by event_id within the watermark horizon.

    ``dropDuplicates`` over a streaming DataFrame keeps key state; the
    watermark evicts keys older than the horizon so state stays bounded —
    the standard at-scale idempotency layer in front of windowed aggs.
    """
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_with_dimension(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static join: each micro-batch joins the (broadcast) dimension."""
    return events.join(F.broadcast(dim), on, how)


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion into an in-memory table.

    Synchronous: processes all available input, then stops. The result is
    readable as ``spark.table(name)``.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
