"""Multimodal decode-pipeline query plans (deterministic-fake media path).

The decode is stubbed (no media libraries in this container — reference
analogue: SURVEY.md §2.3 "Multimodal columns"), but every derived feature is
a pure function of the asset's md5, so the whole Arrow-batched
``mapInPandas`` pipeline is replayed by the DuckDB oracle and hash-checked:
schema, batching, integer resize math, frame sampling, fake embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import sql_hex_to_int
from hive_feature_demo_spark.operators import multimodal
from hive_feature_demo_spark.plans.registry import register


def _hex2int(h: str, pos: str) -> str:
    """DuckDB: value of the 2-hex-digit pair of ``h`` at 1-based ``pos``."""
    return sql_hex_to_int(h, pos, 2)


_H = "md5(text)"
_WIDTH = f"16 * (1 + {_hex2int(_H, '1')} % 64)"
_HEIGHT = f"16 * (1 + {_hex2int(_H, '3')} % 64)"
_NFRAMES = f"1 + {_hex2int(_H, '5')} % 120"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    assets = multimodal.assets_from_documents(docs)
    return multimodal.media_features(assets)


# ---------------------------------------------------------------------------
# q66 — fake image decode + aspect-preserving integer resize.
# ---------------------------------------------------------------------------


@register(
    "q66_media_resize",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id AS asset_id,
             CAST({_WIDTH} AS INT) AS width,
             CAST({_HEIGHT} AS INT) AS height
      FROM documents
    )
    SELECT asset_id, width, height,
           CAST(GREATEST(1, width * {multimodal.RESIZE_TARGET}
                // GREATEST(width, height)) AS INT) AS out_width,
           CAST(GREATEST(1, height * {multimodal.RESIZE_TARGET}
                // GREATEST(width, height)) AS INT) AS out_height
    FROM dims
    ORDER BY asset_id
    """,
    category="multimodal",
)
def q66_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _media(spark, sf_dir).select(
        "asset_id", "width", "height", "out_width", "out_height"
    ).orderBy("asset_id")


# ---------------------------------------------------------------------------
# q67 — frame sampling: one row per sampled frame (explode of the stub).
# ---------------------------------------------------------------------------


@register(
    "q67_frame_samples",
    oracle=f"""
    WITH v AS (
      SELECT doc_id AS asset_id, CAST({_NFRAMES} AS BIGINT) AS n_frames
      FROM documents
    )
    SELECT asset_id, n_frames,
           unnest(generate_series(0, n_frames - 1, {multimodal.FRAME_STRIDE})) AS frame_idx
    FROM v
    ORDER BY asset_id, frame_idx
    """,
    category="multimodal",
)
def q67_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _media(spark, sf_dir)
        .select(
            "asset_id",
            F.col("n_frames").cast("long").alias("n_frames"),
            F.explode("sampled_frames").alias("frame_idx"),
        )
        .withColumn("frame_idx", F.col("frame_idx").cast("long"))
        .orderBy("asset_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# q68 — fake feature-extraction embeddings, exploded to (asset, dim, value).
# ---------------------------------------------------------------------------


@register(
    "q68_media_embeddings",
    oracle=f"""
    SELECT doc_id AS asset_id,
           unnest(generate_series(0, {multimodal.EMBED_DIM - 1})) AS dim_idx,
           unnest([
             FLOOR(({_hex2int(_H, "2 * i + 1")} / 255.0 - 0.5) * 1000000.0 + 0.5)
               / 1000000.0
             FOR i IN generate_series(0, {multimodal.EMBED_DIM - 1})
           ]) AS value
    FROM documents
    ORDER BY asset_id, dim_idx
    """,
    category="multimodal",
)
def q68_media_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _media(spark, sf_dir)
        .select("asset_id", F.posexplode("embedding").alias("dim_idx", "value"))
        .withColumn("dim_idx", F.col("dim_idx").cast("long"))
        .orderBy("asset_id", "dim_idx")
    )
