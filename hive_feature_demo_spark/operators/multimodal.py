"""Multimodal columns: opaque binary payloads + typed metadata.

Spark-side plumbing is real (BinaryType columns, metadata structs,
Arrow-batched ``mapInPandas`` decode pipeline, partition-size awareness);
the actual media decode is stubbed — image/audio libraries are not in this
container (see ``decode_stub``). The schema/batching contract is what a real
decoder would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]), True),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Model documents as binary assets: payload = utf-8 bytes of the text.

    Stands in for image/audio blobs; every downstream op (size, digest,
    batch decode) treats ``content`` as opaque bytes.
    """
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        content.alias("content"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.col("source").alias("source"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def asset_digests(assets: DataFrame) -> DataFrame:
    """Binary-column metadata pass: sizes + content digests (JVM-side)."""
    return assets.select(
        "asset_id",
        F.col("meta.source").alias("source"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("content").alias("digest"),
        F.sha2("content", 256).alias("sha256"),
    )


def decode_stub(batch_max_bytes: int = 64 << 20):
    """A ``mapInPandas`` decode kernel with the real batching contract.

    A production decoder would replace ``_decode_one`` with e.g. PIL/ffmpeg
    calls; the Spark-side shape — Arrow batches in, feature rows out,
    bounded memory per batch — is what matters at scale. Raises
    ``NotImplementedError`` for mime types needing absent libraries.
    """

    def _decode_one(content: bytes, mime: str) -> dict:
        if mime == "text/plain":
            text = content.decode("utf-8", errors="replace")
            return {"kind": "text", "n_units": len(text.split())}
        # image/audio/video decode needs PIL/soundfile/ffmpeg — not in this
        # container by design; the pipeline contract is exercised with text.
        raise NotImplementedError(f"no decoder for mime {mime!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(c, m) for c, m in zip(pdf["content"], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": [f["kind"] for f in feats],
                    "n_units": [f["n_units"] for f in feats],
                }
            )

    return kernel


DECODED_SCHEMA = "asset_id long, kind string, n_units long"


def decode_assets(assets: DataFrame) -> DataFrame:
    """Run the (stub) decoder over binary content, Arrow-batched."""
    return assets.mapInPandas(decode_stub(), schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic-fake media features: the decode itself is stubbed (no
# PIL/ffmpeg in this container), but every derived value is a pure function
# of the content's md5, so the full mapInPandas pipeline — schema, Arrow
# batching, explode of per-frame rows — is hash-checkable end-to-end.
# ---------------------------------------------------------------------------

RESIZE_TARGET = 256
FRAME_STRIDE = 7
EMBED_DIM = 8

MEDIA_SCHEMA = (
    "asset_id long, width int, height int, out_width int, out_height int, "
    "n_frames int, sampled_frames array<int>, embedding array<double>"
)


def _floor_round(x: float, digits: int = 6) -> float:
    """Python spelling of functions.numeric.round_det (same IEEE ops)."""
    import math

    scale = float(10**digits)
    return math.floor(x * scale + 0.5) / scale


def media_features_stub():
    """``mapInPandas`` kernel: fake decode + resize + frame-sample + embed.

    A real decoder swaps ``_fake_decode`` for PIL/ffmpeg and keeps every
    other line. Dims/frames/embedding derive from the content digest —
    deterministic across engines, partitionings, and batch boundaries.
    """
    import hashlib

    def _fake_decode(content: bytes) -> dict:
        h = hashlib.md5(content).hexdigest()
        width = 16 * (1 + int(h[0:2], 16) % 64)
        height = 16 * (1 + int(h[2:4], 16) % 64)
        m = max(width, height)
        n_frames = 1 + int(h[4:6], 16) % 120
        return {
            "width": width,
            "height": height,
            "out_width": max(1, width * RESIZE_TARGET // m),
            "out_height": max(1, height * RESIZE_TARGET // m),
            "n_frames": n_frames,
            "sampled_frames": list(range(0, n_frames, FRAME_STRIDE)),
            "embedding": [
                _floor_round(int(h[2 * i : 2 * i + 2], 16) / 255.0 - 0.5)
                for i in range(EMBED_DIM)
            ],
        }

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return kernel


def media_features(assets: DataFrame) -> DataFrame:
    """Decode-pipeline features over binary assets (Arrow-batched)."""
    return assets.select("asset_id", "content").mapInPandas(
        media_features_stub(), schema=MEDIA_SCHEMA
    )
