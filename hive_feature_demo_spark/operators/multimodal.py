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
