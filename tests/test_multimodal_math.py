"""Pixel-math verification for the multimodal kernels.

The bilinear resize has fractional weights DuckDB cannot replay, so its
correctness gate lives here: an independent, deliberately-naive per-pixel
reference implementation must agree with the vectorized kernel exactly,
and the decoded-buffer statistics must match hand-computed byte sums.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from hive_feature_demo_spark.operators import multimodal


def _reference_bilinear(img, out_h, out_w):
    """Naive per-pixel bilinear resize (align_corners=False), loops only."""
    src = img.astype(np.float64)
    h, w, c = src.shape
    out = np.zeros((out_h, out_w, c))
    for i in range(out_h):
        for j in range(out_w):
            y = (i + 0.5) * h / out_h - 0.5
            x = (j + 0.5) * w / out_w - 0.5
            y0, x0 = int(np.clip(math.floor(y), 0, h - 1)), int(
                np.clip(math.floor(x), 0, w - 1)
            )
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            wy, wx = min(max(y - y0, 0.0), 1.0), min(max(x - x0, 0.0), 1.0)
            for k in range(c):
                top = src[y0, x0, k] * (1 - wx) + src[y0, x1, k] * wx
                bot = src[y1, x0, k] * (1 - wx) + src[y1, x1, k] * wx
                out[i, j, k] = top * (1 - wy) + bot * wy
    return out


@pytest.mark.parametrize(
    "shape,out_shape",
    [((8, 12, 3), (4, 6)), ((5, 5, 3), (9, 9)), ((16, 4, 3), (3, 11)), ((1, 7, 3), (2, 2))],
)
def test_resize_bilinear_matches_reference(shape, out_shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = multimodal.resize_bilinear(img, *out_shape)
    want = _reference_bilinear(img, *out_shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    assert got.shape == (*out_shape, shape[2])


def test_resize_identity_is_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        multimodal.resize_bilinear(img, 6, 9), img.astype(np.float64)
    )


def test_kernel_statistics_match_byte_sums():
    """The kernel's buffer statistics equal closed-form tiled byte sums —
    the identity the DuckDB oracle relies on."""
    content = b"The quick brown fox jumps over the lazy dog." * 3
    kernel = multimodal.media_features_kernel()
    import pandas as pd

    [out] = list(
        kernel(iter([pd.DataFrame({"asset_id": [1], "content": [content]})]))
    )
    row = out.iloc[0]

    h = hashlib.md5(content).hexdigest()
    width = 16 * (1 + int(h[0:2], 16) % 64)
    height = 16 * (1 + int(h[2:4], 16) % 64)
    npx3 = width * height * 3
    src = np.frombuffer(content, dtype=np.uint8).astype(np.int64)
    L, T = len(src), int(src.sum())
    P = np.concatenate([[0], np.cumsum(src)])

    def tsum(lo, hi):
        return (hi // L - lo // L) * T + int(P[hi % L]) - int(P[lo % L])

    fr = multimodal._floor_round
    assert row["width"] == width and row["height"] == height
    assert row["mean_px"] == fr(tsum(0, npx3) / npx3)
    seg = npx3 // multimodal.EMBED_DIM
    for b, v in enumerate(row["embedding"]):
        assert v == fr(tsum(b * seg, (b + 1) * seg) / seg / 255.0 - 0.5)
    for f, lum in zip(row["sampled_frames"], row["frame_lums"]):
        assert lum == fr(tsum(f * npx3, (f + 1) * npx3) / npx3 / 255.0)


def test_documents_are_ascii():
    """Oracle precondition: ascii(char) == utf-8 byte for every document."""
    import duckdb

    con = duckdb.connect()
    n = con.sql(
        "SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        " WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n == 0


def _materialized_features(content: bytes) -> dict:
    """The pre-r6 buffer-materializing formulation, kept as the independent
    reference for the kernel's prefix-sum rewrite: decode every sampled
    frame into its own tiled npx3-byte buffer and call .mean() on it."""
    h = hashlib.md5(content).hexdigest()
    width = 16 * (1 + int(h[0:2], 16) % 64)
    height = 16 * (1 + int(h[2:4], 16) % 64)
    n_frames = 1 + int(h[4:6], 16) % 120
    src = np.frombuffer(content, dtype=np.uint8)
    if src.size == 0:
        src = np.zeros(1, dtype=np.uint8)
    npx3 = width * height * 3

    def decode(frame):
        start = (frame * npx3) % len(src)
        rolled = np.concatenate([src[start:], src[:start]])
        return np.resize(rolled, npx3)

    flat = decode(0)
    seg = npx3 // multimodal.EMBED_DIM
    sampled = list(range(0, n_frames, multimodal.FRAME_STRIDE))
    fr = multimodal._floor_round
    return {
        "frame_lums": [fr(decode(f).mean() / 255.0) for f in sampled],
        "embedding": [
            fr(flat[b * seg : (b + 1) * seg].mean() / 255.0 - 0.5)
            for b in range(multimodal.EMBED_DIM)
        ],
        "mean_px": fr(float(flat.mean())),
    }


def _materialized_strip_hash(content: bytes) -> int:
    """Pre-r6 buffer-materializing strip hash (independent reference)."""
    h = hashlib.md5(content).hexdigest()
    width = 16 * (1 + int(h[0:2], 16) % 64)
    height = 16 * (1 + int(h[2:4], 16) % 64)
    src = np.frombuffer(content, dtype=np.uint8)
    if src.size == 0:
        src = np.zeros(1, dtype=np.uint8)
    npx3 = width * height * 3
    flat = np.resize(src, npx3).astype(np.int64)
    seg = npx3 // multimodal.STRIP_HASH_BITS
    sums = flat.reshape(multimodal.STRIP_HASH_BITS, seg).sum(axis=1)
    total = int(sums.sum())
    return int(
        sum(
            1 << s
            for s in range(multimodal.STRIP_HASH_BITS)
            if int(sums[s]) * multimodal.STRIP_HASH_BITS > total
        )
    )


def test_prefix_sum_kernel_matches_materialized_buffers():
    """Property: the prefix-sum kernels are bit-identical to decoding and
    reducing the full tiled buffers, across payload sizes that tile many
    times, roughly once, and not at all (payload >= npx3 impossible here,
    but same-order covered), including the empty payload."""
    import pandas as pd

    rng = np.random.default_rng(42)
    payloads = [b""]
    for size in (1, 7, 53, 997, 16384, 250_000):
        payloads.append(bytes(rng.integers(0, 256, size=size, dtype=np.uint8)))
    payloads.append(b"\x00" * 100)  # constant payload: every strip ties
    fk = multimodal.media_features_kernel()
    sk = multimodal.strip_hash_kernel()
    pdf = pd.DataFrame(
        {"asset_id": list(range(len(payloads))), "content": payloads}
    )
    [feats] = list(fk(iter([pdf])))
    [hashes] = list(sk(iter([pdf])))
    for i, content in enumerate(payloads):
        want = _materialized_features(content)
        row = feats.iloc[i]
        assert list(row["frame_lums"]) == want["frame_lums"], i
        assert list(row["embedding"]) == want["embedding"], i
        assert row["mean_px"] == want["mean_px"], i
        assert hashes.iloc[i]["strip_hash"] == _materialized_strip_hash(content), i
