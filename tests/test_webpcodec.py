"""WebP lossless (VP8L) codec (operators/webpcodec.py): losslessness
property tests over every decoder path -- the 14 predictor modes,
cross-color, subtract-green, palette indexing at all four packing
widths, color cache, LZ77 runs, meta prefix image -- plus conformance
pins: the RFC-listed distance-neighborhood prefix and container/stream
error shapes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sample_for_transactional_datalake_using_s3tables_spark.operators.webpcodec import (
    _DIST_MAP,
    decode_webp,
    encode_webp_lossless,
)

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



def _roundtrip(img: np.ndarray, **kw) -> None:
    out = decode_webp(encode_webp_lossless(img, **kw))
    ch = img.shape[2]
    assert out.shape == (img.shape[0], img.shape[1], 4)
    assert np.array_equal(out[..., :ch], img)
    if ch == 3:
        assert (out[..., 3] == 255).all()


def _rand(rng, h, w, ch=3):
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


def test_distance_neighborhood_rfc_prefix():
    """The first rows of the 120-entry (dx, dy) short-distance table as
    listed in the WebP Lossless Bitstream Specification (RFC 9649 §4.2.2
    / libwebp docs) -- pins the generation rule (ordered by squared
    distance, larger dy first, positive dx before negative)."""
    assert _DIST_MAP[:34] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2),
    ]
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


@pytest.mark.parametrize("mode", range(14))
def test_every_predictor_mode_roundtrips(mode):
    rng = np.random.default_rng(100 + mode)
    _roundtrip(_rand(rng, 21, 19, 4), predictor_mode=mode)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"cross_color": (23, 250, 7)},
        {"subtract_green": True, "cross_color": (5, 6, 7), "predictor_mode": 7},
        {"cache_bits": 6},
        {"use_meta": True},
        {"use_lz77": False},
        {"cache_bits": 3, "use_meta": True, "predictor_mode": 11},
    ],
)
def test_transform_matrix_roundtrips(kw):
    rng = np.random.default_rng(7)
    _roundtrip(_rand(rng, 13, 17, 4), **kw)


@pytest.mark.parametrize("n_colors,desc", [(2, "1bpp"), (3, "2bpp"), (12, "4bpp"), (40, "8bpp")])
def test_palette_packing_widths(n_colors, desc):
    rng = np.random.default_rng(n_colors)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (9, 25))
    img = palette[idx]
    _roundtrip(img, palette=True)
    _roundtrip(img, palette=True, cache_bits=4)


def test_edge_shapes():
    _roundtrip(np.array([[[9, 8, 7]]], dtype=np.uint8))  # 1x1
    _roundtrip(np.full((16, 16, 3), 77, dtype=np.uint8))  # solid (LZ77)
    _roundtrip(np.zeros((1, 64, 4), dtype=np.uint8))  # single row
    _roundtrip(np.arange(64 * 4, dtype=np.uint8).reshape(64, 1, 4))  # col


def test_lz77_runs_compress():
    """Vertical runs must engage backward references (the stream for a
    tiled image is far smaller than the literal encoding)."""
    rng = np.random.default_rng(0)
    row = rng.integers(0, 256, (1, 40, 3), dtype=np.uint8)
    img = np.tile(row, (40, 1, 1))
    with_lz = encode_webp_lossless(img)
    without = encode_webp_lossless(img, use_lz77=False)
    _roundtrip(img)
    assert len(with_lz) < len(without) / 3


def test_container_errors():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"NOPE")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_webp_lossless(img))
    # flip the VP8L tag to VP8 (lossy): since round 8 this routes into
    # the real VP8 decoder, which rejects the VP8L payload as a
    # malformed VP8 stream instead of raising the old codec seam
    i = data.find(b"VP8L")
    data[i : i + 4] = b"VP8 "
    with pytest.raises(ValueError):
        decode_webp(bytes(data))
    # truncation raises, never corrupts silently
    full = encode_webp_lossless(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    with pytest.raises(ValueError):
        decode_webp(full[: len(full) - 2] + b"")


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31),
    kind=st.sampled_from(["noise", "smooth", "sparse"]),
)
def test_roundtrip_property(h, w, ch, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    elif kind == "smooth":
        base = rng.integers(0, 256, (1, w, ch), dtype=np.uint8)
        img = np.tile(base, (h, 1, 1))
    else:
        img = np.zeros((h, w, ch), dtype=np.uint8)
        n = max(1, (h * w) // 4)
        ys, xs = rng.integers(0, h, n), rng.integers(0, w, n)
        img[ys, xs] = rng.integers(0, 256, (n, ch), dtype=np.uint8)
    mode = int(rng.integers(0, 14))
    _roundtrip(img)
    _roundtrip(img, predictor_mode=mode, cache_bits=int(rng.integers(0, 8)))


def test_decode_image_dispatch():
    """multimodal.decode_image recognizes the RIFF/WEBP magic and
    returns the (h, w, 3) contract."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    out = decode_image(encode_webp_lossless(img, predictor_mode=2))
    assert out.shape == (11, 7, 3)
    assert np.array_equal(out, img)
