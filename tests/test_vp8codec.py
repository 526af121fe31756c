"""VP8 intra-frame codec (operators/vp8codec.py, RFC 6386).

Evidence strategy (mirrors test_webpcodec.py's): the fixture encoder
tracks the DECODER-EXACT reconstruction through the same integer
inverse transforms, so ``decode(encode(img)) == tracked_recon`` is a
BIT-EXACT property over random images and parameter draws -- it pins
the boolean coder, partition layout, header fields, mode trees, token
contexts (incl. the skip-EOB rule), dequantization, the integer
IDCT/WHT, all intra predictors, and both loop filters, independently of
the placeholder default tables (see the module docstring's provenance
note). Flat images at qindex 0 additionally round-trip LOSSLESSLY
(DC-only residual, dequant step divides it), which is what lets the
multimodal battery's analytic mean-pixel oracle cover lossy WebP."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sample_for_transactional_datalake_using_s3tables_spark.operators.vp8codec import (
    BMODE_TREE,
    BoolDecoder,
    BoolEncoder,
    COEFF_BANDS,
    COEFF_TREE,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    ZIGZAG,
    decode_vp8 as _decode_vp8_guarded,
    encode_vp8,
    encode_webp_lossy,
    idct4x4,
    iwht4x4,
    rgb_to_yuv420,
    yuv420_to_rgb,
    _mb_filter,
    _simple_filter,
    _subblock_filter,
)
from sample_for_transactional_datalake_using_s3tables_spark.operators.webpcodec import (
    decode_webp,
)

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



def decode_vp8(data):
    """Fixture round-trips decode their own encoder's streams, so the
    placeholder-table opt-in is the point here (the guard itself is
    tested in test_placeholder_guard_*)."""
    return _decode_vp8_guarded(data, allow_placeholder_tables=True)

FAST = settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# -- boolean coder ----------------------------------------------------------


@given(
    bits=st.lists(
        st.tuples(st.integers(1, 254), st.integers(0, 1)),
        min_size=1, max_size=400,
    )
)
@FAST
def test_bool_coder_roundtrip(bits):
    e = BoolEncoder()
    for p, v in bits:
        e.bool(p, v)
    d = BoolDecoder(e.getvalue())
    assert [d.bool(p) for p, _ in bits] == [v for _, v in bits]


@given(vals=st.lists(st.integers(0, 255), min_size=1, max_size=64))
@FAST
def test_bool_literals_roundtrip(vals):
    e = BoolEncoder()
    for v in vals:
        e.literal(v, 8)
    d = BoolDecoder(e.getvalue())
    assert [d.literal(8) for _ in vals] == vals


@given(leaves=st.lists(st.integers(0, 4), min_size=1, max_size=100))
@FAST
def test_tree_roundtrip(leaves):
    e = BoolEncoder()
    for m in leaves:
        e.tree(KF_YMODE_TREE, KF_YMODE_PROBS, m)
    d = BoolDecoder(e.getvalue())
    assert [d.tree(KF_YMODE_TREE, KF_YMODE_PROBS) for _ in leaves] == leaves


# -- exact transform identities --------------------------------------------


def test_idct_dc_only_is_flat():
    for dc in (-400, -8, 0, 8, 120, 1000):
        b = np.zeros((4, 4), dtype=np.int64)
        b[0, 0] = 8 * dc
        assert (idct4x4(b) == dc).all()


def test_iwht_dc_only_is_flat():
    b = np.zeros((4, 4), dtype=np.int64)
    b[0, 0] = 64 * 5
    assert (iwht4x4(b) == 40).all()


def test_tables_are_well_formed():
    assert sorted(ZIGZAG) == list(range(16))
    assert len(COEFF_BANDS) == 16 and max(COEFF_BANDS) == 7
    assert len(COEFF_TREE) == 22  # 12 tokens -> 11 internal nodes
    assert len(BMODE_TREE) == 18  # 10 sub-modes


# -- bit-exact decode == tracked reconstruction ----------------------------


def _planes(rng, h, w):
    return (
        rng.randint(0, 256, (h, w), dtype=np.uint8),
        rng.randint(0, 256, (h // 2, w // 2), dtype=np.uint8),
        rng.randint(0, 256, (h // 2, w // 2), dtype=np.uint8),
    )


@given(
    seed=st.integers(0, 10_000),
    q=st.integers(0, 127),
    mode_mix=st.booleans(),
    use_bpred=st.booleans(),
    nparts=st.sampled_from([1, 2, 4]),
)
@settings(max_examples=15, deadline=None)
def test_decode_matches_tracked_recon(seed, q, mode_mix, use_bpred, nparts):
    rng = np.random.RandomState(seed)
    y, u, v = _planes(rng, 32, 48)
    data, ry, ru, rv = encode_vp8(
        y, u, v, qindex=q, mode_mix=mode_mix, use_bpred=use_bpred,
        n_partitions=nparts,
    )
    f = decode_vp8(data)
    assert (f.y == ry).all() and (f.u == ru).all() and (f.v == rv).all()


@given(
    seed=st.integers(0, 10_000),
    ftype=st.integers(0, 1),
    level=st.integers(1, 63),
    sharp=st.integers(0, 7),
)
@settings(max_examples=10, deadline=None)
def test_loop_filtered_decode_matches(seed, ftype, level, sharp):
    rng = np.random.RandomState(seed)
    y, u, v = _planes(rng, 32, 32)
    data, ry, ru, rv = encode_vp8(
        y, u, v, qindex=60, filter_type=ftype, filter_level=level,
        sharpness=sharp, mode_mix=True,
    )
    f = decode_vp8(data)
    assert (f.y == ry).all() and (f.u == ru).all() and (f.v == rv).all()


def test_segments_and_prob_updates_bitexact():
    rng = np.random.RandomState(4)
    y, u, v = _planes(rng, 48, 64)
    smap = [[(x + yy) % 4 for x in range(4)] for yy in range(3)]
    data, ry, ru, rv = encode_vp8(
        y, u, v, qindex=50, segment_map=smap, seg_q=(0, -12, 15, 30),
        prob_updates={(0, 0, 0, 0): 200, (3, 7, 2, 10): 17, (1, 2, 1, 4): 90},
    )
    f = decode_vp8(data)
    assert (f.y == ry).all() and (f.u == ru).all() and (f.v == rv).all()


def test_non_mb_multiple_dims_crop():
    rng = np.random.RandomState(8)
    y = rng.randint(0, 256, (19, 37), dtype=np.uint8)
    u = rng.randint(0, 256, (10, 19), dtype=np.uint8)
    v = rng.randint(0, 256, (10, 19), dtype=np.uint8)
    data, ry, ru, rv = encode_vp8(y, u, v, qindex=10)
    f = decode_vp8(data)
    assert f.y.shape == (19, 37) and f.u.shape == (10, 19)
    assert (f.y == ry).all() and (f.u == ru).all() and (f.v == rv).all()


# -- lossless flat path + quantization error bound --------------------------


@given(val=st.integers(0, 255), w=st.integers(2, 40), h=st.integers(2, 24))
@FAST
def test_flat_image_lossless_at_q0(val, w, h):
    rgb = np.full((h, w, 3), val, dtype=np.uint8)
    out = decode_webp(encode_webp_lossy(rgb, qindex=0))
    assert out.shape == (h, w, 4)
    assert (out[..., :3] == val).all() and (out[..., 3] == 255).all()


def test_gray_noise_error_bounded_by_dequant_step():
    """At qindex 0 every dequant factor is 4, so the per-coefficient
    error is at most half a step: |recon - src| <= 2 on gray inputs
    (no chroma content -> no subsampling loss)."""
    g = np.random.RandomState(1).randint(0, 256, (32, 32), dtype=np.uint8)
    rgb = np.stack([g, g, g], -1)
    out = decode_webp(encode_webp_lossy(rgb, qindex=0))[..., :3]
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_quality_degrades_monotonically_in_psnr():
    rng = np.random.RandomState(3)
    y, u, v = _planes(rng, 32, 32)
    psnrs = []
    for q in (0, 40, 90, 127):
        data, ry, _u, _v = encode_vp8(y, u, v, qindex=q)
        mse = np.mean((ry.astype(float) - y.astype(float)) ** 2)
        psnrs.append(10 * np.log10(255**2 / max(mse, 1e-9)))
    assert psnrs == sorted(psnrs, reverse=True)
    assert psnrs[0] > 45 and psnrs[-1] < 30


# -- loop filter unit vectors (hand-computed from 15.2/15.3) ----------------


def test_mb_filter_hand_vector():
    """p=[120]*4, q=[136]*4, interior=20, edge=64, hev_t=1:
    w = c(-16 + 48) = 32 -> taps 27/18/9 give +-7, +-4, +-2."""
    px = [v - 128 for v in (120, 120, 120, 120, 136, 136, 136, 136)]
    _mb_filter(px, 1, 20, 64)
    assert [v + 128 for v in px] == [120, 122, 124, 127, 129, 132, 134, 136]


def test_mb_filter_rejects_past_edge_limit():
    px = [v - 128 for v in (120, 120, 100, 100, 160, 160, 160, 160)]
    before = list(px)
    _mb_filter(px, 1, 5, 30)  # |p0-q0|*2 = 120 > 30
    assert px == before


def test_subblock_filter_flat_noop():
    px = [0] * 8
    _subblock_filter(px, 1, 10, 40)
    assert px == [0] * 8


def test_subblock_filter_hand_vector():
    """p1=124 p0=126 q0=130 q1=132 (signed -4,-2,2,4), hev_t=3 -> no
    hev, so the outer c(p1-q1) tap is DROPPED: a = c(0 + 3*4) = 12;
    F1 = c(12+4)>>3 = 2 (q0 -= 2); F2 = c(12+3)>>3 = 1 (p0 += 1);
    outer a = (F1+1)>>1 = 1: q1 -= 1, p1 += 1."""
    px = [v - 128 for v in (124, 124, 124, 126, 130, 132, 132, 132)]
    _subblock_filter(px, 3, 20, 60)
    assert [v + 128 for v in px] == [124, 124, 125, 127, 128, 131, 132, 132]


def test_simple_filter_hand_vector():
    px = [v - 128 for v in (124, 126, 130, 132)]
    _simple_filter(px, 60)
    assert [v + 128 for v in px] == [124, 126, 129, 132]


# -- color conversion --------------------------------------------------------


@given(val=st.integers(0, 255))
@FAST
def test_gray_yuv_roundtrip_exact(val):
    rgb = np.full((4, 6, 3), val, dtype=np.uint8)
    y, u, v = rgb_to_yuv420(rgb)
    assert (y == val).all() and (u == 128).all() and (v == 128).all()
    assert (yuv420_to_rgb(y, u, v) == val).all()


def test_yuv_roundtrip_bounded():
    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    # smooth 2x2 constancy -> subsample is exact, conversion error <= 2
    rgb = np.repeat(np.repeat(rgb[::2, ::2], 2, 0), 2, 1)
    y, u, v = rgb_to_yuv420(rgb)
    back = yuv420_to_rgb(y, u, v)
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2


# -- error handling + container routing -------------------------------------


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 4)
    rgb = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_webp_lossy(rgb, qindex=0)
    with pytest.raises(ValueError):
        decode_vp8(bytes(good[20:30]))  # bad start code
    # interframe flag set -> explicit refusal
    y = np.full((16, 16), 50, dtype=np.uint8)
    u = v = np.full((8, 8), 128, dtype=np.uint8)
    payload, *_ = encode_vp8(y, u, v)
    bad = bytes([payload[0] | 1]) + payload[1:]
    with pytest.raises(ValueError, match="key frame"):
        decode_vp8(bad)


def test_webp_container_routes_vp8_and_vp8l():
    from sample_for_transactional_datalake_using_s3tables_spark.operators.webpcodec import (
        encode_webp_lossless,
    )

    rgb = np.full((6, 10, 3), 123, dtype=np.uint8)
    lossy = decode_webp(encode_webp_lossy(rgb, qindex=0))
    lossless = decode_webp(encode_webp_lossless(rgb))
    assert (lossy[..., :3] == 123).all()
    assert (lossless[..., :3] == 123).all()


def test_spec_table_seam_roundtrip():
    """load_spec_tables swaps the placeholder blobs; self-consistency
    holds for ANY table values (encoder and decoder share them)."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import vp8codec as V

    old = (V.DEFAULT_COEFF_PROBS, V.COEFF_UPDATE_PROBS, V.KF_BMODE_PROBS)
    rng = np.random.RandomState(6)
    try:
        V.load_spec_tables(
            rng.randint(1, 255, (4, 8, 3, 11)),
            rng.randint(1, 255, (4, 8, 3, 11)),
            rng.randint(1, 255, (10, 10, 9)),
        )
        assert V.SPEC_TABLES_LOADED
        y, u, v = _planes(rng, 32, 32)
        data, ry, ru, rv = encode_vp8(y, u, v, qindex=30, mode_mix=True,
                                      use_bpred=True)
        # tables "loaded": no opt-in needed
        f = _decode_vp8_guarded(data)
        assert (f.y == ry).all() and (f.u == ru).all() and (f.v == rv).all()
    finally:
        V.DEFAULT_COEFF_PROBS, V.COEFF_UPDATE_PROBS, V.KF_BMODE_PROBS = old
        V.SPEC_TABLES_LOADED = False


def test_placeholder_guard_refuses_untagged_streams():
    """While the placeholder tables are loaded: a raw VP8 payload with
    no opt-in refuses loudly (naming load_spec_tables), and a WebP
    container WITHOUT the SGft fixture marker refuses likewise -- a
    third-party libwebp file must never silently mis-decode
    (ADVICE r9 #1 / VERDICT r8 #8)."""
    import struct

    rgb = np.full((8, 8, 3), 77, dtype=np.uint8)
    fixture = encode_webp_lossy(rgb, qindex=0)
    # direct payload, no opt-in
    (size,) = struct.unpack_from("<I", fixture, 16)
    payload = fixture[20 : 20 + size]
    with pytest.raises(ValueError, match="load_spec_tables"):
        _decode_vp8_guarded(payload)
    # container without the marker chunk (simulates third-party file)
    chunk = fixture[12 : 20 + size + (size & 1)]  # tag+len+payload+pad
    foreign = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert b"SGft" not in foreign
    with pytest.raises(ValueError, match="load_spec_tables"):
        decode_webp(foreign)
    # the marker-tagged fixture file flows
    out = decode_webp(fixture)
    assert (out[..., :3] == 77).all()


def test_placeholder_guard_refuses_cross_table_fixture_streams():
    """A fixture stream encoded under one table generation refuses to
    decode under another (SGft digest mismatch) -- in BOTH directions
    across a load_spec_tables swap."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import vp8codec as V

    rgb = np.full((8, 8, 3), 42, dtype=np.uint8)
    placeholder_era = encode_webp_lossy(rgb, qindex=0)
    old = (V.DEFAULT_COEFF_PROBS, V.COEFF_UPDATE_PROBS, V.KF_BMODE_PROBS)
    rng = np.random.RandomState(9)
    try:
        V.load_spec_tables(
            rng.randint(1, 255, (4, 8, 3, 11)),
            rng.randint(1, 255, (4, 8, 3, 11)),
            rng.randint(1, 255, (10, 10, 9)),
        )
        spec_era = encode_webp_lossy(rgb, qindex=0)
        assert (decode_webp(spec_era)[..., :3] == 42).all()
        with pytest.raises(ValueError, match="digest mismatch"):
            decode_webp(placeholder_era)  # old fixture, new tables
    finally:
        V.DEFAULT_COEFF_PROBS, V.COEFF_UPDATE_PROBS, V.KF_BMODE_PROBS = old
        V.SPEC_TABLES_LOADED = False
    with pytest.raises(ValueError, match="digest mismatch"):
        decode_webp(spec_era)  # new fixture, old tables
    assert (decode_webp(placeholder_era)[..., :3] == 42).all()


def test_truncated_partition_table_raises_valueerror():
    rng = np.random.RandomState(0)
    y = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    u = v = np.full((8, 8), 128, dtype=np.uint8)
    data, *_ = encode_vp8(y, u, v, n_partitions=4)
    # cut inside the 3*(n-1)-byte partition size table
    tmp = data[0] | (data[1] << 8) | (data[2] << 16)
    first_part = tmp >> 5
    cut = 10 + first_part + 2
    with pytest.raises(ValueError, match="partition size table"):
        decode_vp8(data[:cut])
