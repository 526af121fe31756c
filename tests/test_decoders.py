"""Real media decoders (container-feasible formats): PPM/BMP via pure
numpy parsing, WAV via stdlib wave; PIL/librosa seams raise clearly."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators.multimodal import (
    decode_audio,
    decode_image,
)


def _make_bmp(arr: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (bottom-up, BGR,
    4-byte-aligned rows) for roundtrip-testing the decoder."""
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = arr[r, :, ::-1].tobytes()  # RGB -> BGR
        pixel_bytes += row + b"\x00" * (row_size - len(row))
    off = 14 + 40
    size = off + len(pixel_bytes)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 0, 0, 0, 0)
    return header + dib + bytes(pixel_bytes)


def test_ppm_roundtrip():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = b"P6\n9 5\n255\n" + arr.tobytes()
    got = decode_image(payload)
    assert np.array_equal(got, arr)


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8)  # w=3 -> padded rows
    got = decode_image(_make_bmp(arr))
    assert np.array_equal(got, arr)


def test_wav_roundtrip_stereo():
    samples = (np.arange(24, dtype=np.int16) - 12).reshape(-1, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(samples.tobytes())
    got, sr = decode_audio(buf.getvalue())
    assert sr == 16000
    assert np.array_equal(got, samples)


def test_undecodable_formats_raise_seam():
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="audio library"):
        decode_audio(b"ID3\x04....")
    with pytest.raises(ValueError):
        decode_image(b"P6 garbage")


def test_spectral_features_match_numpy_reference(spark, sf_dir_small):
    """The FFT stage reports exactly the analytic dominant bin for
    bin-aligned sines, and the frame math matches the STFT params."""
    import numpy as np

    from sample_for_transactional_datalake_using_s3tables_spark.operators.multimodal import (
        _SPEC_HOP,
        _SPEC_N,
        _SPEC_WIN,
        multimodal_spectral_features,
    )

    rows = {
        r.doc_id: r
        for r in multimodal_spectral_features(spark, sf_dir_small).collect()
    }
    assert rows
    for d, r in list(rows.items())[:20]:
        k = d % 100 + 4
        assert r.dominant_bin == k
        assert r.dominant_freq == k * 8000 / _SPEC_N
        assert r.n_frames == (_SPEC_N - _SPEC_WIN) // _SPEC_HOP + 1
    # independent reference: rebuild one clip and FFT it with numpy
    d = next(iter(rows))
    k, amp = d % 100 + 4, d % 900 + 100
    t = np.arange(_SPEC_N)
    sig = np.round(amp * np.sin(2 * np.pi * k * t / _SPEC_N))
    ref_bin = int(np.argmax(np.abs(np.fft.rfft(sig))[1:])) + 1
    assert rows[d].dominant_bin == ref_bin
