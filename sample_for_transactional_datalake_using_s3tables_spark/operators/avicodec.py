"""MJPEG-in-AVI video container codec, stdlib + numpy only.

A real video path for the multimodal pipeline: the AVI (RIFF) container
with Motion-JPEG streams -- every frame is an ordinary JPEG payload, so
the from-scratch DCT/Huffman codec (operators/jpegcodec.py) does the
per-frame decode and this module does the container work: hdrl/avih/
strl/strh/strf headers, the movi chunk list, and the idx1 index. MJPEG
is the classic capture/editing codec (and the shape of a frame-sampled
training corpus: independent frames, no inter-frame state), which makes
it the one video format genuinely feasible -- and USEFUL -- without
ffmpeg. Inter-frame codecs (H.264/VP9/AV1) remain the documented
deployment seam.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality_flat: bool = True
) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an MJPEG AVI. Frames must
    share dimensions (multiples of 16: the JPEG encoder's 4:2:0 rule).
    ``quality_flat`` keeps the flat quant table so constant-gray frames
    survive bit-exactly (the analytic-oracle contract)."""
    from .jpegcodec import encode_jpeg_color

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        payloads.append(encode_jpeg_color(f))

    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0,
            len(frames), 0, -1, 0,  # quality -1 = default, samplesize 0
        )
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    index = []
    for p in payloads:
        # idx1 offsets are relative to the start of 'movi' (the kind
        # fourcc position), pointing at the chunk id
        index.append((len(movi_body) + 4, len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)
        for off, size in index
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes):
    """Decode an MJPEG AVI -> (frames [list of (h, w, 3) uint8], fps).
    Walks the RIFF tree, reads fps from avih, verifies the stream is
    MJPG (other codecs raise the ffmpeg seam), and decodes every 00dc
    chunk with the from-scratch JPEG decoder."""
    from .jpegcodec import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps = None
    codec = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps, codec
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                kind = buf[body_start:body_start + 4]
                walk(buf, body_start + 4, body_start + ln)
            elif cid == b"avih":
                (us,) = struct.unpack_from("<I", buf, body_start)
                fps = round(1_000_000 / us) if us else None
            elif cid == b"strh":
                if buf[body_start:body_start + 4] == b"vids":
                    codec = buf[body_start + 4:body_start + 8]
            elif cid[2:] == b"dc":
                frame = buf[body_start:body_start + ln]
                if codec not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"AVI codec {codec!r}: inter-frame video needs "
                        "ffmpeg (deployment seam)"
                    )
                arr = decode_jpeg(frame)
                if arr.ndim == 2:
                    arr = np.stack([arr] * 3, axis=-1)
                frames.append(arr)
            pos = body_start + ln + (ln & 1)

    walk(payload, 12, len(payload))
    if fps is None:
        raise ValueError("AVI missing avih header")
    return frames, fps


def sample_frames(
    frames: list[np.ndarray], every: int = 2
) -> list[np.ndarray]:
    """Frame sampling (the video-curation decimation stage)."""
    return frames[::every]
