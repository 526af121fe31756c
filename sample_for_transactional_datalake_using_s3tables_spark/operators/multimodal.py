"""Multimodal-column operators: binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the media as an
opaque ``binary`` column with typed metadata columns alongside, and run
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages
(pandas UDFs are the sanctioned Python hot path -- row-at-a-time UDFs
are not).

Decode status: the common containers are decoded FOR REAL with the
stdlib + numpy -- PPM (P6), 24-bit BMP, PNG (zlib inflate + full
scanline de-filtering), animated GIF (full variable-width LZW, frame
composition), WAV (16-bit PCM), and baseline grayscale JPEG (canonical
Huffman + dequant + IDCT, ``jpegcodec.py``) -- each certified
end-to-end through the oracle gate (real binary synthesis -> Spark
binary column -> Arrow batch -> real parser -> features). What remains
behind the clearly-marked PIL/librosa/av seam: color/subsampled JPEG,
interlaced PNG/GIF, and compressed audio/video codecs. The
``multimodal_image_features``/``multimodal_audio_stats`` queries keep
exercising the batch plumbing with deterministic stand-in features.

``documents.text`` stands in for a media blob via utf-8 encoding in the
stub queries; the real-decode query synthesizes genuine PPM/WAV bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table, spread

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, channels int, n_frames int"
)
AUDIO_FEATURE_SCHEMA = "doc_id long, byte_len int, duration_ms long, pseudo_rms double"


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec section 8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_defilter(raw: bytes, offset: int, h: int, w: int, ch: int):
    """De-filter one filtered image (the whole picture, or one Adam7
    pass): returns the ((h, w*ch) uint8 array, bytes consumed).
    None/Sub/Up rows de-filter vectorized (cumsum over per-channel
    pixel groups / whole-row adds); Average and Paeth carry an in-row
    sequential dependency and fall back to a per-pixel loop for those
    rows only."""
    import numpy as np

    stride = w * ch
    need = h * (stride + 1)
    if len(raw) - offset < need:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        base = offset + r * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(
            raw, np.uint8, count=stride, offset=base + 1
        ).astype(np.int64)
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: add left neighbor -> per-channel cumsum
            rec = row.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif ftype == 2:  # Up
            rec = (row + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: in-row recurrence
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                if ftype == 3:
                    rec[i] = (row[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = rec
        prev = rec.astype(np.int64)
    return out, need


def _decode_png(payload: bytes):
    """REAL PNG decoding with the stdlib only: chunk walk, zlib
    inflate, and full scanline de-filtering (None/Sub/Up/Average/
    Paeth per the PNG spec). Supports 8-bit depth, greyscale / RGB /
    RGBA, both non-interlaced and Adam7-INTERLACED images (each of the
    seven passes is its own filtered sub-image, de-filtered against
    its own rows and scattered into the canvas on the pass grid)."""
    import struct
    import zlib

    import numpy as np

    pos, idat = len(_PNG_MAGIC), []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in (0, 2, 6) or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype} interlace={interlace}: only "
            "8-bit grey/RGB/RGBA supported without PIL"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        out, _ = _png_defilter(raw, 0, h, w, ch)
        px = out.reshape(h, w, ch)
    else:
        px = np.zeros((h, w, ch), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, used = _png_defilter(raw, offset, ph, pw, ch)
            offset += used
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[..., :3].copy()  # drop alpha for the (h, w, 3) contract


def decode_image(payload: bytes):
    """Decode an image payload to an ``(h, w, 3)`` uint8 array.

    REAL decoding for formats parsable without imaging libraries:
    PPM ``P6`` (header + raw RGB), uncompressed 24-bit BMP (BGR rows,
    bottom-up, 4-byte-aligned), 8-bit grey/RGB/RGBA PNG (stdlib zlib
    inflate + full scanline de-filtering, incl. Adam7), baseline AND
    progressive JPEG (grayscale + JFIF YCbCr color) via the real
    Huffman + dequant + IDCT in ``jpegcodec``, and strip-based TIFF
    (none/PackBits/LZW, both byte orders) via ``tiffcodec``."""
    import numpy as np

    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiffcodec import decode_tiff

        px = decode_tiff(payload)
        if px.ndim == 2:
            return np.repeat(px[..., None], 3, axis=2)
        return px
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        px = decode_jpeg(payload)  # progressive JPEG raises (PIL seam)
        if px.ndim == 2:
            return np.repeat(px[..., None], 3, axis=2)
        return px
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webpcodec import decode_webp

        return decode_webp(payload)[..., :3].copy()  # drop alpha
    if payload[:2] == b"P6":
        import re as _re

        m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if m is None:
            raise ValueError("malformed PPM header")
        w, h = int(m.group(1)), int(m.group(2))
        data = payload[m.end() : m.end() + w * h * 3]
        if len(data) < w * h * 3:
            raise ValueError("truncated PPM pixel data")
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if payload[:2] == b"BM":
        import struct

        off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        if bpp != 24:
            raise NotImplementedError("only uncompressed 24-bit BMP supported")
        row_size = (w * 3 + 3) & ~3
        rows = [
            np.frombuffer(payload, np.uint8, count=w * 3, offset=off + r * row_size)
            for r in range(abs(h))
        ]
        arr = np.stack(rows[::-1] if h > 0 else rows).reshape(abs(h), w, 3)
        return arr[..., ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(
        "unrecognized image container (PIL/torchvision deployment seam for "
        "formats beyond PPM/BMP/PNG/GIF/baseline-grayscale-JPEG)"
    )


def decode_audio(payload: bytes):
    """Decode a WAV or FLAC payload to ``(samples[frames, ch],
    sample_rate)`` -- REAL decoding via the from-scratch codecs:
    RIFF/WAVE (operators/audiocodec.py: PCM 8/16/24/32-bit, IEEE
    float32/64, G.711 mu-law / A-law, IMA ADPCM) and FLAC
    (operators/flaccodec.py: full lossless decode with CRC + MD5
    verification). Perceptual codecs (MP3/OGG/AAC) need librosa/av and
    raise."""
    if payload[:4] == b"fLaC":
        from .flaccodec import decode_flac

        samples, sr = decode_flac(payload)  # int32; bps=16 fits int16
        return samples.astype("int16"), sr
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            "compressed audio decoding requires an audio library not present "
            "in this environment (librosa/av deployment seam)"
        )
    from .audiocodec import parse_wav

    return parse_wav(payload)


def _image_feature_batches(batches: Iterator) -> Iterator:
    """STUB decoder: deterministic pseudo-features of the payload bytes
    (byte length driven), exercising real Arrow batch plumbing."""
    import pandas as pd

    for pdf in batches:
        bl = pdf["payload"].str.len().astype("int32")  # vectorized, not per-row
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": bl,
                "width": (bl % 640 + 1).astype("int32"),
                "height": ((bl * 7) % 480 + 1).astype("int32"),
                "channels": pd.Series([3] * len(pdf), dtype="int32"),
                "n_frames": (bl % 30 + 2).astype("int32"),
            }
        )


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload -> Arrow-batched mapInPandas feature extraction."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_image_feature_batches, IMAGE_FEATURE_SCHEMA)


MULTIMODAL_IMAGE_SQL = """
WITH p AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len FROM documents
)
SELECT doc_id, byte_len,
       byte_len % 640 + 1 AS width,
       (byte_len * 7) % 480 + 1 AS height,
       3 AS channels,
       byte_len % 30 + 2 AS n_frames
FROM p
"""


def _audio_feature_batches(batches: Iterator) -> Iterator:
    """STUB audio decode: duration from byte length at a fake 16 byte/ms
    rate; pseudo-RMS derived from md5 (hashlib md5 == engine md5)."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        bl = pdf["payload"].str.len()
        # md5 has no vectorized pandas form; acceptable inside the STUB
        # (a real decoder replaces this whole body)
        rms = pdf["payload"].apply(
            lambda b: (int(hashlib.md5(b).hexdigest()[:15], 16) % 1000) / 1000.0
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": bl.astype("int32"),
                "duration_ms": (bl * 1000 // 16).astype("int64"),
                "pseudo_rms": rms.astype("float64"),
            }
        )


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_audio_feature_batches, AUDIO_FEATURE_SCHEMA)


MULTIMODAL_AUDIO_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       CAST(octet_length(encode(text)) AS BIGINT) * 1000 // 16 AS duration_ms,
       (CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1000) / 1000.0 AS pseudo_rms
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for a (fake) video payload: every 5th frame index,
    pure Column expressions (sequence + explode -- no Python)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    n_frames = (F.octet_length(F.encode("text", "utf-8")) % 30 + 2).alias("n_frames")
    return (
        docs.select("doc_id", n_frames)
        .select(
            "doc_id",
            "n_frames",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("_fi"),
        )
        .select("doc_id", "n_frames", F.col("_fi").cast("int").alias("frame_idx"))
    )


MULTIMODAL_FRAME_SQL = """
WITH p AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) % 30 + 2 AS n_frames
  FROM documents
)
SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 5)) AS INTEGER) AS frame_idx
FROM p
"""


RESIZE_TARGET = 224  # canonical training-input edge
RESIZE_SCHEMA = (
    "doc_id long, orig_width int, orig_height int, "
    "target_width int, target_height int, scale_x double, scale_y double, "
    "resized_bytes long"
)


def _resize_batches(batches: Iterator) -> Iterator:
    """STUB resize: decode -> scale-to-224 -> re-encode, with the decode
    and re-encode steps replaced by deterministic functions of the
    payload (same pseudo-dims as the image-features stub). The Arrow
    batch plumbing, scale math, and output schema are the real pipeline
    shape a PIL/torchvision deployment plugs into."""
    import pandas as pd

    for pdf in batches:
        bl = pdf["payload"].str.len()
        w = (bl % 640 + 1).astype("int32")
        h = ((bl * 7) % 480 + 1).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "orig_width": w,
                "orig_height": h,
                "target_width": pd.Series([RESIZE_TARGET] * len(pdf), dtype="int32"),
                "target_height": pd.Series([RESIZE_TARGET] * len(pdf), dtype="int32"),
                # exact int/int division -> portable doubles
                "scale_x": RESIZE_TARGET / w.astype("float64"),
                "scale_y": RESIZE_TARGET / h.astype("float64"),
                "resized_bytes": pd.Series(
                    [RESIZE_TARGET * RESIZE_TARGET * 3] * len(pdf), dtype="int64"
                ),
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> resize -> re-encode plumbing over binary payloads."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_resize_batches, RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = f"""
WITH p AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len FROM documents
)
SELECT doc_id,
       byte_len % 640 + 1 AS orig_width,
       (byte_len * 7) % 480 + 1 AS orig_height,
       {RESIZE_TARGET} AS target_width,
       {RESIZE_TARGET} AS target_height,
       {RESIZE_TARGET} / CAST(byte_len % 640 + 1 AS DOUBLE) AS scale_x,
       {RESIZE_TARGET} / CAST((byte_len * 7) % 480 + 1 AS DOUBLE) AS scale_y,
       CAST({RESIZE_TARGET * RESIZE_TARGET * 3} AS BIGINT) AS resized_bytes
FROM p
"""


REAL_DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, mean_pixel double, "
    "wav_ms long, wav_peak int"
)


def encode_png(px, filters=(0, 1, 2)) -> bytes:
    """REAL PNG encoding with the stdlib: 8-bit RGB, one IDAT, scanline
    filters cycling through ``filters`` (exercising the decoder's
    None/Sub/Up paths in production queries; Average/Paeth are covered
    by targeted tests)."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = px.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for r in range(h):
        row = px[r].reshape(-1).astype(np.int64)
        f = filters[r % len(filters)]
        if f == 0:
            filt = row
        elif f == 1:
            shifted = np.concatenate([np.zeros(3, dtype=np.int64), row[:-3]])
            filt = (row - shifted) % 256
        else:
            filt = (row - prev) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _synthesize_media_batches(batches: Iterator) -> Iterator:
    """Stage 1: REAL media synthesis -- a genuine image (rotating by
    doc_id through zlib-compressed PNG, LZW-compressed TIFF, VP8L
    lossless WebP (predictor transform + color cache), raw PPM P6, and
    TTN2 JPEG-in-TIFF -- the scanned-document shape: per-strip
    abbreviated JPEG streams + a shared JPEGTables tag -- exercising
    five container decode paths end-to-end) and a genuine 16-bit PCM
    WAV per doc, parameterized by doc_id so the oracle can recompute
    the expected features analytically. The JPEG-TIFF rows use EVEN
    pixel values and multiple-of-8 dims so the flat-quant DCT
    roundtrip is exact (DC = 8*(val-128); /16 quantization is lossless
    for even val), keeping the oracle a pure formula."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    from .tiffcodec import encode_tiff

    for pdf in batches:
        imgs, auds = [], []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h, val = d % 8 + 2, d % 6 + 2, d % 256
            if d % 4 == 3:
                w, h, val = (d % 2 + 1) * 8, (d % 3 + 1) * 8, (d % 128) * 2
                px = np.full((h, w, 3), val, dtype=np.uint8)
                imgs.append(encode_tiff(px, compression="jpeg"))
            elif d % 3 == 0:
                px = np.full((h, w, 3), val, dtype=np.uint8)
                if d % 2:
                    # lossy WebP (VP8 intra, round 8): flat images
                    # reconstruct EXACTLY at qindex 0 (DC-only residual,
                    # dequant step divides it), so the mean-pixel
                    # formula oracle holds unchanged
                    from .vp8codec import encode_webp_lossy

                    imgs.append(encode_webp_lossy(px, qindex=0))
                else:
                    imgs.append(encode_png(px))
            elif d % 3 == 1:
                px = np.full((h, w, 3), val, dtype=np.uint8)
                imgs.append(encode_tiff(px, compression="lzw"))
            elif d % 2 == 0:
                # VP8L lossless WebP (predictor + color cache engaged):
                # lossless, so the oracle's mean-pixel formula holds
                from .webpcodec import encode_webp_lossless

                px = np.full((h, w, 3), val, dtype=np.uint8)
                imgs.append(
                    encode_webp_lossless(px, predictor_mode=2, cache_bits=4)
                )
            else:
                imgs.append(b"P6\n%d %d\n255\n" % (w, h) + bytes([val]) * (w * h * 3))
            n, amp = d % 64 + 8, d % 1000
            buf = io.BytesIO()
            with wave.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(8000)
                f.writeframes(np.full(n, amp, dtype=np.int16).tobytes())
            auds.append(buf.getvalue())
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "img": imgs, "aud": auds}
        )


def _real_decode_batches(batches: Iterator) -> Iterator:
    """Stage 2: REAL decoding of the binary columns through the actual
    parsers (decode_image / decode_audio) -- per-object Python inside an
    Arrow batch is the sanctioned decoder shape."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for d, img, aud in zip(pdf["doc_id"], pdf["img"], pdf["aud"]):
            arr = decode_image(bytes(img))
            samples, sr = decode_audio(bytes(aud))
            rows.append(
                (
                    int(d),
                    arr.shape[1],
                    arr.shape[0],
                    arr.shape[2],
                    float(arr.mean()),
                    len(samples) * 1000 // sr,
                    int(np.abs(samples).max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "channels",
                "mean_pixel", "wav_ms", "wav_peak",
            ],
        )


def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode end-to-end: synthesize genuine PPM + WAV payloads
    (stage 1), round-trip them through Spark ``binary`` columns and
    Arrow batches, then decode with the actual parsers (stage 2) and
    emit true image dims / mean pixel / audio duration / peak. The
    oracle recomputes every feature from the synthesis parameters, so a
    hash match certifies the real format encode -> binary column ->
    decode path, not a stub."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    media = docs.select("doc_id").mapInPandas(
        _synthesize_media_batches, "doc_id long, img binary, aud binary"
    )
    return media.mapInPandas(_real_decode_batches, REAL_DECODE_SCHEMA)


MULTIMODAL_REAL_DECODE_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 4 = 3 THEN (doc_id % 2 + 1) * 8
                 ELSE doc_id % 8 + 2 END AS INTEGER) AS width,
       CAST(CASE WHEN doc_id % 4 = 3 THEN (doc_id % 3 + 1) * 8
                 ELSE doc_id % 6 + 2 END AS INTEGER) AS height,
       3 AS channels,
       CAST(CASE WHEN doc_id % 4 = 3 THEN (doc_id % 128) * 2
                 ELSE doc_id % 256 END AS DOUBLE) AS mean_pixel,
       (doc_id % 64 + 8) * 1000 // 8000 AS wav_ms,
       CAST(doc_id % 1000 AS INTEGER) AS wav_peak
FROM documents
"""


# -- real animated-GIF codec (stdlib + numpy): LZW both directions --

_GIF_MIN_CODE = 8  # 256-entry palette -> 9-bit codes, CLEAR=256


def _lzw_encode(indices, min_code: int = _GIF_MIN_CODE) -> bytes:
    """GIF LZW bitstream for a pixel-index sequence. Emits literal
    codes with a CLEAR injected before the decoder's dictionary would
    force a code-width change -- a valid, deliberately simple encoding
    (the classic 'uncompressed GIF' technique), so the DECODER still
    exercises the full variable-width dictionary algorithm."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    seg_cap = clear - 3  # literals per segment before a width change
    acc = n_bits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(clear)
    for i, px in enumerate(indices):
        if i and i % seg_cap == 0:
            emit(clear)
        emit(int(px))
    emit(eoi)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int) -> bytearray:
    """Full GIF LZW decoder: variable code width (grows at dictionary
    size 2^width, capped at 12 bits), CLEAR resets, the KwKwK special
    case -- the real algorithm, not just the subset our encoder emits."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    acc = n_bits = pos = 0
    prev: bytes | None = None
    out = bytearray()
    while True:
        while n_bits < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(frames, delay_cs: int = 4) -> bytes:
    """REAL animated GIF (89a): global 256-color palette built from the
    frames, graphic-control extension per frame (delay in centisec),
    full-frame image descriptors, LZW-coded index streams."""
    import struct

    import numpy as np

    h, w, _ = frames[0].shape
    # palette: unique colors in first-appearance order
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(colors)}")
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
    out += palette.tobytes()
    n_px = h * w
    for fi, _frame in enumerate(frames):
        idx = inv[fi * n_px : (fi + 1) * n_px]
        out += bytes([0x21, 0xF9, 0x04, 0x00]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x00)
        out.append(_GIF_MIN_CODE)
        stream = _lzw_encode(idx)
        for i in range(0, len(stream), 255):
            block = stream[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0x00)
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes):
    """REAL animated-GIF decoding (stdlib + numpy): header + logical
    screen descriptor, global/local color tables, graphic-control
    delays + TRANSPARENCY (transparent-index pixels leave the prior
    canvas showing through -- the delta-encoded animation pattern),
    disposal methods 0/1 (leave) and 2 (restore background), per-frame
    sub-rect composition, full LZW. Each graphic-control extension
    applies to exactly the NEXT image, per spec. Returns
    ``(frames, delays_cs)`` with frames ``(h, w, 3)`` uint8. Interlaced
    images de-interlace (four-pass row scatter per GIF89a). Disposal 3
    (restore previous) raises (PIL seam)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg_index, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    # Compose in RGB, not palette indices: each frame's painted sub-rect
    # is resolved to colors through ITS OWN color table before merging,
    # so transparency show-through pixels keep the palette that painted
    # them even when later frames carry different local tables (and a
    # prior frame's index can never overrun a smaller local table).
    if global_table is not None and bg_index < len(global_table):
        bg_color = global_table[bg_index]
    else:
        bg_color = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = bg_color
    frames, delays = [], []
    delay, transparent, disposal = 0, None, 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            while True:
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                if label == 0xF9 and ln >= 4:
                    gce = payload[pos]
                    disposal = (gce >> 2) & 0x07
                    delay = struct.unpack_from("<H", payload, pos + 1)[0]
                    transparent = payload[pos + 3] if gce & 0x01 else None
                pos += ln
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, fp = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = global_table
        if fp & 0x80:
            n = 2 << (fp & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        interlaced = bool(fp & 0x40)
        if disposal == 3:
            raise NotImplementedError(
                "GIF disposal 'restore previous' needs PIL (seam)"
            )
        min_code = payload[pos]
        pos += 1
        stream = bytearray()
        while True:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            stream += payload[pos : pos + ln]
            pos += ln
        idx = np.frombuffer(
            bytes(_lzw_decode(bytes(stream), min_code)), dtype=np.uint8
        )[: fw * fh].reshape(fh, fw)
        if interlaced:
            # GIF89a interlace: rows stored in four passes
            # (0::8, 4::8, 2::4, 1::2) -- scatter back to display order
            deint = np.empty_like(idx)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                n = len(range(start, fh, step))
                deint[start::step] = idx[src:src + n]
                src += n
            idx = deint
        if table is None:
            raise ValueError("GIF frame without a color table")
        opaque = (
            np.ones_like(idx, dtype=bool)
            if transparent is None
            else idx != transparent
        )
        if idx[opaque].size and int(idx[opaque].max()) >= len(table):
            raise ValueError(
                f"GIF index {int(idx[opaque].max())} outside the "
                f"{len(table)}-entry color table"
            )
        region = canvas[top : top + fh, left : left + fw]
        region[opaque] = table[idx[opaque]]
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore the painted rect to background
            region[:] = bg_color
        # a graphic-control extension governs exactly one image
        delay, transparent, disposal = 0, None, 0
    return frames, delays


# -- real signal processing: FFT spectral features over genuine WAVs --

_SPEC_N = 256  # samples per clip (32 ms at 8 kHz)
_SPEC_SR = 8000
_SPEC_WIN, _SPEC_HOP = 64, 32

SPECTRAL_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, dominant_bin int, "
    "dominant_freq double, n_frames int"
)


def _synthesize_sine_batches(batches: Iterator) -> Iterator:
    """Genuine WAVs, each a pure sine placed EXACTLY on DFT bin
    ``doc_id %% 100 + 4`` of a 256-sample window (an integer number of
    periods -> no spectral leakage), amplitude ``doc_id %% 900 + 100``.
    The ENCODING rotates by doc_id: 16-bit PCM, G.711 mu-law, IMA
    ADPCM, A-law (operators/audiocodec.py), and FLAC
    (operators/flaccodec.py, lossless) -- the dominant DFT bin is
    invariant under companding/ADPCM quantization noise (>25 dB SNR on
    these amplitudes) and untouched by FLAC, so the SAME analytic
    oracle certifies every compressed decode path. Bin-aligned
    synthesis is what makes the downstream FFT features recomputable
    by the SQL oracle."""
    import numpy as np
    import pandas as pd

    from .audiocodec import encode_wav
    from .flaccodec import encode_flac

    codecs = ("pcm16", "ulaw", "ima_adpcm", "alaw", "flac")
    t = np.arange(_SPEC_N)
    for pdf in batches:
        wavs = []
        for d in pdf["doc_id"]:
            d = int(d)
            k, amp = d % 100 + 4, d % 900 + 100
            samples = np.round(
                amp * np.sin(2.0 * np.pi * k * t / _SPEC_N)
            ).astype(np.int16)
            codec = codecs[d % 5]
            wavs.append(
                encode_flac(samples, _SPEC_SR, use_lpc=d % 2 == 0)
                if codec == "flac"
                else encode_wav(samples, _SPEC_SR, codec=codec)
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "aud": wavs}
        )


def _spectral_batches(batches: Iterator) -> Iterator:
    """REAL DSP on executors: decode the WAV (stdlib), run a numpy
    ``rfft``, report the dominant frequency bin and the STFT frame
    count (win=64, hop=32). Per-clip numpy inside an Arrow batch -- the
    sanctioned decoder shape; at 100 TB this is the embarrassingly
    parallel map stage of an audio-curation pipeline."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for d, aud in zip(pdf["doc_id"], pdf["aud"]):
            samples, sr = decode_audio(bytes(aud))
            mono = samples[:, 0].astype(np.float64)
            n = len(mono)
            spec = np.abs(np.fft.rfft(mono))
            k = int(np.argmax(spec[1:])) + 1  # skip DC
            rows.append(
                (
                    int(d), n, sr, k, k * sr / n,
                    (n - _SPEC_WIN) // _SPEC_HOP + 1,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "sample_rate", "dominant_bin",
                "dominant_freq", "n_frames",
            ],
        )


def multimodal_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio DSP end-to-end: synthesize bin-aligned sine WAVs,
    round-trip through Spark ``binary`` columns, decode with the stdlib
    parser and extract FFT spectral features with numpy -- all inside
    Arrow ``mapInPandas`` stages. The oracle recomputes every feature
    from the synthesis parameters (dominant bin/freq are exact because
    the sine sits on a DFT bin and 8000/256 = 31.25 is binary-exact),
    so a hash match certifies genuine encode -> decode -> FFT math,
    not byte-length arithmetic."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    wavs = docs.select("doc_id").mapInPandas(
        _synthesize_sine_batches, "doc_id long, aud binary"
    )
    return wavs.mapInPandas(_spectral_batches, SPECTRAL_SCHEMA)


MULTIMODAL_SPECTRAL_SQL = """
SELECT doc_id,
       256 AS n_samples,
       8000 AS sample_rate,
       CAST(doc_id % 100 + 4 AS INTEGER) AS dominant_bin,
       CAST((doc_id % 100 + 4) * 31.25 AS DOUBLE) AS dominant_freq,
       7 AS n_frames
FROM documents
"""


JPEG_SCHEMA = "doc_id long, width int, height int, mean_pixel double"


def _synthesize_jpeg_batches(batches: Iterator) -> Iterator:
    """Genuine baseline JPEGs (real DCT + quantization + canonical
    Huffman), constant EVEN sample value ``(doc_id %% 120)*2 + 8`` so
    the lossy pipeline is exactly invertible (the DC coefficient of a
    constant block divides the flat quant step) and the oracle can
    recompute the decoded mean analytically. Every THIRD payload is a
    COLOR JPEG (JFIF YCbCr, 4:2:0 chroma subsampling, 16-multiple
    dims) of the same constant gray -- the YCbCr transform is identity
    on R=G=B, so the color path is bit-exact too and the SAME oracle
    certifies it. Every FIFTH payload is PROGRESSIVE (SOF2: multi-scan
    spectral selection + successive approximation), gray or color per
    the same %3 split -- identical quantized coefficients mean the
    decoded pixels (and the oracle) are unchanged, so a hash match
    certifies the progressive scan machinery too."""
    import numpy as np
    import pandas as pd

    from .jpegcodec import (
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    for pdf in batches:
        jpegs = []
        for d in pdf["doc_id"]:
            d = int(d)
            v = (d % 120) * 2 + 8
            progressive = d % 5 == 0
            if d % 3 == 0:
                w, h = (d % 2 + 1) * 16, (d % 3 + 1) * 16
                img = np.full((h, w, 3), v, dtype=np.uint8)
                jpegs.append(
                    encode_jpeg_progressive(img)
                    if progressive
                    else encode_jpeg_color(img)
                )
            else:
                w, h = (d % 4 + 1) * 8, (d % 3 + 1) * 8
                img = np.full((h, w), v, dtype=np.uint8)
                jpegs.append(
                    encode_jpeg_progressive(img)
                    if progressive
                    else encode_jpeg_gray(img)
                )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "jpg": jpegs}
        )


def _jpeg_decode_batches(batches: Iterator) -> Iterator:
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for d, jpg in zip(pdf["doc_id"], pdf["jpg"]):
            arr = decode_image(bytes(jpg))  # (h, w, 3) via the JPEG path
            rows.append(
                (int(d), arr.shape[1], arr.shape[0], float(arr.mean()))
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "mean_pixel"]
        )


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG decode end-to-end: real DCT/quant/Huffman encode,
    binary-column round trip, real entropy+IDCT decode on executors.
    Bin-exact synthesis (constant even-valued blocks under a flat quant
    table) makes the decoded features analytically recomputable, so the
    oracle hash certifies the actual JPEG math."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    jpgs = docs.select("doc_id").mapInPandas(
        _synthesize_jpeg_batches, "doc_id long, jpg binary"
    )
    return jpgs.mapInPandas(_jpeg_decode_batches, JPEG_SCHEMA)


MULTIMODAL_JPEG_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 2 + 1) * 16
                 ELSE (doc_id % 4 + 1) * 8 END AS INTEGER) AS width,
       CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 3 + 1) * 16
                 ELSE (doc_id % 3 + 1) * 8 END AS INTEGER) AS height,
       CAST((doc_id % 120) * 2 + 8 AS DOUBLE) AS mean_pixel
FROM documents
"""


GIF_FRAME_SCHEMA = (
    "doc_id long, n_frames int, n_sampled int, first_mean double, "
    "last_mean double, total_delay_cs long"
)


def _synthesize_gif_batches(batches: Iterator) -> Iterator:
    """Genuine animated GIFs: ``doc_id % 5 + 2`` solid-grey full frames
    (frame f's value = ``(doc_id + 17*f) % 256``), LZW-encoded with a
    256-entry global palette, 4 cs delay per frame."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        gifs = []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h, nf = d % 8 + 2, d % 6 + 2, d % 5 + 2
            frames = [
                np.full((h, w, 3), (d + 17 * f) % 256, dtype=np.uint8)
                for f in range(nf)
            ]
            gifs.append(encode_gif(frames))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "gif": gifs}
        )


def _gif_frame_batches(batches: Iterator) -> Iterator:
    """REAL multi-frame decode + frame sampling on executors: full LZW
    GIF decode, then sample every 2nd frame -- the video-curation
    frame-extraction stage with a real container format."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for d, gif in zip(pdf["doc_id"], pdf["gif"]):
            frames, delays = decode_gif(bytes(gif))
            sampled = frames[::2]
            rows.append(
                (
                    int(d),
                    len(frames),
                    len(sampled),
                    float(np.mean(frames[0])),
                    float(np.mean(frames[-1])),
                    int(sum(delays)),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "n_sampled", "first_mean",
                "last_mean", "total_delay_cs",
            ],
        )


def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF frame extraction end-to-end: synthesize genuine
    LZW-coded multi-frame GIFs, round-trip through binary columns, and
    decode every frame with the real codec (variable-width LZW,
    graphic-control delays, canvas composition) before sampling. The
    oracle recomputes all features from the synthesis parameters, so a
    hash match certifies true multi-frame container decode -- the video
    path of a training-data pipeline with the decoder seam actually
    filled."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    gifs = docs.select("doc_id").mapInPandas(
        _synthesize_gif_batches, "doc_id long, gif binary"
    )
    return gifs.mapInPandas(_gif_frame_batches, GIF_FRAME_SCHEMA)


MULTIMODAL_GIF_SQL = """
SELECT doc_id,
       CAST(doc_id % 5 + 2 AS INTEGER) AS n_frames,
       CAST((doc_id % 5 + 2 + 1) // 2 AS INTEGER) AS n_sampled,
       CAST(doc_id % 256 AS DOUBLE) AS first_mean,
       CAST((doc_id + 17 * (doc_id % 5 + 1)) % 256 AS DOUBLE) AS last_mean,
       4 * (doc_id % 5 + 2) AS total_delay_cs
FROM documents
"""


VIDEO_FRAME_SCHEMA = (
    "doc_id long, n_frames int, fps int, n_sampled int, "
    "first_mean double, last_mean double"
)


def _synthesize_avi_batches(batches: Iterator) -> Iterator:
    """Genuine MJPEG AVIs: ``doc_id % 4 + 2`` constant-even-gray
    frames (frame f's value = ``(doc_id*2 + 34*f) % 256``, always even
    so the flat-quant JPEG pipeline is exactly invertible), RIFF
    hdrl/movi/idx1 container, fps = ``doc_id % 20 + 5``."""
    import numpy as np
    import pandas as pd

    from .avicodec import encode_avi_mjpeg

    for pdf in batches:
        avis = []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h, nf = (d % 2 + 1) * 16, (d % 3 + 1) * 16, d % 4 + 2
            frames = [
                np.full((h, w, 3), (d * 2 + 34 * f) % 256, dtype=np.uint8)
                for f in range(nf)
            ]
            avis.append(encode_avi_mjpeg(frames, fps=d % 20 + 5))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "avi": avis}
        )


def _avi_frame_batches(batches: Iterator) -> Iterator:
    """REAL container + codec decode on executors: RIFF walk, per-frame
    JPEG entropy/IDCT decode, then every-2nd-frame sampling -- the
    video-curation frame-extraction stage with a true video
    container."""
    import numpy as np
    import pandas as pd

    from .avicodec import decode_avi_mjpeg, sample_frames

    for pdf in batches:
        rows = []
        for d, avi in zip(pdf["doc_id"], pdf["avi"]):
            frames, fps = decode_avi_mjpeg(bytes(avi))
            sampled = sample_frames(frames, 2)
            rows.append(
                (
                    int(d), len(frames), fps, len(sampled),
                    float(frames[0].mean()), float(frames[-1].mean()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "fps", "n_sampled",
                "first_mean", "last_mean",
            ],
        )


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-AVI frame extraction end-to-end: synthesize genuine RIFF
    video containers whose frames are real JPEG payloads, round-trip
    through binary columns, decode container + every frame with the
    from-scratch codecs, and frame-sample. Constant even-gray frames
    under the flat quant table decode bit-exactly, so the oracle
    recomputes every feature analytically -- a hash match certifies a
    TRUE video-container decode path (the step up from the GIF frame
    query toward the ffmpeg seam)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    avis = docs.select("doc_id").mapInPandas(
        _synthesize_avi_batches, "doc_id long, avi binary"
    )
    return avis.mapInPandas(_avi_frame_batches, VIDEO_FRAME_SCHEMA)


MULTIMODAL_VIDEO_SQL = """
SELECT doc_id,
       CAST(doc_id % 4 + 2 AS INTEGER) AS n_frames,
       CAST(doc_id % 20 + 5 AS INTEGER) AS fps,
       CAST((doc_id % 4 + 2 + 1) // 2 AS INTEGER) AS n_sampled,
       CAST(doc_id * 2 % 256 AS DOUBLE) AS first_mean,
       CAST((doc_id * 2 + 34 * (doc_id % 4 + 1)) % 256 AS DOUBLE) AS last_mean
FROM documents
"""


WEBDATASET_SCHEMA = (
    "doc_id long, n_files int, text_md5 string, jpg_mean double, "
    "meta_ok boolean"
)


def _build_shard_batches(key, pdf):
    """One WebDataset tar shard per group: every doc becomes a sample
    (``<key>.txt`` + ``<key>.jpg`` + ``<key>.json``), members laid out
    sample-contiguously. Runs as applyInPandas -- the distributed
    shard-building stage of corpus packaging."""
    import json as _json

    import numpy as np
    import pandas as pd

    from ..sources.webdataset import encode_tar_shard
    from .jpegcodec import encode_jpeg_gray

    samples = {}
    for d, text in zip(pdf["doc_id"], pdf["text"]):
        d = int(d)
        v = (d % 120) * 2 + 8
        w, h = (d % 4 + 1) * 8, (d % 3 + 1) * 8
        samples[f"{d:012d}"] = {
            "txt": str(text).encode(),
            "jpg": encode_jpeg_gray(np.full((h, w), v, dtype=np.uint8)),
            "json": _json.dumps({"doc_id": d, "v": v}).encode(),
        }
    return pd.DataFrame(
        {"shard_id": [int(key[0])], "shard": [encode_tar_shard(samples)]}
    )


def _parse_shard_batches(batches: Iterator) -> Iterator:
    """Distributed shard consumption: stream samples out of each tar
    (shard-sequential, the WebDataset read shape), decode every member
    with the real codecs, emit per-sample features."""
    import hashlib
    import json as _json

    import pandas as pd

    from ..sources.webdataset import iter_samples
    from .jpegcodec import decode_jpeg

    for pdf in batches:
        rows = []
        for shard in pdf["shard"]:
            for skey, files in iter_samples(bytes(shard)):
                d = int(skey)
                meta = _json.loads(files["json"])
                px = decode_jpeg(files["jpg"])
                rows.append(
                    (
                        d,
                        len(files),
                        hashlib.md5(files["txt"]).hexdigest(),
                        float(px.mean()),
                        meta.get("doc_id") == d
                        and meta.get("v") == float(px.mean()),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_files", "text_md5", "jpg_mean", "meta_ok",
            ],
        )


def multimodal_webdataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard packaging round trip (the de-facto
    multimodal training-corpus format): build shards DISTRIBUTED (one
    per hash group, one .txt/.jpg/.json sample per doc), then consume
    them shard-sequentially with the real tar reader + JPEG decoder.
    ``text_md5`` must equal md5 of the original document text and the
    JPEG mean must hit the analytic constant, so the oracle certifies
    the pack -> shard -> stream-unpack -> decode chain end to end."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    shards = (
        docs.select("doc_id", "text")
        .groupBy((F.col("doc_id") % 61).alias("shard_id"))
        .applyInPandas(_build_shard_batches, "shard_id long, shard binary")
    )
    return shards.mapInPandas(_parse_shard_batches, WEBDATASET_SCHEMA)


MULTIMODAL_WEBDATASET_SQL = """
SELECT doc_id, 3 AS n_files, md5(text) AS text_md5,
       CAST((doc_id % 120) * 2 + 8 AS DOUBLE) AS jpg_mean,
       TRUE AS meta_ok
FROM documents
"""


QUERIES = {
    "multimodal_image_features": multimodal_image_features,
    "multimodal_real_decode": multimodal_real_decode,
    "multimodal_gif_frames": multimodal_gif_frames,
    "multimodal_video_frames": multimodal_video_frames,
    "multimodal_webdataset": multimodal_webdataset,
    "multimodal_jpeg_decode": multimodal_jpeg_decode,
    "multimodal_spectral_features": multimodal_spectral_features,
    "multimodal_audio_stats": multimodal_audio_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
}

ORACLES = {
    "multimodal_image_features": MULTIMODAL_IMAGE_SQL,
    "multimodal_real_decode": MULTIMODAL_REAL_DECODE_SQL,
    "multimodal_gif_frames": MULTIMODAL_GIF_SQL,
    "multimodal_video_frames": MULTIMODAL_VIDEO_SQL,
    "multimodal_webdataset": MULTIMODAL_WEBDATASET_SQL,
    "multimodal_jpeg_decode": MULTIMODAL_JPEG_SQL,
    "multimodal_spectral_features": MULTIMODAL_SPECTRAL_SQL,
    "multimodal_audio_stats": MULTIMODAL_AUDIO_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
}
