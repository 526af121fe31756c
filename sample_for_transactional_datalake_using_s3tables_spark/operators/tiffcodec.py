"""TIFF codec (baseline 8-bit grayscale/RGB), stdlib + numpy only.

Real TIFF 6.0: both byte orders (II/MM), IFD tag parsing, strip-based
layout, and four compressions -- none, PackBits (the TIFF RLE), Adobe
deflate (zlib streams per strip), and TIFF-flavor LZW (variable
9..12-bit codes, MSB-first packing, ClearCode/EOI, EARLY code-width
change -- the detail that distinguishes TIFF LZW from GIF LZW). The
encoder writes little-endian strip-per-8-rows files in any of them,
so decode(encode(x)) == x exactly (lossless) and every roundtrip is a
bit-exact oracle; a hand-built big-endian fixture pins the MM read
path.

Reference behavior re-expressed: media as opaque binary columns;
decode is the analytics-side capability of a training-data pipeline
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_JPEG_TABLES = 347  # TTN2 shared DQT/DHT (abbreviated streams)
_TAG_JPEG_IF = 513  # old-style (comp 6) full interchange stream
_TAG_JPEG_IF_LEN = 514

_COMP_NONE = 1
_COMP_OLDJPEG = 6  # deprecated TIFF 6.0 JPEG (decode-only here)
_COMP_JPEG = 7  # TTN2 "new-style": JPEG streams per strip
_COMP_DEFLATE = 8  # zlib streams per strip (Adobe deflate)
_COMP_LZW = 5
_COMP_PACKBITS = 32773


# -- JPEG stream surgery (TIFF Technical Note 2) --
#
# TTN2 compression=7 allows the DQT/DHT table segments to live ONCE in
# the JPEGTables tag while every strip carries an ABBREVIATED stream
# (SOI + frame/scan, no tables); a reader splices tables + strip back
# into one interchange stream. The splitter below is marker-level only
# -- it never touches entropy-coded bytes.


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full interchange stream -> (tables_stream, abbreviated_stream).
    tables = SOI + every DQT segment + EOI; abbreviated = the stream
    with its DQT segments removed (DHT stays per-strip: the encoder
    derives canonical Huffman tables from each strip's own symbol
    statistics, which TTN2 permits -- strip-local tables augment the
    shared ones)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables, body, pos = bytearray(), bytearray(b"\xff\xd8"), 2
    while pos < len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows through EOI
            body += stream[pos:]
            break
        (seg_len,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos: pos + 2 + seg_len]
        (tables if marker == 0xDB else body).extend(seg)
        pos += 2 + seg_len
    return bytes(b"\xff\xd8" + tables + b"\xff\xd9"), bytes(body)


def _join_jpeg_tables(tables: bytes, abbreviated: bytes) -> bytes:
    """Inverse splice: insert the tables stream's segments (between its
    SOI and EOI) right after the abbreviated stream's SOI."""
    if not tables:
        return abbreviated
    return b"\xff\xd8" + tables[2:-2] + abbreviated[2:]


# -- PackBits (TIFF RLE) --


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # run of >= 2 identical bytes?
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of (j - i + 1) identical
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal segment up to the next run (or 128 bytes)
        j = i
        while (
            j + 1 < n
            and not (j + 2 < n and data[j + 1] == data[j + 2])
            and j - i < 127
        ):
            j += 1
        out.append(j - i)
        out += data[i:j + 1]
        i = j + 1
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop
    return bytes(out[:expected])


# -- TIFF-flavor LZW (early change) --


class _MSBBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0


_CLEAR = 256
_EOI = 257


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW: starts at 9 bits, grows one bit EARLY (when the NEXT
    code to be assigned would no longer fit), resets at 4094 entries
    with a ClearCode."""
    bw = _MSBBitWriter()

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, nxt, width = fresh()
    bw.write(_CLEAR, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        wc = w + c
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        table[wc] = nxt
        nxt += 1
        # EARLY change: width grows when nxt == 2^width - 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:
            bw.write(_CLEAR, width)
            table, nxt, width = fresh()
        w = c
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    bw.flush()
    return bytes(bw.out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    acc = 0
    nbits = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def read_code():
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return _EOI
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return v

    while len(out) < expected:
        code = read_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # the decoder's table lags the encoder's by ONE entry (it adds
        # code k only after reading code k+1), so it must widen at
        # 2^w - 2 where the encoder widened at 2^w - 1 -- the libtiff
        # MAXCODE(n)-1 rule that defines TIFF's early change
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


# -- container --


def encode_tiff(
    px: np.ndarray, compression: str = "none", rows_per_strip: int = 8
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as little-endian
    strip-based TIFF. ``compression``: 'none'|'packbits'|'lzw'|
    'deflate'|'jpeg' (TTN2 new-style: per-strip abbreviated JPEG
    streams, shared DQT in a JPEGTables tag; needs multiple-of-8 dims
    and rows_per_strip, matching the from-scratch JPEG codec; color
    encodes 4:4:4, and the pixel payload is DCT-quantized like any
    JPEG -- the container roundtrip is exact vs the plain-JPEG path)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    comp = {"none": _COMP_NONE, "packbits": _COMP_PACKBITS,
            "lzw": _COMP_LZW, "deflate": _COMP_DEFLATE,
            "jpeg": _COMP_JPEG}[compression]
    jpeg_tables = b""
    if comp == _COMP_JPEG and (
        h % 8 or w % 8 or rows_per_strip % 8
    ):
        raise ValueError("TIFF-JPEG needs multiple-of-8 dims and strips")
    strips = []
    for r0 in range(0, h, rows_per_strip):
        if comp == _COMP_JPEG:
            from .jpegcodec import encode_jpeg_color, encode_jpeg_gray

            band = px[r0:r0 + rows_per_strip]
            full = (
                encode_jpeg_gray(band) if gray
                else encode_jpeg_color(band, subsample=False)
            )
            jpeg_tables, raw = _split_jpeg_tables(full)
            strips.append(raw)
            continue
        raw = px[r0:r0 + rows_per_strip].tobytes()
        if comp == _COMP_PACKBITS:
            raw = packbits_encode(raw)
        elif comp == _COMP_LZW:
            raw = lzw_encode(raw)
        elif comp == _COMP_DEFLATE:
            import zlib

            raw = zlib.compress(raw)
        strips.append(raw)

    n_tags = 10 + (1 if jpeg_tables else 0)
    # layout: header(8) IFD(2 + 12*n + 4) [bits values if rgb]
    #         [jpeg tables] [strip arrays] strips
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_tags + 4
    bits_off = after_ifd
    extra = b""
    if spp == 3:
        extra = struct.pack("<3H", 8, 8, 8)
    tables_off = after_ifd + len(extra)
    data_off = tables_off + len(jpeg_tables)
    offsets = []
    pos = data_off
    # strip offset/count arrays (if >1 strip they live in the data area)
    n_strips = len(strips)
    arrays = b""
    if n_strips > 1:
        so_off = pos
        pos += 4 * n_strips
        sc_off = pos
        pos += 4 * n_strips
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n_strips > 1:
        arrays = struct.pack(f"<{n_strips}I", *offsets)
        arrays += struct.pack(f"<{n_strips}I", *[len(s) for s in strips])

    def tag(t, typ, count, value):
        return struct.pack("<HHI4s", t, typ, count, value)

    def inline_long(v):
        return struct.pack("<I", v)

    def inline_short(v):
        return struct.pack("<HH", v, 0)

    tags = [
        tag(_TAG_WIDTH, 4, 1, inline_long(w)),
        tag(_TAG_HEIGHT, 4, 1, inline_long(h)),
        tag(
            _TAG_BITS, 3, spp,
            inline_short(8) if spp == 1 else inline_long(bits_off),
        ),
        tag(_TAG_COMPRESSION, 3, 1, inline_short(comp)),
        tag(_TAG_PHOTOMETRIC, 3, 1, inline_short(1 if gray else 2)),
        tag(
            _TAG_STRIP_OFFSETS, 4, n_strips,
            inline_long(offsets[0] if n_strips == 1 else so_off),
        ),
        tag(_TAG_SPP, 3, 1, inline_short(spp)),
        tag(_TAG_ROWS_PER_STRIP, 4, 1, inline_long(rows_per_strip)),
        tag(
            _TAG_STRIP_COUNTS, 4, n_strips,
            inline_long(len(strips[0]) if n_strips == 1 else sc_off),
        ),
        tag(_TAG_PLANAR, 3, 1, inline_short(1)),
    ]
    if jpeg_tables:
        # IFD tags must stay sorted by tag number (TIFF 6.0); 347 sits
        # after PLANAR(284)
        tags.append(
            tag(_TAG_JPEG_TABLES, 7, len(jpeg_tables),
                inline_long(tables_off))
        )
    out = b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_tags) + b"".join(tags)
    out += struct.pack("<I", 0)  # no next IFD
    out += extra + jpeg_tables + arrays + b"".join(strips)
    return out


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a strip-based baseline TIFF (8-bit gray or RGB, chunky
    planar, none/PackBits/LZW compression, either byte order) to
    (h, w[, 3]) uint8."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n_tags,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_tags):
        t, typ, count = struct.unpack_from(
            e + "HHI", payload, ifd_off + 2 + 12 * i
        )
        val = payload[ifd_off + 2 + 12 * i + 8: ifd_off + 2 + 12 * i + 12]
        tags[t] = (typ, count, val)

    def values(t, default=None):
        if t not in tags:
            if default is not None:
                return default
            raise ValueError(f"TIFF missing tag {t}")
        typ, count, val = tags[t]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            raise NotImplementedError(f"TIFF tag type {typ}")
        fmt = "H" if typ == 3 else "I"
        if size * count <= 4:
            return list(struct.unpack_from(e + fmt * count, val, 0))
        (off,) = struct.unpack_from(e + "I", val, 0)
        return list(struct.unpack_from(e + fmt * count, payload, off))

    w = values(_TAG_WIDTH)[0]
    h = values(_TAG_HEIGHT)[0]
    spp = values(_TAG_SPP, [1])[0]
    bits = values(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit TIFF samples")
    comp = values(_TAG_COMPRESSION, [1])[0]
    if values(_TAG_PLANAR, [1])[0] != 1:
        raise NotImplementedError("planar TIFF")
    photometric = values(_TAG_PHOTOMETRIC)[0]
    rps = values(_TAG_ROWS_PER_STRIP, [h])[0]

    def raw_bytes(t) -> bytes:
        """UNDEFINED/BYTE tag payload (JPEGTables)."""
        typ, count, val = tags[t]
        if typ not in (1, 7):
            raise ValueError(f"TIFF tag {t}: expected byte data")
        if count <= 4:
            return val[:count]
        (off,) = struct.unpack_from(e + "I", val, 0)
        return payload[off:off + count]

    if comp == _COMP_OLDJPEG:
        # deprecated TIFF 6.0 JPEG: JPEGInterchangeFormat points at ONE
        # full-image interchange stream; strips are advisory
        from .jpegcodec import decode_jpeg

        if _TAG_JPEG_IF not in tags:
            raise NotImplementedError(
                "old-style TIFF-JPEG without JPEGInterchangeFormat"
            )
        (off,) = values(_TAG_JPEG_IF)
        n = (
            values(_TAG_JPEG_IF_LEN)[0]
            if _TAG_JPEG_IF_LEN in tags
            else len(payload) - off
        )
        return decode_jpeg(payload[off:off + n])

    offsets = values(_TAG_STRIP_OFFSETS)
    counts = values(_TAG_STRIP_COUNTS)

    if comp == _COMP_JPEG:
        # TTN2 new-style: each strip is a JPEG stream (abbreviated when
        # a JPEGTables tag supplies the shared segments -- splice them
        # back in); strips stack vertically
        from .jpegcodec import decode_jpeg

        tables = (
            raw_bytes(_TAG_JPEG_TABLES)
            if _TAG_JPEG_TABLES in tags
            else b""
        )
        bands = [
            decode_jpeg(
                _join_jpeg_tables(tables, payload[off:off + cnt])
            )
            for off, cnt in zip(offsets, counts)
        ]
        return np.vstack(bands) if len(bands) > 1 else bands[0]

    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        expected = rows * w * spp
        block = payload[off:off + cnt]
        if comp == _COMP_NONE:
            raw += block[:expected]
        elif comp == _COMP_PACKBITS:
            raw += packbits_decode(block, expected)
        elif comp == _COMP_LZW:
            raw += lzw_decode(block, expected)
        elif comp == _COMP_DEFLATE:
            import zlib

            raw += zlib.decompress(block)[:expected]
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} (JPEG-in-TIFF seam)"
            )
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if spp == 1:
        arr = arr.reshape(h, w)
        if photometric == 0:  # WhiteIsZero
            arr = 255 - arr
        return arr
    return arr.reshape(h, w, spp)[:, :, :3]
