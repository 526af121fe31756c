"""Baseline JPEG codec (grayscale AND color), stdlib + numpy only.

Real DCT-domain JPEG: 8x8 blocks, level shift, orthonormal 2-D DCT,
quantization, zigzag, DC difference coding, AC run-length coding, and
canonical Huffman entropy coding -- with the Huffman tables DEFINED BY
THE ENCODER and written into DHT segments (the JPEG standard carries
tables in-stream; nothing requires the spec's example tables), so the
decoder exercises the real DHT -> canonical-code construction path.

Color: JFIF YCbCr with separate luma/chroma quant + Huffman tables,
4:2:0 chroma subsampling (2x2-averaged at encode, replicated at
decode) or 4:4:4, interleaved MCU scan with per-component DC
prediction. The decoder handles arbitrary integer sampling factors
whose max is a multiple of each component's (covers 4:4:4, 4:2:2,
4:2:0).

Scope: baseline sequential (SOF0) AND progressive (SOF2: spectral
selection + successive approximation, full DC/AC first+refine scan
machinery with EOB-run coding), 8-bit, WITH restart markers (DRI/RSTn
encode + decode, predictor/EOB-run resets at each boundary).
Arithmetic-coded JPEG remains the PIL deployment seam.

Reference behavior it re-expresses: the reference pipeline treats media
as opaque S3 objects; decoding is the analytics-side capability a
training-data pipeline needs (SURVEY.md north-star extensions).
"""

from __future__ import annotations

import struct

import numpy as np

# Default quantization table (flat 16s): uniform quality, chosen so
# constant blocks with even sample values round-trip EXACTLY (the DC
# coefficient of a constant block is 8*(v-128), divisible by 16 for
# even v) -- which is what lets a SQL oracle recompute decoded features.
_Q_FLAT = np.full((8, 8), 16, dtype=np.int32)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2.0)
    return C


_C = _dct_matrix()


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size, raw bits); negative values store
    value - 1 in ``size`` bits (one's-complement style)."""
    s = _size_of(v)
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """A valid canonical Huffman table over the USED symbols: fixed
    length L = ceil(log2(k+1)) for every symbol (k < 2^L keeps the
    all-ones code unused, as JPEG requires). Returns (bits, huffval,
    {symbol: (code, length)})."""
    syms = sorted(set(symbols))
    k = len(syms)
    length = max(2, (k + 1 - 1).bit_length())
    while (1 << length) - 1 < k:  # need k codes, all-ones reserved
        length += 1
    bits = [0] * 16
    bits[length - 1] = k
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return bits, syms, codes


def _emit_tokens(tokens: list, tables) -> bytes:
    """Entropy-code a token stream; ``("rst",)`` sentinels byte-align
    (1-padded) and splice an unstuffed RSTn marker (T.81 restart
    intervals -- resync points for corruption recovery and parallel
    decode)."""
    bw = _BitWriter()
    rst = 0
    for tok in tokens:
        if tok[0] == "rst":
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            continue
        tcls, kind, sym, extra, elen = tok
        code, length = tables[(tcls, kind)][sym]
        bw.write(code, length)
        if elen:
            bw.write(extra, elen)
    bw.flush()
    return bytes(bw.out)


def encode_jpeg_gray(
    px: np.ndarray,
    quant: np.ndarray = _Q_FLAT,
    restart_interval: int | None = None,
) -> bytes:
    """Baseline JPEG for an (h, w) uint8 grayscale array. Dimensions
    must be multiples of 8 (no edge replication -- keeps the codec
    exact and small). ``restart_interval`` emits a DRI segment and an
    RSTn marker every N MCUs (DC prediction resets at each)."""
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dims")
    blocks = []
    shifted = px.astype(np.float64) - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coef = _C @ shifted[by:by + 8, bx:bx + 8] @ _C.T
            q = np.round(coef / quant).astype(np.int64)
            blocks.append(q.reshape(-1)[_ZIGZAG])

    # entropy-code symbols first (two passes: collect symbols, build
    # canonical tables, then emit)
    dc_syms: list = []
    ac_syms: list = []
    tokens: list = []
    prev_dc = 0
    for i, zz in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            tokens.append(("rst",))
            prev_dc = 0
        prev_dc = _tokenize_block(zz, prev_dc, 0, dc_syms, ac_syms, tokens)

    dc_bits, dc_vals, dc_codes = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_table(ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = quant.reshape(-1)[_ZIGZAG].astype(np.uint8)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + zz_q.tobytes())  # DQT table 0
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
    out += seg(0xFFC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))  # DHT AC 0
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += _emit_tokens(
        tokens, {(0, "dc"): dc_codes, (0, "ac"): ac_codes}
    )
    out += b"\xff\xd9"  # EOI
    return out


# -- color (JFIF YCbCr) --

# BT.601 full-range coefficients, the JFIF standard matrix
def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _quantize_block(plane: np.ndarray, y0: int, x0: int, quant) -> np.ndarray:
    coef = _C @ (plane[y0:y0 + 8, x0:x0 + 8] - 128.0) @ _C.T
    return np.round(coef / quant).astype(np.int64).reshape(-1)[_ZIGZAG]


def _tokenize_block(
    zz: np.ndarray, prev_dc: int, tcls: int,
    dc_syms: list, ac_syms: list, tokens: list,
) -> int:
    """Append one block's DC-diff + AC run-length tokens; ``tcls``
    selects the (luma=0 / chroma=1) table pair the emitter will use.
    Returns the block's DC for the component's next prediction."""
    diff = int(zz[0]) - prev_dc
    s, bitsv = _encode_magnitude(diff)
    dc_syms.append(s)
    tokens.append((tcls, "dc", s, bitsv, s))
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            ac_syms.append(0x00)
            tokens.append((tcls, "ac", 0x00, 0, 0))
            break
        if v == 0:
            run += 1
            if run == 16:
                ac_syms.append(0xF0)
                tokens.append((tcls, "ac", 0xF0, 0, 0))
                run = 0
            continue
        s, bitsv = _encode_magnitude(v)
        sym = (run << 4) | s
        ac_syms.append(sym)
        tokens.append((tcls, "ac", sym, bitsv, s))
        run = 0
    return int(zz[0])


def encode_jpeg_color(
    px: np.ndarray,
    quant_y: np.ndarray = _Q_FLAT,
    quant_c: np.ndarray = _Q_FLAT,
    subsample: bool = True,
    restart_interval: int | None = None,
) -> bytes:
    """Baseline color JPEG for an (h, w, 3) uint8 RGB array: JFIF YCbCr,
    4:2:0 chroma subsampling (2x2 average) by default or 4:4:4 with
    ``subsample=False``, separate luma/chroma quant + Huffman tables,
    interleaved MCU scan. Dimensions must be multiples of 16 (4:2:0) or
    8 (4:4:4) -- no edge replication, keeping the codec exact and
    small."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg_color needs an (h, w, 3) array")
    h, w = px.shape[:2]
    mcu = 16 if subsample else 8
    if h % mcu or w % mcu:
        raise ValueError(f"encode_jpeg_color needs multiple-of-{mcu} dims")
    y, cb, cr = _rgb_to_ycbcr(px.astype(np.float64))
    if subsample:
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        samp = ((2, 2), (1, 1), (1, 1))
    else:
        samp = ((1, 1), (1, 1), (1, 1))
    planes = (y, cb, cr)
    quants = (quant_y, quant_c, quant_c)
    tcls_of = (0, 1, 1)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    dc_syms: dict[int, list] = {0: [], 1: []}
    ac_syms: dict[int, list] = {0: [], 1: []}
    tokens: list = []
    prev_dc = [0, 0, 0]
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            tokens.append(("rst",))
            prev_dc = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci in range(3):
            hi, vi = samp[ci]
            tcls = tcls_of[ci]
            for vy in range(vi):
                for vx in range(hi):
                    zz = _quantize_block(
                        planes[ci],
                        (my * vi + vy) * 8,
                        (mx * hi + vx) * 8,
                        quants[ci],
                    )
                    prev_dc[ci] = _tokenize_block(
                        zz, prev_dc[ci], tcls,
                        dc_syms[tcls], ac_syms[tcls], tokens,
                    )
    tables = {}
    dht = b""
    for tcls in (0, 1):
        db, dv, dcodes = _canonical_table(dc_syms[tcls])
        ab, av, acodes = _canonical_table(ac_syms[tcls])
        tables[(tcls, "dc")] = dcodes
        tables[(tcls, "ac")] = acodes
        dht += struct.pack(
            ">HH", 0xFFC4, 2 + 17 + len(dv)
        ) + bytes([tcls]) + bytes(db) + bytes(dv)
        dht += struct.pack(
            ">HH", 0xFFC4, 2 + 17 + len(av)
        ) + bytes([0x10 | tcls]) + bytes(ab) + bytes(av)
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zq_y = quant_y.reshape(-1)[_ZIGZAG].astype(np.uint8)
    zq_c = quant_c.reshape(-1)[_ZIGZAG].astype(np.uint8)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, cid in enumerate((1, 2, 3)):
        hi, vi = samp[ci]
        sof += bytes([cid, (hi << 4) | vi, 0 if ci == 0 else 1])
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out = b"\xff\xd8"
    out += seg(0xFFDB, b"\x00" + zq_y.tobytes())
    out += seg(0xFFDB, b"\x01" + zq_c.tobytes())
    out += seg(0xFFC0, sof)
    out += dht
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, sos)
    out += _emit_tokens(tokens, tables)
    out += b"\xff\xd9"
    return out


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = (self.acc << 8) | b
            self.n += 8
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self) -> int:
        """Byte-align (drop pad bits) and consume an RSTn marker at a
        restart-interval boundary (T.81 F.2.1.3); returns n."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1] & 0x07
        self.pos += 2
        return m


def _build_decoder_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol from a DHT's canonical description."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("bad Huffman code")


def _decode_block(br: _BitReader, dct: dict, act: dict, prev_dc: int, q) -> tuple[np.ndarray, int]:
    """One 8x8 block: Huffman-decode, dequantize, IDCT, level-unshift."""
    zz = np.zeros(64, dtype=np.int64)
    s = _read_symbol(br, dct)
    prev_dc += _extend(br.read(s), s) if s else 0
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_symbol(br, act)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if sym == 0xF0:
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz
    return _C.T @ (coef.reshape(8, 8) * q) @ _C + 128.0, prev_dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG: grayscale -> (h, w) uint8; color (JFIF
    YCbCr, any integer sampling whose max divides by each component's,
    e.g. 4:4:4 / 4:2:2 / 4:2:0) -> (h, w, 3) uint8 RGB. Chroma
    upsampling is nearest-neighbor replication -- the standard fast
    path, and the exact inverse of the encoder's 2x2 average on
    constant regions (what keeps flat colors bit-exact end-to-end)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    ri = 0  # restart interval (DRI), in MCUs
    comps: list[tuple[int, int, int, int]] = []  # (cid, Hi, Vi, Tq)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2: pos + ln]
        pos += ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables")
                tq = pq_tq & 0x0F
                zz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = zz
                quant[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _build_decoder_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                raise NotImplementedError(
                    "only 8-bit grayscale or 3-component (YCbCr) baseline "
                    "JPEG supported without PIL"
                )
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
        elif marker == 0xC2:
            return _decode_progressive(payload)
        elif marker == 0xDD:
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError(
                "only baseline SOF0 / progressive SOF2 JPEG supported"
            )
        elif marker == 0xDA:
            if h is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError("multi-scan JPEG needs PIL (seam)")
            scan_tables = {}
            for si in range(ns):
                cid, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan_tables[cid] = (tdta >> 4, tdta & 0x0F)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, hi, vi, _tq in comps:
                if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"fractional sampling {hi}x{vi} vs max "
                        f"{hmax}x{vmax} needs PIL"
                    )
            scan = payload[pos:]
            end = scan.rfind(b"\xff\xd9")
            br = _BitReader(scan[:end if end >= 0 else len(scan)])
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = [
                np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
                for _cid, hi, vi, _tq in comps
            ]
            prev_dc = [0] * len(comps)
            for m in range(mcuy * mcux):
                if ri and m and m % ri == 0:
                    br.restart()  # byte-align + consume RSTn
                    prev_dc = [0] * len(comps)
                my, mx = divmod(m, mcux)
                for ci, (cid, hi, vi, tq) in enumerate(comps):
                    dc_id, ac_id = scan_tables[cid]
                    dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
                    for vy in range(vi):
                        for vx in range(hi):
                            block, prev_dc[ci] = _decode_block(
                                br, dct, act, prev_dc[ci], quant[tq]
                            )
                            r = (my * vi + vy) * 8
                            c = (mx * hi + vx) * 8
                            planes[ci][r:r + 8, c:c + 8] = block
            full = []
            for ci, (_cid, hi, vi, _tq) in enumerate(comps):
                p = planes[ci]
                if vi != vmax or hi != hmax:
                    p = np.repeat(
                        np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1
                    )
                full.append(p[:h, :w])
            if len(full) == 1:
                return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            return _ycbcr_to_rgb(*full)
    raise ValueError("JPEG has no scan")


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array
    (compat wrapper over the general :func:`decode_jpeg`)."""
    out = decode_jpeg(payload)
    if out.ndim != 2:
        raise ValueError("decode_jpeg_gray got a color JPEG")
    return out


# -- progressive JPEG (SOF2): spectral selection + successive
# approximation, ITU T.81 Annex G. The decoder accumulates quantized
# coefficients across scans (DC first/refine, AC first/refine with
# EOB-run coding) and reconstructs once at EOI; the encoder emits a
# libjpeg-style scan script with per-scan optimal Huffman tables.
# Identical quantized coefficients => progressive decode is bit-exact
# with the baseline decode of the same image. --


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: magnitude shift, truncation toward zero
    (T.81 G.1.2.1 -- DC uses plain arithmetic shift instead)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _ProgEmitter:
    """Per-scan token stream for progressive entropy coding: Huffman
    symbols interleaved with raw bits, plus the EOB-run accumulator and
    its buffered correction bits (T.81 G.1.2.3; the bit_buffer/BE
    mechanism of libjpeg's encoder)."""

    def __init__(self):
        self.tokens: list[tuple] = []  # (is_sym, sym, bits, nbits)
        self.syms: list[int] = []
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits owed to EOB run

    def sym(self, s: int) -> None:
        self.syms.append(s)
        self.tokens.append((True, s, 0, 0))

    def raw(self, v: int, n: int) -> None:
        if n:
            self.tokens.append((False, 0, v, n))

    def flush_eobrun(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            self.raw(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.pending:
                self.raw(b, 1)
            self.pending = []

    def eob(self, bits: tuple | list = ()) -> None:
        self.eobrun += 1
        self.pending.extend(bits)
        if self.eobrun == 0x7FFF:  # 14-bit EOBn cap
            self.flush_eobrun()

    def rst(self) -> None:
        """Restart-interval boundary: EOB runs cannot cross it (the
        decoder resets them), so flush, then splice the marker."""
        self.flush_eobrun()
        self.tokens.append(("rst", 0, 0, 0))


def _dc_scan_units(
    blocks: list[np.ndarray], comps_idx: list[int], samp, mcux: int, mcuy: int
) -> list[list[tuple[int, int, int]]]:
    """DC-scan block addressing grouped into restart units: one MCU per
    unit when interleaved, one block per unit when single-component."""
    if len(comps_idx) == 1:
        ci = comps_idx[0]
        bh, bw = blocks[ci].shape[:2]
        return [[(ci, r, c)] for r in range(bh) for c in range(bw)]
    units = []
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        unit = []
        for ci in comps_idx:
            hi, vi = samp[ci]
            for vy in range(vi):
                for vx in range(hi):
                    unit.append((ci, my * vi + vy, mx * hi + vx))
        units.append(unit)
    return units


def _enc_dc_first(blocks, units, al: int, em: _ProgEmitter, ri: int) -> None:
    pred: dict[int, int] = {}
    for ui, unit in enumerate(units):
        if ri and ui and ui % ri == 0:
            em.rst()
            pred = {}
        for ci, r, c in unit:
            v = int(blocks[ci][r, c, 0]) >> al  # DC: arithmetic shift
            diff = v - pred.get(ci, 0)
            pred[ci] = v
            s, bits = _encode_magnitude(diff)
            em.sym(s)
            em.raw(bits, s)


def _enc_dc_refine(blocks, units, al: int, em: _ProgEmitter, ri: int) -> None:
    for ui, unit in enumerate(units):
        if ri and ui and ui % ri == 0:
            em.rst()
        for ci, r, c in unit:
            em.raw((int(blocks[ci][r, c, 0]) >> al) & 1, 1)


def _enc_ac_first(
    bk: np.ndarray, ss: int, se: int, al: int, em: _ProgEmitter, ri: int = 0
) -> None:
    bh, bw = bk.shape[:2]
    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            em.rst()
        r, c = divmod(bi, bw)
        zz = bk[r, c]
        vals = [_trunc_shift(int(zz[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            em.eob()
            continue
        em.flush_eobrun()
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                em.sym(0xF0)
                run -= 16
            s_, bits = _encode_magnitude(v)
            em.sym((run << 4) | s_)
            em.raw(bits, s_)
            run = 0
        if nz[-1] < len(vals) - 1:
            em.eob()


def _enc_ac_refine(
    bk: np.ndarray, ss: int, se: int, al: int, em: _ProgEmitter, ri: int = 0
) -> None:
    bh, bw = bk.shape[:2]
    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            em.rst()
        r, c = divmod(bi, bw)
        zz = bk[r, c]
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        # last NEWLY-nonzero position: ZRL only makes sense before it
        eob_idx = max((i for i, t in enumerate(absv) if t == 1), default=-1)
        run = 0
        br_bits: list[int] = []  # this block's correction bits
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob_idx:
                em.flush_eobrun()
                em.sym(0xF0)
                run -= 16
                for b in br_bits:
                    em.raw(b, 1)
                br_bits = []
            if t > 1:
                # history coefficient: buffered correction bit; does
                # NOT count toward nor reset the zero run
                br_bits.append(t & 1)
                continue
            em.flush_eobrun()
            em.sym((run << 4) | 1)
            em.raw(0 if int(zz[ss + i]) < 0 else 1, 1)
            for b in br_bits:
                em.raw(b, 1)
            br_bits = []
            run = 0
        if run > 0 or br_bits:
            em.eob(br_bits)


def encode_jpeg_progressive(
    px: np.ndarray,
    quant_y: np.ndarray = _Q_FLAT,
    quant_c: np.ndarray = _Q_FLAT,
    subsample: bool = True,
    restart_interval: int | None = None,
) -> bytes:
    """Progressive JPEG (SOF2) for an (h, w) grayscale or (h, w, 3) RGB
    uint8 array. Same block/quant math as the baseline encoders (so a
    progressive payload decodes bit-exactly to the baseline decode of
    the same pixels); the scan script follows libjpeg's default --
    interleaved DC first pass at Al=1, spectrally-split AC first passes,
    then DC and AC successive-approximation refinements to full
    precision. Dimension rules match the baseline encoders.
    ``restart_interval`` splices RSTn every N restart units per scan
    (MCUs when interleaved, blocks otherwise); predictors and EOB runs
    reset at each."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        if h % 8 or w % 8:
            raise ValueError("encode_jpeg_progressive needs /8 dims")
        planes = [px.astype(np.float64)]
        samp = ((1, 1),)
        quants = [quant_y]
        tqs = [0]
        cids = [1]
    else:
        mcu = 16 if subsample else 8
        if h % mcu or w % mcu:
            raise ValueError(
                f"encode_jpeg_progressive needs multiple-of-{mcu} dims"
            )
        y, cb, cr = _rgb_to_ycbcr(px.astype(np.float64))
        if subsample:
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            samp = ((2, 2), (1, 1), (1, 1))
        else:
            samp = ((1, 1), (1, 1), (1, 1))
        planes = [y, cb, cr]
        quants = [quant_y, quant_c, quant_c]
        tqs = [0, 1, 1]
        cids = [1, 2, 3]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    blocks: list[np.ndarray] = []
    for ci, p in enumerate(planes):
        ph, pw = p.shape
        bk = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
        for r in range(ph // 8):
            for c in range(pw // 8):
                bk[r, c] = _quantize_block(p, r * 8, c * 8, quants[ci])
        blocks.append(bk)

    all_c = list(range(len(planes)))
    if gray:
        script = [
            (all_c, 0, 0, 0, 1),   # DC first
            ([0], 1, 5, 0, 2),     # AC low band, coarse
            ([0], 6, 63, 0, 2),    # AC high band, coarse
            (all_c, 0, 0, 1, 0),   # DC refine
            ([0], 1, 63, 2, 1),    # AC refine
            ([0], 1, 63, 1, 0),    # AC refine to full precision
        ]
    else:
        script = [
            (all_c, 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            (all_c, 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    emitted_q: set[int] = set()
    for ci in all_c:
        if tqs[ci] not in emitted_q:
            zq = quants[ci].reshape(-1)[_ZIGZAG].astype(np.uint8)
            out += seg(0xFFDB, bytes([tqs[ci]]) + zq.tobytes())
            emitted_q.add(tqs[ci])
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in all_c:
        hi, vi = samp[ci]
        sof += bytes([cids[ci], (hi << 4) | vi, tqs[ci]])
    out += seg(0xFFC2, sof)

    ri = restart_interval or 0
    if ri:
        out += seg(0xFFDD, struct.pack(">H", ri))
    for comps_idx, ss, se, ah, al in script:
        em = _ProgEmitter()
        if ss == 0:
            units = _dc_scan_units(blocks, comps_idx, samp, mcux, mcuy)
            if ah == 0:
                _enc_dc_first(blocks, units, al, em, ri)
            else:
                _enc_dc_refine(blocks, units, al, em, ri)
            tc = 0
        else:
            if len(comps_idx) != 1:
                raise ValueError("AC scans are single-component")
            if ah == 0:
                _enc_ac_first(blocks[comps_idx[0]], ss, se, al, em, ri)
            else:
                _enc_ac_refine(blocks[comps_idx[0]], ss, se, al, em, ri)
            tc = 1
        em.flush_eobrun()
        bw = _BitWriter()
        rst_n = 0
        if em.syms:
            bits, vals, codes = _canonical_table(em.syms)
            out += seg(0xFFC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
        for is_sym, s, v, n in em.tokens:
            if is_sym == "rst":
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
            elif is_sym:
                code, ln = codes[s]
                bw.write(code, ln)
            else:
                bw.write(v, n)
        bw.flush()
        sos = bytes([len(comps_idx)])
        for ci in comps_idx:
            sos += bytes([cids[ci], 0x00])  # table 0 for both classes
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)
        out += bytes(bw.out)
    out += b"\xff\xd9"
    return out


def _ac_refine_block(br, act, zz, ss, se, al, eobrun):
    """Decode one block of an AC successive-approximation refinement
    scan (T.81 G.2; the libjpeg decode_mcu_AC_refine algorithm):
    correction bits for history coefficients, new +-1<<Al insertions,
    EOB-run accounting. Mutates ``zz`` in place, returns the EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(br, act)
            run, size = sym >> 4, sym & 0x0F
            val = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += br.read(run)
                    break
                # ZRL: skip 16 zero-history positions (with corrections)
            else:
                if size != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if br.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read(1) and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read(1) and (int(zz[k]) & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _find_scan_end(data: bytes, pos: int) -> int:
    """Offset of the next true marker (not a stuffed 0x00, not RSTn)
    after ``pos`` -- the end of an entropy-coded scan segment."""
    i = pos
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            return len(data)
        nxt = data[j + 1]
        if nxt == 0x00 or nxt == 0xFF or 0xD0 <= nxt <= 0xD7:
            i = j + 1 if nxt == 0xFF else j + 2
            continue
        return j


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JPEG: accumulate quantized
    coefficients across DC/AC first and refinement scans, reconstruct
    at EOI. Restart markers (DRI) remain unsupported -- this engine's
    encoders never emit them (documented seam)."""
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []
    coefs: list[np.ndarray] = []
    bdims: list[tuple[int, int]] = []  # per-comp real block dims
    hmax = vmax = mcux = mcuy = 0
    ri = 0  # restart interval (DRI), in restart units
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2: pos + ln]
        pos += ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                if body[i] >> 4:
                    raise NotImplementedError("16-bit quant tables")
                tq = body[i] & 0x0F
                zz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = zz
                quant[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _build_decoder_table(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                raise NotImplementedError("8-bit gray/YCbCr only")
            comps = []
            for ci in range(nc):
                cid, s, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append((cid, s >> 4, s & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, hi, vi, _tq in comps:
                if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
                    raise NotImplementedError("fractional sampling")
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for _cid, hi, vi, _tq in comps:
                coefs.append(
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                )
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                bdims.append(((ch + 7) // 8, (cw + 7) // 8))
        elif marker == 0xDD:
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("mixed frame types")
        elif marker == 0xDA:
            if h is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tdta = body[1 + 2 * si], body[2 + 2 * si]
                ci = next(
                    i for i, c in enumerate(comps) if c[0] == cid
                )
                scan_comps.append((ci, tdta >> 4, tdta & 0x0F))
            off = 1 + 2 * ns
            ss, se, ahl = body[off], body[off + 1], body[off + 2]
            ah, al = ahl >> 4, ahl & 0x0F
            end = _find_scan_end(payload, pos)
            br = _BitReader(payload[pos:end])
            pos = end
            if ss == 0:
                idx = [ci for ci, _d, _a in scan_comps]
                dc_ids = {ci: d for ci, d, _a in scan_comps}
                if len(idx) == 1:
                    # non-interleaved: the comp's REAL block grid, not
                    # the MCU-padded one
                    bh0, bw0 = bdims[idx[0]]
                    units = [
                        [(idx[0], r, c)]
                        for r in range(bh0)
                        for c in range(bw0)
                    ]
                else:
                    units = _dc_scan_units(
                        coefs, idx, [(c[1], c[2]) for c in comps],
                        mcux, mcuy,
                    )
                pred = dict.fromkeys(idx, 0)
                p1 = 1 << al
                for ui, unit in enumerate(units):
                    if ri and ui and ui % ri == 0:
                        br.restart()
                        pred = dict.fromkeys(idx, 0)
                    for ci, r, c in unit:
                        if ah == 0:
                            dct = huff[(0, dc_ids[ci])]
                            s = _read_symbol(br, dct)
                            pred[ci] += _extend(br.read(s), s) if s else 0
                            coefs[ci][r, c, 0] = pred[ci] << al
                        elif br.read(1):
                            coefs[ci][r, c, 0] |= p1
            else:
                if ns != 1:
                    raise ValueError("AC scans are single-component")
                ci, _dc_id, ac_id = scan_comps[0]
                act = huff[(1, ac_id)]
                bh, bw = bdims[ci]
                eobrun = 0
                for bi in range(bh * bw):
                    if ri and bi and bi % ri == 0:
                        br.restart()
                        eobrun = 0  # EOB runs never cross a restart
                    r, c = divmod(bi, bw)
                    zz = coefs[ci][r, c]
                    if ah == 0:
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            sym = _read_symbol(br, act)
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += br.read(run)
                                break
                            k += run
                            if k > se:
                                raise ValueError("AC run past band")
                            zz[k] = _extend(br.read(size), size) << al
                            k += 1
                    else:
                        eobrun = _ac_refine_block(
                            br, act, zz, ss, se, al, eobrun
                        )
    if h is None or not coefs:
        raise ValueError("progressive JPEG has no frame")
    full = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        q = quant[tq]
        bh_full, bw_full = coefs[ci].shape[:2]
        plane = np.zeros((bh_full * 8, bw_full * 8), dtype=np.float64)
        for r in range(bh_full):
            for c in range(bw_full):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = coefs[ci][r, c]
                plane[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = (
                    _C.T @ (coef.reshape(8, 8) * q) @ _C + 128.0
                )
        if vi != vmax or hi != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(*full)
