"""Baseline JPEG codec (grayscale), stdlib + numpy only.

Real DCT-domain JPEG: 8x8 blocks, level shift, orthonormal 2-D DCT,
quantization, zigzag, DC difference coding, AC run-length coding, and
canonical Huffman entropy coding -- with the Huffman tables DEFINED BY
THE ENCODER and written into DHT segments (the JPEG standard carries
tables in-stream; nothing requires the spec's example tables), so the
decoder exercises the real DHT -> canonical-code construction path.

Scope: baseline sequential (SOF0), single grayscale component, 8-bit,
no restart markers. Color JPEG (chroma subsampling + YCbCr) remains the
PIL deployment seam -- this module is the proof that the entropy/DCT
machinery itself is real.

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


def encode_jpeg_gray(px: np.ndarray, quant: np.ndarray = _Q_FLAT) -> bytes:
    """Baseline JPEG for an (h, w) uint8 grayscale array. Dimensions
    must be multiples of 8 (no edge replication -- keeps the codec
    exact and small)."""
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
    dc_syms, ac_syms = [], []
    prev_dc = 0
    tokens = []  # (kind, symbol, extra_bits, extra_len)
    for zz in blocks:
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        s, bitsv = _encode_magnitude(diff)
        dc_syms.append(s)
        tokens.append(("dc", s, bitsv, s))
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, 64):
            v = int(zz[i])
            if i > last_nz:
                ac_syms.append(0x00)  # EOB
                tokens.append(("ac", 0x00, 0, 0))
                break
            if v == 0:
                run += 1
                if run == 16:
                    ac_syms.append(0xF0)  # ZRL
                    tokens.append(("ac", 0xF0, 0, 0))
                    run = 0
                continue
            s, bitsv = _encode_magnitude(v)
            sym = (run << 4) | s
            ac_syms.append(sym)
            tokens.append(("ac", sym, bitsv, s))
            run = 0
        else:
            if last_nz == 63 and int(zz[63]) == 0:
                ac_syms.append(0x00)
                tokens.append(("ac", 0x00, 0, 0))

    dc_bits, dc_vals, dc_codes = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_table(ac_syms)

    bw = _BitWriter()
    for kind, sym, extra, elen in tokens:
        code, length = (dc_codes if kind == "dc" else ac_codes)[sym]
        bw.write(code, length)
        if elen:
            bw.write(extra, elen)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = quant.reshape(-1)[_ZIGZAG].astype(np.uint8)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + zz_q.tobytes())  # DQT table 0
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
    out += seg(0xFFC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))  # DHT AC 0
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
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


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant = {}
    huff = {}
    h = w = None
    comp_q = comp_dc = comp_ac = 0
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
            if prec != 8 or nc != 1:
                raise NotImplementedError(
                    "only 8-bit single-component (grayscale) baseline JPEG "
                    "supported without PIL"
                )
            # component spec starts after prec/h/w/nc (6 bytes):
            # id, sampling (HiVi nibbles), quant-table id
            if body[7] != 0x11:
                raise NotImplementedError("subsampled JPEG needs PIL (seam)")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("only baseline SOF0 JPEG supported")
        elif marker == 0xDA:
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            scan = payload[pos:]
            end = scan.rfind(b"\xff\xd9")
            br = _BitReader(scan[:end if end >= 0 else len(scan)])
            if h is None:
                raise ValueError("SOS before SOF")
            q = quant[comp_q]
            dct, act = huff[(0, comp_dc)], huff[(1, comp_ac)]
            by, bx = (h + 7) // 8, (w + 7) // 8
            out = np.zeros((by * 8, bx * 8), dtype=np.float64)
            prev_dc = 0
            for b in range(by * bx):
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
                block = _C.T @ (coef.reshape(8, 8) * q) @ _C + 128.0
                r, c = divmod(b, bx)
                out[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = block
            return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
    raise ValueError("JPEG has no scan")
