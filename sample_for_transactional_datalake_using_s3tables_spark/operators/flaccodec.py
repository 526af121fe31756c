"""FLAC codec (lossless audio), stdlib + numpy only.

Real FLAC per the public spec (RFC 9639 / xiph.org): STREAMINFO
metadata, frame sync + UTF-8-coded frame numbers + CRC-8 headers,
subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with
wasted-bits, partitioned Rice residual coding (4- and 5-bit parameter
variants with raw-bits escape), stereo decorrelation (left/side,
right/side, mid/side), and CRC-16 frame footers. The decoder verifies
both CRCs and the STREAMINFO MD5 (unencoded-sample signature); the
encoder emits fixed-blocksize streams choosing CONSTANT/FIXED order by
residual energy (optionally LPC), so decode(encode(x)) == x EXACTLY --
losslessness makes every roundtrip a bit-exact correctness oracle.

Reference behavior this re-expresses: media as opaque binary columns;
decode is the analytics-side capability of a training-data pipeline
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# -- CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005,
# both init 0) --


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16[((r >> 8) ^ b) & 0xFF]
    return r


# -- MSB-first bit I/O --


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(bits, avail)
            byte = self.data[self.pos]
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            bits -= take
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_number_encode(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + (7 - nbytes):  # capacity of nbytes encoding
        nbytes += 1
    lead = (0xFF << (8 - nbytes - 1)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_number_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    m = b0
    while m & 0x80:
        nbytes += 1
        m <<= 1
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 coded number")
        n = (n << 6) | (b & 0x3F)
    return n


# fixed-predictor residual: res_n = res_{n-1} diffs (order-n difference)
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
             256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
             8192: 13, 16384: 14, 32768: 15}
_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
             22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
             96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 6, 24: 6, 32: 7}


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, (-v << 1) - 1)


def _write_rice_residual(bw: _BitWriter, res: np.ndarray) -> None:
    """Residual block: 4-bit-rice method, partition order 0, parameter
    chosen by mean magnitude; escapes to raw bits when rice would
    explode (pathological residuals)."""
    bw.write(0, 2)  # coding method 0: 4-bit rice params
    bw.write(0, 4)  # partition order 0
    u = _zigzag(res.astype(np.int64))
    mean = float(u.mean()) if len(u) else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    # escape if unary parts would blow up
    if len(u) and float((u >> k).mean()) > 48:
        nbits = int(max(int(res.max(initial=0)).bit_length(),
                        int((-res.min(initial=0))).bit_length()) + 1)
        nbits = min(31, max(1, nbits))
        bw.write(0xF, 4)  # escape
        bw.write(nbits, 5)
        for v in res:
            bw.write_signed(int(v), nbits)
        return
    bw.write(k, 4)
    for uu in u:
        uu = int(uu)
        bw.write_unary(uu >> k)
        bw.write(uu & ((1 << k) - 1), k)


def _read_rice_residual(
    br: _BitReader, blocksize: int, order: int
) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("blocksize not divisible by partition count")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            nbits = br.read(5)
            for i in range(n):
                out[w + i] = br.read_signed(nbits) if nbits else 0
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += n
    return out


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    blocksize: int = 4096,
    use_lpc: bool = False,
) -> bytes:
    """Encode int16 samples [frames] or [frames, ch] (ch <= 2, bps=16)
    as a FLAC stream: fixed blocksize, independent channels, per-block
    CONSTANT / FIXED(0-2) subframe choice by residual energy (or a
    coef-1 LPC subframe when ``use_lpc`` -- exercises the LPC decode
    path with identical output). Lossless: decode_flac inverts
    exactly."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, ch = samples.shape
    if ch > 2:
        raise ValueError("encode_flac supports mono/stereo")
    bps = 16
    md5 = hashlib.md5(
        samples.astype("<i2").reshape(-1).tobytes()
    ).digest()
    # STREAMINFO
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(frames, 36)
    info = bytes(si.out) + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    for fi in range(0, (frames + blocksize - 1) // blocksize):
        seg = samples[fi * blocksize:(fi + 1) * blocksize]
        bs = len(seg)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)   # reserved
        bw.write(0, 1)   # fixed blocking strategy (frame number)
        bs_code = _BS_CODES.get(bs, 7)  # 7: explicit 16-bit
        bw.write(bs_code, 4)
        sr_code = _SR_CODES.get(sample_rate, 13)  # 13: explicit 16-bit Hz
        bw.write(sr_code, 4)
        bw.write(ch - 1, 4)  # independent channels
        bw.write(_BPS_CODES[bps], 3)
        bw.write(0, 1)  # reserved
        for b in _utf8_number_encode(fi):
            bw.write(b, 8)
        if bs_code == 7:
            bw.write(bs - 1, 16)
        if sr_code == 13:
            bw.write(sample_rate, 16)
        header = bytes(bw.out)
        bw.write(crc8(header), 8)
        for c in range(ch):
            x = seg[:, c].astype(np.int64)
            if np.all(x == x[0]):
                bw.write(0, 1)
                bw.write(0, 6)  # CONSTANT
                bw.write(0, 1)  # no wasted bits
                bw.write_signed(int(x[0]), bps)
                continue
            best_o, best_cost = 0, None
            for o in range(3 if len(x) > 2 else 1):
                cost = np.abs(_fixed_residual(x, o)).sum()
                if best_cost is None or cost < best_cost:
                    best_o, best_cost = o, cost
            if use_lpc and best_o == 1:
                # LPC order 1, coef 1, shift 0 == fixed order 1; real
                # LPC header/warmup/coef decode path, identical output
                bw.write(0, 1)
                bw.write(0x20, 6)  # LPC, order (0)+1 = 1
                bw.write(0, 1)
                bw.write_signed(int(x[0]), bps)  # warmup
                bw.write(14, 4)   # precision 15 (-1 coded)
                bw.write_signed(0, 5)  # shift 0
                bw.write_signed(1, 15)  # coef = 1
                _write_rice_residual(bw, _fixed_residual(x, 1))
                continue
            bw.write(0, 1)
            bw.write(8 | best_o, 6)  # FIXED order
            bw.write(0, 1)
            for w in range(best_o):
                bw.write_signed(int(x[w]), bps)
            _write_rice_residual(bw, _fixed_residual(x, best_o))
        bw.align()
        body = bytes(bw.out)
        out += body + struct.pack(">H", crc16(body))
    return bytes(out)


def decode_flac(payload: bytes, verify_md5: bool = True):
    """Decode a FLAC stream -> (samples [frames, ch] int32, sample
    rate). Verifies frame CRC-8/CRC-16 and (by default) the STREAMINFO
    MD5 signature. Handles CONSTANT / VERBATIM / FIXED / LPC subframes,
    wasted bits, both Rice methods with escapes, and all four channel
    assignments (independent, left/side, right/side, mid/side)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    sr = ch = bps = None
    total = None
    md5_expect = None
    while True:
        hdr = payload[pos]
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if hdr & 0x7F == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            sr = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5_expect = body[18:34]
        if hdr & 0x80:
            break
    if sr is None:
        raise ValueError("FLAC missing STREAMINFO")
    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(ch)]
    out_parts: list[np.ndarray] = []
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _utf8_number_decode(br)
        if bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = {
            0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32
        }.get(bps_code)
        if fbps is None:
            raise ValueError("reserved sample size code")
        br.align()
        hdr_bytes = payload[frame_start:br.pos]
        if crc8(hdr_bytes) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ca <= 7:
            nch = ca + 1
            sub_bps = [fbps] * nch
        else:
            nch = 2
            # the SIDE channel carries one extra bit
            sub_bps = {
                8: [fbps, fbps + 1],   # left/side
                9: [fbps + 1, fbps],   # side/right
                10: [fbps, fbps + 1],  # mid/side
            }.get(ca)
            if sub_bps is None:
                raise ValueError("reserved channel assignment")
        if nch != ch:
            raise ValueError("frame channel count != STREAMINFO")
        sub: list[np.ndarray] = []
        for c in range(nch):
            if br.read(1):
                raise ValueError("subframe padding bit set")
            st = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = 1 + br.read_unary()
            sbps = sub_bps[c] - wasted
            if st == 0:  # CONSTANT
                v = br.read_signed(sbps)
                x = np.full(bs, v, dtype=np.int64)
            elif st == 1:  # VERBATIM
                x = np.array(
                    [br.read_signed(sbps) for _ in range(bs)],
                    dtype=np.int64,
                )
            elif 8 <= st <= 12:  # FIXED
                order = st & 7
                warm = [br.read_signed(sbps) for _ in range(order)]
                res = _read_rice_residual(br, bs, order)
                x = np.empty(bs, dtype=np.int64)
                x[:order] = warm
                if order == 0:
                    x = res.copy()
                else:
                    # invert the order-n difference
                    for i in range(order, bs):
                        if order == 1:
                            x[i] = res[i - 1] + x[i - 1]
                        elif order == 2:
                            x[i] = res[i - 2] + 2 * x[i - 1] - x[i - 2]
                        elif order == 3:
                            x[i] = (
                                res[i - 3] + 3 * x[i - 1]
                                - 3 * x[i - 2] + x[i - 3]
                            )
                        else:
                            x[i] = (
                                res[i - 4] + 4 * x[i - 1] - 6 * x[i - 2]
                                + 4 * x[i - 3] - x[i - 4]
                            )
            elif st >= 32:  # LPC
                order = (st & 31) + 1
                warm = [br.read_signed(sbps) for _ in range(order)]
                prec = br.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision")
                shift = br.read_signed(5)
                coefs = [br.read_signed(prec) for _ in range(order)]
                res = _read_rice_residual(br, bs, order)
                x = np.empty(bs, dtype=np.int64)
                x[:order] = warm
                for i in range(order, bs):
                    pred = 0
                    for j in range(order):
                        pred += coefs[j] * int(x[i - 1 - j])
                    x[i] = res[i - order] + (pred >> shift)
            else:
                raise ValueError(f"reserved subframe type {st}")
            if wasted:
                x <<= wasted
            sub.append(x)
        br.align()
        if br.pos + 2 > len(payload):
            raise ValueError("truncated FLAC frame (no CRC-16 footer)")
        fcrc = struct.unpack_from(">H", payload, br.pos)[0]
        if crc16(payload[frame_start:br.pos]) != fcrc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos + 2
        if ca == 8:   # left/side: right = left - side
            left, side = sub
            sub = [left, left - side]
        elif ca == 9:  # side/right: left = side + right
            side, right = sub
            sub = [side + right, right]
        elif ca == 10:  # mid/side: mid dropped side's LSB at encode
            mid, side = sub
            m2 = (mid << 1) | (side & 1)
            sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        out_parts.append(np.stack(sub, axis=1))
    frames = np.concatenate(out_parts, axis=0) if out_parts else np.zeros(
        (0, ch), dtype=np.int64
    )
    if total:
        frames = frames[:total]
    if verify_md5 and md5_expect and md5_expect != b"\x00" * 16:
        if bps == 16:
            got = hashlib.md5(
                frames.astype("<i2").reshape(-1).tobytes()
            ).digest()
            if got != md5_expect:
                raise ValueError("FLAC MD5 signature mismatch")
    return frames.astype(np.int32), sr
