"""Native FLAC decode — stdlib + numpy only (r12).

The audio counterpart of the VP8L tier: FLAC is Rice-coded linear
prediction — no arithmetic coder anywhere — so full sample-exact
decode is within this repo's stdlib-decoder envelope, and a 100 TB
audio corpus can materialize PCM for its dominant lossless format
without an external codec.

Implemented from the public FLAC format specification (RFC 9639):

- frame-header walk: 14-bit sync, blocking strategy, the
  block-size/sample-rate/sample-size code tables (escape codes 8/16
  bit included), UTF-8-style coded frame number, CRC-8 over the
  header (poly 0x07) verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC up to order 32
  (4-bit precision-1, signed 5-bit shift, signed coefficients), the
  wasted-bits unary prefix;
- residuals: both Rice methods (4- and 5-bit parameters), partition
  orders, the escape-to-raw partition encoding, zigzag unfolding;
- stereo decorrelation: independent, left/side, right/side, mid/side
  (the lost-LSB reconstruction);
- frame CRC-16 (poly 0x8005) verified; samples cross-checked against
  STREAMINFO's total-sample count and MD5 left to fsck-style callers.

``encode_flac`` is the twin: a real (if deliberately simple) encoder
that emits every decode path — constant/verbatim/fixed/LPC subframes,
chosen Rice parameters, partition orders, escaped partitions, wasted
bits, and all four channel assignments — so the tests pin sample-exact
decode(encode(pcm)) == pcm across the matrix. 16-bit samples (the
dominant wire depth); other depths refuse with ValueError
(skip-don't-crash at the operator layer).
"""

from __future__ import annotations

import struct

# --- CRCs (polynomials from the spec) --------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16[(r >> 8) ^ b]
    return r


# --- bit I/O (MSB-first, the FLAC order) ------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC stream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC frame number is not valid UTF-8 coding")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC residual coding method {method} reserved")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("FLAC partition count does not divide block size")
    out: list[int] = []
    for p in range(n_part):
        count = blocksize // n_part - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * blocksize
    elif t == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        samples = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + pred)
    elif t >= 32:  # LPC, order = (t & 31) + 1
        order = (t & 31) + 1
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision escape (1111) is invalid")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift is reserved")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        for e in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        raise ValueError(f"FLAC subframe type {t} reserved")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes):
    """Full sample-exact decode: (numpy int32 array of shape
    (n_samples, n_channels), sample_rate). Verifies every frame's
    CRC-8 header and CRC-16 footer; refuses non-16-bit streams and
    reserved codings with ValueError."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    # metadata walk: STREAMINFO first (the triage parser's contract)
    pos, streaminfo = 4, None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        if hdr & 0x7F == 0:
            streaminfo = payload[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream lacks STREAMINFO")
    sbits = int.from_bytes(streaminfo[10:18], "big")
    rate = sbits >> 44
    nch = ((sbits >> 41) & 0x7) + 1
    bps = ((sbits >> 36) & 0x1F) + 1
    total = sbits & ((1 << 36) - 1)
    if bps != 16:
        raise ValueError(f"FLAC bits-per-sample {bps} unsupported (want 16)")

    channels: list[list[int]] = [[] for _ in range(nch)]
    while pos < len(payload):
        frame_start = pos
        bits = _Bits(payload, pos)
        if bits.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 reserved")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC sample rate code 15 invalid")
        frame_bps = bps if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
        if frame_bps is None:
            raise ValueError(f"FLAC sample size code {ss_code} reserved")
        bits.align()
        hdr_end = bits.byte
        crc = bits.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_read_subframe(bits, blocksize, frame_bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("FLAC stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _read_subframe(bits, blocksize, frame_bps)
                side = _read_subframe(bits, blocksize, frame_bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right(side first)/side
                side = _read_subframe(bits, blocksize, frame_bps + 1)
                right = _read_subframe(bits, blocksize, frame_bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(bits, blocksize, frame_bps)
                side = _read_subframe(bits, blocksize, frame_bps + 1)
                lr = []
                for m, s in zip(mid, side):
                    both = (m << 1) | (s & 1)
                    lr.append(((both + s) >> 1, (both - s) >> 1))
                subs = [[p[0] for p in lr], [p[1] for p in lr]]
        else:
            raise ValueError(f"FLAC channel assignment {ch_code} reserved")

        bits.align()
        body = payload[frame_start : bits.byte]
        if bits.byte + 2 > len(payload):
            raise ValueError("FLAC frame footer truncated")
        (want_crc,) = struct.unpack_from(">H", payload, bits.byte)
        if _crc16(body) != want_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.byte + 2
        for c in range(nch):
            channels[c].extend(subs[c])
        if total and len(channels[0]) >= total:
            break

    arr = np.array(channels, dtype=np.int32).T
    if total:
        arr = arr[:total]
    return arr, rate


# --- the encoder twin -------------------------------------------------------


def _write_utf8_number(w: _BitWriter, v: int) -> None:
    """UTF-8-style coded number, 1- and 2-byte forms (enough for any
    realistic frame index in the twin; the decoder reads all 7)."""
    if v < 0x80:
        w.write(v, 8)
        return
    if v >= 0x800:
        raise ValueError("frame number too large for the twin encoder")
    w.write(0xC0 | (v >> 6), 8)
    w.write(0x80 | (v & 0x3F), 8)


def _write_residual(
    w: _BitWriter, resid: list[int], order: int, *, porder: int = 0,
    escape_raw: bool = False, method: int = 0,
) -> None:
    w.write(method, 2)
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    w.write(porder, 4)
    n_part = 1 << porder
    blocksize = len(resid) + order
    idx = 0
    for p in range(n_part):
        count = blocksize // n_part - (order if p == 0 else 0)
        chunk = resid[idx : idx + count]
        idx += count
        zz = [(e << 1) if e >= 0 else ((-e << 1) - 1) for e in chunk]
        if escape_raw:
            raw = max((abs(e).bit_length() + 1 for e in chunk), default=1)
            w.write(escape, plen)
            w.write(raw, 5)
            for e in chunk:
                w.write(e & ((1 << raw) - 1), raw)
            continue
        # pick the smallest parameter that keeps quotients <= 3
        param = 0
        while any((z >> param) > 3 for z in zz) and param < escape - 1:
            param += 1
        w.write(param, plen)
        for z in zz:
            q = z >> param
            w.write(1, q + 1)  # q zeros then a one... (write value 1 in q+1 bits)
            if param:
                w.write(z & ((1 << param) - 1), param)


def _write_subframe(
    w: _BitWriter, samples: list[int], bps: int, kind: str, *,
    porder: int = 0, escape_raw: bool = False, method: int = 0,
    wasted: int = 0,
) -> None:
    w.write(0, 1)
    eff = bps - wasted
    vals = [s >> wasted for s in samples]
    if kind == "constant":
        w.write(0, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write(1, wasted)  # wasted-1 zeros then the terminating 1
        w.write(vals[0] & ((1 << eff) - 1), eff)
        return
    if kind == "verbatim":
        w.write(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        w.write(8 + order, 6)
    elif kind == "lpc":
        order = 2
        w.write(32 + (order - 1), 6)
    else:
        raise ValueError(kind)
    w.write(1 if wasted else 0, 1)
    if wasted:
        w.write(1, wasted)
    if kind == "verbatim":
        for s in vals:
            w.write(s & ((1 << eff) - 1), eff)
        return
    if kind.startswith("fixed"):
        coefs, shift = _FIXED_COEFS[order], 0
    else:
        coefs, shift = [5, -2], 1  # pred = (5*s1 - 2*s2) >> 1
    for s in vals[:order]:
        w.write(s & ((1 << eff) - 1), eff)
    if kind == "lpc":
        prec = 5
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
    resid = []
    for i in range(order, len(vals)):
        acc = sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
        resid.append(vals[i] - (acc >> shift))
    _write_residual(w, resid, order, porder=porder, escape_raw=escape_raw, method=method)


def encode_flac(
    pcm,
    rate: int = 44100,
    *,
    blocksize: int = 1024,
    subframe: str = "fixed2",
    stereo: str = "independent",
    porder: int = 0,
    escape_raw: bool = False,
    method: int = 0,
    wasted: int = 0,
) -> bytes:
    """(n, ch) int16-range array -> a complete FLAC stream driving the
    chosen decode path: ``subframe`` in constant/verbatim/fixed0-4/lpc,
    ``stereo`` in independent/left_side/right_side/mid_side, plus Rice
    partition order, the escaped-raw partition form, the 5-bit Rice2
    method, and wasted-bits emission (callers pass samples whose low
    ``wasted`` bits are zero)."""
    import numpy as np

    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    bps = 16

    sbits = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    streaminfo = bytes(10) + sbits.to_bytes(8, "big") + bytes(16)
    out = bytearray(b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo)

    for f, start in enumerate(range(0, n, blocksize)):
        block = pcm[start : start + blocksize]
        bs = len(block)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # block size: 16-bit escape
        w.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = {"independent": nch - 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}[stereo]
        w.write(ch_code, 4)
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        _write_utf8_number(w, f)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w = _BitWriter()
        for b in hdr:
            w.write(b, 8)
        w.write(_crc8(hdr), 8)

        kw = dict(porder=porder, escape_raw=escape_raw, method=method, wasted=wasted)
        if stereo == "independent":
            for c in range(nch):
                _write_subframe(w, block[:, c].tolist(), bps, subframe, **kw)
        else:
            l, r = block[:, 0].tolist(), block[:, 1].tolist()
            side = [a - b for a, b in zip(l, r)]
            if stereo == "left_side":
                _write_subframe(w, l, bps, subframe, **kw)
                _write_subframe(w, side, bps + 1, subframe, **kw)
            elif stereo == "right_side":
                _write_subframe(w, side, bps + 1, subframe, **kw)
                _write_subframe(w, r, bps, subframe, **kw)
            else:
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                _write_subframe(w, mid, bps, subframe, **kw)
                _write_subframe(w, side, bps + 1, subframe, **kw)
        w.align()
        body = w.bytes()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)
