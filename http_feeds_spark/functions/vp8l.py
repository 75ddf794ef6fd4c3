"""WebP lossless (VP8L) codec — stdlib + numpy only, r12.

Why this exists: lossless WebP is a meaningful share of real web-crawl
images, and unlike lossy WebP (VP8's boolean arithmetic coder — the
documented out-of-scope boundary) the VP8L bitstream is prefix-coded:
canonical Huffman codes, an LZ77 back-reference layer, a color cache,
and four invertible spatial transforms. That is squarely in this
repo's stdlib-decoder tier (the GIF/PNG/JPEG precedent), so a 100 TB
corpus router can decode VP8L locally instead of routing it out.

Implemented from the PUBLIC bitstream specification (RFC 9649 — the
"WebP Image Format" RFC; equivalently the VP8L bitstream document in
the libwebp tree) — decode side in full:

- LSB-first bit reader; canonical prefix codes read bit by bit;
- "simple" (1-2 symbol) and "normal" code transmission — the 19-symbol
  code-length code in kCodeLengthCodeOrder, repeats 16/17/18, the
  optional max_symbol cutoff;
- meta-prefix (entropy image) selecting one of many prefix-code groups
  per tile; 5 codes per group (green+length+cache / red / blue / alpha
  / distance);
- LZ77: length/distance prefix values with extra bits, the 120-entry
  close-neighborhood distance map (generated from the spec's
  construction: the (x, y) window sorted by x²+y², larger y first,
  positive x before negative — asserted against the published table's
  prefix), overlapping copies;
- color cache (multiplicative hash 0x1e35a7bd, 1-11 bits), inserted on
  literals and copies exactly as the reference decoder does;
- the four transforms, inverted in reverse bitstream order with the
  width each was read at: PREDICTOR (all 14 modes incl. Select and the
  two ClampAddSubtract variants, 1-D neighbor addressing at row ends),
  CROSS-COLOR (signed 3.5 fixed-point deltas), SUBTRACT-GREEN, and
  COLOR-INDEXING (delta-coded palette, sub-byte index bundling).

The encoder twin (`encode_vp8l`) is deliberately minimal but genuinely
general: literal pixels under per-channel canonical Huffman codes
(simple codes when a channel has ≤2 distinct values), with opt-in
paths that exist to drive the decoder's machinery in tests — run-length
LZ77 (`use_lz77`), a color cache (`cache_bits`), SUBTRACT_GREEN,
constant-mode PREDICTOR tiles, and COLOR_INDEXING with bundling
(`palette=True`). Encode→decode is pixel-exact (the format is
lossless), giving the same twin-oracle discipline as the GIF/PNG/JPEG
tiers. Scalar Python in the hot loop is acceptable here: payloads
decode inside Arrow-batched workers that parallelize across documents,
and triage (parse_image_meta) gates which payloads pay a decode at all.
"""

from __future__ import annotations

import struct


# --- bit I/O ---------------------------------------------------------------


class _Bits:
    """LSB-first bit reader over bytes (the VP8L stream order)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("VP8L stream truncated")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_bit(self) -> int:
        return self.read(1)


class _BitWriter:
    """LSB-first bit writer (the encoder twin of :class:`_Bits`)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a canonical Huffman code: the decoder walks bit by bit
        from the code's MSB, so bits go out MSB-first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


# --- canonical prefix codes ------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical rule (shorter codes
    first, ties by symbol order) — the assignment both RFC 9649 and
    DEFLATE use."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for length in lengths:
        if length:
            bl_count[length] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for li in range(1, max_len + 1):
        code = (code + bl_count[li - 1]) << 1
        next_code[li] = code
    out = {}
    for sym, length in enumerate(lengths):
        if length:
            out[sym] = (next_code[length], length)
            next_code[length] += 1
    return out


class _Huff:
    """Bit-by-bit canonical decoder. ``single`` short-circuits the
    0-bit one-symbol code the simple transmission allows."""

    def __init__(self, lengths: list[int], single: int | None = None):
        self.single = single
        self.table: dict[tuple[int, int], int] = {}
        if single is None:
            nz = [l for l in lengths if l]
            if not nz:
                raise ValueError("VP8L prefix code with no symbols")
            if len(nz) == 1:
                # one used symbol transmitted through the NORMAL path:
                # also a 0-bit code (the reference decoder's behavior)
                self.single = next(i for i, l in enumerate(lengths) if l)
                return
            kraft = sum(1 / (1 << l) for l in nz)
            if abs(kraft - 1.0) > 1e-9:
                raise ValueError("VP8L prefix code is not complete")
            for sym, (code, length) in _canonical_codes(lengths).items():
                self.table[(length, code)] = sym

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | bits.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L prefix code read past 15 bits")


_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code(bits: _Bits, alphabet_size: int) -> _Huff:
    """One prefix code: the simple (1-2 symbol) or normal (code-length
    code + repeats) transmission of RFC 9649."""
    if bits.read_bit():  # simple
        num_symbols = bits.read_bit() + 1
        sym0 = bits.read(8 if bits.read_bit() else 1)
        if num_symbols == 1:
            return _Huff([], single=sym0)
        sym1 = bits.read(8)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size or sym1 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of alphabet")
        lengths[sym0] = lengths[sym1] = 1
        return _Huff(lengths)
    num_code_lengths = 4 + bits.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = bits.read(3)
    cl_huff = _Huff(cl_lengths)
    lengths = [0] * alphabet_size
    if bits.read_bit():  # explicit max_symbol
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol, prev_len = 0, 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_huff.decode(bits)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            extra, base = {16: (2, 3), 17: (3, 3), 18: (7, 11)}[code_len]
            repeat = bits.read(extra) + base
            fill = prev_len if code_len == 16 else 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _Huff(lengths)


# --- LZ77 helpers ----------------------------------------------------------


def _prefix_value(code: int, bits: _Bits) -> int:
    """Length/distance prefix decoding: codes 0-3 are literal 1-4;
    above, (2 + (code&1)) << extra + extra_bits + 1."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


def _prefix_emit(value: int, w: _BitWriter, codes: dict[int, tuple[int, int]]) -> None:
    """Encoder inverse of :func:`_prefix_value`."""
    v = value - 1
    if v < 4:
        code, extra, rest = v, 0, 0
    else:
        nbits = v.bit_length() - 1
        rest = v - (1 << nbits)
        code = 2 * nbits + (rest >> (nbits - 1))
        extra = nbits - 1
        rest &= (1 << extra) - 1
    c, length = codes[code]
    w.write_code(c, length)
    if extra:
        w.write(rest, extra)


def _distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry close-neighborhood table, generated from
    its construction: offsets (x, y) with y in 0..7 (x 1..8 on the
    current row, -7..8 above), ordered by squared distance, larger y
    first within a tie, positive x before negative."""
    pts = [(x, 0) for x in range(1, 9)]
    pts += [(x, y) for y in range(1, 8) for x in range(-7, 9)]
    pts.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), p[0] < 0))
    return pts[:120]


_DIST_MAP = _distance_map()
# the first rows of the published table — a transcription check on the
# generated ordering (RFC 9649 §4.2.2 lists all 120)
assert _DIST_MAP[:24] == [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
]


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    x, y = _DIST_MAP[code - 1]
    return max(1, y * xsize + x)


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# --- the spatially-coded image ---------------------------------------------


_GROUP_ALPHABETS = (0, 256, 256, 256, 40)  # green filled in per cache size


def _decode_image(bits: _Bits, xsize: int, ysize: int, level0: bool, transforms=None):
    """DecodeImageStream: optional transforms (level 0 only), color
    cache, meta-prefix entropy image, prefix-code groups, then the
    LZ77 + cache pixel stream. Returns a flat list of ARGB ints (and
    appends read transforms to ``transforms``)."""
    if level0:
        seen = set()
        while bits.read_bit():
            ttype = bits.read(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype in (0, 1):  # PREDICTOR / CROSS-COLOR
                size_bits = bits.read(3) + 2
                tw = -(-xsize // (1 << size_bits))
                th = -(-ysize // (1 << size_bits))
                tiles = _decode_image(bits, tw, th, False)
                transforms.append((ttype, xsize, size_bits, tiles))
            elif ttype == 2:  # SUBTRACT-GREEN
                transforms.append((2, xsize, 0, None))
            else:  # COLOR-INDEXING
                num_colors = bits.read(8) + 1
                wb = 0 if num_colors > 16 else (1 if num_colors > 4 else (2 if num_colors > 2 else 3))
                pal = _decode_image(bits, num_colors, 1, False)
                for i in range(1, len(pal)):  # delta-coded per channel
                    pal[i] = _add_pixels(pal[i], pal[i - 1])
                transforms.append((3, xsize, wb, pal))
                xsize = -(-xsize // (1 << wb))

    cache_bits = bits.read(4) if bits.read_bit() else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    huffman_bits = 0
    num_groups = 1
    if bits.read_bit():  # meta prefix codes
        huffman_bits = bits.read(3) + 2
        mw = -(-xsize // (1 << huffman_bits))
        mh = -(-ysize // (1 << huffman_bits))
        meta = _decode_image(bits, mw, mh, False)
        num_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(tuple(
            _read_code(bits, green_alpha if i == 0 else _GROUP_ALPHABETS[i])
            for i in range(5)
        ))

    n = xsize * ysize
    out: list[int] = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            mw = -(-xsize // (1 << huffman_bits))
            gidx = (meta[(y >> huffman_bits) * mw + (x >> huffman_bits)] >> 8) & 0xFFFF
            g = groups[gidx]
        else:
            g = groups[0]
        sym = g[0].decode(bits)
        if sym < 256:  # literal
            red = g[1].decode(bits)
            blue = g[2].decode(bits)
            alpha = g[3].decode(bits)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif sym < 280:  # back-reference
            length = _prefix_value(sym - 256, bits)
            dist_code = _prefix_value(g[4].decode(bits), bits)
            dist = _plane_to_distance(dist_code, xsize)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L back-reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            out[pos] = cache[sym - 280]
            pos += 1
    return out


def _add_pixels(a: int, b: int) -> int:
    """Per-channel modular sum of two ARGB ints."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


# --- inverse transforms ----------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(left: int, top: int, topleft: int) -> int:
    pl = pt = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (topleft >> sh) & 0xFF
        p = lc + tc - tlc
        pl += abs(p - lc)
        pt += abs(p - tc)
    return left if pl < pt else top


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _cas_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _cas_half(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        ac = (a >> sh) & 0xFF
        bc = (b >> sh) & 0xFF
        out |= _clamp(ac + int((ac - bc) / 2)) << sh
    return out


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _cas_full(left, top, topleft)
    if mode == 13:
        return _cas_half(_avg2(left, top), topleft)
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _inv_predictor(data: list[int], xsize: int, size_bits: int, tiles: list[int]) -> None:
    tw = -(-xsize // (1 << size_bits))
    ysize = len(data) // xsize
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = data[i - 1]
            elif x == 0:
                pred = data[i - xsize]
            else:
                mode = (tiles[(y >> size_bits) * tw + (x >> size_bits)] >> 8) & 0xFF
                # 1-D neighbor addressing: TR of the last column is the
                # first pixel of the CURRENT row (spec behavior)
                pred = _predict(
                    mode, data[i - 1], data[i - xsize],
                    data[i - xsize - 1], data[i - xsize + 1],
                )
            data[i] = _add_pixels(data[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_cross_color(data: list[int], xsize: int, size_bits: int, tiles: list[int]) -> None:
    tw = -(-xsize // (1 << size_bits))
    ysize = len(data) // xsize
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            cte = tiles[(y >> size_bits) * tw + (x >> size_bits)]
            g2r = cte & 0xFF            # blue channel
            g2b = (cte >> 8) & 0xFF     # green channel
            r2b = (cte >> 16) & 0xFF    # red channel
            px = data[i]
            g = (px >> 8) & 0xFF
            red = ((px >> 16) & 0xFF) + _ct_delta(g2r, g) & 0xFF
            blue = ((px & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, red)) & 0xFF
            data[i] = (px & 0xFF00FF00) | (red << 16) | blue


def _inv_subtract_green(data: list[int]) -> None:
    for i, px in enumerate(data):
        g = (px >> 8) & 0xFF
        red = (((px >> 16) & 0xFF) + g) & 0xFF
        blue = ((px & 0xFF) + g) & 0xFF
        data[i] = (px & 0xFF00FF00) | (red << 16) | blue


def _inv_color_index(data: list[int], full_xsize: int, wb: int, pal: list[int]) -> list[int]:
    packed_xsize = -(-full_xsize // (1 << wb))
    ysize = len(data) // packed_xsize
    out = [0] * (full_xsize * ysize)
    per = 1 << wb
    ibits = 8 >> wb
    mask = (1 << ibits) - 1
    for y in range(ysize):
        for px_x in range(packed_xsize):
            green = (data[y * packed_xsize + px_x] >> 8) & 0xFF
            for k in range(per):
                x = px_x * per + k
                if x >= full_xsize:
                    break
                idx = (green >> (k * ibits)) & mask
                out[y * full_xsize + x] = pal[idx] if idx < len(pal) else 0
    return out


# --- public decode ---------------------------------------------------------


def decode_vp8l(stream: bytes):
    """VP8L chunk payload -> (H, W, 3) uint8 RGB (alpha dropped, the
    RGBA-PNG convention). Raises ValueError on torn/invalid streams."""
    import numpy as np

    if not stream or stream[0] != 0x2F:
        raise ValueError("VP8L signature byte missing")
    bits = _Bits(stream, 1)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read(1)  # alpha-is-used hint
    if bits.read(3) != 0:
        raise ValueError("VP8L version must be 0")

    # _decode_image reads the transforms itself (reducing its own width
    # for palette bundling) and records each with the width it was read
    # at; the inverses then apply in REVERSE bitstream order
    transforms: list = []
    data = _decode_image(bits, w, h, True, transforms)
    for ttype, at_xsize, arg, payload in reversed(transforms):
        if ttype == 0:
            _inv_predictor(data, at_xsize, arg, payload)
        elif ttype == 1:
            _inv_cross_color(data, at_xsize, arg, payload)
        elif ttype == 2:
            _inv_subtract_green(data)
        else:
            data = _inv_color_index(data, at_xsize, arg, payload)

    arr = np.array(data, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = (arr >> 16) & 0xFF
    rgb[:, :, 1] = (arr >> 8) & 0xFF
    rgb[:, :, 2] = arr & 0xFF
    return rgb


def decode_webp(payload: bytes):
    """RIFF/WEBP container -> (H, W, 3). Decodes the lossless (VP8L)
    stream, including one wrapped in a VP8X extended container; lossy
    VP8 raises ValueError (the arithmetic-coder boundary — triage
    routes those out)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("torn WebP chunk")
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise ValueError(
                "lossy WebP (VP8 arithmetic coding) has no local decoder"
            )
        pos += 8 + clen + (clen & 1)
    raise ValueError("WebP container has no VP8L chunk")


# --- the encoder twin ------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Canonical code lengths from frequencies, length-limited by
    frequency flattening (halve-and-retry — converges to the flat code,
    depth ceil(log2(n)) <= max_len for every alphabet here)."""
    import heapq
    import itertools

    if len(freqs) < 2:
        raise ValueError("need >= 2 symbols for a normal code")
    f = dict(freqs)
    while True:
        counter = itertools.count()
        heap = [(weight, next(counter), sym) for sym, weight in f.items()]
        heapq.heapify(heap)
        while len(heap) > 1:
            w1, _, n1 = heapq.heappop(heap)
            w2, _, n2 = heapq.heappop(heap)
            heapq.heappush(heap, (w1 + w2, next(counter), (n1, n2)))
        lengths: dict[int, int] = {}

        def walk(node, depth):
            if isinstance(node, tuple):
                walk(node[0], depth + 1)
                walk(node[1], depth + 1)
            else:
                lengths[node] = max(depth, 1)

        walk(heap[0][2], 0)
        if max(lengths.values()) <= max_len:
            return lengths
        f = {s: (w + 1) // 2 for s, w in f.items()}


def _write_code(w: _BitWriter, lengths_by_sym: dict[int, int], alphabet: int):
    """Transmit one prefix code. <=2 used symbols -> the simple form;
    else the normal form with all 19 code-length slots and no repeats
    (legal, just not maximally compact). Returns symbol->(code,len)."""
    used = sorted(lengths_by_sym)
    # the simple form carries symbols in at most 8 bits — length/cache
    # symbols of the green alphabet (>= 256) need the normal form
    if len(used) == 1 and used[0] <= 255:
        w.write(1, 1)  # simple
        w.write(0, 1)  # one symbol
        if used[0] < 2:
            w.write(0, 1)
            w.write(used[0], 1)
        else:
            w.write(1, 1)
            w.write(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 1:  # single symbol > 255: a 1-entry normal code
        lengths_by_sym = dict(lengths_by_sym)
        lengths_by_sym[used[0]] = 1
        used = sorted(lengths_by_sym)
        # fall through to the normal form below (a lone nonzero length
        # is the reference decoder's 0-bit single-symbol case)
    if (
        len(used) == 2
        and max(used) <= 255
        and all(lengths_by_sym[s] == 1 for s in used)
    ):
        w.write(1, 1)  # simple, two symbols
        w.write(1, 1)
        if used[0] < 2:
            w.write(0, 1)
            w.write(used[0], 1)
        else:
            w.write(1, 1)
            w.write(used[0], 8)
        w.write(used[1], 8)
        full = [0] * alphabet
        full[used[0]] = full[used[1]] = 1
        return _canonical_codes(full)
    w.write(0, 1)  # normal
    full = [0] * alphabet
    for s, l in lengths_by_sym.items():
        full[s] = l
    # the code-length code covers every distinct length value (incl. 0)
    cl_freqs: dict[int, int] = {}
    for l in full:
        cl_freqs[l] = cl_freqs.get(l, 0) + 1
    if len(cl_freqs) == 1:
        # degenerate: every slot the same length (a flat complete code);
        # give the single used code-length symbol a 1-bit code by
        # pairing it with an unused partner of length 1
        only = next(iter(cl_freqs))
        partner = 0 if only != 0 else 1
        cl_lengths = {only: 1, partner: 1}
    else:
        cl_lengths = _huffman_lengths(cl_freqs, 7)
    w.write(15, 4)  # num_code_lengths - 4 = 15 -> all 19 slots
    cl_arr = [0] * 19
    for s, l in cl_lengths.items():
        cl_arr[s] = l
    for i in range(19):
        w.write(cl_arr[_CODE_LENGTH_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_arr)
    w.write(0, 1)  # no max_symbol cutoff: emit every slot
    for l in full:
        code, length = cl_codes[l]
        w.write_code(code, length)
    if sum(1 for l in full if l) == 1:
        # a lone nonzero length decodes as the 0-bit single-symbol code
        return {used[0]: (0, 0)}
    return _canonical_codes(full)


def encode_vp8l(
    img,
    *,
    use_lz77: bool = False,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    palette: bool = False,
) -> bytes:
    """(H, W, 3) uint8 -> a complete RIFF/WEBP lossless payload.

    Literal-pixel canonical-Huffman encoding by default; the keyword
    paths exist to drive every decoder mechanism from tests: run-length
    LZ77 back-references, a color cache, the SUBTRACT_GREEN transform,
    a constant-mode PREDICTOR transform, and COLOR_INDEXING with
    sub-byte bundling. Lossless: decode(encode(img)) == img exactly."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    pixels = [
        (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b in img.reshape(-1, 3)
    ]

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    enc_xsize = w
    if predictor_mode is not None:
        size_bits = 4
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(size_bits - 2, 3)
        tw = -(-w // (1 << size_bits))
        th = -(-h // (1 << size_bits))
        tile_px = [(0xFF << 24) | (predictor_mode << 8)] * (tw * th)
        _encode_spatial(bw, tile_px)
        pixels = _fwd_predictor(pixels, w, size_bits, predictor_mode)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        for i, px in enumerate(pixels):
            g = (px >> 8) & 0xFF
            red = (((px >> 16) & 0xFF) - g) & 0xFF
            blue = ((px & 0xFF) - g) & 0xFF
            pixels[i] = (px & 0xFF00FF00) | (red << 16) | blue
    if palette:
        uniq = sorted(set(pixels))
        if len(uniq) > 256:
            raise ValueError(f"VP8L palette overflow: {len(uniq)} colors")
        index = {px: i for i, px in enumerate(uniq)}
        n_colors = len(uniq)
        wb = 0 if n_colors > 16 else (1 if n_colors > 4 else (2 if n_colors > 2 else 3))
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        deltas = [uniq[0]] + [
            _sub_pixels(uniq[i], uniq[i - 1]) for i in range(1, n_colors)
        ]
        _encode_spatial(bw, deltas)
        per = 1 << wb
        ibits = 8 >> wb
        packed_w = -(-w // per)
        packed = [0] * (packed_w * h)
        for y in range(h):
            for px_x in range(packed_w):
                green = 0
                for k in range(per):
                    x = px_x * per + k
                    if x >= w:
                        break
                    green |= index[pixels[y * w + x]] << (k * ibits)
                packed[y * packed_w + px_x] = (0xFF << 24) | (green << 8)
        pixels = packed
        enc_xsize = packed_w
    bw.write(0, 1)  # end of transforms

    _encode_spatial(bw, pixels, use_lz77=use_lz77, cache_bits=cache_bits)
    stream = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _sub_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _fwd_predictor(pixels: list[int], xsize: int, size_bits: int, mode: int) -> list[int]:
    """Forward (encoder-side) constant-mode predictor: residual =
    pixel - pred, with the spec's edge rules."""
    ysize = len(pixels) // xsize
    out = [0] * len(pixels)
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - xsize]
            else:
                pred = _predict(
                    mode, pixels[i - 1], pixels[i - xsize],
                    pixels[i - xsize - 1], pixels[i - xsize + 1],
                )
            out[i] = _sub_pixels(pixels[i], pred)
    return out


def _encode_spatial(bw: _BitWriter, pixels: list[int], *, use_lz77: bool = False,
                    cache_bits: int = 0) -> None:
    """One spatially-coded image: no meta groups, optional color cache,
    canonical per-channel codes, optional run-length LZ77 (dist in the
    extended >120 code space so the map is exercised decoder-side by
    real corpus files, not the twin)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache = [None] * (1 << cache_bits)
    else:
        bw.write(0, 1)
        cache = None
    bw.write(0, 1)  # no meta prefix codes

    # token stream: ('lit', px) / ('cache', idx) / ('ref', length)
    tokens = []
    i, n = 0, len(pixels)
    while i < n:
        if use_lz77 and i and pixels[i] == pixels[i - 1]:
            run = 1
            while i + run < n and pixels[i + run] == pixels[i - 1 + run] and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("ref", run))
                if cache is not None:
                    for j in range(i, i + run):
                        cache[_cache_key(pixels[j], cache_bits)] = pixels[j]
                i += run
                continue
        px = pixels[i]
        if cache is not None:
            key = _cache_key(px, cache_bits)
            if cache[key] == px:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = px
        tokens.append(("lit", px))
        i += 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    freqs = [dict() for _ in range(5)]

    def bump(ci, sym):
        freqs[ci][sym] = freqs[ci].get(sym, 0) + 1

    def len_prefix_code(value):
        v = value - 1
        if v < 4:
            return v
        nbits = v.bit_length() - 1
        return 2 * nbits + ((v - (1 << nbits)) >> (nbits - 1))

    for kind, arg in tokens:
        if kind == "lit":
            bump(0, (arg >> 8) & 0xFF)
            bump(1, (arg >> 16) & 0xFF)
            bump(2, arg & 0xFF)
            bump(3, (arg >> 24) & 0xFF)
        elif kind == "cache":
            bump(0, 280 + arg)
        else:
            bump(0, 256 + len_prefix_code(arg))
            bump(4, len_prefix_code(1 + 120))  # dist_code 121 -> dist 1

    codes = []
    for ci, alphabet in enumerate((green_alpha, 256, 256, 256, 40)):
        f = freqs[ci]
        if not f:
            f = {0: 1}  # unused channel: a 1-symbol code, zero bits/use
        if len(f) >= 3:
            lengths = _huffman_lengths(f, 15)
        elif len(f) == 2:
            lengths = {s: 1 for s in f}
        else:
            lengths = {next(iter(f)): 0}
        codes.append(_write_code(bw, lengths, alphabet))

    def emit(ci, sym):
        code, length = codes[ci][sym]
        bw.write_code(code, length)

    for kind, arg in tokens:
        if kind == "lit":
            emit(0, (arg >> 8) & 0xFF)
            emit(1, (arg >> 16) & 0xFF)
            emit(2, arg & 0xFF)
            emit(3, (arg >> 24) & 0xFF)
        elif kind == "cache":
            emit(0, 280 + arg)
        else:
            _prefix_emit(arg, bw, {s: codes[0][256 + s] for s in range(24) if 256 + s in codes[0]})
            _prefix_emit(121, bw, codes[4])
