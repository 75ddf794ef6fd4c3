"""Baseline JPEG (ISO/IEC 10918-1) decode with ZERO new dependencies —
stdlib ``struct`` + numpy, the same posture as the PNG codec in
functions/multimodal.py.

Scope (the honest tier split the multimodal module documents):

- **decode_jpeg** — REAL baseline sequential DCT decode: marker parse
  (APPn/COM skipped, DQT 8/16-bit, SOF0/SOF1, DHT canonical tables, DRI),
  Huffman entropy decode with byte-unstuffing and RST0-7 restart
  handling, DC prediction, AC run-length/ZRL/EOB, dequantization,
  de-zigzag, float 2-D IDCT (one batched matmul per component — the
  numpy hot path), sampling-factor chroma upsampling (4:4:4/4:2:2/4:2:0),
  and JFIF YCbCr→RGB. Grayscale (1-component) replicates to (H, W, 3) so
  every decode_rgb format returns the same shape. Progressive (SOF2),
  arithmetic coding, 12-bit precision, and hierarchical modes raise
  ValueError — the skip-don't-crash tier at the operator layer, exactly
  like 16-bit/interlaced PNG.
- **encode_jpeg** — the minimal export/test twin (NOT required by the
  corpus path, which only reads): 4:4:4 or 4:2:0, IJG quality scaling of
  the Annex-K quantization tables, single-length canonical Huffman
  tables (12 DC codes at 4 bits, 162 AC codes at 8 bits — valid DHT,
  slightly larger files, radically simpler tables than Annex K's), and
  optional restart intervals so the decoder's DRI/RST path is genuinely
  exercised. Round-trip error is bounded by quantization alone: at
  quality 100 every table entry is 1 and decode(encode(img)) lands
  within the classical DCT round-trip tolerance (pinned ≤ 2/255 per
  sample in tests).

Throughput honesty: the entropy decode walks bits in Python — fine
inside an Arrow-batched mapInPandas worker for thumbnail-scale corpus
images and tests, and the IDCT (the arithmetic bulk) is vectorized; a
production 100 TB image pipeline would swap this tier for a native
codec behind the same decode_rgb contract.
"""

from __future__ import annotations

import struct

# zigzag position k -> natural (row-major) coefficient index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 quantization tables (natural order after de-zigzag is
# NOT needed here: these are conventionally given in zigzag order and
# written to DQT verbatim)
_QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _dct_matrix():
    """M with M[k, n] = 0.5·c(k)·cos((2n+1)kπ/16): forward C = M·B·Mᵀ,
    inverse B = Mᵀ·C·M (orthonormal, so the pair is exact in float)."""
    import numpy as np

    m = np.zeros((8, 8))
    for k in range(8):
        ck = (1.0 / np.sqrt(2.0)) if k == 0 else 1.0
        for n in range(8):
            m[k, n] = 0.5 * ck * np.cos((2 * n + 1) * k * np.pi / 16.0)
    return m


# --- decoder ---------------------------------------------------------------


class _Bits:
    """Entropy-segment bit reader: 0xFF00 byte-unstuffing inline; any
    other marker mid-read is a malformed stream (ValueError). Restart
    markers are consumed by the MCU loop via ``restart()``, never here."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                if self.data[self.pos + 1] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 2
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker (n = expect mod 8)."""
        self.n = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (expect & 7):
            raise ValueError("missing restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _huff_decode(bits: _Bits, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | bits.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _canonical_table(counts: list[int], values: list[int]) -> dict:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} per Annex C."""
    out, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return out


def decode_jpeg(payload: bytes):
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB (grayscale replicated).
    Raises ValueError on non-baseline variants — see module docstring."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("EOI before scan data")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                else:
                    vals = [v for (v,) in struct.iter_unpack(">H", seg[i : i + 128])]
                    i += 128
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = vals  # de-zigzag into natural order
                qt[tid] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported (want 8)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"sampling {hs}x{vs} unsupported")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic) unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                nvals = sum(counts)
                values = list(seg[i + 17 : i + 17 + nvals])
                huff[(tc, th)] = _canonical_table(counts, values)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            h, w, comps = frame
            if ns != len(comps):
                raise ValueError("non-interleaved multi-scan JPEG unsupported")
            scan = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                np, payload, pos + 2 + seglen, frame, qt, huff, scan, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(np, payload, pos, frame, qt, huff, scan, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bits = _Bits(payload, pos)

    coefs = {cid: [] for cid, _, _, _ in comps}   # per-comp zigzag coef rows
    blkpos = {cid: [] for cid, _, _, _ in comps}  # (block_row, block_col)
    pred = {cid: 0 for cid, _, _, _ in comps}
    n_restarts = 0
    for mi in range(mcus_x * mcus_y):
        if restart_interval and mi and mi % restart_interval == 0:
            bits.restart(n_restarts)
            n_restarts += 1
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(mi, mcus_x)
        for cid, hs, vs, _tq in comps:
            dc_t = huff.get((0, scan[cid][0]))
            ac_t = huff.get((1, scan[cid][1]))
            if dc_t is None or ac_t is None:
                raise ValueError("scan references undefined Huffman table")
            for by in range(vs):
                for bx in range(hs):
                    zz = [0] * 64
                    s = _huff_decode(bits, dc_t)
                    pred[cid] += _extend(bits.receive(s), s) if s else 0
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient index overflow")
                        zz[k] = _extend(bits.receive(s), s)
                        k += 1
                    coefs[cid].append(zz)
                    blkpos[cid].append((my * vs + by, mx * hs + bx))

    m = _dct_matrix()
    planes = {}
    for cid, hs, vs, tq in comps:
        zz = np.asarray(coefs[cid], dtype=np.float64)  # (n, 64) zigzag
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8) * qt[tq][None, :, :]
        spatial = m.T[None] @ blocks @ m[None] + 128.0  # batched IDCT
        plane = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8))
        for b, (prow, pcol) in enumerate(blkpos[cid]):
            plane[prow * 8 : prow * 8 + 8, pcol * 8 : pcol * 8 + 8] = spatial[b]
        # sampling-factor upsample (nearest / pixel replication), crop
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        y = np.clip(np.rint(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    y, cb, cr = (planes[cid] for cid, _, _, _ in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --- encoder (export/test twin) ---------------------------------------------

# single-length canonical tables: 12 DC categories at 4 bits, 162 AC
# (run, size) symbols at 8 bits — valid DHT (the all-ones code stays
# unused in both), trivially invertible, byte-cost paid only by tests
_DC_VALUES = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_VALUES = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
_AC_COUNTS = [0] * 7 + [162] + [0] * 8
_DC_CODE = {v: (4, i) for i, v in enumerate(_DC_VALUES)}
_AC_CODE = {v: (8, i) for i, v in enumerate(_AC_VALUES)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per the spec


def _category(v: int) -> int:
    return abs(v).bit_length()


def _scaled_tables(quality: int):
    import numpy as np

    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUM, _QUANT_CHROMA):
        q = [(v * scale + 50) // 100 for v in base]
        out.append([min(255, max(1, v)) for v in q])
    return out  # zigzag order, ready for DQT


def encode_jpeg(
    img, quality: int = 95, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF JPEG bytes. ``subsample``
    switches 4:4:4 to 4:2:0 (2×2-mean chroma); ``restart_interval``
    (in MCUs) emits DRI + RSTn markers. See module docstring for why
    this exists and what it deliberately does not optimize."""
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg wants (H, W, 3) uint8")
    h, w = a.shape[:2]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qzz = _scaled_tables(quality)
    qnat = []
    for zz in qzz:
        nat = np.zeros(64)
        nat[ZIGZAG] = zz
        qnat.append(nat.reshape(8, 8))

    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # pad to even before the 2x2 mean (edge replicate)
        ph, pw = h + (h & 1), w + (w & 1)
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def padded(plane, hs, vs):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        return np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge"
        )

    planes = [padded(p, s[0], s[1]) for p, s in zip(planes, samp)]
    m = _dct_matrix()

    def quantized_block(plane, prow, pcol, qtab):
        blk = plane[prow * 8 : prow * 8 + 8, pcol * 8 : pcol * 8 + 8] - 128.0
        coef = m @ blk @ m.T
        return np.rint(coef / qtab).astype(np.int64)

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_restarts = 0
    for mi in range(mcus_x * mcus_y):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.pad()
            bw.out += bytes([0xFF, 0xD0 + (n_restarts & 7)])
            n_restarts += 1
            pred = [0, 0, 0]
        my, mx = divmod(mi, mcus_x)
        for ci, (plane, (hs, vs)) in enumerate(zip(planes, samp)):
            qtab = qnat[0] if ci == 0 else qnat[1]
            for by in range(vs):
                for bx in range(hs):
                    q = quantized_block(plane, my * vs + by, mx * hs + bx, qtab)
                    zz = q.reshape(64)[ZIGZAG]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s = _category(diff)
                    ln, code = _DC_CODE[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                    run = 0
                    last_nz = max(
                        (k for k in range(1, 64) if zz[k]), default=0
                    )
                    for k in range(1, last_nz + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = _AC_CODE[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = _category(v)
                        ln, code = _AC_CODE[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last_nz < 63:
                        ln, code = _AC_CODE[0x00]
                        bw.write(code, ln)
    bw.pad()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qzz[0]))
    out += seg(0xDB, bytes([0x01]) + bytes(qzz[1]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for tc, th in ((0, 0), (1, 0), (0, 1), (1, 1)):
        counts, values = (
            (_DC_COUNTS, _DC_VALUES) if tc == 0 else (_AC_COUNTS, _AC_VALUES)
        )
        out += seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(values)
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci in range(3):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
