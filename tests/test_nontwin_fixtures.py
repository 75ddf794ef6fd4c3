"""Non-twin decoder fixtures (r13 — the r12 verdict's missing #4).

Every codec in the package is pinned against its own encoder twin plus
hand-packed wire fixtures; a co-evolved encode/decode misunderstanding
of a spec corner would pass both. These fixtures close that class: each
payload here is produced by an INDEPENDENT encoder written in this test
directly from the published specification — sharing no code, tables, or
structural choices with the package encoders — or is a fully hand-packed
byte stream whose entropy bits were computed by hand. Concretely:

- JPEG baseline: hand-packed grayscale stream with CUSTOM minimal
  Huffman tables (not the Annex K tables jpeg.py ships), two blocks
  exercising DC prediction across a negative differential;
- JPEG progressive: hand-packed three-scan stream (DC-first with point
  transform, DC refinement, AC-first EOB) — the encoder twin never emits
  single-component progressive streams with these table shapes;
- PNG: an independent Adam7 writer with PER-ROW CYCLING filter types
  (the package encoder applies one filter to every row);
- GIF: an independent LZW packer that emits a VOLUNTARY mid-stream
  CLEAR code (spec-legal; the package encoder only clears at 4096);
- FLAC: an independent frame writer using the uncommon
  blocksize-from-end-of-header forms (codes 6 and 8-bit / 7 and 16-bit)
  with verbatim subframes and its own bitwise CRC-8/CRC-16;
- AVI: a hand-packed RIFF container wrapping the hand-packed JPEG —
  both layers non-twin for the r13 video tier.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from http_feeds_spark.functions import multimodal as mm


# --- JPEG: hand-packed baseline + progressive -------------------------------


def _jpeg_tables(dc_vals: list[int], ac_vals: list[int]) -> bytes:
    """DHT segments for canonical tables with ONE code per length —
    deliberately minimal custom tables, not the Annex K defaults."""

    def dht(cls: int, vals: list[int]) -> bytes:
        lengths = [0] * 16
        for i in range(len(vals)):
            lengths[i] = 1  # one code per length: '0', '10', '110', ...
        body = bytes([cls << 4]) + bytes(lengths) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    return dht(0, dc_vals) + dht(1, ac_vals)


def _jpeg_headers(sof_marker: bytes, width: int, height: int) -> bytes:
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = (
        sof_marker
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([1, 1, 0x11, 0])
    )
    return b"\xff\xd8" + dqt + sof


def _sos(ss: int, se: int, ah: int, al: int) -> bytes:
    return (
        b"\xff\xda"
        + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
    )


def test_handpacked_baseline_jpeg_two_blocks():
    """16×8 grayscale, custom tables (DC: cat4→'0', cat5→'10'; AC:
    EOB→'0'), quant all-ones. Block 1 all-129 (DC diff +8), block 2
    all-127 (DC diff −16 — the negative-differential complement bits).
    Entropy stream hand-computed: 0 1000 0 | 10 01111 0 → 0x42 0x7B."""
    payload = (
        _jpeg_headers(b"\xff\xc0", 16, 8)
        + _jpeg_tables([4, 5], [0x00])
        + _sos(0, 63, 0, 0)
        + bytes([0x42, 0x7B])
        + b"\xff\xd9"
    )
    img = mm.decode_rgb(payload)
    assert img.shape == (8, 16, 3)
    assert (img[:, :8] == 129).all(), "block 1 must decode to all-129"
    assert (img[:, 8:] == 127).all(), "block 2 must decode to all-127"


def test_handpacked_progressive_jpeg_three_scans():
    """8×8 grayscale all-130 as a THREE-scan progressive stream: DC
    first with point transform Al=1 (sends 16>>1=8: bits 0 1000 →
    0x47), DC refinement Ah=1/Al=0 (one raw 0 bit → 0x7F), AC first
    over Ss=1..63 (one EOB code '0' → 0x7F). Final DC = (8<<1)|0 = 16
    → every pixel 130."""
    payload = (
        _jpeg_headers(b"\xff\xc2", 8, 8)
        + _jpeg_tables([4], [0x00])
        + _sos(0, 0, 0, 1)
        + bytes([0x47])
        + _sos(0, 0, 1, 0)
        + bytes([0x7F])
        + _sos(1, 63, 0, 0)
        + bytes([0x7F])
        + b"\xff\xd9"
    )
    img = mm.decode_rgb(payload)
    assert img.shape == (8, 8, 3)
    assert (img == 130).all(), "progressive reassembly must yield all-130"


# --- PNG: independent Adam7 writer with per-row cycling filters -------------

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
    upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - left
    elif ftype == 2:
        out = cur - prev
    elif ftype == 3:
        out = cur - (left + prev) // 2
    else:  # Paeth
        p = left + prev - upleft
        pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
        )
        out = cur - pred
    return bytes([ftype]) + (out % 256).astype(np.uint8).tobytes()


def _adam7_png(img: np.ndarray) -> bytes:
    """Independent interlaced writer: spec pass grids, filter type
    cycling (row index mod 5) WITHIN each pass's own scanline history."""
    h, w, _ = img.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        prev = np.zeros(sub.shape[1] * 3, np.uint8)
        for r in range(sub.shape[0]):
            cur = sub[r].reshape(-1)
            raw += _filter_row(r % 5, cur, prev, 3)
            prev = cur
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_independent_adam7_png_round_trip():
    img = mm.synth_image(seed=31, height=13, width=11)  # odd dims: ragged passes
    assert (mm.decode_rgb(_adam7_png(img)) == img).all()
    img2 = mm.synth_image(seed=32, height=16, width=24)
    assert (mm.decode_rgb(_adam7_png(img2)) == img2).all()


# --- GIF: independent LZW packer with voluntary mid-stream CLEAR ------------


def _gif_with_midstream_clear(pixels: list[int]) -> bytes:
    """4-color 1-row GIF whose LZW stream re-emits CLEAR after every two
    pixels — spec-legal (appendix F: the decoder must reset its table on
    ANY clear code), a shape the package encoder never produces."""
    w = len(pixels)
    mcs = 2  # min LZW code size for a 4-color palette
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes: list[int] = [clear]
    for i, p in enumerate(pixels):
        if i and i % 2 == 0:
            codes.append(clear)
        codes.append(p)
    codes.append(end)
    # LSB-first packing at a constant width of mcs+1 bits: the decoder
    # table never reaches 2^(mcs+1) entries between clears
    acc = n = 0
    out = bytearray()
    for c in codes:
        acc |= c << n
        n += mcs + 1
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    palette = bytes((
        10, 20, 30,   60, 70, 80,   110, 120, 130,   160, 170, 180,
    ))
    return (
        b"GIF89a"
        + struct.pack("<HH", w, 1)
        + bytes([0x81, 0, 0])  # GCT, 2-bit color
        + palette
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, 1) + b"\x00"
        + bytes([mcs, len(out)]) + bytes(out) + b"\x00"
        + b"\x3b"
    )


def test_gif_voluntary_clear_codes():
    pixels = [0, 1, 2, 3, 3, 0]
    img = mm.decode_rgb(_gif_with_midstream_clear(pixels))
    palette = [(10, 20, 30), (60, 70, 80), (110, 120, 130), (160, 170, 180)]
    want = np.array([[palette[p] for p in pixels]], np.uint8)
    assert (img == want).all()


# --- FLAC: independent writer, uncommon header forms, own CRCs --------------


def _crc8(data: bytes) -> int:
    """Bitwise CRC-8 poly 0x07 — implemented independently (the package
    uses its own routine; the spec fixes the polynomial)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = self.n = 0

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _flac_uncommon_headers(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono 16-bit FLAC: frame 0 uses blocksize code 6 (8-bit size at
    header end), frame 1 code 7 (16-bit size) — forms the package
    encoder never writes — with VERBATIM subframes."""
    n = len(samples)
    sbits = (rate << 44) | (0 << 41) | (15 << 36) | n
    streaminfo = bytes(10) + sbits.to_bytes(8, "big") + bytes(16)
    out = bytearray(b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo)
    half = n // 2
    for fno, (start, size, bs_code) in enumerate(
        ((0, half, 6), (half, n - half, 7))
    ):
        w = _BitW()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize stream
        w.write(bs_code, 4)
        w.write(0, 4)   # sample rate: from STREAMINFO
        w.write(0, 4)   # mono
        w.write(0b100, 3)  # 16-bit
        w.write(0, 1)
        w.write(fno, 8)  # UTF-8 frame number < 0x80
        w.write(size - 1, 8 if bs_code == 6 else 16)
        w.align()
        hdr = bytes(w.buf)
        body = _BitW()
        body.write(0b00000010, 8)  # pad 0, type 000001 (verbatim), no wasted
        for s in samples[start : start + size]:
            body.write(int(s) & 0xFFFF, 16)
        body.align()
        frame = hdr + bytes([_crc8(hdr)]) + bytes(body.buf)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def test_flac_uncommon_blocksize_headers():
    from http_feeds_spark.functions.flac import decode_flac

    rng = np.random.RandomState(13)
    samples = (rng.randn(300) * 9000).astype(np.int64).clip(-32768, 32767)
    pcm, rate = decode_flac(_flac_uncommon_headers(samples))
    assert rate == 8000
    assert pcm.shape == (300, 1)
    assert (pcm[:, 0] == samples).all()


# --- AVI: hand-packed container wrapping the hand-packed JPEG ---------------


def test_handpacked_avi_mjpeg():
    """A fully non-twin VIDEO fixture: the RIFF/AVI container packed by
    hand (struct literals, not encode_avi_mjpeg) around two copies of
    the hand-packed baseline JPEG above — neither layer shares code
    with any package encoder."""
    from http_feeds_spark.functions import video as vid

    jpeg = (
        _jpeg_headers(b"\xff\xc0", 16, 8)
        + _jpeg_tables([4, 5], [0x00])
        + _sos(0, 63, 0, 0)
        + bytes([0x42, 0x7B])
        + b"\xff\xd9"
    )

    def chunk(cc, body):
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<14I", 100000, 0, 0, 0x10, 2, 0, 1, 0, 16, 8, 0, 0, 0, 0)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 2, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 16, 8)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 16, 8, 1, 24, b"MJPG", 16 * 8 * 3, 0, 0, 0, 0)
    hdrl = chunk(
        b"LIST",
        b"hdrl" + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jpeg) + chunk(b"00dc", jpeg))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    meta = vid.parse_avi_meta(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 8, 2)
    frames = vid.decode_avi_frames(avi)
    assert len(frames) == 2
    for _, img in frames:
        assert (img[:, :8] == 129).all() and (img[:, 8:] == 127).all()
