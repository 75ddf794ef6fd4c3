"""TIFF codec — stdlib + numpy only (r12).

Baseline TIFF 6.0 decode for the shapes that dominate real corpora:
8-bit grayscale and RGB(A), chunky planar config, strip-organized, in
either byte order, under the four bread-and-butter compressions —
none (1), LZW (5, the MSB-first variant WITH the spec's "early
change" width switch), PackBits (32773), and Deflate (8 / old-style
32946, stdlib zlib) — plus the horizontal-differencing predictor
(tag 317 = 2) that LZW/Deflate files routinely pair with. Photometric
0 (white-is-zero) inverts; grayscale replicates to RGB and alpha
drops, so the decoder returns the same (H, W, 3) uint8 shape as every
other decode_rgb format. Tiled TIFF, 16-bit channels, planar=2 and
JPEG-in-TIFF raise ValueError (skip-don't-crash upstream).

``encode_tiff`` is the export twin (same four compressions, optional
predictor, configurable rows-per-strip and byte order), so the tests
pin decode(encode(img)) == img per combination — TIFF is lossless in
every mode implemented here. The LZW pair's width-change discipline
is derived the same way the GIF pair's was (the encoder runs one
table-add ahead of the decoder; TIFF's early change shifts both one
code earlier than GIF's), and a hand-packed fixture pins the wire
behavior independently of the twin.

Citation: reference spec surface only (/root/reference/README.md has
no image scope); implemented from the public TIFF 6.0 specification.
"""

from __future__ import annotations

import struct


# --- LZW (TIFF variant: MSB-first, early change) ---------------------------


def _tiff_lzw_decode(data: bytes, max_width: int = 12) -> bytes:
    """TIFF §13 LZW: 8-bit strings, ClearCode 256, EOI 257, first free
    entry 258, codes packed MSB-first starting at 9 bits, and the
    EARLY-CHANGE rule — the width grows when the next free slot
    reaches 2^width - 1 (one code earlier than the GIF variant)."""
    CLEAR, EOI, FIRST = 256, 257, 258
    entries: list = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out: list = []
    prev = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream ended without EOI")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            entries = entries[:FIRST]
            width = 9
            prev = None
            continue
        if code == EOI:
            return b"".join(out)
        if prev is None:
            if code >= len(entries):
                raise ValueError("TIFF LZW first code out of table")
            entry = entries[code]
        else:
            if code < len(entries):
                entry = entries[code]
            elif code == len(entries):
                entry = prev + prev[:1]
            else:
                raise ValueError("TIFF LZW code out of table")
            if len(entries) < (1 << max_width) - 1:
                entries.append(prev + entry[:1])
                if len(entries) == (1 << width) - 1 and width < max_width:
                    width += 1  # EARLY change: one code before the GIF rule
        out.append(entry)
        prev = entry


def _tiff_lzw_encode(data: bytes, max_width: int = 12) -> bytes:
    """Twin of :func:`_tiff_lzw_decode`. The encoder runs one
    table-add AHEAD of the decoder (it adds on the code it emits, the
    decoder on the one after), so its early-change fires at
    next_code == 2^width, one slot past the decoder's
    len(entries) == 2^width - 1 — the same offset-by-one discipline
    the GIF pair derives, shifted one code earlier by early change."""
    CLEAR, EOI, FIRST = 256, 257, 258
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1  # keep the accumulator bounded

    table = {bytes([i]): i for i in range(256)}
    next_code, width = FIRST, 9
    emit(CLEAR, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < (1 << max_width) - 1:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) and width < max_width:
                width += 1
        else:  # table full: reset (what real writers do)
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = FIRST, 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- PackBits ---------------------------------------------------------------


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1
            out += data[pos : pos + n + 1]
            if pos + n + 1 > len(data):
                raise ValueError("PackBits literal run truncated")
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


# --- IFD plumbing -----------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE, ASCII, SHORT, LONG


def _read_ifd(payload: bytes, endian: str, ifd_off: int) -> dict[int, list[int]]:
    if ifd_off + 2 > len(payload):
        raise ValueError("torn TIFF IFD")
    (n_entries,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        if at + 12 > len(payload):
            raise ValueError("torn TIFF IFD entry")
        tag, typ, count = struct.unpack_from(endian + "HHI", payload, at)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        off = at + 8
        if total > 4:
            (off,) = struct.unpack_from(endian + "I", payload, at + 8)
        if off + total > len(payload):
            raise ValueError(f"TIFF tag {tag} data out of bounds")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(endian + fmt * count, payload, off))
    return tags


def decode_tiff(payload: bytes):
    """(H, W, 3) uint8 from a strip-organized baseline TIFF — see the
    module docstring for the supported envelope."""
    import zlib

    import numpy as np

    if payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    endian = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    tags = _read_ifd(payload, endian, ifd_off)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF lacks required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b not in (8, 16) for b in bits) or len(set(bits)) != 1:
        raise ValueError(f"TIFF bits-per-sample {bits} unsupported (want 8 or 16)")
    wide = bits[0] == 16  # r13: 16-bit reduces to the high byte (the
    # PNG 16->8 precedent); samples are stored in FILE byte order
    comp = one(259, 1)
    photometric = one(262, 1)
    if photometric not in (0, 1, 2):
        raise ValueError(f"TIFF photometric {photometric} unsupported")
    if one(284, 1) != 1:
        raise ValueError("TIFF planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strip-organized only)")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} unsupported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or mismatched")
    rows_per_strip = one(278, h)

    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF strip data truncated")
        if comp == 1:
            raw += strip
        elif comp == 5:
            raw += _tiff_lzw_decode(strip)
        elif comp in (8, 32946):
            raw += zlib.decompress(strip)
        elif comp == 32773:
            raw += _packbits_decode(strip)
        else:
            raise ValueError(f"TIFF compression {comp} unsupported")
    bytes_per = 2 if wide else 1
    if len(raw) < w * h * spp * bytes_per:
        raise ValueError("TIFF pixel data short of width x height x samples")
    if wide:
        if predictor == 2:
            # differencing at 16 bits operates on 16-bit values; the
            # 8-bit cumsum below would corrupt it — refuse (sub-tier)
            raise ValueError("TIFF 16-bit with predictor 2 unsupported")
        full = np.frombuffer(bytes(raw[: w * h * spp * 2]), np.uint8)
        hi = 0 if endian == ">" else 1  # high byte per file byte order
        arr = full.reshape(h, w, spp, 2)[:, :, :, hi]
    else:
        arr = np.frombuffer(bytes(raw[: w * h * spp]), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: cumulative sum per row
        arr = np.cumsum(arr.astype(np.int64), axis=1, dtype=np.int64) & 0xFF
        arr = arr.astype(np.uint8)
    if photometric == 0:  # white-is-zero
        arr = 255 - arr
    if spp == 1:
        return np.repeat(arr, 3, axis=2).copy()
    if spp >= 3:
        return arr[:, :, :3].copy()  # RGBA and extra samples: drop
    raise ValueError(f"TIFF samples-per-pixel {spp} unsupported")


def encode_tiff(
    img,
    *,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    gray: bool = False,
) -> bytes:
    """Export twin: strip-organized baseline TIFF from an (H, W, 3)
    uint8 array (``gray`` writes channel 0 as single-sample
    grayscale). Same compression/predictor envelope as the decoder."""
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    endian = ">" if big_endian else "<"
    spp = 1 if gray else 3
    data = img[:, :, 0:1] if gray else img[:, :, :3]
    if predictor == 2:
        d = data.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d & 0xFF).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        chunk = data[y0 : y0 + rps].tobytes()
        if compression == 1:
            strips.append(chunk)
        elif compression == 5:
            strips.append(_tiff_lzw_encode(chunk))
        elif compression in (8, 32946):
            strips.append(zlib.compress(chunk))
        elif compression == 32773:
            strips.append(_packbits_encode(chunk))
        else:
            raise ValueError(f"compression {compression} unsupported")

    entries = []  # (tag, type, count, value_or_bytes)

    def ent(tag, typ, values):
        entries.append((tag, typ, values))

    n_strips = len(strips)
    ent(256, 4, [w])
    ent(257, 4, [h])
    ent(258, 3, [8] * spp)
    ent(259, 3, [compression])
    ent(262, 3, [1 if gray else 2])
    ent(277, 3, [spp])
    ent(278, 4, [rps])
    ent(317, 3, [predictor])
    # strip offsets filled after layout
    ent(273, 4, [0] * n_strips)
    ent(279, 4, [len(s) for s in strips])
    entries.sort(key=lambda e: e[0])

    header = struct.pack(endian + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = 8 + ifd_size
    extra = bytearray()

    def pack_values(typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(endian + fmt * len(values), *values)

    # first pass: compute where out-of-line value arrays land
    placed = {}
    for tag, typ, values in entries:
        blob = pack_values(typ, values)
        if len(blob) > 4:
            placed[tag] = extra_off + len(extra)
            extra += blob
    strip_base = extra_off + len(extra)
    offs = []
    at = strip_base
    for s in strips:
        offs.append(at)
        at += len(s)
    # rewrite the strip-offset entry with real positions
    for i, (tag, typ, values) in enumerate(entries):
        if tag == 273:
            entries[i] = (tag, typ, offs)
    # re-place 273 if out-of-line (count > 1): its slot was reserved
    if n_strips > 1:
        blob = pack_values(4, offs)
        extra[placed[273] - extra_off : placed[273] - extra_off + len(blob)] = blob

    ifd = struct.pack(endian + "H", len(entries))
    for tag, typ, values in entries:
        blob = pack_values(typ, values)
        if len(blob) > 4:
            val_field = struct.pack(endian + "I", placed[tag])
        else:
            val_field = blob + b"\x00" * (4 - len(blob))
        ifd += struct.pack(endian + "HHI", tag, typ, len(values)) + val_field
    ifd += struct.pack(endian + "I", 0)  # no next IFD
    return header + ifd + bytes(extra) + b"".join(strips)
