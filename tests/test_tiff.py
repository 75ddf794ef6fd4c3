"""TIFF codec — functions/tiff.py (r12).

Twin-oracle discipline: every implemented mode is lossless, so
decode(encode(img)) must be pixel-identical across the whole
compression x predictor x byte-order x photometric matrix, multi-strip
organizations included. The TIFF-LZW pair's early-change width rule is
additionally pinned by a hand-derived wire fixture (codes worked out
on paper), so the decoder tracks the spec, not its own encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from http_feeds_spark.functions import multimodal as mm
from http_feeds_spark.functions import tiff


def _img(h, w, seed=8):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_full_matrix_lossless():
    """none / LZW / Deflate (both tags) / PackBits x predictor 1-2 x
    little/big endian x RGB/grayscale — all pixel-exact."""
    img = _img(23, 31)
    for comp in (1, 5, 8, 32946, 32773):
        for pred in (1, 2):
            for be in (False, True):
                for gray in (False, True):
                    p = tiff.encode_tiff(
                        img, compression=comp, predictor=pred,
                        big_endian=be, gray=gray,
                    )
                    want = np.repeat(img[:, :, 0:1], 3, axis=2) if gray else img
                    np.testing.assert_array_equal(
                        tiff.decode_tiff(p), want,
                        err_msg=f"comp={comp} pred={pred} be={be} gray={gray}",
                    )


def test_multi_strip_and_dispatch():
    """Rows-per-strip organizations reassemble exactly (uneven last
    strip included), and decode_rgb dispatches TIFF off its magic."""
    img = _img(23, 31, 9)
    for comp, rps in ((1, 5), (32773, 5), (5, 4), (8, 7)):
        p = tiff.encode_tiff(img, compression=comp, rows_per_strip=rps, predictor=2)
        np.testing.assert_array_equal(tiff.decode_tiff(p), img)
    np.testing.assert_array_equal(mm.decode_rgb(tiff.encode_tiff(img)), img)


def test_lzw_early_change_hand_fixture():
    """The spec detail most likely to desync: TIFF LZW's EARLY width
    change. Hand-derived fixture: six zero bytes encode as codes
    [CLEAR=256, 0, 258, 259, EOI=257], all at 9 bits, MSB-first =>
    bytes 80 00 20 50 38 08 (worked out on paper). Both directions
    pinned; a 100K random stress crosses every width step 9->12 and
    the table reset."""
    wire = bytes.fromhex("800020503808")
    assert tiff._tiff_lzw_encode(b"\x00" * 6) == wire
    assert tiff._tiff_lzw_decode(wire) == b"\x00" * 6

    data = np.random.RandomState(1).randint(0, 256, 100_000).astype(np.uint8).tobytes()
    assert tiff._tiff_lzw_decode(tiff._tiff_lzw_encode(data)) == data
    # compressible data exercises long match extension
    smooth = bytes(np.repeat(np.arange(256, dtype=np.uint8), 40))
    assert tiff._tiff_lzw_decode(tiff._tiff_lzw_encode(smooth)) == smooth


def test_packbits_hand_fixture():
    """PackBits per the spec's own worked rules: a repeat run is
    (257-n, byte); literals are (n-1, bytes); 0x80 is a noop."""
    assert tiff._packbits_decode(bytes([257 - 4, 0xAA])) == b"\xaa" * 4
    assert tiff._packbits_decode(bytes([2]) + b"abc") == b"abc"
    assert tiff._packbits_decode(bytes([0x80, 0]) + b"x") == b"x"
    data = b"aaaaabcdefffffffg"
    assert tiff._packbits_decode(tiff._packbits_encode(data)) == data


def test_photometric_zero_inverts():
    """White-is-zero grayscale inverts to the usual orientation."""
    img = _img(6, 7, 3)
    p = bytearray(tiff.encode_tiff(img, gray=True))
    # flip the photometric tag (262) value from 1 to 0 in place
    idx = p.find(struct.pack("<HHI", 262, 3, 1))
    assert idx > 0
    p[idx + 8] = 0
    out = tiff.decode_tiff(bytes(p))
    np.testing.assert_array_equal(out, 255 - np.repeat(img[:, :, 0:1], 3, axis=2))


def test_refusals():
    """Exotic tiers raise ValueError with the skip-row contract:
    non-TIFF, truncated strips, 16-bit samples, tiled layout, unknown
    compression."""
    img = _img(6, 6)
    good = tiff.encode_tiff(img)
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff.decode_tiff(b"II+\x00junk")
    with pytest.raises(ValueError):
        tiff.decode_tiff(good[:40])
    bad_bits = bytearray(good)
    i = bad_bits.find(struct.pack("<HHI", 258, 3, 3))
    # 258 with count 3 stores shorts OUT of line; flip the first short
    # to pretend 16-bit samples
    (off,) = struct.unpack_from("<I", bad_bits, i + 8)
    struct.pack_into("<H", bad_bits, off, 16)
    with pytest.raises(ValueError, match="bits-per-sample"):
        tiff.decode_tiff(bytes(bad_bits))
    bad_comp = bytearray(good)
    i = bad_comp.find(struct.pack("<HHI", 259, 3, 1))
    bad_comp[i + 8] = 7  # JPEG-in-TIFF
    with pytest.raises(ValueError, match="compression"):
        tiff.decode_tiff(bytes(bad_comp))


def test_triage_and_distributed_surface(spark):
    """TIFF triages with real dims/depth/channels, routes as decodable,
    and image_stats decodes TIFF payloads in the distributed path."""
    img = _img(8, 9, 15)
    payload = tiff.encode_tiff(img, compression=5, predictor=2)
    meta = mm.parse_image_meta(payload)
    assert (meta["format"], meta["width"], meta["height"], meta["n_channels"]) == (
        "tiff", 9, 8, 3
    )
    r = mm.parse_media_meta(payload)
    assert (r["modality"], r["format"], r["decodable"]) == ("image", "tiff", True)

    d = spark.createDataFrame(
        [(1, payload), (2, b"II*\x00 torn")], "doc_id long, payload binary"
    )
    stats = {row.doc_id: row for row in mm.image_stats(d).collect()}
    assert (stats[1].width, stats[1].height) == (9, 8)
    assert stats[1].mean_b == float(img[:, :, 2].mean())
    assert stats[2].width == -1


def _tiff16(a, endian="<"):
    """Independent minimal 16-bit RGB TIFF writer (one uncompressed
    strip, BitsPerSample 16/16/16 via offset) — the package encoder only
    writes 8-bit, so this fixture is non-twin by construction."""
    import struct

    h, w, _ = a.shape
    dt = ">u2" if endian == ">" else "<u2"
    data = (a.astype(dt) * 257).astype(dt).tobytes()  # hi byte == original
    e = endian
    n = 9
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    bits_off = data_off
    strip_off = bits_off + 6

    def ent(tag, typ, cnt, val):
        return struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(e + "I", val)

    def ent_s(tag, val):
        return struct.pack(e + "HHI", tag, 3, 1) + struct.pack(e + "HH", val, 0)

    entries = ent_s(256, w) + ent_s(257, h)
    entries += ent(258, 3, 3, bits_off)
    entries += ent_s(259, 1) + ent_s(262, 2)
    entries += ent(273, 4, 1, strip_off)
    entries += ent_s(277, 3) + ent_s(278, h)
    entries += ent(279, 4, 1, len(data))
    hdr = (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(e + "I", ifd_off)
    return (
        hdr + struct.pack(e + "H", n) + entries + struct.pack(e + "I", 0)
        + struct.pack(e + "HHH", 16, 16, 16) + data
    )


def test_tiff_16bit_high_byte_reduction():
    """r13: 16-bit samples reduce to the file-byte-order high byte (the
    PNG 16->8 precedent), both byte orders, pixel-exact; the router's
    sub-tier verdict tracks it (16-bit decodable, 16-bit+predictor-2
    not)."""
    import struct

    import numpy as np
    import pytest

    from http_feeds_spark.functions import multimodal as mm
    from http_feeds_spark.functions.tiff import decode_tiff

    img = mm.synth_image(seed=14, height=9, width=6)
    for e in ("<", ">"):
        p = _tiff16(img, e)
        assert (decode_tiff(p) == img).all()
        assert mm.parse_media_meta(p)["decodable"]
    # 16-bit + predictor 2 refuses (the 8-bit cumsum would corrupt it)
    # and the router verdict flips with it: rewrite the inline
    # compression entry (tag 259, default 1 when absent) into a
    # predictor=2 entry (tag 317)
    q = bytearray(_tiff16(img, "<"))
    at = 8 + 2 + 3 * 12  # the 4th IFD entry: tag 259
    struct.pack_into("<HHI", q, at, 317, 3, 1)
    struct.pack_into("<HH", q, at + 8, 2, 0)
    with pytest.raises(ValueError, match="predictor 2"):
        decode_tiff(bytes(q))
    assert not mm.parse_media_meta(bytes(q))["decodable"]
