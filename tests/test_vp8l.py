"""Lossless WebP (VP8L) codec — functions/vp8l.py (r12).

Twin-oracle discipline (the GIF/PNG/JPEG pattern): the format is
lossless, so decode(encode(img)) must be pixel-identical, with the
encoder's opt-in paths driving every decoder mechanism — canonical and
simple prefix codes, the code-length code, LZ77 back-references, the
color cache, and all four transforms. Plus a NON-twin oracle: a
complete VP8L stream hand-packed bit by bit from the published layout,
so the decoder is pinned against the wire format, not its own encoder."""

from __future__ import annotations

import numpy as np
import pytest

from http_feeds_spark.functions import multimodal as mm
from http_feeds_spark.functions import vp8l


def _img(h, w, seed=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_literal_twin_roundtrip():
    """Plain literal encoding under canonical per-channel codes: exact
    round trip for noise, gradients, odd shapes, 1x1, and through the
    decode_rgb dispatcher."""
    for img in (
        _img(9, 13),
        _img(16, 16, 7),
        _img(1, 1),
        _img(1, 30),
        _img(30, 1),
        np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3),
    ):
        np.testing.assert_array_equal(vp8l.decode_webp(vp8l.encode_vp8l(img)), img)
    img = _img(8, 8)
    np.testing.assert_array_equal(mm.decode_rgb(vp8l.encode_vp8l(img)), img)


def test_simple_codes_flat_and_two_color():
    """Images whose channels have <=2 distinct values exercise the
    1-symbol (0-bit) and 2-symbol (1-bit) simple code transmissions."""
    flat = np.full((6, 11, 3), 137, np.uint8)
    np.testing.assert_array_equal(vp8l.decode_webp(vp8l.encode_vp8l(flat)), flat)
    two = np.zeros((7, 9, 3), np.uint8)
    two[::2] = (200, 1, 255)
    np.testing.assert_array_equal(vp8l.decode_webp(vp8l.encode_vp8l(two)), two)


def test_lz77_and_color_cache_paths():
    """Run-length back-references (overlapping dist-1 copies through
    the extended >120 distance code) and color-cache hits both
    round-trip; a long flat run crosses many code boundaries."""
    runs = np.repeat(_img(12, 7, 11), 5, axis=1)
    for kw in (
        dict(use_lz77=True),
        dict(cache_bits=6),
        dict(use_lz77=True, cache_bits=4),
        dict(use_lz77=True, cache_bits=1),  # minimum cache size
    ):
        np.testing.assert_array_equal(
            vp8l.decode_webp(vp8l.encode_vp8l(runs, **kw)), runs
        )
    flat = np.full((40, 40, 3), 9, np.uint8)
    np.testing.assert_array_equal(
        vp8l.decode_webp(vp8l.encode_vp8l(flat, use_lz77=True)), flat
    )


def test_transforms_roundtrip():
    """SUBTRACT_GREEN, constant-mode PREDICTOR tiles (every mode incl.
    Select and both ClampAddSubtract variants), COLOR_INDEXING with
    every bundling width, and stacked combinations."""
    img = _img(19, 23, 5)
    np.testing.assert_array_equal(
        vp8l.decode_webp(vp8l.encode_vp8l(img, subtract_green=True)), img
    )
    for mode in range(14):
        np.testing.assert_array_equal(
            vp8l.decode_webp(vp8l.encode_vp8l(img, predictor_mode=mode)), img,
            err_msg=f"predictor mode {mode}",
        )
    rng = np.random.RandomState(9)
    for n_colors, shape in ((2, (9, 19)), (4, (10, 21)), (13, (8, 8)), (200, (16, 16))):
        pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        img2 = pal[rng.randint(0, n_colors, shape)]
        np.testing.assert_array_equal(
            vp8l.decode_webp(vp8l.encode_vp8l(img2, palette=True)), img2,
            err_msg=f"palette {n_colors} colors",
        )
    np.testing.assert_array_equal(
        vp8l.decode_webp(
            vp8l.encode_vp8l(
                img, subtract_green=True, predictor_mode=11,
                use_lz77=True, cache_bits=5,
            )
        ),
        img,
    )


def test_hand_packed_wire_oracle():
    """A complete 1x1 VP8L stream packed BY HAND from the published
    bit layout (LSB-first): 0x2F signature; 14+14+1+3 header bits all
    zero (1x1, no alpha, version 0); no-transform / no-cache / no-meta
    bits; four 8-bit-form simple codes carrying one symbol each
    (G=0x12, R=0x34, B=0x56, A=0xFF); a 1-bit-form simple distance
    code; and ZERO entropy bits for the pixel itself, because every
    code is single-symbol. Bytes below transcribed from the on-paper
    packing => the decoder is pinned against the wire format."""
    stream = bytes.fromhex("2f00000000a844696ad5ff00")
    out = vp8l.decode_vp8l(stream)
    np.testing.assert_array_equal(
        out, np.array([[[0x34, 0x12, 0x56]]], np.uint8)
    )
    # and the same stream wrapped in its RIFF container
    import struct

    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(stream)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(stream)) + stream
    )
    np.testing.assert_array_equal(vp8l.decode_webp(payload), out)


def test_fuzz_shapes_and_paths():
    """Seeded sweep across shapes x encoder paths: every stream must
    round-trip exactly."""
    for seed in range(20):
        rng = np.random.RandomState(5000 + seed)
        img = rng.randint(0, 256, (rng.randint(1, 33), rng.randint(1, 33), 3)).astype(
            np.uint8
        )
        kw = [
            {},
            dict(subtract_green=True),
            dict(predictor_mode=int(rng.randint(14))),
            dict(use_lz77=True, cache_bits=int(rng.randint(1, 8))),
        ][seed % 4]
        np.testing.assert_array_equal(
            vp8l.decode_webp(vp8l.encode_vp8l(img, **kw)), img, err_msg=str(kw)
        )


def test_refusals_and_lossy_boundary():
    """Bad signature / version / torn streams / lossy VP8 all raise
    ValueError (the skip-don't-crash contract upstream)."""
    import struct

    img = _img(6, 6)
    good = vp8l.encode_vp8l(img)
    with pytest.raises(ValueError, match="signature"):
        vp8l.decode_vp8l(b"\x00\x00\x00")
    with pytest.raises(ValueError):
        vp8l.decode_webp(good[: len(good) // 2])  # torn mid-stream
    bad_ver = bytearray(good)
    # RIFF(12) + 'VP8L'(4) + len(4) + signature(1) => header bytes at
    # 21-24; the 3 version bits are bits 29-31, the top of byte 24
    bad_ver[24] |= 0x80
    with pytest.raises(ValueError, match="version"):
        vp8l.decode_webp(bytes(bad_ver))
    lossy = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 12) + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 64, 48) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="lossy"):
        vp8l.decode_webp(lossy)
    many = np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3)
    many[:, :, 0] = np.arange(32)[:, None]
    with pytest.raises(ValueError, match="palette"):
        vp8l.encode_vp8l(many, palette=True)


def test_distance_map_matches_published_prefix():
    """The 120-entry close-neighborhood table is GENERATED from the
    spec's construction rule; pin its start against the published
    table and its global invariants (length, uniqueness, window)."""
    m = vp8l._DIST_MAP
    assert len(m) == 120 and len(set(m)) == 120
    assert m[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)]
    assert all(0 <= y <= 7 and -7 <= x <= 8 and (y > 0 or x > 0) for x, y in m)
    # dist codes above 120 are literal distances minus 120
    assert vp8l._plane_to_distance(121, 10) == 1
    assert vp8l._plane_to_distance(1, 10) == 10  # (0, 1) one row up
    assert vp8l._plane_to_distance(2, 10) == 1   # (1, 0) left neighbor


def test_triage_and_distributed_surface(spark):
    """VP8L triages as its own decodable 'webp_lossless' format (lossy
    stays 'webp', routed out), the media router flips decodable, and
    image_stats decodes real VP8L payloads in the distributed path."""
    img = _img(8, 8, 21)
    payload = vp8l.encode_vp8l(img)
    meta = mm.parse_image_meta(payload)
    assert (meta["format"], meta["width"], meta["height"]) == ("webp_lossless", 8, 8)
    r = mm.parse_media_meta(payload)
    assert (r["modality"], r["format"], r["decodable"]) == (
        "image", "webp_lossless", True
    )

    d = spark.createDataFrame(
        [(1, payload), (2, b"junk")], "doc_id long, payload binary"
    )
    stats = {row.doc_id: row for row in mm.image_stats(d).collect()}
    assert (stats[1].width, stats[1].height) == (8, 8)
    assert stats[1].mean_r == float(img[:, :, 0].mean())
    assert stats[2].width == -1
