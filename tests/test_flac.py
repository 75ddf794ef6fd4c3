"""Native FLAC codec — functions/flac.py (r12).

Twin-oracle discipline (the VP8L/GIF/TIFF pattern): FLAC is lossless,
so decode(encode(pcm)) must be SAMPLE-exact with the encoder's options
driving every decoder mechanism — all subframe types, both Rice
methods, partition orders, the escaped-raw partition form, wasted
bits, and all four channel assignments — plus CRC tampering refusals
and the distributed flac_features / registered-query surfaces."""

from __future__ import annotations

import numpy as np
import pytest

from http_feeds_spark.functions import flac
from http_feeds_spark.functions import multimodal as mm


def _sine(n=4000, amp=10000, freq=440.0, rate=44100):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * freq * t / rate)).astype(np.int64)


def test_subframe_types_sample_exact():
    """CONSTANT, VERBATIM, FIXED 0-4 and LPC all reconstruct the exact
    samples, for a smooth sine and full-scale noise."""
    mono = _sine(2500)
    noise = np.random.RandomState(5).randint(-32768, 32768, 2500).astype(np.int64)
    for sub in ("constant", "verbatim", "fixed0", "fixed1", "fixed2",
                "fixed3", "fixed4", "lpc"):
        src = np.zeros(2500, np.int64) + 77 if sub == "constant" else mono
        out, rate = flac.decode_flac(flac.encode_flac(src, subframe=sub))
        np.testing.assert_array_equal(out[:, 0], src, err_msg=sub)
        assert rate == 44100
    for sub in ("verbatim", "fixed2", "fixed4", "lpc"):
        out, _ = flac.decode_flac(flac.encode_flac(noise, subframe=sub))
        np.testing.assert_array_equal(out[:, 0], noise, err_msg=f"noise {sub}")


def test_stereo_decorrelation_modes():
    """independent / left-side / right-side / mid-side all reconstruct
    both channels exactly (the side channel's extra bit and mid/side's
    lost-LSB rule included)."""
    mono = _sine(3000)
    stereo = np.column_stack([mono, (mono * 0.7).astype(np.int64)])
    for st in ("independent", "left_side", "right_side", "mid_side"):
        out, _ = flac.decode_flac(flac.encode_flac(stereo, subframe="fixed2", stereo=st))
        np.testing.assert_array_equal(out, stereo, err_msg=st)
    # odd left+right sums force the mid/side lost-LSB path
    odd = np.column_stack([mono, mono + 1])
    out, _ = flac.decode_flac(flac.encode_flac(odd, subframe="fixed1", stereo="mid_side"))
    np.testing.assert_array_equal(out, odd)


def test_residual_codings_and_wasted_bits():
    """Rice 4-bit and Rice2 5-bit methods, partition orders, the
    escape-to-raw partition form, wasted-bits subframes, and
    multi-frame streams with a non-multiple tail block."""
    mono = _sine(2048)
    for kw in (
        dict(porder=2), dict(porder=3),
        dict(escape_raw=True), dict(method=1),
        dict(method=1, porder=2),
    ):
        out, _ = flac.decode_flac(flac.encode_flac(mono, subframe="fixed2", **kw))
        np.testing.assert_array_equal(out[:, 0], mono, err_msg=str(kw))
    shifted = (mono >> 3) << 3
    out, _ = flac.decode_flac(flac.encode_flac(shifted, subframe="fixed2", wasted=3))
    np.testing.assert_array_equal(out[:, 0], shifted)
    long = _sine(5000)
    out, _ = flac.decode_flac(flac.encode_flac(long, blocksize=512, subframe="lpc"))
    np.testing.assert_array_equal(out[:, 0], long)


def test_crc_tamper_and_refusals():
    """A flipped bit in a frame body fails the CRC-16; a corrupted
    header fails the CRC-8; truncation and non-FLAC refuse."""
    p = bytearray(flac.encode_flac(_sine(600), subframe="fixed1"))
    hdr_len = 4 + 4 + 34
    good = bytes(p)
    flac.decode_flac(good)  # sanity
    body = bytearray(good)
    body[-4] ^= 0x10  # inside the last frame's entropy bytes
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(body))
    hdr = bytearray(good)
    hdr[hdr_len + 2] ^= 0x01  # inside the first frame header
    with pytest.raises(ValueError, match="CRC-8|reserved|sync|invalid"):
        flac.decode_flac(bytes(hdr))
    with pytest.raises(ValueError):
        flac.decode_flac(good[: len(good) // 2])
    with pytest.raises(ValueError, match="not a FLAC"):
        flac.decode_flac(b"junk")


def test_flac_features_and_registered_query(spark, sf_dir):
    """The distributed surface: sample-exact RMS (= amp/sqrt(2) for a
    sine) through the native decoder, torn payloads as skip rows; and
    the q_mm_flac_real contract (24 docs, torn sixths, stable)."""
    import math

    from http_feeds_spark.queries import registry

    amp = 0.5
    mono = (amp * 32767 * np.sin(2 * np.pi * 440 * np.arange(4000) / 8000)).astype(np.int64)
    payload = flac.encode_flac(mono, 8000, subframe="fixed2")
    d = spark.createDataFrame(
        [(1, payload), (2, b"fLaC torn")], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in mm.flac_features(d).collect()}
    assert got[1].sample_rate == 8000 and got[1].n_samples == 4000
    assert abs(got[1].rms - amp * 32767 / 32768 / math.sqrt(2)) < 1e-3
    assert got[2].n_samples == -1

    fn = registry()["q_mm_flac_real"].fn
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 24
    torn = [r for r in rows if r.n_samples == -1]
    good = [r for r in rows if r.n_samples == 1600]
    assert len(torn) == 4 and len(good) == 20
    assert any(r.n_channels == 2 for r in good)
    assert rows == fn(spark, sf_dir).collect()
