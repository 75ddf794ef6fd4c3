"""MP4/ISO-BMFF metadata triage (functions/multimodal.py r10): the
stdlib box walk against hand-built box fixtures (the PPM-twin pattern —
the test constructs the container byte-for-byte from the MPEG-4 Part 12
layout, so the parser is pinned against the SPEC, not itself), plus the
skip-don't-crash Spark surface."""

from __future__ import annotations

import struct

import pytest

from http_feeds_spark.functions import multimodal as mm


def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def largebox(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(payload)) + payload


def ftyp(major: bytes = b"isom") -> bytes:
    return box(b"ftyp", major + struct.pack(">I", 512) + b"isomavc1")


def mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = struct.pack(">B3x", 1) + struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, timescale, duration)
    # rate, volume, reserved, matrix, predefined, next_track_id — zeros
    return box(b"mvhd", body + b"\x00" * 80)


def tkhd(width: int, height: int, version: int = 0) -> bytes:
    if version == 1:
        ids = struct.pack(">QQIIQ", 0, 0, 1, 0, 0)
        body = struct.pack(">B3x", 1) + ids
    else:
        ids = struct.pack(">IIIII", 0, 0, 1, 0, 0)
        body = struct.pack(">B3x", 0) + ids
    mid = b"\x00" * 52  # reserved + layer + group + volume + matrix
    return box(b"tkhd", body + mid + struct.pack(">II", width << 16, height << 16))


def hdlr(handler: bytes) -> bytes:
    return box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + handler + b"\x00" * 13)


def stsd(fourcc: bytes) -> bytes:
    entry = struct.pack(">I", 16) + fourcc + b"\x00" * 8
    return box(b"stsd", struct.pack(">B3x", 0) + struct.pack(">I", 1) + entry)


def trak(handler: bytes, fourcc: bytes, width: int = 0, height: int = 0,
         tkhd_version: int = 0) -> bytes:
    mdia = box(
        b"mdia", hdlr(handler) + box(b"minf", box(b"stbl", stsd(fourcc)))
    )
    return box(b"trak", tkhd(width, height, tkhd_version) + mdia)


def movie(*, timescale=600, duration=3000, mvhd_version=0, tracks=()) -> bytes:
    return ftyp() + box(b"moov", mvhd(timescale, duration, mvhd_version) + b"".join(tracks))


def test_parse_minimal_movie_both_mvhd_versions():
    for v in (0, 1):
        m = mm.parse_mp4_meta(
            movie(
                timescale=600,
                duration=3000,
                mvhd_version=v,
                tracks=(
                    trak(b"vide", b"avc1", 640, 360, tkhd_version=v),
                    trak(b"soun", b"mp4a"),
                ),
            )
        )
        assert m["major_brand"] == "isom"
        assert m["timescale"] == 600 and m["duration_s"] == 5.0
        assert m["n_tracks"] == 2
        assert (m["width"], m["height"]) == (640, 360)
        assert m["video_codec"] == "avc1" and m["audio_codec"] == "mp4a", v


def test_largesize_and_unknown_boxes_skip():
    """64-bit largesize headers parse; unknown box types (mdat, free,
    udta) are skipped per the format's forward-compat rule."""
    payload = (
        ftyp()
        + box(b"free", b"\x00" * 4)
        + box(b"moov", mvhd(1000, 1500) + trak(b"vide", b"hev1", 1920, 1080)
              + box(b"udta", b"\x00" * 6))
        + largebox(b"mdat", b"\xab" * 100)
    )
    m = mm.parse_mp4_meta(payload)
    assert m["duration_s"] == 1.5 and m["video_codec"] == "hev1"
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["audio_codec"] is None


def test_torn_and_foreign_payloads_raise():
    good = movie(tracks=(trak(b"vide", b"avc1", 64, 64),))
    with pytest.raises(ValueError, match="torn"):
        mm.parse_mp4_meta(good[:-5])  # size runs past the buffer
    with pytest.raises(ValueError, match="ftyp"):
        mm.parse_mp4_meta(b"RIFF" + b"\x00" * 64)  # a WAV is not BMFF
    with pytest.raises(ValueError, match="ftyp"):
        mm.parse_mp4_meta(b"")


def test_probe_video_meta_skips_dont_crash(spark):
    """The Spark surface: decodable payloads carry full triage rows,
    undecodable ones n_tracks = -1 — one map-only pass, no shuffle."""
    rows = [
        (1, movie(timescale=90000, duration=90000 * 7,
                  tracks=(trak(b"vide", b"avc1", 1280, 720),
                          trak(b"soun", b"mp4a")))),
        (2, b"not a video at all"),
        (3, movie(tracks=(trak(b"soun", b"mp4a"),))),  # audio-only m4a
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.probe_video_meta(df).collect()}
    assert got[1].duration_s == 7.0 and got[1].video_codec == "avc1"
    assert (got[1].width, got[1].height) == (1280, 720)
    assert got[1].n_tracks == 2 and got[1].audio_codec == "mp4a"
    assert got[2].n_tracks == -1 and got[2].video_codec is None
    assert got[3].n_tracks == 1 and got[3].video_codec is None
    assert got[3].audio_codec == "mp4a"
    from http_feeds_spark import plans

    assert plans.shuffle_count(mm.probe_video_meta(df)) == 0
