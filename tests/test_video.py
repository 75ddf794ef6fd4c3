"""MJPEG-in-AVI video tier (functions/video.py, r13): the RIFF walk,
frame decode through the native JPEG tier, the encode twin, header
triage + router integration, and aligned-frame near-dup."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from http_feeds_spark.functions import multimodal as mm
from http_feeds_spark.functions import video as vid


def _clip(seed: int, n: int = 4, h: int = 24, w: int = 32):
    return [mm.synth_image(seed=seed * 17 + j, height=h, width=w) for j in range(n)]


def test_twin_round_trip_and_meta():
    """encode_avi_mjpeg → decode_avi_frames is frame-exact for the
    block-structured fixtures at quality 95 (the JPEG tier's established
    exactness class), and the header triage reports the avih fields."""
    frames = _clip(1)
    avi = vid.encode_avi_mjpeg(frames, fps=5, quality=95)
    meta = vid.parse_avi_meta(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 4)
    assert meta["fps"] == 5.0 and meta["fourcc"] == "mjpg"
    assert abs(meta["duration_s"] - 0.8) < 1e-9
    out = vid.decode_avi_frames(avi)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, got), want in zip(out, frames):
        assert (got == want).all()


def test_router_routes_avi_and_gates_fourcc():
    """RIFF/AVI routes as modality=video; MJPG is DECODABLE (the first
    genuine video decode tier), a foreign fourcc triages-and-routes
    with decodable=False, and decode refuses it; RIFF/WAVE and
    RIFF/WEBP routing is untouched."""
    avi = vid.encode_avi_mjpeg(_clip(2), fps=10)
    m = mm.parse_media_meta(avi)
    assert (m["modality"], m["format"], m["decodable"]) == ("video", "mjpg", True)
    assert m["width"] == 32 and m["height"] == 24

    foreign = bytearray(avi)
    at = foreign.find(b"strh") + 8 + 4  # fourcc right after 'vids'
    foreign[at : at + 4] = b"H264"
    at2 = foreign.find(b"strf") + 8 + 16  # BITMAPINFOHEADER biCompression
    foreign[at2 : at2 + 4] = b"H264"
    m2 = mm.parse_media_meta(bytes(foreign))
    assert (m2["modality"], m2["format"], m2["decodable"]) == ("video", "h264", False)
    with pytest.raises(ValueError, match="unsupported"):
        vid.decode_avi_frames(bytes(foreign))

    # the WAVE/WEBP RIFF branches still route where they did
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 9000)
    assert mm.parse_media_meta(buf.getvalue())["modality"] == "audio"


def test_torn_avi_refuses():
    avi = vid.encode_avi_mjpeg(_clip(3), fps=10)
    with pytest.raises(ValueError):
        vid.parse_avi_meta(avi[:40])  # torn inside hdrl
    with pytest.raises(ValueError):
        vid.parse_avi_meta(b"RIFF\x10\x00\x00\x00WAVEdata")  # not AVI


def test_video_near_dup_pairs_reencodes(spark):
    """Re-encodes of one clip at different JPEG qualities pair at
    similarity 1.0 through the (frame_idx, block) pigeonhole join;
    different clips and non-video payloads never pair; plan lints
    clean."""
    from http_feeds_spark.plans.lint import lint

    rows = []
    for k in (0, 1):
        frames = _clip(k + 10)
        rows += [
            (k * 100, vid.encode_avi_mjpeg(frames, fps=5, quality=95)),
            (k * 100 + 1, vid.encode_avi_mjpeg(frames, fps=5, quality=75)),
        ]
    rows.append((900, b"not a video at all " * 10))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = vid.video_near_dup(d, min_match=0.8)
    assert lint(pairs) == []
    got = {(r.a, r.b): r.similarity for r in pairs.collect()}
    assert got == {(0, 1): 1.0, (100, 101): 1.0}


def test_registered_video_query_contract(spark, sf_dir):
    from http_feeds_spark.queries import registry

    fn = registry()["q_mm_video_dedup"].fn
    rows = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert rows == [(300, 301, 4, 4, 1.0), (310, 311, 4, 4, 1.0)]
    assert rows == [tuple(r) for r in fn(spark, sf_dir).collect()]


def test_media_store_folds_video(spark, tmp_path):
    """The media store's r13-late video substore: decodable AVI payloads
    fold into videofp rows, near_dup_pairs surfaces the video pair from
    the STORE, erasure purges it, and fsck covers the substore."""
    from http_feeds_spark.operators import erasure, fsck
    from http_feeds_spark.streaming import media as smedia

    root = str(tmp_path / "platform")
    media_root = f"{root}/media_index"
    frames = _clip(20)
    rows = [
        (10, vid.encode_avi_mjpeg(frames, fps=5, quality=95)),
        (11, vid.encode_avi_mjpeg(frames, fps=5, quality=75)),
        (20, mm.encode_png(mm.synth_image(seed=77))),
        (30, b"text filler " * 10),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, payload binary")
    smedia.fold_batch(spark, batch, media_root)
    assert smedia.read_videofp(spark, media_root).count() == 8  # 2 docs x 4 frames
    pairs = {
        (r.a, r.b): (r.modality, r.score)
        for r in smedia.near_dup_pairs(spark, media_root).collect()
    }
    assert pairs == {(10, 11): ("video", 1.0)}
    rep = fsck.fsck_media_index(spark, media_root)
    assert rep["fingerprint_orphans"] == 0 and rep["modality_mismatches"] == 0

    erasure.erase_ids(spark, media_root, spark.createDataFrame([(10,)], "id long"))
    assert smedia.read_videofp(spark, media_root).where("doc_id = 10").count() == 0
    assert smedia.purge_erased(spark, media_root) >= 4
    assert (
        spark.read.parquet(f"{media_root}/{smedia.VIDEOFP_DIR}")
        .where("doc_id = 10")
        .count()
        == 0
    )


def test_video_anchor_tier_pairs_trimmed_copies(spark):
    """The r13-late video anchor tier pairs a TRIMMED excerpt with its
    master — exactly where the aligned-frame tier's documented boundary
    sees nothing — while unrelated clips and non-video payloads stay
    unpaired; the aligned tier's divergence on the same input is pinned
    alongside."""
    frames = _clip(30, n=6)
    master = vid.encode_avi_mjpeg(frames, fps=5, quality=95)
    trimmed = vid.encode_avi_mjpeg(frames[2:], fps=5, quality=95)
    other = vid.encode_avi_mjpeg(_clip(40, n=6), fps=5, quality=95)
    d = spark.createDataFrame(
        [(1, master), (2, trimmed), (3, other), (4, b"not video")],
        "doc_id long, payload binary",
    )
    got = {(r.a, r.b): r.similarity for r in vid.video_anchor_near_dup(d).collect()}
    assert got == {(1, 2): 1.0}
    # the aligned tier misses the trimmed pair (its pinned boundary)
    aligned = {(r.a, r.b) for r in vid.video_near_dup(d, min_match=0.8).collect()}
    assert (1, 2) not in aligned


def test_registered_video_anchor_query_contract(spark, sf_dir):
    from http_feeds_spark.queries import registry

    fn = registry()["q_mm_video_anchor"].fn
    rows = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert [(r[0], r[1], r[4]) for r in rows] == [(400, 401, 1.0), (410, 411, 1.0)]
    assert rows == [tuple(r) for r in fn(spark, sf_dir).collect()]
