"""Audio metadata triage (functions/multimodal.py r11): MP3 frame-header
walk, FLAC STREAMINFO bit unpack, RIFF/WAVE fmt-chunk walk — each pinned
against hand-packed spec-layout fixtures (the PPM-twin pattern: the test
constructs the container byte-for-byte from the published layout, so the
parser is pinned against the SPEC, not itself), plus the
skip-don't-crash Spark surface and the registered query contract."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from http_feeds_spark.functions import multimodal as mm


def mp3_frame(
    bitrate_idx: int = 9,  # MPEG1 L3 index 9 = 128 kbps
    rate_idx: int = 0,     # 44100
    pad: int = 0,
    mono: bool = False,
    version_bits: int = 3,  # MPEG1
) -> bytes:
    """One MPEG audio Layer III frame, header packed per ISO 11172-3."""
    b2 = 0xE0 | (version_bits << 3) | (1 << 1) | 1  # sync tail+ver+LayerIII+no-crc
    b3 = (bitrate_idx << 4) | (rate_idx << 2) | (pad << 1)
    b4 = 0xC0 if mono else 0x00
    hdr = bytes([0xFF, b2, b3, b4])
    table = mm._MP3_BITRATES[("v1" if version_bits == 3 else "v2", 3)]
    rate = mm._MP3_RATES[version_bits][rate_idx]
    spf = 1152 if version_bits == 3 else 576
    flen = spf // 8 * table[bitrate_idx] * 1000 // rate + pad
    return hdr + b"\x00" * (flen - 4)


def flac_bytes(sr=44100, ch=2, bps=16, total=441000) -> bytes:
    bits = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    streaminfo = bytes(10) + bits.to_bytes(8, "big") + bytes(16)
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo


def wav_bytes(rate=8000, seconds=1.0, nch=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * int(rate * seconds) * nch)
    return buf.getvalue()


def test_mp3_cbr_frame_walk_exact():
    """Five identical CBR frames: fields from the header tables, frame
    count from the walk, duration = frames x 1152 / 44100 exactly."""
    m = mm.parse_mp3_meta(mp3_frame() * 5)
    assert m["codec"] == "mp3/MPEG1-L3"
    assert (m["sample_rate"], m["channels"], m["bitrate_kbps"]) == (44100, 2, 128)
    assert m["n_frames"] == 5 and not m["vbr"]
    assert abs(m["duration_s"] - 5 * 1152 / 44100) < 1e-12
    # padded frames are one byte longer — the walk must still land on
    # every sync
    padded = b"".join(mp3_frame(pad=i % 2) for i in range(4))
    assert mm.parse_mp3_meta(padded)["n_frames"] == 4


def test_mp3_id3v2_skip_and_xing():
    """A syncsafe-sized ID3v2 tag is skipped; a Xing header's frame
    count wins over the walk and flags VBR ('Info' means CBR)."""
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"x" * 10
    assert mm.parse_mp3_meta(id3 + mp3_frame() * 3)["n_frames"] == 3

    for tag, want_vbr in ((b"Xing", True), (b"Info", False)):
        f0 = bytearray(mp3_frame())
        off = 4 + 32  # MPEG1 stereo side-info length
        f0[off : off + 4] = tag
        f0[off + 4 : off + 8] = struct.pack(">I", 1)  # flags: FRAMES
        f0[off + 8 : off + 12] = struct.pack(">I", 999)
        m = mm.parse_mp3_meta(bytes(f0) + mp3_frame())
        assert m["n_frames"] == 999 and m["vbr"] is want_vbr
        assert abs(m["duration_s"] - 999 * 1152 / 44100) < 1e-9


def test_mp3_mpeg25_mono_and_vbr_walk():
    """MPEG2.5 low-rate mono: 576 samples/frame, the v2 bitrate table;
    frames with differing bitrate fields flag VBR from the walk."""
    m = mm.parse_mp3_meta(mp3_frame(bitrate_idx=2, rate_idx=2, mono=True, version_bits=0) * 3)
    assert m["codec"] == "mp3/MPEG2.5-L3"
    assert (m["sample_rate"], m["channels"], m["bitrate_kbps"]) == (8000, 1, 16)
    assert abs(m["duration_s"] - 3 * 576 / 8000) < 1e-12

    mixed = mp3_frame(bitrate_idx=9) + mp3_frame(bitrate_idx=11) + mp3_frame(bitrate_idx=9)
    assert mm.parse_mp3_meta(mixed)["vbr"] is True


def test_mp3_false_sync_refuses():
    """A sync whose second frame does not parse is torn/false; a
    truncated first frame refuses too; a single COMPLETE frame is a
    legal (tiny) stream."""
    one = mp3_frame()
    with pytest.raises(ValueError, match="second frame"):
        mm.parse_mp3_meta(one + b"Z" * 40)
    with pytest.raises(ValueError, match="first MPEG frame truncated"):
        mm.parse_mp3_meta(one[: len(one) // 2])
    with pytest.raises(ValueError, match="no MPEG audio frame sync"):
        mm.parse_mp3_meta(b"plain text payload")
    assert mm.parse_mp3_meta(one)["n_frames"] == 1


def test_flac_streaminfo_bit_exact():
    f = mm.parse_flac_meta(flac_bytes(sr=96000, ch=6, bps=24, total=960000))
    assert (f["sample_rate"], f["channels"], f["bits_per_sample"]) == (96000, 6, 24)
    assert abs(f["duration_s"] - 10.0) < 1e-12 and f["vbr"] is True
    # a stream not leading with STREAMINFO refuses (spec: it must)
    bad = b"fLaC" + bytes([0x84]) + (34).to_bytes(3, "big") + bytes(34)
    with pytest.raises(ValueError, match="STREAMINFO"):
        mm.parse_flac_meta(bad)


def test_wav_fmt_chunk_header_only():
    w = mm.parse_wav_meta(wav_bytes(rate=16000, seconds=2.5, nch=2))
    assert (w["codec"], w["sample_rate"], w["channels"]) == ("pcm", 16000, 2)
    assert abs(w["duration_s"] - 2.5) < 1e-9 and w["bits_per_sample"] == 16


def test_probe_audio_meta_distributed_skip_rows(spark):
    """The Spark surface: one metadata row per payload across all three
    containers; torn/non-audio payloads emit sample_rate = -1."""
    rows = [
        (1, mp3_frame() * 4),
        (2, flac_bytes()),
        (3, wav_bytes()),
        (4, b"not audio at all"),
        (5, mp3_frame()[:100]),  # torn mid-frame
    ]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.probe_audio_meta(d).collect()}
    assert got[1].codec == "mp3/MPEG1-L3" and got[1].n_frames == 4
    assert got[2].codec == "flac" and got[2].sample_rate == 44100
    assert got[3].codec == "pcm"
    assert got[4].sample_rate == -1 and got[5].sample_rate == -1


def test_registered_query_contract(spark, sf_dir):
    """q_mm_audio_meta: deterministic per-doc mix over all six
    containers, every seventh payload deliberately torn, result stable
    across calls."""
    from http_feeds_spark.queries import registry

    fn = registry()["q_mm_audio_meta"].fn
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 32
    codecs = {r.codec for r in rows}
    assert any(c and c.startswith("mp3") for c in codecs)
    assert any(c and c.startswith("aac") for c in codecs)  # ADTS, r12
    assert {"flac", "pcm", "opus", "mp4a"} <= codecs
    assert sum(1 for r in rows if r.sample_rate == -1) == 4  # the torn seventh
    assert rows == fn(spark, sf_dir).collect()


def test_registered_router_query_contract(spark, sf_dir):
    """q_mm_media_route (r12): the mixed rank-mod-4 interleave of the
    three per-modality fixture populations plus unclaimed text, routed
    by probe_media_meta in one pass — deterministic modality counts,
    torn payloads as modality-NULL skip rows, stable across calls."""
    from collections import Counter

    from http_feeds_spark.queries import registry

    fn = registry()["q_mm_media_route"].fn
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 48
    by_mod = Counter(r.modality for r in rows)
    # 12 within-arm ranks per arm. Torn fixtures surface as
    # modality-NULL: image sub-rank 10 (sub%11==10), audio sub-rank 6
    # (sub%7==6), video wherever doc_id%3==2 (~1/3, data-dependent),
    # plus the 12 unclaimed-text ranks.
    assert by_mod["image"] == 11 and by_mod["audio"] == 11
    assert 4 <= by_mod["video"] <= 12
    assert by_mod[None] >= 12  # at least the unclaimed-text arm
    formats = {r.format for r in rows if r.modality == "image"}
    assert formats & {"png", "jpeg", "ppm"}
    assert any(r.modality == "audio" and r.decodable for r in rows)  # pcm
    # r13: the MJPEG-in-AVI ranks are the ONE decodable video form;
    # ISO-BMFF codecs still triage-and-route
    vids = [r for r in rows if r.modality == "video"]
    assert any(r.format == "mjpg" and r.decodable for r in vids)
    assert all(not r.decodable for r in vids if r.format != "mjpg")
    torn = [r for r in rows if r.modality is None]
    assert all(r.width == -1 for r in torn)
    assert rows == fn(spark, sf_dir).collect()


def ogg_page(body: bytes, granule: int, htype=0, seq=0) -> bytes:
    segs, n = [], len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (
        b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
        + struct.pack("<III", 1, seq, 0) + bytes([len(segs)]) + bytes(segs) + body
    )


def test_ogg_opus_and_vorbis():
    """Opus: 48 kHz granule clock, pre-skip subtracted per RFC 7845;
    Vorbis: rate from the id header, granule at that rate; a stream
    that is neither refuses."""
    opushead = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    p = ogg_page(opushead, 0, htype=2) + ogg_page(b"\x00" * 64, 48000 * 3 + 312, htype=4, seq=1)
    m = mm.parse_ogg_meta(p)
    assert (m["codec"], m["channels"]) == ("opus", 2)
    assert abs(m["duration_s"] - 3.0) < 1e-12

    vorbid = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
        + struct.pack("<I", 44100) + b"\x00" * 16
    )
    p = ogg_page(vorbid, 0, htype=2) + ogg_page(b"\x00" * 64, 44100 * 2, htype=4, seq=1)
    m = mm.parse_ogg_meta(p)
    assert (m["codec"], m["sample_rate"]) == ("vorbis", 44100)
    assert abs(m["duration_s"] - 2.0) < 1e-12

    with pytest.raises(ValueError, match="neither Opus nor Vorbis"):
        mm.parse_ogg_meta(ogg_page(b"\x00" * 16, 0))


def adts_frame(
    profile: int = 1,   # LC
    sfi: int = 4,       # 44100
    ch: int = 2,
    nblocks: int = 1,
    body: int = 20,
    mpeg2: bool = False,
    crc: bool = False,
) -> bytes:
    """One ADTS frame, 7/9-byte header packed per ISO 14496-3
    §1.6.3.4 (syncword, version, layer 00, protection, profile, sfi,
    channel config, 13-bit frame length, blocks-1)."""
    hdr_len = 9 if crc else 7
    flen = hdr_len + body
    b1 = 0xF0 | (0x08 if mpeg2 else 0) | (0 if crc else 1)
    b2 = (profile << 6) | (sfi << 2) | ((ch >> 2) & 1)
    b3 = ((ch & 3) << 6) | ((flen >> 11) & 3)
    b4 = (flen >> 3) & 0xFF
    b5 = ((flen & 7) << 5) | 0x1F
    b6 = 0xFC | (nblocks - 1)
    return bytes([0xFF, b1, b2, b3, b4, b5, b6]) + bytes(flen - 7)


def test_adts_cbr_walk_exact():
    """Five identical LC frames: fields from the header, duration =
    5 x 1024 / 44100 exactly; a multi-block frame counts every
    1024-sample block; differing frame lengths flag VBR."""
    m = mm.parse_adts_meta(adts_frame() * 5)
    assert m["codec"] == "aac/MPEG4-LC"
    assert (m["sample_rate"], m["channels"], m["n_frames"]) == (44100, 2, 5)
    assert abs(m["duration_s"] - 5 * 1024 / 44100) < 1e-12
    assert m["vbr"] is False

    two = mm.parse_adts_meta(adts_frame(nblocks=2) * 3)
    assert abs(two["duration_s"] - 6 * 1024 / 44100) < 1e-12

    vbr = mm.parse_adts_meta(adts_frame(body=20) + adts_frame(body=40) + adts_frame(body=20))
    assert vbr["vbr"] is True


def test_adts_profiles_rates_and_id3():
    """MPEG-2 Main mono at 16 kHz reads from the version bit, profile
    bits and the sampling-frequency-index table; a CRC-protected frame
    (9-byte header) still walks; an ID3v2-prefixed stream skips the
    tag, sharing the MP3 walk's helper."""
    m = mm.parse_adts_meta(adts_frame(profile=0, sfi=8, ch=1, mpeg2=True) * 2)
    assert m["codec"] == "aac/MPEG2-Main"
    assert (m["sample_rate"], m["channels"]) == (16000, 1)

    c = mm.parse_adts_meta(adts_frame(crc=True) * 2)
    assert c["n_frames"] == 2

    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"x" * 10
    assert mm.parse_adts_meta(id3 + adts_frame() * 3)["n_frames"] == 3


def test_adts_refusals_and_mp3_disambiguation():
    """Torn/false-sync streams refuse; a reserved sampling-frequency
    index never syncs; and the layer bits keep the two bare-sync wire
    formats disjoint — parse_audio_meta routes ADTS to the AAC walk
    and MPEG-audio to the MP3 walk off the same 0xFF sync byte."""
    one = adts_frame()
    with pytest.raises(ValueError, match="first ADTS frame truncated"):
        mm.parse_adts_meta(one[:10])
    with pytest.raises(ValueError, match="second ADTS frame"):
        mm.parse_adts_meta(one + b"Z" * 40)
    with pytest.raises(ValueError, match="no ADTS frame sync"):
        mm.parse_adts_meta(b"plain text payload")
    bad_sfi = bytearray(adts_frame())
    bad_sfi[2] = (1 << 6) | (13 << 2)  # reserved index 13
    with pytest.raises(ValueError, match="no ADTS frame sync"):
        mm.parse_adts_meta(bytes(bad_sfi))

    assert mm.parse_audio_meta(adts_frame() * 2)["codec"] == "aac/MPEG4-LC"
    assert mm.parse_audio_meta(mp3_frame() * 2)["codec"].startswith("mp3/")
    # and through the router: ADTS lands as audio, not decodable
    r = mm.parse_media_meta(adts_frame() * 2)
    assert (r["modality"], r["format"], r["decodable"]) == ("audio", "aac/MPEG4-LC", False)


def aiff_bytes(sr=44100.0, ch=2, bps=16, frames=44100, aifc=False, comp=b"NONE") -> bytes:
    """Hand-packed AIFF/AIFF-C: FORM + COMM with the sample rate as an
    80-bit IEEE extended float (sign + 15-bit exponent biased 16383 +
    explicit-integer-bit 64-bit mantissa)."""
    import math

    if sr > 0:
        exp = math.floor(math.log2(sr))
        mant = int(sr * 2.0 ** (63 - exp))
        ext = struct.pack(">H", 16383 + exp) + mant.to_bytes(8, "big")
    else:
        ext = bytes(10)
    body = struct.pack(">HIH", ch, frames, bps) + ext
    if aifc:
        body += comp + bytes([len(comp)]) + comp  # pascal-ish name, unread
    comm = b"COMM" + struct.pack(">I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
    ssnd = b"SSND" + struct.pack(">I", 8) + bytes(8)
    form_type = b"AIFC" if aifc else b"AIFF"
    payload = form_type + comm + ssnd
    return b"FORM" + struct.pack(">I", len(payload)) + payload


def test_aiff_comm_walk_and_extended_float():
    """AIFF: fields from the COMM chunk, the 80-bit extended sample
    rate decoded exactly (44100 and the non-power-of-two 22050.5);
    AIFF-C reports its compression fourcc ('NONE'/'sowt' = pcm);
    refusals for COMM-less and non-IFF payloads."""
    m = mm.parse_aiff_meta(aiff_bytes())
    assert (m["codec"], m["sample_rate"], m["channels"], m["bits_per_sample"]) == (
        "pcm", 44100, 2, 16
    )
    assert abs(m["duration_s"] - 1.0) < 1e-12

    odd = mm.parse_aiff_meta(aiff_bytes(sr=22050.5, frames=44101))
    # int rate column rounds half-to-even; duration uses the exact rate
    assert odd["sample_rate"] == 22050 and abs(odd["duration_s"] - 44101 / 22050.5) < 1e-9

    assert mm.parse_aiff_meta(aiff_bytes(aifc=True, comp=b"sowt"))["codec"] == "pcm"
    assert mm.parse_aiff_meta(aiff_bytes(aifc=True, comp=b"ima4"))["codec"] == "ima4"

    with pytest.raises(ValueError, match="no COMM"):
        mm.parse_aiff_meta(b"FORM" + struct.pack(">I", 4) + b"AIFF")
    with pytest.raises(ValueError, match="not an AIFF"):
        mm.parse_aiff_meta(b"FORMxxxxWAVE")
    # and through the dispatcher + router
    assert mm.parse_audio_meta(aiff_bytes())["codec"] == "pcm"
    r = mm.parse_media_meta(aiff_bytes())
    assert (r["modality"], r["sample_rate"]) == ("audio", 44100)


def aiff_with_samples(sr, x, swapped=False) -> bytes:
    """AIFF/AIFF-C with REAL 16-bit sample frames (big-endian, or
    little-endian under the AIFC 'sowt' form)."""
    import math

    import numpy as np

    exp = math.floor(math.log2(sr))
    mant = int(sr * 2.0 ** (63 - exp))
    ext = struct.pack(">H", 16383 + exp) + mant.to_bytes(8, "big")
    body = struct.pack(">HIH", 1, len(x), 16) + ext
    form_type = b"AIFF"
    if swapped:
        body += b"sowt" + bytes([4]) + b"sowt" + b"\x00"
        form_type = b"AIFC"
    comm = b"COMM" + struct.pack(">I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
    data = np.asarray(x).astype("<i2" if swapped else ">i2").tobytes()
    ssnd = b"SSND" + struct.pack(">I", 8 + len(data)) + bytes(8) + data
    payload = form_type + comm + ssnd
    return b"FORM" + struct.pack(">I", len(payload)) + payload


def test_aiff_real_sample_decode():
    """r12: decode_aiff returns sample-exact PCM for plain (big-endian)
    AIFF and the AIFC 'sowt' byte-swapped form — RMS = amp/sqrt(2) for
    a sine, decode_wav's exact contract — and AIFF payloads ride the
    wav_features surface; compressed AIFC codecs refuse."""
    import math

    import numpy as np

    amp = 0.5
    x = (amp * 32767 * np.sin(2 * np.pi * 440 * np.arange(4000) / 8000)).astype(np.int64)
    for swapped in (False, True):
        rate, nch, out = mm.decode_aiff(aiff_with_samples(8000, x, swapped))
        assert (rate, nch, len(out)) == (8000, 1, 4000)
        assert abs(float(np.sqrt((out**2).mean())) - amp / math.sqrt(2)) < 1e-3
    with pytest.raises(ValueError, match="no local decoder"):
        mm.decode_aiff(aiff_bytes(aifc=True, comp=b"ima4"))
    # the triage fixture's SSND is empty: a legal zero-sample decode
    assert len(mm.decode_aiff(aiff_bytes())[2]) == 0
    # FORM(12) + COMM(8+18) = the first 38 bytes: a COMM-only stream
    with pytest.raises(ValueError, match="no SSND"):
        mm.decode_aiff(aiff_bytes()[:38])



def test_aiff_through_wav_features_surface(spark):
    """wav_features accepts FORM payloads: one row with the same stats
    contract as WAV, torn payloads skip."""
    import numpy as np

    x = (0.25 * 32767 * np.sin(2 * np.pi * 300 * np.arange(2000) / 8000)).astype(np.int64)
    d = spark.createDataFrame(
        [(1, aiff_with_samples(8000, x)), (2, aiff_with_samples(8000, x, True)),
         (3, b"FORMxxxxAIFF")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in mm.wav_features(d).collect()}
    assert got[1].n_samples == 2000 and got[1].sample_rate == 8000
    assert abs(got[1].rms - got[2].rms) < 1e-9  # byte orders agree exactly
    assert got[3].n_samples == -1


def test_ogg_false_capture_pattern_in_packet_data():
    """'OggS' is NOT escaped inside packet bytes (RFC 3533 has no byte
    stuffing), so a backwards rfind for the capture pattern can land
    inside compressed Opus/Vorbis data — including <14 bytes from the
    payload end, where unpacking a granule would raise struct.error.
    The forward segment-table walk must ignore both plants and report
    the true final-page granule."""
    opushead = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    # a mid-stream body carrying a full fake page header (granule would
    # read as a huge number), and a final body whose 'OggS' sits 6 bytes
    # from the payload end (rfind there would struct.error)
    fake_hdr = b"OggS" + bytes([0, 0]) + struct.pack("<q", 1 << 60) + b"\x00" * 13
    p = (
        ogg_page(opushead, 0, htype=2)
        + ogg_page(fake_hdr + b"\x00" * 8, 48000, seq=1)
        + ogg_page(b"\x00" * 10 + b"OggS\x00\x00", 48000 * 2, htype=4, seq=2)
    )
    m = mm.parse_ogg_meta(p)
    assert abs(m["duration_s"] - 2.0) < 1e-12


def test_ogg_torn_tail_and_dataless_pages():
    """A torn final page keeps the duration as of the last COMPLETE
    page; -1 granules (no packet ends on the page) do not advance the
    clock; a first page that is itself torn refuses with ValueError."""
    opushead = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    good = ogg_page(opushead, 0, htype=2) + ogg_page(b"\x00" * 32, 48000, seq=1)
    cont = ogg_page(b"\x00" * 16, -1, htype=1, seq=2)  # continuation, no granule
    torn = ogg_page(b"\x00" * 64, 48000 * 9, seq=3)[:40]
    m = mm.parse_ogg_meta(good + cont + torn)
    assert abs(m["duration_s"] - 1.0) < 1e-12

    with pytest.raises(ValueError, match="torn"):
        mm.parse_ogg_meta(ogg_page(opushead, 0, htype=2)[:30])


def test_m4a_mdhd_timescale_is_the_sample_rate():
    """The audio track's mdhd timescale IS the sample rate; the mvhd
    movie timescale is only the presentation clock (600 here) and must
    never be reported as sample_rate. Without an mdhd box the rate is
    0 = unknown, like channels/bits_per_sample."""
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 600, 2400) + b"\x00" * 80)
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + struct.pack(">I", 16) + b"mp4a" + b"\x00" * 8)
    hdlr = box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"soun" + b"\x00" * 13)
    mdhd = box(b"mdhd", struct.pack(">B3xIIII", 0, 0, 0, 44100, 44100 * 4) + b"\x00" * 4)
    ftyp = box(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"M4A mp42")

    trak = box(b"trak", box(b"mdia", mdhd + hdlr + box(b"minf", box(b"stbl", stsd))))
    m = mm.parse_audio_meta(ftyp + box(b"moov", mvhd + trak))
    assert m["sample_rate"] == 44100 and abs(m["duration_s"] - 4.0) < 1e-12

    trak_no = box(b"trak", box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd))))
    m = mm.parse_audio_meta(ftyp + box(b"moov", mvhd + trak_no))
    assert m["sample_rate"] == 0  # unknown — never the movie clock


def test_m4a_dispatch_through_box_walk():
    """An ISO-BMFF payload with a soun track routes through the r10 box
    walk onto the audio schema; one with only video refuses."""
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 44100, 44100 * 4) + b"\x00" * 80)
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + struct.pack(">I", 16) + b"mp4a" + b"\x00" * 8)
    hdlr = box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"soun" + b"\x00" * 13)
    trak = box(b"trak", box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd))))
    m4a = box(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"M4A mp42") + box(b"moov", mvhd + trak)
    m = mm.parse_audio_meta(m4a)
    assert m["codec"] == "mp4a" and abs(m["duration_s"] - 4.0) < 1e-12

    hdlr_v = box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 13)
    trak_v = box(b"trak", box(b"mdia", hdlr_v + box(b"minf", box(b"stbl", stsd))))
    vid = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + box(b"moov", mvhd + trak_v)
    with pytest.raises(ValueError, match="no audio track"):
        mm.parse_audio_meta(vid)


def test_media_router_one_scan_all_modalities(spark):
    """r11 capstone: probe_media_meta routes a MIXED payload column in
    one pass — image (decodable locally vs WebP/GIF routed out), audio
    (PCM decodable, MP3/FLAC routed), BMFF by its TRACKS (vide wins
    even with audio riding along; soun-only is M4A audio) — with
    unclaimed payloads as modality-NULL skip rows."""
    import numpy as np

    from http_feeds_spark.functions import jpeg as J

    img = np.random.RandomState(3).randint(0, 256, (8, 8, 3)).astype(np.uint8)

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    def bmff(handlers):
        mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 600, 1200) + b"\x00" * 80)
        traks = b""
        for h, codec in handlers:
            stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + struct.pack(">I", 16) + codec + b"\x00" * 8)
            hdlr = box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + h + b"\x00" * 13)
            tkhd = box(b"tkhd", struct.pack(">B3xIIIII", 0, 0, 0, 1, 0, 0) + b"\x00" * 52 + struct.pack(">II", 320 << 16, 240 << 16))
            traks += box(b"trak", tkhd + box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd))))
        return box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + box(b"moov", mvhd + traks)

    from http_feeds_spark.functions import flac as fl
    from http_feeds_spark.functions import tiff as tf
    from http_feeds_spark.functions import vp8l

    pcm = (1000 * np.sin(np.arange(800) / 20)).astype(np.int64)
    rows = [
        (1, J.encode_jpeg(img, progressive=True)),          # image, decodable
        (2, b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 " + struct.pack("<I", 14)
            + b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48) + b"\x00\x00"),
        (3, mp3_frame() * 2),                    # audio, decodable since r14
        (4, wav_bytes()),                                    # audio, decodable
        (5, bmff([(b"vide", b"avc1"), (b"soun", b"mp4a")])),  # video wins
        (6, bmff([(b"soun", b"mp4a")])),                     # audio-only BMFF
        (7, b"just text"),                                   # unclaimed
        # the r12 tiers route too, each with its decodability verdict
        (8, tf.encode_tiff(img, compression=5, predictor=2)),
        (9, vp8l.encode_vp8l(img)),
        (10, mm.encode_ico(img[:8, :8])),
        (11, fl.encode_flac(pcm, 8000)),
        (12, aiff_bytes()),
        (13, adts_frame() * 2),
    ]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.probe_media_meta(d).collect()}
    assert (got[1].modality, got[1].format, got[1].decodable) == ("image", "jpeg", True)
    assert (got[2].modality, got[2].format, got[2].decodable) == ("image", "webp", False)
    assert (got[2].width, got[2].height) == (64, 48)
    assert (got[3].modality, got[3].decodable) == ("audio", True)
    assert (got[4].modality, got[4].format, got[4].decodable) == ("audio", "pcm", True)
    assert (got[5].modality, got[5].format) == ("video", "avc1")
    assert (got[6].modality, got[6].format) == ("audio", "mp4a")
    assert got[7].modality is None and got[7].width == -1
    assert (got[8].modality, got[8].format, got[8].decodable) == ("image", "tiff", True)
    assert (got[9].modality, got[9].format, got[9].decodable) == (
        "image", "webp_lossless", True
    )
    assert (got[10].modality, got[10].format, got[10].decodable) == ("image", "ico", True)
    assert (got[11].modality, got[11].format, got[11].decodable) == ("audio", "flac", True)
    assert (got[12].modality, got[12].format, got[12].decodable) == ("audio", "pcm", True)
    assert (got[13].modality, got[13].decodable) == ("audio", False)  # aac


def test_mp3_sub_decodable_probe_gates_routing():
    """r15 (ADVICE r14): the MP3 decodable bit is a PER-PAYLOAD probe of
    the first frames' side info, mirroring the TIFF/ICO image hints — a
    stream selecting an unvalidated Huffman table (10) or intensity
    stereo routes decodable=False instead of dying downstream in the
    audiofp Arrow pass, while tables the decoder ships stay True —
    including, as of the r15 escape-table landing, streams the encoder
    twin emits through the 16-family escape tables."""
    import numpy as np

    from http_feeds_spark.functions import mp3

    t = np.arange(1152 * 2) / 44100.0
    good = mp3.encode_mp3(np.sin(2 * np.pi * 700 * t), 44100)
    r = mm.parse_media_meta(good)
    assert (r["modality"], r["decodable"]) == ("audio", True)

    # a fine-quantized stream selecting an escape table (16-23) is now
    # inside the validated set and probes True
    fine = mp3.encode_mp3(np.sin(2 * np.pi * 700 * t), 44100, max_q=120)
    tids = {
        ch["table_select"][0]
        for _, si, _ in mp3.iter_frames(fine)
        for gr in si["granules"]
        for ch in gr
    }
    assert tids & set(range(16, 24)), tids
    r_fine = mm.parse_media_meta(fine)
    assert (r_fine["modality"], r_fine["decodable"]) == ("audio", True)

    # rewrite granule 0's table_select fields to 10 (the one big-value
    # table still outside the validated set) — same bit surgery as
    # test_mp3's boundary test
    blob = bytearray(good)
    pos = 4 * 8 + 52
    for k in range(3):
        for i in range(5):
            bit = (10 >> (4 - i)) & 1
            p = pos + k * 5 + i
            if bit:
                blob[p // 8] |= 0x80 >> (p % 8)
            else:
                blob[p // 8] &= ~(0x80 >> (p % 8))
    r10 = mm.parse_media_meta(bytes(blob))
    assert (r10["modality"], r10["decodable"]) == ("audio", False)

    # zero-spectrum frames (no big values) probe True regardless
    r0 = mm.parse_media_meta(mp3_frame() * 2)
    assert (r0["modality"], r0["decodable"]) == ("audio", True)

    # intensity stereo (joint mode, mode_ext bit 0) probes False
    joint = bytearray(mp3_frame())
    joint[3] = (1 << 6) | (1 << 4)  # joint stereo, intensity on
    r_int = mm.parse_media_meta(bytes(joint) + bytes(joint))
    assert (r_int["modality"], r_int["decodable"]) == ("audio", False)
