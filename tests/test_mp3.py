"""MP3 Layer III decoder/encoder (functions/mp3.py).

The module's two constant-provenance boundaries each get their
validation pinned here (see its docstring): every shipped Huffman table
must be a COMPLETE prefix code (Kraft sum exactly 1, prefix-free —
the property a misremembered spec constant breaks), and the in-repo
PQMF prototype must actually reconstruct (measured SNR). Wire-level
witnesses: the real LAME 3.98 stream in this container (digital
silence — header walk, LSF side info, reservoir, zero spectra, and an
exactly-zero PCM contract), a hand-packed MPEG-1 frame whose Huffman
bits were computed by hand against the table listing, encoder-twin
round trips at all nine sample rates, and the loud boundary errors.
"""

from __future__ import annotations

import numpy as np
import pytest

from http_feeds_spark.functions import mp3

LAME_FILE = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


# --- constant-provenance validation -------------------------------------------


def _assert_complete_prefix_code(pairs):
    """pairs: iterable of (hlen, hcod)."""
    kraft = 0.0
    codes = set()
    for ln, co in pairs:
        assert 0 < ln <= 19 and 0 <= co < (1 << ln)
        kraft += 2.0 ** -ln
        bits = format(co, f"0{ln}b")
        assert bits not in codes
        codes.add(bits)
    assert abs(kraft - 1.0) < 1e-12, kraft
    # prefix-freeness
    ordered = sorted(codes)
    for a, b in zip(ordered, ordered[1:]):
        assert not b.startswith(a), (a, b)


@pytest.mark.parametrize("tid", sorted(mp3.HUFFMAN_TABLES))
def test_big_value_tables_are_complete_prefix_codes(tid):
    _, _, _, hlen, hcod = mp3.HUFFMAN_TABLES[tid]
    _assert_complete_prefix_code(
        (hlen[x][y], hcod[x][y]) for x in range(len(hlen)) for y in range(len(hlen[0]))
    )


def test_count1_tables_are_complete_prefix_codes():
    _assert_complete_prefix_code(zip(*mp3.COUNT1_A))
    _assert_complete_prefix_code(zip(*mp3.COUNT1_B))


def test_scalefactor_band_tables_structural():
    for rate, t in mp3.SFB_LONG.items():
        assert len(t) == 23 and t[0] == 0 and t[-1] == 576, rate
        assert all(a <= b for a, b in zip(t, t[1:])), rate
    for rate, t in mp3.SFB_SHORT.items():
        assert len(t) == 14 and t[0] == 0 and t[-1] == 192, rate
        assert all(a <= b for a, b in zip(t, t[1:])), rate


def test_pqmf_prototype_reconstructs():
    """analysis∘synthesis SNR — the property an invented window table
    cannot satisfy; pins the measured quality of the in-repo prototype
    (the documented substitute for the spec's Table B.3 constants)."""
    rng = np.random.RandomState(7)
    x = rng.randn(32 * 300)
    y = mp3.synth_filterbank(mp3.analysis_filterbank(x))
    d = 481
    n = len(x) - d - 32
    a, b = x[:n], y[d : d + n]
    g = np.dot(a, b) / np.dot(b, b)
    err = a - g * b
    snr = 10 * np.log10(np.dot(a, a) / np.dot(err, err))
    assert snr > 38.0, snr
    assert abs(g - 1.0) < 0.01, g  # unity-gain calibration


# --- real-stream witness --------------------------------------------------------


@pytest.mark.skipif(
    not __import__("os").path.exists(LAME_FILE),
    reason="container's gsutil test.mp3 not present — the real-stream witness needs it",
)
def test_real_lame_stream_decodes_to_silence():
    """A REAL LAME 3.98.2 MPEG-2 22.05 kHz mono stream (the only MP3 in
    this container). It is digital silence, so it exercises the ID3
    skip, header walk, LSF side info, bit reservoir pointers, and the
    zero-spectrum pipeline — and its PCM must be EXACTLY zero (any
    spurious energy anywhere in the chain would show)."""
    data = open(LAME_FILE, "rb").read()
    frames = list(mp3.iter_frames(data))
    assert len(frames) == 45
    hdr = frames[0][0]
    assert (hdr["mpeg1"], hdr["rate"], hdr["nch"]) == (False, 22050, 1)
    assert all(
        g["part2_3_length"] == 0 and g["big_values"] == 0
        for _, si, _ in frames
        for gr in si["granules"]
        for g in gr
    )
    rate, nch, x = mp3.decode_mp3(data)
    assert (rate, nch) == (22050, 1)
    assert len(x) == 45 * 576 - mp3.DECODER_DELAY
    assert float(np.abs(x).max()) == 0.0


# --- hand-packed frame (entropy + requantize stage, exact) -----------------------


def test_handpacked_frame_exact_spectrum():
    """One MPEG-1 44.1 kHz mono frame packed BY HAND: granule 0 carries
    two big-value pairs under table 1 — codeword '1'->(0,0) then
    '01'->(1,0) with a sign bit — and one count1 quad under table B
    (code 15-v complement). The decoder's Huffman+requantize stages
    must reproduce the hand-computed values exactly."""
    bits = []

    def w(v, n):
        bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    # header: MPEG-1 L3 no CRC, 64 kbps, 44.1 kHz, mono
    hdr = bytes([0xFF, 0xFB, (5 << 4) | (0 << 2), 3 << 6])
    # side info: mdb 0, private 0, scfsi 0
    w(0, 9)
    w(0, 5)
    w(0, 4)
    # granule 0: 2 big-value pairs via table 1 + 1 quad via count1 B
    # main bits: pair(0,0)='1'(1) ; pair(1,0)='01'+sign1(neg) (3)
    # quad v=0b1010 -> code 15-10=5 '0101'(4) + signs for v,x: 0,1 (2)
    # part2_3 = 1 + 3 + 4 + 2 = 10 bits
    w(10, 12)
    w(2, 9)  # big_values
    w(210, 8)  # global_gain -> gain 1.0
    w(0, 4)  # scalefac_compress
    w(0, 1)  # wsf
    for _ in range(3):
        w(1, 5)  # table 1 everywhere
    w(15, 4)
    w(5, 3)
    w(0, 1)
    w(0, 1)
    w(1, 1)  # count1 table B
    # granule 1: empty
    w(0, 12)
    w(0, 9)
    w(210, 8)
    w(0, 4)
    w(0, 1)
    for _ in range(3):
        w(0, 5)
    w(0, 4)
    w(0, 3)
    w(0, 1)
    w(0, 1)
    w(0, 1)
    # main data: 1 | 01 1 | 0101 0 1
    for b in [1, 0, 1, 1, 0, 1, 0, 1, 0, 1]:
        bits.append(b)
    bits.extend([0] * (-len(bits) % 8))
    body = bytes(
        sum(bits[i + j] << (7 - j) for j in range(8)) for i in range(0, len(bits), 8)
    )
    flen = 144000 * 64 // 44100
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))

    frames = list(mp3.iter_frames(frame))
    assert len(frames) == 1
    fhdr, si, main = frames[0]
    g0 = si["granules"][0][0]
    assert (g0["part2_3_length"], g0["big_values"]) == (10, 2)
    b = mp3._Bits(main)
    is_q = mp3._decode_spectrum(b, fhdr, g0, 10)
    # pairs: (0,0) then (-1, 0); quad 1010 with signs (+1, 0, -1, 0)
    want = np.zeros(576, dtype=np.int32)
    want[2] = -1
    want[4] = 1
    want[6] = -1
    assert np.array_equal(is_q, want), is_q[:10]
    assert b.pos == 10  # exact bit accounting
    # requantize with gg=210, no scalefactors: xr == is
    xr = mp3._requantize(fhdr, g0, [0] * 22, [[0] * 3] * 13, 0, is_q)
    assert np.allclose(xr[:8], [0, 0, -1, 0, 1, 0, -1, 0])


# --- encoder twin round trips ------------------------------------------------------


@pytest.mark.parametrize("rate", [44100, 32000, 22050, 8000])
def test_encode_decode_round_trip(rate):
    """Spectral peak bins survive the coarse (|is|<=5) quantization
    exactly and overall SNR stays above the quantization floor."""
    t = np.arange(int(rate * 1.2)) / rate
    x = 0.5 * np.sin(2 * np.pi * rate * 0.03 * t) + 0.3 * np.sin(2 * np.pi * rate * 0.11 * t)
    blob = mp3.encode_mp3(x, rate)
    r2, nch, y = mp3.decode_mp3(blob)
    assert (r2, nch) == (rate, 1)
    n = min(len(x), len(y)) - 64
    a, b = x[:n], y[:n]
    g = np.dot(a, b) / np.dot(b, b)
    err = a - g * b
    snr = 10 * np.log10(np.dot(a, a) / np.dot(err, err))
    assert snr > 14.0, snr
    wa = np.abs(np.fft.rfft(a * np.hanning(n)))
    wb = np.abs(np.fft.rfft(b * np.hanning(n)))
    assert wa.argmax() == wb.argmax()


def test_mp3_pairs_with_wav_master_in_constellation():
    """The r13 verdict's gap: cross-container audio dedup paired only
    lossless twins. The chunk-tier constellation must now pair an MP3
    re-encode with its WAV master at FULL matched fraction (delay
    trimmed, peak bins exact), and share nothing across documents."""
    import io
    import wave

    from http_feeds_spark.functions import audiofp

    def master(seed):
        rng = np.random.RandomState(seed)
        t = np.arange(20000)
        edges = (1, 4, 16, 48, 128, 288, 513)
        sig = 0.0
        for i in range(6):
            bb = rng.randint(edges[i], edges[i + 1])
            sig = sig + (9000 - 900 * i) * np.sin(2 * np.pi * (bb * 8000 / 1024) * t / 8000 + i)
        return (sig / (np.abs(sig).max() / 18000) + rng.randn(len(t)) * 40).astype(np.int64)

    def wav_of(x):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(x.astype("<i2").tobytes())
        return buf.getvalue()

    x = master(3)
    a = set(audiofp._fingerprint(audiofp._mono_samples(wav_of(x))))
    b = set(audiofp._fingerprint(audiofp._mono_samples(mp3.encode_mp3(x / 32768.0, 8000))))
    assert a and a == b
    # cross-document: stays far below the 0.8 pairing threshold (single
    # low bands can collide by chance — band 0 has three possible bins)
    c = set(audiofp._fingerprint(audiofp._mono_samples(mp3.encode_mp3(master(4) / 32768.0, 8000))))
    assert len(a & c) / len(a) < 0.5


def test_table12_unique_completion_pin():
    """Table 12 ships as recollection + ONE completion (mp3.py data
    note): with entry (x=6, y=4) at its recalled 9 bits the table has a
    Kraft deficit of exactly 1/512 and a prefix overlap; at 8 bits it is
    complete. The pin re-runs the uniqueness argument: across EVERY
    single-length modification of the shipped table, only the identity
    keeps it a complete prefix code — so the shipped form is the unique
    completion of the recalled data."""
    from fractions import Fraction

    _, _, _, hlen, hcod = mp3.HUFFMAN_TABLES[12]
    assert hlen[6][4] == 8 and hcod[6][4] == 10

    def complete(lens):
        kraft, codes = Fraction(0), set()
        for x in range(8):
            for y in range(8):
                ln = lens[x][y]
                if hcod[x][y] >= (1 << ln):
                    return False
                bits = format(hcod[x][y], f"0{ln}b")
                if bits in codes:
                    return False
                codes.add(bits)
                kraft += Fraction(1, 1 << ln)
        if kraft != 1:
            return False
        ordered = sorted(codes)
        return all(not b.startswith(a) for a, b in zip(ordered, ordered[1:]))

    assert complete(hlen)
    for x in range(8):
        for y in range(8):
            for ln in range(1, 14):
                if ln == hlen[x][y]:
                    continue
                trial = [row[:] for row in hlen]
                trial[x][y] = ln
                assert not complete(trial), (x, y, ln)


def test_handpacked_escape_frame_exact_spectrum():
    """One MPEG-1 frame whose granule 0 uses escape table 19 (linbits
    4): three big-value pairs exercising the full escape grammar —
    x-escape with extension (17 = 15+2), x-escape with ZERO extension
    (-15), and y-escape (-18 = -(15+3)) — in the decoder's exact read
    order (codeword, x linbits, x sign, y linbits, y sign), with exact
    bit accounting."""
    t19 = mp3.HUFFMAN_TABLES[19]
    assert t19[2] == 4  # linbits
    bits = []

    def w(v, n):
        bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    main = []

    def m(v, n):
        main.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    def pair(a, b):
        xs, ys = min(abs(a), 15), min(abs(b), 15)
        m(t19[4][xs][ys], t19[3][xs][ys])
        if xs == 15:
            m(abs(a) - 15, 4)
        if a:
            m(1 if a < 0 else 0, 1)
        if ys == 15:
            m(abs(b) - 15, 4)
        if b:
            m(1 if b < 0 else 0, 1)

    want_pairs = [(17, 2), (-15, 0), (3, -18)]
    for a, b in want_pairs:
        pair(a, b)
    p23 = len(main)

    hdr = bytes([0xFF, 0xFB, (5 << 4) | (0 << 2), 3 << 6])
    w(0, 9)
    w(0, 5)
    w(0, 4)
    w(p23, 12)
    w(3, 9)  # big_values
    w(210, 8)
    w(0, 4)
    w(0, 1)
    for _ in range(3):
        w(19, 5)
    w(15, 4)
    w(5, 3)
    w(0, 1)
    w(0, 1)
    w(0, 1)
    # granule 1: empty
    w(0, 12)
    w(0, 9)
    w(210, 8)
    w(0, 4)
    w(0, 1)
    for _ in range(3):
        w(0, 5)
    w(0, 4)
    w(0, 3)
    w(0, 1)
    w(0, 1)
    w(0, 1)
    bits.extend(main)
    bits.extend([0] * (-len(bits) % 8))
    body = bytes(
        sum(bits[i + j] << (7 - j) for j in range(8)) for i in range(0, len(bits), 8)
    )
    flen = 144000 * 64 // 44100
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))

    frames = list(mp3.iter_frames(frame))
    assert len(frames) == 1
    fhdr, si, mdata = frames[0]
    g0 = si["granules"][0][0]
    assert (g0["part2_3_length"], g0["big_values"], g0["table_select"][0]) == (p23, 3, 19)
    b = mp3._Bits(mdata)
    is_q = mp3._decode_spectrum(b, fhdr, g0, p23)
    want = np.zeros(576, dtype=np.int32)
    want[:6] = [17, 2, -15, 0, 3, -18]
    assert np.array_equal(is_q, want), is_q[:8]
    assert b.pos == p23  # exact bit accounting


@pytest.mark.parametrize("tid", sorted(mp3.LINBITS))
def test_escape_grammar_fuzz_exact(tid):
    """Seeded fuzz over the full escape grammar for EVERY escape table
    (16-31): random signed big-value pairs spanning the table's whole
    range — zeros, the 0..14 direct band, exactly 15 (zero-width
    extension reads on linbits tables), and deep escape values up to
    15 + 2^linbits - 1 — written by the encoder's pair writer and
    decoded back value-exact with exact bit accounting."""
    rng = np.random.RandomState(100 + tid)
    lin = mp3.LINBITS[tid]
    top = 15 + (1 << lin) - 1
    mags = rng.randint(0, top + 1, size=40)
    mags[:4] = [0, 14, 15, top]  # force the grammar's corner cases
    signs = rng.choice([-1, 1], size=40)
    vals = (mags * signs).astype(int)
    pairs = list(zip(vals[0::2], vals[1::2]))

    w = mp3._BitWriter()
    for a, b in pairs:
        mp3._enc_write_pair(w, tid, int(a), int(b))
    data = w.to_bytes()
    bits = mp3._Bits(data)
    out = []
    for _ in pairs:
        out.append(mp3._decode_big_value(bits, tid, len(w.bits)))
    assert out == [(int(a), int(b)) for a, b in pairs]
    assert bits.pos == len(w.bits)  # exact bit accounting


def test_escape_encode_decode_round_trip():
    """The r14 verdict's 'Done' witness: a NON-SILENT standard-shape
    stream whose granules select an escape table (>= 16) — the family
    real encoders pick for non-quiet content — decodes
    sample-plausibly: fine quantization lifts round-trip SNR close to
    the PQMF prototype's measured ceiling (~41 dB), spectral peak bins
    are exact, and the constellation tier pairs the decode with its
    lossless master at full matched fraction."""
    import io
    import wave

    from http_feeds_spark.functions import audiofp

    rate = 44100
    t = np.arange(1152 * 6) / rate
    music = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 554.37 * t)
        + 0.2 * np.sin(2 * np.pi * 659.25 * t)
        + 0.15 * np.sin(2 * np.pi * 1760 * t)
    )
    music /= np.abs(music).max() * 1.1

    blob = mp3.encode_mp3(music, rate, max_q=120)
    tids = {
        ch["table_select"][0]
        for _, si, _ in mp3.iter_frames(blob)
        for gr in si["granules"]
        for ch in gr
        if ch["big_values"]
    }
    assert tids and all(tid >= 16 for tid in tids), tids

    r2, nch, pcm = mp3.decode_mp3(blob)
    assert (r2, nch) == (rate, 1)
    w = np.hanning(4096)
    spec_m = np.abs(np.fft.rfft(music[1200 : 1200 + 4096] * w))
    spec_d = np.abs(np.fft.rfft(pcm[1200 : 1200 + 4096] * w))
    assert set(np.argsort(spec_m)[-4:]) == set(np.argsort(spec_d)[-4:])
    a, b = music[1200 : 1200 + 4096], pcm[1200 : 1200 + 4096]
    g = np.dot(a, b) / np.dot(b, b)
    err = a - g * b
    snr = 10 * np.log10(np.dot(a, a) / np.dot(err, err))
    assert snr > 30.0, snr  # coarse table-9 mode measures ~16 dB here

    # constellation pairing with the lossless master (8 kHz tier, the
    # fingerprint's native rate) through an escape-table stream. The
    # master carries one strong partial per fingerprint band (the
    # constellation is prominence-gated per band — a 4-tone chord
    # leaves the upper bands keyless).
    rng = np.random.RandomState(7)
    tt = np.arange(24000)
    edges = (1, 4, 16, 48, 128, 288, 513)
    sig = 0.0
    for i, amp in enumerate((8000, 6000, 5000, 4000, 3000, 2500)):
        bb = rng.randint(edges[i], edges[i + 1])
        sig = sig + amp * np.sin(2 * np.pi * (bb * 8000 / 1024) * tt / 8000 + i)
    x = (sig / (np.abs(sig).max() / 20000) + rng.randn(len(tt)) * 50).astype(np.int64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(x.astype("<i2").tobytes())
    fine8k = mp3.encode_mp3(x / 32768.0, 8000, max_q=120)
    tids8k = {
        ch["table_select"][0]
        for _, si, _ in mp3.iter_frames(fine8k)
        for gr in si["granules"]
        for ch in gr
        if ch["big_values"]
    }
    assert tids8k and all(tid >= 16 for tid in tids8k), tids8k
    keys_master = set(audiofp._fingerprint(audiofp._mono_samples(buf.getvalue())))
    keys_mp3 = set(audiofp._fingerprint(audiofp._mono_samples(fine8k)))
    assert keys_master and keys_master == keys_mp3


# --- boundaries refuse loudly --------------------------------------------------------


def test_unvalidated_huffman_table_raises():
    t = np.arange(1152 * 2) / 44100.0
    blob = bytearray(mp3.encode_mp3(np.sin(2 * np.pi * 700 * t), 44100))
    # rewrite granule 0's three table_select fields (table 9 -> 10, the
    # one big-value table whose recollection did not validate):
    # side info layout bits: 9+5+4 +12+9+8+4+1 = 52 bits in, 3x5 bits
    pos = 4 * 8 + 52
    for k in range(3):
        for i in range(5):
            bit = (10 >> (4 - i)) & 1
            p = pos + k * 5 + i
            if bit:
                blob[p // 8] |= 0x80 >> (p % 8)
            else:
                blob[p // 8] &= ~(0x80 >> (p % 8))
    with pytest.raises(NotImplementedError, match="table 10"):
        mp3.decode_mp3(bytes(blob))


def test_non_mp3_payload_raises():
    with pytest.raises(ValueError):
        mp3.decode_mp3(b"RIFF" + b"\x00" * 64)


def test_free_format_bitrate_raises():
    hdr = bytes([0xFF, 0xFB, 0x00, 0xC0])
    with pytest.raises(NotImplementedError, match="free-format"):
        mp3.parse_header(hdr)


def test_registered_mp3_query(spark, sf_dir):
    """q_mm_mp3_real: every healthy payload decodes (rate/duration as
    synthesized, RMS near the sine's amp/sqrt(2)), every sixth is the
    skip row, and the result is deterministic."""
    from http_feeds_spark.queries import registry

    q = registry()["q_mm_mp3_real"]
    assert q.oracle is None
    rows = q.fn(spark, sf_dir).collect()
    assert len(rows) == 18
    for rank, r in enumerate(rows):
        if rank % 6 == 5:
            assert r.n_samples == -1
            continue
        assert r.sample_rate == [32000, 16000, 8000][r.doc_id % 3]
        # 0.6 s synthesized, minus frame flooring and the trimmed
        # decoder delay (1057 samples — largest share at 8 kHz)
        assert 0.4 < r.duration_s <= 0.6
        amp = 0.2 + (r.doc_id % 6) / 10.0
        assert abs(r.rms - amp / np.sqrt(2)) < 0.05 * amp, (r.doc_id, r.rms, amp)
    assert rows == q.fn(spark, sf_dir).collect()


def test_handpacked_short_block_reorder_and_subblock_gain():
    """A hand-packed window-switching granule (block_type 2, pure
    short): three table-1 pairs land in the first short scalefactor
    band, subblock gains (0,1,2) scale windows 1 and 2 down by exactly
    2^-2 / 2^-4, and the wire->window-interleave reorder is pinned
    value-exact; the full decode then runs the short-window IMDCT path
    end-to-end (finite, deterministic)."""
    bits = []

    def w(v, n):
        bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    hdr = bytes([0xFF, 0xFB, (5 << 4) | (0 << 2), 3 << 6])  # 64k 44.1 mono
    w(0, 9)
    w(0, 5)
    w(0, 4)
    # granule 0: wsf=1 bt=2 pure short; pairs (1,1),(1,0),(0,1) via table 1
    # bits: '000'+2 signs(+,-) | '01'+sign(+) | '001'+sign(-) = 12
    w(12, 12)
    w(3, 9)
    w(210, 8)
    w(0, 4)
    w(1, 1)  # window_switching_flag
    w(2, 2)  # block_type 2
    w(0, 1)  # mixed
    w(1, 5)
    w(1, 5)  # table_select x2
    w(0, 3)
    w(1, 3)
    w(2, 3)  # subblock_gain 0,1,2
    w(0, 1)  # preflag
    w(0, 1)  # scalefac_scale
    w(0, 1)  # count1table_select
    # granule 1: empty long
    w(0, 12)
    w(0, 9)
    w(210, 8)
    w(0, 4)
    w(0, 1)
    for _ in range(3):
        w(0, 5)
    w(0, 4)
    w(0, 3)
    w(0, 1)
    w(0, 1)
    w(0, 1)
    for b in [0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 1, 1]:
        bits.append(b)
    bits.extend([0] * (-len(bits) % 8))
    body = bytes(
        sum(bits[i + j] << (7 - j) for j in range(8)) for i in range(0, len(bits), 8)
    )
    flen = 144000 * 64 // 44100
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))

    fhdr, si, main = next(iter(mp3.iter_frames(frame)))
    g0 = si["granules"][0][0]
    assert (g0["block_type"], g0["subblock_gain"]) == (2, [0, 1, 2])
    assert mp3._region_boundaries(fhdr, g0) == (36, 576)
    b = mp3._Bits(main)
    is_q = mp3._decode_spectrum(b, fhdr, g0, 12)
    assert b.pos == 12  # exact bit accounting through the short path
    assert list(is_q[:6]) == [1, -1, 1, 0, 0, -1]
    # requantize in wire order: windows 1/2 scaled by 2^-2 / 2^-4
    xr = mp3._requantize(fhdr, g0, [0] * 22, [[0] * 3 for _ in range(13)], 0, is_q)
    assert np.allclose(xr[:8], [1, -1, 1, 0, 0, -0.25, 0, 0])
    # reorder to window-interleaved line order (44.1k short band 0 = 4 lines)
    re = mp3._reorder_short(fhdr, g0, xr)
    assert np.allclose(re[:12], [1, 0, 0, -1, -0.25, 0, 1, 0, 0, 0, 0, 0])
    # the short-window IMDCT path runs end-to-end
    rate, nch, pcm = mp3.decode_mp3(frame)
    assert (rate, nch) == (44100, 1)
    assert np.isfinite(pcm).all() and float(np.abs(pcm).max()) < 1.0
    r2 = mp3.decode_mp3(frame)[2]
    assert np.array_equal(pcm, r2)


@pytest.mark.parametrize("bt", [1, 3])
def test_handpacked_start_stop_block_windows(bt):
    """Window-switching with long block types 1 (start) and 3 (stop):
    the spectrum decodes exactly as a long granule and the block-shaped
    IMDCT windows run end-to-end."""
    bits = []

    def w(v, n):
        bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    hdr = bytes([0xFF, 0xFB, (5 << 4) | (0 << 2), 3 << 6])
    w(0, 9)
    w(0, 5)
    w(0, 4)
    # one pair (1,1) via table 1: '000' + 2 signs = 5 bits
    w(5, 12)
    w(1, 9)
    w(210, 8)
    w(0, 4)
    w(1, 1)
    w(bt, 2)
    w(0, 1)
    w(1, 5)
    w(1, 5)
    w(0, 3)
    w(0, 3)
    w(0, 3)
    w(0, 1)
    w(0, 1)
    w(0, 1)
    w(0, 12)
    w(0, 9)
    w(210, 8)
    w(0, 4)
    w(0, 1)
    for _ in range(3):
        w(0, 5)
    w(0, 4)
    w(0, 3)
    w(0, 1)
    w(0, 1)
    w(0, 1)
    # '000' (pair (1,1)) + signs: + then -
    for x in [0, 0, 0, 0, 1]:
        bits.append(x)
    bits.extend([0] * (-len(bits) % 8))
    body = bytes(
        sum(bits[i + j] << (7 - j) for j in range(8)) for i in range(0, len(bits), 8)
    )
    flen = 144000 * 64 // 44100
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))
    fhdr, si, main = next(iter(mp3.iter_frames(frame)))
    g0 = si["granules"][0][0]
    assert g0["block_type"] == bt
    is_q = mp3._decode_spectrum(mp3._Bits(main), fhdr, g0, 5)
    assert list(is_q[:2]) == [1, -1]
    rate, nch, pcm = mp3.decode_mp3(frame)
    assert np.isfinite(pcm).all() and float(np.abs(pcm).max()) < 1.0


def _pack(bits):
    bits = bits + [0] * (-len(bits) % 8)
    return bytes(
        sum(bits[i + j] << (7 - j) for j in range(8)) for i in range(0, len(bits), 8)
    )


class _W:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        self.bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))


def _granule_si(si, p23, bv, sfc=0, tables=(1, 1, 1)):
    si.w(p23, 12)
    si.w(bv, 9)
    si.w(210, 8)
    si.w(sfc, 4)
    si.w(0, 1)
    for t in tables:
        si.w(t, 5)
    si.w(15, 4)
    si.w(5, 3)
    si.w(0, 1)
    si.w(0, 1)
    si.w(0, 1)


def test_handpacked_ms_stereo_frame():
    """A hand-packed MPEG-1 joint-stereo frame with mode_ext=2 (MS on,
    intensity off): 32-byte two-channel side info parses, the mid
    channel's lone (1,1) pair spreads to both output channels through
    the MS butterfly, and the stream decodes end-to-end."""
    si = _W()
    si.w(0, 9)
    si.w(0, 3)  # private (3 bits, stereo)
    si.w(0, 4)
    si.w(0, 4)  # scfsi both channels
    _granule_si(si, 5, 1)  # gr0 ch0 (mid): pair (1,1), signs +/+
    _granule_si(si, 0, 0)  # gr0 ch1 (side): silent
    _granule_si(si, 0, 0)
    _granule_si(si, 0, 0)
    side = _pack(si.bits)
    assert len(side) == 32
    hdr = bytes([0xFF, 0xFB, (5 << 4), (1 << 6) | (2 << 4)])  # joint, MS
    flen = 144000 * 64 // 44100
    body = side + _pack([0, 0, 0, 0, 0])  # '000' + two + signs
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))
    fhdr, sinfo, main = next(iter(mp3.iter_frames(frame)))
    assert (fhdr["nch"], fhdr["mode_ext"]) == (2, 2)
    rate, nch, pcm = mp3.decode_mp3(frame)
    assert (rate, nch) == (44100, 2)
    assert np.isfinite(pcm).all() and float(np.abs(pcm).max()) > 0


def test_handpacked_intensity_stereo_raises():
    """mode_ext with the intensity bit set must refuse loudly."""
    si = _W()
    si.w(0, 9)
    si.w(0, 3)
    si.w(0, 8)
    for _ in range(4):
        _granule_si(si, 0, 0)
    hdr = bytes([0xFF, 0xFB, (5 << 4), (1 << 6) | (1 << 4)])  # intensity
    flen = 144000 * 64 // 44100
    body = _pack(si.bits)
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))
    with pytest.raises(NotImplementedError, match="intensity"):
        mp3.decode_mp3(frame)


def test_lsf_nonzero_scalefactors_requantize():
    """MPEG-2 LSF 9-bit scalefac_compress with a nonzero slen group:
    sfc=4 -> slen (0,0,1,0) over blocks (6,5,5,5), so sfbs 11-15 carry
    one bit each. With those bits set, a pair planted at sfb 11
    (line 96 at 22.05 kHz) must requantize to exactly ±2^-0.5."""
    si = _W()
    si.w(0, 8)
    si.w(0, 1)
    # LSF granule: p23 = 5 sf bits + 48 zero-pair bits + 5 = 58
    si.w(58, 12)
    si.w(49, 9)
    si.w(210, 8)
    si.w(4, 9)  # scalefac_compress (9 bits, LSF)
    si.w(0, 1)
    for _ in range(3):
        si.w(1, 5)
    si.w(15, 4)
    si.w(5, 3)
    # no preflag field in LSF
    si.w(0, 1)
    si.w(0, 1)
    side = _pack(si.bits)
    assert len(side) == 9
    m = _W()
    m.w(0b11111, 5)  # scalefactors: sfbs 11..15 = 1
    for _ in range(48):
        m.w(1, 1)  # 48 (0,0) pairs via table 1
    m.w(0, 3)  # '000' -> (1,1)
    m.w(0, 1)  # sign +
    m.w(1, 1)  # sign -
    hdr = bytes([0xFF, 0xF3, (8 << 4), 3 << 6])  # MPEG-2, 64k, 22.05k, mono
    flen = 72000 * 64 // 22050
    body = side + _pack(m.bits)
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))
    fhdr, sinfo, main = next(iter(mp3.iter_frames(frame)))
    g0 = sinfo["granules"][0][0]
    assert (fhdr["mpeg1"], g0["scalefac_compress"]) == (False, 4)
    bits = mp3._Bits(main)
    sf_l, sf_s, preflag = mp3._read_scalefactors_lsf(bits, g0)
    assert sf_l[10] == 0 and sf_l[11] == 1 and sf_l[15] == 1 and sf_l[16] == 0
    is_q = mp3._decode_spectrum(bits, fhdr, g0, 58)
    assert bits.pos == 58
    assert is_q[96] == 1 and is_q[97] == -1 and not is_q[:96].any()
    xr = mp3._requantize(fhdr, g0, sf_l, sf_s, preflag, is_q)
    assert np.allclose([xr[96], xr[97]], [2**-0.5, -(2**-0.5)])
    rate, nch, pcm = mp3.decode_mp3(frame)
    assert (rate, nch) == (22050, 1) and np.isfinite(pcm).all()


def test_mpeg1_scfsi_shares_scalefactors_into_granule_1():
    """MPEG-1 scfsi: with groups 2+3 (sfbs 11-20) marked shared,
    granule 1 reads NO bits for them and must reuse granule 0's values
    — its sfb-11 pair requantizes to ±2^-0.5, not ±1."""
    si = _W()
    si.w(0, 9)
    si.w(0, 5)
    si.w(0b0011, 4)  # scfsi groups 2,3 shared
    # gr0: sfc=1 -> slen (0,1): 10 scalefactor bits (sfbs 11-20)
    # spectrum: 31 zero pairs + (1,1) at lines 62-63 = 36 bits
    _granule_si(si, 46, 32, sfc=1)
    # gr1: same spectrum, NO scalefactor bits (shared groups; slen1=0)
    _granule_si(si, 36, 32, sfc=1)
    side = _pack(si.bits)
    assert len(side) == 17
    m = _W()
    m.w(0b1111111111, 10)  # gr0 scalefactors sfbs 11..20 = 1
    for _ in range(31):
        m.w(1, 1)
    m.w(0, 3)
    m.w(0, 1)
    m.w(1, 1)  # (1,-1) at 62,63
    for _ in range(31):
        m.w(1, 1)
    m.w(0, 3)
    m.w(0, 1)
    m.w(1, 1)  # gr1: same, no scalefactors
    hdr = bytes([0xFF, 0xFB, (5 << 4), 3 << 6])
    flen = 144000 * 64 // 44100
    body = side + _pack(m.bits)
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))
    fhdr, sinfo, main = next(iter(mp3.iter_frames(frame)))
    bits = mp3._Bits(main)
    prev_sf = None
    vals = []
    for gr_idx in range(2):
        g = sinfo["granules"][gr_idx][0]
        start = bits.pos
        scfsi = sinfo["scfsi"][0] if gr_idx == 1 else [0, 0, 0, 0]
        sf_l, sf_s = mp3._read_scalefactors_mpeg1(bits, g, scfsi, prev_sf)
        prev_sf = sf_l
        is_q = mp3._decode_spectrum(bits, fhdr, g, start + g["part2_3_length"])
        assert bits.pos == start + g["part2_3_length"]
        xr = mp3._requantize(fhdr, g, sf_l, sf_s, g["preflag"], is_q)
        vals.append((sf_l[11], xr[62], xr[63]))
    assert vals[0] == (1, 2**-0.5, -(2**-0.5))
    assert vals[1] == (1, 2**-0.5, -(2**-0.5))  # shared, not re-read
    rate, nch, pcm = mp3.decode_mp3(frame)
    assert np.isfinite(pcm).all()


# --- r15: window-switched region boundaries (ADVICE r14, medium) ---------------


def test_region_boundary_conventions():
    """The de-facto decoder convention (dist10 III_hufman_decode /
    pdmp3 Read_Huffman): block_type 2 (pure short AND mixed) splits at
    line 36 with no region2; window-switched LONG blocks (types 1/3)
    split at band[region0_count+1] = band[8] — 54 at the 22.05/24/16 kHz
    LSF rates, 108 at 8 kHz, and 36 only where the MPEG-1 tables happen
    to put band[8] there."""
    ws_long = {"block_type": 1, "region0_count": 7, "region1_count": 13}
    assert mp3._region_boundaries({"rate": 22050}, {"block_type": 2}) == (36, 576)
    assert mp3._region_boundaries({"rate": 22050}, dict(ws_long)) == (54, 576)
    assert mp3._region_boundaries({"rate": 16000}, dict(ws_long)) == (54, 576)
    assert mp3._region_boundaries({"rate": 8000}, dict(ws_long)) == (108, 576)
    assert mp3._region_boundaries({"rate": 44100}, dict(ws_long)) == (36, 576)
    # normal long block: counts come from the bitstream
    g = {"block_type": 0, "region0_count": 0, "region1_count": 0}
    assert mp3._region_boundaries({"rate": 44100}, g) == (4, 8)


def test_implicit_region_counts_in_side_info():
    """Window-switching side info carries NO region counts; the implicit
    values are 8 for pure-short block_type 2, 7 otherwise (dist10
    III_get_side_info), with region1 the complement to 20."""

    def side_info_for(bt, mixed):
        si = _W()
        si.w(0, 9)  # main_data_begin
        si.w(0, 5)  # private (mono)
        si.w(0, 4)  # scfsi
        for _ in range(2):  # both granules identical
            si.w(0, 12)
            si.w(0, 9)
            si.w(210, 8)
            si.w(0, 4)
            si.w(1, 1)  # window_switching_flag
            si.w(bt, 2)
            si.w(mixed, 1)
            si.w(1, 5)
            si.w(1, 5)
            for _ in range(3):
                si.w(0, 3)
            si.w(0, 1)
            si.w(0, 1)
            si.w(0, 1)
        hdr = {"nch": 1, "mpeg1": True, "ngr": 2}
        return mp3._parse_side_info(mp3._Bits(_pack(si.bits)), hdr)

    for bt, mixed, want in [(2, 0, 8), (2, 1, 7), (1, 0, 7), (3, 0, 7)]:
        g = side_info_for(bt, mixed)["granules"][0][0]
        assert (g["region0_count"], g["region1_count"]) == (want, 20 - want)


@pytest.mark.parametrize("bt", [1, 3])
def test_lsf_window_switched_long_block_region_boundary(bt):
    """Hand-packed MPEG-2 22.05 kHz frame with a window-switched LONG
    block (start/stop): 27 big-value pairs span lines 0..53, all inside
    region0 because the boundary is band[8]=54 — NOT the 36 of the
    short-block case. table_select[1] is table 7, where the final
    '000' codeword (pair (1,1) under table 1) is no codeword at all:
    a decoder that flips to region1 at line 36 desyncs instead of
    producing the exact spectrum pinned here."""
    si = _W()
    si.w(0, 8)  # main_data_begin (LSF: 8 bits)
    si.w(0, 1)  # private (mono)
    si.w(31, 12)  # part2_3_length: 0 sf bits + 26 + 5 spectrum bits
    si.w(27, 9)  # big_values: lines 0..53
    si.w(210, 8)
    si.w(0, 9)  # scalefac_compress (LSF: 9 bits) -> all slens 0
    si.w(1, 1)  # window_switching_flag
    si.w(bt, 2)
    si.w(0, 1)  # mixed
    si.w(1, 5)  # table_select[0] = 1
    si.w(7, 5)  # table_select[1] = 7 (trap for a 36-line boundary)
    for _ in range(3):
        si.w(0, 3)
    si.w(0, 1)
    si.w(0, 1)
    side = _pack(si.bits)
    assert len(side) == 9
    m = _W()
    for _ in range(26):
        m.w(1, 1)  # 26 (0,0) pairs via table 1
    m.w(0, 3)  # '000' -> (1,1) under table 1
    m.w(0, 1)  # sign +
    m.w(1, 1)  # sign -
    hdr = bytes([0xFF, 0xF3, (8 << 4), 3 << 6])  # MPEG-2, 64k, 22.05k, mono
    flen = 72000 * 64 // 22050
    body = side + _pack(m.bits)
    frame = hdr + body + b"\x00" * (flen - 4 - len(body))
    fhdr, sinfo, main = next(iter(mp3.iter_frames(frame)))
    g0 = sinfo["granules"][0][0]
    assert g0["block_type"] == bt
    assert (g0["region0_count"], g0["region1_count"]) == (7, 13)
    assert mp3._region_boundaries(fhdr, g0) == (54, 576)
    bits = mp3._Bits(main)
    is_q = mp3._decode_spectrum(bits, fhdr, g0, 31)
    assert bits.pos == 31
    assert is_q[52] == 1 and is_q[53] == -1 and not is_q[:52].any()
    rate, nch, pcm = mp3.decode_mp3(frame)
    assert (rate, nch) == (22050, 1) and np.isfinite(pcm).all()


# --- r15: resync and torn-granule contracts (ADVICE r14, low) ------------------


def test_false_free_format_sync_resyncs():
    """A false sync whose bitrate index is 0 (0xFF 0xFB 0x0x) inside
    leading garbage must be skipped like any non-frame byte — the
    free-format boundary only fires when the stream itself is
    free-format (no frame ever parses)."""
    t = np.arange(1152 * 2) / 44100.0
    stream = mp3.encode_mp3(np.sin(2 * np.pi * 700 * t), 44100)
    n_clean = len(list(mp3.iter_frames(stream)))
    assert n_clean >= 2
    dirty = bytes([0xFF, 0xFB, 0x00, 0xC0]) + b"junk" + stream
    frames = list(mp3.iter_frames(dirty))
    assert len(frames) == n_clean
    rate, nch, pcm = mp3.decode_mp3(dirty)
    assert rate == 44100 and np.isfinite(pcm).all()


def test_free_format_stream_still_raises():
    """A stream that IS free-format (every sync candidate has bri==0)
    keeps the loud boundary."""
    payload = bytes([0xFF, 0xFB, 0x00, 0xC0]) + b"\x00" * 200
    with pytest.raises(NotImplementedError, match="free-format"):
        list(mp3.iter_frames(payload))


def test_torn_granule_raises_named_error():
    """part2_3_length promising more bits than reservoir+main provides
    must raise the named ValueError, not an anonymous IndexError."""
    with pytest.raises(ValueError, match="past end of main data"):
        mp3._Bits(b"\x00").read(16)
    si = _W()
    si.w(0, 9)
    si.w(0, 5)
    si.w(0, 4)
    _granule_si(si, 4000, 0)  # 4000-bit granule in a 187-byte frame
    _granule_si(si, 0, 0)
    side = _pack(si.bits)
    hdr = bytes([0xFF, 0xFB, (5 << 4), 3 << 6])
    flen = 144000 * 64 // 44100
    frame = hdr + side + b"\x00" * (flen - 4 - len(side))
    with pytest.raises(ValueError, match="part2_3 overruns"):
        mp3.decode_mp3(frame)
