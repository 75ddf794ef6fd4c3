"""Audio fingerprint + cross-container near-dup — functions/audiofp.py
(r12). The property under test: WAV, AIFF and FLAC decode to the SAME
PCM (all lossless), so fingerprints are container-free and the near-dup
join recovers a recording's re-encodes exactly; unrelated audio shares
no keys; the fixed-grid offset boundary is honest and pinned."""

from __future__ import annotations

import io
import wave

import numpy as np

from http_feeds_spark.functions import audiofp
from http_feeds_spark.functions import flac as fl
from http_feeds_spark.functions import multimodal as mm


def _wav(x, rate=8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(x).astype("<i2").tobytes())
    return buf.getvalue()


def _rich(seed=3, n=24000):
    """A fuller-than-sine spectrum: one strong partial per analysis
    band (frequencies drawn from the seed, so different seeds are
    different recordings) plus a noise floor, so per-band argmax peaks
    are stable."""
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    amps = (8000, 6000, 5000, 4000, 3000, 2500)
    # one partial per fingerprint band: bins [1,4) [4,16) ... [288,513)
    edges = (1, 4, 16, 48, 128, 288, 513)
    sig = 0.0
    for i, a in enumerate(amps):
        b = rng.randint(edges[i], edges[i + 1])
        sig = sig + a * np.sin(2 * np.pi * (b * 8000 / 1024) * t / 8000 + i)
    return (sig / (np.abs(sig).max() / 20000) + rng.randn(n) * 50).astype(np.int64)


def test_fingerprints_are_container_free():
    """The SAME master fingerprints identically from WAV, AIFF (both
    byte orders) and FLAC — the lossless-decode guarantee that makes
    cross-container dedup exact."""
    from tests.test_audio_meta import aiff_with_samples

    x = _rich()
    fp_wav = audiofp._fingerprint(audiofp._mono_samples(_wav(x)))
    assert len(fp_wav) >= 10
    for payload in (
        fl.encode_flac(x, 8000, subframe="fixed2"),
        fl.encode_flac(x, 8000, subframe="lpc", stereo="independent"),
        aiff_with_samples(8000, x),
        aiff_with_samples(8000, x, swapped=True),
    ):
        assert audiofp._fingerprint(audiofp._mono_samples(payload)) == fp_wav


def test_constellation_robustness_and_boundary():
    """Amplitude scaling keeps every key; light noise keeps most;
    unrelated audio shares none; an OFFSET copy loses the fixed chunk
    grid — the documented boundary, asserted so it stays honest."""
    x = _rich()
    base = set(audiofp._fingerprint(audiofp._mono_samples(_wav(x))))
    scaled = set(audiofp._fingerprint(audiofp._mono_samples(_wav((x * 0.9).astype(np.int64)))))
    assert scaled == base
    rng = np.random.RandomState(9)
    noised = set(audiofp._fingerprint(audiofp._mono_samples(
        _wav((x + rng.randn(len(x)) * 30).astype(np.int64)))))
    assert len(base & noised) / len(base) >= 0.7
    other = set(audiofp._fingerprint(audiofp._mono_samples(_wav(_rich(seed=77)))))
    assert not (base & other)
    # stationary tones are trivially offset-invariant (magnitudes
    # ignore phase) — the offset boundary bites on NONSTATIONARY
    # content, where a shift moves note transitions across the fixed
    # chunk grid; pin it with a melody
    rng2 = np.random.RandomState(11)
    t = np.arange(24000)
    notes = np.concatenate(
        [np.full(3000, 30 + 40 * (i % 5)) for i in range(8)]
    )
    melody = (15000 * np.sin(2 * np.pi * np.cumsum(notes * 8000 / 1024) / 8000)
              + rng2.randn(24000) * 40).astype(np.int64)
    mbase = set(audiofp._fingerprint(audiofp._mono_samples(_wav(melody))))
    mshift = set(audiofp._fingerprint(audiofp._mono_samples(_wav(melody[700:]))))
    assert len(mbase & mshift) / len(mbase) < 0.7  # the offset boundary


def test_near_dup_join_and_registered_query(spark, sf_dir):
    """audio_near_dup pairs the planted cross-container clones at
    similarity 1.0 through the banded equi-join (no all-pairs), skips
    undecodable payloads, and the registered q_mm_audio_dedup contract
    holds (5 planted pairs, deterministic)."""
    from http_feeds_spark.queries import registry

    x1, x2 = _rich(seed=1), _rich(seed=2)
    d = spark.createDataFrame(
        [
            (1, _wav(x1)),
            (2, fl.encode_flac(x1, 8000, subframe="fixed1")),  # clone of 1
            (3, _wav(x2)),
            (4, b"not audio"),
        ],
        "doc_id long, payload binary",
    )
    pairs = audiofp.audio_near_dup(d, min_match=0.8).collect()
    assert [(r.a, r.b, r.similarity) for r in pairs] == [(1, 2, 1.0)]

    fn = registry()["q_mm_audio_dedup"].fn
    rows = fn(spark, sf_dir).collect()
    # three planted tiers per master (r14): FLAC clone, MP3 re-encode,
    # and the FLAC<->MP3 cross-lossy pair — all at full matched fraction
    flac_pairs = [(r.a, r.b) for r in rows if r.a < 1_000_000 and 1_000_000 <= r.b < 2_000_000]
    mp3_pairs = [(r.a, r.b) for r in rows if r.a < 1_000_000 and r.b >= 2_000_000]
    cross = [(r.a, r.b) for r in rows if 1_000_000 <= r.a < 2_000_000 and r.b >= 2_000_000]
    assert len(flac_pairs) == 5 and all(b == a + 1_000_000 for a, b in flac_pairs)
    assert len(mp3_pairs) == 5 and all(b == a + 2_000_000 for a, b in mp3_pairs)
    assert len(cross) == 5 and all(b == a + 1_000_000 for a, b in cross)
    assert all(r.similarity == 1.0 for r in rows if r.b >= 1_000_000)
    assert rows == fn(spark, sf_dir).collect()


def test_plan_has_no_all_pairs_stage(spark):
    """The near-dup plan lints clean: candidates come from the
    (band, chunk, key) equi-join, never a cartesian."""
    from http_feeds_spark.plans.lint import lint

    x = _rich()
    d = spark.createDataFrame(
        [(1, _wav(x)), (2, _wav(_rich(seed=5)))], "doc_id long, payload binary"
    )
    assert lint(audiofp.audio_near_dup(d)) == []


def _melody(n=24000, seed=11):
    """Nonstationary content — the input class where the chunk tier's
    offset boundary bites (its own test above pins the divergence)."""
    rng = np.random.RandomState(seed)
    notes = np.concatenate([np.full(3000, 30 + 40 * (i % 5)) for i in range(8)])
    return (
        15000 * np.sin(2 * np.pi * np.cumsum(notes[:n] * 8000 / 1024) / 8000)
        + rng.randn(n) * 40
    ).astype(np.int64)


def test_anchor_tier_is_offset_invariant():
    """The r13 anchor tier pairs EXACTLY where the chunk tier's
    documented boundary asserts divergence: a shifted excerpt of a
    nonstationary melody shares (nearly) all its anchor keys with the
    master, while unrelated audio shares none and amplitude scaling
    changes nothing."""
    melody = _melody()
    base = set(audiofp._anchor_keys(audiofp._mono_samples(_wav(melody))))
    assert len(base) >= 10
    shift = set(audiofp._anchor_keys(audiofp._mono_samples(_wav(melody[700:]))))
    assert len(base & shift) / min(len(base), len(shift)) >= 0.9
    # the chunk tier diverges on the SAME input (the boundary this closes)
    cb = set(audiofp._fingerprint(audiofp._mono_samples(_wav(melody))))
    cs = set(audiofp._fingerprint(audiofp._mono_samples(_wav(melody[700:]))))
    assert len(cb & cs) / len(cb) < 0.7
    scaled = set(
        audiofp._anchor_keys(
            audiofp._mono_samples(_wav((melody * 0.9).astype(np.int64)))
        )
    )
    assert scaled == base
    other = set(audiofp._anchor_keys(audiofp._mono_samples(_wav(_rich(seed=77)))))
    assert not (base & other)


def test_anchor_near_dup_join(spark):
    """anchor_near_dup pairs a master with its shifted excerpt AND its
    FLAC re-encode through the (band, key) equi-join; unrelated audio
    and undecodable payloads stay unpaired; the plan lints clean."""
    from http_feeds_spark.plans.lint import lint

    melody = _melody()
    d = spark.createDataFrame(
        [
            (1, _wav(melody)),
            (2, _wav(melody[700:])),                          # shifted excerpt
            (3, fl.encode_flac(melody, 8000, subframe="fixed2")),  # re-encode
            (4, _wav(_rich(seed=77))),                        # unrelated
            (5, b"not audio"),
        ],
        "doc_id long, payload binary",
    )
    pairs = audiofp.anchor_near_dup(d, min_match=0.6)
    assert lint(pairs) == []
    got = {(r.a, r.b): r.similarity for r in pairs.collect()}
    assert got[(1, 3)] == 1.0          # container identity stays exact
    assert got[(1, 2)] >= 0.9          # the offset pair the chunk tier misses
    assert got[(2, 3)] >= 0.9
    assert not any(4 in p or 5 in p for p in got)


def test_registered_anchor_query_contract(spark, sf_dir):
    """q_mm_audio_anchor: each of the 3 masters pairs with BOTH its
    shifted excerpt and its FLAC re-encode (the full 3-pair clique per
    group), no cross-master pairs, deterministic."""
    from http_feeds_spark.queries import registry

    fn = registry()["q_mm_audio_anchor"].fn
    rows = fn(spark, sf_dir).collect()
    got = {(r.a, r.b): r.similarity for r in rows}
    for k in range(3):
        base = 100 + k * 10
        for a, b in ((base, base + 1), (base, base + 2), (base + 1, base + 2)):
            assert got[(a, b)] >= 0.85, f"missing/weak pair {(a, b)}"
    assert all(a // 10 == b // 10 for a, b in got), "cross-master pair"
    assert rows == fn(spark, sf_dir).collect()
