"""Audio fingerprinting + cross-container near-dup (r12).

The audio sibling of the image perceptual-hash tier, made possible by
this round's native decoders: WAV, AIFF and FLAC payloads decode to
the SAME float PCM (functions/multimodal.decode_wav / decode_aiff,
functions/flac.decode_flac — all lossless), so one content fingerprint
dedupes a recording ACROSS containers and encodings — the dominant
audio-dup mode in mixed crawls, where the identical master ships as
both .wav and .flac.

Method (the classic constellation shape, kept deterministic and
engine-friendly): frame the mono signal (1024 samples, hop 512), take
the rfft magnitude per frame, record the PEAK BIN per log-ish
frequency band (6 bands), and hash runs of 16 consecutive per-band
peaks into 64-bit band-chunk keys. Two payloads of the same recording
produce identical keys in every band and chunk; near-dup candidates
come from an ids-only equi-join on (band, chunk, key) — the exact
banded-join discipline of the MinHash/simhash/phash tiers, no
all-pairs stage anywhere — verified by the matched-key fraction.

Two tiers on the same banded surface:

- **chunk tier** (:func:`audio_near_dup`, r12): per-band peak RUNS
  hashed on a fixed 16-frame chunk grid — exact, selective, the
  same-master/re-encoded/re-containered dedup tier. Honest boundary:
  for NONSTATIONARY audio a shifted excerpt moves note transitions
  across the fixed grid and the keys diverge (pinned in tests).
- **anchor tier** (:func:`anchor_near_dup`, r13 — closing that
  boundary): prominent peaks pair with peaks a few frames ahead,
  keyed by (band, f1, f2, Δt) only — the published constellation-map
  shape. No absolute time enters the key, so a shifted excerpt pairs
  with its master; a prominence gate keeps noise-flat bands from
  emitting unstable junk anchors. Same ids-only banded equi-join,
  looser default verify threshold. ITS honest boundary: dropping
  absolute time makes the match a constellation-SET similarity, so
  two recordings playing the same sustained notes in different order
  share their within-note (f, f, Δt) keys and can pair — offset
  search and content distinctness trade off; run both tiers when both
  matter (the chunk tier separates exactly that case).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME = 1024
HOP = 512
N_BANDS = 6
CHUNK = 16  # frames per hash key

FINGERPRINT_SCHEMA = "doc_id long, band int, chunk int, key long"


def _mono_samples(payload: bytes):
    """Dispatch to the native decoders, all returning float mono on the
    same scale — the property that makes fingerprints container-free."""
    from http_feeds_spark.functions import multimodal as mm

    if payload[:4] == b"RIFF":
        _, _, x = mm.decode_wav(payload)
        return x
    if payload[:4] == b"FORM":
        _, _, x = mm.decode_aiff(payload)
        return x
    if payload[:4] == b"fLaC":
        from http_feeds_spark.functions.flac import decode_flac

        pcm, _ = decode_flac(payload)
        return pcm.mean(axis=1) / 32768.0
    if payload[:3] == b"ID3" or (
        len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        # r14: MP3 Layer III (functions/mp3.py — validated-table and
        # synthesis-window boundaries documented there)
        from http_feeds_spark.functions.mp3 import decode_mp3

        _, _, x = decode_mp3(payload)
        return x
    raise ValueError("no native PCM decoder for this container")


def _band_peaks(x, min_frames: int):
    """Per-frame per-band spectral peak bins for one mono signal —
    the shared front half of both fingerprint tiers. Returns
    (peaks, prominence): two (n_frames, N_BANDS) arrays — the peak bin
    and its PROMINENCE (peak magnitude over the band's mean magnitude
    that frame; ~1 for noise-flat bands, large for a real partial) —
    or None when the signal is shorter than ``min_frames`` frames. The
    chunk tier ignores prominence (its keys are pinned); the anchor
    tier gates on it so noise-flat bands emit no junk anchors."""
    import numpy as np

    n_frames = (len(x) - FRAME) // HOP + 1
    if n_frames < min_frames:
        return None
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = np.asarray(x)[idx] * np.hanning(FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    # 6 log-ish bands over the useful spectrum (skip DC)
    edges = [1, 4, 16, 48, 128, 288, 513]
    peaks = np.empty((n_frames, N_BANDS), dtype=np.int64)
    prom = np.empty((n_frames, N_BANDS))
    for b in range(N_BANDS):
        lo, hi = edges[b], edges[b + 1]
        sub = mag[:, lo:hi]
        peaks[:, b] = lo + sub.argmax(axis=1)
        prom[:, b] = sub.max(axis=1) / (sub.mean(axis=1) + 1e-9)
    return peaks, prom


def _fingerprint(x) -> list[tuple[int, int, int]]:
    """(band, chunk, key) rows for one mono signal."""
    import hashlib

    got = _band_peaks(x, CHUNK)
    if got is None:
        return []
    peaks, _ = got
    n_frames = peaks.shape[0]
    out = []
    for b in range(N_BANDS):
        for c in range(n_frames // CHUNK):
            run = peaks[c * CHUNK : (c + 1) * CHUNK, b].tobytes()
            h = hashlib.blake2b(run, digest_size=8).digest()
            key = int.from_bytes(h, "big", signed=True)
            out.append((b, c, key))
    return out


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """(doc_id, band, chunk, key) rows per decodable payload — the
    ids-only fingerprint table every downstream join runs on (vectors
    and samples never leave the Arrow worker). Undecodable payloads
    contribute no rows (skip-don't-crash). Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {"doc_id": [], "band": [], "chunk": [], "key": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows = _fingerprint(_mono_samples(bytes(payload)))
                except Exception:
                    continue
                for b, c, k in rows:
                    out["doc_id"].append(doc_id)
                    out["band"].append(b)
                    out["chunk"].append(c)
                    out["key"].append(k)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=FINGERPRINT_SCHEMA
    )


ANCHOR_DTS = (1, 2, 4, 8)
ANCHOR_PROMINENCE = 6.0
ANCHOR_SCHEMA = "doc_id long, band int, key long"


def _anchor_keys(x) -> list[tuple[int, int]]:
    """Distinct (band, key) anchor-pair rows for one mono signal — the
    OFFSET-INVARIANT tier (r13, closing the r12 documented boundary):
    each PROMINENT per-band peak (the anchor) pairs with the prominent
    peak ``dt`` frames ahead for dt in ANCHOR_DTS, keyed by
    (band, f1, f2, dt) ONLY — the published constellation-map shape. No
    absolute frame or chunk index enters the key, so a time-shifted
    excerpt reproduces the keys of the region it shares with the master
    (frames straddling a shifted transition differ; everything else
    matches), where the fixed chunk grid of :func:`_fingerprint`
    diverges. The prominence gate (peak ≥ ANCHOR_PROMINENCE × the
    band's mean magnitude that frame) keeps noise-flat bands — whose
    argmax is an unstable random bin — from emitting junk anchors that
    can never match. Keys are de-duplicated per doc: matching counts
    distinct constellation events."""
    import hashlib

    got = _band_peaks(x, max(ANCHOR_DTS) + 1)
    if got is None:
        return []
    peaks, prom = got
    n_frames = peaks.shape[0]
    out = set()
    for b in range(N_BANDS):
        col = peaks[:, b]
        strong = prom[:, b] >= ANCHOR_PROMINENCE
        for dt in ANCHOR_DTS:
            for t in range(n_frames - dt):
                if strong[t] and strong[t + dt]:
                    h = hashlib.blake2b(
                        b"%d:%d:%d:%d" % (b, col[t], col[t + dt], dt),
                        digest_size=8,
                    ).digest()
                    out.add((b, int.from_bytes(h, "big", signed=True)))
    return sorted(out)


def audio_anchor_fingerprint(df: DataFrame) -> DataFrame:
    """(doc_id, band, key) anchor-pair rows per decodable payload — the
    offset-invariant sibling of :func:`audio_fingerprint`, same ids-only
    posture (samples never leave the Arrow worker), same skip-don't-
    crash contract. Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {"doc_id": [], "band": [], "key": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows = _anchor_keys(_mono_samples(bytes(payload)))
                except Exception:
                    continue
                for b, k in rows:
                    out["doc_id"].append(doc_id)
                    out["band"].append(b)
                    out["key"].append(k)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=ANCHOR_SCHEMA)


def anchor_near_dup(df: DataFrame, *, min_match: float = 0.6) -> DataFrame:
    """Offset-invariant audio near-dup: the banded pairing discipline of
    :func:`audio_near_dup` over anchor-pair keys — candidates from an
    ids-only equi-join on (band, key), verified by the matched fraction
    of the smaller side's DISTINCT keys. A shifted excerpt of a master
    pairs here (the keys carry no absolute time) where the chunk-grid
    tier's documented boundary asserts divergence; the default
    ``min_match`` is looser than the chunk tier's because transition-
    straddling frames legitimately differ under arbitrary offsets."""
    return near_dup_from_fingerprints(
        audio_anchor_fingerprint(df), min_match=min_match, key_cols=("band", "key")
    )


def audio_near_dup(df: DataFrame, *, min_match: float = 0.8) -> DataFrame:
    """(a, b, matched, total, similarity) pairs whose fingerprints
    agree on at least ``min_match`` of the smaller side's keys.

    Plan shape (the banded-dedup discipline, lint-clean): candidates
    from an ids-only self-equi-join on (band, chunk, key) — identical
    recordings collide on EVERY key, so the join is selective — then
    one aggregate per pair and a broadcast-sized per-doc key count for
    the denominator. No all-pairs stage, no payloads past the
    fingerprint pass."""
    return near_dup_from_fingerprints(audio_fingerprint(df), min_match=min_match)


def near_dup_from_fingerprints(
    fp: DataFrame,
    *,
    min_match: float = 0.8,
    key_cols: tuple[str, ...] = ("band", "chunk", "key"),
) -> DataFrame:
    """The pairing half of :func:`audio_near_dup`, taking an already-
    computed fingerprint frame (doc_id + ``key_cols``) — so a PERSISTED
    fingerprint store (streaming/media.py) pairs without re-decoding
    any payload, and the anchor tier (:func:`anchor_near_dup`) reuses
    the identical plan on its (band, key) rows. Same plan shape: banded
    equi-join, one aggregate per pair, broadcast-sized per-doc
    denominators."""
    keys = list(key_cols)
    counts = fp.groupBy("doc_id").agg(F.count("*").alias("n_keys"))
    a = fp.select(F.col("doc_id").alias("a"), *keys)
    b = fp.select(F.col("doc_id").alias("b"), *keys)
    matched = (
        a.join(b, keys)
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("matched"))
    )
    na = counts.select(F.col("doc_id").alias("a"), F.col("n_keys").alias("keys_a"))
    nb = counts.select(F.col("doc_id").alias("b"), F.col("n_keys").alias("keys_b"))
    return (
        matched.join(na, "a")
        .join(nb, "b")
        .withColumn("total", F.least("keys_a", "keys_b"))
        .withColumn(
            "similarity", (F.col("matched") / F.col("total")).cast("double")
        )
        .where(F.col("similarity") >= min_match)
        .select("a", "b", "matched", "total", F.round("similarity", 6).alias("similarity"))
    )
