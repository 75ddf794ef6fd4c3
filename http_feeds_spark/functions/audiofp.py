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

Honest boundary (documented, like every tier here): peak-bin
constellations survive amplitude scaling and mild noise, and
locally-stationary content is even offset-tolerant (magnitudes ignore
phase) — but for NONSTATIONARY audio a shifted excerpt moves note
transitions across the fixed chunk grid and the keys diverge, so this
is a same-master/re-encoded/re-containered dedup tier, not a
shifted-excerpt search. Offset invariance needs anchor-pair hashing,
a natural later tier on the same surface.
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
    raise ValueError("no native PCM decoder for this container")


def _fingerprint(x) -> list[tuple[int, int, int]]:
    """(band, chunk, key) rows for one mono signal."""
    import hashlib

    import numpy as np

    n_frames = (len(x) - FRAME) // HOP + 1
    if n_frames < CHUNK:
        return []
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = np.asarray(x)[idx] * np.hanning(FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    # 6 log-ish bands over the useful spectrum (skip DC)
    edges = [1, 4, 16, 48, 128, 288, 513]
    peaks = np.empty((n_frames, N_BANDS), dtype=np.int64)
    for b in range(N_BANDS):
        lo, hi = edges[b], edges[b + 1]
        peaks[:, b] = lo + mag[:, lo:hi].argmax(axis=1)
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
    fp: DataFrame, *, min_match: float = 0.8
) -> DataFrame:
    """The pairing half of :func:`audio_near_dup`, taking an already-
    computed (doc_id, band, chunk, key) fingerprint frame — so a
    PERSISTED fingerprint store (streaming/media.py) pairs without
    re-decoding any payload. Same plan shape: banded equi-join, one
    aggregate per pair, broadcast-sized per-doc denominators."""
    counts = fp.groupBy("doc_id").agg(F.count("*").alias("n_keys"))
    a = fp.select(
        F.col("doc_id").alias("a"), "band", "chunk", "key"
    )
    b = fp.select(
        F.col("doc_id").alias("b"), "band", "chunk", "key"
    )
    matched = (
        a.join(b, ["band", "chunk", "key"])
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
