#!/usr/bin/env python
"""Media-store fold cost curve (r15, r14 verdict item 6): the first
wall-clock data for the Arrow decode tiers — router triage, pixel
phash, audio constellation — at corpus scale (~50K binary payloads),
folded through the SAME streaming/media.fold_batch the platform runs.

What it measures and what would flag:

  - per-10K-payload fold wall, batch over batch: the decode tiers are
    per-payload Arrow passes, so the walls must stay FLAT as the store
    grows; growth across batches would mean the idempotence probe or
    the fingerprint writes secretly scale with the STORE (the bucket-
    pruned seen-probe claim, r14).
  - per-modality throughput context: payload mix is deterministic by
    doc_id (PNG / GIF / BMP / JPEG images, WAV / FLAC / MP3 audio —
    every decodable tier the router routes), so a quadratic decoder in
    any family moves its share of the wall.

Payloads are synthesized ON EXECUTORS (mapInPandas over a range —
seeded by doc_id, no driver-side 50K loop, no randomness source the
resume rules forbid). Protocol: bench.py's load gate + calib probe;
single pass per batch (folds are stateful). Prints one JSON line; the
table lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _calibrate, _load_gate  # noqa: E402

BATCH_PAYLOADS = 10_000
N_BATCHES = 5


def _wav_bytes(x, rate: int = 8000) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _ppm_bytes(img) -> bytes:
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _make_payload(doc_id: int) -> bytes:
    """Deterministic per-id payload cycling every decodable tier the
    router routes. Images are 24×24 seeded-noise RGB; audio is 2 s of
    a seeded sine at 8 kHz — small enough to synthesize 50K of, long
    enough that the constellation chunk tier emits real rows."""
    import numpy as np

    from http_feeds_spark.functions import jpeg as J
    from http_feeds_spark.functions import mp3 as M
    from http_feeds_spark.functions import multimodal as mm
    from http_feeds_spark.functions.flac import encode_flac

    rng = np.random.RandomState(doc_id % 2**31)
    kind = doc_id % 7
    if kind < 4:
        img = rng.randint(0, 256, (24, 24, 3)).astype("uint8")
        if kind == 0:
            return mm.encode_png(img)
        if kind == 1:
            return mm.encode_gif((img >> 6) << 6)  # 4^3 = 64 colors max
        if kind == 2:
            return _ppm_bytes(img)
        return J.encode_jpeg(img, quality=85)
    # 2.0 s @ 8 kHz: the constellation chunk tier needs >= FRAME +
    # 15*HOP = 8704 samples before it emits a single 16-frame chunk row
    n = 16000
    t = np.arange(n) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * (200 + (doc_id % 17) * 40) * t)
    if kind == 4:
        return _wav_bytes(x)
    if kind == 5:
        return encode_flac((x * 32767).astype("int16"), 8000)
    return M.encode_mp3(x, 8000)


def _payloads_df(spark, start: int, n: int):
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_make_payload(i) for i in ids]}
            )

    return (
        spark.range(start, start + n)
        .repartition(32)
        .mapInPandas(gen, schema="doc_id long, payload binary")
    )


def main() -> None:
    gate = _load_gate()

    from http_feeds_spark.session import get_spark
    from http_feeds_spark.streaming import media as smedia

    spark = get_spark(app_name="http-feeds-spark-media-curve")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    # local-fs view of the warehouse: Spark reports a file: URI, which
    # os.path/shutil would treat as a relative path that never exists
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    root = f"{wh}/media_curve_store"
    if os.path.isdir(root):
        shutil.rmtree(root)  # fold walls are per-run lifecycle state

    calib = _calibrate(spark)
    folds = []
    for b in range(N_BATCHES):
        docs = _payloads_df(spark, b * BATCH_PAYLOADS, BATCH_PAYLOADS)
        # materialize payload synthesis OFF the fold clock: the store
        # cost under test is triage+decode+write, not numpy encoding
        docs = docs.localCheckpoint()
        t0 = time.perf_counter()
        smedia.fold_batch(spark, docs, root)
        folds.append(round(time.perf_counter() - t0, 3))

    from pyspark.sql import functions as F

    meta = spark.read.parquet(f"{root}/meta")
    by_mod = {
        r["modality"]: r["n"]
        for r in meta.groupBy("modality").agg(F.count("*").alias("n")).collect()
    }
    phash_n = spark.read.parquet(f"{root}/phash").count()
    fp_n = spark.read.parquet(f"{root}/audiofp").count()
    assert phash_n > 0 and fp_n > 0, (phash_n, fp_n)

    print(
        json.dumps(
            {
                "metric": "media_fold_wall_per_10k",
                "unit": "sec",
                "calib_s": calib,
                "load_gate": gate,
                "batch_payloads": BATCH_PAYLOADS,
                "fold_s": folds,
                # batch 1 folds into an EMPTY store (no seen-probe reads,
                # first parquet writes) — a cheaper bootstrap by design, so
                # the store-growth flag compares steady-state batches only
                "flat_ratio_last_over_second": round(folds[-1] / folds[1], 3)
                if len(folds) > 1 and folds[1]
                else None,
                "meta_rows_by_modality": by_mod,
                "phash_rows": phash_n,
                "audiofp_rows": fp_n,
            }
        )
    )


if __name__ == "__main__":
    main()
