#!/usr/bin/env python
"""Platform-lifecycle cost curve (r15, r14 verdict item 3): the first
wall-clock data for the STORE LIFECYCLE — run_platform catch-up waves,
erasure purge, maintenance compaction — above the pytest fixtures.

The claim under test (SCALING.md's platform rows): a catch-up wave
costs O(batch + touched rows), NOT O(corpus). The experiment that
binds it is an A/B over store size: bootstrap one platform at 50K docs
and one at 500K docs (the r14 10× retrieval corpus, same deterministic
generator), then drive IDENTICAL incremental waves through the HTTP
feed connector against both and compare per-wave wall:

  - waves 1-3: +2,000 new documents each (landing + text-index fold +
    LSH dedup fold + monitor fold + erasure scan + epoch commit — the
    full run_platform composition, ann/pq/media off);
  - wave 4: 200 DELETE tombstones → erasure with physical purge across
    landing/text/dedup stores (the partition-local claim);
  - finally run_maintenance with the compaction threshold forced low —
    compaction is O(touched store bytes) BY DESIGN (it merges the
    batch prefix), so its wall is reported as context, not as a
    batch-tracking claim.

If fold cost tracked corpus size, the 500K waves would run ~10× the
50K waves; batch-tracking folds land near 1×. The one designed
exception is documented where it shows.

Protocol: bench.py's load gate + calib probe; waves are stateful so
each is timed once (no min-of-N) — the A/B ratio, not the absolute
second, is the finding. Bootstrap goes through the DIRECT fold APIs
(ti.ensure_text_index / sd.fold_batch) rather than 1.5 GB of JSON
through the in-process stub server: the HTTP transport is a test
double, not the engine, and the feed cursors live per-store so the
incremental waves still exercise the full connector path.

Prints one JSON line; the table lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

from bench import _calibrate, _load_gate, synth_text_docs  # noqa: E402

WAVE_DOCS = 2000
N_WAVES = 3
N_TOMBSTONES = 200
QUERY = ["window", "filter", "merge"]


def _drive_one(spark, n_docs: int, warehouse: str) -> dict:
    from tests import feed_server as fs

    from http_feeds_spark import ingest
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.streaming import dedup as sd

    root = f"{warehouse}/platform_tier_{n_docs}"
    if os.path.isdir(root):
        shutil.rmtree(root)  # lifecycle state is per-run; tiers rebuild below

    out: dict = {"n_docs": n_docs}

    # --- bootstrap: corpus into text + dedup stores via direct folds ----
    corpus_path = f"{warehouse}/bench_text/corpus_{n_docs}"
    docs = spark.read.parquet(corpus_path)
    t0 = time.perf_counter()
    ti.ensure_text_index(spark, docs, f"{root}/text_index")
    out["bootstrap_text_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    sd.fold_batch(spark, docs, f"{root}/dedup_index")
    out["bootstrap_dedup_s"] = round(time.perf_counter() - t0, 3)

    # --- incremental waves over the real HTTP connector -----------------
    fs.BATCH_SIZE = 2000  # transport throughput only; semantics unchanged
    state = fs.FeedState()
    srv, url = fs.serve(state)
    try:
        waves = []
        for w in range(N_WAVES):
            start = n_docs + w * WAVE_DOCS
            rows = synth_text_docs(spark, WAVE_DOCS, start=start).collect()
            for r in rows:
                state.append(
                    "org.example.document",
                    str(r.doc_id),
                    {"doc_id": r.doc_id, "text": r.text},
                )
            t0 = time.perf_counter()
            summary = ingest.run_platform(
                spark, url, root,
                ann_index=False, pq_index=False, media_index=False,
                compact_after=None,
            )
            waves.append(round(time.perf_counter() - t0, 3))
            assert summary["text_index"]["indexed_docs"] >= n_docs + (w + 1) * WAVE_DOCS
        out["wave_s"] = waves

        # --- wave 4: tombstones -> erasure with physical purge ----------
        for i in range(N_TOMBSTONES):
            state.append("org.example.document", str(1000 + i), None, method="DELETE")
        t0 = time.perf_counter()
        summary = ingest.run_platform(
            spark, url, root,
            ann_index=False, pq_index=False, media_index=False,
            compact_after=None,
        )
        out["purge_wave_s"] = round(time.perf_counter() - t0, 3)
        out["erase_ids"] = summary["erasure"]["erase_ids"]
    finally:
        srv.shutdown()

    # --- maintenance: forced compaction (O(store) by design) ------------
    t0 = time.perf_counter()
    maint = ingest.run_maintenance(spark, root, compact_after=2)
    out["maintenance_s"] = round(time.perf_counter() - t0, 3)
    out["maint"] = {
        k: v for k, v in maint.items() if isinstance(v, dict)
    }

    # --- post-lifecycle sanity: search healthy, purged ids gone ---------
    t0 = time.perf_counter()
    hits = ti.search(spark, f"{root}/text_index", QUERY, k=10).collect()
    out["search_s"] = round(time.perf_counter() - t0, 3)
    assert len(hits) == 10
    purged = {1000 + i for i in range(N_TOMBSTONES)}
    assert not ({r.doc_id for r in hits} & purged)
    return out


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_PLATFORM_DOCS", "50000,500000").split(",")
    ]
    gate = _load_gate()

    from bench import _ensure_bench_text_corpus
    from http_feeds_spark.session import get_spark

    spark = get_spark(app_name="http-feeds-spark-platform-curve")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    # local-fs view of the warehouse: Spark reports a file: URI, which
    # os.path/shutil would treat as a relative path that never exists
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    for n in sizes:
        _ensure_bench_text_corpus(spark, f"{wh}/bench_text/corpus_{n}", n, 450)

    calib = _calibrate(spark)
    tiers = [_drive_one(spark, n, wh) for n in sizes]

    result = {
        "metric": "platform_lifecycle_wall",
        "unit": "sec",
        "calib_s": calib,
        "load_gate": gate,
        "wave_docs": WAVE_DOCS,
        "tombstones": N_TOMBSTONES,
        "tiers": tiers,
    }
    if len(tiers) == 2 and tiers[0]["wave_s"] and tiers[1]["wave_s"]:
        a = sum(tiers[0]["wave_s"]) / len(tiers[0]["wave_s"])
        b = sum(tiers[1]["wave_s"]) / len(tiers[1]["wave_s"])
        result["wave_ratio_big_over_small"] = round(b / a, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
