"""Platform epochs (http_feeds_spark/epochs.py): cross-store consistent
reads without a cross-component transaction. The pinned-reader contract:
a reader pinned to epoch N sees EVERY store exactly as wave N left it,
while wave N+1 lands concurrently; pins outside a retention window
raise with a remedy, never silently serve newer data."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from http_feeds_spark import epochs, ingest
from http_feeds_spark.operators import text_index as ti
from http_feeds_spark.streaming import dedup as sd
from http_feeds_spark.streaming import monitor as mon


def _wave(spark, ids, tag):
    return spark.createDataFrame(
        [(i, f"window filter merge body{i} {tag} tail{i}") for i in ids],
        "doc_id long, text string",
    )


def _land_batch(spark, root: str, seconds: float = 2.0) -> None:
    import os

    before = 0
    meta = f"{root}/landing/raw/_spark_metadata"
    if os.path.isdir(meta):
        before = sum(1 for f in os.listdir(meta) if not f.startswith("."))
    for _ in range(4):  # retry: a cold JVM can eat the whole first window
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "20")
            .load()
            .writeStream.format("parquet")
            .option("path", f"{root}/landing/raw")
            .option("checkpointLocation", f"{root}/landing/_checkpoint")
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        time.sleep(seconds)
        q.stop()
        q.awaitTermination(30)
        now = sum(1 for f in os.listdir(meta) if not f.startswith(".")) if os.path.isdir(meta) else 0
        if now > before:
            return
    raise AssertionError("sink committed no new entries in 4 attempts")


def test_pinned_reader_sees_wave_n_while_wave_n1_lands(spark, tmp_path):
    root = str(tmp_path / "platform")

    # --- wave N across all four stores
    docs_n = _wave(spark, [1, 2, 3], "waveN")
    ti.build_text_index(spark, docs_n, f"{root}/text_index")
    mon.fold_batch(spark, docs_n, f"{root}/monitor", batch_id=0)
    sd.fold_batch(spark, docs_n, f"{root}/dedup_index")
    _land_batch(spark, root)
    rec = epochs.record_epoch(spark, root)
    n = rec["epoch"]

    pinned = epochs.pin(spark, root, n)
    want_search = [
        (r.doc_id, r.score) for r in pinned.text_search(["window", "body2"]).collect()
    ]
    want_stats = sorted(
        (r.batch, r.n_docs) for r in pinned.monitor_stats().collect()
    )
    want_asg = sorted(
        (r.node, r.component) for r in pinned.dedup_assignment().collect()
    )
    want_landing = sorted(r.value for r in pinned.landing().select("value").collect())

    # --- wave N+1 lands in every store
    docs_n1 = _wave(spark, [4, 5], "waveN1")
    ti.upsert_documents(spark, docs_n1, f"{root}/text_index")
    mon.fold_batch(spark, docs_n1, f"{root}/monitor", batch_id=1)
    sd.fold_batch(spark, docs_n1, f"{root}/dedup_index")
    _land_batch(spark, root)
    rec2 = epochs.record_epoch(spark, root)
    assert rec2["epoch"] == n + 1

    # live reads see wave N+1 ...
    live_hits = {
        r.doc_id for r in ti.search(spark, f"{root}/text_index", ["window"], k=10).collect()
    }
    assert live_hits == {1, 2, 3, 4, 5}
    assert len(mon.visible_units(spark, f"{root}/monitor")) == 2

    # ... while the SAME pinned reader still answers with wave N exactly
    assert [
        (r.doc_id, r.score) for r in pinned.text_search(["window", "body2"]).collect()
    ] == want_search
    assert {r.doc_id for r in pinned.text_search(["window"], k=10).collect()} == {1, 2, 3}
    assert sorted((r.batch, r.n_docs) for r in pinned.monitor_stats().collect()) == want_stats
    assert sorted((r.node, r.component) for r in pinned.dedup_assignment().collect()) == want_asg
    assert sorted(r.value for r in pinned.landing().select("value").collect()) == want_landing

    # a fresh pin with no explicit number takes the newest epoch
    latest = epochs.pin(spark, root)
    assert latest.epoch == n + 1
    assert {r.doc_id for r in latest.text_search(["window"], k=10).collect()} == {1, 2, 3, 4, 5}


def test_epoch_retention_and_out_of_window_pins_raise(spark, tmp_path):
    root = str(tmp_path / "platform")
    docs = _wave(spark, [1], "w")
    ti.build_text_index(spark, docs, f"{root}/text_index")
    for i in range(5):
        epochs.record_epoch(spark, root, keep_epochs=3)
    have = epochs.list_epochs(spark, root)
    assert have == [2, 3, 4]  # epochs 0-1 aged out
    with pytest.raises(ValueError, match="retention window"):
        epochs.pin(spark, root, 0)
    with pytest.raises(FileNotFoundError, match="no committed epochs"):
        epochs.pin(spark, str(tmp_path / "elsewhere"))


def test_pin_survives_exactly_one_dedup_wave(spark, tmp_path):
    """ASSIGNMENT_KEEP_EPOCHS=2: a pin from the previous wave reads,
    one from two waves back raises with the remedy."""
    root = str(tmp_path / "platform")
    sd.fold_batch(spark, _wave(spark, [1, 2], "a"), f"{root}/dedup_index")
    rec0 = epochs.record_epoch(spark, root)
    sd.fold_batch(spark, _wave(spark, [3], "b"), f"{root}/dedup_index")
    rec1 = epochs.record_epoch(spark, root)
    p0 = epochs.pin(spark, root, rec0["epoch"])
    assert {r.node for r in p0.dedup_assignment().collect()} <= {1, 2}
    sd.fold_batch(spark, _wave(spark, [4], "c"), f"{root}/dedup_index")
    with pytest.raises(ValueError, match="retention window"):
        p0.dedup_assignment()
    p1 = epochs.pin(spark, root, rec1["epoch"])
    assert {r.node for r in p1.dedup_assignment().collect()} <= {1, 2, 3}


def test_pinned_text_read_refuses_compacted_away_batches(spark, tmp_path):
    """Maintenance compaction merges + vacuums the pinned batch dirs:
    the pinned read must raise (fail-stop), never silently answer from
    the merged store."""
    root = str(tmp_path / "platform")
    ti_root = f"{root}/text_index"
    for w in range(6):
        docs = _wave(spark, [w], f"wave{w}")
        if not ti.ensure_text_index(spark, docs, ti_root):
            ti.upsert_documents(spark, docs, ti_root)
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])
    assert pinned.text_search(["window"], k=10).count() == 6
    ingest.run_maintenance(
        spark, root, monitor=False, dedup_index=False, landing=False, compact_after=2
    )
    with pytest.raises(ValueError, match="pin a newer epoch"):
        pinned.text_search(["window"]).collect()
    # the post-maintenance epoch pins the merged frontier and reads fine
    rec2 = epochs.record_epoch(spark, root)
    p2 = epochs.pin(spark, root, rec2["epoch"])
    assert p2.text_search(["window"], k=10).count() == 6


def test_empty_frontier_components_raise_cleanly(spark, tmp_path):
    root = str(tmp_path / "platform")
    ti.build_text_index(spark, _wave(spark, [1], "w"), f"{root}/text_index")
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])
    assert pinned.text_search(["window"]).count() == 1
    with pytest.raises(FileNotFoundError):
        pinned.monitor_stats()
    with pytest.raises(FileNotFoundError):
        pinned.dedup_assignment()
    with pytest.raises(FileNotFoundError):
        pinned.landing()


def test_pinned_landing_fails_stop_after_file_compaction(spark, tmp_path):
    """A landing FILE compaction rewrites the compaction entry the pin's
    batch-id would resolve to, listing rows from newer waves too — so
    the pin records the exact file list and a read through it must fail
    stop after maintenance, never silently serve the newer rows."""
    root = str(tmp_path / "platform")
    _land_batch(spark, root)
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])
    want = sorted(r.value for r in pinned.landing().select("value").collect())
    assert want  # the pin serves wave N exactly

    _land_batch(spark, root)  # wave N+1
    # still exact while the files live
    assert sorted(r.value for r in pinned.landing().select("value").collect()) == want

    out = ingest.compact_landing_files(
        spark, f"{root}/landing", max_files=0, target_files=1
    )
    assert out["files_before"] > 0  # the surgery genuinely ran
    with pytest.raises(ValueError, match="pin a newer epoch"):
        pinned.landing().collect()
    # a fresh epoch pins the rewritten frontier and reads everything
    rec2 = epochs.record_epoch(spark, root)
    p2 = epochs.pin(spark, root, rec2["epoch"])
    got = sorted(r.value for r in p2.landing().select("value").collect())
    assert got[: len(want)] == want and len(got) > len(want)
