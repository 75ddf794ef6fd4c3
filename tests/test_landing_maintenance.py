"""Landing-zone file maintenance (ingest.compact_landing_files): the raw
landing zone is a STREAMING parquet sink, so its small-file compaction
must rewrite through the sink's ``_spark_metadata`` commit log — an
in-place rewrite that ignored the log would either hide the history from
every log-aware read or be hidden itself by the sink's next entry.

Pinned here: bounded file counts with BIT-IDENTICAL rows through the
log-aware reader, both log layouts (before and after the sink's first
compaction boundary), the sink continuing to append and running its OWN
compaction on top of the rewritten entry, crash convergence from the
committed manifest, and the orphan sweep."""

from __future__ import annotations

import os
import time

import pytest

from http_feeds_spark import ingest


def _stream_batches(spark, root: str, seconds: float) -> None:
    """Append a few rate-source micro-batches to <root>/raw with the
    sink's commit log, the same layout ingest.run produces."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "40")
        .load()
        .writeStream.format("parquet")
        .option("path", f"{root}/raw")
        .option("checkpointLocation", f"{root}/_checkpoint")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    time.sleep(seconds)
    q.stop()
    q.awaitTermination(30)


def _values(spark, root: str) -> list[int]:
    return sorted(
        r.value for r in spark.read.parquet(f"{root}/raw").select("value").collect()
    )


def _data_files(root: str) -> list[str]:
    return [f for f in os.listdir(f"{root}/raw") if f.endswith(".parquet")]


def _log_entries(root: str) -> list[str]:
    meta = f"{root}/raw/_spark_metadata"
    return sorted(f for f in os.listdir(meta) if not f.startswith("."))


def test_bounded_bit_identical_and_sink_continues(spark, tmp_path):
    root = str(tmp_path / "landing")
    # enough batches to cross the sink's first compaction boundary (10)
    for _ in range(12):
        _stream_batches(spark, root, 5)
        if any(e.endswith(".compact") for e in _log_entries(root)):
            break
    assert any(e.endswith(".compact") for e in _log_entries(root))
    before = _values(spark, root)
    assert len(_data_files(root)) > 4

    out = ingest.compact_landing_files(spark, root, max_files=4, target_files=2)
    assert out["files_after"] <= 2 < out["files_before"]
    assert _values(spark, root) == before  # bit-identical via the log
    assert out["rows"] == len(before)
    # old files physically gone; no stage left behind
    assert len(_data_files(root)) == out["files_after"]
    assert not os.path.exists(f"{root}/raw__maint_stage")

    # the sink keeps appending with preserved numbering, and its OWN next
    # compaction must build on the rewritten entry without losing rows
    prev_max = max(
        int(e[:-8] if e.endswith(".compact") else e) for e in _log_entries(root)
    )
    compacts = {e for e in _log_entries(root) if e.endswith(".compact")}
    for _ in range(12):
        _stream_batches(spark, root, 5)
        new_compacts = {e for e in _log_entries(root) if e.endswith(".compact")}
        if new_compacts - compacts:
            break
    assert {e for e in _log_entries(root) if e.endswith(".compact")} - compacts, (
        "sink never crossed its next compaction boundary"
    )
    after = _values(spark, root)
    assert after[: len(before)] == before  # prefix preserved
    assert len(after) > len(before)
    new_max = max(
        int(e[:-8] if e.endswith(".compact") else e) for e in _log_entries(root)
    )
    assert new_max > prev_max


def test_rewrite_before_first_compaction_boundary(spark, tmp_path):
    """A young sink (no .compact yet) lists its view from entry 0 + the
    deltas; the rewrite targets entry 0 and empties the rest."""
    root = str(tmp_path / "landing")
    _stream_batches(spark, root, 2.5)
    entries = _log_entries(root)
    assert entries and not any(e.endswith(".compact") for e in entries)
    before = _values(spark, root)
    out = ingest.compact_landing_files(spark, root, max_files=0, target_files=1)
    assert out["files_after"] <= 1
    assert _values(spark, root) == before
    # entry names unchanged (numbering preserved), later entries emptied
    assert _log_entries(root) == entries


def test_noop_below_threshold_and_absent_landing(spark, tmp_path):
    root = str(tmp_path / "landing")
    out = ingest.compact_landing_files(spark, root)
    assert out == {"files_before": 0, "files_after": 0, "rows": 0}
    _stream_batches(spark, root, 2)
    files = len(_data_files(root))
    before = _values(spark, root)
    out = ingest.compact_landing_files(spark, root, max_files=10_000)
    assert out["files_before"] == out["files_after"]
    assert _values(spark, root) == before
    assert len(_data_files(root)) == files  # untouched


def test_crash_after_manifest_converges_on_next_call(spark, tmp_path, monkeypatch):
    """Kill the rewrite right after its manifest commits (before any log
    entry is rewritten): the next call must resume from the manifest and
    land the exact same final state."""
    root = str(tmp_path / "landing")
    _stream_batches(spark, root, 3)
    before = _values(spark, root)

    real = ingest._write_sink_log_entry
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("injected crash before the log rewrite")

    monkeypatch.setattr(ingest, "_write_sink_log_entry", dying)
    with pytest.raises(RuntimeError, match="injected"):
        ingest.compact_landing_files(spark, root, max_files=0, target_files=1)
    assert calls["n"] == 1
    assert os.path.exists(f"{root}/raw__maint_stage/manifest")
    # the log is untouched, so the view still serves the OLD files
    assert _values(spark, root) == before

    monkeypatch.setattr(ingest, "_write_sink_log_entry", real)
    out = ingest.compact_landing_files(spark, root, max_files=10_000)
    # resume applied the manifest even though the threshold now says no-op
    assert _values(spark, root) == before
    assert not os.path.exists(f"{root}/raw__maint_stage")
    assert len(_data_files(root)) == 1


def test_orphan_maint_files_swept_before_fresh_attempt(spark, tmp_path):
    """maint-* files the log does not reference (an attempt that died
    before its manifest committed) are deleted, never resurrected."""
    root = str(tmp_path / "landing")
    _stream_batches(spark, root, 2.5)
    before = _values(spark, root)
    orphan = f"{root}/raw/maint-999999-00000.parquet"
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    out = ingest.compact_landing_files(spark, root, max_files=0, target_files=1)
    assert not os.path.exists(orphan)
    assert _values(spark, root) == before
    assert out["rows"] == len(before)


def test_run_maintenance_includes_landing(spark, tmp_path):
    platform = str(tmp_path / "platform")
    _stream_batches(spark, f"{platform}/landing", 3)
    before = _values(spark, f"{platform}/landing")
    out = ingest.run_maintenance(
        spark,
        platform,
        text_index=False,
        monitor=False,
        dedup_index=False,
        landing=True,
        landing_max_files=1,
    )
    assert out["landing"]["files_after"] <= 4 < out["landing"]["files_before"]
    assert _values(spark, f"{platform}/landing") == before
