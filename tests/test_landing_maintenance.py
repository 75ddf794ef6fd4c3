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


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
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


# --- retention: age raw history out wholesale (r9) --------------------------


def test_retire_landing_history_end_to_end(spark, tmp_path):
    """The spec's landing retention story (README:184) end to end over
    the REAL connector: retire raw below a seq horizon, the read model
    stays bit-identical (retired-but-live subjects served from the
    compacted copy), a tombstoned subject's content physically leaves
    the zone, the sink keeps appending over the rewritten log, and a
    later compact_now still covers the FULL history."""
    from pyspark.sql import functions as F

    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        for i in range(6):
            state.append("org.example.doc", str(i), {"doc_id": i, "v": 1})
        state.append("org.example.doc", "1", {"doc_id": 1, "v": 2})  # update
        state.append("org.example.doc", "2", None, method="DELETE")  # tombstone
        root = str(tmp_path / "landing")
        ingest.run(spark, url, root)

        def model():
            return sorted(
                (r.subject, r.seq)
                for r in ingest.read_model(spark, root).select("subject", "seq").collect()
            )

        before = model()
        assert [s for s, _ in before] == ["0", "1", "3", "4", "5"]
        raw_seqs = sorted(
            r.seq for r in spark.read.parquet(f"{root}/raw").select("seq").collect()
        )
        assert len(raw_seqs) == 8

        horizon = raw_seqs[-1]  # retire EVERYTHING ingested so far
        out = ingest.retire_landing_history(spark, root, horizon_seq=horizon)
        assert out["horizon_seq"] == horizon
        assert out["rows"] == 0  # raw holds only the (empty) tail
        assert ingest.retention_horizon(spark, root) == horizon
        # the read model is bit-identical: served from the compacted copy
        assert model() == before
        # the tombstoned subject's content is physically GONE everywhere
        for path in (f"{root}/compacted",):
            assert (
                spark.read.parquet(path).where(F.col("subject") == "2").count() == 0
            )

        # the sink keeps appending over the rewritten log
        state.append("org.example.doc", "6", {"doc_id": 6, "v": 1})
        state.append("org.example.doc", "0", None, method="DELETE")
        ingest.run(spark, url, root)
        after = model()
        assert [s for s, _ in after] == ["1", "3", "4", "5", "6"]
        # retired subjects (1, 3..5) still answer — compacted serves them
        assert dict(before)["1"] == dict(after)["1"]

        # a later full compaction covers retired history (the _full_feed
        # union — without it this rewrite would drop subjects 1, 3..5,
        # whose rows now live only in the compacted copy); "0" and "2"
        # are tombstoned and dropped, completing their physical deletion
        compacted = ingest.compact_now(spark, root)
        assert sorted(r.subject for r in compacted.collect()) == ["1", "3", "4", "5", "6"]
    finally:
        srv.shutdown()


def test_retire_monotonic_and_rerun_converges(spark, tmp_path):
    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        for i in range(10):
            state.append("org.example.doc", str(i % 3), {"doc_id": i})
        root = str(tmp_path / "landing")
        ingest.run(spark, url, root)
        seqs = sorted(r.seq for r in spark.read.parquet(f"{root}/raw").collect())
        before = sorted(
            (r.subject, r.seq)
            for r in ingest.read_model(spark, root).select("subject", "seq").collect()
        )
        mid = seqs[4]
        ingest.retire_landing_history(spark, root, horizon_seq=mid)
        kept = sorted(r.seq for r in spark.read.parquet(f"{root}/raw").collect())
        assert kept == [s for s in seqs if s > mid]
        # a LOWER horizon cannot roll retirement back (monotonic max)
        ingest.retire_landing_history(spark, root, horizon_seq=seqs[0])
        assert ingest.retention_horizon(spark, root) == mid
        # re-running at the same horizon is a no-op that stays correct
        ingest.retire_landing_history(spark, root, horizon_seq=mid)
        after = sorted(
            (r.subject, r.seq)
            for r in ingest.read_model(spark, root).select("subject", "seq").collect()
        )
        assert after == before
    finally:
        srv.shutdown()


def _stream_feed_rows(
    spark, root: str, seq_expr: str, subject_expr: str, min_rows: int = 4
) -> None:
    """Append feed-shaped rate-source rows to <root>/raw through the
    sink (the log-visible path); the checkpoint resumes, so consecutive
    calls with different projections extend one raw zone."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "40")
        .load()
        .selectExpr(
            f"CAST({seq_expr} AS BIGINT) AS seq",
            "CAST(value AS STRING) AS id",
            f"{subject_expr} AS subject",
            "'PUT' AS method",
            "timestamp AS time",
        )
        .writeStream.format("parquet")
        .option("path", f"{root}/raw")
        .option("checkpointLocation", f"{root}/_checkpoint")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    deadline = time.time() + 30
    while time.time() < deadline:
        time.sleep(1.0)
        try:
            if spark.read.parquet(f"{root}/raw").count() >= min_rows:
                break
        except Exception:
            pass
    q.stop()
    q.awaitTermination(30)


def test_null_seq_rows_survive_full_feed_post_retirement(spark, tmp_path):
    """r10 (r9 ADVICE): dropDuplicates treats NULLs as equal, so the
    post-retirement full-feed dedup on seq would silently collapse every
    null-seq (opaque-id) row landing AFTER a retirement into one
    survivor. Null-seq rows must bypass the dedup verbatim — they can
    never be duplicated across the raw/compacted sides anyway
    (retirement refuses null seqs; a later compact_now refuses mixed
    feeds)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "landing")
    _stream_feed_rows(spark, root, "value + 1", "concat('s', value % 3)")
    seqs = sorted(r.seq for r in spark.read.parquet(f"{root}/raw").collect())
    assert len(seqs) >= 3
    ingest.retire_landing_history(spark, root, horizon_seq=seqs[-1])

    # opaque-id events land after the retirement: seq is null
    _stream_feed_rows(spark, root, "NULL", "concat('n', value % 2)")
    raw_nulls = (
        spark.read.parquet(f"{root}/raw").where(F.col("seq").isNull()).count()
    )
    assert raw_nulls >= 2

    full = ingest._full_feed(spark, root)
    assert full.where(F.col("seq").isNull()).count() == raw_nulls
    # and the read model serves BOTH new null-seq subjects
    subjects = {
        r.subject for r in ingest.read_model(spark, root).select("subject").collect()
    }
    assert {"n0", "n1"} <= subjects


def test_retire_refuses_null_seq_zone(spark, tmp_path):
    """A raw zone with null seqs (opaque wire ids) has no meaningful seq
    horizon — refuse with the remedy instead of retiring arbitrarily."""
    root = str(tmp_path / "landing")
    # r15: wait for >= 1 COMMITTED null-seq row (the shared polling
    # helper) instead of a fixed 2 s sleep — on a slow/loaded box the
    # first micro-batch may not commit inside the sleep, leaving an
    # empty raw zone with nothing to refuse (observed flake)
    _stream_feed_rows(spark, root, "NULL", "concat('s', value % 3)", min_rows=1)
    with pytest.raises(ValueError, match="mint seq"):
        ingest.retire_landing_history(spark, root, horizon_seq=5)


def test_retire_crash_between_marker_and_rewrite_over_serves(spark, tmp_path, monkeypatch):
    """A crash after the retention marker commits but before the raw
    rewrite must OVER-serve (duplicates the compaction window collapses),
    never under-serve; the re-run converges."""
    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        for i in range(6):
            state.append("org.example.doc", str(i % 2), {"doc_id": i})
        root = str(tmp_path / "landing")
        ingest.run(spark, url, root)
        before = sorted(
            (r.subject, r.seq)
            for r in ingest.read_model(spark, root).select("subject", "seq").collect()
        )
        seqs = sorted(r.seq for r in spark.read.parquet(f"{root}/raw").collect())

        real = ingest._rewrite_landing

        def dying(*a, **kw):
            raise RuntimeError("injected crash before the raw rewrite")

        monkeypatch.setattr(ingest, "_rewrite_landing", dying)
        with pytest.raises(RuntimeError, match="injected"):
            ingest.retire_landing_history(spark, root, horizon_seq=seqs[3])
        # marker committed, raw untouched: reads union and stay exact
        assert ingest.retention_horizon(spark, root) == seqs[3]
        mid_crash = sorted(
            (r.subject, r.seq)
            for r in ingest.read_model(spark, root).select("subject", "seq").collect()
        )
        assert mid_crash == before

        monkeypatch.setattr(ingest, "_rewrite_landing", real)
        ingest.retire_landing_history(spark, root, horizon_seq=seqs[3])
        kept = sorted(r.seq for r in spark.read.parquet(f"{root}/raw").collect())
        assert kept == [s for s in seqs if s > seqs[3]]
        after = sorted(
            (r.subject, r.seq)
            for r in ingest.read_model(spark, root).select("subject", "seq").collect()
        )
        assert after == before
    finally:
        srv.shutdown()


def test_fsck_landing_clean_and_injected_violations(spark, tmp_path):
    """fsck_landing on a clean zone, through a retirement, and with
    injected violations (a listed file deleted, an orphan planted)."""
    from http_feeds_spark.operators import fsck

    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        root = str(tmp_path / "landing")
        assert fsck.fsck_landing(spark, root) == {"log_present": False}
        for i in range(6):
            state.append("org.example.doc", str(i % 2), {"doc_id": i})
        ingest.run(spark, url, root)

        rep = fsck.fsck_landing(spark, root)
        assert rep["log_present"] and rep["visible_entries_missing"] == []
        assert rep["files_missing"] == 0 and rep["maint_orphans"] == 0
        assert rep["retention_horizon"] is None
        assert not rep["rewrite_stage_leftover"]

        seqs = sorted(r.seq for r in spark.read.parquet(f"{root}/raw").collect())
        ingest.retire_landing_history(spark, root, horizon_seq=seqs[2])
        rep = fsck.fsck_landing(spark, root)
        assert rep["retention_horizon"] == seqs[2]
        assert rep["compacted_present"] and rep["unretired_rows"] == 0
        assert rep["files_missing"] == 0 and rep["maint_orphans"] == 0

        # violations: plant an orphan; delete a listed file
        with open(f"{root}/raw/maint-999999-00000.parquet", "wb") as f:
            f.write(b"junk")
        rep = fsck.fsck_landing(spark, root)
        assert rep["maint_orphans"] == 1
        listed = [
            f for f in os.listdir(f"{root}/raw")
            if f.endswith(".parquet") and f != "maint-999999-00000.parquet"
        ]
        os.remove(f"{root}/raw/{listed[0]}")
        rep = fsck.fsck_landing(spark, root)
        assert rep["files_missing"] >= 1
    finally:
        srv.shutdown()


def test_run_platform_retire_below_seq(spark, tmp_path):
    """The one-call API's retention knob: run_platform with
    retire_below_seq leaves raw holding only the tail while the read
    model keeps answering for every live subject."""
    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        for i in range(6):
            state.append("org.example.doc", str(i), {"doc_id": i, "text": f"window body{i}"})
        root = str(tmp_path / "platform")
        out = ingest.run_platform(
            spark, url, root,
            text_index=False, dedup_index=False, monitor=False, erasure=False,
            retire_below_seq=3,
        )
        assert out["landing"]["retention"]["horizon_seq"] == 3
        assert ingest.retention_horizon(spark, f"{root}/landing") == 3
        kept = sorted(r.seq for r in spark.read.parquet(f"{root}/landing/raw").collect())
        assert kept and min(kept) > 3
        subjects = sorted(
            r.subject for r in ingest.read_model(spark, f"{root}/landing").collect()
        )
        assert subjects == [str(i) for i in range(6)]
    finally:
        srv.shutdown()
