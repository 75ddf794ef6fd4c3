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



pytestmark = pytest.mark.slow  # platform-integration tier (see pytest.ini)

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
    q = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    with pytest.raises(FileNotFoundError):
        pinned.ann_search(q)
    with pytest.raises(FileNotFoundError):
        pinned.pq_search(q)


def _vecs(spark, ids, seed_axis):
    """Deterministic 4-dim unit-ish vectors; `seed_axis` rotates which
    axis dominates so waves are geometrically distinguishable."""
    rows = [
        (i, [1.0 if d == (i + seed_axis) % 4 else 0.1 * ((i + d) % 3) for d in range(4)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _build_vector_wave_n(spark, root):
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import pq_index as pqi

    emb = _vecs(spark, range(8), 0)
    ai.build_index(spark, emb, f"{root}/ann_index", k=2, iters=2)
    pqi.build_pq_index(
        spark, emb, f"{root}/pq_index", nlist=2, m=2, ksub=2, validate=False
    )
    return emb


def test_pinned_vector_reads_see_wave_n_while_n1_lands(spark, tmp_path):
    """The r10 frontier extension: a pinned epoch holds BOTH vector-index
    families (ANN raw tier + PQ compressed tier) at wave N while wave
    N+1 upserts land — so a hybrid reader (BM25 ⊕ ANN, the RRF
    composition) pinning one epoch sees ONE consistent wave across the
    lexical and vector stores, the exact cross-store skew D46 closes."""
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import pq_index as pqi

    root = str(tmp_path / "platform")
    _build_vector_wave_n(spark, root)
    ti.build_text_index(spark, _wave(spark, [1, 2, 3], "waveN"), f"{root}/text_index")
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])

    q = spark.createDataFrame(
        [(900, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    want_ann = [(r.query_id, r.vec_id, r.rank) for r in pinned.ann_search(q, k=4).collect()]
    want_pq = [(r.query_id, r.vec_id, r.rank) for r in pinned.pq_search(q, k=4).collect()]
    want_lex = {r.doc_id for r in pinned.text_search(["window"], k=10).collect()}
    assert want_ann and want_pq and want_lex == {1, 2, 3}

    # wave N+1: vectors engineered to WIN the query if they leaked in
    new = spark.createDataFrame(
        [(100 + i, [1.0, 0.0, 0.0, 0.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    assert ai.upsert_vectors(spark, new, f"{root}/ann_index") == 3
    assert pqi.upsert_vectors(spark, new, f"{root}/pq_index") == 3
    ti.upsert_documents(spark, _wave(spark, [4, 5], "waveN1"), f"{root}/text_index")

    # live reads see wave N+1 ...
    live = {r.vec_id for r in ai.search(spark, q, f"{root}/ann_index", k=4).collect()}
    assert live & {100, 101, 102}
    # ... while the pinned reader still answers wave N exactly, on all
    # three stores the hybrid composition joins
    assert [(r.query_id, r.vec_id, r.rank) for r in pinned.ann_search(q, k=4).collect()] == want_ann
    assert [(r.query_id, r.vec_id, r.rank) for r in pinned.pq_search(q, k=4).collect()] == want_pq
    assert {r.doc_id for r in pinned.text_search(["window"], k=10).collect()} == want_lex

    # the next epoch's pin serves the new wave
    rec2 = epochs.record_epoch(spark, root)
    p2 = epochs.pin(spark, root, rec2["epoch"])
    assert {r.vec_id for r in p2.ann_search(q, k=4).collect()} & {100, 101, 102}


def test_pinned_topic_profile_while_wave_n1_lands(spark, tmp_path, monkeypatch):
    """r12: PlatformEpoch.topic_profile is the topics-module workflow
    (profile a QUIESCENT epoch, never a moving corpus) as one call —
    the pinned ANN corpus supplies the embeddings and the pinned
    coarse-quantizer centroids are the trained model, so the profile
    (a) costs ZERO Lloyd trainings and (b) stays byte-identical while
    wave N+1 vectors land; an epoch with no ANN frontier refuses."""
    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import topics

    root = str(tmp_path / "platform")
    _build_vector_wave_n(spark, root)
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])

    docs = spark.createDataFrame(
        [(i, f"alpha beta topic{i % 2} term{i % 2} word{i % 2}") for i in range(8)]
        + [(100 + i, "never clustered drift drift drift") for i in range(3)],
        "doc_id long, text string",
    )

    def no_training(*a, **kw):
        raise AssertionError("pinned profile must not train k-means")

    monkeypatch.setattr(topics.km, "kmeans_centroids", no_training)
    want = sorted(map(tuple, pinned.topic_profile(docs, top_terms=3).collect()))
    monkeypatch.undo()
    assert want
    clusters = {t[0] for t in want}
    assert len(clusters) <= 2  # the pinned quantizer's k
    # docs without a pinned embedding row are OUTSIDE the profile
    assert not any("drift" == t[3] for t in want)

    # wave N+1: vectors + docs engineered to relabel every cluster
    new = _vecs(spark, range(200, 212), 2)
    assert ai.upsert_vectors(spark, new, f"{root}/ann_index") == 12
    docs_n1 = docs.union(
        spark.createDataFrame(
            [(i, "drift drift drift drift") for i in range(200, 212)],
            "doc_id long, text string",
        )
    )
    live = topics.topic_profile(
        docs_n1,
        spark.read.parquet(f"{root}/ann_index/{ai.CORPUS_DIR}"),  # live read
        centroids=ai.load_centroids(spark, f"{root}/ann_index"),
        top_terms=3,
    )
    assert any(r.term == "drift" for r in live.collect())  # N+1 leaks into live
    got = sorted(map(tuple, pinned.topic_profile(docs_n1, top_terms=3).collect()))
    assert got == want  # ... but never into the pin

    # an epoch recorded before any ANN index refuses, like ann_search
    root2 = str(tmp_path / "p2")
    ti.build_text_index(spark, _wave(spark, [1], "w"), f"{root2}/text_index")
    rec2 = epochs.record_epoch(spark, root2)
    p2 = epochs.pin(spark, root2, rec2["epoch"])
    with pytest.raises(FileNotFoundError, match="no ANN index"):
        p2.topic_profile(docs)


def test_pinned_vector_read_fails_stop_after_rewrite(spark, tmp_path):
    """Maintenance rewrites (corpus compaction; full index rebuild)
    delete pinned files: the pinned read must raise with the remedy,
    never silently serve the rewritten store."""
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import pq_index as pqi

    root = str(tmp_path / "platform")
    emb = _build_vector_wave_n(spark, root)
    # a second file-set in the cluster dirs so compaction has work
    ai.upsert_vectors(spark, _vecs(spark, range(8, 12), 0), f"{root}/ann_index")
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])
    q = spark.createDataFrame(
        [(900, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    assert pinned.ann_search(q, k=4).count() > 0

    before, after = ai.compact_store(spark, f"{root}/ann_index")
    assert after < before
    with pytest.raises(ValueError, match="pin a newer epoch"):
        pinned.ann_search(q, k=4).collect()

    assert pinned.pq_search(q, k=4).count() > 0
    pqi.build_pq_index(  # rebuild overwrites model + codes
        spark, emb, f"{root}/pq_index", nlist=2, m=2, ksub=2, validate=False
    )
    with pytest.raises(ValueError, match="pin a newer epoch"):
        pinned.pq_search(q, k=4).collect()

    # post-maintenance epochs pin the rewritten frontier and read fine
    rec2 = epochs.record_epoch(spark, root)
    p2 = epochs.pin(spark, root, rec2["epoch"])
    assert p2.ann_search(q, k=4).count() > 0
    assert p2.pq_search(q, k=4).count() > 0


def test_erasure_trumps_vector_pins(spark, tmp_path):
    """The D42/D46 interaction extends to the vector tiers: an id erased
    AFTER the epoch was recorded must not surface through the pin (the
    ledger is consulted live), and once purged the pin fails stop."""
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import erasure

    root = str(tmp_path / "platform")
    _build_vector_wave_n(spark, root)
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])
    q = spark.createDataFrame(
        [(900, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    victim = pinned.ann_search(q, k=1).collect()[0].vec_id
    erasure.erase_ids(
        spark, f"{root}/ann_index", spark.createDataFrame([(victim,)], "id long")
    )
    assert victim not in {r.vec_id for r in pinned.ann_search(q, k=8).collect()}
    ai.purge_erased(spark, f"{root}/ann_index")  # physical purge rewrites files
    with pytest.raises(ValueError, match="pin a newer epoch"):
        pinned.ann_search(q, k=8).collect()


def test_record_epoch_refuses_torn_landing_log(spark, tmp_path):
    """The ADVICE r9 medium: a visible sink-log entry missing at record
    time must refuse LOUDLY — recording a partial landing frontier would
    make the pinned read silently under-serve."""
    import os

    root = str(tmp_path / "platform")
    _land_batch(spark, root)
    _land_batch(spark, root)  # ensure ≥2 visible entries
    meta = f"{root}/landing/raw/_spark_metadata"
    ids = sorted(int(f) for f in os.listdir(meta) if f.isdigit())
    assert ids, "expected plain delta entries below the first boundary"
    os.remove(f"{meta}/{ids[0]}")
    crc = f"{meta}/.{ids[0]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="missing visible entries"):
        epochs.record_epoch(spark, root)


def test_pinned_read_fails_stop_even_with_ignore_missing_files(spark, tmp_path):
    """The r10 ADVICE low on stores.read_pinned_files: the existence
    probe runs once at plan-build time, so a pinned file deleted AFTER
    the DataFrame is built must still fail the read at execution — even
    under a cluster-wide spark.sql.files.ignoreMissingFiles=true, which
    would otherwise silently drop the pinned data."""
    import os

    root = str(tmp_path / "platform")
    _land_batch(spark, root)
    rec = epochs.record_epoch(spark, root)
    pinned = epochs.pin(spark, root, rec["epoch"])
    df = pinned.landing()  # probe passes: every pinned file exists now
    assert df.count() > 0

    victim = pinned.landing_files[0].replace("file:", "")
    old = spark.conf.get("spark.sql.files.ignoreMissingFiles", "false")
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try:
        os.remove(victim)
        with pytest.raises(Exception, match="(?i)does not exist|deleted|FileNotFound"):
            df.count()
    finally:
        spark.conf.set("spark.sql.files.ignoreMissingFiles", old)


def test_record_epoch_refuses_concurrent_wave(spark, tmp_path, monkeypatch):
    """The cross-store barrier (r10 ADVICE): frontiers are captured at
    different instants, so a wave landing mid-record could straddle the
    epoch. record_epoch captures twice and must REFUSE when any
    frontier moved between the passes — and succeed once quiescent."""
    root = str(tmp_path / "platform")
    ti.build_text_index(spark, _wave(spark, [1, 2, 3], "waveN"), f"{root}/text_index")

    real = epochs._capture_frontiers
    state = {"raced": False}

    def racing(sp, r):
        out = real(sp, r)
        if not state["raced"]:
            state["raced"] = True  # a wave lands between the two captures
            ti.upsert_documents(
                spark, _wave(spark, [4, 5], "waveN1"), f"{root}/text_index"
            )
        return out

    monkeypatch.setattr(epochs, "_capture_frontiers", racing)
    with pytest.raises(RuntimeError, match="frontiers moved"):
        epochs.record_epoch(spark, root)
    # quiescent now (the racing shim no longer mutates): recording works
    rec = epochs.record_epoch(spark, root)
    assert len(rec["text_batches"]) == 2  # both waves in the frontier


def test_record_epoch_resolves_log_written_under_other_interval(spark, tmp_path):
    """The r10 ADVICE low: the landing window must derive from the
    OBSERVED .compact entries, not the live compactInterval config — a
    legitimate config change (or a log written under a different
    interval) must keep resolving, with the frontier anchored at the
    latest observed boundary."""
    root = str(tmp_path / "platform")
    _land_batch(spark, root)
    rec1 = epochs.record_epoch(spark, root)
    assert rec1["landing_files"]

    # same log read under a DIFFERENT configured interval: recording
    # still resolves, to the identical frontier (nothing landed since)
    old = spark.conf.get("spark.sql.streaming.fileSink.log.compactInterval", "10")
    spark.conf.set("spark.sql.streaming.fileSink.log.compactInterval", "3")
    try:
        rec2 = epochs.record_epoch(spark, root)
    finally:
        spark.conf.set("spark.sql.streaming.fileSink.log.compactInterval", old)
    assert rec2["landing_files"] == rec1["landing_files"]
    assert rec2["landing_batch"] == rec1["landing_batch"]


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
