"""Store-maintenance policy (ingest.run_maintenance): a platform that
follows a feed accumulates one posting batch / monitor unit per
catch-up; the policy keeps both stores BOUNDED (threshold-triggered
compaction + unconditional vacuum) while every answer stays
bit-identical — plus the compact_batches below-range guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from http_feeds_spark import ingest
from http_feeds_spark.operators import text_index as ti
from http_feeds_spark.streaming import monitor as mon


def _wave(spark, ids, tag):
    return spark.createDataFrame(
        [(i, f"window filter merge body{i} {tag} tail{i}") for i in ids],
        "doc_id long, text string",
    )


def _dir_count(path):
    if not os.path.exists(path):
        return 0
    return sum(1 for n in os.listdir(path) if n.startswith("batch="))


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
def test_run_maintenance_bounds_growth_answers_identical(spark, tmp_path):
    """20 waves of folds, maintenance at compact_after=4: visible counts
    AND on-disk batch-dir counts collapse, BM25 search / monitor stats /
    HLL distinct counts are bit-identical before and after, and a second
    maintenance call is a no-op."""
    root = str(tmp_path / "platform")
    ti_root, mon_root = f"{root}/text_index", f"{root}/monitor"
    for w in range(20):
        docs = _wave(spark, [w], f"wave{w}")
        if not ti.ensure_text_index(spark, docs, ti_root):
            ti.upsert_documents(spark, docs, ti_root)
        mon.fold_batch(spark, docs, mon_root, batch_id=w)
    assert len(ti.visible_batches(spark, ti_root)) == 20
    assert len(mon.visible_units(spark, mon_root)) == 20

    before_search = ti.search(spark, ti_root, ["window", "body7"], k=30).collect()
    before_stats = mon.read_stats(spark, mon_root).agg(
        F.sum("n_docs"), F.sum("n_tokens"), F.sum("n_chars"), F.sum("short_docs")
    ).collect()[0]
    before_distinct = mon.distinct_counts(spark, mon_root, list(range(20)))

    out = ingest.run_maintenance(spark, root, compact_after=4)
    assert out["text_index"]["batches_before"] == 20
    assert out["text_index"]["batches_after"] == 1
    # compact_postings vacuums internally (_replace_batches step 3), so
    # the policy-level sweep finds nothing left for the text index
    assert out["monitor"]["batches_before"] == 20
    assert out["monitor"]["batches_after"] == 1
    assert out["monitor"]["vacuumed"] > 0
    # bounded ON DISK, not just in the view
    assert _dir_count(f"{ti_root}/postings") == 1
    assert _dir_count(f"{mon_root}/{mon.STATS_DIR}") == 0  # merged gen only

    after_search = ti.search(spark, ti_root, ["window", "body7"], k=30).collect()
    assert [r.asDict() for r in after_search] == [
        r.asDict() for r in before_search
    ]
    after_stats = mon.read_stats(spark, mon_root).agg(
        F.sum("n_docs"), F.sum("n_tokens"), F.sum("n_chars"), F.sum("short_docs")
    ).collect()[0]
    assert list(after_stats) == list(before_stats)
    # the merged unit answers the full range under its keep id
    after_distinct = mon.distinct_counts(spark, mon_root, [0])
    assert after_distinct == before_distinct

    again = ingest.run_maintenance(spark, root, compact_after=4)
    assert again["text_index"]["batches_after"] == 1
    assert again["text_index"]["vacuumed"] == 0  # nothing left to clean
    assert again["monitor"]["vacuumed"] == 0


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
def test_run_maintenance_converges_after_crash_before_vacuum(
    spark, tmp_path, monkeypatch
):
    """Crash between compact and vacuum: the compaction manifests have
    committed (answers already switched) but the hidden source dirs
    remain. The next run_maintenance — even with counts back UNDER the
    threshold — vacuums them away; answers never change."""
    root = str(tmp_path / "platform")
    ti_root, mon_root = f"{root}/text_index", f"{root}/monitor"
    for w in range(6):
        docs = _wave(spark, [w], f"wave{w}")
        if not ti.ensure_text_index(spark, docs, ti_root):
            ti.upsert_documents(spark, docs, ti_root)
        mon.fold_batch(spark, docs, mon_root, batch_id=w)
    # the crash state: compact committed, vacuum never ran (inject the
    # crash by making the internal vacuum a no-op for this call)
    with monkeypatch.context() as m:
        m.setattr(ti, "vacuum_postings", lambda *a, **k: 0)
        ti.compact_postings(spark, ti_root, upto=5)
    mon.compact_batches(spark, mon_root, upto=5, run_vacuum=False)
    assert _dir_count(f"{ti_root}/postings") == 7  # 6 sources + merge
    assert _dir_count(f"{mon_root}/{mon.STATS_DIR}") == 6
    search_mid = ti.search(spark, ti_root, ["window"], k=30).collect()

    out = ingest.run_maintenance(spark, root, compact_after=16)
    assert out["text_index"]["batches_before"] == 1  # view already switched
    assert out["text_index"]["vacuumed"] > 0
    assert out["monitor"]["vacuumed"] > 0
    assert _dir_count(f"{ti_root}/postings") == 1
    assert _dir_count(f"{mon_root}/{mon.STATS_DIR}") == 0
    assert ti.search(spark, ti_root, ["window"], k=30).collect() == search_mid


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
def test_run_platform_invokes_maintenance(spark, tmp_path):
    """run_platform with compact_after wired: waves of feed catch-ups
    keep the stores at one batch dir while search still answers."""
    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        root = str(tmp_path / "platform")
        for w in range(3):
            state.append(
                "org.example.document",
                str(w),
                {"doc_id": w, "text": f"window filter merge body{w} tail{w}"},
            )
            out = ingest.run_platform(spark, url, root, compact_after=1)
        assert out["maintenance"]["text_index"]["batches_after"] == 1
        assert len(ti.visible_batches(spark, f"{root}/text_index")) == 1
        assert _dir_count(f"{root}/text_index/postings") == 1
        hits = {
            r.doc_id
            for r in ti.search(spark, f"{root}/text_index", ["window"], k=10).collect()
        }
        assert hits == {0, 1, 2}
    finally:
        srv.shutdown()


def test_compact_batches_refuses_below_range_unit(spark, tmp_path):
    """The ADVICE guard: units folded BELOW the compacted range cannot
    be merged without the prior merged unit — covered_new would hide
    keep_prev's data without re-merging it. Refuse loudly; merging the
    full range still works."""
    root = str(tmp_path / "mon")
    for b in (5, 6):
        mon.fold_batch(spark, _wave(spark, [b], f"w{b}"), root, batch_id=b)
    assert mon.compact_batches(spark, root, upto=10) == [5]
    for b in (1, 2):
        mon.fold_batch(spark, _wave(spark, [100 + b], f"w{b}"), root, batch_id=b)
    with pytest.raises(ValueError, match="prior merged unit"):
        mon.compact_batches(spark, root, upto=3)
    assert mon.compact_batches(spark, root, upto=10) == [1]
    total = mon.read_stats(spark, root).agg(F.sum("n_docs")).collect()[0][0]
    assert total == 4  # nothing hidden, nothing lost


def test_file_compaction_bounds_append_partitioned_stores(spark, tmp_path):
    """The append-partitioned stores gain one FILE-SET per fold/upsert
    (not new batch dirs): run_maintenance's files-per-partition policy
    rewrites them to ~one file per partition dir with answers
    bit-identical, and the stage→swap crash window resumes."""
    import shutil

    from pyspark.sql import functions as F

    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.sources.tables import load_table
    from http_feeds_spark.stores import data_file_stats, rewrite_partitioned_store
    from http_feeds_spark.streaming import dedup as sd

    root = str(tmp_path / "platform")
    sd_root = f"{root}/dedup_index"
    text = "the quick brown fox jumps over the lazy dog again and again today"
    for w in range(5):
        docs = spark.createDataFrame(
            [(10 * w + i, f"{text} wave{w} doc{i}") for i in range(3)],
            "doc_id long, text string",
        )
        sd.fold_batch(spark, docs, sd_root)
    shingles = f"{sd_root}/{sd.SHINGLES_DIR}"
    files0, dirs0 = data_file_stats(spark, shingles)
    assert files0 > dirs0  # the accumulation the policy exists for
    asg_before = {
        r.node: r.component for r in sd.read_assignment(spark, sd_root).collect()
    }

    out = ingest.run_maintenance(
        spark, root, text_index=False, monitor=False, files_per_partition=1
    )
    files1, dirs1 = data_file_stats(spark, shingles)
    assert files1 == dirs1  # one file per bucket dir
    assert out["dedup_index"]["files_after"] < out["dedup_index"]["files_before"]
    rows = spark.read.parquet(shingles)
    assert rows.count() == 15 and rows.select("doc_id").distinct().count() == 15
    asg_after = {
        r.node: r.component for r in sd.read_assignment(spark, sd_root).collect()
    }
    assert asg_after == asg_before

    # ANN corpus: build + repeated upserts accumulate cluster files
    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ai_root = f"{root}/ann_index"
    ai.build_index(spark, emb, ai_root, k=4, iters=1)
    dim = len(emb.limit(1).collect()[0].embedding)
    base = int(emb.agg(F.max("vec_id")).collect()[0][0]) + 1
    for w in range(4):
        ai.upsert_vectors(
            spark,
            spark.createDataFrame(
                [(base + w, [0.01 * (w + 1)] * dim)], "vec_id long, embedding array<double>"
            ),
            ai_root,
        )
    corpus = f"{ai_root}/{ai.CORPUS_DIR}"
    q = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    want = sorted(
        tuple(r) for r in ai.search(spark, q, ai_root, k=5, nprobe=4).collect()
    )
    out2 = ingest.run_maintenance(
        spark, root, text_index=False, monitor=False, dedup_index=False,
        ann_index=True, files_per_partition=1,
    )
    files2, dirs2 = data_file_stats(spark, corpus)
    assert files2 == dirs2
    assert out2["ann_index"]["files_after"] < out2["ann_index"]["files_before"]
    got = sorted(
        tuple(r) for r in ai.search(spark, q, ai_root, k=5, nprobe=4).collect()
    )
    assert got == want

    # crash window: stage committed, live deleted, swap torn → resume
    stage = corpus.rstrip("/") + "__rewrite_stage"
    shutil.copytree(corpus, stage)
    shutil.rmtree(corpus)
    rewrite_partitioned_store(spark, corpus, "cluster")
    assert sorted(
        tuple(r) for r in ai.search(spark, q, ai_root, k=5, nprobe=4).collect()
    ) == want


def test_rewrite_target_files_splits_partitions(spark, tmp_path):
    """target_files > 1 (the guard against one-task-per-partition on
    few-partition stores): each partition dir lands as ~N salted files,
    rows exact."""
    from http_feeds_spark.stores import data_file_stats, rewrite_partitioned_store

    store = str(tmp_path / "store" / "data")
    df = spark.createDataFrame(
        [(i, i % 2, f"payload{i}") for i in range(400)],
        "doc_id long, bucket int, body string",
    )
    df.repartition(8).write.partitionBy("bucket").parquet(store)
    before = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    rewrite_partitioned_store(spark, store, "bucket", target_files=3)
    files, dirs = data_file_stats(spark, store)
    assert dirs == 2 and 2 < files <= 6  # multiple files/dir (hash jitter)
    assert sorted(tuple(r) for r in spark.read.parquet(store).collect()) == before
    rewrite_partitioned_store(spark, store, "bucket")  # back to 1/dir
    files1, _ = data_file_stats(spark, store)
    assert files1 == 2


def test_rewrite_resume_merges_when_fold_recreated_live(spark, tmp_path):
    """The rewrite/migration twin of the purge-resume data-loss window:
    crash between delete(live) and rename(stage->live), then a FOLD
    recreates the live dir (it cannot see the store, so its anti-join
    admits previously-indexed docs). The resume must merge the staged
    rows back in and collapse the byte-identical duplicates — the old
    restore-only-if-missing rule deleted the only copy."""
    import shutil

    from http_feeds_spark.streaming import dedup as sd

    def _row(r):
        return tuple(tuple(x) if isinstance(x, list) else x for x in r)

    text = "the quick brown fox jumps over the lazy dog again and again today"
    w1 = spark.createDataFrame(
        [(1, text), (2, text + " extra")], "doc_id long, text string"
    )
    root = str(tmp_path / "sd")
    sd.fold_batch(spark, w1, root)
    bands_path, shingles_path, _ = sd._paths(root)
    want = {
        s: sorted(
            _row(r) for r in spark.read.parquet(s).drop("bucket").collect()
        )
        for s in (bands_path, shingles_path)
    }

    # torn rewrite swap on BOTH stores: stage committed, live gone
    for s in (bands_path, shingles_path):
        shutil.copytree(s, s.rstrip("/") + "__rewrite_stage")
        shutil.rmtree(s)

    # the retry's fold lands first: doc 1 re-folds (no store to see) and
    # doc 3 arrives new — the live dirs are recreated
    w2 = spark.createDataFrame(
        [(1, text), (3, "completely different words about other topics entirely")],
        "doc_id long, text string",
    )
    sd.fold_batch(spark, w2, root)

    from http_feeds_spark.stores import rewrite_partitioned_store

    for s in (bands_path, shingles_path):
        rewrite_partitioned_store(spark, s, "bucket")
    for s, rows in want.items():
        after = sorted(
            _row(r) for r in spark.read.parquet(s).drop("bucket").collect()
        )
        doc_ids = {r[0] for r in after}
        assert doc_ids == {1, 2, 3}, "pre-crash rows lost or new rows dropped"
        # doc 1 folded twice: duplicates collapsed, rows byte-identical
        for row in rows:
            assert row in after, "staged row lost"
        assert len(after) == len(set(after)), "merge duplicates survived"


def test_cached_scan_survives_low_level_rewrite(spark, tmp_path):
    """r16 scan-handle cache: the shared stage→swap rewrite re-materializes
    a store under NEW file names — stores.rewrite_partitioned_store must
    invalidate the cached handle itself (module writers cannot see a
    direct low-level call), so the next cached_scan reads the swapped-in
    file set instead of dying on the deleted one."""
    from http_feeds_spark import stores

    store = str(tmp_path / "store" / "data")
    df = spark.createDataFrame(
        [(i, i % 3, f"p{i}") for i in range(60)],
        "doc_id long, bucket int, body string",
    )
    df.repartition(4).write.partitionBy("bucket").parquet(store)
    before = sorted(tuple(r) for r in stores.cached_scan(spark, store).collect())
    assert stores.cached_scan(spark, store) is stores.cached_scan(spark, store)
    stores.rewrite_partitioned_store(spark, store, "bucket")
    # the handle was invalidated at the swap: this read sees the new files
    assert sorted(tuple(r) for r in stores.cached_scan(spark, store).collect()) == before
