"""Store integrity checks (operators/fsck.py): clean stores report
clean, and each injected violation is flagged by exactly the check that
owns it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.operators import ann_index as ai
from http_feeds_spark.operators import erasure
from http_feeds_spark.operators import fsck
from http_feeds_spark.operators import text_index as ti



pytestmark = pytest.mark.slow  # platform-integration tier (see pytest.ini)

def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _emb(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_fsck_text_index_clean_and_violations(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs.where(F.col("doc_id") % 2 == 0), root)
    ti.upsert_documents(spark, docs.where(F.col("doc_id") % 2 == 1), root)

    clean = fsck.fsck_text_index(spark, root)
    assert clean["doc_overlap_violations"] == 0
    assert clean["meta_fresh"] is True
    assert clean["inert_manifests"] == 0 and clean["vacuum_backlog"] == 0
    assert clean["positional"] is True and clean["erase_ledger_ids"] == 0
    assert clean["visible_batches"] == 2

    # violation 1: a duplicate doc smuggled into a new batch (bypassing
    # the upsert anti-join) -> overlap check fires
    dup = docs.where(F.col("doc_id") == 0)
    ti._write_postings_batch(spark, dup, f"{root}/{ti.POSTINGS_DIR}", 9)
    assert fsck.fsck_text_index(spark, root)["doc_overlap_violations"] == 1
    # ...and the derived fingerprint is now stale too
    assert fsck.fsck_text_index(spark, root)["meta_fresh"] is False

    # violation 2: an inert manifest (compaction crashed pre-merge)
    spark.createDataFrame(
        [(50, [0, 1])], "new_batch int, sources array<int>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/{ti.COMPACTION_DIR}/000000")
    assert fsck.fsck_text_index(spark, root)["inert_manifests"] == 1

    # logical erasure shows up in the report
    erasure.erase_ids(spark, root, spark.createDataFrame([(0,)], "id long"))
    assert fsck.fsck_text_index(spark, root)["erase_ledger_ids"] == 1


def test_fsck_ann_index_clean_and_violations(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    root = str(tmp_path / "ann")
    ai.build_index(spark, emb, root, k=8, iters=2)
    extra = emb.limit(0)  # no-op upsert keeps the store clean
    ai.upsert_vectors(spark, extra, root)

    clean = fsck.fsck_ann_index(spark, root)
    assert clean["duplicate_ids"] == 0
    assert clean["assignment_violations"] == 0
    assert clean["stage_leftover"] is False
    assert clean["n_centroids"] == 8

    # violation: a row appended under the WRONG cluster partition
    corpus_path = f"{root}/{ai.CORPUS_DIR}"
    row = spark.read.parquet(corpus_path).limit(1).collect()[0]
    wrong = (int(row.cluster) + 1) % 8
    spark.createDataFrame(
        [(999_999, [float(x) for x in row.embedding], wrong)],
        "vec_id long, embedding array<double>, cluster int",
    ).withColumn(
        "embedding",
        F.col("embedding").cast(
            spark.read.parquet(corpus_path).schema["embedding"].dataType
        ),
    ).write.mode("append").partitionBy("cluster").parquet(corpus_path)
    bad = fsck.fsck_ann_index(spark, root)
    assert bad["assignment_violations"] == 1


def test_fsck_monitor_states(spark, tmp_path):
    from http_feeds_spark.streaming import monitor as mon

    root = str(tmp_path / "mon")
    for i, rows in enumerate(
        [[(1, "alpha beta")], [(2, "gamma delta")], [(3, "epsilon zeta")]]
    ):
        mon.fold_batch(
            spark, spark.createDataFrame(rows, "doc_id long, text string"), root, i
        )
    clean = fsck.fsck_monitor(spark, root)
    assert clean["visible_units"] == 3 and clean["raw_batches"] == 3
    assert clean["torn_merges"] == 0 and clean["vacuum_backlog"] == 0
    assert clean["sketch_coverage"] == "3/3"

    # torn merge: merged frames land, manifest never does
    mon._range_counts(spark, root, [0, 1]).write.mode("overwrite").parquet(
        f"{root}/{mon.MERGED_DIR}/000000/{mon.WORDS_DIR}"
    )
    assert fsck.fsck_monitor(spark, root)["torn_merges"] == 1

    # committed compaction without vacuum: backlog visible
    mon.compact_batches(spark, root, upto=1, run_vacuum=False)
    mid = fsck.fsck_monitor(spark, root)
    assert mid["visible_units"] == 2 and mid["vacuum_backlog"] == 2
    assert mid["active_gen"] == 0 and mid["torn_merges"] == 0

    mon.vacuum(spark, root)
    done = fsck.fsck_monitor(spark, root)
    assert done["vacuum_backlog"] == 0 and done["sketch_coverage"] == "2/2"


def test_fsck_pq_index_clean_and_violations(spark, sf_dir, tmp_path):
    from http_feeds_spark.operators import pq_index as pqi

    emb = _emb(spark, sf_dir)
    root = str(tmp_path / "pq")
    pqi.build_pq_index(spark, emb, root, nlist=8, m=4, ksub=16, iters=1)
    clean = fsck.fsck_pq_index(spark, root)
    assert clean["duplicate_ids"] == 0
    assert clean["code_shape_violations"] == 0
    assert (clean["m"], clean["ksub"], clean["residual"]) == (4, 16, False)

    # a row written against a DIFFERENT codebook model (wrong m)
    spark.createDataFrame(
        [(999_999, [1, 2], 0)], "vec_id long, codes array<tinyint>, cluster int"
    ).write.mode("append").partitionBy("cluster").parquet(f"{root}/{pqi.CODES_DIR}")
    assert fsck.fsck_pq_index(spark, root)["code_shape_violations"] == 1

    rroot = str(tmp_path / "pqr")
    pqi.build_pq_index(spark, emb, rroot, nlist=8, m=4, ksub=16, iters=1, residual=True)
    assert fsck.fsck_pq_index(spark, rroot)["residual"] is True


def test_fsck_dedup_index_clean_and_violations(spark, tmp_path):
    """The dedup index joins the fsck family (r8): clean after folds;
    detects the torn-fold orphan signature, legacy layout, and stage
    leftovers from any of the three store protocols."""
    import os

    from pyspark.sql import functions as F

    from http_feeds_spark.operators import erasure
    from http_feeds_spark.streaming import dedup as sd

    root = str(tmp_path / "sd")
    text = "the quick brown fox jumps over the lazy dog again and again today"
    sd.fold_batch(
        spark,
        spark.createDataFrame(
            [(1, text), (2, text + " extra")], "doc_id long, text string"
        ),
        root,
    )
    clean = fsck.fsck_dedup_index(spark, root)
    assert clean["shingle_docs"] == 2 and clean["assignment_nodes"] == 2
    assert not clean["legacy_layout"]
    assert clean["band_orphans"] == 0 and clean["assignment_orphans"] == 0
    assert clean["stage_leftovers"] == [] and clean["erase_ledger_ids"] == 0

    # torn-fold signature: a band row whose doc never reached shingles
    bands_path, shingles_path, _ = sd._paths(root)
    spark.createDataFrame(
        [(99, 0, 12345, 7)], "doc_id long, band_id int, band_hash long, bucket int"
    ).write.mode("append").partitionBy("bucket").parquet(bands_path)
    assert fsck.fsck_dedup_index(spark, root)["band_orphans"] == 1

    # stage leftover + pending erasure
    os.makedirs(shingles_path.rstrip("/") + "__rewrite_stage", exist_ok=True)
    erasure.erase_ids(spark, root, spark.createDataFrame([(1,)], "id long"))
    rep = fsck.fsck_dedup_index(spark, root)
    assert rep["stage_leftovers"] == ["shingles__rewrite_stage"]
    assert rep["erase_ledger_ids"] == 1

    # legacy layout flags (devolve the shingle store)
    import shutil

    flat = spark.read.parquet(shingles_path).drop("bucket")
    rows, schema = flat.collect(), flat.schema
    shutil.rmtree(shingles_path)
    spark.createDataFrame(rows, schema).write.parquet(shingles_path)
    assert fsck.fsck_dedup_index(spark, root)["legacy_layout"] is True


def test_fsck_rewrite_stage_leftover_flags(spark, sf_dir, tmp_path):
    """The ANN/PQ reports surface a leftover file-compaction stage
    (r8's rewrite protocol) separately from the purge stage."""
    import os

    from http_feeds_spark.operators import ann_index as ai

    emb = _emb(spark, sf_dir)
    root = str(tmp_path / "ann")
    ai.build_index(spark, emb, root, k=4, iters=1)
    assert fsck.fsck_ann_index(spark, root)["rewrite_stage_leftover"] is False
    os.makedirs(f"{root}/{ai.CORPUS_DIR}__rewrite_stage", exist_ok=True)
    rep = fsck.fsck_ann_index(spark, root)
    assert rep["rewrite_stage_leftover"] is True and rep["stage_leftover"] is False


def test_fsck_platform_one_call(spark, sf_dir, tmp_path):
    """The r11 one-call audit: a platform root built from healthy
    stores reports clean (absent components as present=False, not
    errors); an injected posting overlap lands in `violations` and
    flips `clean`; a logical erasure is a warning, not a violation."""
    from http_feeds_spark.streaming import dedup as sd
    from http_feeds_spark.streaming import monitor as mon

    root = str(tmp_path / "platform")
    docs = _docs(spark, sf_dir).limit(40)
    ti.build_text_index(spark, docs, f"{root}/text_index")
    mon.fold_batch(spark, docs, f"{root}/monitor", batch_id=0)
    sd.fold_batch(spark, docs, f"{root}/dedup_index")
    ai.build_index(spark, _emb(spark, sf_dir).limit(64), f"{root}/ann_index", k=4, iters=2)

    rep = fsck.fsck_platform(spark, root)
    assert rep["clean"] is True and rep["violations"] == []
    assert rep["components"]["text_index"]["present"] is True
    assert rep["components"]["ann_index"]["assignment_violations"] == 0
    assert rep["components"]["pq_index"] == {"present": False}
    assert rep["components"]["landing"] == {"present": False}
    assert rep["components"]["epochs"]["epochs"] == []

    # a warning (erasure ledger pending purge) does NOT flip clean
    erasure.erase_ids(
        spark, f"{root}/text_index", spark.createDataFrame([(0,)], "id long")
    )
    rep = fsck.fsck_platform(spark, root)
    assert rep["clean"] is True
    assert "text_index.erase_ledger_ids=1" in rep["warnings"]

    # an injected violation (duplicate doc batch bypassing the upsert
    # anti-join) lands in violations and flips clean
    ti._write_postings_batch(
        spark, docs.limit(1), f"{root}/text_index/{ti.POSTINGS_DIR}", 9
    )
    rep = fsck.fsck_platform(spark, root)
    assert rep["clean"] is False
    assert any(v.startswith("text_index.doc_overlap_violations") for v in rep["violations"])


def test_run_platform_verify_hook(spark, tmp_path):
    """run_platform(verify=True): the audit report rides the wave
    summary; a wave over a corrupted platform raises instead of
    returning a summary that looks healthy."""
    import pytest

    from http_feeds_spark import ingest
    from tests.feed_server import FeedState, serve

    state = FeedState()
    srv, url = serve(state)
    try:
        for i in range(4):
            state.append(
                "org.example.document",
                str(i),
                {"doc_id": i, "text": f"window filter merge body{i} tail{i}"},
            )
        root = str(tmp_path / "platform")
        out = ingest.run_platform(spark, url, root, verify=True)
        assert out["fsck"]["clean"] is True
        assert out["fsck"]["components"]["text_index"]["present"] is True

        # corrupt the text index; the next verified wave fails loudly
        ti._write_postings_batch(
            spark,
            spark.createDataFrame([(0, "window dup")], "doc_id long, text string"),
            f"{root}/text_index/{ti.POSTINGS_DIR}",
            9,
        )
        with pytest.raises(RuntimeError, match="doc_overlap_violations") as ei:
            ingest.run_platform(spark, url, root, verify=True)
        # r12: the raise carries the FULL audit, not just the message —
        # the complete fsck report and the wave summary it rode in on
        assert isinstance(ei.value, ingest.PlatformVerifyError)
        assert ei.value.report["clean"] is False
        assert any("doc_overlap" in v for v in ei.value.report["violations"])
        assert ei.value.summary["fsck"] is ei.value.report
        assert "text_index" in ei.value.summary  # the wave ran before the audit
    finally:
        srv.shutdown()


def test_fsck_epochs_servability_matrix(spark, tmp_path):
    """r10, the seventh store family: fsck_epochs reports, per committed
    epoch, which recorded frontiers still serve a pin — fully servable
    right after recording, the affected store flipping to stale after a
    maintenance rewrite, never-recorded components as absent."""
    from http_feeds_spark import epochs
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import fsck
    from http_feeds_spark.operators import text_index as ti

    root = str(tmp_path / "platform")
    docs = spark.createDataFrame(
        [(i, f"window filter merge body{i}") for i in range(4)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [1.0 * (i % 4 == d) + 0.1 for d in range(4)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    ti.build_text_index(spark, docs, f"{root}/text_index")
    ai.build_index(spark, emb, f"{root}/ann_index", k=2, iters=1)
    rec0 = epochs.record_epoch(spark, root)

    rep = fsck.fsck_epochs(spark, root)
    assert rep["epochs"] == [rec0["epoch"]]
    r0 = rep["reports"][0]
    assert r0["stale"] == []
    assert set(r0["absent"]) == {
        "monitor", "dedup_index", "landing", "pq_index", "media_index",
    }
    assert rep["fully_servable"] == [rec0["epoch"]]

    # a corpus rewrite stales the ANN frontier of the OLD epoch only
    ai.upsert_vectors(
        spark,
        spark.createDataFrame(
            [(100, [0.5, 0.5, 0.0, 0.0])], "vec_id long, embedding array<float>"
        ),
        f"{root}/ann_index",
    )
    ai.compact_store(spark, f"{root}/ann_index")
    rec1 = epochs.record_epoch(spark, root)
    rep = fsck.fsck_epochs(spark, root)
    by_epoch = {r["epoch"]: r for r in rep["reports"]}
    assert by_epoch[rec0["epoch"]]["stale"] == ["ann_index"]
    assert by_epoch[rec1["epoch"]]["stale"] == []
    assert rep["fully_servable"] == [rec1["epoch"]]
    # the fsck verdict matches what a pin actually does
    q = spark.createDataFrame(
        [(900, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pin a newer epoch"):
        epochs.pin(spark, root, rec0["epoch"]).ann_search(q, k=2).collect()
    assert epochs.pin(spark, root, rec1["epoch"]).ann_search(q, k=2).count() > 0
    # empty platform: no epochs, no reports
    assert fsck.fsck_epochs(spark, str(tmp_path / "elsewhere")) == {
        "epochs": [], "reports": [],
    }
