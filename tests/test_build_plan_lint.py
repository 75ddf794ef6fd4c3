"""Store-BUILD plan lint sweep (r12). The registry-wide gate
(test_plan_lint.py) covers every registered QUERY, but the incident
that motivated the linter lived in a build path (_write_postings_batch
re-tokenizing per exploded row). This suite closes that asymmetry: it
drives each store builder end-to-end — text-index build/upsert under
both analyzers, ANN build+upsert, IVF+PQ build+upsert, monitor fold,
dedup fold — while intercepting DataFrameWriter.parquet, and lints the
EXACT DataFrame each write executes. Uniform allowlist style matches
test_plan_lint.LINT_ALLOW: every suppression names the store and the
documented design that justifies it."""

from __future__ import annotations

import pytest

from http_feeds_spark.plans.lint import lint


@pytest.fixture
def captured_writes(monkeypatch):
    """Capture (path, DataFrame) for every DataFrameWriter.parquet call
    while still performing the write — builders chain reads over their
    own earlier writes, so the build must really land."""
    from pyspark.sql.readwriter import DataFrameWriter

    captured: list[tuple[str, object]] = []
    orig = DataFrameWriter.parquet

    def parquet(self, path, *a, **kw):
        captured.append((str(path), self._df))
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", parquet)
    return captured


# DOCUMENTED suppressions — each a deliberate model-sized design:
# - centroid/codebook/meta/stats artifacts are k-, m*ksub- or
#   one-row-per-batch-sized frames deliberately coalesced or built from
#   local literals; a single partition IS the right layout for a file a
#   reader broadcast-collects (the r11 verdict adjudicated the monitor
#   coalesce(1) writes as harmless for exactly this reason).
# Keyed by a path substring; anything else flagging is a regression.
BUILD_LINT_ALLOW: dict[str, set[str]] = {
    "/centroids": {"single_partition_funnel"},
    "/codebooks": {"single_partition_funnel"},
    "/meta": {"single_partition_funnel"},
    "/stats": {"single_partition_funnel"},
    "/words": {"single_partition_funnel"},
}


def _lint_captured(captured) -> dict:
    flagged = {}
    for path, df in captured:
        rules = {x["rule"] for x in lint(df)}
        for frag, allow in BUILD_LINT_ALLOW.items():
            if frag in path:
                rules -= allow
        if rules:
            flagged.setdefault(path.rsplit("/", 2)[-2] + "/" + path.rsplit("/", 1)[-1], set()).update(rules)
    return flagged


def _docs(spark, n=12):
    return spark.createDataFrame(
        [(i, f"window filter merge shuffle body{i} tail{i % 3} extra word{i}") for i in range(n)],
        "doc_id long, text string",
    )


def _vecs(spark, ids):
    return spark.createDataFrame(
        [(i, [1.0 if d == i % 4 else 0.1 * ((i + d) % 3) for d in range(4)]) for i in ids],
        "vec_id long, embedding array<float>",
    )


def test_text_index_build_and_upsert_lint_clean(spark, tmp_path, captured_writes):
    from http_feeds_spark.operators import text_index as ti

    for analyzer in ("standard", "standard_porter"):
        root = f"{tmp_path}/ti_{analyzer}"
        ti.build_text_index(spark, _docs(spark), root, analyzer=analyzer)
        ti.upsert_documents(
            spark,
            spark.createDataFrame(
                [(100, "window upsert document running runs")],
                "doc_id long, text string",
            ),
            root,
        )
    assert len(captured_writes) >= 6  # the sweep must really intercept
    assert not _lint_captured(captured_writes), _lint_captured(captured_writes)


def test_ann_and_pq_build_and_upsert_lint_clean(spark, tmp_path, captured_writes):
    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import pq_index as pqi

    emb = _vecs(spark, range(16))
    ai.build_index(spark, emb, f"{tmp_path}/ann", k=2, iters=2)
    ai.upsert_vectors(spark, _vecs(spark, range(100, 104)), f"{tmp_path}/ann")
    pqi.build_pq_index(
        spark, emb, f"{tmp_path}/pq", nlist=2, m=2, ksub=2, validate=False
    )
    pqi.upsert_vectors(spark, _vecs(spark, range(100, 104)), f"{tmp_path}/pq")
    assert len(captured_writes) >= 6  # the sweep must really intercept
    assert not _lint_captured(captured_writes), _lint_captured(captured_writes)


def test_monitor_and_dedup_folds_lint_clean(spark, tmp_path, captured_writes):
    from http_feeds_spark.streaming import dedup as sd
    from http_feeds_spark.streaming import monitor as mon

    mon.fold_batch(spark, _docs(spark), f"{tmp_path}/monitor", batch_id=0)
    mon.fold_batch(spark, _docs(spark, 6), f"{tmp_path}/monitor", batch_id=1)
    sd.fold_batch(spark, _docs(spark), f"{tmp_path}/dedup")
    sd.fold_batch(
        spark,
        spark.createDataFrame(
            [(200, "window filter merge shuffle body0 tail0 extra word0")],
            "doc_id long, text string",
        ),
        f"{tmp_path}/dedup",
    )
    assert len(captured_writes) >= 4  # the sweep must really intercept
    assert not _lint_captured(captured_writes), _lint_captured(captured_writes)


def test_media_fold_and_purge_lint_clean(spark, tmp_path, captured_writes):
    """The r13 media store joins the build sweep: two folds (the second
    partially redelivered) plus the erasure purge rewrite, every
    intercepted write frame linted."""
    from http_feeds_spark.functions import multimodal as mm
    from http_feeds_spark.operators import erasure
    from http_feeds_spark.streaming import media as smedia

    def png(seed):
        return mm.encode_png(mm.synth_image(seed=seed, height=16, width=16))

    root = f"{tmp_path}/media"
    batch = spark.createDataFrame(
        [(1, png(1)), (2, png(2)), (3, b"just text bytes " * 4)],
        "doc_id long, payload binary",
    )
    smedia.fold_batch(spark, batch, root)
    smedia.fold_batch(
        spark,
        batch.unionByName(
            spark.createDataFrame([(4, png(4))], "doc_id long, payload binary")
        ),
        root,
    )
    erasure.erase_ids(spark, root, spark.createDataFrame([(1,)], "id long"))
    smedia.purge_erased(spark, root)
    assert len(captured_writes) >= 4  # the sweep must really intercept
    assert not _lint_captured(captured_writes), _lint_captured(captured_writes)
