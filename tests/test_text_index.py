"""Persisted inverted index (operators/text_index.py): search ≡ the
per-query BM25 operator exactly, partition-pruned posting reads, torn-
build crash story, and the join-free scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_feeds_spark import plans
from http_feeds_spark.operators import retrieval as rt
from http_feeds_spark.operators import text_index as ti

TERMS = ["window", "filter", "merge"]


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_search_equals_per_query_bm25(spark, sf_dir, tmp_path):
    """Same idf, same rounding, same tie-break — row for row, for both
    a multi-term and a single-term query, and k larger than hits."""
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    for terms, k in [(TERMS, 10), (["window"], 5), (["window", "nosuchterm"], 10)]:
        got = [tuple(r) for r in ti.search(spark, root, terms, k=k).collect()]
        want = [tuple(r) for r in rt.bm25_topk(docs, terms, k=k).collect()]
        assert got == want and len(got) > 0, terms


def test_unknown_terms_only_returns_empty(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    assert ti.search(spark, root, ["zzznope"], k=5).count() == 0


def test_posting_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The query terms' hash buckets must reach the posting scan as a
    PARTITION filter — only those bucket=N/ directories are read."""
    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    df = ti.search(spark, root, TERMS, k=10)
    p = plans.executed_plan(df)
    assert "PartitionFilters" in p, p
    pf = p.split("PartitionFilters", 1)[1][:200]
    assert "bucket" in pf, pf


def test_torn_build_reads_as_absent(spark, sf_dir, tmp_path):
    """postings/ + terms/ present but meta/ missing = torn build."""
    import shutil

    docs = _docs(spark, sf_dir)
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    shutil.rmtree(f"{root}/{ti.META_DIR}")
    with pytest.raises(FileNotFoundError):
        ti.search(spark, root, TERMS)
    assert ti.ensure_text_index(spark, docs, root) is True
    assert ti.search(spark, root, TERMS, k=3).count() == 3
    assert ti.ensure_text_index(spark, docs, root) is False
