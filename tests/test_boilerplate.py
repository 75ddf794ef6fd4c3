"""Corpus-frequency boilerplate removal (operators/boilerplate.py):
full DuckDB value parity for the registered query's shape (frames,
frequency gate, reconstructed text), planted-header semantics on a
hand-built corpus, round-trip identity for clean docs, and the plan
properties that make it scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark import plans
from http_feeds_spark.operators import boilerplate as bp
from http_feeds_spark.queries.llm import BOILERPLATE_HEADER
from tests.oracle_harness import compare

HDR = BOILERPLATE_HEADER


def _planted(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit(HDR + " "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def test_duckdb_parity_including_text(spark, sf_dir):
    """The whole operator — including the reconstructed clean_text —
    against the identical computation in DuckDB, driver-strict compare.
    (q_llm_boilerplate is rows-only at the driver: slots are taken.)"""
    df = bp.strip_frequent_segments(_planted(spark, sf_dir), n=10, min_docs=5)
    sql = bp.strip_oracle_sql(
        "SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN '"
        + HDR
        + " ' || text ELSE text END AS text FROM documents",
        n=10,
        min_docs=5,
    )
    report = compare(df, sql, sf_dir)
    assert report["match"], report


def test_planted_header_removed_others_roundtrip(spark, sf_dir):
    """Every planted doc loses exactly its header frame; every clean doc
    reconstructs byte-identically (the frequency gate must not touch
    unique content)."""
    docs = _planted(spark, sf_dir)
    out = bp.strip_frequent_segments(docs, n=10, min_docs=5)
    joined = {r.doc_id: r for r in out.join(docs, "doc_id").collect()}
    assert len(joined) > 0
    for doc_id, r in joined.items():
        if doc_id % 7 == 0:
            assert r.n_removed >= 1
            assert not r.clean_text.startswith("bp0 ")
            # tail tokens (beyond the aligned frames of the original
            # text) may straddle frames, but the header frame is gone
            assert HDR not in r.clean_text
        else:
            assert r.n_removed == 0
            assert r.clean_text == r.text  # exact round-trip


def test_handbuilt_corpus_semantics(spark):
    """min_docs boundary + full-document removal + in-order reassembly
    on a corpus small enough to reason about by hand (n=2 frames)."""
    docs = spark.createDataFrame(
        [
            (1, "x y a b c d"),   # frames: "x y" | "a b" | "c d"
            (2, "x y p q"),       # "x y" | "p q"
            (3, "x y"),           # "x y"  -> fully removed
            (4, "u v w"),         # "u v" | "w"   -> untouched
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bp.strip_frequent_segments(docs, n=2, min_docs=3).collect()}
    assert out[1].clean_text == "a b c d" and out[1].n_removed == 1
    assert out[2].clean_text == "p q"
    assert out[3].clean_text == "" and out[3].n_chars_clean == 0
    assert out[4].clean_text == "u v w" and out[4].n_removed == 0
    # min_docs=5 would keep everything: "x y" only recurs in 3 docs
    out5 = {r.doc_id: r for r in bp.strip_frequent_segments(docs, n=2, min_docs=5).collect()}
    assert all(r.n_removed == 0 for r in out5.values())


def test_plan_shape(spark, sf_dir):
    """Scale contract: the frequency aggregate is map-side-combined
    (partial + final HashAggregate on the 16-hex hash), and no
    CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    df = bp.strip_frequent_segments(_planted(spark, sf_dir), n=10, min_docs=5)
    root = plans.physical_root(df)
    names = plans.subtree_names(root)
    assert "CartesianProduct" not in names and "BroadcastNestedLoopJoin" not in names
    assert names.count("HashAggregate") >= 2  # partial+final freq count


def test_registered_query_is_wired(spark, sf_dir):
    from http_feeds_spark.queries import registry

    q = registry()["q_llm_boilerplate"]
    # r14 slot rotation: driver-oracle-checked (the wrapped strip_oracle_sql)
    assert q.oracle is not None and "n_chars_clean" in q.oracle
    rows = {r.doc_id: r for r in q.fn(spark, sf_dir).collect()}
    assert rows and all(
        (r.n_removed >= 1) == (doc_id % 7 == 0) for doc_id, r in rows.items()
    )
