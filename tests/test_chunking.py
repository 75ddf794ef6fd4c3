"""Chunking (operators/chunking.py): DuckDB value parity including the
chunk text, reconstruction/coverage invariants, and edge shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.operators import chunking as ck
from tests.oracle_harness import compare


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_chunks_match_duckdb(spark, sf_dir):
    got = ck.chunk_documents(_docs(spark, sf_dir), size=32, overlap=4)
    r = compare(got, ck.chunk_oracle_sql(size=32, overlap=4), sf_dir)
    assert r["match"], {k: v for k, v in r.items() if k != "first_diffs"}


def test_coverage_and_reconstruction(spark, sf_dir):
    """Every token is covered; stride-concatenation of the non-overlap
    prefixes reconstructs the document exactly; chunk indices are dense
    from 0."""
    docs = _docs(spark, sf_dir).limit(50)
    size, overlap = 32, 4
    stride = size - overlap
    chunks = ck.chunk_documents(docs, size=size, overlap=overlap)

    # reconstruction: first `stride` tokens of each chunk + the final
    # chunk's tail — equivalently, tokens [start, start+stride) per
    # chunk plus the remainder — must re-join to the original text
    from pyspark.sql import Window as W

    last_idx = F.max("chunk_idx").over(W.partitionBy("doc_id"))
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.when(
                F.col("chunk_idx") == last_idx, F.col("chunk_text")
            ).otherwise(
                F.concat_ws(
                    " ", F.slice(F.split("chunk_text", " "), 1, stride)
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", F.col("piece").alias("p")))
                    ),
                    lambda s: s["p"],
                ),
            ).alias("rebuilt")
        )
    )
    diff = (
        rebuilt.join(docs, "doc_id")
        .where(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert diff == 0

    idx = chunks.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"),
        F.max("chunk_idx").alias("hi"),
        F.count("*").alias("n"),
    )
    bad = idx.where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count()
    assert bad == 0


def test_short_doc_single_chunk_and_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"w{i}" for i in range(70)))],
        "doc_id long, text string",
    )
    rows = ck.chunk_documents(docs, size=64, overlap=8).collect()
    short = [r for r in rows if r.doc_id == 1]
    assert len(short) == 1 and short[0].chunk_text == "a b c" and short[0].n_tok == 3
    long = sorted((r for r in rows if r.doc_id == 2), key=lambda r: r.chunk_idx)
    assert len(long) == 2
    assert long[0].n_tok == 64 and long[1].start_tok == 56 and long[1].n_tok == 14

    with pytest.raises(ValueError):
        ck.chunk_documents(docs, size=8, overlap=8)


def test_chunking_is_map_only(spark, sf_dir):
    from http_feeds_spark import plans

    out = ck.chunk_documents(_docs(spark, sf_dir))
    assert plans.shuffle_count(out) == 0, plans.executed_plan(out)
