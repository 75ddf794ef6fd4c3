"""SQL surface — register the engine's tables and derived feed views so
everything the DataFrame API serves is equally reachable from
``spark.sql`` (SURVEY §2's B-group is ANSI-expressible by construction;
this makes the A-group feed semantics first-class SQL objects too).

Views (TEMP, session-scoped — no catalog pollution):

    region nation customer supplier part orders lineitem events
    documents embeddings          — the driver tables, via load_table
                                    (ts normalization included)
    feed                          — events as the CloudEvents envelope
    feed_compacted                — latest entry per subject (A5)
    read_model                    — compaction minus tombstones (A7)
    feed_history                  — SCD-2 validity intervals (A7b);
                                    as-of-T = WHERE valid_from <= T
                                    AND (valid_to IS NULL OR valid_to > T)

Views are lazy plans, not materializations: a SQL query against
``read_model`` compiles to exactly the operator pipeline's plan
(same window, same pushdowns) — pinned in tests/test_sql_surface.py by
plan-for-plan result equality with the operator API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from http_feeds_spark.operators import feed as ops
from http_feeds_spark.schema import TABLE_NAMES
from http_feeds_spark.sources.tables import events_as_feed, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create/replace the session views; returns the registered names."""
    names = []
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    f = events_as_feed(load_table(spark, sf_dir, "events"))
    f.createOrReplaceTempView("feed")
    ops.compact(f).createOrReplaceTempView("feed_compacted")
    ops.read_model(f).createOrReplaceTempView("read_model")
    ops.history_scd2(f).createOrReplaceTempView("feed_history")
    names += ["feed", "feed_compacted", "read_model", "feed_history"]
    return names


def register_pipeline_views(
    spark: SparkSession,
    sf_dir: str,
    *,
    chunk_size: int = 64,
    chunk_overlap: int = 8,
) -> list[str]:
    """Expose the Group-D pipeline surface to ``spark.sql`` (the same
    lazy-view contract as :func:`register_views` — nothing materializes
    at registration):

        chunks       — chunk_documents(documents): (doc_id, chunk_idx,
                       start_tok, n_tok, chunk_text); RAG/window prep
        data_card    — the corpus data card rollup (NULL dims are the
                       rollup margins, per the operator)
        bm25_scores  — per-(doc, term) BM25 components over the full
                       vocabulary; filter terms + the documented decimal
                       summation reproduces bm25_topk exactly (see
                       retrieval.bm25_term_scores for the recipe)

    SQL-vs-operator result equality is pinned in
    tests/test_sql_surface.py. Assumes/refreshes the ``documents`` view
    (register_views also creates it)."""
    from http_feeds_spark.operators import chunking, datacard, retrieval

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    chunking.chunk_documents(docs, chunk_size, chunk_overlap).createOrReplaceTempView(
        "chunks"
    )
    datacard.data_card(docs).createOrReplaceTempView("data_card")
    retrieval.bm25_term_scores(docs).createOrReplaceTempView("bm25_scores")
    return ["documents", "chunks", "data_card", "bm25_scores"]
