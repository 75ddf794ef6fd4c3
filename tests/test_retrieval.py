"""BM25 lexical retrieval (operators/retrieval.py): full DuckDB parity
for the registered query's exact shape (formula, decimal partial-sum,
rounding, tie-break), ranking sanity on planted documents, and the plan
properties that make it scale (query-sized shuffle, broadcast idf join,
TakeOrderedAndProject top-k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark import plans
from http_feeds_spark.operators import retrieval as rt
from http_feeds_spark.queries.llm import BM25_K, BM25_QUERY_TERMS
from tests.oracle_harness import compare


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_bm25_duckdb_parity(spark, sf_dir):
    """The registered query against the identical BM25 computed by
    DuckDB — exact value/row/column match under the driver-style strict
    compare (this is q_llm_bm25's oracle; it is rows-only at the driver
    because the 50 oracle slots are taken)."""
    df = rt.bm25_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, k=BM25_K)
    sql = rt.bm25_oracle_sql(BM25_QUERY_TERMS, k=BM25_K)
    report = compare(df, sql, sf_dir)
    assert report["match"], report


def test_bm25_ranks_planted_doc_first(spark):
    """A document saturated with the query terms must outrank docs that
    mention them once, and a doc with none of the terms must not appear."""
    spark_docs = spark.createDataFrame(
        [
            (1, "spark spark spark merge merge window"),
            (2, "spark is one word here amid much other filler text padding"),
            (3, "nothing relevant in this one at all"),
            (4, "merge window"),
        ],
        "doc_id long, text string",
    )
    out = rt.bm25_topk(spark_docs, ["spark", "merge", "window"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] in (1, 4)  # both are term-dense; 3 must be absent
    assert 3 not in ids
    assert len(ids) == 3
    # scores strictly ordered by construction of rank
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_query_hits(spark):
    """Terms absent from the corpus yield an empty, correctly-typed
    result (no division by zero, no crash)."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = rt.bm25_topk(docs, ["zzz_not_there"], k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "rank"]


def test_bm25_plan_shape(spark, sf_dir):
    """Scale contract: the idf join broadcasts the tiny term table, the
    top-k is TakeOrderedAndProject (never a global sort), and the term
    filter sits below the postings aggregation so the only corpus-wide
    stage is the scan itself."""
    df = rt.bm25_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, k=BM25_K)
    assert plans.is_broadcast_join(df)
    assert plans.is_take_ordered(df)
    root = plans.physical_root(df)
    # the Filter on term must be a descendant of the first (postings)
    # HashAggregate — i.e. the aggregation consumes pre-filtered rows
    aggs = plans.find_nodes(root, lambda n: n == "HashAggregate")
    assert aggs, plans.executed_plan(df)
    post_agg_filters = plans.find_nodes(
        aggs[-1], lambda n: n == "Filter"
    )  # deepest agg = postings partial agg side
    assert any(
        "term" in plans.node_line(f) for f in post_agg_filters
    ), plans.executed_plan(df)


def test_registered_query_is_wired(spark, sf_dir):
    from http_feeds_spark.queries import registry

    q = registry()["q_llm_bm25"]
    # r14 slot rotation: driver-oracle-checked (bm25_oracle_sql)
    assert q.oracle is not None and "ROW_NUMBER" in q.oracle
    out = q.fn(spark, sf_dir)
    n = out.count()
    assert 0 < n <= BM25_K


def test_chunk_search_provenance_and_term_presence(spark, sf_dir):
    """The composed chunk-level retrieval (q_llm_chunk_search): every
    hit's provenance must point at a real chunk whose text contains at
    least one query term (BM25 scores > 0 only where a term occurs),
    ranks must be dense from 1, and the result deterministic."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators import chunking as ck
    from http_feeds_spark.queries import registry
    from http_feeds_spark.sources.tables import load_table

    fn = registry()["q_llm_chunk_search"].fn
    hits = fn(spark, sf_dir).collect()
    assert len(hits) == 10
    assert [r.rank for r in hits] == list(range(1, 11))
    assert all(r.score > 0 for r in hits)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunk_map = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in ck.chunk_documents(docs, size=32, overlap=4).collect()
    }
    for r in hits:
        text = chunk_map[(r.doc_id, r.chunk_idx)]
        assert any(t in text.split(" ") for t in ("window", "filter", "merge")), r

    again = fn(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in hits]


def test_hybrid_rrf_arithmetic_and_shape(spark, sf_dir):
    """q_llm_hybrid_search: RRF score must equal 1/(60+lex) + 1/(60+sem)
    with absent ranks contributing 0; ranks dense; deterministic."""
    from http_feeds_spark.queries import registry

    fn = registry()["q_llm_hybrid_search"].fn
    rows = fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (60 + r.lex_rank)
        if r.sem_rank is not None:
            want += 1.0 / (60 + r.sem_rank)
        assert abs(r.rrf_score - round(want, 9)) < 1e-12, r
    again = fn(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
