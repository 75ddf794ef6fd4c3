"""SQL surface (http_feeds_spark/sql.py): every view answers spark.sql
exactly like the operator API, and the views are lazy plans (pushdown
reaches the scan through them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark import plans
from http_feeds_spark import sql as esql


def test_views_equal_operator_api(spark, sf_dir):
    names = esql.register_views(spark, sf_dir)
    assert "read_model" in names and "feed_history" in names

    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.sources.tables import events_as_feed, load_table

    f = events_as_feed(load_table(spark, sf_dir, "events"))

    got_rm = {
        (r.seq, r.subject)
        for r in spark.sql("SELECT seq, subject FROM read_model").collect()
    }
    want_rm = {
        (r.seq, r.subject) for r in ops.read_model(f).select("seq", "subject").collect()
    }
    assert got_rm == want_rm and len(got_rm) > 0

    # the SQL user's as-of query over the history view ≡ the read model
    # of the replay prefix — the A7b contract, through SQL
    t_mid = spark.sql(
        "SELECT timestamp_micros(CAST(percentile(unix_micros(time), 0.5) AS BIGINT)) t FROM feed"
    ).collect()[0].t
    got_asof = {
        (r.seq, r.subject)
        for r in spark.sql(
            f"""SELECT seq, subject FROM feed_history
                WHERE valid_from <= TIMESTAMP '{t_mid}'
                  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{t_mid}')"""
        ).collect()
    }
    want_asof = {
        (r.seq, r.subject)
        for r in ops.read_model(f.where(F.col("time") <= F.lit(t_mid)))
        .select("seq", "subject")
        .collect()
    }
    assert got_asof == want_asof and len(got_asof) > 0


def test_views_are_lazy_and_push_down(spark, sf_dir):
    """A filter through the `feed` view must reach the parquet scan —
    the view is a plan, not a materialization."""
    esql.register_views(spark, sf_dir)
    df = spark.sql("SELECT seq, subject FROM feed WHERE seq > 500")
    assert plans.has_pushed_filters(df), plans.executed_plan(df)
    assert df.count() > 0


def test_pipeline_views_equal_operator_api(spark, sf_dir):
    """The Group-D SQL surface (register_pipeline_views): chunks /
    data_card views return the operator's exact rows, and the documented
    bm25_scores summation reproduces bm25_topk number for number."""
    from http_feeds_spark.operators import chunking, datacard
    from http_feeds_spark.operators import retrieval as rt

    names = esql.register_pipeline_views(spark, sf_dir)
    assert set(names) == {
        "documents", "chunks", "data_card", "bm25_scores", "positional_postings"
    }
    docs = spark.table("documents")

    want_chunks = {
        tuple(r)
        for r in chunking.chunk_documents(docs).collect()
    }
    got_chunks = {
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_text FROM chunks"
        ).collect()
    }
    assert got_chunks == want_chunks and len(got_chunks) > 0

    want_card = {tuple(r) for r in datacard.data_card(docs).collect()}
    got_card = {tuple(r) for r in spark.sql("SELECT * FROM data_card").collect()}
    assert got_card == want_card

    terms = ["the", "data", "filter"]
    want_bm = [
        (r.doc_id, r.score, r.rank)
        for r in rt.bm25_topk(docs, terms, k=10).collect()
    ]
    got_bm = [
        (r.doc_id, r.score, i + 1)
        for i, r in enumerate(
            spark.sql(
                """
                SELECT doc_id,
                       CAST(ROUND(SUM(CAST(score AS DECIMAL(38,9))), 6) AS DOUBLE) AS score
                FROM bm25_scores
                WHERE term IN ('the', 'data', 'filter')
                GROUP BY doc_id
                ORDER BY score DESC, doc_id
                LIMIT 10
                """
            ).collect()
        )
    ]
    assert got_bm == want_bm and len(got_bm) == 10


def test_bm25_scores_view_is_lazy_and_term_filter_prunes(spark, sf_dir):
    """Registration materializes nothing, and a term predicate reaches
    below the aggregates: the filtered plan carries the term filter on
    the explode side (query-sized shuffle, the bm25_topk shape)."""
    esql.register_pipeline_views(spark, sf_dir)
    p = (
        spark.sql("SELECT * FROM bm25_scores WHERE term = 'the'")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    # the term filter must sit below the (doc_id, term) aggregate —
    # i.e. appear as a Filter over the exploded tokens, not only a
    # post-aggregation filter
    agg_pos = p.find("Aggregate")
    assert agg_pos != -1
    assert re.search(r"Filter .*the.*", p[agg_pos:]), p


def test_sql_search_functions_equal_operators(spark, sf_dir, tmp_path):
    """r9: the parameterized searches are spark.sql-REACHABLE — a SQL
    user passes terms as function arguments and gets the operator's
    exact answers (bm25: bit-exact incl. the decimal summation recipe;
    phrase: shifted-intersection == the positional-index operator on the
    same corpus; unordered proximity: the windowed-join sweep == the
    running-max operator)."""
    from http_feeds_spark.operators import retrieval as rt
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.sources.tables import load_table

    esql.register_pipeline_views(spark, sf_dir)
    fns = esql.register_search_functions(spark)
    assert set(fns) == {
        "bm25_search", "phrase_search", "proximity_search", "proximity_search_any",
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    ti.build_text_index(spark, docs, root)

    # bm25: SQL fn == the per-query operator (bit-exact scores)
    got = [
        (r.doc_id, r.score, r.rank)
        for r in spark.sql(
            "SELECT * FROM bm25_search(array('window', 'filter', 'merge'), 10)"
        ).collect()
    ]
    want = [
        (r.doc_id, r.score, r.rank)
        for r in rt.bm25_topk(docs, ["window", "filter", "merge"], k=10).collect()
    ]
    assert got == want and len(got) == 10

    # phrase: SQL fn == the positional-index operator, including a
    # multi-word term (tokenize_query expansion inside the SQL)
    for phrase in (["window", "filter"], ["window filter"]):
        got_p = [
            (r.doc_id, r.n_matches)
            for r in spark.sql(
                "SELECT doc_id, n_matches FROM phrase_search("
                + "array(" + ",".join(f"'{t}'" for t in phrase) + "), 20)"
            ).collect()
        ]
        want_p = [
            (r.doc_id, r.n_matches)
            for r in ti.phrase_search(spark, root, phrase, k=20).collect()
        ]
        assert got_p == want_p and len(got_p) > 0, phrase

    # unordered proximity: SQL sweep == the running-max operator
    got_x = [
        (r.doc_id, r.n_matches, r.best_span, r.score)
        for r in spark.sql(
            "SELECT doc_id, n_matches, best_span, score "
            "FROM proximity_search_any(array('window', 'merge'), 2, 20)"
        ).collect()
    ]
    want_x = [
        (r.doc_id, r.n_matches, r.best_span, r.score)
        for r in ti.proximity_search_any(spark, root, ["window", "merge"], slop=2, k=20).collect()
    ]
    assert got_x == want_x and len(got_x) > 0

    # terms that analyze to nothing: empty result, not an error
    assert spark.sql("SELECT * FROM bm25_search(array('...'), 5)").count() == 0
    assert spark.sql("SELECT * FROM phrase_search(array('...'), 5)").count() == 0
    assert spark.sql("SELECT * FROM proximity_search(array('...'), 1, 5)").count() == 0


def test_sql_ordered_proximity_equals_operator_at_every_slop(spark, sf_dir, tmp_path):
    """r10: the ORDERED proximity walk is SQL-callable — the HOF fold is
    the operator's greedy earliest-next walk, value-exact at every slop
    (slop=0 degenerates to adjacency, larger slops admit more starts),
    including a multi-word term expanding the phrase through the
    analyzer."""
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.sources.tables import load_table

    esql.register_pipeline_views(spark, sf_dir)
    esql.register_search_functions(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    ti.build_text_index(spark, docs, root)

    for terms in (["window", "merge"], ["window filter"], ["window"]):
        arr = "array(" + ",".join(f"'{t}'" for t in terms) + ")"
        for slop in (0, 1, 2, 5):
            got = [
                (r.doc_id, r.n_matches, r.best_span, r.score)
                for r in spark.sql(
                    "SELECT doc_id, n_matches, best_span, score "
                    f"FROM proximity_search({arr}, {slop}, 20)"
                ).collect()
            ]
            want = [
                (r.doc_id, r.n_matches, r.best_span, r.score)
                for r in ti.proximity_search(
                    spark, root, terms, slop=slop, k=20
                ).collect()
            ]
            assert got == want, (terms, slop)
    # at least one probed combination must actually match
    assert spark.sql(
        "SELECT * FROM proximity_search(array('window','merge'), 5, 20)"
    ).count() > 0


def test_sql_proximity_is_the_linear_sweep_not_a_self_join(spark, sf_dir):
    """r10: the SQL proximity body is the operator's running-max sweep —
    the corpus relation appears ONCE in the optimized plan (the r9 form
    self-joined the occurrence rows: two corpus scans, per-doc quadratic
    pair blowup on long documents with frequent terms)."""
    esql.register_pipeline_views(spark, sf_dir)
    esql.register_search_functions(spark)
    df = spark.sql("SELECT * FROM proximity_search_any(array('window','merge'), 2, 10)")
    p = df._jdf.queryExecution().optimizedPlan().toString()
    # each corpus read tokenizes through one regexp_extract_all +
    # posexplode generator — exactly one of each means one corpus scan
    assert p.count("posexplode") == 1, p
    # OneRowRelation rows are the model-sized q/m scalar subqueries;
    # real table scans print as "Relation [...]" — exactly one
    assert p.count("Relation [") == 1, p
    assert df.count() > 0  # and the linear form still finds matches


def test_pipeline_views_thread_the_analyzer(spark, sf_dir, tmp_path):
    """r10 (r9 ADVICE): register_pipeline_views takes the analyzer and
    threads it through BOTH analyzed views, so a non-default analyzer's
    SQL functions query views tokenized the SAME way — pinned against
    the operator under that analyzer."""
    import pytest

    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.sources.tables import load_table

    with pytest.raises(ValueError, match="analyzer"):
        esql.register_pipeline_views(spark, sf_dir, analyzer="nope")

    esql.register_pipeline_views(spark, sf_dir, analyzer="whitespace_lower")
    esql.register_search_functions(spark, analyzer="whitespace_lower")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx_wsl")
    ti.build_text_index(spark, docs, root, analyzer="whitespace_lower")
    got = [
        (r.doc_id, r.n_matches, r.best_span, r.score)
        for r in spark.sql(
            "SELECT doc_id, n_matches, best_span, score "
            "FROM proximity_search_any(array('window', 'merge'), 2, 20)"
        ).collect()
    ]
    want = [
        (r.doc_id, r.n_matches, r.best_span, r.score)
        for r in ti.proximity_search_any(
            spark, root, ["window", "merge"], slop=2, k=20
        ).collect()
    ]
    assert got == want and len(got) > 0
    # restore the default-analyzer views for any later test in the session
    esql.register_pipeline_views(spark, sf_dir)
    esql.register_search_functions(spark)


def test_search_functions_refuse_analyzer_mismatch(spark, sf_dir):
    """r11 (r10 ADVICE): the views' analyzer is recorded at registration
    and register_search_functions VERIFIES it — a mismatch silently
    tokenized the query side differently from the corpus views and
    returned wrong results with no error; now it refuses loudly. An
    unregistered session refuses too (there are no views to query)."""
    import pytest

    esql.register_pipeline_views(spark, sf_dir, analyzer="whitespace_lower")
    with pytest.raises(ValueError, match="registered with 'whitespace_lower'"):
        esql.register_search_functions(spark, analyzer="standard")
    # matching analyzer registers fine
    esql.register_search_functions(spark, analyzer="whitespace_lower")

    # a session that never registered the views has nothing to verify
    # against — refuse with the ordering remedy
    spark.conf.unset(esql.PIPELINE_ANALYZER_CONF)
    with pytest.raises(RuntimeError, match="register_pipeline_views"):
        esql.register_search_functions(spark)

    # restore the default-analyzer surfaces for any later test
    esql.register_pipeline_views(spark, sf_dir)
    esql.register_search_functions(spark)
