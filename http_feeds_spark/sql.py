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
    analyzer: str = "standard",
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
    (register_views also creates it). ``analyzer`` threads through to
    BOTH analyzed views (``bm25_scores``, ``positional_postings``) and
    is RECORDED in the session (:data:`PIPELINE_ANALYZER_CONF`);
    :func:`register_search_functions` verifies it matches and refuses
    loudly on mismatch, so the query and corpus sides can never
    silently tokenize differently."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.operators import chunking, datacard, retrieval

    tx._require_analyzer(analyzer)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    chunking.chunk_documents(docs, chunk_size, chunk_overlap).createOrReplaceTempView(
        "chunks"
    )
    datacard.data_card(docs).createOrReplaceTempView("data_card")
    retrieval.bm25_term_scores(docs, analyzer=analyzer).createOrReplaceTempView(
        "bm25_scores"
    )
    # (doc_id, pos, term) occurrence rows under the shared analyzer —
    # the base relation the positional SQL search functions query
    docs.select(
        F.col("doc_id"),
        F.posexplode(tx.analyze("text", analyzer)).alias("pos", "term"),
    ).createOrReplaceTempView("positional_postings")
    # record the views' analyzer in the session so
    # register_search_functions can VERIFY it matches (the index-meta
    # conformance pattern) — a docstring alone let mismatched analyzers
    # silently tokenize the query side differently from the corpus views
    spark.conf.set(PIPELINE_ANALYZER_CONF, analyzer)
    return ["documents", "chunks", "data_card", "bm25_scores", "positional_postings"]


# session-conf key recording which analyzer register_pipeline_views
# built its analyzed views with (the conformance handshake below)
PIPELINE_ANALYZER_CONF = "spark.http_feeds_spark.pipelineViews.analyzer"


def _sql_analyze_tokens(terms_expr: str, analyzer: str) -> str:
    """The SQL twin of functions/text.tokenize_query over an
    ARRAY<STRING> expression: each element re-tokenizes under the
    analyzer and the flat in-order token array comes back — so a SQL
    query term 'Don''t' matches exactly how the corpus side was
    analyzed. Spark/Java regex; equivalence with the Python/DataFrame
    twins is pinned in tests/test_sql_surface.py."""
    from http_feeds_spark.functions import text as tx

    tx._require_analyzer(analyzer)
    if analyzer == "standard_porter":
        # stemming is a Python-side chain (text.porter_stem), not a SQL
        # expression — the SQL function bodies cannot stem query terms,
        # so silently registering them would tokenize queries
        # differently from the corpus views. Refuse with the remedy.
        raise ValueError(
            "analyzer 'standard_porter' is not SQL-expressible (Porter "
            "stemming runs as a pandas UDF); use the DataFrame search "
            "operators, or register the SQL surface with a regex analyzer"
        )
    if analyzer == "standard":
        extract = "regexp_extract_all(lower(t), '[\\\\p{L}\\\\p{N}]+', 0)"
    elif analyzer == "whitespace_lower":
        extract = "regexp_extract_all(lower(t), '[^ ]+', 0)"
    else:  # whitespace
        extract = "regexp_extract_all(t, '[^ ]+', 0)"
    return f"flatten(transform({terms_expr}, t -> {extract}))"


def register_search_functions(spark: SparkSession, analyzer: str = "standard") -> list[str]:
    """Make the parameterized searches ``spark.sql``-REACHABLE — a
    SQL-first user issues a query with terms as arguments, no Python in
    the loop (closes the r8 gap where only fixed views existed):

        SELECT * FROM bm25_search(array('window', 'filter'), 10)
        SELECT * FROM phrase_search(array('window filter merge'), 5)
        SELECT * FROM proximity_search(array('window','merge'), 2, 5)
        SELECT * FROM proximity_search_any(array('window','merge'), 2, 5)

    SQL table functions (Spark 4 ``CREATE TEMPORARY FUNCTION ... RETURNS
    TABLE``) over the lazy pipeline views, so everything stays one
    Catalyst plan — no UDTF, no Python worker, no materialization at
    registration. Query terms pass through the SAME analyzer as the
    corpus side inside the SQL itself (:func:`_sql_analyze_tokens`).
    ``LIMIT`` cannot take a function argument, so top-k is the rank
    window + ``rank <= k`` filter — the same (score desc, doc_id asc)
    contract as the operators.

    Semantics ≡ the operators, pinned in tests/test_sql_surface.py:
    ``bm25_search`` reproduces retrieval.bm25_topk exactly (same 9-dp
    decimal partial-sum recipe over the ``bm25_scores`` view);
    ``phrase_search`` is the arity-agnostic shifted-intersection — a
    start s matches when every phrase offset i has its token at s+i
    (GROUP BY (doc, pos−i) HAVING COUNT(DISTINCT i) = m) — equal to the
    positional-index operator on the same corpus; ``proximity_search_any``
    is the SAME linear running-max sweep as the operator
    (text_index.proximity_search_any): occurrence rows cross-joined
    against the m query terms (model-sized — m rows), one running
    ``MAX(pos) OVER (PARTITION BY doc, query-term ORDER BY pos ROWS
    UNBOUNDED PRECEDING)`` per pair, minimal window ending at p spans
    p − min(last_t). ONE pass over the occurrences, ONE doc_id
    exchange, NO occurrence-to-occurrence join — the r9 form was a
    positional self-join that degraded toward per-doc quadratic on
    long documents with frequent terms; the plan guard in
    tests/test_sql_surface.py pins the corpus is scanned once.
    ``proximity_search`` (ORDERED, new r10) is the operator's greedy
    earliest-next walk itself, arity-agnostic through SQL higher-order
    functions: per (doc, phrase-offset) the term's sorted position
    array is collected (the posting-list shape), and each start p0 of
    the first term folds ``aggregate(slice(arrs, 2, m−1), p0,
    (acc, a) -> array_min(filter(a.ps, x -> x > acc)))`` — the i-th
    term takes its earliest position after the (i−1)-th, exactly
    text_index.proximity_search's codegen'd array walk, with NULL
    (no such position) propagating through the fold. One corpus scan,
    one doc_id exchange, no self-join; the HOF reads materialized
    ARRAY COLUMNS (aggregation output), not re-inlined expression
    trees, so the r9 winnowing blowup shape cannot recur here.

    Requires :func:`register_pipeline_views` (the ``bm25_scores`` and
    ``positional_postings`` views) registered with the SAME analyzer —
    ENFORCED, not advisory: registration refuses when the views are
    absent or were registered under a different analyzer (the
    index-meta conformance pattern; a silent mismatch would tokenize
    the query side differently from the corpus and return wrong search
    results with no error). A query that analyzes to zero tokens
    returns zero rows (the operator raises — SQL functions prefer
    empty over error)."""
    # analyzer validation first (unknown / non-SQL-expressible raise
    # their own remedies regardless of registration order) ...
    toks = _sql_analyze_tokens("terms", analyzer)
    phrase_toks = _sql_analyze_tokens("phrase", analyzer)
    # ... then the conformance handshake with the registered views
    recorded = spark.conf.get(PIPELINE_ANALYZER_CONF, None)
    if recorded is None:
        raise RuntimeError(
            "register_pipeline_views has not run in this session; the "
            "search functions query its views — register them first "
            "(with the same analyzer)"
        )
    if recorded != analyzer:
        raise ValueError(
            f"SQL search functions requested analyzer '{analyzer}' but "
            f"the pipeline views were registered with '{recorded}'; "
            "re-register both surfaces with the same analyzer"
        )

    spark.sql(f"""
      CREATE OR REPLACE TEMPORARY FUNCTION bm25_search(terms ARRAY<STRING>, k INT)
      RETURNS TABLE (doc_id BIGINT, score DOUBLE, rank INT)
      RETURN
      WITH q AS (SELECT DISTINCT explode({toks}) AS term),
      scored AS (
        SELECT doc_id,
               CAST(ROUND(SUM(CAST(score AS DECIMAL(38,9))), 6) AS DOUBLE) AS score
        FROM bm25_scores WHERE term IN (SELECT term FROM q)
        GROUP BY doc_id
      )
      SELECT doc_id, score, rank FROM (
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
        FROM scored
      ) WHERE rank <= k
    """)

    spark.sql(f"""
      CREATE OR REPLACE TEMPORARY FUNCTION phrase_search(phrase ARRAY<STRING>, k INT)
      RETURNS TABLE (doc_id BIGINT, n_matches INT, rank INT)
      RETURN
      WITH q AS (SELECT posexplode({phrase_toks}) AS (i, term)),
      starts AS (
        SELECT p.doc_id, p.pos - q.i AS start
        FROM positional_postings p JOIN q ON p.term = q.term
        GROUP BY p.doc_id, p.pos - q.i
        HAVING COUNT(DISTINCT q.i) = (SELECT COUNT(*) FROM q)
      ),
      hits AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_matches FROM starts GROUP BY doc_id
      )
      SELECT doc_id, n_matches, rank FROM (
        SELECT doc_id, n_matches,
               CAST(ROW_NUMBER() OVER (ORDER BY n_matches DESC, doc_id ASC) AS INT) AS rank
        FROM hits
      ) WHERE rank <= k
    """)

    spark.sql(f"""
      CREATE OR REPLACE TEMPORARY FUNCTION proximity_search_any(
        terms ARRAY<STRING>, slop INT, k INT)
      RETURNS TABLE (doc_id BIGINT, n_matches INT, best_span INT, score DOUBLE, rank INT)
      RETURN
      WITH q AS (SELECT DISTINCT explode({toks}) AS term),
      m AS (SELECT COUNT(*) AS m FROM q),
      occ AS (
        SELECT p.doc_id, p.term, p.pos
        FROM positional_postings p JOIN q ON p.term = q.term
      ),
      -- the operator's linear sweep: each occurrence row fans out to
      -- the m query terms (a model-sized cross join, never occ × occ)
      -- and last_t(p) is ONE running max per (doc, query-term) — so a
      -- doc with t occurrences costs t·m window rows, not t² pairs
      swept AS (
        SELECT o.doc_id, o.pos, qt.term AS qterm,
               MAX(CASE WHEN o.term = qt.term THEN o.pos END) OVER (
                 PARTITION BY o.doc_id, qt.term ORDER BY o.pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_t
        FROM occ o CROSS JOIN q qt
      ),
      -- the function argument (slop) may only appear in WHERE/HAVING
      -- inside a SQL function body, so the span test lives in HAVING;
      -- COUNT(last_t) = m is the all-terms-seen test (nulls = unseen)
      spans AS (
        SELECT doc_id, pos AS p, CAST(pos - MIN(last_t) AS INT) AS span
        FROM swept GROUP BY doc_id, pos
        HAVING COUNT(last_t) = (SELECT m FROM m)
           AND pos - MIN(last_t) <= (SELECT m FROM m) - 1 + slop
      ),
      hits AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_matches,
               CAST(MIN(span) AS INT) AS best_span,
               ROUND(SUM(CAST(1.0 AS DOUBLE)
                         / (CAST(1.0 AS DOUBLE) + span - (SELECT m - 1 FROM m))),
                     6) AS score
        FROM spans GROUP BY doc_id
      )
      SELECT doc_id, n_matches, best_span, score, rank FROM (
        SELECT doc_id, n_matches, best_span, CAST(score AS DOUBLE) AS score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
        FROM hits
      ) WHERE rank <= k
    """)

    spark.sql(f"""
      CREATE OR REPLACE TEMPORARY FUNCTION proximity_search(
        terms ARRAY<STRING>, slop INT, k INT)
      RETURNS TABLE (doc_id BIGINT, n_matches INT, best_span INT, score DOUBLE, rank INT)
      RETURN
      WITH q AS (SELECT posexplode({toks}) AS (i, term)),
      m AS (SELECT COUNT(*) AS m FROM q),
      occ AS (
        SELECT p.doc_id, q.i, p.pos
        FROM positional_postings p JOIN q ON p.term = q.term
      ),
      -- per (doc, phrase offset): the term's sorted position list —
      -- the posting-list shape the operator's walk consumes
      byoff AS (
        SELECT doc_id, i, array_sort(collect_list(pos)) AS ps
        FROM occ GROUP BY doc_id, i
      ),
      -- docs carrying ALL m offsets, position lists ordered by offset
      darr AS (
        SELECT doc_id, array_sort(collect_list(struct(i, ps))) AS arrs
        FROM byoff GROUP BY doc_id
        HAVING COUNT(*) = (SELECT m FROM m)
      ),
      -- the greedy earliest-next walk from every start of term 0: the
      -- fold advances through offsets 1..m-1, each taking its earliest
      -- position strictly after the previous; NULL (dead end) sticks.
      -- slop may only appear in WHERE/HAVING inside a function body,
      -- so spans explode unfiltered and the window test sits below
      spans AS (
        SELECT doc_id, span FROM (
          SELECT doc_id,
                 explode(transform(arrs[0].ps, p0 ->
                   aggregate(slice(arrs, 2, size(arrs) - 1), p0,
                             (acc, a) -> array_min(filter(a.ps, x -> x > acc)))
                   - p0)) AS span
          FROM darr
        )
        WHERE span IS NOT NULL AND span <= (SELECT m FROM m) - 1 + slop
      ),
      hits AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_matches,
               CAST(MIN(span) AS INT) AS best_span,
               ROUND(SUM(CAST(1.0 AS DOUBLE)
                         / (CAST(1.0 AS DOUBLE) + span - (SELECT m - 1 FROM m))),
                     6) AS score
        FROM spans GROUP BY doc_id
      )
      SELECT doc_id, n_matches, best_span, score, rank FROM (
        SELECT doc_id, n_matches, best_span, CAST(score AS DOUBLE) AS score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
        FROM hits
      ) WHERE rank <= k
    """)
    return [
        "bm25_search",
        "phrase_search",
        "proximity_search",
        "proximity_search_any",
    ]
