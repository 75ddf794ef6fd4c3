"""BM25 full-text retrieval over a document corpus — the lexical
counterpart of the embedding ANN path (SURVEY §2 D3; the reference spec
defines no search surface, so this is extension-level, like all of
Group D).

A training-data pipeline needs lexical top-k retrieval for
decontamination audits ("which corpus docs match this eval question"),
quality forensics, and hybrid (BM25 + dense) mining. The shape is the
classic inverted index expressed as DataFrames:

    postings:  explode tokens -> (term, doc_id, tf)   [one shuffle]
    query:     a handful of terms                      [broadcast]
    score:     Lucene-style BM25 per (doc, term), summed per doc
    top-k:     TakeOrderedAndProject

100 TB posture:
- The query-term filter lands BEFORE the postings aggregation, so the
  shuffle carries only rows whose term is in the (tiny) query set —
  the scan is the only full-corpus pass, everything after is
  query-sized.
- Corpus statistics (N, total token length) are ONE scalar aggregate;
  per-term document frequencies are one aggregate over the filtered
  postings (<= |query| rows). Both are model-sized collects, the same
  contract as the kmeans centroid / CM-sketch collects.
- Scoring is a broadcast hash join of postings against the <=|query|-row
  idf table — the corpus side never shuffles again; the final top-k is
  a TakeOrderedAndProject, never a global sort.

Engine-exactness: per-term scores are rounded to 9 dp and summed as
DECIMAL(38,9) so the per-doc total is independent of addition order
(the same convention as the Q1-shape aggregates); ranking ties break on
doc_id. The DuckDB-parity oracle for the whole operator is pinned in
tests/test_retrieval.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx

K1 = 1.2
B = 0.75


def postings_for_terms(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, term, tf, dl) for ONLY the query terms.

    The term filter sits between the explode and the aggregation, so the
    (term, doc) shuffle is query-sized, not corpus-sized. dl (document
    token length) rides along via map-side projection — it is constant
    per doc, carried with first(). Tokenization is the SHARED analyzer
    (functions/text.analyze) — the same one the query side uses, so dl,
    idf, and the term filter can never disagree about what a token is."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tx.analyze(text_col, analyzer).alias("__toks"),
    ).withColumn("dl", F.size("__toks").cast("long"))
    return (
        toks.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def corpus_stats(
    docs: DataFrame, text_col: str = "text", analyzer: str = "standard"
) -> tuple[int, float]:
    """(N, avgdl) in one scalar aggregate. The token-length sum is exact
    long arithmetic, so avgdl is bit-identical across engines."""
    row = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.size(tx.analyze(text_col, analyzer)).cast("long")).alias("tl"),
    ).collect()[0]
    return int(row["n"]), float(row["tl"]) / float(row["n"])


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    analyzer: str = "standard",
) -> DataFrame:
    """Top-k docs for a bag-of-terms query under Lucene-style BM25:

        idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(d, t) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Returns (doc_id, score, rank) with score rounded to 6 dp and rank
    dense over (score desc, doc_id asc) — fully deterministic output.
    Corpus AND query terms tokenize under the same ``analyzer``
    (functions/text.analyze / tokenize_query), so "Word." queries match
    "word" under the default — identical semantics to the persisted
    index path (text_index.search), pinned in tests.
    """
    spark = docs.sparkSession
    terms = tx.tokenize_query(terms, analyzer)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double, rank int")
    post = postings_for_terms(docs, terms, id_col, text_col, analyzer)
    n, avgdl = corpus_stats(docs, text_col, analyzer)

    # per-term document frequency -> idf literals (<= |terms| rows; the
    # ln() runs driver-side in Python so both engines consume a literal)
    dfs = {
        r["term"]: int(r["df"])
        for r in post.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    idf_rows = [
        (t, math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))) for t in sorted(dfs)
    ]
    if not idf_rows:
        return spark.createDataFrame([], "doc_id long, score double, rank int")
    idf = spark.createDataFrame(idf_rows, "term string, idf double")

    tf = F.col("tf").cast("double")
    dl_norm = 1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl)
    term_score = F.col("idf") * tf * (k1 + 1.0) / (tf + k1 * dl_norm)
    scored = (
        post.join(F.broadcast(idf), "term")
        # 9-dp decimal partials: per-doc sum independent of addition order
        .withColumn("__s", F.round(term_score, 9).cast("decimal(38,9)"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s").cast("double"), 6).alias("score"))
    )
    # limit first: the rank window then runs over k rows, not the corpus
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            # k rows by construction (limit above): the global rank
            # window is single-partition over k rows, so WindowExec's
            # unpartitioned-window warning is noise here, not a scale
            # bug (a foldable partition key would be optimized away)
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
    )


def bm25_term_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, term, tf, dl, df, idf, score) — the per-(doc, term) BM25
    component table over the FULL vocabulary as one LAZY plan, built for
    the SQL surface (sql.register_pipeline_views → ``bm25_scores``): a
    SQL user writes

        SELECT doc_id,
               CAST(ROUND(SUM(CAST(score AS DECIMAL(38,9))), 6)
                    AS DOUBLE) AS score
        FROM bm25_scores WHERE term IN (...)
        GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT k

    and gets :func:`bm25_topk`'s exact numbers (pinned in
    tests/test_sql_surface.py — same 9-dp per-term rounding, same
    order-independent decimal summation).

    Nothing materializes at registration: the term predicate pushes
    through the grouping keys and the df join, so the post-explode
    shuffle is query-sized exactly as in bm25_topk; N/avgdl ride in as
    a broadcast one-row cross join and are unaffected by the term
    filter (each term's df counts only that term's postings)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tx.analyze(text_col, analyzer).alias("__toks"),
    ).withColumn("dl", F.size("__toks").cast("long"))
    post = (
        toks.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(F.size(tx.analyze(text_col, analyzer)).cast("long")).alias("__tl"),
    ).withColumn("__avgdl", F.col("__tl").cast("double") / F.col("__n"))
    tdf = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    joined = post.join(tdf, "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        1.0
        + (F.col("__n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    dl_norm = 1.0 - b + b * F.col("dl").cast("double") / F.col("__avgdl")
    return joined.select(
        "doc_id",
        "term",
        "tf",
        "dl",
        "df",
        idf.alias("idf"),
        F.round(idf * tf * (k1 + 1.0) / (tf + k1 * dl_norm), 9).alias("score"),
    )


def bm25_oracle_sql(terms: list[str], k: int = 10, k1: float = K1, b: float = B) -> str:
    """The DuckDB-equivalent SQL for :func:`bm25_topk` over the
    `documents` view — same literal-free formula, same 9-dp decimal
    partial-sum convention, same tie-break. Used by the pytest oracle."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS term,
             len(string_split(lower(text), ' ')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             SUM(len(string_split(lower(text), ' '))) AS tl
      FROM documents
    ),
    post AS (
      SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
      FROM toks WHERE term IN ({term_list})
      GROUP BY doc_id, term
    ),
    idf AS (
      SELECT term,
             ln(1.0 + (stats.n - COUNT(DISTINCT doc_id) + 0.5)
                      / (COUNT(DISTINCT doc_id) + 0.5)) AS idf
      FROM post, stats GROUP BY term, stats.n
    ),
    scored AS (
      SELECT post.doc_id,
             ROUND(CAST(SUM(CAST(ROUND(
               idf.idf * CAST(post.tf AS DOUBLE) * ({k1} + 1.0)
               / (CAST(post.tf AS DOUBLE)
                  + {k1} * (1.0 - {b} + {b} * CAST(post.dl AS DOUBLE)
                            / (CAST(stats.tl AS DOUBLE) / stats.n))),
               9) AS DECIMAL(38,9))) AS DOUBLE), 6) AS score
      FROM post JOIN idf USING (term), stats
      GROUP BY post.doc_id
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
    FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """
