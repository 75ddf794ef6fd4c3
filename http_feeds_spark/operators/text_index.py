"""Persisted inverted index — build-once lexical search, the BM25
analogue of the ANN index store (operators/ann_index.py): at 100 TB a
retrieval tier cannot re-scan the corpus per query; it probes a posting
store (the classical IR architecture — Zobel & Moffat, "Inverted files
for text search engines", CSUR 2006).

Stores under one index root (any Hadoop filesystem):

    postings/ (term, doc_id, tf, dl) partitioned by bucket=N/
    terms/    (term, df)             partitioned by bucket=N/
    meta/     (n_docs, avgdl)        one row — written LAST

- **Doc length rides the posting row** (denormalized at build): BM25's
  length normalization then needs NO doc-table join at query time —
  the standard search-engine layout trade (a few bytes per posting buys
  a join-free read path).
- **Terms are bucketed by hash** so a query's posting reads prune to
  |query terms| directories of the posting store — the partition-filter
  trick the ANN index uses for clusters, applied to the lexicon.
- Crash story (ann_index.py convention): postings/ and terms/ write
  first, meta/ LAST; presence of meta/ is the index-present check, so
  a torn build reads as absent and the deterministic rebuild overwrites
  all stores idempotently.

Search (``search``) must return EXACTLY what the per-query operator
(operators/retrieval.py: bm25_topk) returns on the same corpus — same
idf, same rounding, same tie-break — pinned in tests/test_text_index.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx
from http_feeds_spark.operators.retrieval import B, K1
from http_feeds_spark.stores import parquet_exists

POSTINGS_DIR = "postings"
TERMS_DIR = "terms"
META_DIR = "meta"
N_BUCKETS = 64


def _paths(index_root: str) -> tuple[str, str, str]:
    root = index_root.rstrip("/")
    return (f"{root}/{POSTINGS_DIR}", f"{root}/{TERMS_DIR}", f"{root}/{META_DIR}")


def _bucket(term_col) -> F.Column:
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return F.pmod(F.xxhash64(c), F.lit(N_BUCKETS)).cast("int")


def build_text_index(
    spark: SparkSession,
    docs: DataFrame,
    index_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Two aggregates + three writes; every pass linear, corpus never
    collected. Postings carry dl so search is join-free."""
    post_path, terms_path, meta_path = _paths(index_root)
    toks = tx.words(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("int").alias("dl"),
        F.explode(toks).alias("term"),
    ).where(F.col("term") != "")
    postings = exploded.groupBy("doc_id", "dl", "term").agg(
        F.count("*").cast("int").alias("tf")
    )
    (
        postings.withColumn("bucket", _bucket("term"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(post_path)
    )
    terms = (
        spark.read.parquet(post_path)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    (
        terms.withColumn("bucket", _bucket("term"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(terms_path)
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg(F.size(tx.words(F.col(text_col)))).alias("avgdl"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(meta_path)


def ensure_text_index(spark: SparkSession, docs: DataFrame, index_root: str, **kw) -> bool:
    """Build iff absent (presence = meta/, the last-written store)."""
    _, _, meta_path = _paths(index_root)
    if parquet_exists(spark, meta_path):
        return False
    build_text_index(spark, docs, index_root, **kw)
    return True


def search(
    spark: SparkSession,
    index_root: str,
    terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """SEARCH-ONLY BM25 against the prebuilt index: reads prune to the
    query terms' bucket directories (≤ |terms| of N_BUCKETS), idf comes
    from a |terms|-row lookup of the terms store, scoring is join-free
    (dl rides the posting). Output contract = retrieval.bm25_topk:
    (doc_id, score, rank), score rounded to 6 dp, rank dense over
    (score desc, doc_id asc)."""
    post_path, terms_path, meta_path = _paths(index_root)
    if not parquet_exists(spark, meta_path):
        raise FileNotFoundError(f"no text index at {index_root}; build_text_index first")
    meta = spark.read.parquet(meta_path).collect()[0]
    n, avgdl = int(meta.n_docs), float(meta.avgdl)

    terms = sorted(set(terms))
    buckets = sorted(
        {
            r.b
            for r in spark.range(1)
            .select(
                F.explode(
                    F.array(*[_bucket(F.lit(t)) for t in terms])
                ).alias("b")
            )
            .collect()
        }
    )  # ≤ |terms| ints, computed with the engine's own hash
    tstore = spark.read.parquet(terms_path).where(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    dfs = {r.term: int(r.df) for r in tstore.select("term", "df").collect()}
    if not dfs:
        return spark.createDataFrame([], "doc_id long, score double, rank int")
    idf_rows = [
        (t, math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))) for t in sorted(dfs)
    ]
    idf = spark.createDataFrame(idf_rows, "term string, idf double")

    post = spark.read.parquet(post_path).where(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    tf = F.col("tf").cast("double")
    dl_norm = 1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl)
    term_score = F.col("idf") * tf * (k1 + 1.0) / (tf + k1 * dl_norm)
    scored = (
        post.join(F.broadcast(idf), "term")
        .withColumn("__s", F.round(term_score, 9).cast("decimal(38,9)"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s").cast("double"), 6).alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
    )
