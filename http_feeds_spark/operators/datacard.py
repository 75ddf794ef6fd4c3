"""Corpus data card — the per-(source, language) summary every released
training corpus ships (the "datasheet/data card" practice of Gebru et
al., "Datasheets for Datasets", CACM 2021; e.g. the composition tables
of the Pile / RefinedWeb / Dolma reports), computed as ONE aggregation
pass over the corpus.

Rollup grouping gives every level at once — (source, lang) cells,
per-source margins, and the corpus total — from a single shuffle whose
payload is a handful of partial aggregates per group, never documents.
Quantiles ride the same pass via percentile_approx (the
Greenwald-Khanna mergeable sketch), so the card costs one corpus scan
at any scale.

Every measure is ANSI-SQL-expressible — full DuckDB value parity is
pinned in tests/test_datacard.py (grouping sets + exact percentiles on
the small fixture vs the approx sketch: percentile_approx with the
default accuracy is exact on group sizes far below 1/epsilon, which the
test documents and relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx


def data_card(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """One-pass rollup card: (source, lang, n_docs, pct_docs, n_tokens,
    avg_tokens, p50_tokens, p95_tokens, n_chars, avg_token_len,
    pct_short_docs). NULL source/lang rows are the rollup margins
    (per-source subtotal, grand total). pct_docs is the composition
    share — the headline number of published corpus cards."""
    toks = F.size(tx.words(F.col(text_col))).cast("long")
    enriched = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        toks.alias("__t"),
        F.length(text_col).cast("long").alias("__c"),
    )
    card = enriched.rollup("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("n_tokens"),
        F.round(F.avg("__t"), 4).alias("avg_tokens"),
        F.percentile_approx("__t", 0.5).cast("long").alias("p50_tokens"),
        F.percentile_approx("__t", 0.95).cast("long").alias("p95_tokens"),
        F.sum("__c").cast("long").alias("n_chars"),
        F.round(F.sum("__c") / F.sum("__t"), 4).alias("avg_token_len"),
        F.round(
            F.sum(F.when(F.col("__t") < 50, 1).otherwise(0)) / F.count("*"), 4
        ).alias("pct_short_docs"),
    )
    # composition share against the grand total via a window over the
    # whole (tiny, group-count-sized) card — no second corpus pass
    from pyspark.sql import Window

    grand = F.max(
        F.when(F.col("source").isNull() & F.col("lang").isNull(), F.col("n_docs"))
    ).over(Window.partitionBy())
    return card.withColumn(
        "pct_docs", F.round(F.col("n_docs") / grand, 4)
    ).select(
        "source",
        "lang",
        "n_docs",
        "pct_docs",
        "n_tokens",
        "avg_tokens",
        "p50_tokens",
        "p95_tokens",
        "n_chars",
        "avg_token_len",
        "pct_short_docs",
    )


def data_card_oracle_sql() -> str:
    """DuckDB twin over the registered `documents` view. DuckDB's
    ROLLUP + exact percentiles match Spark's sketch here because every
    group is far below the sketch's 1/epsilon (see module docstring)."""
    return """
WITH enriched AS (
  SELECT source, lang,
         len(string_split(text, ' ')) AS t,
         CAST(length(text) AS BIGINT) AS c
  FROM documents
), card AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(t) AS BIGINT) AS n_tokens,
         round(avg(t), 4) AS avg_tokens,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY t) AS BIGINT)
           AS p50_tokens,
         CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY t) AS BIGINT)
           AS p95_tokens,
         CAST(sum(c) AS BIGINT) AS n_chars,
         round(sum(c) / CAST(sum(t) AS DOUBLE), 4) AS avg_token_len,
         round(sum(CASE WHEN t < 50 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
           AS pct_short_docs
  FROM enriched GROUP BY ROLLUP (source, lang)
)
SELECT source, lang, n_docs,
       round(n_docs / CAST(max(CASE WHEN source IS NULL AND lang IS NULL
                                    THEN n_docs END) OVER () AS DOUBLE), 4)
         AS pct_docs,
       n_tokens, avg_tokens, p50_tokens, p95_tokens, n_chars,
       avg_token_len, pct_short_docs
FROM card
"""
