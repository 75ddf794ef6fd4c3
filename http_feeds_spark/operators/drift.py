"""Corpus drift detection — compare two corpus snapshots (yesterday's
crawl vs today's) with the standard distribution-shift measures:
Jensen-Shannon divergence over the word distribution (Lin, IEEE IT
1991) and the Population Stability Index over a numeric doc statistic
(the banking/ML-monitoring staple; see e.g. Siddiqi, "Credit Risk
Scorecards", 2006).

A training-data pipeline that continuously ingests needs exactly this
gate: a JS spike on the unigram distribution means the crawl's content
changed (new spam cluster, encoding regression, source outage), a PSI
spike on token counts means the document-shape profile moved — both
BEFORE the data reaches a training mix.

Spark shape (everything one-shuffle):

- word distributions: one map-side-combined count per snapshot, one
  full-outer equi-join on the word, one sum aggregate for the
  divergence — the join carries (word, count) pairs, vocabulary-sized,
  never documents;
- PSI: bucket cuts from ONE approxQuantile on the BASELINE (driver,
  model-sized — the reference distribution defines the bins, per the
  standard recipe), binning map-only against the cut literals, one
  count aggregate per snapshot, proportions joined bucket-count-sized.

Exact numeric parity with a pure-numpy reference on both measures is
pinned in tests/test_drift.py, plus the planted-drift/identical-
snapshot contracts (JS: 0 ≤ js ≤ ln 2; identical ⇒ 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — one map-side-combined aggregate."""
    return (
        docs.select(F.explode(tx.words(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def js_divergence_counts(wa: DataFrame, wb: DataFrame) -> float:
    """JS divergence from two (word, n) count frames — the form the
    streaming monitor uses to diff STORED batch aggregates without
    re-reading any document (streaming/monitor.py)."""
    wa = wa.select("word", F.col("n").alias("na"))
    wb = wb.select("word", F.col("n").alias("nb"))
    joined = wa.join(wb, "word", "full_outer").select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    # totals via one aggregate; the divergence sum via a second — both
    # over the vocabulary-sized joined frame
    tot = joined.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb")).collect()[0]
    p = F.col("na") / F.lit(float(tot.ta))
    q = F.col("nb") / F.lit(float(tot.tb))
    m = (p + q) / 2
    term = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(F.lit(0.0))  # noqa: E731
    js = joined.agg(
        F.sum((term(p) + term(q)) / 2).alias("js")
    ).collect()[0].js
    return float(js)


def js_divergence_words(a: DataFrame, b: DataFrame, text_col: str = "text") -> float:
    """Jensen-Shannon divergence (natural log, so ∈ [0, ln 2]) between
    the two snapshots' unigram distributions. Absent words contribute
    their 0·ln0 = 0 term exactly (coalesce to 0 before the kernel)."""
    return js_divergence_counts(word_counts(a, text_col), word_counts(b, text_col))


def psi(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> float:
    """Population Stability Index of `value_col` with baseline-defined
    quantile buckets (the standard recipe: bins come from the REFERENCE
    population). Empty-bucket proportions are floored at `eps` so the
    log stays finite — the conventional regularization. Rule of thumb:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = baseline.select(F.col(value_col).cast("double").alias("__v")).approxQuantile(
        "__v", qs, 0.001
    )  # model-sized driver collect — defines the bins

    def bucket_props(df: DataFrame) -> dict[int, float]:
        b = F.lit(0)
        for i, cut in enumerate(cuts):
            b = F.when(F.col(value_col).cast("double") > float(cut), i + 1).otherwise(b)
        rows = (
            df.select(b.alias("bkt")).groupBy("bkt").agg(F.count("*").alias("n")).collect()
        )
        total = sum(r.n for r in rows)
        return {r.bkt: r.n / total for r in rows}

    import math

    pb, pc = bucket_props(baseline), bucket_props(current)
    out = 0.0
    for i in range(n_buckets):
        x = max(pb.get(i, 0.0), eps)
        y = max(pc.get(i, 0.0), eps)
        out += (y - x) * math.log(y / x)
    return out


def drift_report(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> dict:
    """Both gates in one report dict: js_words, psi_tokens, and the two
    snapshot sizes. The caller alerts on thresholds."""
    toks = F.size(tx.words(F.col(text_col))).cast("long").alias("__t")
    return {
        "n_docs_a": a.count(),
        "n_docs_b": b.count(),
        "js_words": js_divergence_words(a, b, text_col),
        "psi_tokens": psi(a.select(toks), b.select(toks), "__t"),
    }
