"""In-engine n-gram language model — train bigram statistics over a
reference corpus and score documents by perplexity, the classic
quality-filter signal (CCNet, Wenzek et al. LREC 2020, filters web text
by KenLM perplexity against a clean reference; this is the same gate
with the LM trained in-engine instead of imported).

Model: bigram LM with add-k (Lidstone) smoothing — Jurafsky & Martin
ch. 3. Heavier smoothing (Kneser-Ney) changes constants, not the data
flow; add-k keeps the oracle math exactly reproducible in the tests.

    p(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + k) / (c(w_{i-1}) + k·|V|)

Spark shape:

- **Training is two map-side-combined aggregates** over the reference
  corpus (unigram counts, bigram counts) — the model is a pair of
  count DataFrames, vocabulary/bigram-sized, NEVER collected: at web
  scale the bigram table is far too big for a driver or a broadcast,
  and it never needs to be either.
- **Scoring is one equi-join**: the document's bigrams (with their
  in-doc multiplicity, so the join output stays distinct-bigram-sized)
  against the model on the bigram key, log-probs summed per doc;
  unseen bigrams take the smoothed floor via the unigram context count
  (left join + coalesce). Two shuffles total, both on compact keys.
- Per-doc output: avg negative log-likelihood per token and
  perplexity = exp(nll) — filter on a threshold downstream.

Exact-parity pytest oracle: a pure-Python bigram LM with the identical
smoothing reproduces the perplexities to float tolerance
(tests/test_ngram_lm.py), plus the discrimination contract — reference-
like text must score lower perplexity than shuffled/alien text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx

BOS = "<s>"  # sentence/document start context


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, m) — each doc's bigrams with multiplicity m, BOS
    prepended so the first token is scored too. Map-only + one local
    groupBy key (id, w1, w2)."""
    toks = F.concat(F.array(F.lit(BOS)), tx.words(F.col(text_col)))
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("p"))
        .groupBy("__id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("m"))
    )


def train_bigram_lm(
    ref_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram_counts(w1, c1), bigram_counts(w1, w2, c2), |V|) from the
    reference corpus — two aggregates, model stays distributed."""
    toks = F.concat(F.array(F.lit(BOS)), tx.words(F.col(text_col)))
    exploded = ref_docs.select(F.explode(toks).alias("w"))
    uni = exploded.groupBy(F.col("w").alias("w1")).agg(F.count("*").alias("c1"))
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = (
        ref_docs.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c2"))
    )
    # |V| excludes BOS (it is a context, never a predicted token)
    vocab = exploded.where(F.col("w") != BOS).select("w").distinct().count()
    return uni, bi, int(vocab)


def perplexity(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_scored, nll, ppl): add-k bigram perplexity of each doc
    under the reference model. Unseen CONTEXTS score against c1=0 (the
    uniform smoothed floor); the join output is distinct-bigram-sized
    thanks to the multiplicity column."""
    dg = _doc_bigrams(docs, id_col, text_col)
    scored = (
        dg.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .select(
            "__id",
            "m",
            (
                F.log(
                    (F.coalesce("c2", F.lit(0)) + F.lit(float(k)))
                    / (F.coalesce("c1", F.lit(0)) + F.lit(float(k * vocab_size)))
                )
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.sum("m").cast("long").alias("n_scored"),
            (-F.sum(F.col("lp") * F.col("m")) / F.sum("m")).alias("nll"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_scored",
            "nll",
            F.exp("nll").alias("ppl"),
        )
    )
