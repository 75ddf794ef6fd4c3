"""Bigram LM perplexity (functions/ngram_lm.py): exact parity with a
pure-Python add-k bigram LM, and the discrimination contract the CCNet
filter relies on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from http_feeds_spark.functions import ngram_lm as lm


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _ref_ppl(ref_texts, texts_by_id, k=1.0):
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    vocab = set()
    for t in ref_texts:
        toks = [lm.BOS] + t.split(" ")
        vocab.update(w for w in toks if w != lm.BOS)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(vocab)
    out = {}
    for did, t in texts_by_id.items():
        toks = [lm.BOS] + t.split(" ")
        lp = 0.0
        n = 0
        for a, b in zip(toks, toks[1:]):
            lp += math.log((bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * V))
            n += 1
        out[did] = (n, -lp / n, math.exp(-lp / n))
    return out


def test_perplexity_matches_reference(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ref = docs.where(F.col("doc_id") % 2 == 0)
    score_set = docs.where(F.col("doc_id") < 40)
    uni, bi, V = lm.train_bigram_lm(ref)
    got = {
        r.doc_id: (r.n_scored, r.nll, r.ppl)
        for r in lm.perplexity(score_set, uni, bi, V).collect()
    }
    want = _ref_ppl(
        [r.text for r in ref.collect()],
        {r.doc_id: r.text for r in score_set.collect()},
    )
    assert set(got) == set(want)
    for did in got:
        assert got[did][0] == want[did][0]
        assert abs(got[did][1] - want[did][1]) < 1e-9, did
        assert abs(got[did][2] - want[did][2]) / want[did][2] < 1e-9, did


def test_reference_like_text_scores_lower(spark, sf_dir):
    """The filter's reason to exist: in-domain text must get materially
    lower perplexity than alien-vocabulary text under the same model."""
    docs = _docs(spark, sf_dir)
    uni, bi, V = lm.train_bigram_lm(docs)
    indoman = docs.limit(20).select("doc_id", "text")
    alien = spark.createDataFrame(
        [
            (900000 + i, " ".join(f"xq{i}w{j}" for j in range(60)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    both = lm.perplexity(indoman.unionByName(alien), uni, bi, V).collect()
    in_ppl = [r.ppl for r in both if r.doc_id < 900000]
    out_ppl = [r.ppl for r in both if r.doc_id >= 900000]
    assert max(in_ppl) < min(out_ppl), (max(in_ppl), min(out_ppl))


def test_model_stays_distributed_and_joins_partial_agg(spark, sf_dir):
    """The model is never collected: scoring is a plan over the count
    frames (two joins), and the per-doc reduction partial-aggregates."""
    from http_feeds_spark import plans

    docs = _docs(spark, sf_dir)
    uni, bi, V = lm.train_bigram_lm(docs)
    out = lm.perplexity(docs.limit(10), uni, bi, V)
    assert plans.has_partial_aggregation(out)
    out.write.format("noop").mode("overwrite").save()
