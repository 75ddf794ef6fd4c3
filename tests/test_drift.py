"""Corpus drift (operators/drift.py): exact numpy-reference parity for
JS divergence and PSI, identical-snapshot zeros, planted-drift
sensitivity, and the bounds."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from http_feeds_spark.operators import drift


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _ref_js(texts_a, texts_b):
    from collections import Counter

    ca = Counter(w for t in texts_a for w in t.split(" ") if w)
    cb = Counter(w for t in texts_b for w in t.split(" ") if w)
    ta, tb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for w in set(ca) | set(cb):
        p, q = ca.get(w, 0) / ta, cb.get(w, 0) / tb
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    return js


def test_js_matches_reference_and_is_zero_on_identical(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    got = drift.js_divergence_words(a, b)
    want = _ref_js(
        [r.text for r in a.collect()], [r.text for r in b.collect()]
    )
    assert abs(got - want) < 1e-9, (got, want)
    assert 0.0 <= got <= math.log(2) + 1e-12

    same = drift.js_divergence_words(docs, docs)
    assert abs(same) < 1e-12


def test_js_detects_planted_vocabulary_shift(spark, sf_dir):
    """Replacing half of snapshot B with alien-vocabulary docs must move
    JS far above the A-vs-A-split baseline."""
    docs = _docs(spark, sf_dir)
    baseline = drift.js_divergence_words(
        docs.where(F.col("doc_id") % 2 == 0), docs.where(F.col("doc_id") % 2 == 1)
    )
    alien = spark.createDataFrame(
        [(100000 + i, "zq" + " zq".join(str(j) for j in range(40))) for i in range(250)],
        "doc_id long, text string",
    )
    drifted = docs.where(F.col("doc_id") % 2 == 0).unionByName(alien)
    shifted = drift.js_divergence_words(docs, drifted)
    assert shifted > baseline * 5, (baseline, shifted)


def test_psi_matches_reference_and_flags_shift(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = F.size(F.split("text", " ")).cast("long").alias("t")
    base = docs.select(toks)
    assert drift.psi(base, base, "t") < 1e-9

    # planted shape-shift: truncate half the docs to 10 tokens
    short = docs.select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.array_join(F.slice(F.split("text", " "), 1, 10), " "),
        )
        .otherwise(F.col("text"))
        .alias("text")
    ).select(toks)
    shifted = drift.psi(base, short, "t")
    assert shifted > 0.25, shifted  # "action" per the rule of thumb

    # numpy reference with the same cuts definition
    tb = np.array([r.t for r in base.collect()], dtype=float)
    tc = np.array([r.t for r in short.collect()], dtype=float)
    cuts = np.quantile(tb, [i / 10 for i in range(1, 10)])

    def props(x):
        bins = np.zeros(len(x), dtype=int)
        for i, c in enumerate(cuts):
            bins[x > c] = i + 1
        return np.bincount(bins, minlength=10) / len(x)

    pb, pc = props(tb), props(tc)
    want = sum(
        (y - x) * math.log(max(y, 1e-6) / max(x, 1e-6))
        for x, y in zip(np.maximum(pb, 1e-6), np.maximum(pc, 1e-6))
    )
    # approxQuantile(0.001) cuts can differ slightly from numpy's exact
    # quantiles — parity within a tolerance that still distinguishes
    # stable (<0.1) from action (>0.25)
    assert abs(shifted - want) < 0.05, (shifted, want)


def test_drift_report_shape(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rep = drift.drift_report(docs, docs)
    assert rep["n_docs_a"] == rep["n_docs_b"] > 0
    assert abs(rep["js_words"]) < 1e-12 and abs(rep["psi_tokens"]) < 1e-9
