"""Hashed-BoW logistic quality classifier (functions/classifier.py):
training converges on a separable corpus, the scorer agrees with an
independent Python reference, the scoring plan is map-only, and the
registered weak-supervision query learns its label."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from http_feeds_spark.functions import classifier as clf

N_BUCKETS = 64


def _toy(spark):
    """Separable two-class corpus: class-1 docs carry `good*` tokens,
    class-0 docs carry `bad*` tokens, with shared filler."""
    rows = []
    for i in range(40):
        filler = f"common{i % 5} stuff{i % 3}"
        if i % 2:
            rows.append((i, f"goodword{i % 4} excellent {filler}".split(), 1))
        else:
            rows.append((i, f"badword{i % 4} terrible {filler}".split(), 0))
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>, label int")


def test_training_reduces_loss_and_separates(spark):
    df = _toy(spark)
    w0, b0 = [0.0] * N_BUCKETS, 0.0
    loss0 = clf.log_loss(df, "tokens", "label", w0, b0, N_BUCKETS)
    assert abs(loss0 - math.log(2)) < 1e-9  # all-zero model = ln 2

    w, b = clf.train_logistic(
        df, "tokens", "label", n_buckets=N_BUCKETS, iters=10, lr=1.0
    )
    loss = clf.log_loss(df, "tokens", "label", w, b, N_BUCKETS)
    assert loss < loss0 / 2

    pred = df.select(
        "label",
        (clf.score(F.col("tokens"), w, b, N_BUCKETS) >= 0.5).cast("int").alias("p"),
    )
    acc = pred.filter(F.col("label") == F.col("p")).count() / pred.count()
    assert acc == 1.0  # fully separable by construction


def test_score_matches_python_reference(spark):
    """The JVM-side margin (element_at folds over the weight literal)
    must equal a plain-Python dot product over the same hashed ids."""
    df = _toy(spark)
    w, b = clf.train_logistic(
        df, "tokens", "label", n_buckets=N_BUCKETS, iters=3, lr=1.0
    )
    ids = df.select(
        "doc_id", clf.bucket_ids(F.col("tokens"), N_BUCKETS).alias("bids")
    ).collect()
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", clf.score(F.col("tokens"), w, b, N_BUCKETS).alias("s")
        ).collect()
    }
    for r in ids:
        z = sum(w[int(i)] for i in r.bids) / max(len(r.bids), 1) + b
        want = 1.0 / (1.0 + math.exp(-z))
        assert abs(got[r.doc_id] - want) < 1e-9, r.doc_id


def test_scoring_is_map_only(spark):
    """The deployed path (score a corpus with a trained model) must plan
    with ZERO exchanges — broadcast-literal weights, per-row folds."""
    from http_feeds_spark.plans import inspect as pi

    df = _toy(spark)
    out = df.select(
        "doc_id", clf.score(F.col("tokens"), [0.1] * N_BUCKETS, 0.0, N_BUCKETS)
    )
    names = pi.subtree_names(pi.physical_root(out))
    assert not any(n.startswith("Exchange") for n in names), names


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
def test_registered_query_learns_weak_label(spark, sf_dir):
    """q_llm_quality_model: the in-engine trained model actually learns
    the (lang == 'en') weak label, and the run is deterministic."""
    from http_feeds_spark.queries import registry

    reg = registry()
    rows = lambda: {tuple(r) for r in reg["q_llm_quality_model"].fn(spark, sf_dir).collect()}
    first = rows()
    n = len(first)
    acc = sum(1 for r in first if r[1] == r[3]) / n
    assert acc >= 0.9, f"weak-label accuracy {acc}"
    assert first == rows()
