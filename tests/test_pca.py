"""In-engine PCA (functions/pca.py): numpy parity for the moments and
the projection, variance ordering, whitening covariance, and layout
independence of the distributed moment pass."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from http_feeds_spark.functions import pca


def _emb(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.asarray([list(r.embedding) for r in rows], dtype=np.float64)


def test_moments_match_numpy_and_layouts(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    X = _X(emb)
    for frame in [emb, emb.repartition(17)]:
        n, mean, cov = pca.moments(frame)
        assert n == X.shape[0]
        np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            cov, np.cov(X, rowvar=False, bias=True), rtol=1e-7, atol=1e-9
        )


def test_moments_driver_receives_exactly_one_row(spark, sf_dir):
    """The scale contract (r6 verdict fix): the moment reduction happens
    in-engine, so the driver collect is ONE model-sized row no matter
    how many partitions (≡ Arrow-batch partials) the corpus spans."""
    emb = _emb(spark, sf_dir)
    X = _X(emb)
    for parts in (1, 17, 33):
        frame = pca._moments_frame(emb.repartition(parts))
        rows = frame.collect()
        assert len(rows) == 1, f"{parts} partitions -> {len(rows)} partial rows"
        d = X.shape[1]
        assert len(rows[0].m) == d * d + d + 1
    n, mean, cov = pca.moments(emb.repartition(33))
    assert n == X.shape[0]
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-9, atol=1e-9)


def test_projection_matches_numpy_pca(spark, sf_dir):
    """Distributed fit+transform must equal numpy eigh PCA under the
    same sign convention."""
    emb = _emb(spark, sf_dir)
    X = _X(emb)
    mean, comps, scales = pca.fit(emb, k=8)

    Xc = X - X.mean(axis=0)
    vals, vecs = np.linalg.eigh(np.cov(X, rowvar=False, bias=True))
    order = np.argsort(vals)[::-1][:8]
    W = []
    for idx in order:
        v = vecs[:, idx]
        j = int(np.abs(v).argmax())
        W.append(v if v[j] >= 0 else -v)
    W = np.asarray(W)
    want = Xc @ W.T

    got_rows = (
        pca.transform(emb, mean, comps, scales).orderBy("vec_id").collect()
    )
    got = np.asarray([list(r.pca) for r in got_rows])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_variance_ordering_and_whitening(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    mean, comps, scales = pca.fit(emb, k=6)
    proj = pca.transform(emb, mean, comps, scales)
    P = np.asarray([list(r.pca) for r in proj.collect()])
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1)), var

    mean_w, comps_w, scales_w = pca.fit(emb, k=6, whiten=True)
    Pw = np.asarray(
        [list(r.pca) for r in pca.transform(emb, mean_w, comps_w, scales_w).collect()]
    )
    np.testing.assert_allclose(
        np.cov(Pw, rowvar=False, bias=True), np.eye(6), atol=1e-6
    )


def test_projection_is_map_only(spark, sf_dir):
    """The transform must add ZERO exchanges — broadcast literals and
    codegen dot products only."""
    from http_feeds_spark import plans

    emb = _emb(spark, sf_dir)
    mean, comps, scales = pca.fit(emb, k=4)
    out = pca.transform(emb, mean, comps, scales)
    assert plans.shuffle_count(out) == 0, plans.executed_plan(out)


def test_reduced_ann_recall_on_low_rank_structure(spark):
    """The point of the operator: when variance concentrates in a
    low-dim subspace (real embedding corpora; NOT the driver's
    isotropic synthetic table, where no linear method can preserve
    neighborhoods — verified: even exact numpy PCA@16 gets 0.2 recall
    there), projecting to that subspace preserves nearest neighbors.
    Deterministic low-rank fixture: 64-dim = 8-dim latent × fixed
    mixing + small noise; PCA@8 must recover most of the full-dim
    top-10."""
    rng = np.random.RandomState(7)
    Z = rng.randn(300, 8)
    A = rng.randn(8, 64)
    X = Z @ A + 0.05 * rng.randn(300, 64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    mean, comps, scales = pca.fit(emb, k=8)
    P = np.asarray(
        [
            list(r.pca)
            for r in pca.transform(emb, mean, comps, scales).orderBy("vec_id").collect()
        ]
    )

    def topk(M, qi, k=10):
        d = ((M - M[qi]) ** 2).sum(axis=1)
        return set(np.argsort(d)[1 : k + 1])

    hits = tot = 0
    for qi in range(8):
        hits += len(topk(X, qi) & topk(P, qi))
        tot += 10
    assert hits / tot >= 0.8, f"recall {hits}/{tot}"
