"""Vector-tier parameter tuning (functions/vectuner.py): closed-form
nlist/m/ksub suggestions, the refuse-loudly PQ gate, and empirical
nprobe tuning against the tier's own full-probe ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.functions import vectuner as vt


def _clustered(spark, n_clusters=24, per=25, dim=16, noise=0.15, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    X = np.vstack(
        [centers[c] + noise * rng.randn(per, dim) for c in range(n_clusters)]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )


def test_suggest_params_shapes_and_gates():
    """nlist tracks growth·√N but never starves centroids of training
    points; m divides dim within the byte budget; ksub respects the
    training population for both flat and residual variants."""
    p = vt.suggest_params(1_000_000, 128, growth=4.0, pq_bytes=16)
    assert p["nlist"] == 4000  # 4·√1e6
    assert p["m"] == 16 and 128 % p["m"] == 0
    assert p["ksub"] == 256

    small = vt.suggest_params(600, 32, pq_bytes=8)
    assert small["nlist"] == 600 // vt.MIN_POINTS_PER_CENTROID  # capped
    assert small["ksub"] * 4 <= 600

    res = vt.suggest_params(10_000, 64, pq_bytes=8, residual=True)
    assert res["ksub"] * 4 <= 10_000 / res["nlist"]  # per-cluster population

    # dim with an awkward budget: m = largest divisor within it
    assert vt.suggest_params(10_000, 96, pq_bytes=10)["m"] == 8

    with pytest.raises(ValueError, match="ksub"):
        vt.validate_pq_params(100, 32, nlist=10, m=4, ksub=256)
    with pytest.raises(ValueError, match="ksub"):
        # flat would pass (640 >= 64); residual population is 640/32 = 20
        vt.validate_pq_params(640, 32, nlist=32, m=4, ksub=64, residual=True)
    with pytest.raises(ValueError, match="divide"):
        vt.validate_pq_params(1000, 30, nlist=10, m=4, ksub=16)
    with pytest.raises(ValueError, match="nlist"):
        vt.validate_pq_params(10, 32, nlist=100, m=4, ksub=4)


def test_tune_nprobe_meets_target_and_beats_hand_picked(spark, tmp_path):
    """On the planted-cluster corpus, the tuned nprobe's recall@10
    meets the target and is >= the naive hand-pick (nprobe=1); the
    curve is monotone non-decreasing and ends at 1.0 at full width."""
    from http_feeds_spark.operators import ann_index as ai

    emb = _clustered(spark)
    n = emb.count()
    dim = len(emb.limit(1).collect()[0].embedding)
    p = vt.suggest_params(n, dim, growth=1.0)
    root = str(tmp_path / "ann")
    ai.build_index(spark, emb, root, k=p["nlist"], iters=3)
    queries = emb.where(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    out = vt.tune_nprobe(
        spark, root, queries, tier="ivf", k=10, target_recall=0.9
    )
    assert out["recall"] >= 0.9
    recalls = [r for _, r in out["curve"]]
    assert recalls == sorted(recalls)  # monotone in nprobe
    assert out["nprobe"] <= p["nlist"]
    hand_picked = out["curve"][0][1]  # nprobe=1, the naive choice
    assert out["recall"] >= hand_picked

    full = vt.tune_nprobe(
        spark, root, queries, tier="ivf", k=10, target_recall=1.01
    )  # unreachable target walks to full width, where recall is 1.0
    assert full["nprobe"] == p["nlist"] and full["recall"] == 1.0


def test_tune_nprobe_pq_tier(spark, tmp_path):
    """The PQ tier tunes against its own full-probe answer (code
    approximation held constant): target met, and the returned nprobe
    reproduces the measured recall."""
    from http_feeds_spark.operators import pq_index as pqi

    emb = _clustered(spark)
    n, dim = emb.count(), 16
    p = vt.suggest_params(n, dim, growth=1.0, pq_bytes=4)
    root = str(tmp_path / "pq")
    pqi.build_pq_index(
        spark, emb, root, nlist=p["nlist"], m=p["m"], ksub=p["ksub"], iters=3
    )
    queries = emb.where(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = vt.tune_nprobe(spark, root, queries, tier="pq", k=10, target_recall=0.9)
    assert out["recall"] >= 0.9
    assert out["nprobe"] < p["nlist"]  # clustered data: pruning is safe
