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


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
def test_build_with_defaults_auto_params(spark, tmp_path):
    """r9 wiring: build_index / build_pq_index with NO explicit params
    size themselves from the corpus (verdict done-criteria: recall@10 of
    the auto build >= the hand-picked fixture's)."""
    import math

    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import pq_index as pqi

    emb = _clustered(spark)
    n = emb.count()
    queries = emb.where(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # IVF: auto nlist lands at the suggest_params value
    auto_root = str(tmp_path / "ann_auto")
    ai.build_index(spark, emb, auto_root, iters=3)
    auto_nlist = len(ai.load_centroids(spark, auto_root))
    assert auto_nlist == vt.suggest_params(n, 16)["nlist"]

    # exact ground truth: the IVF index probed at full width IS
    # exhaustive exact search — one frame both PQ variants score against
    exact = ai.search(spark, queries, auto_root, k=10, nprobe=auto_nlist)
    exact = exact.localCheckpoint()

    # PQ: full auto (nlist, m, ksub all suggested) builds and validates
    pq_auto = str(tmp_path / "pq_auto")
    pqi.build_pq_index(spark, emb, pq_auto, iters=3)
    cents, books, residual = pqi.load_model(spark, pq_auto)
    sugg = vt.suggest_params(n, 16, pq_bytes=8)
    assert len(cents) == sugg["nlist"]
    assert len(books) == sugg["m"] and len(books[0]) == sugg["ksub"]

    # the verdict's done-criteria: auto-params recall@10 (vs EXACT
    # neighbors, both tiers at full probe so only code quality differs)
    # >= the hand-picked fixture's m=4/ksub=16
    pq_hand = str(tmp_path / "pq_hand")
    pqi.build_pq_index(spark, emb, pq_hand, nlist=4, m=4, ksub=16, iters=3)

    def pq_recall(root):
        nlist = len(pqi.load_model(spark, root)[0])
        approx = pqi.search(spark, queries, root, k=10, nprobe=nlist)
        return vt._recall_at_k(approx, exact, 10)

    assert pq_recall(pq_auto) >= pq_recall(pq_hand)

    # mixed explicit/auto: explicit nlist kept, residual ksub sized
    # against ITS per-cluster population
    pq_mixed = str(tmp_path / "pq_mixed")
    pqi.build_pq_index(spark, emb, pq_mixed, nlist=4, residual=True, iters=2)
    cents_m, books_m, _ = pqi.load_model(spark, pq_mixed)
    assert len(cents_m) == 4
    assert len(books_m[0]) * 4 <= n / 4  # >= 4 residuals per codeword


def test_build_pq_validates_explicit_params(spark, tmp_path):
    """The refuse-loudly gate now runs on every build: an explicit ksub
    above the training population raises; validate=False (the documented
    feed-bootstrap escape) builds anyway."""
    import pytest as _pytest

    from http_feeds_spark.operators import pq_index as pqi

    emb = _clustered(spark, n_clusters=4, per=10)  # 40 vectors
    root = str(tmp_path / "pq")
    with _pytest.raises(ValueError, match="ksub"):
        pqi.build_pq_index(spark, emb, root, nlist=4, m=4, ksub=64, iters=1)
    with _pytest.raises(ValueError, match="ksub"):
        # flat would pass (40 >= 8); residual population is 40/8 = 5
        pqi.build_pq_index(
            spark, emb, root, nlist=8, m=4, ksub=8, residual=True, iters=1
        )
    pqi.build_pq_index(
        spark, emb, root, nlist=4, m=4, ksub=64, iters=1, validate=False
    )
    assert pqi.load_model(spark, root)[0]  # built despite the bad config


def test_build_pq_empty_corpus_raises_clearly(spark, tmp_path):
    """r10 (r9 ADVICE): an empty corpus must raise 'nothing to index',
    not an opaque NoneType subscript from the dim probe."""
    import pytest as _pytest

    from http_feeds_spark.operators import pq_index as pqi

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="nothing to index"):
        pqi.build_pq_index(spark, empty, str(tmp_path / "pq_empty"))
