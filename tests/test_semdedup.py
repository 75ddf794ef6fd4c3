"""Semantic dedup (operators/semdedup.py — SemDeDup cluster-then-prune):
k=1 reduces candidate generation to ALL pairs, so the whole pass must
match a brute-force O(n²) threshold-graph reference exactly; with k>1
planted perturbation clones must still collapse; the survivor policy is
the paper's lowest-cosine-to-centroid member; the mega-cluster guard is
loud, not silent."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.functions import kmeans as km
from http_feeds_spark.operators import semdedup as sd


def _emb(spark, sf_dir, n=150):
    from http_feeds_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select("vec_id", "embedding")
    )


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _brute_components(vectors: dict[int, list[float]], threshold: float):
    """Python reference: threshold graph over exact all-pairs cosine,
    union-find with union-by-min (component id = min member id)."""
    ids = sorted(vectors)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    clustered = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _cos(vectors[a], vectors[b]) >= threshold:
                clustered |= {a, b}
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in ids}, clustered


def test_k1_matches_brute_force_reference(spark, sf_dir):
    """One cluster ⇒ candidate set is all pairs ⇒ the distributed pass
    must assign exactly the brute-force components. The synthetic corpus
    has no natural high-cosine pairs (max ≈ 0.43), so noisy clone CHAINS
    are planted around real vectors: per-link noise makes some links land
    above and some below the threshold — the Python reference defines the
    ground truth either way, including transitive merges."""
    emb = _emb(spark, sf_dir, n=60)
    base = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    rnd = random.Random(42)
    rows = [(i, v) for i, v in base.items()]
    for j, src in enumerate(sorted(base)[:12]):
        cur = base[src]
        for link in range(3):  # chain: src ~ c0 ~ c1 ~ c2, noise varies
            # embeddings are unit-norm; per-dim noise of scale s ⇒ noise
            # norm ≈ s·√(64/3) ≈ 4.6s, so s ∈ [0.003, 0.03] straddles
            # the 0.995 threshold (links land both sides)
            scale = 0.003 + 0.027 * rnd.random()
            cur = [x + scale * rnd.uniform(-1, 1) for x in cur]
            rows.append((1000 + j * 10 + link, cur))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # read BACK the float32-rounded values so reference and engine share
    # bit-identical inputs
    vectors = {r.vec_id: [float(x) for x in r.embedding] for r in df.collect()}
    threshold = 0.995
    want, _ = _brute_components(vectors, threshold)
    got = {
        r.vec_id: r.component
        for r in sd.semantic_dedup(df, k=1, iters=1, threshold=threshold).collect()
    }
    assert got == want
    # sanity: the plant produced real merges AND real splits — at least
    # one chain collapsed (a planted node joined a group) and at least
    # one chain broke (the 12 chains yield more than 12 components)
    assert any(n != c for n, c in want.items() if n >= 1000)
    chain_nodes = [n for n in want if n >= 1000] + sorted(base)[:12]
    assert len({want[n] for n in chain_nodes}) > 12


def test_planted_clones_collapse_with_k_gt_1(spark, sf_dir):
    """A ×1.000001 clone has cosine ≈ 1 with its source AND an almost
    identical vector, so k-means must place both in the same cluster —
    the pair can never be lost to the partitioning. Survivor flag count
    per group is exactly one."""
    emb = _emb(spark, sf_dir, n=100)
    clones = emb.filter(F.col("vec_id") < 6).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 1.000001).cast("float")).alias(
            "embedding"
        ),
    )
    out = sd.semantic_dedup(
        emb.unionByName(clones), k=6, iters=2, threshold=0.999
    ).collect()
    comp = {r.vec_id: r.component for r in out}
    for i in range(6):
        assert comp[i + 10_000] == comp[i] == i
    keeps: dict[int, int] = {}
    for r in out:
        keeps[r.component] = keeps.get(r.component, 0) + (1 if r.keep else 0)
    assert all(v == 1 for v in keeps.values())


def test_survivor_is_lowest_centroid_cosine(spark):
    """Hand-built geometry: 3 near-identical vectors in one duplicate
    group; the survivor must be the one FARTHEST from the centroid
    (lowest cosine), not the min id — the SemDeDup policy."""
    rows = [
        (1, [1.0, 0.02]),   # closest to centroid direction
        (2, [1.0, 0.00]),
        (3, [1.0, -0.06]),  # farthest out — must survive
        (9, [-1.0, 5.0]),   # unrelated singleton, survives trivially
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [1.0, 0.0]), (1, [-1.0, 5.0])]
    out = {r.vec_id: r for r in sd.semantic_dedup(
        emb, centroids=cents, threshold=0.99
    ).collect()}
    assert {i for i in out if out[i].component == 1} == {1, 2, 3}
    assert [i for i in (1, 2, 3) if out[i].keep] == [3]
    assert out[9].keep and out[9].component == 9


def test_reusing_persisted_quantizer_matches_in_call_training(spark, sf_dir, tmp_path):
    """Deployment shape: the persisted ann_index quantizer drives dedup.
    Deterministic training ⇒ identical assignment either way."""
    from http_feeds_spark.operators import ann_index as ai

    emb = _emb(spark, sf_dir, n=100)
    root = str(tmp_path / "ann")
    ai.build_index(spark, emb, root, k=4, iters=2)
    cents = ai.load_centroids(spark, root)
    a = sd.semantic_dedup(emb, centroids=cents, threshold=0.9)
    b = sd.semantic_dedup(emb, k=4, iters=2, threshold=0.9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mega_cluster_guard_is_loud(spark, sf_dir):
    emb = _emb(spark, sf_dir, n=60)
    cents = km.kmeans_centroids(emb, k=1, iters=1)
    with pytest.raises(Exception, match="max_pair_span"):
        sd.semantic_pairs(
            emb, cents, threshold=0.5, max_pair_span=10
        ).count()


def test_guard_passes_under_span(spark, sf_dir):
    emb = _emb(spark, sf_dir, n=60)
    cents = km.kmeans_centroids(emb, k=8, iters=2)
    sizes = [
        r["cnt"]
        for r in km.assign_clusters(emb, cents)
        .groupBy("cluster")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    sd.semantic_pairs(
        emb, cents, threshold=0.5, max_pair_span=max(sizes)
    ).count()  # must not raise
