"""Semantic deduplication — SemDeDup-style cluster-then-prune
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023).

Exact all-pairs cosine over an N-row corpus is O(N²) — dead at 100 TB.
SemDeDup's published cost model: k-means the embeddings into k clusters,
then compare pairs ONLY within a cluster, cutting the pair space to
~O(N²/k); with k ∝ N the per-cluster work is constant-sized. The pieces
are all existing Spark-first components:

- **clustering**: functions/kmeans.py — deterministic Lloyd rounds,
  map-only assignment against ONE broadcast centroid literal (or reuse a
  persisted operators/ann_index.py quantizer, which is the deployment
  shape: the same coarse index serves search AND dedup);
- **candidate pairs**: a self-equi-join on the cluster id. The exchange
  shuffles (id, cluster, vector) once; pairs never leave their cluster's
  partition. Skew note: one mega-cluster makes its partition quadratic —
  the published mitigation is raising k (the paper uses k≈100k at
  web-scale); `max_pair_span` makes the failure loud instead of silent;
- **duplicate groups**: operators/components.py connected components —
  edges are ids-only;
- **survivor policy**: the paper keeps, per duplicate group, the example
  with the LOWEST cosine to its cluster centroid (the least-redundant
  exemplar); implemented as one window rank over the group — ids plus
  one double through that exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_feeds_spark.functions import kmeans as km
from http_feeds_spark.functions import vectors as vec
from http_feeds_spark.operators.components import connected_components


def semantic_pairs(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pair_span: int | None = None,
) -> DataFrame:
    """Within-cluster semantic duplicate pairs: (a, b, cluster,
    cosine_sim) for a < b with cosine ≥ threshold, both in the same
    k-means cluster.

    ``max_pair_span``: optional loud guard against mega-cluster skew —
    clusters larger than this are REJECTED (RuntimeError at action time
    via a failing assertion column) rather than silently running a
    quadratic partition. The remedy is a larger k, per the paper."""
    assigned = km.assign_clusters(emb, centroids, vec_col).select(
        F.col(id_col), F.col(vec_col), "cluster"
    )
    if max_pair_span is not None:
        # count per cluster (map-side combined) and broadcast back; the
        # raise_error lives in a FILTER so Catalyst cannot prune it the
        # way it would an unused projected column — the guard costs one
        # small agg + broadcast join and fires at action time
        sizes = assigned.groupBy("cluster").agg(F.count("*").alias("__csz"))
        assigned = (
            assigned.join(F.broadcast(sizes), "cluster")
            .where(
                F.when(
                    F.col("__csz") > max_pair_span,
                    F.raise_error(
                        F.concat(
                            F.lit("semantic_pairs: cluster "),
                            F.col("cluster").cast("string"),
                            F.lit(
                                f" exceeds max_pair_span={max_pair_span}; raise k"
                            ),
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True))
            )
            .drop("__csz")
        )
    a = assigned.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("__va"), "cluster"
    )
    b = assigned.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"), "cluster"
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine_sim", vec.cosine("__va", "__vb"))
        .filter(F.col("cosine_sim") >= threshold)
        .select("a", "b", "cluster", "cosine_sim")
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    k: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    max_pair_span: int | None = None,
) -> DataFrame:
    """Full SemDeDup pass. Returns one row per input id:
    (id, cluster, component, centroid_sim, keep) where ``component`` is
    the duplicate group (ids not in any group map to themselves) and
    ``keep`` marks the group's survivor — the member with the LOWEST
    cosine to its cluster centroid, tie-broken on min id (deterministic).

    Pass ``centroids`` to reuse a persisted quantizer
    (operators/ann_index.load_centroids); otherwise trains in-call with
    the deterministic Lloyd rounds of functions/kmeans.py."""
    if centroids is None:
        centroids = km.kmeans_centroids(emb, id_col, vec_col, k=k, iters=iters)
    pairs = semantic_pairs(
        emb,
        centroids,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        max_pair_span=max_pair_span,
    )
    comps = connected_components(pairs, "a", "b")  # ids-only exchange
    assigned = km.assign_clusters(emb, centroids, vec_col)
    # cosine to own centroid: per-row O(k + dim) against the broadcast
    # literal — map-only, no shuffle (folded-Literal fast form when the
    # cids are contiguous, same as assign_clusters — r15)
    marr = km._model_array(centroids)
    if marr is not None:
        own = F.element_at(marr, F.col("cluster") + F.lit(1))
    else:
        own = F.element_at(
            F.filter(km._centroid_literal(centroids), lambda c: c["cid"] == F.col("cluster")), 1
        )["cvec"]
    scored = assigned.select(
        F.col(id_col),
        "cluster",
        vec.cosine(F.col(vec_col), own).alias("centroid_sim"),
    )
    labeled = scored.join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    # survivor: lowest centroid_sim per component (paper's policy), min-id
    # tiebreak. Window partitions by component — duplicate groups are
    # small by construction, no skew concern on this exchange.
    rank = F.row_number().over(
        W.partitionBy("component").orderBy(F.col("centroid_sim").asc(), F.col(id_col).asc())
    )
    return labeled.withColumn("keep", rank == 1).select(
        id_col, "cluster", "component", "centroid_sim", "keep"
    )
