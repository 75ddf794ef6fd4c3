"""Corpus topic profiling — cluster the embedding space and label each
cluster with its distinguishing terms (SURVEY §2 D49).

The curation loop every large-corpus effort runs before pruning or
re-mixing: k-means over the embedding column partitions the corpus into
topical clusters (functions/kmeans.py — deterministic Lloyd rounds, so
profiles are reproducible run to run), and each cluster is labeled by
its most frequent analyzed terms. Cluster sizes expose imbalance (one
mega-cluster = a boilerplate family worth SemDeDup'ing); labels make
the decision human-readable ("cluster 3 is 40% of the corpus and its
terms are cookie/consent/privacy" → prune). The same report drives
cluster-stratified sampling and the SemDeDup tier's k choice.

Plan shape: one model-sized centroid training (the only iterative
part), one map-only assignment join, one (cluster, term) count
aggregate — map-side combined, shuffle bounded by k × vocabulary, never
by corpus rows — and a per-cluster rank window over that bounded count
frame. No UDF anywhere under the default analyzer.

BATCH-ONLY by design (a documented boundary, not an oversight): every
other curation-family component is feed-composable via run_platform
because its store folds incrementally, but a topic profile is a
statement about the WHOLE corpus at a moment — its centroids move with
every wave, and a profile folded across drifting centroids labels
nothing coherent. The intended live-feed workflow is: run the platform,
take a quiescent epoch, profile the corpus AS OF that epoch (the
embeddings the ANN store serves), and reuse the centroids via
``centroids=`` across the profile / sample / SemDeDup trio. A profile
is a report someone reads, not a serving index — recomputing it
per-review-cadence (daily, per mixture rebuild) is the published
practice and costs one training pass with the shared-centroid path.
r12: that workflow is ONE call — ``epochs.PlatformEpoch.topic_profile``
pins the ANN corpus files as the embeddings and reuses the pinned
coarse-quantizer centroids as the trained model (zero Lloyd passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from http_feeds_spark.functions import kmeans as km
from http_feeds_spark.functions import text as tx


def topic_profile(
    docs: DataFrame,
    emb: DataFrame,
    *,
    k: int = 8,
    top_terms: int = 5,
    iters: int = 2,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    analyzer: str = "standard",
    drop_stopwords: bool = True,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(cluster, n_docs, rank, term, term_count) — one row per
    (cluster, top term), rank 1..top_terms by in-cluster frequency
    (ties term-ascending, so the profile is fully deterministic).

    ``drop_stopwords`` (default) removes the fixed English stopword set
    from labeling under the non-stemming analyzers — otherwise every
    cluster is labeled "the/and/of" and the profile says nothing; the
    ``standard_porter`` analyzer already drops them in tokenization.
    Documents without an embedding row are outside the profile (inner
    join — the profile describes the CLUSTERED corpus).

    ``centroids`` reuses an already-trained model (kmeans_centroids /
    ann_index.load_centroids) so a profile→sample→SemDeDup workflow over
    the same embeddings pays ONE training pass — at scale training is
    the expensive step (``k`` and ``iters`` are ignored when passed)."""
    cents = centroids
    if cents is None:
        cents = km.kmeans_centroids(emb, vec_id_col, vec_col, k=k, iters=iters)
    assigned = km.assign_clusters(emb, cents, vec_col).select(
        F.col(vec_id_col).alias(id_col), "cluster"
    )
    joined = docs.select(id_col, text_col).join(assigned, id_col)
    toks = tx.analyze(text_col, analyzer)
    terms = joined.select("cluster", F.explode(toks).alias("term"))
    if drop_stopwords and analyzer != "standard_porter":
        terms = terms.where(~F.col("term").isin(*sorted(tx.STOPWORDS)))
    counts = terms.groupBy("cluster", "term").agg(
        F.count("*").alias("term_count")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("term_count"), F.asc("term")
    )
    top = counts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_terms
    )
    sizes = joined.groupBy("cluster").agg(F.count("*").cast("long").alias("n_docs"))
    # sizes is k rows (the cluster count) but post-aggregate size
    # estimates blow past the broadcast threshold, so the planner chose
    # a SortMergeJoin (2 sorts + an exchange — plans/r15, guide §3.1);
    # broadcast it explicitly
    return top.join(F.broadcast(sizes), "cluster").select(
        "cluster",
        "n_docs",
        F.col("rank").cast("int").alias("rank"),
        "term",
        F.col("term_count").cast("long").alias("term_count"),
    )


def cluster_stratified_sample(
    docs: DataFrame,
    emb: DataFrame,
    *,
    per_cluster: int,
    k: int = 8,
    iters: int = 2,
    seed: int = 0,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """EXACTLY min(per_cluster, cluster size) documents per topical
    cluster — the profile's actionable sibling: where
    :func:`topic_profile` tells a curator a cluster is over-represented,
    this draws the balanced sample (eval sets, annotation batches,
    topic-balanced mixtures) without the corpus-frequency bias a plain
    uniform sample inherits.

    Deterministic end to end: the same Lloyd training as the profile
    (same k/iters ⇒ identical clusters), then
    sampling.stratified_sample_exact's hash-ranked quota per cluster —
    the seed is a reproducible tape, and membership is stable across
    partition layouts. Returns the sampled docs with their ``cluster``.
    One map-only assignment join + one window shuffle on the cluster
    key; the skew caveat of stratified_sample_exact applies to a
    mega-cluster (pre-filter first — or fix the imbalance this sample
    exists to reveal).

    ``centroids`` reuses a trained model (see :func:`topic_profile`) —
    profile-then-sample over the same embeddings then costs one Lloyd
    training instead of two, with byte-identical output."""
    from http_feeds_spark.functions.sampling import stratified_sample_exact

    cents = centroids
    if cents is None:
        cents = km.kmeans_centroids(emb, vec_id_col, vec_col, k=k, iters=iters)
    assigned = km.assign_clusters(emb, cents, vec_col).select(
        F.col(vec_id_col).alias(id_col), "cluster"
    )
    joined = docs.join(assigned, id_col)
    return stratified_sample_exact(
        joined, "cluster", per_cluster, id_col, seed=seed
    )
