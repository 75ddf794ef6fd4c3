"""Corpus topic profiling (operators/topics.py D49): planted topical
clusters must come back with the planted vocabulary as their labels,
sizes must partition the clustered corpus, and the profile must be
deterministic run to run (deterministic Lloyd training + tie-broken
ranking)."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark.operators import topics


def _corpus(spark):
    """Two well-separated embedding clusters with disjoint vocabularies:
    docs 0-9 are 'astronomy' near axis 0, docs 10-19 'cooking' near
    axis 1 (deterministic jitter, non-zero everywhere)."""
    rows = []
    for i in range(10):
        rows.append((i, "telescope orbit nebula telescope star orbit", [1.0, 0.1 + 0.01 * i, 0.1, 0.1]))
    for i in range(10, 20):
        rows.append((i, "recipe oven flour recipe butter oven", [0.1, 1.0, 0.1 + 0.01 * i, 0.1]))
    df = spark.createDataFrame(rows, "doc_id long, text string, embedding array<float>")
    return df.select("doc_id", "text"), df.select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )


def test_planted_topics_labeled_and_sized(spark):
    docs, emb = _corpus(spark)
    prof = topics.topic_profile(docs, emb, k=2, top_terms=2, iters=3)
    rows = prof.collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, {"n_docs": r.n_docs, "terms": []})
        by_cluster[r.cluster]["terms"].append((r.rank, r.term, r.term_count))
    assert len(by_cluster) == 2
    assert sorted(c["n_docs"] for c in by_cluster.values()) == [10, 10]
    label_sets = [
        {t for _, t, _ in sorted(c["terms"])} for c in by_cluster.values()
    ]
    # each planted topic's two most frequent words label exactly one cluster
    assert {"telescope", "orbit"} in label_sets
    assert {"recipe", "oven"} in label_sets
    # frequencies are the exact planted counts (2 per doc × 10 docs)
    assert all(tc == 20 for c in by_cluster.values() for _, _, tc in c["terms"])

    # deterministic: a second run is row-for-row identical
    again = topics.topic_profile(docs, emb, k=2, top_terms=2, iters=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stopwords_do_not_label_clusters(spark):
    docs, emb = _corpus(spark)
    noisy = docs.withColumn(
        "text", F.concat(F.lit("the and of the and of the "), F.col("text"))
    )
    prof = topics.topic_profile(noisy, emb, k=2, top_terms=2, iters=3)
    labels = {r.term for r in prof.collect()}
    assert labels.isdisjoint({"the", "and", "of"})
    # opt-out keeps them (the raw-count view)
    raw = topics.topic_profile(
        noisy, emb, k=2, top_terms=2, iters=3, drop_stopwords=False
    )
    assert "the" in {r.term for r in raw.collect()}


def test_profile_shuffle_is_vocab_bounded(spark):
    """The count aggregate must be map-side combined (the shuffle
    carries (cluster, term) partials, never corpus rows)."""
    from http_feeds_spark import plans

    docs, emb = _corpus(spark)
    prof = topics.topic_profile(docs, emb, k=2, top_terms=2, iters=1)
    assert plans.has_partial_aggregation(prof)


def test_cluster_stratified_sample_exact_quota(spark):
    """Exactly min(per_cluster, size) docs per cluster, deterministic
    across runs, different seeds draw different members."""
    docs, emb = _corpus(spark)
    s1 = topics.cluster_stratified_sample(docs, emb, per_cluster=3, k=2, iters=3)
    got = s1.groupBy("cluster").count().collect()
    assert sorted(r["count"] for r in got) == [3, 3]
    s2 = topics.cluster_stratified_sample(docs, emb, per_cluster=3, k=2, iters=3)
    assert sorted(r.doc_id for r in s1.collect()) == sorted(r.doc_id for r in s2.collect())
    s3 = topics.cluster_stratified_sample(docs, emb, per_cluster=3, k=2, iters=3, seed=7)
    assert sorted(r.doc_id for r in s3.collect()) != sorted(r.doc_id for r in s1.collect())
    # quota above the cluster size: the whole cluster, nothing invented
    s4 = topics.cluster_stratified_sample(docs, emb, per_cluster=99, k=2, iters=3)
    assert s4.count() == 20


def test_shared_centroids_one_training_pass(spark, monkeypatch):
    """A profile→sample→SemDeDup workflow over the same embeddings must
    pay exactly ONE Lloyd training when centroids are shared, and every
    output must be byte-identical to the retrain-per-call form (the
    r10 verdict's double-training finding)."""
    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.operators import semdedup as sd

    docs, emb = _corpus(spark)

    # ground truth: each operator retraining for itself
    prof_solo = sorted(map(tuple, topics.topic_profile(docs, emb, k=2, iters=3).collect()))
    samp_solo = sorted(map(tuple, topics.cluster_stratified_sample(
        docs, emb, per_cluster=3, k=2, iters=3).collect()))
    dedup_solo = sorted(map(tuple, sd.semantic_dedup(
        emb, k=2, iters=3, threshold=0.9).collect()))

    calls = {"n": 0}
    real = km.kmeans_centroids

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(km, "kmeans_centroids", counted)
    monkeypatch.setattr(topics.km, "kmeans_centroids", counted)

    cents = km.kmeans_centroids(emb, "vec_id", "embedding", k=2, iters=3)
    prof = sorted(map(tuple, topics.topic_profile(
        docs, emb, centroids=cents).collect()))
    samp = sorted(map(tuple, topics.cluster_stratified_sample(
        docs, emb, per_cluster=3, centroids=cents).collect()))
    dedup = sorted(map(tuple, sd.semantic_dedup(
        emb, centroids=cents, threshold=0.9).collect()))

    assert calls["n"] == 1  # the one explicit training; no hidden retrain
    assert prof == prof_solo
    assert samp == samp_solo
    assert dedup == dedup_solo
