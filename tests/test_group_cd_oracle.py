"""Group C (stream-replay) and Group D (LLM-pipeline) oracle parity +
semantic tests for the rows-only operators."""

from __future__ import annotations

import pytest

ORACLE_QUERIES = [
    # C
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_watermark",
    # D
    "q_llm_dedup_exact",
    "q_llm_cosine",
    "q_llm_textstats",
    "q_llm_quality",
    "q_llm_tokens",
    "q_llm_langid",
    "q_llm_fingerprint",
    "q_llm_wordfreq",
    "q_mm_binary",
    # promoted to driver-oracle slots in round 4 (freed by the A14/A6 merges)
    "q_range_join",
    "q_hyper_rollup",
]

ROWS_ONLY = [
    "q_llm_dedup_near",
    "q_llm_simhash",
    "q_llm_dedup_embed",
    "q_llm_ann_ivf",
    "q_llm_cm_sketch",
    "q_llm_dedup_groups",
    "q_llm_ann_batch",
    "q_mm_features",
    "q_mm_resize",
    "q_mm_frames",
    "q_mm_audio",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_harness import check_query

    report = check_query(spark, name, sf_dir)
    assert report["match"], report


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    from http_feeds_spark.queries import registry

    df = registry()[name].fn(spark, sf_dir)
    assert df.count() >= 0


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    """Planted-duplicate recall: clone 5 docs with one word dropped; the
    MinHash-LSH pipeline must pair each clone with its original."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import minhash as mh
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    clones = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.expr("substring(text, 1, length(text) - instr(reverse(text), ' '))").alias("text"),
        )
    )
    corpus = docs.unionByName(clones)
    sh = (
        corpus.withColumn("tokens", tx.words(F.lower("text")))
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", F.array_distinct(tx.word_shingles(F.col("tokens"), 3)))
        .select("doc_id", "shingles")
    )
    cands = mh.minhash_candidates(sh)
    a = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b"))
    pairs = (
        cands.join(a, "a").join(b, "b")
        .withColumn("j", mh.jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("j") >= 0.5)
        .select("a", "b")
        .collect()
    )
    found = {(r.a, r.b) for r in pairs}
    for i in range(5):
        assert (i, i + 1_000_000) in found, f"planted near-dup {i} not found; got {found}"


def test_embed_lsh_finds_planted_near_dups(spark, sf_dir):
    """Sign-band LSH must recover planted ~identical embeddings — the
    registered q_llm_dedup_embed plants its own clones (vec_id + 1e6), so
    the production query itself is the recall fixture."""
    from http_feeds_spark.queries import registry

    pairs = registry()["q_llm_dedup_embed"].fn(spark, sf_dir).collect()
    found = {(r.a, r.b) for r in pairs}
    for i in range(5):
        assert (i, i + 1_000_000) in found
    assert all(r.cosine_sim >= 0.99 for r in pairs)
    # fabricated pairs must be explicitly flagged via the planted column
    by_pair = {(r.a, r.b): r.planted for r in pairs}
    for i in range(5):
        assert by_pair[(i, i + 1_000_000)] is True
    assert all(r.planted == (r.a >= 1_000_000 or r.b >= 1_000_000) for r in pairs)


def test_count_min_bounds_and_merge(spark, sf_dir):
    """CM contract: estimate ≥ true count (one-sided), within the e·N/w
    additive bound for heavy hitters; merging two shard sketches equals
    the whole-corpus sketch exactly."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import sketch as sk
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tx.words(F.lower("text"))).alias("word"))
    exact = {r.word: r["count"] for r in toks.groupBy("word").count().collect()}
    total = sum(exact.values())
    top = sorted(exact, key=lambda w: (-exact[w], w))[:20]

    cm = sk.count_min_build(toks, "word")
    est = sk.count_min_estimate(cm, top)
    bound = (3 * total) // 1024 + 1
    for w in top:
        assert exact[w] <= est[w] <= exact[w] + bound, (w, exact[w], est[w])

    # mergeability: shard sketches add up to the whole-corpus sketch
    a = sk.count_min_build(toks.filter(F.col("doc_id") % 2 == 0), "word")
    b = sk.count_min_build(toks.filter(F.col("doc_id") % 2 == 1), "word")
    merged = {(r.row, r.idx): r.cnt for r in sk.count_min_merge(a, b).collect()}
    whole = {(r.row, r.idx): r.cnt for r in cm.collect()}
    assert merged == whole


def test_cm_sketch_query_is_sketch_driven(spark, sf_dir):
    """The registered heavy-hitter query must be sketch-driven end to
    end: candidates from the partition-local top pass, frequencies from
    the distributed sketch probe. Contract: exact top-5 words all
    surface in the top-20 output, every estimate respects the one-sided
    CM bound (est ≥ true), and the distributed probe agrees with the
    driver-side estimator bit-for-bit."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import sketch as sk
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.queries import registry
    from http_feeds_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.words(F.lower("text"))).alias("word"))
    exact = {r.word: r["count"] for r in toks.groupBy("word").count().collect()}
    top5 = set(sorted(exact, key=lambda w: (-exact[w], w))[:5])

    out = registry()["q_llm_cm_sketch"].fn(spark, sf_dir).collect()
    assert len(out) == 20
    got = {r.word: r.est_freq for r in out}
    assert top5 <= set(got), (top5, set(got))
    for w, est in got.items():
        assert est >= exact.get(w, 0), (w, est, exact.get(w))

    # distributed probe ≡ driver-side estimator on the same candidates
    cm = sk.count_min_build(toks, "word")
    driver_est = sk.count_min_estimate(cm, sorted(got))
    assert {w: driver_est[w] for w in got} == got


def test_kmeans_deterministic_and_improves(spark, sf_dir):
    """IVF training contract: bit-identical centroids across runs (no
    RNG, decimal sums) and Lloyd rounds never worsen the quantization
    cost vs the raw seeds."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    trained = km.kmeans_centroids(emb, k=8, iters=2)
    again = km.kmeans_centroids(emb, k=8, iters=2)
    assert trained == again
    seeds = km.kmeans_centroids(emb, k=8, iters=0)

    def cost(cents):
        best = F.array_min(
            F.transform(
                km._centroid_literal(cents),
                lambda c: F.struct(
                    km.sq_dist(F.col("embedding"), c["cvec"]).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        return emb.select(F.sum(best["d2"]).alias("c")).collect()[0].c

    assert cost(trained) <= cost(seeds)


def test_ann_ivf_recall(spark, sf_dir):
    """IVF probe search must recover most of the exact top-10."""
    from http_feeds_spark.queries import registry

    exact = [r.vec_id for r in registry()["q_llm_cosine"].fn(spark, sf_dir).collect()]
    approx = [r.vec_id for r in registry()["q_llm_ann_ivf"].fn(spark, sf_dir).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, (recall, exact, approx)


def test_ann_ivf_full_probe_is_exact(spark, sf_dir):
    """IVF soundness: probing ALL clusters must reproduce the exact
    brute-force top-10 — the partition into clusters loses nothing; only
    probe narrowing approximates."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.functions import vectors as vec
    from http_feeds_spark.queries import registry
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = km.kmeans_centroids(emb, k=16, iters=2)
    assign = km.assign_clusters(emb, cents, "embedding")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    full = [
        r.vec_id
        for r in (
            assign.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select("vec_id", vec.cosine("embedding", "qv").alias("cs"))
            .orderBy(F.col("cs").desc(), "vec_id")
            .limit(10)
        ).collect()
    ]
    exact = [r.vec_id for r in registry()["q_llm_cosine"].fn(spark, sf_dir).collect()]
    assert full == exact


@pytest.mark.parametrize("name", ["q_mm_features", "q_mm_audio"])
def test_mm_features_deterministic(spark, sf_dir, name):
    from http_feeds_spark.queries import registry

    fn = registry()[name].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0


def test_audio_features_frame_bytes_dtypes(spark, sf_dir):
    """audio_features must decode samples at the declared width: a payload
    of n bytes yields n samples at frame_bytes=1, n//2 at 2, n//4 at 4;
    unsupported widths are rejected up front."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import multimodal as mm
    from http_feeds_spark.sources.tables import load_table

    d = mm.with_binary_payload(load_table(spark, sf_dir, "documents").limit(8))
    n_bytes = {r.doc_id: r.n_bytes for r in d.select(
        "doc_id", F.length("payload").alias("n_bytes")).collect()}
    for fb in (1, 2, 4):
        rows = mm.audio_features(d, frame_bytes=fb).collect()
        for r in rows:
            expect = n_bytes[r.doc_id] // fb
            assert r.n_samples == max(expect, 1), (fb, r.doc_id)
            assert 0.0 <= r.peak <= 1.0  # full-scale normalization per width
    with pytest.raises(ValueError):
        mm.audio_features(d, frame_bytes=3)


def test_ann_batch_recall_and_full_probe(spark, sf_dir):
    """Batched ANN (query TABLE): mean recall@10 vs per-query exact must
    be >= the single-query bar (0.5), and full-probe (nprobe = nlist)
    must reproduce the exact top-10 for EVERY query — the cluster
    partition loses nothing, only probe narrowing approximates."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.functions import vectors as vec
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = km.kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=2)
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # per-query exact top-10 via brute force (the semantic reference)
    q = queries.select("query_id", F.col("embedding").alias("qv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", vec.cosine("embedding", "qv").alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .collect()
    )
    want: dict[int, set] = {}
    for r in exact:
        want.setdefault(r.query_id, set()).add(r.vec_id)

    approx = km.ann_search_batch(emb, queries, cents, k=10, nprobe=4).collect()
    got: dict[int, set] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(got) == set(want)
    recalls = [len(got[qid] & want[qid]) / 10 for qid in want]
    assert sum(recalls) / len(recalls) >= 0.5, recalls

    full = km.ann_search_batch(emb, queries, cents, k=10, nprobe=16).collect()
    got_full: dict[int, set] = {}
    for r in full:
        got_full.setdefault(r.query_id, set()).add(r.vec_id)
    assert got_full == want


def test_ann_batch_corpus_never_shuffles(spark, sf_dir):
    """Plan guard: with broadcast_queries the candidate join must be a
    BroadcastHashJoin whose STREAMED (corpus) subtree contains a parquet
    scan and NO shuffle exchange — asserted by walking the physical plan
    TREE (plans/inspect.py), not by slicing the rendered string, so the
    guard binds to operator structure and survives layout changes."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = km.kmeans_centroids(emb, "vec_id", "embedding", k=4, iters=1)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = km.ann_search_batch(emb, queries, cents, k=5, nprobe=2)
    root = pi.physical_root(df)
    joins = pi.find_nodes(root, lambda n: n == "BroadcastHashJoin")
    assert len(joins) == 1, pi.subtree_names(root)
    # the broadcast side carries a Broadcast* exchange/stage; the other
    # child is the streamed corpus side — it must scan parquet directly
    # with no shuffle anywhere beneath it
    sides = [pi.subtree_names(c) for c in pi.plan_children(joins[0])]
    streamed = [
        names for names in sides if not any(n.startswith("Broadcast") for n in names)
    ]
    assert len(streamed) == 1, sides
    assert any(n.startswith("Scan parquet") for n in streamed[0]), streamed
    assert not any(
        n == "Exchange" or "ShuffleQueryStage" in n for n in streamed[0]
    ), streamed


def test_ann_batch_exclude_self_external_queries(spark, sf_dir):
    """exclude_self contract: with an EXTERNAL query table whose ids are
    unrelated to corpus ids, exclude_self=False must NOT drop the corpus
    row whose vec_id collides with a query_id; the default (True) serves
    the queries-from-corpus case."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = km.kmeans_centroids(emb, "vec_id", "embedding", k=4, iters=1)
    # external queries: ids 0..3 reused by coincidence, vectors COPIED
    # from corpus rows 0..3 so the colliding corpus row is its own top hit
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with_self = km.ann_search_batch(
        emb, queries, cents, k=5, nprobe=4, exclude_self=False
    ).collect()
    top1 = {r.query_id: r.vec_id for r in with_self if r.rank == 1}
    # cosine(v, v) = 1 is maximal: each external query must see the
    # id-colliding corpus row, ranked first
    assert top1 == {q: q for q in range(4)}, top1
    without = km.ann_search_batch(emb, queries, cents, k=5, nprobe=4).collect()
    assert all(r.vec_id != r.query_id for r in without)


def test_centroid_literal_accepts_non_finite_values(spark, sf_dir):
    """The SQL-rendered centroid literal must accept the same domain the
    old F.lit path did: a NaN/Infinity-poisoned centroid mean must build
    a valid plan (assignment semantics: NaN distances lose the argmin)."""
    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    cents = [
        (0, [float("nan")] * 64),
        (1, [float("inf")] * 64),
        (2, [0.0] * 64),
    ]
    out = km.assign_clusters(emb, cents, "embedding").select("vec_id", "cluster")
    rows = out.collect()
    assert len(rows) == 50
    # the finite centroid wins every argmin over NaN/Inf distances
    assert {r.cluster for r in rows} == {2}
