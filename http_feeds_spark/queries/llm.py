"""Group D — LLM training-data pipeline operators (SURVEY.md §2.D).

Dedup (exact / MinHash-LSH / SimHash / embedding-LSH), similarity search
(brute-force cosine + IVF probe), text analysis (stats, quality, lang-id,
BPE-ish tokens, winnowing fingerprints), multimodal binary columns.

Every operator documents its 100 TB strategy: banding/bucketing instead of
all-pairs, broadcast of small side only, map-only where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_feeds_spark.functions import kmeans as km
from http_feeds_spark.functions import minhash as mh
from http_feeds_spark.functions import multimodal as mm
from http_feeds_spark.functions import text as tx
from http_feeds_spark.functions import vectors as vec
from http_feeds_spark.queries import register
from http_feeds_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# --- D1: exact dedup ---------------------------------------------------------


@register(
    "q_llm_dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    group="D",
)
def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — exact dedup by content hash: one shuffle on the 256-bit hash
    (uniform keys ⇒ no skew), min-id survivor policy. At 100 TB: hash at
    scan time so the shuffle carries 32 bytes + id per row, never the text."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# --- D2a: MinHash-LSH near-dup ----------------------------------------------


def tokenized(docs: DataFrame, analyzer: str = "standard") -> DataFrame:
    """(doc_id, tokens) — the ONE tokenization every Jaccard pipeline
    shares (functions/text.analyze — the same analyzer family the text
    index records, so near-dup shingles see "Word." and "word" as the
    same token on real corpora). Checkpointed so multi-pipeline
    consumers (near-dup n=3 + ngram-sim n=2, see `jaccard_suite`)
    tokenize the corpus exactly once."""
    return (
        docs.withColumn("tokens", tx.analyze("text", analyzer))
        .select("doc_id", "tokens")
        .localCheckpoint()
    )


def _shingled(docs: DataFrame, n: int, tokens: DataFrame | None = None) -> DataFrame:
    """(doc_id, shingles): n-word tuple-hashed shingle sets. `tokens`
    reuses a pre-tokenized table (from :func:`tokenized`) instead of
    re-tokenizing — the shared stage between the 0.5-threshold near-dup
    (n=3) and the 0.3-threshold ngram-sim (n=2) pipelines."""
    src = tokens if tokens is not None else docs.withColumn(
        "tokens", tx.analyze("text")
    ).select("doc_id", "tokens")
    return (
        src.filter(F.size("tokens") >= n)
        .withColumn("shingles", F.array_distinct(tx.hashed_word_shingles(F.col("tokens"), n)))
        .select("doc_id", "shingles")
        # barrier: the shingle table feeds three consumers (signatures +
        # both sides of the verify join); materializing it once keeps
        # Catalyst from re-optimizing the HOF lineage under each
        .localCheckpoint()
    )


def _near_dup_pairs(docs: DataFrame, tokens: DataFrame | None = None) -> DataFrame:
    """Verified MinHash-LSH near-dup pairs (a, b, jaccard) over (doc_id,
    text) rows — the shared front half of q_llm_dedup_near (pairs),
    q_llm_dedup_groups (transitive clusters) and q_llm_dedup_corpus."""
    sh = _shingled(docs, 3, tokens)
    # materialize=False: at k=32 the signature lineage is shallow enough
    # that Catalyst handles it (measured 1.09s vs 1.33s with the barrier
    # at sf0.1); the shingle checkpoint above remains the load-bearing
    # barrier (3 consumers). k=64 pipelines should keep the default.
    return mh.verified_jaccard_pairs(
        sh, k=32, bands=16, rows=2, threshold=0.5, materialize=False
    )


def jaccard_suite(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Both Jaccard pipelines off ONE tokenization pass: (near_dup_pairs
    @0.5/n=3, ngram_sim_pairs @0.3/n=2). Shingle sets differ by n so the
    signatures cannot be shared, but the tokenize-and-lower scan — the
    only stage that reads the full text — runs once. Identity with the
    independent per-query runs is pinned in tests."""
    toks = tokenized(docs)
    from http_feeds_spark.queries.extended import _ngram_sim_pairs

    return _near_dup_pairs(docs, tokens=toks), _ngram_sim_pairs(docs, tokens=toks)


@register("q_llm_dedup_near", oracle=None, group="D")
def q_llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2a — near-duplicate pairs via MinHash(32) + LSH banding (16×2).

    shingle(3-word) → signature → band-bucket equi-join → exact-Jaccard
    verify (≥ 0.5 on shingle sets). No all-pairs stage anywhere: the only
    joins are equi-joins on (band_id, band_hash) and on doc_id — the
    standard web-scale dedup shape. Signatures come from the explode +
    k×min-aggregate formulation (see functions/minhash.py) — scalar
    codegen all the way, map-side partial aggregation.

    Shingles are hashed to 64-bit longs AT CREATION (tuple-hash of the n
    token expressions — no n-gram string is ever built): the
    checkpointed shingle table and the verify join carry 8 bytes per
    shingle instead of ~25-byte strings, and set-Jaccard compares longs
    (identical result modulo 2⁻⁶⁴ collisions — immaterial beside the LSH
    approximation itself). Rows-only check (pair set depends on hash
    constants); recall asserted in tests with planted dups.
    """
    return _near_dup_pairs(_docs(spark, sf_dir).select("doc_id", "text"))


@register("q_llm_dedup_groups", oracle=None, group="D")
def q_llm_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 closure — near-dup pairs → transitive duplicate CLUSTERS with a
    min-id survivor each (cluster_id IS the survivor doc_id).

    The pair list alone does not dedup a corpus: a~b and b~c must
    collapse to ONE kept document even when a~c never surfaced as a
    pair. Pairs feed the alternating large-star/small-star connected-
    components loop (operators/components.py — O(log n) shuffle rounds,
    ids-only exchanges, no driver union-find), then one count per
    cluster. Output: (cluster_id, doc_id, is_survivor, n_members) — one
    row per clustered document. Rows-only check (pair set depends on
    hash constants); transitive-chain semantics pinned in
    tests/test_components.py.
    """
    from http_feeds_spark.operators.components import connected_components

    pairs = _near_dup_pairs(_docs(spark, sf_dir).select("doc_id", "text"))
    asg = connected_components(pairs, src="a", dst="b")
    return asg.select(
        F.col("component").alias("cluster_id"),
        F.col("node").alias("doc_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
        F.count("*").over(W.partitionBy("component")).alias("n_members"),
    )


# --- D2b: SimHash near-dup ---------------------------------------------------


@register("q_llm_dedup_multi", oracle=None, group="D")
def q_llm_dedup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 composition — MULTI-SIGNAL dedup: the connected-components
    closure is signal-agnostic, so verified pair lists from different
    detectors union into one edge set before clustering. Here:
    MinHash-LSH (shingle Jaccard ≥ 0.5) ∪ SimHash (Hamming ≤ 3). The
    signals have complementary blind spots — shingle Jaccard dies under
    token REORDERING while SimHash is order-invariant (bag-of-tokens),
    and SimHash misses partial-overlap dups that shingles catch — so
    the union clusters strictly more than either alone (pinned with a
    shuffled-copy plant in tests). Edges are ids-only either way; the
    union adds no new shuffle shape. Output: one row per clustered doc,
    flagged with which signal(s) linked it. Rows-only check."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    from http_feeds_spark.operators.components import connected_components

    # one tokenization pass feeds BOTH signals (the only stage that
    # reads full text — same sharing jaccard_suite applies)
    toks = tokenized(docs)
    near = _near_dup_pairs(docs, tokens=toks).select(
        "a", "b", F.lit("minhash").alias("signal")
    )
    sim = mh.simhash_candidates(
        mh.simhash_cols(toks, "tokens", "doc_id"), "doc_id", max_hamming=3
    ).select("a", "b", F.lit("simhash").alias("signal"))
    pairs = near.unionByName(sim)
    asg = connected_components(pairs.select("a", "b"), src="a", dst="b")
    touched = pairs.select(F.explode(F.array("a", "b")).alias("doc_id"), "signal")
    signals = touched.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("signal")).alias("signals")
    )
    return (
        asg.select(
            F.col("component").alias("cluster_id"),
            F.col("node").alias("doc_id"),
            (F.col("node") == F.col("component")).alias("is_survivor"),
        )
        .join(signals, "doc_id")
        .select(
            "cluster_id",
            "doc_id",
            "is_survivor",
            F.concat_ws("+", "signals").alias("signals"),
        )
    )


@register("q_llm_simhash", oracle=None, group="D")
def q_llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2b — SimHash(64) near-dup: Hamming distance ≤ 3 via the pigeonhole
    band trick (4×16-bit blocks; any pair within distance 3 must agree on
    ≥1 whole block, so candidates come from an equi-join on block values;
    exact distance = popcount of XOR on the packed 64-bit signatures).
    Explode + 64 conditional-sum aggregates — scalar codegen, map-side
    partial agg. Rows-only check."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    toks = docs.withColumn("tokens", tx.analyze("text")).select("doc_id", "tokens")
    sigs = mh.simhash_cols(toks, "tokens", "doc_id")
    return mh.simhash_candidates(sigs, "doc_id", max_hamming=3)


# --- D3a: brute-force cosine top-k (exact baseline) --------------------------

_COSINE_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       {vec.duck_cosine('e.embedding', 'q.qv')} AS cosine_sim
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cosine_sim DESC, e.vec_id
LIMIT 10
"""


@register("q_llm_cosine", oracle=_COSINE_ORACLE, group="D")
def q_llm_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3a — exact cosine top-10 for a query vector (vec_id 0), the
    brute-force ANN baseline. Query vector broadcast-cross-joined (1 row);
    per-row O(dim) JVM expressions; top-k = TakeOrderedAndProject (per-
    partition heaps, 10-row merge). Scales linearly — the exact-re-rank
    stage of any large ANN system. Bit-exact vs the DuckDB oracle."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", vec.cosine("embedding", "qv").alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


# --- D3b: IVF-style ANN probe search ----------------------------------------


@register("q_llm_ann_ivf", oracle=None, group="D")
def q_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3b — IVF (inverted-file) ANN: the 100 TB scale path.

    Coarse quantizer: deterministic mini k-means (Lloyd, 2 rounds, seeded
    by the 16 lowest-id vectors — functions/kmeans.py). Assignment is
    MAP-ONLY: the centroids travel as literal (cid, cvec) structs, every
    vector computes all 16 distances in one projection, argmin via
    array_min over (d2, cid) structs — no expansion join, no window, no
    shuffle. (The tempting crossJoin + row_number window hash-shuffles a
    16×-expanded corpus just to take a minimum — at 100 TB that shuffle
    IS the query cost.) The centroid update aggregates k×dim partial
    sums — the shuffle never carries vectors. A query probes only the 4
    nearest clusters (cluster list computed driver-side from the
    model-sized centroids) and exact-ranks within — touching
    ~nprobe/nlist of the data. Rows-only check; recall@10 vs the exact
    baseline asserted in tests."""
    emb = _emb(spark, sf_dir)
    cents = km.kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=2)
    assign = km.assign_clusters(emb, cents, "embedding").select(
        "vec_id", "embedding", "cluster"
    )

    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    probe = sorted(
        (sum((float(a) - float(b)) ** 2 for a, b in zip(vec, qv)), cid)
        for cid, vec in cents
    )
    probe_ids = [cid for _, cid in probe[:4]]

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        assign.filter(F.col("cluster").isin(probe_ids) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "cluster", vec.cosine("embedding", "qv").alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


@register("q_llm_ann_batch", oracle=None, group="D")
def q_llm_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3b at production shape — IVF ANN for a query TABLE (64 query
    vectors), not a per-query driver loop.

    Same deterministic IVF index as q_llm_ann_ivf; queries are assigned
    their 4 probe clusters map-only (broadcast centroid literals +
    array_sort/slice), candidates come from a BROADCAST join of the
    probe rows against the cluster-assigned corpus — the corpus never
    shuffles — and per-query top-10 is a row_number window over
    (query_id, cosine) rows that carries ids + one double, never
    vectors. Rows-only check (cluster geometry is engine-specific);
    batch recall@10 vs per-query exact is asserted in tests."""
    emb = _emb(spark, sf_dir)
    cents = km.kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=2)
    queries = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return km.ann_search_batch(
        emb, queries, cents, k=10, nprobe=4
    ).select("query_id", "vec_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")


@register("q_llm_ann_index", oracle=None, group="D")
def q_llm_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3b persisted — SEARCH-ONLY IVF ANN against a build-once index
    artifact (operators/ann_index.py: centroids + cluster-PARTITIONED
    corpus under the session warehouse dir, executor-visible on any
    cluster). The index is built on first touch and reused after —
    q_llm_ann_batch's per-call Lloyd retraining (~⅔ of its wall time) is
    gone from the steady state, so this number means "ANN search": a
    k-row centroid load, a partition-pruned corpus scan (only probed
    cluster=N/ directories are read), the broadcast probe join, and the
    per-query top-10 window. Zero training jobs in the search path and
    search ≡ q_llm_ann_batch are pinned in tests/test_ann_index.py.
    Rows-only check (cluster geometry is engine-specific)."""
    import os

    from http_feeds_spark.operators import ann_index as ai

    emb = _emb(spark, sf_dir)
    root = ai.default_root(spark, os.path.basename(sf_dir.rstrip("/")))
    ai.ensure_index(spark, emb, root, k=16, iters=2)
    queries = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ai.search(
        spark, queries, root, k=10, nprobe=4, exclude_self=True
    ).select("query_id", "vec_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")


@register("q_llm_ann_pq", oracle=None, group="D")
def q_llm_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3c — IVF+PQ compressed ANN against a persisted code index
    (operators/pq_index.py; Jégou et al. TPAMI 2011 IVFADC shape). The
    corpus rides as m=8 one-byte codes per vector instead of 64 floats
    (~32× fewer candidate-scan bytes — the tier that keeps similarity
    search interactive when the embedding column alone is tens of TB);
    search is a partition-pruned CODE scan + broadcast probe join + the
    two-HOF ADC sum, zero training jobs (pinned in tests/test_pq.py,
    with ADC exactness and planted-neighbor recall). Rows-only check:
    ADC distances are estimates by design — no SQL oracle reproduces
    the quantizer."""
    import os

    from http_feeds_spark.operators import pq_index as pqi

    emb = _emb(spark, sf_dir)
    root_tag = os.path.basename(sf_dir.rstrip("/"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/pq_index/{root_tag}"
    pqi.ensure_pq_index(spark, emb, root, nlist=16, m=8, ksub=32, iters=2)
    queries = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pqi.search(
        spark, queries, root, k=10, nprobe=4, exclude_self=True
    ).select("query_id", "vec_id", F.round("adc_d2", 6).alias("adc_d2"), "rank")


@register("q_llm_ann_pqr", oracle=None, group="D")
def q_llm_ann_pqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3c-residual — the paper's §V.B IVFADC: codebooks trained on
    coarse RESIDUALS (x − centroid(cluster(x))), so the same m·ksub
    code budget resolves within-cluster detail — better recall at
    identical storage, ADC table computed per (query, probed cluster)
    pair in the plan. Same search shape as q_llm_ann_pq otherwise
    (partition-pruned code scan, broadcast probes, zero training jobs).
    Residual ≥ flat recall on clustered data is pinned in
    tests/test_pq.py. Rows-only: ADC distances are estimates."""
    import os

    from http_feeds_spark.operators import pq_index as pqi

    emb = _emb(spark, sf_dir)
    root_tag = os.path.basename(sf_dir.rstrip("/"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/pqr_index/{root_tag}"
    try:
        pqi.ensure_pq_index(
            spark, emb, root, nlist=16, m=8, ksub=32, iters=2, residual=True
        )
    except ValueError:
        # a FRESH build at a tiny SF refuses loudly (ksub=32 exceeds the
        # ~n/nlist per-cluster residual training population at sf0.001's
        # 500 vectors — the r10 validation gate working as designed);
        # clamp ksub to what the corpus can train. The except path runs
        # ONLY on that refusal, so the benched sf0.1 build keeps the
        # exact documented parameters (and its ledger comparability).
        n = emb.count()
        pqi.ensure_pq_index(
            spark, emb, root,
            nlist=16, m=8, ksub=max(2, min(32, n // 16)), iters=2, residual=True,
        )
    queries = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pqi.search(
        spark, queries, root, k=10, nprobe=4, exclude_self=True
    ).select("query_id", "vec_id", F.round("adc_d2", 6).alias("adc_d2"), "rank")


# --- D2c: embedding near-dup via sign-band LSH -------------------------------

# vec_ids at or above this base are synthetic clones planted by
# q_llm_dedup_embed (flagged `planted` in its output), never corpus rows
PLANT_BASE = 1_000_000


@register("q_llm_dedup_embed", oracle=None, group="D")
def q_llm_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2c — embedding near-duplicate pairs (cosine ≥ 0.99) via sign-band
    LSH: the 64-dim sign pattern is cut into 4 bands of 16 signs; highly
    similar vectors agree on at least one full band (multi-probe
    pigeonhole), so candidates come from ids-only band equi-joins (see
    functions/minhash.py::sign_band_candidates — the candidate distinct
    never carries the vectors). Verified with exact cosine after
    re-joining the embeddings.

    The synthetic corpus has no natural ≥0.99 pairs at small SF, which
    would make a rows-only driver check vacuous — so the query plants 5
    deterministic SYNTHETIC clones (vec_id + PLANT_BASE, embedding ×
    1.000001) and must recover them. Every output row carries a
    ``planted`` flag so fabricated pairs are explicitly distinguishable
    from real corpus pairs; planted-duplicate recall is also asserted in
    tests."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + PLANT_BASE).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 1.000001).cast("float")).alias("embedding"),
    )
    corpus = emb.unionByName(clones)
    cand = mh.sign_band_candidates(corpus, "vec_id", "embedding", 4)
    ea = corpus.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    eb = corpus.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("cosine_sim", vec.cosine("ea", "eb"))
        .filter(F.col("cosine_sim") >= 0.99)
        .select(
            "a",
            "b",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            ((F.col("a") >= PLANT_BASE) | (F.col("b") >= PLANT_BASE)).alias("planted"),
        )
    )


# --- D2d: semantic dedup (SemDeDup) ------------------------------------------


@register("q_llm_semdedup", oracle=None, group="D")
def q_llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2d — SemDeDup semantic dedup (operators/semdedup.py): k-means
    cluster the embeddings, compare pairs only WITHIN a cluster
    (~O(N²/k) pair space, the paper's cost model), connected-components
    the ≥-threshold pairs, keep per group the member with the LOWEST
    cosine to its cluster centroid.

    Like q_llm_dedup_embed, the synthetic corpus has no natural
    near-1.0 cosine pairs at small SF, so 8 deterministic clones
    (vec_id + PLANT_BASE, ×1.000001 perturbation) are planted and must
    collapse into their source's group — pinned with k=1 brute-force
    parity and survivor-policy tests in tests/test_semdedup.py. Output:
    one row per planted-or-deduped id with its group and keep flag.
    Rows-only check (cluster geometry is engine-specific)."""
    from http_feeds_spark.operators import semdedup as sd

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + PLANT_BASE).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 1.000001).cast("float")).alias("embedding"),
    )
    corpus = emb.unionByName(clones)
    out = sd.semantic_dedup(corpus, k=8, iters=2, threshold=0.999)
    # keep only members of non-trivial duplicate groups (survivor + losers)
    return (
        out.withColumn("__gsz", F.count("*").over(W.partitionBy("component")))
        .where(F.col("__gsz") > 1)
        .select(
            "vec_id",
            "component",
            F.round("centroid_sim", 6).alias("centroid_sim"),
            "keep",
            (F.col("vec_id") >= PLANT_BASE).alias("planted"),
        )
        .orderBy("component", "vec_id")
    )


# --- D5: text stats ----------------------------------------------------------


@register(
    "q_llm_textstats",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
    group="D",
)
def q_llm_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — corpus statistics per (lang, source): doc counts, word counts,
    char totals. Map-side partial aggregation; one shuffle on the two
    low-cardinality keys."""
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tx.words("text")).cast("long")).alias("total_words"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


# --- D6: quality filter ------------------------------------------------------


@register(
    "q_llm_quality",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
           CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_word,
           CAST(len(list_filter(string_split(lower(text), ' '),
                                t -> list_contains(['the','and','of','a'], t))) AS INTEGER) AS n_stopwords,
           CAST(len(list_filter(string_split(lower(text), ' '),
                                t -> list_contains(['the','and','of','a'], t))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / n_chars AS punct_ratio
    FROM documents
    WHERE lang IN ('en', 'de', 'es')
      AND n_chars BETWEEN 100 AND 2000
      AND len(string_split(text, ' ')) >= 10
    """,
    group="D",
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — quality gate: language whitelist, length bounds, minimum word
    count; emits the per-doc quality features corpus filters key on —
    chars/word, stopword count + ratio, punctuation ratio (ASCII class so
    the Java and DuckDB regex dialects agree). Pure scan-side predicates
    and map-only projections — pushes down, no shuffle at all."""
    d = _docs(spark, sf_dir)
    n_words = F.size(tx.words("text"))
    n_stop = tx.marker_score(tx.words(F.lower("text")), ["the", "and", "of", "a"])
    n_punct = F.size(F.regexp_extract_all("text", F.lit("[.,!?;:]"), F.lit(0)))
    return (
        d.filter(F.col("lang").isin("en", "de", "es") & F.col("n_chars").between(100, 2000) & (n_words >= 10))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            n_words.alias("n_words"),
            (F.col("n_chars").cast("double") / n_words).alias("chars_per_word"),
            n_stop.alias("n_stopwords"),
            (n_stop.cast("double") / n_words).alias("stopword_ratio"),
            (n_punct.cast("double") / F.col("n_chars")).alias("punct_ratio"),
        )
    )


@register("q_llm_compress_quality", oracle=None, group="D")
def q_llm_compress_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6e (r10) — compression-ratio quality signal
    (functions/text.compression_ratio): per-doc zlib ratio (compressed
    bytes / raw UTF-8 bytes, level 6 — deterministic), the entropy
    filter of the FineWeb/DataComp-LM ablation families. Degenerate
    repetition compresses toward 0 and random junk toward/above 1, so
    corpus filters drop BOTH tails — character-level degeneracy the
    word-level Gopher rules miss. Arrow-batched map-only pandas UDF, no
    shuffle. Rows-only (zlib has no SQL twin); ordering between
    repetitive, natural, and random text is pinned in
    tests/test_repetition.py."""
    d = _docs(spark, sf_dir)
    ratio = tx.compression_ratio("text")
    return d.select(
        "doc_id",
        F.round(ratio, 6).alias("zlib_ratio"),
        (ratio < 0.95).alias("passes_entropy_ceiling"),
    ).orderBy("doc_id")


@register("q_llm_topics", oracle=None, group="D")
def q_llm_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D49 (r10) — corpus topic profiling (operators/topics.py): k-means
    over the embedding column partitions the corpus into topical
    clusters (deterministic Lloyd rounds), each labeled by its most
    frequent analyzed terms with stopwords excluded — the
    cluster-sizes-plus-labels report every curation loop reads before
    pruning/re-mixing, and the input to cluster-stratified sampling and
    the SemDeDup k choice. One training, one map-only assignment, one
    map-side-combined (cluster, term) count — shuffle bounded by
    k × vocabulary, never corpus rows. Rows-only (k-means has no SQL
    twin); planted-topic labeling, stopword exclusion, determinism,
    and the partial-agg plan pinned in tests/test_topics.py."""
    from http_feeds_spark.operators import topics

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = _emb(spark, sf_dir)
    return topics.topic_profile(docs, emb, k=8, top_terms=4, iters=2).orderBy(
        "cluster", "rank"
    )


# --- D6d: model-based quality scoring ----------------------------------------


@register("q_llm_quality_model", oracle=None, group="D")
def q_llm_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6d — trained quality classifier (functions/classifier.py): the
    fastText-style hashed-BoW logistic scorer the public pipelines run
    after heuristic gates (FineWeb-Edu's classifier stage shape): train
    in-engine (majorized Newton; one bucket-keyed aggregate +
    model-sized collect per round), then score every doc map-only
    against the broadcast weight literal.

    The synthetic corpus deliberately shares ONE vocabulary across all
    metadata (see q_llm_langid), so — like every planted fixture in this
    file — the supervision is planted: doc_id % 3 == 0 docs get a spammy
    suffix and label 0, the rest label 1; the classifier must LEARN the
    spam tokens from the labels (nothing tells it the rule) and recover
    them at high accuracy. Convergence (loss strictly decreases),
    accuracy, scoring-plan shape (zero exchanges), and determinism are
    pinned in tests/test_classifier.py. Rows-only check (model weights
    are engine-specific float paths)."""
    from http_feeds_spark.functions import classifier as clf

    nb = 1024
    d = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    "text", F.lit(" click here buy now free offer limited deal")
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            (F.col("doc_id") % 3 != 0).cast("int").alias("label"),
        )
        .select("doc_id", "label", tx.words(F.lower("text")).alias("tokens"))
        .filter(F.size("tokens") > 0)
    )
    # lr=1.8: the R=2 majorizer is worst-case-coupling conservative;
    # measured on this corpus the overstep stays monotone and halves the
    # rounds to convergence (acc 0.998 @ 16 iters vs 0.848 @ lr=1.0)
    weights, bias = clf.train_logistic(
        d, "tokens", "label", n_buckets=nb, iters=16, lr=1.8, l2=1e-5
    )
    s = clf.score(F.col("tokens"), weights, bias, nb)
    return d.select(
        "doc_id",
        "label",
        F.round(s, 6).alias("quality_score"),
        (s >= 0.5).cast("int").alias("pred"),
    )


# --- D6b: repetition filters (Gopher) ----------------------------------------


@register("q_llm_repetition", oracle=None, group="D")
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6b — Gopher/MassiveText repetition filters (Rae et al. 2021,
    Table A1): per-doc fraction of characters in the most frequent
    {2,3}-gram and in duplicated {5,10}-grams, plus the pass/fail gate at
    the paper's thresholds (top-2 ≤ 0.20, top-3 ≤ 0.18, dup-5 ≤ 0.15,
    dup-10 ≤ 0.10). The synthetic corpus is largely repetition-free, so
    3 pathological docs (flagged `planted`) are appended to prove the
    gate actually rejects; exact fraction values are pinned against an
    independent Python reference in tests/test_repetition.py.

    Scale: per-row higher-order expressions with the gram arrays
    materialized once per row (functions/text.add_repetition_stats) —
    scan-parallel, shuffle-free, codegen'd; no corpus-wide state
    (tests/test_plans.py pins the no-Exchange plan). The per-row form
    is O(G·D) in doc length; for book-length corpora the exploded
    groupBy((doc, gram)) twin exists behind
    ``add_repetition_stats(explode_over_tokens=T)`` (r15 — one shuffle,
    linear rows; equivalence pinned in tests/test_repetition.py, the
    crossover A/B in BASELINE.md). This registered query keeps the
    shuffle-free winner for its web-doc-shaped corpus; the dispatch is
    the documented switch for corpora that need it."""
    base = _docs(spark, sf_dir).select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (-1, "spam spam spam spam spam spam spam spam spam spam"),
            (-2, "one two three one two three one two three one two three"),
            (-3, ("alpha beta gamma delta epsilon zeta " * 4).strip()),
        ],
        "doc_id long, text string",
    )
    stats = tx.add_repetition_stats(
        base.unionByName(planted), "text", top_ns=(2, 3), dup_ns=(5, 10)
    )
    gate = (
        (F.col("top_2gram_frac") <= 0.20)
        & (F.col("top_3gram_frac") <= 0.18)
        & (F.col("dup_5gram_frac") <= 0.15)
        & (F.col("dup_10gram_frac") <= 0.10)
    )
    return stats.select(
        "doc_id",
        "top_2gram_frac",
        "top_3gram_frac",
        "dup_5gram_frac",
        "dup_10gram_frac",
        gate.alias("gopher_pass"),
        (F.col("doc_id") < 0).alias("planted"),
    )


# --- D6c: PII scrub ----------------------------------------------------------


@register("q_llm_pii", oracle=None, group="D")
def q_llm_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6c — PII detection + redaction (functions/pii.py): regex-stage
    scrubbing of emails / IPv4s / SSN-shapes / phone-shapes, the pass the
    public C4/Dolma/FineWeb pipelines run before release. The synthetic
    corpus is PII-free word soup, so every doc_id % 7 == 0 doc gets a
    deterministic planted PII suffix (email + IP + SSN + phone built from
    the doc_id) and the scrub must catch ALL of it — `residual_pii` (PII
    matches remaining in the scrubbed text) is emitted per row and must
    be 0 everywhere; exact per-kind counts and Python-`re` parity are
    pinned in tests/test_pii.py.

    Scale: per-row regexp built-ins in whole-stage codegen — map-only,
    shuffle-free; counts are computed on the original text (audit
    signal), the rewrite composes in a fixed documented order."""
    from http_feeds_spark.functions import pii

    base = _docs(spark, sf_dir).select("doc_id", "text")
    seeded = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                "text",
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1 ssn 123-45-6789 tel (555) 867-5309"),
            ),
        ).otherwise(F.col("text")),
    )
    out = pii.add_pii_columns(seeded, "text")
    residual = None
    for c in pii.pii_counts("scrubbed").values():
        residual = c if residual is None else residual + c
    return out.select(
        "doc_id",
        "n_pii_email",
        "n_pii_ip",
        "n_pii_ssn",
        "n_pii_phone",
        "n_pii",
        residual.alias("residual_pii"),
        (F.col("doc_id") % 7 == 0).alias("planted"),
    )


# --- D5b: BPE-ish token counting --------------------------------------------


@register(
    "q_llm_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{tx.TOKEN_RE}')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '{tx.TOKEN_RE}'))) AS INTEGER) AS n_unique_tokens
    FROM documents
    """,
    group="D",
)
def q_llm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5b — tokenizer-style counting with a BPE-ish regex (letter runs /
    digit runs / punctuation singles). regexp_extract_all is codegen'd;
    ASCII-only pattern keeps Java and RE2 dialects identical."""
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(tx.TOKEN_RE), F.lit(0))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


# --- D5c: language-ID heuristic ---------------------------------------------


def _duck_marker(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in tx.LANG_MARKERS[lang])
    return f"len(list_filter(string_split(lower(text), ' '), t -> list_contains([{lst}], t)))"


@register(
    "q_llm_langid",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_duck_marker('en')} AS s_en,
             {_duck_marker('de')} AS s_de,
             {_duck_marker('es')} AS s_es,
             {_duck_marker('fr')} AS s_fr,
             {_duck_marker('zh')} AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(s_en AS INTEGER) AS s_en, CAST(s_de AS INTEGER) AS s_de,
           CAST(s_es AS INTEGER) AS s_es, CAST(s_fr AS INTEGER) AS s_fr,
           CAST(s_zh AS INTEGER) AS s_zh,
           CASE
             WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END AS predicted_lang
    FROM s
    """,
    group="D",
)
def q_llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5c — marker-stopword language-ID heuristic: score each language by
    marker-token hits, pick the argmax with a fixed priority tie-break.
    Map-only, codegen'd. (The synthetic corpus shares one vocabulary, so
    accuracy is not meaningful here — the operator contract is.)"""
    d = _docs(spark, sf_dir)
    toks = tx.words(F.lower("text"))
    scores = {lang: tx.marker_score(toks, tx.LANG_MARKERS[lang]) for lang in tx.LANG_PRIORITY}
    df = d.select(
        "doc_id", "lang", *[scores[lang].alias(f"s_{lang}") for lang in tx.LANG_PRIORITY]
    )
    c = F.col
    pred = (
        F.when((c("s_en") >= c("s_de")) & (c("s_en") >= c("s_es")) & (c("s_en") >= c("s_fr")) & (c("s_en") >= c("s_zh")), "en")
        .when((c("s_de") >= c("s_es")) & (c("s_de") >= c("s_fr")) & (c("s_de") >= c("s_zh")), "de")
        .when((c("s_es") >= c("s_fr")) & (c("s_es") >= c("s_zh")), "es")
        .when(c("s_fr") >= c("s_zh"), "fr")
        .otherwise("zh")
    )
    return df.withColumn("predicted_lang", pred)


# --- D5d: winnowing fingerprints ---------------------------------------------


@register(
    "q_llm_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 6
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(generate_series(1, len(toks) - 2),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                  ELSE [] END AS shingles
      FROM t
    ),
    h AS (
      SELECT doc_id, list_transform(shingles, s -> substring(md5(s), 1, 16)) AS hashes
      FROM sh
    ),
    w AS (
      SELECT doc_id,
             CASE WHEN len(hashes) >= 4
                  THEN list_sort(list_distinct(list_transform(
                         generate_series(1, len(hashes) - 3),
                         i -> list_min(hashes[i:i+3]))))
                  ELSE [] END AS fps
      FROM h
    )
    SELECT doc_id,
           CAST(len(fps) AS INTEGER) AS n_fingerprints,
           fps[1] AS first_fp,
           fps[len(fps)] AS last_fp
    FROM w
    """,
    group="D",
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5d — winnowing document fingerprints (Schleimer et al. 2003):
    3-word shingles → md5-prefix hashes → min of each 4-hash sliding
    window → distinct sorted fingerprint set. String-min is engine-
    independent, so the oracle reproduces it exactly. r9: the window
    mins run EXPLODED with one keyed exchange (see
    text.add_winnow_fingerprints — the per-row array formulation was
    quadratic at runtime once Catalyst inlined the hash array into the
    per-window lambda), so cost is linear in total shingles."""
    d = _docs(spark, sf_dir)
    # the non-empty filter runs EARLY on the cheap token count
    # (>=6 tokens ⟺ >=4 windows ⟺ fps non-empty)
    staged = (
        d.withColumn("tokens", tx.words(F.lower("text")))
        .filter(F.size("tokens") >= 6)
        .withColumn("shingles", tx.word_shingles(F.col("tokens"), 3))
    )
    staged = tx.add_winnow_fingerprints(staged, "shingles", "fps", 4)
    return staged.select(
        "doc_id",
        F.size("fps").alias("n_fingerprints"),
        F.element_at("fps", 1).alias("first_fp"),
        F.element_at("fps", -1).alias("last_fp"),
    )


# --- D3c: lexical retrieval (BM25 top-k) -------------------------------------

# fixed bag-of-terms query for the registered check: common corpus words
# so df/idf, length normalization and tie-breaking are all exercised
BM25_QUERY_TERMS = ["spark", "window", "merge"]
BM25_K = 20


def _bm25_oracle() -> str:
    from http_feeds_spark.operators import retrieval as rt

    return rt.bm25_oracle_sql(BM25_QUERY_TERMS, k=BM25_K)


@register("q_llm_bm25", oracle=_bm25_oracle(), group="D")
def q_llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3c — BM25 lexical top-k retrieval (operators/retrieval.py): the
    inverted-index shape as DataFrames. Query-term filter BEFORE the
    postings aggregation (shuffle is query-sized, not corpus-sized),
    idf table broadcast (≤|query| rows), per-doc scores summed as
    DECIMAL(38,9) partials (order-independent), top-k via
    TakeOrderedAndProject with doc_id tie-break. r14 slot rotation:
    driver-oracle-checked (slot from q_stream_sliding) with the same
    formula/rounding/tie-break oracle long pinned in
    tests/test_retrieval.py."""
    from http_feeds_spark.operators import retrieval as rt

    return rt.bm25_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, k=BM25_K)


# --- D2d: corpus-frequency boilerplate removal -------------------------------

# 10-token header planted on every 7th doc so the frequency gate has a
# guaranteed recurring segment to find (the synthetic word-soup corpus
# has no natural aligned repeats at small SF — an unplanted check would
# be vacuous, the q_llm_dedup_embed convention)
BOILERPLATE_HEADER = "bp0 bp1 bp2 bp3 bp4 bp5 bp6 bp7 bp8 bp9"


def _boilerplate_oracle() -> str:
    from http_feeds_spark.operators import boilerplate as bp

    planted = (
        "SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN '"
        + BOILERPLATE_HEADER
        + " ' || text ELSE text END AS text FROM documents"
    )
    inner = bp.strip_oracle_sql(planted, n=10, min_docs=5)
    return (
        "SELECT doc_id, n_segments, n_removed, n_chars_clean FROM ("
        + inner
        + ")"
    )


@register("q_llm_boilerplate", oracle=_boilerplate_oracle(), group="D")
def q_llm_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2d — sub-document dedup: strip segments recurring across >= 5
    documents (operators/boilerplate.py: aligned 10-token frames, md5
    frequency key, anti-join + in-order re-assembly). The header planted
    on every 7th doc must come OFF while every other doc round-trips
    byte-identically. r14 slot rotation: driver-oracle-checked (slot
    from q_intersect); the full value parity INCLUDING the reconstructed
    clean_text stays pinned in tests/test_boilerplate.py."""
    from http_feeds_spark.operators import boilerplate as bp

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(BOILERPLATE_HEADER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return bp.strip_frequent_segments(docs, n=10, min_docs=5).select(
        "doc_id", "n_segments", "n_removed", "n_chars_clean"
    )


def _substr_scrub_oracle() -> str:
    from http_feeds_spark.operators import substr_dedup as sd

    return (
        "SELECT doc_id, n_tokens, dup_tokens, "
        "CAST(length(scrubbed_text) AS INTEGER) AS n_chars_scrubbed FROM ("
        + sd.scrub_oracle_sql(length=12, min_count=2)
        + ")"
    )


@register("q_llm_substr_scrub", oracle=_substr_scrub_oracle(), group="D")
def q_llm_substr_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2e — exact-substring span dedup (Lee et al. ACL 2022 ExactSubstr,
    re-expressed as distributed stride-1 window hashing in
    operators/substr_dedup.py): every >= 12-token span that repeats
    verbatim ANYWHERE in the corpus — any offset, across or within
    documents — is cut out; per-doc coverage stats ride alongside. The
    sliding-window complement of q_llm_boilerplate's aligned frames.
    r14 slot rotation: driver-oracle-checked (slot from q_join_anti);
    full value parity for the stats AND the scrubbed TEXT stays pinned
    in tests/test_substr_dedup.py."""
    from http_feeds_spark.operators import substr_dedup as sd

    return sd.scrub_duplicated_spans(
        _docs(spark, sf_dir), length=12, min_count=2
    ).select("doc_id", "n_tokens", "dup_tokens", F.length("scrubbed_text").alias("n_chars_scrubbed"))


@register("q_llm_bpe", oracle=None, group="D")
def q_llm_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D34 — in-engine BPE tokenizer training (Sennrich et al. ACL 2016
    via functions/bpe.py): ONE corpus pass builds the word-frequency
    table, then each merge round is one map-side-combined pair-count
    aggregate + one JVM fold rewrite — the corpus never sits in driver
    memory, unlike the classical implementation. Returns the learned
    merge table (rank, a, b, token) plus the corpus token count under
    it. Deterministic (lexicographic tie-break) — exact merge-sequence
    parity with a pure-Python reference implementation is pinned in
    tests/test_bpe.py. Rows-only (iterative training has no SQL twin)."""
    from http_feeds_spark.functions import bpe

    docs = _docs(spark, sf_dir)
    merges = bpe.train_bpe(docs, n_merges=24)
    total = (
        bpe.encode(docs, merges).agg(F.sum("n_tokens")).collect()[0][0]
    )
    return spark.createDataFrame(
        [
            (i, a, b, a + b, int(total))
            for i, (a, b) in enumerate(merges)
        ],
        "rank int, a string, b string, token string, corpus_tokens long",
    )


@register("q_llm_bm25_index", oracle=None, group="D")
def q_llm_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25b — SEARCH-ONLY BM25 against the persisted inverted index
    (operators/text_index.py: bucket-partitioned postings carrying doc
    length, terms store, meta last — the ann_index store pattern for
    the lexicon). Built on first touch under the warehouse dir; after
    that a query reads ≤|terms| posting buckets, never the corpus.
    search ≡ the per-query bm25_topk row for row, partition pruning,
    and the torn-build story are pinned in tests/test_text_index.py.
    Rows-only (q_llm_bm25 carries the family's DuckDB oracle)."""
    import os

    from http_feeds_spark.operators import text_index as ti

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/text_index/{os.path.basename(sf_dir.rstrip('/'))}"
    ti.ensure_text_index(spark, docs, root)
    return ti.search(spark, root, ["window", "filter", "merge"], k=10)


@register("q_llm_porter_search", oracle=None, group="D")
def q_llm_porter_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25h (r10) — retrieval under the ``standard_porter`` analyzer
    tier (functions/text.py: standard tokenization → fixed English
    stopword set → Porter stemmer as an Arrow-batched pandas UDF): the
    index is built once under the warehouse dir with the analyzer
    recorded in its meta, and BASE-FORM queries answer inflected text —
    the recall the plain standard analyzer structurally cannot give.
    Stemmer pinned against the Porter paper's own vectors, recall
    improvement + conformance-refusal row pinned in
    tests/test_analyzer.py. Rows-only (stemming has no SQL twin —
    the SQL surface refuses this analyzer loudly)."""
    import os

    from http_feeds_spark.operators import text_index as ti

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/text_index_porter/{os.path.basename(sf_dir.rstrip('/'))}"
    ti.ensure_text_index(spark, docs, root, analyzer="standard_porter")
    return ti.search(spark, root, ["window", "filter", "merge"], k=10)


@register("q_llm_phrase_search", oracle=None, group="D")
def q_llm_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25c — EXACT phrase retrieval against the positional inverted
    index (operators/text_index.phrase_search): postings carry sorted
    token positions, so "terms adjacent and in order" is answered by
    bucket-pruned posting reads + per-term doc_id equi-joins + JVM
    array_intersect on shifted position arrays (Zobel & Moffat §6.3) —
    no document reads, no UDF. Rows-only; sliding-window reference
    parity (same tokenizer), repeated-term phrases, and maintenance
    invariance are pinned in tests/test_text_index.py."""
    import os

    from http_feeds_spark.operators import text_index as ti

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/text_index/{os.path.basename(sf_dir.rstrip('/'))}"
    ti.ensure_text_index(spark, docs, root)
    return ti.phrase_search(spark, root, ["the", "data"], k=20)


@register("q_llm_proximity", oracle=None, group="D")
def q_llm_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25d — proximity/slop-k ranked retrieval (new r8): the positional
    index answers "terms in order within a window" — phrase_search's
    shifted-intersect generalized to spans ≤ (m−1)+slop via a greedy
    earliest-next-occurrence walk in pure JVM array algebra, scored by
    span tightness (adjacent match 1, one inserted word ½, …). Same
    bucket-pruned plan shape as phrase_search. Rows-only; greedy-walk
    reference parity (repeated terms included) and the slop=0 ≡
    phrase_search degeneracy are pinned in tests/test_text_index.py."""
    import os

    from http_feeds_spark.operators import text_index as ti

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/text_index/{os.path.basename(sf_dir.rstrip('/'))}"
    ti.ensure_text_index(spark, docs, root)
    return ti.proximity_search(spark, root, ["the", "data"], slop=2, k=20)


@register("q_llm_proximity_any", oracle=None, group="D")
def q_llm_proximity_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25e — UNORDERED proximity retrieval (new r8): the Lucene-default
    slop companion to q_llm_proximity — a window containing one
    occurrence of every term in ANY order, span ≤ (m−1)+slop, found by
    the classical minimal-covering-window sweep expressed as per-term
    running-max window functions (one hash exchange on doc_id, no UDF,
    no document reads; candidates pre-narrowed by per-term semi-joins).
    Rows-only; minimal-window reference parity and the
    ordered-vs-unordered split are pinned in tests/test_text_index.py."""
    import os

    from http_feeds_spark.operators import text_index as ti

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/text_index/{os.path.basename(sf_dir.rstrip('/'))}"
    ti.ensure_text_index(spark, docs, root)
    return ti.proximity_search_any(spark, root, ["the", "data"], slop=2, k=20)


@register("q_llm_vocab_growth", oracle=None, group="D")
def q_llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D37b — mergeable DISTINCT-count monitoring (streaming/monitor.py
    sketches tier): each folded batch stores Datasketches HLL sketches
    of its distinct vocabulary and doc ids; sketch union is lossless,
    so COUNT DISTINCT over any batch range — and the new-vocabulary
    drift signal |A∪B| − |A| — is answered from the store at O(sketch
    bytes), zero document re-reads. Here the documents table folds as
    three deterministic batches (doc_id mod 3) and the result reports
    per-range distinct words/docs plus each range's new-word count over
    the preceding ranges. Rows-only (estimates are deterministic);
    exact-parity and compaction-survival are pinned in
    tests/test_monitor.py."""
    import os

    from http_feeds_spark.streaming import monitor as mon

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/monitor_vocab/{os.path.basename(sf_dir.rstrip('/'))}"
    for i in range(3):
        mon.fold_batch(spark, docs.where(F.col("doc_id") % 3 == i), root, i)
    rows = []
    for i in range(3):
        d = mon.distinct_counts(spark, root, [i])
        new = (
            mon.new_vocabulary(spark, root, list(range(i)), [i]) if i else d["words"]
        )
        rows.append((i, d["words"], d["docs"], new))
    total = mon.distinct_counts(spark, root, [0, 1, 2])
    rows.append((-1, total["words"], total["docs"], 0))
    return spark.createDataFrame(
        rows, "batch int, distinct_words long, distinct_docs long, new_words long"
    ).orderBy("batch")


@register("q_llm_chunk_search", oracle=None, group="D")
def q_llm_chunk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D40b — chunk-level retrieval: the RAG read path composed from two
    parity-backed operators — chunk the corpus (operators/chunking.py)
    and BM25-rank the CHUNKS (operators/retrieval.py), so hits come
    back at sub-document granularity with provenance (doc_id,
    chunk_idx, start_tok): exactly what a retrieval consumer needs to
    quote a span. Chunk ids pack (doc_id, chunk_idx) into one long —
    collision-free while chunk_idx < 4096 (chunks ≈ tokens/stride ≪
    4096 here; the pack is an implementation detail of reusing the
    long-keyed BM25 operator, not a public id). Rows-only; both halves
    carry full DuckDB parity in their own suites."""
    from http_feeds_spark.operators import chunking as ck
    from http_feeds_spark.operators import retrieval as rt

    chunks = ck.chunk_documents(_docs(spark, sf_dir), size=32, overlap=4).select(
        (F.col("doc_id") * 4096 + F.col("chunk_idx")).alias("chunk_id"),
        "doc_id",
        "chunk_idx",
        "start_tok",
        "chunk_text",
    )
    hits = rt.bm25_topk(
        chunks, ["window", "filter", "merge"], k=10, id_col="chunk_id", text_col="chunk_text"
    ).select(F.col("doc_id").alias("chunk_id"), "score", "rank")
    # bm25_topk normalizes its id column to `doc_id` — here that carries
    # the packed chunk id; restore the real provenance by joining back
    return (
        hits.join(chunks.select("chunk_id", "doc_id", "chunk_idx", "start_tok"), "chunk_id")
        .select("rank", "doc_id", "chunk_idx", "start_tok", "score")
        .orderBy("rank")
    )


@register("q_llm_ann_rerank", oracle=None, group="D")
def q_llm_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D32b — two-stage IVFADC-R (operators/pq_index.search_rerank):
    ADC over the compressed code index shortlists 50 candidates per
    query, exact cosine against the raw-vector index re-ranks to
    top-10. Stage 1 reads code bytes; stage 2 touches raw vectors for
    only queries×50 candidate rows — at 100 TB that is the difference
    between scanning a compressed tier and scanning the embedding
    column. Zero training jobs and full-probe re-rank ≡ exact search
    are pinned in tests/test_pq.py. Rows-only."""
    import os

    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import pq_index as pqi

    emb = _emb(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    pq_root = f"{wh}/pq_index/{tag}"
    ann_root = ai.default_root(spark, tag)
    pqi.ensure_pq_index(spark, emb, pq_root, nlist=16, m=8, ksub=32, iters=2)
    ai.ensure_index(spark, emb, ann_root, k=16, iters=2)
    queries = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pqi.search_rerank(
        spark, queries, pq_root, ann_root, k=10, rerank=50, nprobe=4,
        exclude_self=True,
    ).select(
        "query_id", "vec_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


@register("q_llm_sql_search", oracle=None, group="D")
def q_llm_sql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext (r9) — the SQL-callable search surface exercised through
    the driver contract: register the pipeline views + the Spark-4 SQL
    table functions (sql.register_search_functions), then answer a BM25
    query, a phrase query, and an unordered proximity query ENTIRELY
    from spark.sql — terms as function arguments, no DataFrame API in
    the query path. Each function is pinned value-exact against its
    operator in tests/test_sql_surface.py; this entry keeps the SQL
    path on the driver's rows-only radar. Output: one row per (surface,
    rank) with the doc and its score-like measure."""
    from http_feeds_spark import sql as esql

    esql.register_pipeline_views(spark, sf_dir)
    esql.register_search_functions(spark)
    bm25 = spark.sql(
        "SELECT 'bm25' AS surface, rank, doc_id, score AS measure "
        "FROM bm25_search(array('window', 'filter', 'merge'), 10)"
    )
    phrase = spark.sql(
        "SELECT 'phrase' AS surface, rank, doc_id, CAST(n_matches AS DOUBLE) AS measure "
        "FROM phrase_search(array('window filter'), 10)"
    )
    prox = spark.sql(
        "SELECT 'proximity_any' AS surface, rank, doc_id, score AS measure "
        "FROM proximity_search_any(array('window', 'merge'), 2, 10)"
    )
    ordered = spark.sql(
        "SELECT 'proximity' AS surface, rank, doc_id, score AS measure "
        "FROM proximity_search(array('window', 'merge'), 2, 10)"
    )
    return (
        bm25.unionByName(phrase)
        .unionByName(prox)
        .unionByName(ordered)
        .orderBy("surface", "rank")
    )


@register("q_llm_hybrid_search", oracle=None, group="D")
def q_llm_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D41 — hybrid lexical+vector retrieval via Reciprocal Rank Fusion
    (Cormack, Clarke & Büttner, SIGIR 2009: score = Σ 1/(60 + rank) —
    the standard fusion used by production hybrid search). The two
    rankers are this engine's own persisted indexes: BM25 over the
    inverted index (terms of doc 0's text) and cosine over the IVF ANN
    index (doc 0's embedding as the query vector) — both search-only
    paths; the fusion itself is a tiny full-outer join of two k-row
    frames (model-sized — fusion cost is negligible by construction).
    Rows-only; each half is pinned in its own suite, and the RRF
    arithmetic is asserted in tests/test_retrieval.py."""
    import os

    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import text_index as ti

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = _emb(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")

    t_root = f"{wh}/text_index/{tag}"
    ti.ensure_text_index(spark, docs, t_root)
    # query = the first doc: its first 3 distinct words + its embedding
    qtext = docs.where(F.col("doc_id") == 0).select("text").collect()[0].text
    terms = list(dict.fromkeys(qtext.split(" ")))[:3]
    lex = ti.search(spark, t_root, terms, k=20).select(
        F.col("doc_id"), F.col("rank").alias("lex_rank")
    )

    a_root = ai.default_root(spark, tag)
    ai.ensure_index(spark, emb, a_root, k=16, iters=2)
    qvec = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sem = ai.search(spark, qvec, a_root, k=20, nprobe=4, exclude_self=True).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("sem_rank")
    )

    rrf = F.round(
        F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (60 + F.col("sem_rank")), F.lit(0.0)),
        9,
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select("doc_id", "lex_rank", "sem_rank", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )
    # 10 rows by construction (limit above): the unpartitioned-window
    # warning this rank emits is noise, not a scale bug
    w = W.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return fused.withColumn("rank", F.row_number().over(w))


def _datacard_oracle() -> str:
    from http_feeds_spark.operators import datacard as dc

    return dc.data_card_oracle_sql()


@register("q_llm_datacard", oracle=_datacard_oracle(), group="D")
def q_llm_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D35 — corpus data card (operators/datacard.py): the published
    corpus-report composition table (Gebru et al. datasheets practice)
    as ONE rollup aggregation pass — (source, lang) cells, per-source
    margins, grand total, token quantiles via the mergeable GK sketch.
    r14 slot rotation: driver-oracle-checked (slot from q_fn_math); the
    parity also stays pinned in tests/test_datacard.py."""
    from http_feeds_spark.operators import datacard as dc

    return dc.data_card(_docs(spark, sf_dir))


@register("q_llm_pca", oracle=None, group="D")
def q_llm_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D36 — in-engine PCA for embeddings (functions/pca.py): second
    moments from ONE Arrow-batched corpus pass (per-batch numpy Gram
    partials, #batches × d² doubles collected — model-sized at any
    corpus size), eigendecomposition driver-side on the d×d model,
    projection map-only against parsed component literals. Returns the
    16-dim reduction. numpy parity, whitening covariance ≈ I, layout
    independence and a zero-exchange projection plan are pinned in
    tests/test_pca.py. Rows-only (eigenbasis has no SQL twin)."""
    from http_feeds_spark.functions import pca

    emb = _emb(spark, sf_dir)
    mean, comps, scales = pca.fit(emb, k=16)
    out = pca.transform(emb, mean, comps, scales)
    return out.select(
        "vec_id", F.transform("pca", lambda x: F.round(x, 6)).alias("pca16")
    )


@register("q_llm_drift", oracle=None, group="D")
def q_llm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D37 — corpus drift gate (operators/drift.py): JS divergence over
    the unigram distribution + PSI over token counts, comparing the
    even-id half of the corpus (the "yesterday" snapshot) against the
    full corpus with a planted 10%-truncation regression — the shape an
    ingest-time drift gate sees. Vocabulary-sized joins, baseline-
    defined PSI buckets, no document ever leaves the executors. Exact
    numpy-reference parity and planted-shift sensitivity are pinned in
    tests/test_drift.py. Rows-only (driver rows carry the two scalars)."""
    from http_feeds_spark.operators import drift

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.array_join(F.slice(F.split("text", " "), 1, 12), " "),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    rep = drift.drift_report(a, b)
    return spark.createDataFrame(
        [
            (
                rep["n_docs_a"],
                rep["n_docs_b"],
                round(rep["js_words"], 6),
                round(rep["psi_tokens"], 6),
            )
        ],
        "n_docs_a long, n_docs_b long, js_words double, psi_tokens double",
    )


@register("q_llm_perplexity", oracle=None, group="D")
def q_llm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D39 — LM-perplexity quality filter (functions/ngram_lm.py): the
    CCNet gate (Wenzek et al. LREC 2020) with the bigram reference
    model trained IN-ENGINE — two aggregates over the even-id half as
    the clean reference, scoring the full corpus by one bigram equi-join
    + per-doc reduction. The model count frames stay distributed
    (web-scale bigram tables fit neither driver nor broadcast). Exact
    add-k parity with a pure-Python LM and the in-domain < alien
    discrimination contract are pinned in tests/test_ngram_lm.py.
    Rows-only (two-level smoothed join has no slot-budget SQL twin)."""
    from http_feeds_spark.functions import ngram_lm as lm

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    uni, bi, V = lm.train_bigram_lm(docs.where(F.col("doc_id") % 2 == 0))
    return lm.perplexity(docs, uni, bi, V).select(
        "doc_id", "n_scored", F.round("nll", 6).alias("nll"), F.round("ppl", 4).alias("ppl")
    )


def _chunks_oracle() -> str:
    from http_feeds_spark.operators import chunking as ck

    return (
        "SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, "
        "CAST(start_tok AS INTEGER) AS start_tok, n_tok, "
        "CAST(length(chunk_text) AS INTEGER) AS n_chars FROM ("
        + ck.chunk_oracle_sql(size=32, overlap=4)
        + ")"
    )


@register("q_llm_chunks", oracle=_chunks_oracle(), group="D")
def q_llm_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D40 — document chunking (operators/chunking.py): fixed-size
    overlapping token windows with provenance (doc_id, chunk_idx,
    start_tok) — the universal context-window / RAG pre-processing
    step. Pure map-only (one transform + posexplode, zero shuffles,
    plan-pinned). r14 slot rotation: driver-oracle-checked (slot from
    q_except); full value parity including the chunk TEXT stays pinned
    in tests/test_chunking.py."""
    from http_feeds_spark.operators import chunking as ck

    return ck.chunk_documents(_docs(spark, sf_dir), size=32, overlap=4).select(
        "doc_id", "chunk_idx", "start_tok", "n_tok", F.length("chunk_text").alias("n_chars")
    )


# --- D4: multimodal binary columns -------------------------------------------


@register(
    "q_mm_binary",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_hash
    FROM documents
    """,
    group="D",
)
def q_mm_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4a — multimodal carriage: opaque binary payload beside relational
    columns, with byte-length + content-hash metadata. Binary columns get
    their own Parquet chunk, so relational scans never touch the bytes
    (column pruning) — the load-bearing property for media at 100 TB."""
    d = mm.with_binary_payload(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("text", 256).alias("content_hash"),
    )


@register(
    "q_llm_wordfreq",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 20
    """,
    group="D",
)
def q_llm_wordfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5e — corpus word frequency: explode tokens → count → top-20.
    The canonical explode + agg + TakeOrdered pipeline; at 100 TB the
    explode is map-side and the shuffle carries (word, partial count)."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(tx.words(F.lower("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(20)
    )


@register("q_llm_cm_sketch", oracle=None, group="D")
def q_llm_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5f — count-min-sketch heavy hitters, fully sketch-driven
    (functions/sketch.py): build a 4×1024 sketch over the corpus token
    stream (one map-side-combined aggregate; the shuffle carries at most
    d×w partial counters per partition); candidates come from a
    partition-LOCAL exact top-64 (mapInPandas — ≤64 rows leave each
    partition, pigeonhole guarantees true heavy hitters surface); each
    candidate's frequency is then estimated by probing the broadcast
    sketch, top-20 by estimate. NO full-corpus exact aggregation
    anywhere — the sketch is load-bearing. One-sided error bound +
    top-recall asserted in tests. Rows-only check."""
    from http_feeds_spark.functions import sketch as sk

    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(tx.words(F.lower("text"))).alias("word"))
    cm = sk.count_min_build(toks, "word")
    cands = sk.local_top_items(toks, "word", per_partition=64)
    est = sk.count_min_estimate_df(cm, cands, "word")
    return est.orderBy(F.col("est_freq").desc(), "word").limit(20)


@register("q_llm_dedup_corpus", oracle=None, group="D")
def q_llm_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 end-to-end — the COMPLETE dedup story in one query: MinHash-LSH
    pairs → transitive closure → min-id survivor per cluster → corpus
    filtered to survivors + pass-through docs (operators/components.py
    ``dedup_corpus``). Output: one row per KEPT document with its
    cluster context (cluster_id null ⇔ doc was never clustered, i.e.
    passed through untouched; n_removed = cluster members dropped).
    All exchanges past the pair stage are ids-only; the corpus text
    never rides a closure shuffle. Rows-only check (pair set depends on
    hash constants); count invariants pinned in tests/test_components.py.
    """
    from http_feeds_spark.operators.components import connected_components

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pairs = _near_dup_pairs(docs)
    asg = connected_components(pairs, src="a", dst="b")
    clusters = asg.groupBy("component").agg(F.count("*").alias("n_members"))
    survivors = clusters.select(
        F.col("component").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("n_members") - 1).alias("n_removed"),
    )
    losers = asg.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(losers, "doc_id", "left_anti").join(
        survivors, "doc_id", "left"
    )
    return kept.select(
        "doc_id",
        "cluster_id",
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.length("text").alias("n_chars"),
    )


@register("q_llm_dedup_stream", oracle=None, group="D")
def q_llm_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 streaming twin — the near-dup closure computed INCREMENTALLY:
    the corpus arrives as three hash-batches folded into a persistent
    LSH index (streaming/dedup.py: per-batch shingle/sign, stored-band
    probe, incremental closure), then the final assignment is shaped
    like q_llm_dedup_groups. Stream ≡ batch equality is asserted
    exactly in tests/test_streaming_dedup.py. Rows-only check.

    The demo index lives under the session WAREHOUSE dir (executor-
    visible on any cluster — a driver-local tempdir would not be) and is
    removed after the fold; uuid-suffixed so concurrent invocations
    never share stores."""
    import uuid

    from http_feeds_spark.streaming import dedup as sd

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/dedup_stream_idx/{uuid.uuid4().hex}"
    try:
        for i in range(3):
            asg = sd.fold_batch(
                spark, docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i), root
            )
        # detach from the demo stores before they are removed (the fold
        # result derives from checkpointed edge sets, but pin it anyway)
        asg = asg.localCheckpoint()
    finally:
        # warehouse paths may carry a filesystem scheme (file:/, s3a://):
        # delete through the Hadoop FS API, not shutil
        try:
            p = spark._jvm.org.apache.hadoop.fs.Path(root)
            p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
        except Exception:
            pass  # best-effort cleanup of a demo artifact
    return asg.select(
        F.col("component").alias("cluster_id"),
        F.col("node").alias("doc_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
        F.count("*").over(W.partitionBy("component")).alias("n_members"),
    )


@register("q_llm_pack", oracle=None, group="D")
def q_llm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext — sequence packing (functions/sampling.py::pack_into_bins):
    documents assigned to 2048-token context-window bins by offset in
    the seed-shuffled virtual concatenation — the preprocessing step
    between a deduped corpus and a training data loader. Emits per-bin
    occupancy stats. One window over the epoch-shuffle order (a single
    range exchange). Rows-only check (bin membership follows the
    engine's hash shuffle); packing invariants + ANSI-window DuckDB
    parity pinned in tests/test_sampling.py."""
    from http_feeds_spark.functions import sampling as smp

    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(tx.words("text")).alias("n_tokens")
    )
    packed = smp.pack_into_bins(d, "n_tokens", budget=2048)
    return (
        packed.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("bin")
    )


@register("q_llm_tokenize_shards", oracle=None, group="D")
def q_llm_tokenize_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext — the corpus-to-trainer FINAL MILE composed end to end from
    parity-backed operators: BPE trained in-engine (driver merge loop,
    D34) → integer token ids minted inside the same Arrow encode pass
    (functions/bpe.encode with full_vocab) → offset packing on the REAL
    token counts (D24) → trainer-ready shards materialized in
    consumption order with the token_ids column (export_training_shards
    is column-generic). Emits per-shard (rows, tokens) plus the vocab
    size — what a training job reads before launching. Rows-only; each
    stage carries its own parity suite."""
    import os

    from http_feeds_spark.functions import bpe
    from http_feeds_spark.functions import sampling as smp

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    merges = bpe.train_bpe_driver(docs, n_merges=64)
    vocab = bpe.full_vocab(docs, merges)
    enc = bpe.encode(docs, merges, vocab=vocab).localCheckpoint()
    packed = smp.pack_into_bins(
        enc.select("doc_id", "n_tokens"), "n_tokens", budget=2048
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    out_root = f"{wh}/token_shards/{os.path.basename(sf_dir.rstrip('/'))}"
    n = smp.export_training_shards(
        enc.select("doc_id", "token_ids"),
        packed,
        out_root,
        bins_per_shard=8,
        text_col="token_ids",
    )
    shards = spark.read.parquet(out_root)
    return (
        shards.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("token_ids")).cast("long").alias("n_tokens"),
        )
        .withColumn("n_shards", F.lit(int(n)).cast("int"))
        .withColumn("vocab_size", F.lit(len(vocab)).cast("int"))
        .orderBy("shard")
    )


@register("q_llm_train_split", oracle=None, group="D")
def q_llm_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext — deterministic train/val/test split (functions/sampling.py):
    value-hash bucketing, so membership survives reruns, repartitions and
    corpus growth (new docs never move old ones between splits — the
    reproducibility property training pipelines need; Spark's
    ``df.sample`` is per-partition-seeded and has neither). Map-only.
    Rows-only check (xxhash64 partition is engine-specific); split
    invariants (disjoint, exhaustive, stable, ratio-correct) pinned in
    tests/test_sampling.py."""
    from http_feeds_spark.functions import sampling as smp

    d = _docs(spark, sf_dir)
    split = smp.with_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("split")
    )


@register("q_llm_pipeline", oracle=None, group="D")
def q_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext — the WHOLE training-corpus preparation composed
    (pipeline.py): quality gate → exact dedup → MinHash near-dedup →
    decontamination against a benchmark slice (every 97th doc — its
    corpus twin must be caught and dropped) → deterministic split →
    offset-packing of the train split. Returns the per-stage audit
    report (stage, n_docs) in pipeline order. Rows-only check;
    stage-fate and determinism invariants pinned in
    tests/test_pipeline.py."""
    from http_feeds_spark.pipeline import prepare_training_corpus

    d = _docs(spark, sf_dir)
    result = prepare_training_corpus(
        spark,
        d,
        eval_docs=d.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text"),
        pack_budget=2048,
    )
    return spark.createDataFrame(
        [(i, s, int(n)) for i, (s, n) in enumerate(result["report"])],
        "stage_idx int, stage string, n_docs long",
    )


# target domain mixture for the registered check: three named sources,
# deliberately non-uniform so two keep-fractions differ from 1.0
DOMAIN_MIX = {"src0": 0.4, "src1": 0.4, "src2": 0.2}


@register("q_llm_domain_mix", oracle=None, group="D")
def q_llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext — domain-mixture resampling (functions/sampling.py
    resample_to_mixture): downsample to the largest corpus matching the
    target per-source shares, never duplicating a row. The binding
    source keeps fraction 1.0; the others keep w_s·T/c_s by the same
    value-hash membership as the train split, so the kept set is stable
    across reruns and layouts. One |sources|-row metadata aggregate +
    one map-only filter — no data shuffle. Rows-only check (xxhash64
    membership is engine-specific); mixture/determinism/subset
    invariants pinned in tests/test_sampling.py."""
    from http_feeds_spark.functions import sampling as smp

    mixed = smp.resample_to_mixture(_docs(spark, sf_dir), DOMAIN_MIX)
    return (
        mixed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


@register("q_llm_decontaminate", oracle=None, group="D")
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext — train/test contamination detection (benchmark
    decontamination): split the corpus deterministically
    (functions/sampling.py), winnow-fingerprint both sides
    (q_llm_fingerprint's machinery), and surface test documents sharing
    ≥ 2 fingerprints with a train document.

    Scale shape: fingerprints explode map-side; the only join is an
    ids-only equi-join on the fingerprint hash (uniform md5-prefix keys);
    candidate pairs are bounded by genuinely-shared content. Boilerplate
    protection: fingerprints present in more than 100 train docs are
    dropped first (the stop-n-gram rule of standard decontamination
    pipelines) — a hot fingerprint would otherwise fan out
    quadratically. Output one row per (test_doc, train_doc) contaminated
    pair with overlap count and ratio. Rows-only check (split membership
    is hash-seeded); planted-contamination recall pinned in
    tests/test_sampling.py."""
    from http_feeds_spark.functions import sampling as smp

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return decontaminate(
        smp.with_split(d, "doc_id", {"train": 0.9, "test": 0.1})
    )


def decontaminate(
    split_docs: DataFrame,
    min_shared: int = 2,
    max_fp_train_df: int = 100,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, text, split['train'|'test']) → contaminated pairs
    (test_doc_id, train_doc_id, n_shared_fps, n_test_fps, overlap_ratio).
    See q_llm_decontaminate for the scale rationale. Fingerprints are
    computed over ANALYZED tokens (functions/text.analyze) so an eval
    question matches its corpus twin across punctuation/case variants —
    the whole point of decontamination on real text."""
    staged = split_docs.select(
        "doc_id", "split", tx.analyze("text", analyzer).alias("tokens")
    )
    return _decontaminate_tokens(staged, min_shared, max_fp_train_df)


def _fp_rows(tok_docs: DataFrame) -> DataFrame:
    """(doc_id, split, tokens) → exploded winnow-fingerprint rows
    (doc_id, split, n_fps, fp) — the map-only front of decontamination,
    split out (r16) so the pipeline can fingerprint its corpus and eval
    sides as INDEPENDENT jobs (the eval side overlaps the near-dup
    stage, guide §2.6) and union the materialized halves."""
    staged = (
        tok_docs.filter(F.size("tokens") >= 6)
        .withColumn("shingles", tx.word_shingles(F.col("tokens"), 3))
    )
    staged = tx.add_winnow_fingerprints(staged, "shingles", "fps", 4)
    return staged.select(
        "doc_id", "split", F.size("fps").alias("n_fps"), F.explode("fps").alias("fp")
    )


def _decontaminate_tokens(
    tok_docs: DataFrame,
    min_shared: int = 2,
    max_fp_train_df: int = 100,
) -> DataFrame:
    """:func:`decontaminate` over PRE-TOKENIZED rows (doc_id, split,
    tokens) — the shared back half. Split out in r16 so the pipeline
    composition can feed the near-dup stage's existing token table here
    instead of re-tokenizing the whole corpus (guide §1.2: the only
    full-text passes should be the ones that must read text)."""
    return _decontaminate_fps(
        _fp_rows(tok_docs).localCheckpoint(), min_shared, max_fp_train_df
    )


def _decontaminate_fps(
    fps: DataFrame,
    min_shared: int = 2,
    max_fp_train_df: int = 100,
) -> DataFrame:
    """Contamination pairs from MATERIALIZED fingerprint rows (the
    :func:`_fp_rows` schema; callers own the checkpoint barrier — fps
    feeds three consumers: the train side, the stop-fp rule, the test
    side)."""
    train = fps.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "fp"
    )
    # stop-fingerprint rule: boilerplate shared by many train docs carries
    # no contamination signal and would fan the join out quadratically
    rare = (
        train.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_fp_train_df)
        .select("fp")
    )
    train = train.join(rare, "fp")
    test = fps.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), F.col("n_fps").alias("n_test_fps"), "fp"
    )
    return (
        test.join(train, "fp")
        .groupBy("test_doc_id", "train_doc_id", "n_test_fps")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
        .select(
            "test_doc_id",
            "train_doc_id",
            "n_shared_fps",
            "n_test_fps",
            F.round(F.col("n_shared_fps") / F.col("n_test_fps"), 6).alias("overlap_ratio"),
        )
    )


@register("q_mm_resize", oracle=None, group="D")
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4c — image-resize plumbing (mapInPandas; deterministic stand-in
    for the PIL path — codecs absent here, see functions/multimodal.py).
    Output keeps the binary thumb column out of the checked projection."""
    d = mm.with_binary_payload(_docs(spark, sf_dir))
    resized = mm.resize_images(d, 16, 16)
    return resized.select("doc_id", "width", "height", F.length("thumb").alias("thumb_bytes"))


@register("q_mm_frames", oracle=None, group="D")
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4d — video frame-sampling plumbing: one row per sampled frame
    (row-exploding mapInPandas, the ffmpeg-sampler shape)."""
    d = mm.with_binary_payload(_docs(spark, sf_dir))
    frames = mm.sample_frames(d, 4)
    return frames.select("doc_id", "frame_idx", "frame_off", F.length("frame").alias("frame_bytes"))


@register("q_mm_audio", oracle=None, group="D")
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4e — audio loudness/clipping feature plumbing: vectorized numpy
    reduction over PCM-interpreted payload bytes inside Arrow-batched
    mapInPandas (deterministic stand-in — codecs absent; see
    functions/multimodal.py). Map-only. Rows-only check; determinism
    asserted in tests."""
    d = mm.with_binary_payload(_docs(spark, sf_dir))
    return mm.audio_features(d).select(
        "doc_id", "n_samples", F.round("rms", 9).alias("rms"), "n_clipped"
    )


@register("q_mm_flac_real", oracle=None, group="D")
def q_mm_flac_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4g FLAC tier (r12) — REAL lossless-audio decoding: deterministic
    16-bit sines are synthesized per document and encoded as FLAC with
    the subframe type rotating by doc_id through
    constant/verbatim/fixed/LPC and stereo docs cycling the
    left-side/right-side/mid-side decorrelation modes; every sixth
    payload is torn mid-frame. functions/multimodal.flac_features runs
    the NATIVE decoder (functions/flac.py — Rice residuals, predictors,
    CRC-verified frames) and reports sample-exact RMS/peak/duration.
    Sample exactness vs the source PCM is pinned in
    tests/test_flac.py. Rows-only: engine-synthesized binaries."""
    import math

    import numpy as np

    from http_feeds_spark.functions import flac as fl

    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(24).collect()]

    def flac_for(rank: int, doc_id: int) -> bytes:
        rate, n = 8000, 1600
        amp = 0.1 + (doc_id % 8) / 10.0
        freq = 200.0 + (doc_id % 16) * 50.0
        t = np.arange(n)
        mono = (amp * 32767 * np.sin(2 * math.pi * freq * t / rate)).astype(np.int64)
        sub = ["fixed2", "verbatim", "lpc", "fixed4", "fixed1"][doc_id % 5]
        if doc_id % 2:
            pcm = np.column_stack([mono, (mono * 0.5).astype(np.int64)])
            st = ["left_side", "right_side", "mid_side"][doc_id % 3]
        else:
            pcm, st = mono, "independent"
        p = fl.encode_flac(pcm, rate, blocksize=512, subframe=sub, stereo=st)
        return p[: len(p) * 2 // 3] if rank % 6 == 5 else p  # torn sixth

    d = spark.createDataFrame(
        [(i, flac_for(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    return mm.flac_features(d).select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    ).orderBy("doc_id")


@register("q_mm_mp3_real", oracle=None, group="D")
def q_mm_mp3_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4h MP3 tier (r14) — REAL lossy-audio decoding: deterministic
    sines are synthesized per document and encoded with the
    functions/mp3.py encoder twin at a doc-dependent sample rate
    cycling all three MPEG generations (MPEG-1 32k, MPEG-2 16k,
    MPEG-2.5 8k); every sixth payload is replaced with garbage bytes
    to exercise the skip-row contract. functions/multimodal.
    mp3_features runs the NATIVE Layer III decoder (frame walk,
    reservoir, Huffman, requantize, IMDCT, polyphase synthesis;
    provenance boundaries in the module docstring) and reports
    RMS/peak/duration over the decoded samples. Round-trip spectral
    exactness is pinned in tests/test_mp3.py. Rows-only:
    engine-synthesized binaries."""
    import numpy as np

    from http_feeds_spark.functions import mp3 as mp3c

    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(18).collect()]

    def mp3_for(rank: int, doc_id: int) -> bytes:
        if rank % 6 == 5:
            return b"\x00not an mpeg stream" + bytes(64)
        rate = [32000, 16000, 8000][doc_id % 3]
        amp = 0.2 + (doc_id % 6) / 10.0
        freq = rate * (0.02 + (doc_id % 8) / 100.0)
        t = np.arange(int(rate * 0.6))
        # every third healthy payload is fine-quantized (r15): the
        # encoder selects an escape table (16-23), so the driver-run
        # tier exercises the escape decode path, not just table 9
        max_q = 120 if rank % 3 == 1 else 5
        return mp3c.encode_mp3(
            amp * np.sin(2 * np.pi * freq * t / rate), rate, max_q=max_q
        )

    d = spark.createDataFrame(
        [(i, mp3_for(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    return mm.mp3_features(d).select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    ).orderBy("doc_id")


@register("q_mm_wav_real", oracle=None, group="D")
def q_mm_wav_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4g — REAL audio decoding (no stand-in): deterministic 16-bit PCM
    WAV payloads are synthesized per document (stdlib ``wave``; sine
    frequency/amplitude derived from doc_id) and decoded by the
    genuinely-real path — functions/multimodal.wav_features parses the
    RIFF container and computes RMS/peak/duration over the decoded
    samples. Sample-exactness (sine RMS = amp/√2, stereo downmix,
    junk-payload skip) is pinned in tests/test_multimodal_dedup.py.
    Rows-only: the payloads are engine-synthesized binaries."""
    import io
    import math
    import wave

    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(32).collect()]

    def wav_for(doc_id: int) -> bytes:
        rate, seconds = 8000, 0.25
        amp = 0.1 + (doc_id % 8) / 10.0
        freq = 200.0 + (doc_id % 16) * 50.0
        n = int(rate * seconds)
        frames = bytearray()
        for i in range(n):
            v = int(amp * math.sin(2 * math.pi * freq * i / rate) * 32767)
            frames += v.to_bytes(2, "little", signed=True)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(bytes(frames))
        return buf.getvalue()

    d = spark.createDataFrame(
        [(i, wav_for(i)) for i in ids], "doc_id long, payload binary"
    )
    return mm.wav_features(d).select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    )


# --- shared media-triage fixture builders ---------------------------------
# Deterministic minimal containers synthesized per (rank, doc_id), shared
# by q_mm_video_meta / q_mm_image_meta / q_mm_audio_meta and the r12
# mixed-corpus router query q_mm_media_route, so the router sees the
# EXACT payload population the per-modality probes see.


def _mm_video_payload(doc_id: int) -> bytes:
    """Minimal ISO-BMFF with one vide track (box tree hand-packed from
    the MPEG-4 Part 12 layout); every third payload torn."""
    import struct as st

    def _box(t: bytes, p: bytes) -> bytes:
        return st.pack(">I", 8 + len(p)) + t + p

    ts, dur = 600, 600 * (1 + doc_id % 9)
    w, h = 320 + 16 * (doc_id % 4), 240 + 16 * (doc_id % 3)
    codec = [b"avc1", b"hev1", b"av01"][doc_id % 3]
    mvhd = _box(b"mvhd", st.pack(">B3xIIII", 0, 0, 0, ts, dur) + b"\x00" * 80)
    tkhd = _box(
        b"tkhd",
        st.pack(">B3xIIIII", 0, 0, 0, 1, 0, 0)
        + b"\x00" * 52
        + st.pack(">II", w << 16, h << 16),
    )
    stsd = _box(b"stsd", st.pack(">B3xI", 0, 1) + st.pack(">I", 16) + codec + b"\x00" * 8)
    hdlr = _box(b"hdlr", st.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 13)
    trak = _box(b"trak", tkhd + _box(b"mdia", hdlr + _box(b"minf", _box(b"stbl", stsd))))
    full = (
        _box(b"ftyp", b"isom" + st.pack(">I", 512) + b"isomavc1")
        + _box(b"moov", mvhd + trak)
        + _box(b"mdat", b"\xab" * 32)
    )
    return full[:-9] if doc_id % 3 == 2 else full  # every third: torn


def _mm_image_payload(rank: int, doc_id: int) -> bytes:
    """Deterministic 8x8 gradient under the rank-mod-6 container mix
    (PPM / filtered PNG / baseline JPEG / progressive JPEG / paletted
    PNG / Adam7 PNG) plus GIF and WebP headers every few ranks; every
    eleventh payload torn."""
    import struct as st

    import numpy as np

    from http_feeds_spark.functions.jpeg import encode_jpeg

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    for r in range(8):
        for c in range(8):
            img[r, c] = (
                (r * 32 + doc_id) % 256,
                (c * 32 + doc_id * 3) % 256,
                (r * c + doc_id * 7) % 256,
            )
    if rank % 11 == 10:
        return mm.encode_png(img)[:20]  # torn: the skip row
    if rank % 9 == 7:
        return b"GIF89a" + st.pack("<HH", 64 + doc_id % 8, 32) + bytes([0xF7, 0, 0])
    if rank % 9 == 8:
        return (
            b"RIFF" + st.pack("<I", 30) + b"WEBP" + b"VP8 "
            + st.pack("<I", 14) + b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + st.pack("<HH", 128 + doc_id % 16, 96) + b"\x00\x00"
        )
    m = rank % 6
    if m == 1:
        return mm.encode_png(img, filter_type=rank % 5)
    if m == 2:
        return encode_jpeg(img, quality=100)
    if m == 3:
        return encode_jpeg(img, quality=100, progressive=True)
    if m == 4:
        return mm.encode_png_palette(img)
    if m == 5:
        return mm.encode_png_adam7(img)
    return b"P6\n8 8\n255\n" + img.tobytes()


def _mm_audio_payload(rank: int, doc_id: int) -> bytes:
    """Rank-mod-7 audio container mix — MPEG1-L3 CBR frames, FLAC
    STREAMINFO, RIFF/WAVE, Ogg/Opus, M4A, AAC-in-ADTS (r12) — with
    every seventh payload torn mid-frame."""
    import io
    import struct as st
    import wave

    def mp3_for() -> bytes:
        # MPEG1 Layer III 44.1 kHz 128 kbps stereo: header FF FB 90 00,
        # frame length 144*128000/44100 = 417 (pad 0)
        frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413
        return frame * (2 + doc_id % 5)

    def flac_for() -> bytes:
        sr, total = 44100, 44100 * (1 + doc_id % 7)
        bits = (sr << 44) | (1 << 41) | (15 << 36) | total
        si = bytes(10) + bits.to_bytes(8, "big") + bytes(16)
        return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si

    def wav_for() -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\x00\x00" * (800 * (1 + doc_id % 4)))
        return buf.getvalue()

    def opus_for() -> bytes:
        def page(body: bytes, granule: int, htype: int, seq: int) -> bytes:
            return (
                b"OggS" + bytes([0, htype]) + st.pack("<q", granule)
                + st.pack("<III", 1, seq, 0) + bytes([1, len(body)]) + body
            )

        head = (
            b"OpusHead" + bytes([1, 2]) + st.pack("<H", 312)
            + st.pack("<I", 48000) + b"\x00\x00\x00"
        )
        samples = 48000 * (1 + doc_id % 5) + 312
        return page(head, 0, 2, 0) + page(b"\x00" * 40, samples, 4, 1)

    def m4a_for() -> bytes:
        def _b(t: bytes, p: bytes) -> bytes:
            return st.pack(">I", 8 + len(p)) + t + p

        ts, dur = 44100, 44100 * (1 + doc_id % 6)
        mvhd = _b(b"mvhd", st.pack(">B3xIIII", 0, 0, 0, ts, dur) + b"\x00" * 80)
        stsd = _b(b"stsd", st.pack(">B3xI", 0, 1) + st.pack(">I", 16) + b"mp4a" + b"\x00" * 8)
        hdlr = _b(b"hdlr", st.pack(">B3x", 0) + b"\x00" * 4 + b"soun" + b"\x00" * 13)
        trak = _b(b"trak", _b(b"mdia", hdlr + _b(b"minf", _b(b"stbl", stsd))))
        return _b(b"ftyp", b"M4A " + st.pack(">I", 0) + b"M4A mp42") + _b(b"moov", mvhd + trak)

    def adts_for() -> bytes:
        # MPEG-4 AAC-LC 44.1 kHz stereo: profile 1, sfi 4, channel
        # config 2, one 1024-sample block per frame
        body = 13 + doc_id % 9
        flen = 7 + body
        hdr = bytes([
            0xFF, 0xF1, (1 << 6) | (4 << 2), (2 << 6) | ((flen >> 11) & 3),
            (flen >> 3) & 0xFF, ((flen & 7) << 5) | 0x1F, 0xFC,
        ])
        return (hdr + bytes(body)) * (2 + doc_id % 4)

    m = rank % 7
    if m == 0:
        return mp3_for()
    if m == 1:
        return flac_for()
    if m == 2:
        return wav_for()
    if m == 3:
        return opus_for()
    if m == 4:
        return m4a_for()
    if m == 5:
        return adts_for()
    return mp3_for()[:60]  # torn mid-frame: the skip row


@register("q_mm_video_meta", oracle=None, group="D")
def q_mm_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4i (r10) — MP4/ISO-BMFF metadata TRIAGE: deterministic minimal
    containers are synthesized per document (box tree hand-packed from
    the MPEG-4 Part 12 layout — brand/duration/resolution/codec derived
    from doc_id; every third payload deliberately torn) and triaged by
    functions/multimodal.probe_video_meta — the stdlib box walk
    extracting duration, track count, resolution, and codec fourccs
    with NO codec anywhere. Torn payloads surface as n_tracks = -1
    (skip-don't-crash, the codec-tier convention). Full video decode
    remains the documented import-gated boundary; this is the triage a
    100 TB pipeline runs FIRST. Spec-layout fixtures pinned in
    tests/test_video_meta.py. Rows-only: engine-synthesized binaries."""
    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(32).collect()]
    d = spark.createDataFrame(
        [(i, _mm_video_payload(i)) for i in ids], "doc_id long, payload binary"
    )
    return mm.probe_video_meta(d).orderBy("doc_id")


@register("q_mm_image_meta", oracle=None, group="D")
def q_mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4k (r11) — image metadata TRIAGE completing the
    image/audio/video trio: the same deterministic per-doc pixel
    patterns as q_mm_image_real ship under the rank-mod-6 container mix
    (PPM / filtered PNG / baseline JPEG / progressive JPEG / paletted
    PNG / Adam7 PNG) plus a GIF and a WebP (VP8 lossy, VP8L lossless,
    VP8X extended) header every few ranks — bare headers with no pixel
    data, which the triage must still SIZE and route (and WebP stays
    undecodable; GIF with real pixel data graduated in r12) — and
    every eleventh payload deliberately torn. probe_image_meta reads
    ONLY headers: format, dimensions, bit depth, channels, progressive
    flag; resolution/format filters run on this and only survivors pay
    a decoder. Fixtures pinned in tests/test_multimodal_dedup.py.
    Rows-only: engine-synthesized binaries."""
    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(32).collect()]
    d = spark.createDataFrame(
        [(i, _mm_image_payload(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    return mm.probe_image_meta(d).orderBy("doc_id")


@register("q_mm_audio_meta", oracle=None, group="D")
def q_mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4j (r11) — audio metadata TRIAGE, the audio sibling of
    q_mm_video_meta: deterministic minimal containers are synthesized
    per document — MPEG1 Layer III frames (header fields packed per the
    ISO 11172-3 tables, frame count varying with doc_id), FLAC
    STREAMINFO (the 20/3/5/36-bit field pack), RIFF/WAVE, Ogg/Opus
    (RFC 7845 id header + last-page granule), M4A (ISO-BMFF routed
    through the r10 box walk), and raw AAC-in-ADTS (r12 — the 7-byte
    frame-header walk) — with every seventh payload deliberately
    torn; triaged by
    functions/multimodal.probe_audio_meta, the header-only walk
    extracting codec, sample rate, channels, bit depth, bitrate,
    duration, and the VBR flag with NO sample decode anywhere. Torn
    payloads surface as sample_rate = -1 (skip-don't-crash). This is
    the decide-before-you-decode pass a 100 TB audio corpus runs FIRST;
    spec-layout fixtures pinned in tests/test_audio_meta.py. Rows-only:
    engine-synthesized binaries."""
    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(32).collect()]
    d = spark.createDataFrame(
        [(i, _mm_audio_payload(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    return mm.probe_audio_meta(d).orderBy("doc_id")


@register("q_mm_media_route", oracle=None, group="D")
def q_mm_media_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D51 capstone (r12) — the unified media ROUTER over a MIXED
    corpus: the rank-mod-4 interleave of the three per-modality fixture
    populations (images via _mm_image_payload, audio via
    _mm_audio_payload, video via _mm_video_payload — ISO-BMFF plus,
    since r13, an MJPEG-in-AVI rank the router marks DECODABLE) plus a
    plain-text unclaimed payload every fourth rank, all routed by
    functions/multimodal.probe_media_meta in ONE Arrow-batched
    metadata-only pass — modality, format, dimensions, duration, and
    the local-decodability verdict per payload, ISO-BMFF resolved by
    its TRACKS. This is the decide-before-you-decode scan a 100 TB
    mixed-media corpus runs FIRST to partition itself into
    per-modality pipelines; the torn payloads embedded in each fixture
    family surface as modality-NULL skip rows. Deterministic
    modality/format counts pinned in tests/test_audio_meta.py.
    Rows-only: engine-synthesized binaries."""
    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(48).collect()]

    def payload_for(rank: int, doc_id: int) -> bytes:
        # rank % 4 picks the arm; rank // 4 is the WITHIN-arm rank, so
        # each arm cycles its full container mix (a raw rank would pin
        # each arm to the rank%6 residues its stride happens to hit —
        # e.g. the audio arm would never see its decodable WAV slot)
        m, sub = rank % 4, rank // 4
        if m == 0:
            return _mm_image_payload(sub, doc_id)
        if m == 1:
            return _mm_audio_payload(sub, doc_id)
        if m == 2:
            if sub % 4 == 3:
                # r13: the MJPEG-in-AVI rank — the one video form the
                # engine genuinely decodes; the router must say so
                from http_feeds_spark.functions.video import encode_avi_mjpeg

                return encode_avi_mjpeg(
                    [mm.synth_image(seed=doc_id % 7, height=16, width=16)], fps=5
                )
            return _mm_video_payload(doc_id)
        return b"plain text payload %d" % doc_id  # unclaimed: skip row

    d = spark.createDataFrame(
        [(i, payload_for(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    return mm.probe_media_meta(d).orderBy("doc_id")


@register("q_mm_gif_frames", oracle=None, group="D")
def q_mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D28 animation tier (r12) — REAL animated-GIF frame sampling:
    deterministic 3-frame animations are synthesized per document
    (gradient base frame, a transparent-masked sub-rect delta, a full
    replacement; disposal method rotating with doc_id through
    keep / restore-background / restore-previous) and decoded by
    functions/multimodal.gif_frame_stats — every frame COMPOSED per
    the GIF89a protocol (GCE transparency + disposal), one stats row
    per frame. Every fifth payload is torn (an n_frames = -1 skip
    row). This is genuine multi-frame decode, not the byte-slicing
    sample_frames stand-in. Composition semantics pinned in
    tests/test_multimodal_dedup.py. Rows-only: engine-synthesized
    binaries."""
    import numpy as np

    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(24).collect()]

    def gif_for(rank: int, doc_id: int) -> bytes:
        rng = np.random.RandomState(doc_id % 97)
        pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
        f0 = pal[rng.randint(0, 8, (10, 10))]
        f1 = pal[rng.randint(0, 8, (4, 4))]
        mask = rng.rand(4, 4) < 0.5
        f2 = pal[rng.randint(0, 8, (10, 10))]
        g = mm.encode_gif_frames(
            [f0, f1, f2],
            disposals=[1, [1, 2, 3][doc_id % 3], 0],
            masks=[None, mask, None],
            positions=[(0, 0), (3, 3), (0, 0)],
        )
        return g[:40] if rank % 5 == 4 else g  # every fifth: torn

    d = spark.createDataFrame(
        [(i, gif_for(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    return mm.gif_frame_stats(d).orderBy("doc_id", "frame_idx")


@register("q_mm_image_real", oracle=None, group="D")
def q_mm_image_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4h — REAL image decoding (no stand-in): deterministic pixel
    patterns are synthesized per document (gradients derived from
    doc_id) and shipped as a MIX of containers, rank mod 9 —
    0: P6 PPM; 1: 8-bit RGB PNG (stdlib zlib deflate, r8) with a
    rotating filter type; 2: baseline JPEG at quality 100
    (functions/jpeg.py, r9 — alternating 4:4:4 / 4:2:0 so the
    chroma-upsample path runs too); 3: PROGRESSIVE JPEG (r11 — the SOF2
    successive-approximation scan protocol, alternating sampling);
    4: PALETTED PNG (r11 — PLTE lookup tier); 5: Adam7-INTERLACED PNG
    (r11 — the seven-pass protocol); 6: GIF (r12 — stdlib LZW +
    palette, alternating interlaced/sequential); 7: LOSSLESS WebP
    (r12 — VP8L canonical prefix codes, alternating plain /
    subtract-green+LZ77+cache); 8: baseline TIFF (r12 — alternating
    LZW+predictor / Deflate, both byte orders) — all decoded by the
    genuinely-real path: functions/multimodal.decode_rgb parses the
    container and image_stats/resize_rgb run on actual pixel arrays.
    PPM ≡ BMP ≡ PNG (all five filters, palette, Adam7) ≡ GIF pixel
    identity, exact channel means, exact nearest-neighbor resize, the
    JPEG round-trip tolerance, and baseline ≡ progressive
    byte-identity are pinned in tests/test_multimodal_dedup.py.
    Rows-only."""
    import numpy as np

    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(32).collect()]

    def pixels_for(doc_id: int):
        w = h = 8
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for r in range(h):
            for c in range(w):
                img[r, c] = (
                    (r * 32 + doc_id) % 256,
                    (c * 32 + doc_id * 3) % 256,
                    (r * c + doc_id * 7) % 256,
                )
        return img

    def payload_for(rank: int, doc_id: int) -> bytes:
        from http_feeds_spark.functions.jpeg import encode_jpeg

        img = pixels_for(doc_id)
        m = rank % 9
        if m == 1:
            return mm.encode_png(img, filter_type=rank % 5)
        if m == 2:
            return encode_jpeg(img, quality=100, subsample=bool(rank % 2))
        if m == 3:
            return encode_jpeg(
                img, quality=100, subsample=bool(rank % 2), progressive=True
            )
        if m == 4:
            return mm.encode_png_palette(img)
        if m == 5:
            return mm.encode_png_adam7(img)
        if m == 6:
            return mm.encode_gif(img, interlace=bool(rank % 2))
        if m == 7:
            from http_feeds_spark.functions.vp8l import encode_vp8l

            if rank % 2:
                return encode_vp8l(
                    img, subtract_green=True, use_lz77=True, cache_bits=4
                )
            return encode_vp8l(img)
        if m == 8:
            from http_feeds_spark.functions.tiff import encode_tiff

            if rank % 2:
                return encode_tiff(img, compression=5, predictor=2)
            return encode_tiff(img, compression=8, big_endian=True)
        h, w, _ = img.shape
        return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()

    d = spark.createDataFrame(
        [(i, payload_for(rank, i)) for rank, i in enumerate(ids)],
        "doc_id long, payload binary",
    )
    stats = mm.image_stats(d).select(
        "doc_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )
    thumbs = mm.resize_rgb(d, width=4, height=4).select(
        "doc_id", F.length("thumb").alias("thumb_bytes")
    )
    return stats.join(thumbs, "doc_id").orderBy("doc_id")


@register("q_mm_audio_dedup", oracle=None, group="D")
def q_mm_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29-audio (r12) — CROSS-CONTAINER audio near-dup over natively
    decoded PCM: per-document rich-spectrum signals ship as 16-bit
    WAV, and the first five docs are planted again as FLAC re-encodes
    (doc_id + 10^6) AND as lossy MP3 re-encodes (doc_id + 2*10^6, r14)
    of the SAME master — the dominant audio-dup mode in mixed crawls
    (identical recording, different container).
    functions/audiofp.py frames the decoded mono signal, takes
    per-band spectral peaks, hashes 16-frame runs into band-chunk
    keys, and pairs documents through an ids-only equi-join on
    (band, chunk, key) with a matched-fraction verify — the banded
    discipline of the MinHash/phash tiers, no all-pairs stage; the
    lossless decode guarantees the planted pairs match at similarity
    1.0 exactly. Constellation robustness and the offset boundary are
    pinned in tests/test_audiofp.py. Rows-only: engine-synthesized
    binaries."""
    import io
    import wave

    import numpy as np

    from http_feeds_spark.functions import audiofp
    from http_feeds_spark.functions import flac as fl

    ids = [int(r.doc_id) for r in _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(24).collect()]

    def master(doc_id: int):
        # one strong partial per fingerprint band, every frequency
        # drawn from the doc's seed, so distinct docs share no bands
        rng = np.random.RandomState(doc_id % 211)
        t = np.arange(20000)
        edges = (1, 4, 16, 48, 128, 288, 513)
        sig = 0.0
        for i in range(6):
            b = rng.randint(edges[i], edges[i + 1])
            sig = sig + (9000 - 900 * i) * np.sin(
                2 * np.pi * (b * 8000 / 1024) * t / 8000 + i
            )
        return (sig / (np.abs(sig).max() / 18000) + rng.randn(len(t)) * 40).astype(np.int64)

    def wav_of(x) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(x.astype("<i2").tobytes())
        return buf.getvalue()

    rows = [(i, wav_of(master(i))) for i in ids]
    rows += [
        (i + 1_000_000, fl.encode_flac(master(i), 8000, subframe="fixed2"))
        for i in ids[:5]
    ]
    # r14: LOSSY tier — the same masters as MP3 re-encodes (the dominant
    # crawl audio container; functions/mp3.py, MPEG-2.5 at this rate).
    # r15: fine quantization (max_q=120), so every planted stream runs
    # the ESCAPE-table decode path (tables 16-23 — what real encoders
    # select for non-quiet content at standard bitrates); per-band
    # spectral peak bins survive and the decoder trims its algorithmic
    # delay, so the chunk-tier constellation pairs lossy re-encode with
    # lossless master at full matched fraction.
    from http_feeds_spark.functions import mp3 as mp3c

    rows += [
        (i + 2_000_000, mp3c.encode_mp3(master(i) / 32768.0, 8000, max_q=120))
        for i in ids[:5]
    ]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return audiofp.audio_near_dup(d, min_match=0.8).orderBy("a", "b")


@register("q_mm_audio_anchor", oracle=None, group="D")
def q_mm_audio_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29-audio anchor tier (r13) — OFFSET-INVARIANT audio near-dup:
    anchor-pair constellation keys ((band, f1, f2, Δt) — no absolute
    time, prominence-gated; functions/audiofp._anchor_keys) pair a
    nonstationary melody with BOTH its FLAC re-encode (similarity 1.0,
    the container-identity guarantee carried over) and its time-shifted
    excerpt — the input class where the r12 chunk-grid tier's documented
    boundary asserts divergence (tests/test_audiofp.py pins both sides).
    Same banded discipline: ids-only (band, key) equi-join + matched-
    fraction verify, no all-pairs stage. Rows-only: engine-synthesized
    binaries."""
    import io
    import wave

    import numpy as np

    from http_feeds_spark.functions import audiofp
    from http_feeds_spark.functions import flac as fl

    def melody(seed: int, n: int = 24000):
        # DISJOINT note sets per seed (offset by seed*7 bins): anchor
        # keys carry no absolute time, so two melodies playing the SAME
        # notes in different order would share their within-note
        # (f, f, Δt) keys — the tier's documented set-similarity
        # boundary; distinct masters must differ in the notes themselves
        rng = np.random.RandomState(seed)
        notes = np.concatenate(
            [np.full(3000, 30 + seed * 7 + 40 * (i % 5)) for i in range(8)]
        )
        return (
            15000 * np.sin(2 * np.pi * np.cumsum(notes[:n] * 8000 / 1024) / 8000)
            + rng.randn(n) * 40
        ).astype(np.int64)

    def wav_of(x) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(x.astype("<i2").tobytes())
        return buf.getvalue()

    rows = []
    for k, seed in enumerate((4, 8, 9)):
        x = melody(seed)
        rows += [
            (100 + k * 10, wav_of(x)),
            (100 + k * 10 + 1, wav_of(x[700:])),  # shifted excerpt
            (100 + k * 10 + 2, fl.encode_flac(x, 8000, subframe="fixed2")),
        ]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return audiofp.anchor_near_dup(d, min_match=0.6).orderBy("a", "b")


@register("q_mm_video_dedup", oracle=None, group="D")
def q_mm_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29-video (r13) — the THIRD modality gets genuine decode + dedup,
    completing the image/audio pattern: MJPEG-in-AVI clips decode
    frame-by-frame through the native JPEG tier (functions/video.py —
    RIFF walk, every '00dc' chunk a complete JPEG), each frame is
    pixel-dHashed, and near-dup candidates come from a
    (frame_idx, block_id, block_val) pigeonhole equi-join with an exact
    per-frame Hamming verify + matched-fraction-of-frames gate — the
    banded discipline, no all-pairs stage. Two clips each ship at JPEG
    quality 95 AND quality 75 (the re-encode dup mode); re-encodes of
    one clip pair at similarity 1.0, different clips never pair, and
    text filler contributes no fingerprint rows. Rows-only:
    engine-synthesized binaries."""
    from http_feeds_spark.functions import video as fvideo

    rows = []
    for k in (0, 1):
        frames = [
            mm.synth_image(seed=k * 31 + j, height=24, width=32) for j in range(4)
        ]
        rows += [
            (300 + k * 10, fvideo.encode_avi_mjpeg(frames, fps=5, quality=95)),
            (300 + k * 10 + 1, fvideo.encode_avi_mjpeg(frames, fps=5, quality=75)),
        ]
    rows += [(500 + i, (b"plain text filler %d " % i) * 8) for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return fvideo.video_near_dup(d, min_match=0.8).orderBy("a", "b")


@register("q_mm_video_anchor", oracle=None, group="D")
def q_mm_video_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29-video anchor tier (r13 late) — OFFSET-INVARIANT video
    near-dup: (phash_t, phash_t+Δ, Δ) frame-anchor keys carry no frame
    index (functions/video.video_anchor_fingerprint), so a TRIMMED
    excerpt of a clip pairs with its master at similarity 1.0 — the
    input class where the aligned-frame tier's documented boundary
    asserts divergence (tests/test_video.py pins both sides). Same
    banded discipline: ids-only equi-join on the anchor key +
    matched-fraction verify, reusing the audio tier's pairing plan.
    Two masters, each shipped whole and trimmed by two frames; no
    cross-master pairs. Rows-only: engine-synthesized binaries."""
    from http_feeds_spark.functions import video as fvideo

    rows = []
    for k in (0, 1):
        frames = [
            mm.synth_image(seed=k * 53 + j + 7, height=24, width=32)
            for j in range(6)
        ]
        rows += [
            (400 + k * 10, fvideo.encode_avi_mjpeg(frames, fps=5, quality=95)),
            (400 + k * 10 + 1, fvideo.encode_avi_mjpeg(frames[2:], fps=5, quality=95)),
        ]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return fvideo.video_anchor_near_dup(d, min_match=0.8).orderBy("a", "b")


@register("q_mm_media_dedup", oracle=None, group="D")
def q_mm_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29c (r13) — the end-to-end mixed-corpus media dedup story in ONE
    call: a corpus carrying text, images and audio in one binary column
    is routed BY CONTENT via probe_media_meta (one metadata-only scan),
    image payloads dispatch to the pixel perceptual-hash tier
    (phash_near_dup — Hamming pigeonhole banding over decoded pixels),
    audio payloads to the spectral-constellation tier
    (audiofp.audio_near_dup — banded (band, chunk, key) equi-join over
    decoded PCM), and the UNION of the two pair sets folds into one
    connected-components assignment (operators/components.py) —
    "dedup a 100 TB crawl's media" as a single composition, every
    exchange ids-only, no all-pairs stage in any tier.

    Plants: two synthetic images each shipped as PNG+GIF+TIFF (pixel
    identity ⇒ Hamming 0), two audio masters each shipped as WAV+FLAC
    (lossless PCM identity ⇒ similarity 1.0), and — r13 late — one
    MJPEG clip shipped at JPEG quality 95 AND 75 (the re-encode dup
    mode, paired by the aligned-frame tier); word-soup text filler
    routes to modality NULL and enters no media tier. Each planted
    cluster must land as one component keyed by its min doc_id —
    cross-container image, audio AND video dups in one assignment
    table. Rows-only: engine-synthesized binaries."""
    import io
    import wave

    import numpy as np

    from http_feeds_spark.functions import audiofp
    from http_feeds_spark.functions import flac as fl
    from http_feeds_spark.functions import video as fvideo
    from http_feeds_spark.functions.tiff import encode_tiff
    from http_feeds_spark.operators.components import connected_components

    filler = (
        mm.with_binary_payload(
            _docs(spark, sf_dir).select("doc_id", "text").orderBy("doc_id").limit(40)
        ).select("doc_id", "payload")
    )
    rows = []
    for k in (0, 1):
        img = mm.synth_image(seed=k + 11)
        rows += [
            (1000 + k * 10, mm.encode_png(img)),
            (1000 + k * 10 + 1, mm.encode_gif(img)),
            (1000 + k * 10 + 2, encode_tiff(img)),
        ]

    def master(seed: int):
        # one strong partial per fingerprint band (the q_mm_audio_dedup
        # recipe), frequencies drawn from the seed so masters differ
        rng = np.random.RandomState(seed)
        t = np.arange(20000)
        edges = (1, 4, 16, 48, 128, 288, 513)
        sig = 0.0
        for i in range(6):
            b = rng.randint(edges[i], edges[i + 1])
            sig = sig + (9000 - 900 * i) * np.sin(
                2 * np.pi * (b * 8000 / 1024) * t / 8000 + i
            )
        return (sig / (np.abs(sig).max() / 18000) + rng.randn(len(t)) * 40).astype(
            np.int64
        )

    def wav_of(x) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(x.astype("<i2").tobytes())
        return buf.getvalue()

    for k, seed in enumerate((3, 7)):
        x = master(seed)
        rows += [
            (2000 + k * 10, wav_of(x)),
            (2000 + k * 10 + 1, fl.encode_flac(x, 8000, subframe="fixed2")),
        ]
    clip = [mm.synth_image(seed=j + 61, height=24, width=32) for j in range(3)]
    rows += [
        (3000, fvideo.encode_avi_mjpeg(clip, fps=5, quality=95)),
        (3001, fvideo.encode_avi_mjpeg(clip, fps=5, quality=75)),
    ]
    plants = spark.createDataFrame(rows, "doc_id long, payload binary")
    corpus = filler.unionByName(plants)

    meta = mm.probe_media_meta(corpus)
    routed = corpus.join(meta.select("doc_id", "modality", "decodable"), "doc_id")
    imgs = routed.where((F.col("modality") == "image") & F.col("decodable"))
    auds = routed.where((F.col("modality") == "audio") & F.col("decodable"))
    vids = routed.where((F.col("modality") == "video") & F.col("decodable"))
    edges = (
        mm.phash_near_dup(imgs, max_hamming=2)
        .select("a", "b")
        .unionByName(audiofp.audio_near_dup(auds, min_match=0.8).select("a", "b"))
        .unionByName(fvideo.video_near_dup(vids, min_match=0.8).select("a", "b"))
    )
    assign = connected_components(edges)
    return (
        assign.join(
            meta.select(F.col("doc_id").alias("node"), "modality"), "node"
        )
        .select("node", "component", "modality")
        .orderBy("node")
    )


@register("q_mm_media_store", oracle=None, group="D")
def q_mm_media_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D30-media (r13) — the PERSISTED media store driven from the
    registry: a deterministic mixed corpus (two images × PNG/GIF/TIFF,
    one audio master × WAV/FLAC, one MJPEG clip × two JPEG qualities,
    text filler) folds into the warehouse store on first touch
    (streaming/media.fold_batch — per-doc-id idempotent, so the refold
    on later runs is a no-op), and the answer comes FROM THE STORE with
    no payload re-read: read_meta modality/decodable counts left-joined
    with near_dup_pairs pair counts across all THREE fingerprint tiers.
    The full lifecycle (two-wave platform e2e, erasure + purge, fsck
    family, epoch pins, crash windows, maintenance) is pinned in
    tests/test_media_store.py and tests/test_video.py; the fold/purge
    write frames are linted in tests/test_build_plan_lint.py.
    Rows-only: engine-synthesized binaries."""
    import io
    import os
    import wave

    import numpy as np

    from http_feeds_spark.functions import flac as fl
    from http_feeds_spark.functions.tiff import encode_tiff
    from http_feeds_spark.streaming import media as smedia

    rows = []
    for k in (0, 1):
        img = mm.synth_image(seed=k + 41, height=32, width=40)
        rows += [
            (1000 + k * 10, mm.encode_png(img)),
            (1000 + k * 10 + 1, mm.encode_gif(img)),
            (1000 + k * 10 + 2, encode_tiff(img)),
        ]
    rng = np.random.RandomState(6)
    t = np.arange(12000)
    edges = (1, 4, 16, 48, 128, 288, 513)
    sig = 0.0
    for i in range(6):
        b = rng.randint(edges[i], edges[i + 1])
        sig = sig + (9000 - 900 * i) * np.sin(2 * np.pi * (b * 8000 / 1024) * t / 8000 + i)
    x = (sig / (np.abs(sig).max() / 18000) + rng.randn(12000) * 40).astype(np.int64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.astype("<i2").tobytes())
    rows += [(2000, buf.getvalue()), (2001, fl.encode_flac(x, 8000, subframe="fixed2"))]
    from http_feeds_spark.functions import video as fvideo

    clip = [mm.synth_image(seed=j + 51, height=24, width=32) for j in range(3)]
    rows += [
        (3000, fvideo.encode_avi_mjpeg(clip, fps=5, quality=95)),
        (3001, fvideo.encode_avi_mjpeg(clip, fps=5, quality=75)),
    ]
    filler = (
        mm.with_binary_payload(
            _docs(spark, sf_dir).select("doc_id", "text").orderBy("doc_id").limit(30)
        ).select("doc_id", "payload")
    )
    corpus = filler.unionByName(
        spark.createDataFrame(rows, "doc_id long, payload binary")
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    root = f"{wh}/media_store_r13/{os.path.basename(sf_dir.rstrip('/'))}"
    smedia.fold_batch(spark, corpus, root)

    meta_counts = smedia.read_meta(spark, root).groupBy("modality").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("decodable").cast("int")).alias("n_decodable"),
    )
    pair_counts = (
        smedia.near_dup_pairs(spark, root, max_hamming=2)
        .groupBy("modality")
        .agg(F.count("*").alias("n_pairs"))
    )
    return (
        meta_counts.join(pair_counts, "modality", "left")
        .withColumn("n_pairs", F.coalesce("n_pairs", F.lit(0)))
        .orderBy(F.col("modality").asc_nulls_first())
    )


@register("q_mm_phash_dedup", oracle=None, group="D")
def q_mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4f — image near-dup by perceptual hash (dHash): 64-bit
    difference-hash per payload — r13: hashed from DECODED PIXELS for
    every decode_rgb-able payload, byte-grid fallback for the rest —
    then Hamming pigeonhole banding, the SAME block equi-join machinery
    as text SimHash, reused byte-for-byte
    (functions/multimodal.phash_near_dup).

    Two plant tiers: (1) byte tier — the word-soup corpus payloads are
    undecodable, so 5 text clones (doc_id + PLANT_BASE, same-width char
    swaps) must pair within the Hamming radius; (2) pixel tier (r13) —
    three synthetic images each shipped as PNG, GIF, TIFF, PPM, and a
    quality-90 JPEG re-encode (doc_id ≥ 2·PLANT_BASE): the lossless
    containers of one image MUST pair at Hamming 0 — the dominant
    cross-container image-dup mode the byte tier could never see.
    Pinned plus a Python dHash parity check in
    tests/test_multimodal_dedup.py. Rows-only (hash-seeded values per
    SURVEY §2's rows-only rationale)."""
    from http_feeds_spark.functions.jpeg import encode_jpeg
    from http_feeds_spark.functions.tiff import encode_tiff

    base = _docs(spark, sf_dir).select("doc_id", "text")
    clones = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + PLANT_BASE).alias("doc_id"),
        # same-length perturbation: overwrite 3 contiguous chars, so the
        # sampling step is unchanged and only adjacent grid cells move —
        # the re-encode-noise analogue for the byte-grid stand-in
        F.overlay("text", F.lit("zzz"), 10).alias("text"),
    )
    img_base = 2 * PLANT_BASE
    img_rows = []
    for k in range(3):
        img = mm.synth_image(seed=k)
        containers = (
            mm.encode_png(img),
            mm.encode_gif(img),
            encode_tiff(img),
            b"P6 %d %d 255\n" % (img.shape[1], img.shape[0]) + img.tobytes(),
            encode_jpeg(img, quality=90),
        )
        img_rows += [(img_base + k * 10 + j, p) for j, p in enumerate(containers)]
    imgs = spark.createDataFrame(img_rows, "doc_id long, payload binary")
    d = (
        mm.with_binary_payload(base.unionByName(clones))
        .select("doc_id", "payload")
        .unionByName(imgs)
    )
    pairs = mm.phash_near_dup(d, max_hamming=10)
    return pairs.select(
        "a",
        "b",
        "hamming",
        ((F.col("a") >= PLANT_BASE) | (F.col("b") >= PLANT_BASE)).alias("planted"),
        (F.col("a") >= img_base).alias("pixel_tier"),
    ).orderBy("a", "b")


@register("q_mm_features", oracle=None, group="D")
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4b — Arrow-batched feature extraction over binary payloads via
    mapInPandas (deterministic byte-histogram stand-in for the real image
    decoder — codecs absent in this container; see
    functions/multimodal.py). Map-only: scales linearly, no shuffle.
    Rows-only check; determinism asserted in tests."""
    d = mm.with_binary_payload(_docs(spark, sf_dir))
    feats = mm.extract_features(d)
    return feats.select("doc_id", "n_bytes", F.round(F.element_at("features", 1), 9).alias("f0"))
