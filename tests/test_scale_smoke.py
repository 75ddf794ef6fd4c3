"""Scale smoke: the LSH dedup pipeline at ~5× the sf0.1 corpus.

Small-SF oracle tests prove correctness; this test probes the property
the engine is actually designed for — that the banded candidate set
stays near-linear in corpus size (no quadratic blowup) and recall holds
as the corpus grows. The corpus is synthesized by word-salting each
document per copy (every token gets a copy-suffix), so copies share NO
shingles and cannot create cross-copy near-dup pairs; 5 planted clones
are the recall fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_minhash_dedup_at_5x_corpus(spark):
    from http_feeds_spark.functions import minhash as mh
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.sources.tables import load_table

    # pinned to the largest local SF (5000 docs → 25005-doc corpus); the
    # point is growth behavior, so the tiny default test SF won't do
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    n_base = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit((i + 1) * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", rf"$1c{i}").alias("text"),
        )
        for i in range(4)
    ]
    corpus = base
    for c in copies:
        corpus = corpus.unionByName(c)
    # planted near-dups: clone 5 docs with the last word dropped
    clones = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, 1, length(text) - instr(reverse(text), ' '))").alias("text"),
    )
    corpus = corpus.unionByName(clones)
    n_corpus = corpus.count()
    assert n_corpus == 5 * n_base + 5

    sh = (
        corpus.withColumn("tokens", tx.words(F.lower("text")))
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", F.array_distinct(tx.word_shingles(F.col("tokens"), 3)))
        .select("doc_id", "shingles")
        .localCheckpoint()
    )
    cands = mh.minhash_candidates(sh, materialize=False).localCheckpoint()
    n_cands = cands.count()
    # near-linear candidate volume: the banding must not degrade toward
    # all-pairs as the corpus grows (all-pairs here would be ~3×10⁸)
    assert n_cands < 20 * n_corpus, (n_cands, n_corpus)

    a = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b"))
    found = {
        (r.a, r.b)
        for r in (
            cands.join(a, "a").join(b, "b")
            .withColumn("j", mh.jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("j") >= 0.5)
            .select("a", "b")
            .collect()
        )
    }
    for i in range(5):
        assert (i, i + 1_000_000) in found, f"planted dup {i} lost at 5x scale"


def test_positional_retrieval_at_sf01(spark, tmp_path):
    """Retrieval smoke at the largest local SF (5000 docs): the
    positional index's phrase / ordered-proximity / unordered-proximity
    answers still equal their pure-python references when the corpus is
    50× the unit-test fixture — catching partition-sensitive bugs in
    the position arrays and window sweeps."""
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.sources.tables import load_table
    from tests.test_text_index import (
        _phrase_counts_reference,
        _proximity_any_reference,
        _proximity_reference,
    )

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    toks = docs.select(tx.words(F.col("text")).alias("t")).limit(1).collect()[0].t
    phrase = [toks[0], toks[1]]

    want = _phrase_counts_reference(spark, docs, phrase)
    got = {
        r.doc_id: r.n_matches
        for r in ti.phrase_search(spark, root, phrase, k=1_000_000).collect()
    }
    assert got == want and len(got) > 0

    terms = [toks[0], toks[2]]
    wp = _proximity_reference(spark, docs, terms, 2)
    gp = {
        r.doc_id: (r.n_matches, r.best_span, r.score)
        for r in ti.proximity_search(spark, root, terms, slop=2, k=1_000_000).collect()
    }
    assert gp == wp

    wa = _proximity_any_reference(spark, docs, terms, 2)
    ga = {
        r.doc_id: (r.n_matches, r.best_span, r.score)
        for r in ti.proximity_search_any(
            spark, root, terms, slop=2, k=1_000_000
        ).collect()
    }
    assert ga == wa


# --- r14 skew witnesses -------------------------------------------------------
#
# SCALING.md's two skew promises, witnessed EMPIRICALLY instead of argued:
# the compaction row ("map-side partial aggregation ships one candidate row
# per subject per task before the exchange") and the dedup row ("skewed
# band buckets split across tasks by AQE"). Both plant the hot key at
# sf0.1 and read what actually happened — SQL metrics for the aggregate,
# the AQE skew-split markers for the join.


def test_hot_subject_compaction_partial_agg_witness(spark):
    """50% of a 100k-event feed on ONE subject: the max_by partial
    aggregate must combine the hot key map-side, so the exchange carries
    ~(tasks x subjects) candidate rows — never the hot key's 50k."""
    from pyspark.sql import functions as F

    from http_feeds_spark import plans
    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.queries.feed_queries import _feed

    f = _feed(spark, "/root/testdata/sf0.1")
    skewed = f.withColumn(
        "subject",
        F.when(F.col("seq") % 2 == 0, F.lit("HOT")).otherwise(F.col("subject")),
    ).repartition(8)  # multiple map tasks, as any real scan would have
    n_events = f.count()
    n_subjects = skewed.select("subject").distinct().count()
    n_hot = n_events // 2

    c = ops.compact(skewed)
    rows = c.collect()
    assert len(rows) == n_subjects
    hot = [r for r in rows if r.subject == "HOT"]
    assert len(hot) == 1
    # the hot subject's survivor is the max even seq
    max_even = skewed.where(F.col("subject") == "HOT").agg(F.max("seq")).collect()[0][0]
    assert hot[0].seq == max_even

    # the witness: partial aggregate output rows reached the exchange
    partials = [
        n
        for n in plans.find_nodes(
            plans.physical_root(c), lambda nm: "Aggregate" in nm
        )
        if "partial_max_by" in plans.node_line(n, 400)
    ]
    assert partials, "no partial max_by node in the executed plan"
    shipped = sum(plans.node_metric(n, "numOutputRows") for n in partials)
    assert shipped <= 8 * n_subjects, (shipped, n_subjects)
    assert shipped < n_hot / 4, (shipped, n_hot)


def test_hot_band_lsh_join_splits_via_aqe_skew(spark):
    """A 2000-doc identical-content plant (one hot LSH band bucket,
    2001 rows on one join key) must split across tasks by AQE's skew
    join instead of serializing one reducer — with pair results exact.

    Two test-scale emulations of the 100 TB conditions, both documented
    in SCALING.md: the band table is repartitioned to 16 map tasks
    (AQE coalesces this tiny corpus to ONE mapper, and skew split can
    only cut at mapper boundaries — a real corpus has thousands), and
    the skew thresholds are lowered to this corpus's byte scale with
    broadcast off (at scale the band table exceeds both defaults)."""
    from pyspark.sql import functions as F

    from http_feeds_spark import plans
    from http_feeds_spark.functions import minhash as mh
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    hot_text = base.where(F.col("doc_id") == 0).select("text").collect()[0].text
    m = 2000
    clones = spark.range(m).select(
        (F.col("id") + 10_000_000).alias("doc_id"), F.lit(hot_text).alias("text")
    )
    corpus = base.unionByName(clones)
    sh = (
        corpus.withColumn("tokens", tx.words(F.lower("text")))
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", F.array_distinct(tx.word_shingles(F.col("tokens"), 3)))
        .select("doc_id", "shingles")
        .localCheckpoint()
    )
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        # 32 reduce partitions: at the fixture's 8, the base corpus alone
        # puts ~10KB in every partition and the hot bucket's +12KB no
        # longer clears the 2x-median skew test — the detection margin,
        # not the mechanism, is partition-count-sensitive at tiny scale
        "spark.sql.shuffle.partitions": "32",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        sig = mh.minhash_signature_cols(sh, "shingles", "doc_id", 4).localCheckpoint()
        banded = mh.band_rows(sig, "doc_id", 1, 2).repartition(16).localCheckpoint()
        hot_rows = (
            banded.groupBy("band_id", "band_hash")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert hot_rows >= m + 1  # the plant really is one hot bucket
        cands = mh.candidate_pairs(banded, "doc_id")
        cands.foreachPartition(lambda it: None)  # execute THIS frame
        reads = plans.find_nodes(
            plans.physical_root(cands), lambda nm: "AQEShuffleRead" in nm
        )
        assert any(r.hasSkewedPartition() for r in reads), [
            plans.node_line(r) for r in reads
        ]
        # skew split must not change results: all pairs within the hot
        # cluster (doc 0 + m clones) are found exactly once
        hot_pairs = cands.where(
            ((F.col("a") >= 10_000_000) | (F.col("a") == 0))
            & (F.col("b") >= 10_000_000)
        ).count()
        assert hot_pairs == (m + 1) * m // 2, hot_pairs
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
