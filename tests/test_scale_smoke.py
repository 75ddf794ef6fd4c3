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
