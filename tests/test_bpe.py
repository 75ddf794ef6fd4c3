"""Distributed BPE training (functions/bpe.py): exact merge-table
parity with a pure-Python reference implementation of Sennrich et al.'s
algorithm on the real corpus, determinism, and the encode round-trip."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from http_feeds_spark.functions import bpe


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


# --- pure-Python reference (Sennrich ACL 2016, same tie-break) ---------------


def _ref_word_freqs(sf_dir) -> dict[str, int]:
    rows = duckdb.connect().execute(
        f"""SELECT w, count(*) FROM (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM '{sf_dir}/documents.parquet') WHERE w <> '' GROUP BY w"""
    ).fetchall()
    return dict(rows)


def _ref_apply(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(wf: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    vocab = {tuple(list(w) + [bpe.END_OF_WORD]): f for w, f in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_pair_freq:
            break
        merges.append((a, b))
        vocab = {_ref_apply(s, a, b): f for s, f in vocab.items()}
    return merges


def test_merge_table_matches_reference(spark, sf_dir):
    """The distributed trainer must learn the IDENTICAL merge sequence
    the reference single-process algorithm learns on the same corpus —
    order included (a tie-break or fold-semantics bug breaks this)."""
    got = bpe.train_bpe(_docs(spark, sf_dir), n_merges=16)
    want = _ref_train(_ref_word_freqs(sf_dir), 16)
    assert got == want and len(got) == 16, (got, want)


def test_training_is_deterministic_across_layouts(spark, sf_dir):
    """Same corpus, different partitioning → same merge table."""
    docs = _docs(spark, sf_dir)
    m1 = bpe.train_bpe(docs.repartition(13), n_merges=8)
    m2 = bpe.train_bpe(docs.coalesce(1), n_merges=8)
    assert m1 == m2 and len(m1) == 8


def test_encode_round_trips_and_respects_merges(spark, sf_dir):
    """Tokens re-concatenate to the original text (with end-of-word
    markers mapping back to spaces), and every emitted token is either
    a base character or a learned vocab entry."""
    docs = _docs(spark, sf_dir).limit(50)
    merges = bpe.train_bpe(_docs(spark, sf_dir), n_merges=16)
    out = bpe.encode(docs, merges)
    joined = out.select(
        "doc_id",
        F.regexp_replace(
            F.concat_ws("", "tokens"), bpe.END_OF_WORD, " "
        ).alias("rejoined"),
    )
    orig = docs.select("doc_id", F.concat(F.col("text"), F.lit(" ")).alias("want"))
    diff = (
        joined.join(orig, "doc_id")
        .where(F.col("rejoined") != F.col("want"))
        .count()
    )
    assert diff == 0

    vocab = set(bpe.vocab_from_merges(merges))
    toks = {
        r.t
        for r in out.select(F.explode("tokens").alias("t")).distinct().collect()
    }
    for t in toks:
        assert (
            t in vocab or len(t) == 1 or t == bpe.END_OF_WORD or
            # single char + end marker merged
            (t.endswith(bpe.END_OF_WORD) and t in vocab)
        ), t


def test_early_stop_below_min_pair_freq(spark):
    """A corpus whose pairs all occur once stops before n_merges."""
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=10, min_pair_freq=2)
    assert merges == []


def test_driver_trainer_matches_distributed_bit_for_bit(spark, sf_dir):
    """train_bpe_driver (one collect of the Heaps-law word table +
    incremental local merge loop) must learn the IDENTICAL merge table
    as the 2-jobs-per-merge distributed loop, including the early-stop
    point."""
    docs = _docs(spark, sf_dir)
    assert bpe.train_bpe_driver(docs, n_merges=16) == bpe.train_bpe(
        docs, n_merges=16
    )
    # early stop parity on a tiny corpus
    tiny = spark.createDataFrame(
        [(1, "ab ab ab cd"), (2, "ab cd xy")], "doc_id long, text string"
    )
    assert bpe.train_bpe_driver(tiny, n_merges=10, min_pair_freq=2) == bpe.train_bpe(
        tiny, n_merges=10, min_pair_freq=2
    )


def test_driver_trainer_scales_to_production_merge_counts(spark, sf_dir):
    """The point of the driver loop: n_merges in the hundreds runs in
    seconds of driver time after the single corpus pass (the distributed
    loop would launch 2 jobs per merge). The merge table must stay
    prefix-consistent with a shorter run."""
    docs = _docs(spark, sf_dir)
    big = bpe.train_bpe_driver(docs, n_merges=1000, min_pair_freq=2)
    small = bpe.train_bpe_driver(docs, n_merges=16, min_pair_freq=2)
    assert big[:16] == small
    assert len(big) > 100  # the corpus supports deep merge tables


def test_merge_table_round_trips_through_the_model_store(spark, sf_dir, tmp_path):
    """save/load of the merge table preserves order exactly, and an
    encoder built from the loaded model tokenizes identically."""
    docs = _docs(spark, sf_dir)
    merges = bpe.train_bpe_driver(docs, n_merges=16)
    root = str(tmp_path / "bpe_model")
    bpe.save_merges(spark, merges, root)
    assert bpe.load_merges(spark, root) == merges
    a = bpe.encode(docs.limit(20), merges).orderBy("doc_id").collect()
    b = bpe.encode(docs.limit(20), bpe.load_merges(spark, root)).orderBy(
        "doc_id"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_encode_with_vocab_emits_trainer_ready_token_ids(spark, sf_dir):
    """full_vocab + encode(vocab=...): ids round-trip through the vocab
    list exactly (vocab[id] == token), unknown characters map to
    UNKNOWN_ID, and the id stream length equals the token stream."""
    docs = _docs(spark, sf_dir)
    merges = bpe.train_bpe_driver(docs, n_merges=16)
    vocab = bpe.full_vocab(docs, merges)
    assert len(vocab) == len(set(vocab))  # ids are unambiguous
    enc = bpe.encode(docs.limit(30), merges, vocab=vocab).collect()
    assert len(enc) == 30
    for r in enc:
        assert len(r.token_ids) == len(r.tokens) == r.n_tokens
        for t, i in zip(r.tokens, r.token_ids):
            assert i >= 0 and vocab[i] == t

    alien = spark.createDataFrame(
        [(1, "Ωmega ßeta")], "doc_id long, text string"
    )
    rows = bpe.encode(alien, merges, vocab=vocab).collect()[0]
    assert bpe.UNKNOWN_ID in rows.token_ids  # unseen chars flagged, not dropped


def test_driver_min_word_freq_floor_matches_reference_under_same_floor(spark):
    """A hapax-heavy corpus (the 100 TB typo/numeric-tail shape):
    min_word_freq=2 prunes the tail IN-ENGINE before the collect, and
    the merge table equals the pure-Python reference trained on the
    floored word table — the documented contract of the truncation."""
    core = "the cat sat on the mat and the cat ran"
    rows = [(i, core) for i in range(8)] + [
        (100 + i, f"zqx{i}a wjv{i}b typo{i}cde") for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe.train_bpe_driver(docs, n_merges=12, min_word_freq=2)
    wf = {
        w: f
        for w, f in _spark_word_freqs(docs).items()
        if f >= 2
    }
    assert got == _ref_train(wf, 12)
    assert len(got) > 0


def _spark_word_freqs(docs) -> dict[str, int]:
    return {
        r.word: int(r.freq) for r in bpe.word_freqs(docs).collect()
    }


def test_driver_max_words_gate_refuses_then_floor_admits(spark):
    """The refuse-don't-OOM gate: a word table over max_words raises
    with the remedy; pruning the hapax tail with min_word_freq brings
    the same corpus under the same gate."""
    import pytest

    rows = [(i, f"unique{i}x unique{i}y common words here") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_words"):
        bpe.train_bpe_driver(docs, n_merges=4, max_words=10)
    merges = bpe.train_bpe_driver(
        docs, n_merges=4, min_word_freq=2, max_words=10
    )  # floor leaves only the 3 repeated words — under the gate
    assert merges == _ref_train(
        {w: f for w, f in _spark_word_freqs(docs).items() if f >= 2}, 4
    )
