"""Randomized property tests for the round-6 operators — pure-Python
references over seeded random corpora, batched into a handful of Spark
jobs (the test_property_compaction.py pattern): chunking, substring
span stats, and stratified sampling quotas."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F



pytestmark = pytest.mark.slow  # platform-integration tier (see pytest.ini)

def _random_corpus(rng, n_docs, vocab, max_len):
    return [
        (
            i,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, max_len))
            ),
        )
        for i in range(n_docs)
    ]


def test_chunking_matches_reference_on_random_corpora(spark):
    """Coverage/boundary semantics against a pure-Python chunker for
    many random (size, overlap, doc-length) combinations."""
    from http_feeds_spark.operators import chunking as ck

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]

    for trial in range(6):
        size = rng.randint(3, 40)
        overlap = rng.randint(0, size - 1)
        stride = size - overlap
        docs_py = _random_corpus(rng, 25, vocab, 3 * size)
        docs = spark.createDataFrame(docs_py, "doc_id long, text string")
        got = {
            (r.doc_id, r.chunk_idx): (r.start_tok, r.n_tok, r.chunk_text)
            for r in ck.chunk_documents(docs, size=size, overlap=overlap).collect()
        }
        want = {}
        for did, text in docs_py:
            toks = text.split(" ")
            n = len(toks)
            nc = -(-max(n - overlap, 1) // stride)  # ceil
            for i in range(nc):
                s = i * stride
                want[(did, i)] = (
                    s,
                    min(size, n - s),
                    " ".join(toks[s : s + size]),
                )
        assert got == want, (size, overlap)


def test_substr_stats_match_reference_on_random_corpora(spark):
    """dup_span_stats ≡ a pure-Python sliding-window/interval-union
    reference, with planted cross-doc spans so duplication actually
    occurs in a small random corpus."""
    from http_feeds_spark.operators import substr_dedup as sd

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(60)]

    for trial in range(4):
        L = rng.randint(3, 8)
        docs_py = _random_corpus(rng, 15, vocab, 40)
        # plant a shared span into a few docs at random offsets
        span = [f"sp{trial}x{j}" for j in range(L + rng.randint(0, 4))]
        for did in rng.sample(range(15), 3):
            i, t = docs_py[did]
            toks = t.split(" ")
            pos = rng.randint(0, len(toks))
            docs_py[did] = (i, " ".join(toks[:pos] + span + toks[pos:]))
        docs = spark.createDataFrame(docs_py, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.dup_tokens)
            for r in sd.dup_span_stats(docs, length=L, min_count=2).collect()
        }

        # reference: hash windows, count, interval-union coverage
        windows = {}
        for did, text in docs_py:
            toks = text.split(" ")
            for p in range(max(len(toks) - L + 1, 0)):
                w = tuple(toks[p : p + L])
                windows.setdefault(w, []).append((did, p))
        want = {}
        for did, text in docs_py:
            toks = text.split(" ")
            dup_pos = sorted(
                p
                for w, occ in windows.items()
                if len(occ) >= 2
                for (d, p) in occ
                if d == did
            )
            covered = 0
            prev_end = 0
            for p in dup_pos:
                covered += max(0, p + L - max(p, prev_end))
                prev_end = max(prev_end, p + L)
            want[did] = (len(toks), covered)
        assert got == want, (trial, L)


def test_stratified_quota_on_random_groups(spark):
    """Per-group quota holds for arbitrary group-size distributions."""
    from http_feeds_spark.functions import sampling as sa

    rng = random.Random(3)
    rows = []
    sizes = {}
    gid = 0
    for _ in range(12):
        n = rng.randint(1, 25)
        sizes[f"g{gid}"] = n
        for j in range(n):
            rows.append((len(rows), f"g{gid}"))
        gid += 1
    df = spark.createDataFrame(rows, "id long, grp string")
    for k in (1, 3, 10):
        per = {
            r.grp: r.c
            for r in sa.stratified_sample_exact(df, "grp", k, "id")
            .groupBy("grp")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        assert per == {g: min(k, n) for g, n in sizes.items()}, k


def test_scd2_asof_equals_prefix_on_random_logs(spark):
    """SCD-2 temporal read model (operators/feed.history_scd2) on random
    event logs: at every event time T, the as-of-T filter must equal
    read_model over the replay prefix time <= T — including
    DELETE-then-PUT revivals and single-event subjects."""
    import datetime

    from http_feeds_spark.operators import feed as ops

    rng = random.Random(99)
    rows = []
    seq = 0
    base = datetime.datetime(2024, 1, 1)
    for _ in range(120):
        seq += 1
        rows.append(
            (
                seq,
                f"s{rng.randrange(9)}",
                rng.choice(["PUT", "PUT", "PUT", "DELETE"]),
                base + datetime.timedelta(seconds=seq),
            )
        )
    feed = spark.createDataFrame(
        rows, "seq long, subject string, method string, time timestamp"
    )
    hist = ops.history_scd2(feed).collect()
    events = sorted(rows)
    for cut in (20, 60, 119):
        T = events[cut][3]
        got = {
            (r.seq, r.subject)
            for r in hist
            if r.valid_from <= T and (r.valid_to is None or r.valid_to > T)
        }
        latest = {}
        for s, subj, m, t in events:
            if t <= T:
                latest[subj] = (s, m)
        want = {(s, subj) for subj, (s, m) in latest.items() if m != "DELETE"}
        assert got == want, cut


def test_phrase_search_matches_reference_on_random_corpora(spark, tmp_path):
    """Positional phrase retrieval vs a pure-Python sliding-window
    count: ONE index build over a seeded random corpus (tiny vocab so
    phrases repeat and overlap), then many random phrases of lengths
    1-4 — every (doc, count) pair must match, including overlapping
    repeated-term matches."""
    from http_feeds_spark.operators import text_index as ti

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> dense repeats
    docs_py = _random_corpus(rng, 40, vocab, 30)
    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)

    toks_by_doc = {i: t.split() for i, t in docs_py}
    for trial in range(12):
        n = rng.randint(1, 4)
        phrase = [rng.choice(vocab) for _ in range(n)]
        want = {}
        for doc_id, toks in toks_by_doc.items():
            c = sum(
                1
                for i in range(len(toks) - n + 1)
                if toks[i : i + n] == phrase
            )
            if c:
                want[doc_id] = c
        got = {
            r.doc_id: r.n_matches
            for r in ti.phrase_search(spark, root, phrase, k=10_000).collect()
        }
        assert got == want, (phrase, got, want)


def test_erasure_upsert_interleaving_matches_rebuilt_index(spark, tmp_path):
    """Randomized end-to-end invariant for the erasure flagship: after
    ANY interleaving of (erase+purge, upsert) rounds on the text index,
    search must equal an index freshly built over exactly the surviving
    documents — same idf, same avgdl, same rows."""
    from http_feeds_spark.operators import erasure
    from http_feeds_spark.operators import text_index as ti

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    docs_py = dict(_random_corpus(rng, 60, vocab, 15))
    root = str(tmp_path / "ti")

    live = {i: docs_py[i] for i in range(40)}
    df = spark.createDataFrame(list(live.items()), "doc_id long, text string")
    ti.build_text_index(spark, df, root)
    next_id = 40

    for round_no in range(3):
        # erase a random subset of live docs, purge physically
        victims = rng.sample(sorted(live), k=rng.randint(1, 6))
        erasure.erase_ids(
            spark, root, spark.createDataFrame([(v,) for v in victims], "id long")
        )
        removed = ti.purge_erased(spark, root)
        assert removed > 0
        for v in victims:
            del live[v]
        # upsert a few new docs
        fresh = {next_id + j: docs_py[(next_id + j) % 60] for j in range(3)}
        next_id += 3
        ti.upsert_documents(
            spark,
            spark.createDataFrame(list(fresh.items()), "doc_id long, text string"),
            root,
        )
        live.update(fresh)

        clean_root = str(tmp_path / f"clean{round_no}")
        ti.build_text_index(
            spark,
            spark.createDataFrame(list(live.items()), "doc_id long, text string"),
            clean_root,
        )
        terms = rng.sample(vocab, k=2)
        got = [tuple(r) for r in ti.search(spark, root, terms, k=15).collect()]
        want = [tuple(r) for r in ti.search(spark, clean_root, terms, k=15).collect()]
        assert got == want and len(got) > 0, (round_no, terms)


def test_monitor_random_fold_compact_sequences_stay_exact(spark, tmp_path):
    """Randomized monitor maintenance: seeded random folds interleaved
    with prefix compactions (and one torn merge injected) must keep
    every visible-unit answer exactly derivable from the raw documents —
    stats sums, JS divergence, and HLL distinct counts (exact on this
    tiny vocabulary)."""
    from http_feeds_spark.operators import drift
    from http_feeds_spark.streaming import monitor as mon

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(9)]
    root = str(tmp_path / "mon")
    batches = {}  # batch id -> rows
    next_id = 0

    def fold_one():
        nonlocal next_id
        rows = _random_corpus(rng, rng.randint(1, 4), vocab, 8)
        rows = [(next_id * 100 + i, t) for i, (_, t) in enumerate(rows)]
        mon.fold_batch(
            spark, spark.createDataFrame(rows, "doc_id long, text string"), root, next_id
        )
        batches[next_id] = rows
        next_id += 1

    def units():
        return sorted(r.batch for r in mon.read_stats(spark, root).collect())

    def covered(unit, man):
        if man is not None and unit == man[1]:
            return sorted(b for b in man[2])
        return [unit]

    for step in range(8):
        fold_one()
        if step == 3:
            # torn merge: merged frames land, manifest never does —
            # must change no answer and be overwritten by the next compact
            mon._range_counts(spark, root, units()[:2]).write.mode(
                "overwrite"
            ).parquet(f"{root}/{mon.MERGED_DIR}/009999/{mon.WORDS_DIR}")
        if step in (2, 5, 7):
            mon.compact_batches(spark, root, upto=rng.choice(units()))

        man = mon._latest_manifest(spark, root)
        us = units()
        # raw-doc reconstruction per visible unit
        by_unit = {
            u: [r for b in covered(u, man) for r in batches[b]] for u in us
        }
        for u in us:
            st = [r for r in mon.read_stats(spark, root).collect() if r.batch == u][0]
            assert st.n_docs == len(by_unit[u]), (step, u)
            d = mon.distinct_counts(spark, root, [u])
            assert d["docs"] == len({i for i, _ in by_unit[u]}), (step, u)
            words = {w for _, t in by_unit[u] for w in t.split()}
            assert d["words"] == len(words), (step, u)
        if len(us) >= 2:
            a, b = us[0], us[-1]
            want = drift.js_divergence_words(
                spark.createDataFrame(by_unit[a], "doc_id long, text string"),
                spark.createDataFrame(by_unit[b], "doc_id long, text string"),
            )
            got = mon.js_between(spark, root, [a], [b])
            assert abs(got - want) < 1e-12, (step, a, b)
