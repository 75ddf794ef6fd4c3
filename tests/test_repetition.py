"""Gopher repetition signals (functions/text.add_repetition_stats):
fraction values match an independent Python reference exactly on both
hand-built pathological docs and the real corpus; the q_llm_repetition
gate rejects the planted spam and passes normal prose."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx


def _ref_stats(text: str, top_ns=(2, 3), dup_ns=(5, 10)):
    """Independent reference — deliberately not sharing any code shape
    with the Spark expressions."""
    toks = text.split(" ")
    out = {}
    for n in sorted(set(top_ns) | set(dup_ns)):
        grams = (
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if len(toks) >= n
            else []
        )
        cnt = Counter(grams)
        if n in top_ns:
            if grams:
                # max by (count, len, gram) — the engine's tie-break
                c, l, _ = max((c, len(g), g) for g, c in cnt.items())
                out[f"top_{n}gram_frac"] = round(c * l / len(text), 9)
            else:
                out[f"top_{n}gram_frac"] = 0.0
        if n in dup_ns:
            if grams:
                dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
                out[f"dup_{n}gram_frac"] = round(min(dup / len(text), 1.0), 9)
            else:
                out[f"dup_{n}gram_frac"] = 0.0
    return out


CASES = [
    "spam spam spam spam spam spam spam spam",
    "one two three one two three one two three one two",
    ("a b c d e f g h i j " * 3).strip(),
    "completely fresh words with no repetition at all here",
    "short",
    "x",
    "tie tie breaker breaker tie tie",  # count ties exercise the break rule
]


def test_matches_python_reference_on_handbuilt_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.asDict()
        for r in tx.add_repetition_stats(df, "text", (2, 3), (5, 10)).collect()
    }
    for i, t in enumerate(CASES):
        want = _ref_stats(t)
        for k, v in want.items():
            # 2e-9 tolerance: Spark rounds HALF_UP, Python banker's — they
            # can differ by 1e-9 at exact midpoints
            assert abs(got[i][k] - v) <= 2e-9, (i, k, got[i][k], v)


def test_matches_python_reference_on_real_corpus(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 80)
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {
        r.doc_id: r.asDict()
        for r in tx.add_repetition_stats(docs, "text", (2, 3), (5, 10)).collect()
    }
    assert len(got) == len(texts)
    for i, t in texts.items():
        want = _ref_stats(t)
        for k, v in want.items():
            assert abs(got[i][k] - v) <= 2e-9, (i, k, got[i][k], v)


def test_gate_rejects_planted_and_passes_prose(spark, sf_dir):
    from http_feeds_spark.queries.llm import q_llm_repetition

    rows = q_llm_repetition(spark, sf_dir).collect()
    planted = [r for r in rows if r.planted]
    assert len(planted) == 3 and all(not r.gopher_pass for r in planted)
    real = [r for r in rows if not r.planted]
    # the synthetic corpus is word soup with a small vocabulary, so some
    # docs legitimately trip the dup-gram signals — but the gate must not
    # reject wholesale
    assert sum(r.gopher_pass for r in real) > len(real) * 0.5


def test_empty_and_single_token_edge_cases(spark):
    df = spark.createDataFrame([(1, ""), (2, "word")], "doc_id long, text string")
    got = {r.doc_id: r for r in tx.add_repetition_stats(df, "text").collect()}
    for i in (1, 2):
        assert got[i].top_2gram_frac == 0.0
        assert got[i].dup_5gram_frac == 0.0


def test_compression_ratio_orders_degeneracy(spark):
    """r10 D6e: the zlib entropy signal — degenerate repetition
    compresses toward 0, natural prose sits in between, incompressible
    junk near/above 1; byte-exact vs a driver-side zlib reference
    (deterministic level-6), empty text maps to 1.0."""
    import zlib

    from http_feeds_spark.functions import text as tx

    import base64
    import hashlib

    natural = " ".join(
        f"On day {i} the {w} observer took careful notes about the weather,"
        " terrain, and the slowly fading light over the harbor."
        for i, w in enumerate(["first", "second", "third", "fourth", "fifth", "patient"])
    )
    repetitive = "spam ham " * 40
    # incompressible: deterministic hash-chained bytes, base85-printable
    blob = b"".join(hashlib.sha256(bytes([i])).digest() for i in range(24))
    junk = base64.b85encode(blob).decode()
    rows = [(1, natural), (2, repetitive), (3, junk), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.ratio
        for r in df.select(
            "doc_id", tx.compression_ratio("text").alias("ratio")
        ).collect()
    }
    # byte-exact against the reference implementation
    for doc_id, t in rows:
        if t:
            raw = t.encode("utf-8")
            assert got[doc_id] == len(zlib.compress(raw, 6)) / len(raw), doc_id
    assert got[2] < got[1] < got[3]  # repetition < prose < junk
    assert got[2] < 0.2
    assert got[4] == 1.0 and got[5] == 1.0


def test_exploded_form_matches_per_row_form(spark):
    """r15 (SCALING.md's long-doc switch, r14 verdict item 4): the
    exploded groupBy((doc, gram)) form is value-IDENTICAL to the
    shuffle-free per-row form — same tokenizer, tie-break and rounding —
    on every handbuilt case including the tie exerciser, the empties,
    and docs long enough to actually take the exploded branch."""
    rows = [(i, t) for i, t in enumerate(CASES)]
    rows.append((100, ("lorem ipsum dolor sit amet " * 600).strip()))  # 3000 toks
    rows.append((101, ("spam ham " * 2000).strip()))  # 4000 toks, all dup
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(top_ns=(2, 3), dup_ns=(5, 10))
    per_row = tx.add_repetition_stats(df, "text", **kw)
    exploded = tx._repetition_stats_exploded(df, "text", (2, 3), (5, 10), "doc_id")
    stat_cols = [
        "top_2gram_frac", "top_3gram_frac", "dup_5gram_frac", "dup_10gram_frac",
    ]
    a = {r.doc_id: tuple(r[c] for c in stat_cols) for r in per_row.collect()}
    b = {r.doc_id: tuple(r[c] for c in stat_cols) for r in exploded.collect()}
    assert a == b

    # threshold dispatch: short rows per-row, long rows exploded, union
    mixed = tx.add_repetition_stats(df, "text", explode_over_tokens=64, **kw)
    c = {r.doc_id: tuple(r[c] for c in stat_cols) for r in mixed.collect()}
    assert c == a
    # and the reference agrees on the long docs too
    for i in (100, 101):
        ref = _ref_stats(rows[-2:][i - 100][1], (2, 3), (5, 10))
        assert c[i] == tuple(ref[k] for k in stat_cols)
