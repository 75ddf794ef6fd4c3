#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Execution is measured with the noop sink (computes the full result,
writes nothing) — the standard way to bench Spark plans without sink
cost. One warm-up action runs first so JVM/codegen startup isn't billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the bench workload: one representative per operator family
HEADLINE = [
    "q_agg_group",        # TPC-H Q1-shape aggregation
    "q_join_broadcast",   # star join, broadcast dim
    "q_join_inner",       # shuffle/broadcast equi-join + filter
    "q_window_rank",      # window top-n per key (compaction shape)
    "q_topk",             # agg + TakeOrderedAndProject
    "q_read_model",       # feed compaction + tombstones + JSON projection
    "q_stream_tumbling",  # windowed event aggregation
    "q_llm_dedup_exact",  # content-hash dedup
    "q_llm_cosine",       # vector similarity top-k
    "q_llm_dedup_near",   # MinHash-LSH near-dup pipeline
    "q_llm_dedup_groups", # + transitive closure (connected components)
    "q_llm_ann_batch",    # batched IVF ANN (broadcast probe join)
    "q_llm_ann_index",    # search-only ANN against the persisted index
    "q_llm_ann_pq",       # IVF+PQ compressed ANN (code scan + in-plan ADC)
    "q_llm_ann_rerank",   # two-stage IVFADC-R (ADC shortlist + exact rerank)
    "q_llm_ann_pqr",      # residual-codebook IVFADC (per-probe ADC tables)
    "q_llm_bm25_index",   # search-only BM25 against the posting store
    "q_llm_phrase_search",  # exact positional phrase over the posting store
    "q_llm_proximity",    # slop-k proximity ranking over the posting store
    "q_llm_proximity_any",  # unordered (Lucene-slop) proximity, one exchange
    "q_llm_pipeline",     # end-to-end corpus-prep pipeline composition
    "q_llm_substr_scrub", # exact-substring span dedup (stride-1 windows)
    "q_llm_compress_quality",  # zlib entropy signal (Arrow pandas UDF)
    "q_llm_topics",       # corpus topic profiling (k-means + term labels)
    "q_stream_join",      # watermarked stream-stream join (batch twin)
    "q_history_scd2",     # SCD-2 temporal read model (one window)
    "q_llm_textstats",    # corpus statistics
    "q_llm_tokens",       # regex tokenization
]

# the original 12-query headline set (rounds 1-4). The headline list above
# grows as operators land, so cross-round comparisons use THIS subtotal —
# emitted as `legacy12_subtotal` so grading needs no judge-side arithmetic
# (BASELINE.md §"Headline set grew").
LEGACY12 = [
    "q_agg_group", "q_join_broadcast", "q_join_inner", "q_window_rank",
    "q_topk", "q_read_model", "q_stream_tumbling", "q_llm_dedup_exact",
    "q_llm_cosine", "q_llm_dedup_near", "q_llm_textstats", "q_llm_tokens",
]


def _load_gate(threshold: float = 5.0, max_wait_s: float = 240.0) -> dict:
    """Pre-bench machine-load gate (BASELINE.md: the r5 bisect proved
    round-over-round deltas track loadavg, not code — r8 drove at 18.3
    and needed a caveat in every table). Wait in 30 s steps until the
    1-minute loadavg drops below ``threshold`` or ``max_wait_s`` is
    spent; either way RECORD what happened so the bench line carries
    its own environment evidence instead of an external footnote."""
    start = os.getloadavg()[0]
    waited = 0.0
    load = start
    while load > threshold and waited < max_wait_s:
        time.sleep(30.0)
        waited += 30.0
        load = os.getloadavg()[0]
    return {
        "loadavg_at_start": round(start, 2),
        "load_gate_waited_s": int(waited),
        "load_gate": "ok" if load <= threshold else f"waived_after_{int(waited)}s",
    }


def synth_text_docs(spark, n_docs: int, n_words: int = 450, start: int = 0):
    """Deterministic real-shaped (doc_id, text) rows — the generator
    behind the bench text corpus, reusable for any id range (r15:
    platform_curve.py generates its incremental-wave documents from the
    same distribution so wave postings look like corpus postings).
    Zipf-skewed vocabulary, punctuation glued to words, occasional
    uppercase, xxhash64(doc, position)-driven: bit-identical across
    runs for a given (start, n_docs, n_words)."""
    from pyspark.sql import functions as F

    syl = [
        "an", "ber", "cor", "dal", "en", "fi", "gor", "hul", "in", "jor",
        "kel", "lum", "mor", "nex", "or", "pel", "qui", "rol", "sta", "tur",
        "ul", "ver", "win", "xo", "yer", "zam",
    ]
    vocab = [a + b for a in syl for b in syl][:400]
    # plant known mid-frequency query terms at stable skew positions
    vocab[40], vocab[55], vocab[70], vocab[85] = "window", "filter", "merge", "rollup"
    varr = F.array(*[F.lit(w) for w in vocab])
    V = len(vocab)

    def word(i):
        h1 = F.xxhash64(F.col("doc_id"), i, F.lit(1))
        h2 = F.xxhash64(F.col("doc_id"), i, F.lit(2))
        h3 = F.xxhash64(F.col("doc_id"), i, F.lit(3))
        # Zipf-ish skew: idx uniform on [1, k] with k itself uniform —
        # P(idx = j) ~ harmonic tail, so low indices are stopword-common
        k = F.pmod(h2, F.lit(V)) + 1
        w = F.element_at(varr, (F.pmod(h1, k) + 1).cast("int"))
        w = F.when(F.pmod(h3, F.lit(11)) == 5, F.upper(w)).otherwise(w)
        punct = (
            F.when(F.pmod(h3, F.lit(7)) == 0, F.lit(","))
            .when(F.pmod(h3, F.lit(7)) == 1, F.lit("."))
            .otherwise(F.lit(""))
        )
        return F.concat(w, punct)

    return spark.range(start, start + n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(n_words)), word), " "
        ).alias("text"),
    )


def _ensure_bench_text_corpus(spark, path: str, n_docs: int, n_words: int) -> bool:
    """Deterministic punctuated benchmark corpus (r10): the driver
    tables' documents at sf0.1 are 5K docs × ~300 chars, so every
    text-index plan change lands inside job overhead (the r9 verdict
    measured the whole family moving 25-40% with no plan change). This
    builds ~n_docs × ~3 KB real-shaped text via :func:`synth_text_docs`
    (no driver-side generation, no randomness — bit-identical across
    rounds, so the corpus and index build once into the warehouse).
    Returns True when it built."""
    from http_feeds_spark.stores import parquet_exists

    if parquet_exists(spark, path):
        return False
    synth_text_docs(spark, n_docs, n_words).write.mode("overwrite").parquet(path)
    return True


def _bench_text_tier(spark, timings: dict[str, float]) -> float:
    """The real-sized text-index tier: bm25/phrase/ordered/unordered
    proximity against a ~50K-doc × ~3 KB corpus — large enough that a
    posting-path regression moves the number, not the noise floor.
    Returns the one-time corpus+index build seconds (0.0 when both
    already existed — the corpus is deterministic, so later rounds
    reuse the warehouse artifact and bench pure search)."""
    from http_feeds_spark.operators import text_index as ti

    n_docs = int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", "50000"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    corpus_path = f"{wh}/bench_text/corpus_{n_docs}"
    index_root = f"{wh}/bench_text/index_{n_docs}"

    t0 = time.perf_counter()
    built = _ensure_bench_text_corpus(spark, corpus_path, n_docs, n_words=450)
    docs = spark.read.parquet(corpus_path)
    built = ti.ensure_text_index(spark, docs, index_root) or built
    build_s = round(time.perf_counter() - t0, 3) if built else 0.0

    tier = {
        "text50k_bm25": lambda: ti.search(
            spark, index_root, ["window", "filter", "merge"], k=10
        ),
        "text50k_phrase": lambda: ti.phrase_search(
            spark, index_root, ["window", "filter"], k=10
        ),
        "text50k_proximity": lambda: ti.proximity_search(
            spark, index_root, ["window", "merge"], slop=3, k=10
        ),
        "text50k_proximity_any": lambda: ti.proximity_search_any(
            spark, index_root, ["window", "merge"], slop=3, k=10
        ),
    }
    for name, fn in tier.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
    return build_s


def _bench_porter_tier(spark, timings: dict[str, float]) -> float:
    """The ``standard_porter`` tier over the SAME 50K corpus — the one
    Python-worker analyzer in the retrieval family (stopwords + Porter
    stemming run as an Arrow-batched pandas UDF), so its real cost at
    size needs its own rows (the r10 verdict's missing #1): the build
    pays the UDF over every document; the search paths read postings and
    only stem the ≤|terms| query terms, so they should track the
    ``standard`` tier. Same build-once-into-the-warehouse contract as
    the standard tier; returns the one-time build seconds (0.0 on
    reuse)."""
    from http_feeds_spark.operators import text_index as ti

    n_docs = int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", "50000"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    corpus_path = f"{wh}/bench_text/corpus_{n_docs}"
    index_root = f"{wh}/bench_text/porter_index_{n_docs}"

    t0 = time.perf_counter()
    built = _ensure_bench_text_corpus(spark, corpus_path, n_docs, n_words=450)
    docs = spark.read.parquet(corpus_path)
    built = (
        ti.ensure_text_index(spark, docs, index_root, analyzer="standard_porter")
        or built
    )
    build_s = round(time.perf_counter() - t0, 3) if built else 0.0

    tier = {
        "text50k_porter_bm25": lambda: ti.search(
            spark, index_root, ["window", "filter", "merge"], k=10
        ),
        "text50k_porter_phrase": lambda: ti.phrase_search(
            spark, index_root, ["window", "filter"], k=10
        ),
    }
    for name, fn in tier.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
    return build_s


def _calibrate(spark) -> float:
    """Fixed-cost machine-speed probe (r10 verdict item 6): the sum of
    xxhash64 over a 30M-row range in 32 tasks — pure JVM compute, no
    data dependence, no package code path, byte-identical work every
    round. BASELINE.md's protocol: the drive-to-drive environment
    envelope is ±30-50%; dividing a round's totals by the calib_s ratio
    against the comparison round's normalizes machine speed away so
    judges read plan changes, not load. Min-of-3."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        # mask before summing: 30M full 64-bit hashes overflow the long
        # sum under ANSI mode; 16 bits keep the work identical and the
        # total bounded (~2e12)
        spark.range(0, 30_000_000, 1, 32).select(
            F.sum(F.xxhash64("id").bitwiseAND(F.lit(0xFFFF)))
        ).collect()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    gate = _load_gate()

    from http_feeds_spark.queries import registry
    from http_feeds_spark.session import get_spark

    spark = get_spark(app_name="http-feeds-spark-bench")
    reg = registry()

    # warm-up: JVM, codegen, parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    calib_s = _calibrate(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = reg[name].fn
        runs = []
        for _ in range(3):  # min of 3: first run pays codegen compile,
            t0 = time.perf_counter()  # min-of-rest absorbs machine noise
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    text_build_s = _bench_text_tier(spark, timings)
    porter_build_s = _bench_porter_tier(spark, timings)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # one-time cost of the deterministic 50K-doc text corpus
                # + index (0.0 when the warehouse artifact already
                # existed; search timings above never include it)
                "text_tier_build_s": text_build_s,
                "porter_tier_build_s": porter_build_s,
                # fixed-cost probe: constant JVM job, timed before any
                # query — normalize cross-round totals by its ratio
                "calib_s": calib_s,
                "legacy12_subtotal": round(
                    sum(timings[n] for n in LEGACY12 if n in timings), 3
                ),
                "sf": sf,
                # environment evidence: BASELINE.md's r2->r3 bisect showed
                # round-over-round deltas track machine load, not code
                "loadavg_1m": round(os.getloadavg()[0], 2),
                **gate,
            }
        )
    )


if __name__ == "__main__":
    main()
