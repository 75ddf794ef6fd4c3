"""Distributed BPE tokenizer training — learn the merge table in-engine
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016 — the byte-pair-encoding subword
algorithm used by most LLM tokenizers).

Training a tokenizer is part of preparing a training corpus, and at
100 TB the pair-counting pass is exactly the kind of job an analytics
engine should own: the classical implementation folds the corpus into
an in-memory word-frequency dict first — here that dict IS a DataFrame,
so the corpus never has to fit anywhere.

Spark shape:

- **One corpus pass total.** Words + frequencies are ONE aggregate
  (the shuffle carries (word, partial count), map-side combined); every
  merge round after that works on the word-frequency table, which is
  vocabulary-sized (Heaps' law: ~10^6-10^7 rows for a web corpus),
  not corpus-sized.
- **Each merge round = one aggregate + one map.** Pair counts explode
  each word's symbol array to adjacent pairs weighted by word
  frequency (map-side combined groupBy; the argmax row is the ONLY
  thing collected — model-sized). Applying the winning merge rewrites
  each symbol array with a single JVM ``aggregate`` fold — no Python,
  no shuffle.
- **Lineage is cut every few rounds** (localCheckpoint): N merge
  rounds would otherwise stack N map transforms on one plan, and
  analysis time grows superlinearly with plan depth.
- **Deterministic**: ties on pair count break lexicographically, so
  reruns and different partition layouts learn the identical merge
  table (pinned against a pure-Python reference implementation).

Encoding with a learned table is sequential per word by construction
(each merge must see the previous one's output), so the encoder is an
Arrow-batched pandas UDF over mapInPandas — Python, but map-only,
batch-vectorized over words, and embarrassingly parallel. The
word-level memoization inside each batch makes the common case (Zipf:
few distinct words dominate) dict-lookup cheap.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"  # Sennrich's end-of-word marker


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the ONE corpus-sized pass. Whitespace tokens;
    plug a normalizer upstream if the corpus needs one."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _to_symbols(word_col) -> "F.Column":
    """word → initial symbol sequence: its characters + the end marker."""
    w = F.col(word_col) if isinstance(word_col, str) else word_col
    return F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD)))


def _merge_expr(a: str, b: str):
    """One JVM fold rewriting a symbol array with (a,b) → a||b.

    Left-to-right, non-overlapping — the reference semantics: after
    'aa'+'aa' merges in 'aaaa', a third 'a' does NOT re-merge with the
    result's tail. The fold carries (out array, pending flag) where
    pending means "last element is a fresh `a` awaiting its `b`"."""
    al, bl, ab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        F.col("symbols"),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("pending"),
        ),
        lambda acc, x: F.struct(
            F.when(
                acc["pending"] & (x == bl),
                F.concat(F.slice(acc["out"], 1, F.size(acc["out"]) - 1), F.array(ab)),
            )
            .otherwise(F.concat(acc["out"], F.array(x)))
            .alias("out"),
            # a fresh `a` opens a pending merge UNLESS it was just consumed
            # as the `b` of one (x==b & pending consumed it)
            (F.when(acc["pending"] & (x == bl), F.lit(False)).otherwise(x == al)).alias(
                "pending"
            ),
        ),
        lambda acc: acc["out"],
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn the merge table: [(a, b), ...] in merge order.

    Stops early when no pair reaches ``min_pair_freq``. The returned
    table is the model (driver-sized: n_merges rows); word state stays
    distributed throughout."""
    wf = word_freqs(docs, text_col).select(
        _to_symbols("word").alias("symbols"), "freq"
    )
    wf = wf.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            wf.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            # deterministic argmax: count desc, then lexicographic pair
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )  # ONE model-sized row
        if not pairs or pairs[0]["n"] < min_pair_freq:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        wf = wf.select(_merge_expr(a, b).alias("symbols"), "freq")
        if (i + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()  # cut the stacked-transform lineage
    return merges


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Driver-local twin of _merge_expr: left-to-right, non-overlapping."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_driver(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_freq: int = 2,
    min_word_freq: int = 1,
    max_words: int | None = 20_000_000,
) -> list[tuple[str, str]]:
    """The deployment-shape trainer for production vocab sizes: ONE
    corpus pass builds the (word, freq) table in-engine, which is then
    collected ONCE — vocabulary-sized by Heaps' law (~10^6-10^7 rows
    for a web corpus, independent of corpus bytes) — and the merge loop
    runs driver-local with INCREMENTAL pair counts (only words
    containing the winning pair are touched per round, the classical
    fast-BPE bookkeeping). ``train_bpe`` costs 2 Spark jobs per merge —
    fine at demo n_merges, ~64k jobs at a 32k-token production vocab;
    this form is O(corpus) once plus seconds of driver time for the
    same result (bit-identical merge table, pinned in tests/test_bpe.py).

    Heaps' law is ~N^0.5 with NO ceiling: a real 100 TB web corpus has
    10^8-10^9 distinct "words" (typo/numeric tail) — multi-GB on the
    driver if collected raw. Two bounds, both ENGINE-side so the driver
    never sees the tail:

    - ``min_word_freq`` prunes rare words BEFORE the collect (the
      standard Sennrich truncation; pushed into the aggregation, so the
      shuffle output — not just the driver table — shrinks). A floor of
      2 cannot change early merges (a hapax word contributes 1 to a
      pair count that must beat ``min_pair_freq``=2 ties from everything
      else) but is formally lossy late in training — the contract is
      documented, parity at the default floor=1 is pinned.
    - ``max_words`` is the refuse-don't-OOM gate: ONE count aggregate
      runs before the collect, and a table larger than the gate raises
      with the remedy (raise min_word_freq, or fall back to the exact
      distributed ``train_bpe``) instead of silently collecting gigabytes
      — the PCA one-row-collect rule applied to BPE. None disables."""
    from collections import Counter, defaultdict

    wf = word_freqs(docs, text_col)
    if min_word_freq > 1:
        wf = wf.where(F.col("freq") >= min_word_freq)
    if max_words is not None:
        n_words = wf.count()
        if n_words > max_words:
            raise ValueError(
                f"word table has {n_words} rows > max_words={max_words}; "
                "raise min_word_freq to prune the rare tail before the "
                "driver collect, raise max_words explicitly, or use the "
                "distributed train_bpe"
            )
    rows = wf.collect()
    vocab: list[tuple[list[str], int]] = [
        (list(r.word) + [END_OF_WORD], int(r.freq)) for r in rows
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, (syms, freq) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            pair_words[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair —
        # identical to the distributed trainer's orderBy
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_pair_freq:
            break
        merges.append((a, b))
        for wi in list(pair_words[(a, b)]):
            syms, freq = vocab[wi]
            new_syms = _apply_merge(syms, a, b)
            if new_syms == syms:
                continue
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
            for p in set(zip(syms, syms[1:])):
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
            vocab[wi] = (new_syms, freq)
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] += freq
                pair_words[p].add(wi)
    return merges


def vocab_from_merges(merges: list[tuple[str, str]]) -> list[str]:
    """The subword vocabulary the merge table induces (merge outputs in
    learn order; base characters are implicit)."""
    return [a + b for a, b in merges]


def save_merges(spark, merges: list[tuple[str, str]], model_root: str) -> None:
    """Persist the merge table as a parquet model artifact (rank, a, b)
    on any Hadoop filesystem — train once, encode everywhere (the
    centroid-store pattern of operators/ann_index.py). The write's
    _SUCCESS marker is the commit; a torn write reads as absent and the
    retry overwrites idempotently."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(model_root)


def load_merges(spark, model_root: str) -> list[tuple[str, str]]:
    """The persisted merge table, in learn order — model-sized collect
    (n_merges rows)."""
    from http_feeds_spark.stores import parquet_exists

    if not parquet_exists(spark, model_root):
        raise FileNotFoundError(f"no BPE model at {model_root}; save_merges first")
    rows = spark.read.parquet(model_root).collect()
    return [(r.a, r.b) for r in sorted(rows, key=lambda r: r.rank)]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE encode: repeatedly apply the lowest-rank
    applicable merge (the classical algorithm, driver/worker-local)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def full_vocab(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> list[str]:
    """The deterministic token-id vocabulary: sorted distinct corpus
    characters, then the end-of-word marker, then merge outputs in learn
    order — index IS the token id. One character-distinct aggregate
    (model-sized: the alphabet)."""
    chars = sorted(
        r.c
        for r in docs.select(
            F.explode(F.split(F.col(text_col), "")).alias("c")
        )
        .where((F.col("c") != "") & (F.col("c") != " "))
        .distinct()
        .collect()
    )
    return chars + [END_OF_WORD] + [a + b for a, b in merges]


UNKNOWN_ID = -1  # tokens over characters unseen at vocab time


def encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: list[str] | None = None,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — Arrow-batched mapInPandas;
    per-batch word memoization exploits Zipf (few distinct words
    dominate). Map-only: encoding shuffles nothing.

    With ``vocab`` (full_vocab) the output adds ``token_ids array<int>``
    — the trainer-ready integer form, mapped inside the same Arrow pass
    (tokens over characters unseen at vocab time map to UNKNOWN_ID)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    ids = {t: i for i, t in enumerate(vocab)} if vocab is not None else None
    schema = f"{id_col} long, tokens array<string>, n_tokens int"
    if ids is not None:
        schema += ", token_ids array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc_text(text: str) -> list[str]:
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc_text)
            cols = {
                id_col: pdf[id_col],
                "tokens": toks,
                "n_tokens": toks.map(len).astype("int32"),
            }
            if ids is not None:
                cols["token_ids"] = toks.map(
                    lambda ts: [ids.get(t, UNKNOWN_ID) for t in ts]
                )
            yield pd.DataFrame(cols)

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
