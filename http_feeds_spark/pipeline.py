"""End-to-end training-corpus preparation — the Group D operators
composed in their canonical order, one call.

Every stage exists (and is tested) on its own; what a data team actually
runs is the COMPOSITION, and the composition has ordering semantics
worth pinning:

    quality gate          map-only predicates; cheapest first
    boilerplate strip     (optional) rewrite text BEFORE dedup — shared
                          chrome otherwise glues unrelated docs into
                          near-dup clusters
    exact dedup           content-hash, min-id survivor
    near-dup dedup        MinHash-LSH pairs -> closure -> survivor filter
    decontamination       (optional) drop corpus docs fingerprint-
                          matching an external eval/benchmark set
    domain mixture        (optional) downsample to target source shares
    split                 deterministic value-hash train/val/test
    pack                  offset-pack the train split into token bins

All membership decisions are value-hash deterministic (functions/
sampling.py), every dedup exchange is ids-only (operators/components.py)
and the only full-text passes are the scan-side token pipelines — so the
whole composition is one DAG Spark executes with no driver-side data
movement, and running it twice yields byte-identical corpora
(pinned in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_feeds_spark.functions import sampling as smp
from http_feeds_spark.functions import text as tx


DEFAULT_SPLIT = {"train": 0.9, "val": 0.05, "test": 0.05}


def quality_gate(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en", "de", "es"),
    min_chars: int = 100,
    max_chars: int = 2000,
    min_words: int = 10,
) -> DataFrame:
    """The q_llm_quality predicates as a reusable stage: language
    whitelist + char bounds + minimum word count. Map-only, pushes into
    the scan."""
    n_words = F.size(tx.words("text"))
    return docs.filter(
        F.col("lang").isin(*langs)
        & F.col("n_chars").between(min_chars, max_chars)
        & (n_words >= min_words)
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id copy of every byte-identical text. One shuffle on
    the 256-bit hash; survivor ids come back as an ids-only semi-join so
    document payloads shuffle once, not twice."""
    keep = (
        docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def _decontaminate_against(
    corpus: DataFrame, eval_docs: DataFrame, min_shared: int
) -> DataFrame:
    """Drop corpus docs sharing >= min_shared winnowing fingerprints
    with any eval/benchmark document (queries/llm.decontaminate run
    with the corpus as 'train' and the eval set as 'test'). Eval ids are
    remapped to a negative id space so they can never collide with
    corpus ids."""
    from http_feeds_spark.queries.llm import decontaminate

    tagged = corpus.select("doc_id", "text", F.lit("train").alias("split")).unionByName(
        eval_docs.select(
            (-F.col("doc_id") - 1).alias("doc_id"), "text", F.lit("test").alias("split")
        )
    )
    contaminated = (
        decontaminate(tagged, min_shared=min_shared)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
    )
    return corpus.join(contaminated, "doc_id", "left_anti")


def prepare_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    *,
    langs: tuple[str, ...] = ("en", "de", "es"),
    min_chars: int = 100,
    max_chars: int = 2000,
    min_words: int = 10,
    strip_boilerplate: bool = False,
    boilerplate_min_docs: int = 5,
    segment_tokens: int = 10,
    scrub_substrings: bool = False,
    substr_length: int = 12,
    max_ppl: float | None = None,
    ppl_reference: DataFrame | None = None,
    zlib_ratio_bounds: tuple[float, float] | None = None,
    near_dup: bool = True,
    eval_docs: DataFrame | None = None,
    min_shared_fps: int = 2,
    mixture: dict[str, float] | None = None,
    split_weights: dict[str, float] | None = None,
    seed: int = 0,
    pack_budget: int = 2048,
    shard_root: str | None = None,
    bins_per_shard: int = 64,
) -> dict:
    """Run the full preparation pipeline; returns::

        {"corpus":       DataFrame(doc_id, text, lang, source, n_chars, split),
         "train_packed": DataFrame(doc_id, n_tokens, bin),
         "report":       [(stage, n_docs), ...]  # in pipeline order}

    The report counts force one job per stage boundary — that is the
    point (a pipeline run IS an audit); callers needing a single lazy
    DAG can compose the stage functions directly.

    Stage boundaries are PERSISTED (memory-and-disk) for exactly one
    stage: without the pin, every boundary count re-executes the whole
    lineage back to the scan — the near-dup LSH pipeline alone would
    re-run once per LATER stage, turning an n-stage audit into
    O(n²) stage executions (measured ~10× wall at sf0.1). Each boundary
    unpersists its predecessor, so steady-state storage is one stage's
    corpus; the last pin is dropped before returning, leaving the
    result frames as the usual lazy DAG."""
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    split_weights = dict(split_weights or DEFAULT_SPLIT)
    report: list[tuple[str, int]] = []
    pinned: list[DataFrame] = []

    def _boundary(df: DataFrame, stage: str) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        report.append((stage, df.count()))
        if pinned:
            pinned.pop().unpersist()
        pinned.append(df)
        return df

    # The input audit count rides the quality boundary's job as an
    # observed metric instead of its own full pass: the CollectMetrics
    # node sits below the quality filter, so it counts every input row
    # exactly once while the quality stage materializes. (The quality
    # predicates no longer push into the scan — the input count needs
    # every row read anyway, so the fused pass is never wider than the
    # two passes it replaces.) Re-executing the lineage later leaves the
    # first-action metric untouched per the Observation contract.
    obs = Observation()
    cur = _boundary(
        quality_gate(
            docs.observe(obs, F.count(F.lit(1)).alias("rows")),
            langs, min_chars, max_chars, min_words,
        ),
        "quality",
    )
    report.insert(0, ("input", int(obs.get["rows"])))

    if zlib_ratio_bounds is not None:
        # entropy gate (functions/text.compression_ratio, r10): both
        # tails are degenerate — ratios below `lo` are character-level
        # repetition the word-window rules miss, above `hi`
        # incompressible junk. Runs BEFORE the LM gate: one cheap
        # Arrow-batched pass that spares perplexity scoring the
        # documents it would reject anyway.
        lo, hi = zlib_ratio_bounds
        cur = _boundary(
            cur.filter(tx.compression_ratio("text").between(lo, hi)), "entropy"
        )

    if max_ppl is not None:
        # CCNet-style LM gate (functions/ngram_lm.py): reference = the
        # caller's clean corpus, else the quality-gated corpus itself
        # (self-referential filtering drops only the distribution TAIL).
        from http_feeds_spark.functions import ngram_lm as nlm

        ref = ppl_reference if ppl_reference is not None else cur
        uni, bi, vocab = nlm.train_bigram_lm(ref.select("text"))
        keep = (
            nlm.perplexity(cur, uni, bi, vocab)
            .filter(F.col("ppl") <= max_ppl)
            .select("doc_id")
        )
        cur = _boundary(cur.join(keep, "doc_id", "left_semi"), "perplexity")

    if strip_boilerplate:
        from http_feeds_spark.operators import boilerplate as bp

        stripped = bp.strip_frequent_segments(
            cur, n=segment_tokens, min_docs=boilerplate_min_docs
        ).select("doc_id", F.col("clean_text").alias("text"),
                 F.col("n_chars_clean").alias("n_chars"))
        cur = _boundary(
            stripped.filter(F.col("n_chars") > 0)
            .join(cur.select("doc_id", "lang", "source"), "doc_id"),
            "boilerplate",
        )

    if scrub_substrings:
        # sliding-window complement of the aligned-frame strip: cut
        # >= substr_length-token spans repeated verbatim ANYWHERE
        # (operators/substr_dedup.py), then re-derive n_chars
        from http_feeds_spark.operators import substr_dedup as sdd

        scrubbed = sdd.scrub_duplicated_spans(
            cur, length=substr_length
        ).select(
            "doc_id",
            F.col("scrubbed_text").alias("text"),
            F.length("scrubbed_text").cast("long").alias("n_chars"),
        )
        cur = _boundary(
            scrubbed.filter(F.col("n_chars") > 0)
            .join(cur.select("doc_id", "lang", "source"), "doc_id"),
            "substr_scrub",
        )

    cur = _boundary(exact_dedup(cur), "exact_dedup")

    if near_dup:
        from http_feeds_spark.operators.components import dedup_corpus
        from http_feeds_spark.queries.llm import _near_dup_pairs

        cur = _boundary(
            dedup_corpus(cur, _near_dup_pairs(cur.select("doc_id", "text"))),
            "near_dedup",
        )

    if eval_docs is not None:
        cur = _boundary(
            _decontaminate_against(cur, eval_docs, min_shared_fps), "decontaminate"
        )

    if mixture:
        cur = _boundary(smp.resample_to_mixture(cur, mixture, seed=seed), "mixture")

    corpus = smp.with_split(cur, "doc_id", split_weights, seed=seed)
    train = corpus.filter(F.col("split") == "train").select(
        "doc_id", F.size(tx.words("text")).alias("n_tokens")
    )
    train_packed = smp.pack_into_bins(train, "n_tokens", pack_budget, seed=seed)
    report.append(("train", train.count()))

    out = {"corpus": corpus, "train_packed": train_packed, "report": report}
    if shard_root is not None:
        # terminal artifact: trainer-ready shards in consumption order
        out["n_shards"] = smp.export_training_shards(
            corpus.filter(F.col("split") == "train"),
            train_packed,
            shard_root,
            bins_per_shard=bins_per_shard,
            seed=seed,
        )
        report.append(("shards", out["n_shards"]))
    # drop the final pin: every eager pass (counts, shard export) is
    # done, and the returned frames stay the usual lazy DAG — a caller
    # consuming them recomputes the pipeline once, exactly as before
    while pinned:
        pinned.pop().unpersist()
    return out
