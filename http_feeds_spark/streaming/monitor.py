"""Continuous corpus monitoring — fold per-batch corpus aggregates into
a stats store as the feed grows, and answer drift questions from the
STORE, never by re-reading documents.

The missing operational piece between ingest (ingest.py) and the batch
drift gate (operators/drift.py): a pipeline that ingests continuously
wants "has the last hour drifted from last week?" answerable at
aggregate cost. So each micro-batch appends two MERGEABLE summaries:

    stats/batch=<id>/   one row: n_docs, n_tokens, n_chars, short_docs
                        (plain sums — any batch range re-aggregates
                        exactly by summing)
    words/batch=<id>/   the batch's (word, n) unigram counts
                        (vocabulary-sized; count frames are the other
                        classically mergeable aggregate)

Idempotence = the directory layout: each batch writes BY OVERWRITE to
its own ``batch=<id>`` directory, so a foreachBatch replay after a
crash rewrites the same paths with the same deterministic content —
at-least-once delivery, exactly-once store effect, no transactional
sink needed (the ingest.py convention).

``js_between`` then computes the exact Jensen-Shannon divergence
between ANY two batch ranges by summing their stored count frames
(drift.js_divergence_counts) — O(vocabulary), zero document reads.

At 100 TB: per-batch work is one aggregation pass over the batch; the
stores grow by (1 + vocab) rows per batch; range queries read only the
``batch=N`` directories they name (partition pruning on the batch key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_feeds_spark.functions import text as tx
from http_feeds_spark.operators import drift

STATS_DIR = "stats"
WORDS_DIR = "words"


def fold_batch(
    spark: SparkSession,
    docs: DataFrame,
    monitor_root: str,
    batch_id: int,
    text_col: str = "text",
) -> None:
    """Append one micro-batch's summaries (idempotent per batch id)."""
    root = monitor_root.rstrip("/")
    toks = F.size(tx.words(F.col(text_col))).cast("long")
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum(toks), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce(F.sum(F.when(toks < 50, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("short_docs"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        f"{root}/{STATS_DIR}/batch={batch_id}"
    )
    drift.word_counts(docs, text_col).write.mode("overwrite").parquet(
        f"{root}/{WORDS_DIR}/batch={batch_id}"
    )


def read_stats(spark: SparkSession, monitor_root: str) -> DataFrame:
    """(batch, n_docs, n_tokens, n_chars, short_docs) — one row per
    folded batch (the batch key comes from the partition directory)."""
    return spark.read.option("basePath", f"{monitor_root.rstrip('/')}/{STATS_DIR}").parquet(
        f"{monitor_root.rstrip('/')}/{STATS_DIR}"
    )


def _range_counts(
    spark: SparkSession, monitor_root: str, batches: list[int]
) -> DataFrame:
    root = monitor_root.rstrip("/")
    paths = [f"{root}/{WORDS_DIR}/batch={b}" for b in batches]
    return (
        spark.read.parquet(*paths)
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
    )


def js_between(
    spark: SparkSession,
    monitor_root: str,
    batches_a: list[int],
    batches_b: list[int],
) -> float:
    """Exact JS divergence between two batch RANGES, from the stored
    count frames only — count frames merge by summation, so the range
    distribution is exact, and no document is ever re-read."""
    return drift.js_divergence_counts(
        _range_counts(spark, monitor_root, batches_a),
        _range_counts(spark, monitor_root, batches_b),
    )


def compact_batches(
    spark: SparkSession, monitor_root: str, upto: int
) -> list[int]:
    """Merge every batch ≤ ``upto`` into one batch dir (keyed by the
    LOWEST merged id) — the retention story that keeps the monitor
    stores bounded: count frames and stat sums are mergeable, so the
    merged dir answers every range query the originals did, just at
    coarser granularity (you can no longer split inside the merged
    range — compact at the granularity you still need, e.g. daily).

    Crash-safe in the store's own idempotence model: the merged dir is
    (over)written FIRST, stale source dirs are deleted after — a crash
    in between leaves the merged dir plus some originals, and because
    re-running compact recomputes the same merge from whatever remains
    (sums of sums are the same sums), it converges. Returns the batch
    ids remaining after compaction."""
    root = monitor_root.rstrip("/")
    stats = read_stats(spark, root)
    ids = sorted(r.batch for r in stats.select("batch").distinct().collect())
    merge = [b for b in ids if b <= upto]
    if len(merge) < 2:
        return ids
    keep_id = merge[0]
    merged_words = _range_counts(spark, root, merge).localCheckpoint()
    merged_stats = (
        spark.read.parquet(*[f"{root}/{STATS_DIR}/batch={b}" for b in merge])
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("short_docs").cast("long").alias("short_docs"),
        )
        .localCheckpoint()
    )
    merged_words.write.mode("overwrite").parquet(
        f"{root}/{WORDS_DIR}/batch={keep_id}"
    )
    merged_stats.coalesce(1).write.mode("overwrite").parquet(
        f"{root}/{STATS_DIR}/batch={keep_id}"
    )
    # deletion via the Hadoop FS API — works on any Spark-supported
    # store, like the epoch cleanup in streaming/dedup.py
    for b in merge[1:]:
        for d in (WORDS_DIR, STATS_DIR):
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/{d}/batch={b}")
            fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jvm_path, True)
    return [keep_id] + [b for b in ids if b > upto]
