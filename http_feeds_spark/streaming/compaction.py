"""Stateful streaming compaction — latest-state-per-subject on a live feed.

The streaming twin of operators/feed.py::read_model (SURVEY §2 C5): the
spec's aggregate-feed consumer keeps, per subject, the newest full-state
PUT and deletes tombstoned subjects (/root/reference/README.md:168-179,
:270-292). `dropDuplicates` cannot express this (it keeps the FIRST
arrival; compaction needs the LAST), so state is explicit:

- `latest_per_subject_stream`: applyInPandasWithState keyed by subject.
  State = (seq, full row) of the newest event seen; each micro-batch
  emits the subject's new latest row (update semantics). Tombstones emit
  a DELETE marker row so sinks can remove the aggregate (README.md:290).

- `foreach_batch_upsert`: the sink-side alternative — MERGE-emulation
  into a Parquet read-model table (anti-join + union overwrite). Used
  where the serving store, not Spark state, is the source of truth.

100 TB posture: state is one small row per live subject, hash-partitioned
by subject across executors (RocksDB state store on a real cluster); the
operator never holds a batch's worth of data in memory per key. State is
bounded by the live-subject cardinality — compaction semantics, not time,
bound it (a TTL would *break* correctness: any subject may be updated
forever later; real deployments shard the feed if subjects outgrow state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output: subject, seq, time (epoch micros), type, method, data, is_deleted
OUTPUT_SCHEMA = (
    "subject string, seq long, time timestamp, type string, "
    "method string, data string, is_deleted boolean"
)
STATE_SCHEMA = "seq long, time_us long, type string, method string, data string"


def _update_latest(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Per-subject reducer: keep the max-seq event; emit when it changes."""
    subject = key[0]
    best = None  # (seq, time_us, type, method, data)
    if state.exists:
        best = tuple(state.get)
    changed = False
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            seq = int(row.seq)
            if best is None or seq > best[0]:
                t_us = int(row.time.value // 1000) if pd.notna(row.time) else 0
                method = row.method if isinstance(row.method, str) else "PUT"
                data = row.data if isinstance(row.data, str) else None
                best = (seq, t_us, row.type, method, data)
                changed = True
    if changed and best is not None:
        state.update(best)
        is_deleted = best[3] == "DELETE"
        yield pd.DataFrame(
            {
                "subject": [subject],
                "seq": [best[0]],
                "time": [pd.Timestamp(best[1], unit="us")],
                "type": [best[2]],
                "method": [best[3]],
                "data": [best[4]],
                "is_deleted": [is_deleted],
            }
        )


def latest_per_subject_stream(feed_with_seq: DataFrame) -> DataFrame:
    """Streaming latest-per-subject over an envelope stream that already
    carries a monotone `seq` column (mint with operators.feed.parse_seq —
    composite ids, README.md:159). Output mode must be 'update'."""
    cols = ["subject", "seq", "time", "type", "method", "data"]
    return (
        feed_with_seq.select(*cols)
        .groupBy("subject")
        .applyInPandasWithState(
            _update_latest,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def foreach_batch_upsert(read_model_path: str):
    """Sink-side MERGE emulation: upsert each micro-batch's latest rows
    into a Parquet read-model table (delete-on-tombstone included).
    Returns a function for `writeStream.foreachBatch`.

    On a cluster this would be a Delta/Iceberg MERGE; the anti-join +
    union + overwrite here is the jar-free equivalent with the same
    semantics (idempotent per batch — at-least-once safe)."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        w = Window.partitionBy("subject").orderBy(F.col("seq").desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        try:
            existing = spark.read.parquet(read_model_path)
        except Exception:
            existing = None
        if existing is not None:
            keep = existing.join(latest.select("subject"), "subject", "left_anti")
            merged = keep.unionByName(latest)
        else:
            merged = latest
        merged = merged.filter(~F.col("is_deleted"))
        merged.write.mode("overwrite").parquet(read_model_path)

    return upsert
