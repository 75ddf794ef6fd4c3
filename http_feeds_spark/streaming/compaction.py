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
  into a bucketed, epoch-versioned Parquet read-model table. Used
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
    """Per-subject reducer: keep the max-seq event; emit when it changes.

    Vectorized: one ``idxmax`` per Arrow chunk picks the chunk's newest
    event, then a single compare against state — no per-row Python loop."""
    subject = key[0]
    best = None  # (seq, time_us, type, method, data)
    if state.exists:
        best = tuple(state.get)
    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        row = pdf.loc[pdf["seq"].idxmax()]
        seq = int(row["seq"])
        if best is None or seq > best[0]:
            t = row["time"]
            t_us = int(t.value // 1000) if pd.notna(t) else 0
            method = row["method"] if isinstance(row["method"], str) else "PUT"
            data = row["data"] if isinstance(row["data"], str) else None
            best = (seq, t_us, row["type"], method, data)
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


_MANIFEST = "_MANIFEST.json"


def _bucket_expr(num_buckets: int):
    import pyspark.sql.functions as F

    return F.pmod(F.xxhash64("subject"), F.lit(num_buckets)).cast("int")


def _load_manifest(root: str) -> dict:
    import json
    import os

    path = os.path.join(root, _MANIFEST)
    if not os.path.exists(path):
        return {"buckets": {}}
    with open(path) as f:
        return json.load(f)


def _store_manifest(root: str, manifest: dict) -> None:
    """Atomic pointer swap: tmp file + os.replace. On object storage the
    equivalent is a conditional PUT of the manifest key (or a real table
    format's commit protocol)."""
    import json
    import os

    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, _MANIFEST))


def _bucket_paths(root: str, manifest: dict, buckets=None) -> list[str]:
    import os

    out = []
    for b, epoch_dir in manifest.get("buckets", {}).items():
        if buckets is not None and int(b) not in buckets:
            continue
        p = os.path.join(root, epoch_dir, f"bucket={b}")
        if os.path.isdir(p):  # empty bucket => no dir written
            out.append(p)
    return out


def read_read_model(spark, root: str) -> DataFrame:
    """Read the current read-model snapshot (union of live bucket dirs)."""
    paths = _bucket_paths(root, _load_manifest(root))
    if not paths:
        return spark.createDataFrame([], OUTPUT_SCHEMA)
    return spark.read.parquet(*paths)


def foreach_batch_upsert(read_model_path: str, num_buckets: int = 16):
    """Sink-side MERGE emulation: upsert each micro-batch's latest rows
    into a bucketed Parquet read-model table (delete-on-tombstone
    included). Returns a function for `writeStream.foreachBatch`.

    Layout: ``root/epoch=<id>/bucket=<b>/part-*.parquet`` plus a tiny
    ``_MANIFEST.json`` mapping bucket -> epoch dir. Each micro-batch:

    1. reduces the batch to latest-per-subject and computes each row's
       bucket = pmod(xxhash64(subject), N);
    2. reads ONLY the touched buckets' current files (old epoch dirs),
       anti-joins on subject, unions the new rows, drops tombstones;
    3. writes the merged touched buckets into a FRESH ``epoch=<id>``
       directory — the read path and write path never coincide, so the
       read-then-overwrite-same-path hazard cannot occur;
    4. atomically re-points the touched buckets in the manifest and
       garbage-collects unreferenced epoch dirs.

    I/O per batch is O(size of touched buckets), not O(full table); with
    well-spread subjects a batch touching k subjects rewrites at most
    min(k, N) buckets. Epoch dirs are named by a manifest-owned monotone
    version (NOT epoch_id, which resets when a stream restarts with a
    fresh checkpoint and could then collide with a still-referenced dir).
    A replayed micro-batch re-merges into a fresh version with identical
    logical content — at-least-once safe. On a cluster this would be a
    Delta/Iceberg MERGE; this is the jar-free equivalent with the same
    semantics and the same partial-rewrite I/O shape."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        import os
        import shutil

        import pyspark.sql.functions as F
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        w = Window.partitionBy("subject").orderBy(F.col("seq").desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("bucket", _bucket_expr(num_buckets))
        )
        touched = {r.bucket for r in latest.select("bucket").distinct().collect()}
        if not touched:  # empty micro-batch
            return

        manifest = _load_manifest(read_model_path)
        existing_paths = _bucket_paths(read_model_path, manifest, touched)
        new_rows = latest.drop("bucket")
        if existing_paths:
            existing = spark.read.parquet(*existing_paths)
            keep = existing.join(new_rows.select("subject"), "subject", "left_anti")
            merged = keep.unionByName(new_rows)
        else:
            merged = new_rows
        merged = merged.filter(~F.col("is_deleted"))
        merged = merged.withColumn("bucket", _bucket_expr(num_buckets))

        version = int(manifest.get("version", 0)) + 1
        manifest["version"] = version
        epoch_dir = f"epoch={version:012d}"
        out = os.path.join(read_model_path, epoch_dir)
        merged.write.mode("overwrite").partitionBy("bucket").parquet(out)

        for b in touched:
            manifest["buckets"][str(b)] = epoch_dir
        _store_manifest(read_model_path, manifest)

        # GC epochs no longer referenced by any bucket pointer. A real
        # deployment with concurrent readers would delay this by a grace
        # period; local semantics are single-writer.
        live = set(manifest["buckets"].values())
        for name in os.listdir(read_model_path):
            if name.startswith("epoch=") and name not in live:
                shutil.rmtree(os.path.join(read_model_path, name), ignore_errors=True)

    return upsert
