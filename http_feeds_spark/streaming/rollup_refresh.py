"""Incremental continuous-aggregate refresh — the streaming half of
operators/rollup.py.

Each micro-batch folds into the stored hourly rollup MERGEABLY: the
batch's partials (count / DECIMAL sum / min / max) merge with the stored
partials of only the DATES the batch touched, written as fresh epoch
directories with an atomic manifest re-point (same partial-rewrite +
pointer-swap machinery as streaming/compaction.py — imported, not
re-implemented). Because every stored aggregate is mergeable, the served
result after N micro-batches is EXACTLY the batch rollup of all events
so far (asserted in tests), regardless of how events were sliced into
batches.

Exactly-once: sums are NOT idempotent under at-least-once redelivery,
so the manifest records the last applied epoch_id and a re-delivered
micro-batch (same epoch_id — Spark's failure-recovery contract: the
retried batch has the identical id and content) is skipped. The guard
is scoped to one streaming query per rollup root: start a NEW checkpoint
against a FRESH root (epoch_id restarts at 0 and would otherwise be
mistaken for a replay).

Layout: ``root/epoch=<version>/date=<d>/part-*.parquet`` + _MANIFEST.json
mapping date -> epoch dir. Serving: read manifest dirs, reaggregate().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_feeds_spark.operators.rollup import MERGEABLE, rollup_aggregate
from http_feeds_spark.streaming.compaction import _load_manifest, _store_manifest


def _date_paths(root: str, manifest: dict, dates=None) -> list[str]:
    import os

    out = []
    for d, epoch_dir in manifest.get("buckets", {}).items():
        if dates is not None and d not in dates:
            continue
        p = os.path.join(root, epoch_dir, f"date={d}")
        if os.path.isdir(p):
            out.append(p)
    return out


def read_rollup_store(spark, root: str) -> DataFrame:
    """Current merged hourly partials (union of live date dirs)."""
    paths = _date_paths(root, _load_manifest(root))
    if not paths:
        return spark.createDataFrame(
            [], "bucket_start timestamp, event_type string, n_events long, "
            "sum_value decimal(28,2), min_value double, max_value double"
        )
    return spark.read.parquet(*paths)


def foreach_batch_rollup(root: str, bucket: str = "1 hour"):
    """Returns a foreachBatch function maintaining the hourly rollup."""

    def refresh(batch_df: DataFrame, epoch_id: int) -> None:
        import os
        import shutil

        spark = batch_df.sparkSession
        manifest_peek = _load_manifest(root)
        if manifest_peek.get("last_epoch_id") == epoch_id:
            return  # at-least-once redelivery of an already-applied batch
        # pin the sum to one decimal width: Spark widens sum-of-decimal
        # per level, and an epoch store must keep a stable schema
        fresh = (
            rollup_aggregate(batch_df, bucket)
            .withColumn("sum_value", F.col("sum_value").cast("decimal(28,2)"))
            .withColumn("date", F.to_date("bucket_start").cast("string"))
        )
        touched = {r.date for r in fresh.select("date").distinct().collect()}
        if not touched:
            return

        manifest = _load_manifest(root)
        existing_paths = _date_paths(root, manifest, touched)
        if existing_paths:
            existing = spark.read.parquet(*existing_paths).withColumn(
                "date", F.to_date("bucket_start").cast("string")
            )
            merged = (
                existing.unionByName(fresh.select(*existing.columns))
                .groupBy("bucket_start", "event_type", "date")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").cast("decimal(28,2)").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        else:
            merged = fresh
        merged = merged.select("date", "bucket_start", "event_type", *MERGEABLE)

        version = int(manifest.get("version", 0)) + 1
        manifest["version"] = version
        epoch_dir = f"epoch={version:012d}"
        merged.write.mode("overwrite").partitionBy("date").parquet(
            os.path.join(root, epoch_dir)
        )
        for d in touched:
            manifest["buckets"][d] = epoch_dir
        manifest["last_epoch_id"] = epoch_id
        _store_manifest(root, manifest)
        live = set(manifest["buckets"].values())
        for name in os.listdir(root):
            if name.startswith("epoch=") and name not in live:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)

    return refresh
