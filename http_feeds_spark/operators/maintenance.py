"""Landing-zone maintenance: background compaction of archived feeds.

The spec treats compaction as a server-side background rewrite that
shrinks the log while preserving positions (/root/reference/README.md:
181-192, :236, :292). On the consumer/engine side the analogue is a
periodic batch job over the Parquet landing zone (same role as Kafka log
cleaning or Delta OPTIMIZE): rewrite each feed archive keeping only the
newest entry per subject, dropping fully-tombstoned subjects, range-
partitioned by `seq` so offset scans keep pruning files.

100 TB posture: the rewrite is a single window per key (one shuffle);
output is range-partitioned on seq so `seq > cursor` scans skip whole
files via Parquet min/max; tombstones older than `keep_tombstones_for`
replays can be physically dropped once consumers are past them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_feeds_spark.operators import feed as ops


def write_landing_zone(
    feed: DataFrame,
    path: str,
    files_per_date: int = 1,
) -> None:
    """Archive a feed date-partitioned: ``event_date=YYYY-MM-DD/`` dirs.

    The two scan predicates consumers actually issue both prune:
    - ``time >= X`` / date ranges skip whole directories (PartitionFilters
      — asserted in tests/test_plans.py);
    - ``seq > cursor`` skips files within a directory via Parquet min/max
      (the archive is written in seq order per date).

    ``files_per_date`` spreads each date over N writer tasks (hash of the
    unique id) — one task per date is a skew trap once a hot date holds a
    large share of the corpus."""
    df = feed.withColumn("event_date", F.to_date("time"))
    if files_per_date > 1:
        df = df.repartition(
            F.col("event_date"), F.pmod(F.xxhash64("id"), F.lit(files_per_date))
        )
    else:
        df = df.repartition("event_date")
    (
        df.sortWithinPartitions("seq")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_landing_zone(spark: SparkSession, path: str) -> DataFrame:
    """Read a date-partitioned feed archive (event_date is a partition
    column — filters on it prune directories before any I/O)."""
    return spark.read.parquet(path)


def compact_landing_zone(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    drop_tombstoned_subjects: bool = True,
    tombstone_horizon_seq: int | None = None,
    target_partitions: int | None = None,
) -> DataFrame:
    """Rewrite a feed archive compacted; returns the compacted DataFrame
    (also written to `out_path`).

    Positions survive: `seq` values are preserved verbatim, so any
    consumer cursor remains valid against the compacted archive
    (README.md:150-154).

    Tombstone retention: a DELETE entry instructs consumers to remove
    the aggregate (README.md:290), so the archive may only drop it once
    every consumer has replayed past it — otherwise a mid-replay
    consumer would never learn of the deletion. With
    ``tombstone_horizon_seq`` (the minimum cursor across registered
    consumers), only tombstones at or below the horizon are physically
    removed; newer ones stay in the rewrite. ``None`` keeps the old
    drop-everything behavior for archives with no active replayers.
    Prior entries of a tombstoned subject are always compacted away
    (README.md:292 — the DELETE is the subject's latest entry, so the
    window keeps exactly it).
    """
    feed = spark.read.parquet(in_path)
    compacted = ops.compact(feed)
    if drop_tombstoned_subjects:
        compacted = ops.drop_tombstoned(compacted, horizon_seq=tombstone_horizon_seq)
    # size from session parallelism, not the plan's RDD lineage (which
    # would materialize just to read a partition count); AQE coalesces
    n = target_partitions or max(1, spark.sparkContext.defaultParallelism)
    # range-partition by seq: keeps offset scans file-prunable after rewrite
    (
        compacted.repartitionByRange(n, "seq")
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return spark.read.parquet(out_path)
