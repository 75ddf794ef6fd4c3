"""Hypertable-style continuous aggregates — hierarchical time rollups.

The pattern behind TimescaleDB continuous aggregates / Druid rollup
tables, in plain Spark: materialize the event stream ONCE at a fine
bucket (e.g. hourly) keeping only MERGEABLE partial aggregates (count,
sum, min, max — never avg), then serve any coarser granularity by
re-aggregating the rollup instead of the raw events. At 100 TB the raw
table is petabyte-scanned once per rollup refresh; every dashboard
query after that touches the rollup, which is smaller by the ratio of
events-per-bucket (here ~10⁴-10⁶×).

Correctness hinges on mergeability: SUM of sums ≡ sum, SUM of counts ≡
count, MIN of mins ≡ min — so the coarse answer from the rollup is
EXACT, not approximate (asserted against the raw aggregation in tests).
Averages are derived (sum/count) at query time, never stored.

The materialization is date-partitioned so incremental refresh rewrites
only the dates a micro-batch touched — the same partial-rewrite story
as streaming/compaction.py's epoch buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERGEABLE = ("n_events", "sum_value", "min_value", "max_value")


def rollup_aggregate(events: DataFrame, bucket: str, ts_col: str = "ts",
                     key_col: str = "event_type", value_col: str = "value") -> DataFrame:
    """Aggregate events to one row per (bucket_start, key) with mergeable
    partials. DECIMAL sums keep re-aggregation bit-exact at any level."""
    return (
        events.groupBy(F.window(ts_col, bucket).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), key_col, *MERGEABLE)
    )


def materialize_rollup(events: DataFrame, path: str, bucket: str = "1 hour") -> None:
    """Write the fine-grained rollup, date-partitioned for incremental
    refresh and partition-pruned reads."""
    ru = rollup_aggregate(events, bucket).withColumn(
        "bucket_date", F.to_date("bucket_start")
    )
    ru.write.mode("overwrite").partitionBy("bucket_date").parquet(path)


def reaggregate(rollup: DataFrame, bucket: str,
                key_col: str = "event_type") -> DataFrame:
    """Serve a coarser granularity from the stored rollup — merge the
    partials; derive avg at the end. Exact, and touches only rollup rows."""
    return (
        rollup.groupBy(F.window("bucket_start", bucket).alias("w"), key_col)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            key_col,
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
            (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
        )
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
