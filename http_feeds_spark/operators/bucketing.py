"""Bucketed tables — co-located joins without a per-query shuffle.

At 100 TB the same big-table equi-join runs thousands of times (read
model × enrichment dims, dedup verify joins, feature joins). Bucketing
pre-shuffles ONCE at write time: both sides hash-partitioned into the
same bucket count on the join key, so Catalyst plans a SortMergeJoin
with NO Exchange on either side — the per-query shuffle disappears.
(Spark bucketing = Hive-compatible bucket files + metastore metadata;
the jar-free local analogue of Delta/Iceberg clustered layout.)

Guidance encoded here:
- bucket count is a write-time contract: both join sides must match;
- sortBy(key) within buckets lets the merge join skip the sort too;
- bucket pruning applies to key = literal filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Write `df` as an external Parquet table bucketed (and sorted)
    by `key`. Joining two tables written with the same (key, buckets)
    plans shuffle-free (asserted in tests/test_plans.py)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata lives in the catalog, so
    this must go through the table name, not the path)."""
    return spark.table(table)
