"""Parquet store probing shared by the persistent index modules
(streaming/dedup.py, operators/ann_index.py).

Index roots at 100 TB are object stores, so presence checks must go
through Spark's reader (any Hadoop-supported filesystem), never the
local-FS ``os.path`` calls that only work on the driver's disk.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path` via the Hadoop FS API — the only
    portable way to list/delete/probe directories on every Spark-
    supported store (the streaming/dedup.py epoch pattern)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jvm_path.getFileSystem(spark._jsc.hadoopConfiguration()), jvm_path


def committed(spark: SparkSession, path: str) -> bool:
    """True when `path` carries its committer _SUCCESS marker — the
    visibility rule every batch/epoch store in this package uses (a torn
    write has no marker and is invisible)."""
    fs, p = hadoop_fs(spark, path)
    return bool(
        fs.exists(spark._jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    )


def parquet_exists(spark: SparkSession, path: str) -> bool:
    """True when `path` is a readable parquet dataset. Probed through
    Spark's reader (footer/schema only — no data scan) so the check
    works on ANY Hadoop-supported filesystem (s3://, hdfs://, local).

    Only a definitive store-absent answer maps to False; any OTHER
    failure (transient object-store error, permissions) propagates.
    Swallowing it would be catastrophic for the callers: an index fold
    that mistakes a transient read error for "no index yet" would skip
    its idempotence anti-join and rebuild from one batch's data,
    silently destroying prior state."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException as e:
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
            or "Path does not exist" in msg
        ):
            return False
        raise


def require_lossless_cast(incoming, store, what: str) -> None:
    """Refuse-loudly type conformance for store appends (the dedup
    fold_batch rule applied to the cast sites): upserts cast incoming
    batches to the store's schema so one odd batch cannot poison every
    later multi-batch read — but with ANSI off a NARROWING cast coerces
    silently (long doc ids truncate into an int-keyed store, indexing
    wrong documents under aliased ids; double embeddings lose precision
    into a float store). Raise unless the cast provably round-trips:
    equal types, integral widening, float->double, or an array of a
    lossless element cast."""
    from pyspark.sql import types as T

    if incoming == store:
        return
    int_rank = {T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3, T.LongType(): 4}
    if incoming in int_rank and store in int_rank:
        if int_rank[incoming] <= int_rank[store]:
            return
    elif incoming == T.FloatType() and store == T.DoubleType():
        return
    elif isinstance(incoming, T.ArrayType) and isinstance(store, T.ArrayType):
        return require_lossless_cast(
            incoming.elementType, store.elementType, what
        )
    raise ValueError(
        f"{what}: incoming type {incoming.simpleString()} does not cast "
        f"losslessly into the store's {store.simpleString()} — rebuild the "
        "store with the wider type, or cast the batch explicitly upstream"
    )
