"""Deterministic sf0.1 → sf{N} scale-up tier (r14, the r13 verdict's
missing #2: SCALING.md argued every operator's 100× survival, but no
bench had ever run above sf0.1 — exactly the gap class the 50K-doc text
tier closed for retrieval in r10).

The driver's testdata stops at sf0.1, so the tier is synthesized by
FACTOR-way key-shifted replication of the sf0.1 tables — entirely with
Spark expressions (no driver-side loops, no randomness), so the output
is bit-identical across rounds and builds once into the warehouse (the
bench_text corpus contract in bench.py). Replication choices preserve
each query's work SHAPE instead of degenerating it:

- fact keys shift per copy (orderkeys, custkeys, event/user ids, doc and
  vec ids) so join/group/window cardinalities scale with the factor the
  way TPC-H scale factors grow keys — compaction output, top-k groups,
  and window partitions all get FACTOR× more keys, not FACTOR× deeper
  hot keys (the skew case is witnessed separately in
  tests/test_scale_smoke.py);
- dimension tables (part, supplier, nation, region) stay 1× — fact
  foreign keys into them are left unshifted, so broadcast-join shapes
  and referential integrity survive;
- document text is word-salted per copy (every token gets a copy
  suffix — the tests/test_scale_smoke.py convention): copies share no
  12-token span, no shingle, and no content hash, so exact/near/substr
  dedup see a FACTOR× corpus with the same per-copy duplicate
  structure, not an artificial FACTOR²-pair clone blowup;
- embeddings get a deterministic per-(copy, position) perturbation
  (cosine-meaningful, tie-free) and keep their float32 element type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_feeds_spark.sources.tables import load_table
from http_feeds_spark.stores import parquet_exists

# key shift per copy — far above any sf1-scale natural key
KEY_OFFSET = 100_000_000

SCALED_TABLES = ("lineitem", "orders", "customer", "events", "documents", "embeddings")
COPIED_TABLES = ("part", "supplier", "nation", "region")


def _copies(df: DataFrame, factor: int, transform, offset: int, salt: str) -> DataFrame:
    out = transform(df, 0, offset, salt)
    for i in range(1, factor):
        out = out.unionByName(transform(df, i, offset, salt))
    return out


def _scale_lineitem(df: DataFrame, i: int, offset: int, salt: str) -> DataFrame:
    return df.withColumn("l_orderkey", F.col("l_orderkey") + i * offset)


def _scale_orders(df: DataFrame, i: int, offset: int, salt: str) -> DataFrame:
    return df.withColumn("o_orderkey", F.col("o_orderkey") + i * offset).withColumn(
        "o_custkey", F.col("o_custkey") + i * offset
    )


def _scale_customer(df: DataFrame, i: int, offset: int, salt: str) -> DataFrame:
    return df.withColumn("c_custkey", F.col("c_custkey") + i * offset)


def _scale_events(df: DataFrame, i: int, offset: int, salt: str) -> DataFrame:
    # new event ids keep seq unique; new user ids scale the feed's
    # subject cardinality (sources/tables.events_as_feed maps
    # user_id → subject)
    return df.withColumn("event_id", F.col("event_id") + i * offset).withColumn(
        "user_id", F.col("user_id") + i * offset
    )


def _scale_documents(df: DataFrame, i: int, offset: int, salt: str) -> DataFrame:
    if i == 0:
        return df
    salted = F.regexp_replace("text", r"(\S+)", rf"$1{salt}{i}")
    return df.select(
        (F.col("doc_id") + i * offset).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
        F.length(salted).cast("long").alias("n_chars"),
    )


def _scale_embeddings(df: DataFrame, i: int, offset: int, salt: str) -> DataFrame:
    if i == 0:
        return df
    vid = F.col("vec_id")
    perturbed = F.transform(
        "embedding",
        lambda x, j: (
            x
            + (F.pmod(F.xxhash64(vid, j, F.lit(i)), F.lit(1000)) - 500).cast("double")
            / 10_000.0
        ).cast("float"),
    )
    return df.select(
        (vid + i * offset).alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
    )


_SCALERS = {
    "lineitem": _scale_lineitem,
    "orders": _scale_orders,
    "customer": _scale_customer,
    "events": _scale_events,
    "documents": _scale_documents,
    "embeddings": _scale_embeddings,
}


def ensure_scale_tier(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    factor: int = 10,
    key_offset: int = KEY_OFFSET,
    salt: str = "x",
) -> bool:
    """Materialize the scaled tier under ``dst_dir`` (one ``{table}.parquet``
    directory per driver table, the testdata layout load_table expects).
    Build-once: returns True when it built, False when every table
    already existed. Deterministic, so later rounds reuse the artifact.

    Tiers COMPOSE (r15, the sf100 rung): pass an already-scaled tier as
    ``src_dir`` with a ``key_offset`` at least ``first_factor ×
    first_offset`` (so second-level key shifts clear the first level's
    whole key range) and a fresh ``salt`` letter (level-1 copy 0 salted
    "y3" at level 2 must not collide with level-1 copy 3's "x3" tokens —
    same-letter composition would recreate exactly the shared shingles
    the salting exists to prevent)."""
    built = False
    dst = dst_dir.rstrip("/")
    for name in SCALED_TABLES:
        path = f"{dst}/{name}.parquet"
        if parquet_exists(spark, path):
            continue
        src = load_table(spark, src_dir, name)
        _copies(src, factor, _SCALERS[name], key_offset, salt).write.mode(
            "overwrite"
        ).parquet(path)
        built = True
    for name in COPIED_TABLES:
        path = f"{dst}/{name}.parquet"
        if parquet_exists(spark, path):
            continue
        load_table(spark, src_dir, name).write.mode("overwrite").parquet(path)
        built = True
    return built
