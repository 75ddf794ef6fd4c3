"""Skew mitigation — salted joins for pathological hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew by
splitting oversized partitions at runtime. Salting is the explicit,
planner-independent fallback for the pathological case — a handful of
keys holding a large fraction of all rows (the classic web-corpus
"empty doc" / null-subject hot keys):

- fact side: hot-key rows get a deterministic salt in [0, S) derived by
  hashing a high-cardinality column (NOT rand() — deterministic replay
  and oracle comparability matter), cold rows salt 0;
- dim side: hot-key rows are replicated S times (one per salt), cold
  rows once;
- equi-join on (key, salt) — the hot key's rows now spread over S tasks.

Replication cost is S × |hot dim rows| — bounded because hot_keys is a
small explicit list (from a stats pass or AQE metrics), never the whole
dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    spread_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` and `dim` on `key` with hot-key salting.

    `spread_col`: a fact-side column of high cardinality (row id, event
    id) whose hash spreads the hot key's rows across `buckets` salts.
    Result equals ``fact.join(dim, key, how)`` exactly (asserted in
    tests); only the physical distribution changes. Supported `how`:
    inner and left — a right/full join would emit each unmatched
    replicated dim row once PER SALT."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if not hot_keys:
        # F.array() with zero elements has no element type and fails
        # analysis inside array_contains — degrade to the plain join
        return fact.join(dim, key, how)
    hot = F.array(*[F.lit(k) for k in hot_keys])
    f = fact.withColumn(
        "__salt",
        F.when(
            F.array_contains(hot, F.col(key)),
            F.pmod(F.xxhash64(F.col(spread_col)), F.lit(buckets)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    d = dim.withColumn(
        "__salts",
        F.when(
            F.array_contains(hot, F.col(key)),
            F.sequence(F.lit(0), F.lit(buckets - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")
    return f.join(d, [key, "__salt"], how).drop("__salt")
