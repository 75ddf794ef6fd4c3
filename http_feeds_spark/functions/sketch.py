"""Count-min sketch — sublinear frequency estimation over token streams.

Complements Spark's built-in HLL (approx_count_distinct) with the other
workhorse stream sketch: approximate per-item counts in O(d×w) space,
with one-sided error (estimate ≥ true; over-estimate ≤ e·N/w with
probability 1-δ, d = ⌈ln 1/δ⌉ rows).

Spark shape: building the sketch IS a map-side-combined aggregate — each
token explodes into d (row, pmod(xxhash64(token, row), w)) cells and one
groupBy counts cell hits, so the shuffle carries at most d×w partial
counters per partition regardless of corpus size. The finished sketch is
d×w longs (model-sized): merge two sketches by adding counters
(exact — they are plain sums), estimate an item driver-side by taking
the min over its d cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_min_build(items: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """items: one row per occurrence → sketch rows (row, idx, cnt).
    Absent cells are implicit zeros."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).cast("int").alias("idx"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(F.col("c.row").alias("row"), F.col("c.idx").alias("idx")).agg(
        F.count("*").alias("cnt")
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): add counters.
    Exact — the merged sketch equals the sketch of the concatenated
    streams (asserted in tests)."""
    return (
        a.unionByName(b)
        .groupBy("row", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def local_top_candidates(items: DataFrame, col: str, per_partition: int = 64) -> DataFrame:
    """The pre-shuffle stage of :func:`local_top_items`: each partition
    emits its exact local top-M items (one Arrow-batched mapInPandas
    pass accumulating a Counter across the partition's batches) — at
    most M rows leave each task (pinned in tests/test_plans.py)."""
    import pandas as pd

    def gen(batches):
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[col].value_counts().to_dict())
        yield pd.DataFrame({col: [w for w, _ in counts.most_common(per_partition)]})

    return items.select(col).mapInPandas(gen, f"{col} string")


def local_top_items(items: DataFrame, col: str, per_partition: int = 64) -> DataFrame:
    """Heavy-hitter CANDIDATES without any full-corpus aggregation:
    :func:`local_top_candidates` then a distinct over the ≤ M×P
    candidate rows. Pigeonhole: any item with global share ≥ 1/M is the
    local top-M of at least one partition, so true heavy hitters always
    surface. The shuffle carries at most M rows per partition —
    sketch-sized, never vocabulary-sized."""
    return local_top_candidates(items, col, per_partition).distinct()


def count_min_estimate_df(
    sketch: DataFrame, candidates: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Distributed sketch probe: explode each candidate into its d cells,
    broadcast-join the d×w sketch (model-sized build side), take the min
    over the d cells. Absent cells are implicit zeros. Returns
    (col, est_freq) — the scalable path when the candidate set is itself
    a distributed table (driver-side `count_min_estimate` stays for
    model-sized item lists)."""
    probes = candidates.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).cast("int").alias("idx"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, F.col("c.row").alias("row"), F.col("c.idx").alias("idx"))
    joined = probes.join(F.broadcast(sketch), ["row", "idx"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_freq")
    )


def count_min_estimate(sketch: DataFrame, items: list[str], depth: int = 4,
                       width: int = 1024) -> dict[str, int]:
    """Frequency estimates for `items`: min over the d cells of each item.
    The sketch collect is d×w longs — model-sized, never data-sized."""
    cells = {(r.row, r.idx): r.cnt for r in sketch.collect()}
    spark = sketch.sparkSession
    idx_rows = spark.createDataFrame([(i,) for i in items], "item string").select(
        "item",
        *[
            F.pmod(F.xxhash64(F.col("item"), F.lit(d)), F.lit(width)).cast("int").alias(f"i{d}")
            for d in range(depth)
        ],
    ).collect()
    return {
        r.item: min(cells.get((d, r[f"i{d}"]), 0) for d in range(depth))
        for r in idx_rows
    }
