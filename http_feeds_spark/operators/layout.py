"""Z-order storage layout — multi-dimensional data skipping for the
landing zone (the public technique behind Delta Lake's OPTIMIZE ZORDER
and the classic Morton-curve literature: Morton 1966; Orenstein &
Merrett SIGMOD 1984).

Why it matters at 100 TB: parquet scans skip files and row groups by
min/max statistics. A time-sorted landing zone prunes time predicates
perfectly — and NOTHING else: every file spans the full key range for
any other column, so a `subject = X` lookup reads the whole corpus. A
Z-order layout sorts by the interleaved bits of several columns' ranks,
so each file covers a small HYPER-RECTANGLE in all of them: a predicate
on ANY Z-ordered column overlaps only ~n_files^((d-1)/d) of the files
(the curve's locality guarantee) — the difference between a lookup
that reads ~3% of files and one that reads 100%.

Spark shape:

- **Binning is map-only against broadcast cut literals**: per-column
  quantile cuts come from ONE approxQuantile pass (model-sized driver
  collect — bits·d doubles); rank-binning makes the curve robust to
  skew (equi-POPULATED cells, the range-ZORDER variant Delta uses, not
  equi-width).
- **The Morton value is pure bit arithmetic** (shiftleft / bitwiseOR
  over the binned ranks) in whole-stage codegen.
- **Layout = repartitionByRange(zval) + sortWithinPartitions(zval)**:
  one range shuffle — the same cost as the time-sort the landing zone
  pays anyway — then each output file holds a contiguous curve
  segment, which IS the hyper-rectangle property the reader skips by.

The locality property is asserted directly in tests/test_layout.py:
per-file min/max rectangles under a point/range predicate overlap a
small fraction of Z-ordered files vs ~all single-sorted files, and a
filtered read over the layout returns exactly the unlaid-out answer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_expr(col: str, cuts: list[float], cast_numeric: bool = True):
    """value → rank bin in [0, len(cuts)] via broadcast cut literals —
    a chain of whens (bits ≤ 8 → ≤ 255 cuts; codegen folds it)."""
    c = F.col(col).cast("double") if cast_numeric else F.col(col)
    out = F.lit(0)
    for i, cut in enumerate(cuts):
        out = F.when(c > F.lit(float(cut)), F.lit(i + 1)).otherwise(out)
    return out.cast("long")


def zorder_bins(
    df: DataFrame, cols: list[str], bits: int = 6
) -> tuple[DataFrame, int]:
    """Add __bin_<col> rank-bin columns (equi-populated, 2^bits cells
    per dimension). One approxQuantile job; binning is map-only."""
    n_bins = 1 << bits
    qs = [i / n_bins for i in range(1, n_bins)]
    out = df
    for col in cols:
        cuts = df.select(F.col(col).cast("double").alias("__v")).approxQuantile(
            "__v", qs, 0.001
        )  # model-sized: (2^bits - 1) doubles
        out = out.withColumn(f"__bin_{col}", _bin_expr(col, cuts))
    return out, bits


def morton_value(cols: list[str], bits: int):
    """Interleave the bin bits of d columns into one Morton key —
    bit b of column i lands at position b·d + i. Pure JVM bit ops."""
    d = len(cols)
    terms = []
    for i, col in enumerate(cols):
        b_col = F.col(f"__bin_{col}")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(b_col, b).bitwiseAND(F.lit(1)), b * d + i)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 6,
) -> None:
    """Write `df` as `n_files` parquet files laid out along the Morton
    curve of `cols`. One range shuffle; helper columns are dropped."""
    binned, bits = zorder_bins(df, cols, bits)
    (
        binned.withColumn("__z", morton_value(cols, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__bin_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max of `cols` — the skipping rectangles a
    stats-based reader prunes by. One column-pruned scan."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(*aggs)
