"""Vector functions over `array<float>` embedding columns.

All JVM-side higher-order functions (zip_with/transform/aggregate) — no
Python in the hot path, whole-stage codegen applies. Accumulation is
sequential left-to-right in DOUBLE, which makes results deterministic and
bit-identical to DuckDB's `list_sum(list_transform(...))` (verified) — the
property the oracle checks rely on.

Scale: these are per-row O(dim) expressions — they scan-parallelize
perfectly; no shuffle, no state. Top-k over similarities plans as
TakeOrderedAndProject (per-partition heaps).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b) -> Column:
    """Cosine similarity; NaN-free for non-zero vectors."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# DuckDB oracle renderings of the same expressions (kept adjacent so the
# two stay in lockstep — same sequential double accumulation).
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def duck_l2_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_l2_norm(a)} * {duck_l2_norm(b)}))"
