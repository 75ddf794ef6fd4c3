"""Range-containment join — point-in-interval matching at scale.

Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as a
BroadcastNestedLoopJoin (O(n×m) comparisons) — unusable once neither
side broadcasts. The scalable shape bucketizes the number line:

- each interval replicates into the buckets it overlaps
  (``sequence(floor(start/w), floor(end/w))`` exploded);
- each point maps to exactly ONE bucket (``floor(point/w)``);
- an equi-join on the bucket + the exact containment filter yields each
  matching pair exactly once — no dedup pass, because the point side is
  never replicated.

Cost: the interval side is replicated ~(span/width + 1)×, the join is a
hash equi-join on uniformly distributed bucket ids. Pick ``width`` near
the typical interval span: width ≫ span wastes bucket selectivity,
width ≪ span replicates intervals heavily. (This is the interval-join
strategy of stream processors and the DE-9IM gridding trick of
geospatial engines, specialized to one dimension.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType)


def _floor_div(df: DataFrame, colname: str, width: int) -> Column:
    """Floor-division of a numeric column by an int width, exact where the
    type allows it.

    Integral/decimal columns: ``floor(col / width)`` routes through double
    division, which rounds for |values| beyond 2^53 and can mis-bucket an
    endpoint (silently dropping matching pairs). Instead subtract the
    non-negative remainder (pmod) so the numerator is an exact multiple of
    width, then integer-`div` — truncation equals floor on exact
    multiples, and every step is 64-bit integer arithmetic. (Only keys
    within `width` of Long.MIN could underflow the subtraction — far
    outside any real key domain.)

    Float/double columns: SQL `div` rejects fractional operands, so take
    the plain ``floor(col / width)`` path — a double already has only 53
    mantissa bits, so the integer-exactness concern above cannot apply
    beyond the precision the input itself carries."""
    esc = colname.replace("`", "``")
    if isinstance(df.schema[colname].dataType, _INTEGRAL):
        q = f"(`{esc}` - pmod(`{esc}`, {width})) div {width}"
        return F.expr(q).cast("long")
    return F.floor(F.expr(f"`{esc}`") / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join point rows to every interval row containing them
    (``start <= point <= end``, numeric columns — cast timestamps with
    unix_micros first). Output columns = both inputs' columns; callers
    disambiguate name collisions beforehand. Inner semantics only: the
    containment filter runs after the bucket equi-join, which would
    silently drop the null-extended rows of any outer variant."""
    pts = points.withColumn("__bkt", _floor_div(points, point_col, bucket_width))
    ivs = (
        intervals.withColumn(
            "__bkts",
            F.sequence(
                _floor_div(intervals, start_col, bucket_width),
                _floor_div(intervals, end_col, bucket_width),
            ),
        )
        .withColumn("__bkt", F.explode("__bkts"))
        .drop("__bkts")
    )
    return (
        pts.join(ivs, "__bkt")
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bkt")
    )
