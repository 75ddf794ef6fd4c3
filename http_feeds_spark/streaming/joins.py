"""Watermarked stream-stream joins — correlating two live feeds
(C-group extension: the spec's feeds are independent event streams;
joining two of them — e.g. an order feed against its payment feed — is
the canonical two-stream correlation, and Structured Streaming's
stream-stream join is the Spark-native form).

Semantics (Spark's documented contract, restated): an INNER
stream-stream join emits a pair as soon as both sides have arrived; the
event-time RANGE condition plus watermarks is what lets the engine
discard buffered state — without them both sides buffer forever. OUTER
variants additionally emit the unmatched row with nulls only once the
watermark proves no future match can arrive.

100 TB posture: both streams shuffle on the join key into co-located
state-store partitions — the one unavoidable exchange of a stream join
(there is no broadcast form: either side may grow without bound). State
per partition is bounded by watermark_horizon × arrival rate on each
side, NOT by stream length — the range condition is mandatory here for
exactly that reason (this module refuses an unbounded join rather than
defaulting to one). Skewed keys skew state: pick the key accordingly,
or pre-salt both sides with the same salt.

Stream ≡ batch replay equivalence is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two watermarked streams on an equality key plus the
    event-time band  left_ts + lower <= right_ts <= left_ts + upper.

    Right-side columns are prefixed (``right_prefix``) so both payloads
    survive side by side; the right timestamp keeps its prefixed name
    for downstream windowing. Works identically on batch frames (the
    watermark is a no-op there) — which is what the replay-equivalence
    test exploits.

    ``how``: inner | leftOuter | rightOuter | fullOuter (outer rows
    emit only after the watermark closes their band — a bounded test
    fixture may never see them; see module docstring)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    renames = {c: f"{right_prefix}{c}" for c in r.columns}
    r = r.select([F.col(c).alias(n) for c, n in renames.items()])
    rk, rt = renames[on], renames[right_ts]
    cond = (
        (F.col(on) == F.col(rk))
        & (F.col(rt) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rt) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(rk)
