"""Group C — streaming operators, checked via batch replay (SURVEY.md §2.C).

Structured Streaming's incremental engine re-plans these same logical
shapes per micro-batch; running them in batch over the bounded `events`
replay gives a DuckDB-checkable oracle for the *semantics* (stream-batch
equivalence is asserted separately in tests/test_streaming.py with a real
readStream).

Spec grounding: feeds are chronological (README.md:9), `time` is the
event timestamp (README.md:312), delivery is at-least-once (README.md:113)
⇒ consumers need dedup + windowed aggregation with bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_feeds_spark.queries import register
from http_feeds_spark.sources.tables import load_table

_VAL = "CAST(value AS DECIMAL(18,2))"


# --- C3a: tumbling window ----------------------------------------------------


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    group="C",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3a — tumbling 1h window per event_type. In streaming this is
    `withWatermark + groupBy(window(...))` with state evicted past the
    watermark; the batch plan is identical minus the state store. Windows
    are epoch-aligned so DuckDB's time_bucket reproduces the buckets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


# --- C3b: sliding window -----------------------------------------------------


@register(
    "q_stream_sliding",
    group="C",
    oracle=f"""
    WITH b AS (
      SELECT *,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start
      FROM events
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS total_value
    FROM b GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3b — sliding window (1h length, 30min slide): every event lands in
    exactly two epoch-aligned windows; Spark expands them with an internal
    Expand node (no self-union). The oracle unnests the same two starts.
    r15 rotation wave 2: cycled back into a driver slot while
    q_stream_session rotates out."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


# --- C4: session windows -----------------------------------------------------


@register(
    "q_stream_session",
    oracle=None,
    pytest_oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess_id
    """,
    group="C",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — gap-based session windows (30 min) per user. Spark merges
    events into a session while each arrives within the gap of the
    session's end; the oracle reproduces this with the classic
    gaps-and-islands window SQL (new session when gap >= 30 min).
    In streaming the same expression runs with watermark-bounded state.
    r15 rotation wave 2: rotated out (tumbling/watermark keep the
    streaming-agg slots); parity stays in tests/test_rotated_oracle.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# --- C2/C6: watermarked dedup (batch-replay oracle) --------------------------


@register(
    "q_stream_watermark",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
    group="C",
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C6 — at-least-once redelivery (README.md:113) healed by
    id-dedup. Batch replay: the feed plus a redelivered 2% slice, deduped
    on event_id, must reproduce the original feed exactly. The streaming
    twin (`withWatermark + dropDuplicatesWithinWatermark`) bounds dedup
    state by event time — asserted equivalent in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    redelivered = ev.filter(F.col("event_id") % 50 == 0)
    return ev.unionAll(redelivered).dropDuplicates(["event_id"])


# --- C8: stream-stream join (batch-replay twin) ------------------------------


@register("q_stream_join", oracle=None, group="C")
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — two-feed correlation: click→purchase attribution (same user,
    purchase within 1h after the click) via streaming/joins.py's
    watermarked stream-stream join, run here on its batch-replay twin
    (the watermark is a no-op on batch frames — same code path). The
    live two-file-stream replay ≡ this batch answer is pinned in
    tests/test_stream_join.py, along with the event-time band that
    bounds state-store growth. Rows-only at the driver (stream-stream
    join state semantics have no SQL twin within the slot budget)."""
    from http_feeds_spark.streaming.joins import stream_stream_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts", "user_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts", "user_id", "value"
    )
    return stream_stream_join(
        clicks, purchases, "user_id", watermark="90 days", upper="1 hour"
    ).select(
        "click_id",
        F.col("r_purchase_id").alias("purchase_id"),
        "user_id",
        F.col("r_value").alias("purchase_value"),
    )
