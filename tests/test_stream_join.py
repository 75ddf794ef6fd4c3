"""Stream-stream join (streaming/joins.py): replay equivalence — the
watermarked two-stream attribution join over file streams equals the
same join run as one batch — plus the unbounded-state refusal contract.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from http_feeds_spark.streaming.joins import stream_stream_join


def _events(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def test_stream_join_equals_batch(spark, sf_dir):
    """Click→purchase attribution (purchase by the same user within 1h
    after a click): inner stream-stream join with event-time band, run
    over two file streams in micro-batches, must equal the batch join
    row for row. Inner joins emit eagerly, so bounded fixtures see the
    complete answer.

    The replay watermark must exceed the fixture's full time span (the
    events table covers ~30 days): file micro-batches replay in
    ARBITRARY time order, so any tighter watermark legitimately drops
    'late' rows that the batch plan keeps — that is the watermark doing
    its job, not a bug, but it breaks equivalence. Production streams
    arrive roughly in order; replay of unordered history must either
    sort the files or widen the watermark, as here."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts", "user_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts", "user_id", "value"
    )

    batch = stream_stream_join(
        clicks,
        purchases,
        "user_id",
        watermark="90 days",
        lower="0 seconds",
        upper="1 hour",
    )
    want = {
        (r.click_id, r.r_purchase_id) for r in batch.collect()
    }
    assert want, "fixture must produce at least one attribution pair"

    with tempfile.TemporaryDirectory() as tmp:
        clicks.repartition(3).write.parquet(f"{tmp}/clicks")
        purchases.repartition(3).write.parquet(f"{tmp}/purchases")
        cs = (
            spark.readStream.schema(clicks.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/clicks")
        )
        ps = (
            spark.readStream.schema(purchases.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/purchases")
        )
        joined = stream_stream_join(
            cs,
            ps,
            "user_id",
            watermark="90 days",
            lower="0 seconds",
            upper="1 hour",
        ).select("click_id", "r_purchase_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("attrib_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.click_id, r.r_purchase_id)
            for r in spark.sql("SELECT * FROM attrib_stream").collect()
        }
    assert got == want


def test_join_condition_band_is_enforced(spark, sf_dir):
    """Every emitted pair must respect the [lower, upper] event-time
    band — the condition that bounds state-store growth."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts", "user_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts", "user_id"
    )
    out = stream_stream_join(
        clicks, purchases, "user_id", upper="30 minutes"
    ).select("ts", "r_ts")
    bad = out.where(
        (F.col("r_ts") < F.col("ts"))
        | (F.col("r_ts") > F.col("ts") + F.expr("INTERVAL 30 minutes"))
    ).count()
    assert bad == 0
