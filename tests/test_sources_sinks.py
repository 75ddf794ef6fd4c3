"""B19 — source/sink round trips: Parquet, JSON (CloudEvents batches),
CSV. The JSON case is the on-the-wire format: a file of CloudEvents
objects reloads through the engine envelope schema losslessly."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_parquet_roundtrip(spark, sf_dir):
    from http_feeds_spark.sources.tables import events_as_feed, load_table

    feed = events_as_feed(load_table(spark, sf_dir, "events"))
    with tempfile.TemporaryDirectory() as tmp:
        feed.write.mode("overwrite").parquet(f"{tmp}/p")
        back = spark.read.parquet(f"{tmp}/p")
        assert back.count() == feed.count()
        assert sorted(back.columns) == sorted(feed.columns)
        assert back.select(F.sum("seq")).collect() == feed.select(F.sum("seq")).collect()


def test_json_cloudevents_roundtrip(spark, sf_dir):
    from http_feeds_spark.schema import ENVELOPE
    from http_feeds_spark.sources.tables import events_as_feed, load_table

    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    feed = events_as_feed(load_table(spark, sf_dir, "events"))
    with tempfile.TemporaryDirectory() as tmp:
        feed.write.mode("overwrite").option("timestampFormat", fmt).json(f"{tmp}/j")
        back = spark.read.schema(ENVELOPE).option("timestampFormat", fmt).json(f"{tmp}/j")
        assert back.count() == feed.count()
        a = sorted(map(str, feed.collect()))
        b = sorted(map(str, back.collect()))
        assert a == b  # lossless incl. µs timestamps and null data


def test_csv_roundtrip(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.mode("overwrite").option("header", True).csv(f"{tmp}/c")
        back = (
            spark.read.option("header", True)
            .schema("event_id long, user_id long, event_type string, value double")
            .csv(f"{tmp}/c")
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))
