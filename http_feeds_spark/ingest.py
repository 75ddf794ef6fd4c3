"""Orchestrated ingest — the one-call composition of the engine's pieces:

    HTTP feed connector  →  Parquet landing zone  →  compaction  →  read model

Each piece exists standalone (sources/http_feed.py, operators/maintenance.py,
operators/feed.py); this module wires them into the pipeline a consumer
actually deploys, with ONE checkpoint story:

- The streaming checkpoint lives under ``<landing_root>/_checkpoint`` and
  holds the feed cursor (the spec's "client must persist the lastEventId",
  /root/reference/README.md:111). Every run — bounded catch-up or live —
  resumes from it; a mid-stream restart replays at-least-once
  (README.md:113) and the parquet sink's commit log makes landing-zone
  files exactly-once.
- Catch-up uses ``Trigger.AvailableNow``: drain everything the feed holds,
  then stop — the batch-backfill-through-the-streaming-path pattern, so a
  later live run continues from where the backfill ended with no seam.
- ``seq`` is minted at ingest from the wire id (``parse_seq_auto``:
  composite ``sequence::uuid`` prefix or UUIDv6 timestamp — the spec's two
  sanctioned encodings, README.md:156-159); opaque ids leave seq null and
  callers fall back to ``operators.feed.mint_seq`` at compaction time.

100 TB posture: the connector is a serial cursor walk by protocol design
(see sources/http_feed.py) — the landing zone is where scale-out begins.
Bootstrap of a NEW consumer therefore reads the landing zone (distributed
parquet scan), never re-walks HTTP; compaction is the periodic maintenance
rewrite (window per subject, one shuffle) that keeps bootstrap cost
proportional to live subjects, not feed history (README.md:184).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from http_feeds_spark.operators import feed as ops
from http_feeds_spark.operators import maintenance
from http_feeds_spark.sources import http_feed

RAW_DIR = "raw"
CHECKPOINT_DIR = "_checkpoint"
COMPACTED_DIR = "compacted"


def _paths(landing_root: str) -> tuple[str, str, str]:
    root = landing_root.rstrip("/")
    return (
        f"{root}/{RAW_DIR}",
        f"{root}/{CHECKPOINT_DIR}",
        f"{root}/{COMPACTED_DIR}",
    )


def run(
    spark: SparkSession,
    url: str,
    landing_root: str,
    *,
    timeout_ms: int | None = None,
    catch_up: bool = True,
    compact: bool = False,
    await_s: float = 120.0,
):
    """Ingest the feed at `url` into `landing_root`.

    catch_up=True (default): AvailableNow — drain the feed to its current
    end, stop, optionally compact; returns a summary dict. Safe to call
    repeatedly: the shared checkpoint resumes the cursor each time.

    catch_up=False: start a continuous live subscription (long-polling
    when `timeout_ms` is set) and return the running StreamingQuery —
    the caller owns stop(); a later catch_up run reuses the same
    checkpoint seamlessly.
    """
    raw, ckpt, _ = _paths(landing_root)
    http_feed.register(spark)
    reader = spark.readStream.format("httpfeed").option("url", url)
    if timeout_ms is not None:
        reader = reader.option("timeout", str(timeout_ms))
    stream = ops.parse_seq_auto(reader.load())
    writer = (
        stream.writeStream.format("parquet")
        .option("path", raw)
        .option("checkpointLocation", ckpt)
    )
    if not catch_up:
        return writer.trigger(processingTime="500 milliseconds").start()

    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(await_s):
        q.stop()
        raise TimeoutError(f"catch-up did not drain the feed within {await_s}s")
    summary = {"landing_root": landing_root, "raw_rows": spark.read.parquet(raw).count()}
    if compact:
        summary["compacted_rows"] = compact_now(spark, landing_root).count()
    return summary


def compact_now(spark: SparkSession, landing_root: str) -> DataFrame:
    """Run the maintenance compaction rewrite over the landing zone:
    latest entry per subject, tombstoned subjects dropped, seq positions
    preserved verbatim (README.md:150-154) so consumer cursors stay
    valid. Rows with null seq (opaque wire ids) get one minted from
    (time, id) first — the deterministic distributed rank."""
    raw, _, compacted = _paths(landing_root)
    from pyspark.sql import functions as F

    feed = spark.read.parquet(raw)
    if feed.filter(F.col("seq").isNull()).limit(1).count() > 0:
        feed = ops.mint_seq(feed.drop("seq"))
    compacted_df = ops.read_model(feed)
    (
        compacted_df.repartitionByRange(
            max(1, compacted_df.rdd.getNumPartitions()), "seq"
        )
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(compacted)
    )
    return spark.read.parquet(compacted)


def read_model(spark: SparkSession, landing_root: str) -> DataFrame:
    """The consumer-facing read model (latest live state per subject,
    README.md:168-179) from the landing zone — served from the compacted
    rewrite when one exists (cheap scan), else derived from raw. The
    existence probe goes through Spark's reader (schema only) so it
    works on any Hadoop filesystem, not just local paths."""
    raw, _, compacted = _paths(landing_root)
    try:
        compacted_df = spark.read.parquet(compacted)
        compacted_df.schema
    except Exception:
        return ops.read_model(spark.read.parquet(raw))
    # compacted is already latest-per-subject with tombstones dropped;
    # re-applying read_model is an idempotent no-op kept for safety
    return ops.read_model(compacted_df)
