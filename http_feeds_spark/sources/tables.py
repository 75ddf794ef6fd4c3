"""Batch sources: the driver's Parquet tables and the events→feed mapping.

Feed-semantics mapping over the driver `events` table (FIXTURES.md §2):
``event_id``→seq, ``cast(user_id as string)``→subject, ``event_type``→type,
``ts``→time, ``props``→data. ``method`` is derived deterministically —
``event_type = 'error'`` plays the role of a DELETE tombstone
(README.md:270-292) so tombstone semantics are exercisable on synthetic
data; everything else is a PUT (the spec default, README.md:314).

The composite id follows the spec's sanctioned ``sequence::uuid`` encoding
(README.md:159): a zero-padded numeric prefix that carries the total order,
``::``, then an opaque unique suffix (md5 of the seq here — deterministic
for oracle comparison; production would mint a UUID).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE_URI = "https://example.http-feeds.org/feed"
TYPE_PREFIX = "org.http-feeds.example."


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver Parquet table. Column pruning + predicate pushdown
    reach the scan because this is a plain file source (check with
    ``.explain``: PushedFilters / ReadSchema).

    ``events.ts`` has shifted physical type across driver testdata
    generations — TIMESTAMP(NANOS) (arrives as BIGINT under
    ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS)
    without the UTC-adjusted flag (arrives as TIMESTAMP_NTZ under Spark
    4's NTZ inference). Both are normalized HERE to session-TZ
    TimestampType holding the same wall-clock value DuckDB produces, so
    downstream code (and the JSON round-trip in q_feed_scan, whose
    ``timestampFormat`` option does not apply to NTZ columns) sees one
    stable type regardless of testdata vintage.

    The two SQL confs are (re)applied at call time because the driver
    invokes queries with ITS OWN SparkSession — a vanilla session would
    otherwise fail outright on a nanos column (verified), and a
    non-UTC session would shift rendered timestamps vs the oracle. Both
    are runtime-settable; setting them is idempotent.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer DIV: double division would lose precision at ns scale
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif field.name == "ts" and field.dataType.simpleString() == "timestamp_ntz":
            # same wall-clock instant under the UTC session TZ set above
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_as_feed(events: DataFrame) -> DataFrame:
    """Map the driver `events` table onto the CloudEvents envelope.

    Deterministic (no UUIDs, no current-time) so the DuckDB oracle can
    reproduce every column. Returns the full ENVELOPE column set.
    """
    return events.select(
        F.col("event_id").alias("seq"),
        F.lit("1.0").alias("specversion"),
        F.concat_ws(
            "::", F.lpad(F.col("event_id").cast("string"), 13, "0"), F.md5(F.col("event_id").cast("string"))
        ).alias("id"),
        F.concat(F.lit(TYPE_PREFIX), F.col("event_type")).alias("type"),
        F.lit(SOURCE_URI).alias("source"),
        F.col("ts").alias("time"),
        F.col("user_id").cast("string").alias("subject"),
        F.when(F.col("event_type") == "error", F.lit("DELETE")).otherwise(F.lit("PUT")).alias("method"),
        F.lit("application/json").alias("datacontenttype"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("props"))
        .alias("data"),
    )


# The oracle-side rendering of events_as_feed, kept adjacent so the two
# stay in lockstep. DuckDB SQL over the pre-registered `events` view.
EVENTS_AS_FEED_SQL = f"""
SELECT
  event_id AS seq,
  '1.0' AS specversion,
  lpad(CAST(event_id AS VARCHAR), 13, '0') || '::' || md5(CAST(event_id AS VARCHAR)) AS id,
  '{TYPE_PREFIX}' || event_type AS type,
  '{SOURCE_URI}' AS source,
  ts AS time,
  CAST(user_id AS VARCHAR) AS subject,
  CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END AS method,
  'application/json' AS datacontenttype,
  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS data
FROM events
"""
