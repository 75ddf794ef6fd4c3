"""Schemas: the CloudEvents feed envelope and driver-table catalog.

The envelope is the normative CloudEvents field table of the HTTP Feeds
spec (/root/reference/README.md:306-316): fixed envelope, dynamic payload.
``data`` stays a JSON *string* at ingest (the spec's payload is schemaless,
per-`type` schemas, README.md:310,316,318); downstream projections apply
``from_json`` per event type.

``seq`` is engine-minted: the spec requires ids to be "strongly ordered"
and position-stable under deletion (README.md:148-159), sanctioning either
time-ordered UUIDv6 or a composite ``sequence::uuid`` id whose numeric
prefix carries the order (README.md:159). We materialize that order as an
explicit BIGINT so offset scans are a pushdown-friendly range predicate.
"""

from __future__ import annotations

from pyspark.sql import types as T

# CloudEvents envelope (README.md:306-316) + engine-minted `seq`.
ENVELOPE = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),           # engine: total order
        T.StructField("specversion", T.StringType(), False), # "1.0"           (:308)
        T.StructField("id", T.StringType(), False),          # cursor identity (:309)
        T.StructField("type", T.StringType(), False),        # event type      (:310)
        T.StructField("source", T.StringType(), False),      # producer URI    (:311)
        T.StructField("time", T.TimestampType(), False),     # append time     (:312)
        T.StructField("subject", T.StringType(), True),      # aggregate key   (:313)
        T.StructField("method", T.StringType(), True),       # PUT | DELETE    (:314)
        T.StructField("datacontenttype", T.StringType(), True),  #             (:315)
        T.StructField("data", T.StringType(), True),         # JSON payload    (:316)
    ]
)

# Envelope WITHOUT seq — the on-the-wire shape (what an HTTP batch carries).
WIRE_ENVELOPE = T.StructType([f for f in ENVELOPE.fields if f.name != "seq"])

# Driver synthetic tables (FIXTURES.md §2). Parquet is self-describing; this
# catalog exists for validation and for readStream (which requires schemas).
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)
