"""Group A — the HTTP Feeds spec's own operator surface (SURVEY.md §2.A).

All run over the driver `events` table mapped onto the CloudEvents envelope
(see http_feeds_spark.sources.tables.events_as_feed). Fixed literal cursors /
batch sizes keep results deterministic for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from http_feeds_spark.operators import feed as ops
from http_feeds_spark.queries import register
from http_feeds_spark.sources.tables import (
    EVENTS_AS_FEED_SQL,
    TYPE_PREFIX,
    load_table,
    events_as_feed,
)

CURSOR = 500  # fixed lastEventId position for offset-scan queries
BATCH = 100  # fixed page size for pagination


def _feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_feed(load_table(spark, sf_dir, "events"))


# --- A1: feed scan -----------------------------------------------------------


_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # µs-precision ISO-8601 UTC


@register(
    "q_feed_scan",
    oracle=f"SELECT * FROM ({EVENTS_AS_FEED_SQL})",
    group="A",
)
def q_feed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A14 — full chronological feed scan, round-tripped through the
    CloudEvents wire encoding.

    README.md:8-13 (feed = GET endpoint returning the chronological event
    sequence); envelope fields README.md:306-316. Each envelope row is
    serialized to its on-the-wire JSON object
    (application/cloudevents-batch+json carries an array of these,
    README.md:10-11) with to_json, then parsed back with from_json using
    the engine envelope StructType — so the oracle (the feed itself)
    doubles as a serialize∘parse identity check. Timestamps use an
    explicit µs format so `time` (ISO 8601 UTC, README.md:312)
    round-trips losslessly. (Merged from the former q_cloudevents_parse,
    which shared this oracle verbatim — one driver slot, both semantics.)
    """
    from http_feeds_spark.schema import ENVELOPE

    f = _feed(spark, sf_dir)
    wire = f.select(
        F.to_json(
            F.struct(*[F.col(c) for c in f.columns]), {"timestampFormat": _TS_FMT}
        ).alias("json")
    )
    parsed = wire.select(
        F.from_json("json", ENVELOPE, {"timestampFormat": _TS_FMT}).alias("e")
    )
    return parsed.select("e.*")


# --- A2: offset scan ---------------------------------------------------------


@register(
    "q_last_event_id",
    oracle=f"SELECT * FROM ({EVENTS_AS_FEED_SQL}) WHERE seq > {CURSOR}",
    group="A",
)
def q_last_event_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — events strictly after `lastEventId` (README.md:12,:150-154,:300).

    Range predicate on the monotone seq — position survives compaction of
    the cursor event (README.md:154). Pushed down to the Parquet scan.
    """
    return ops.offset_scan(_feed(spark, sf_dir), CURSOR)


# --- A3: pagination ----------------------------------------------------------


@register(
    "q_batch_page",
    group="A",
    oracle=f"SELECT * FROM ({EVENTS_AS_FEED_SQL}) WHERE seq > {CURSOR} ORDER BY seq LIMIT {BATCH}",
)
def q_batch_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — one bounded batch after the cursor (README.md:11,:79-82).

    Plans as TakeOrderedAndProject: per-partition top-k, k-row driver merge.
    r15 rotation wave 2: cycled back into a driver slot after one
    round in pytest-only parity (tests/test_rotated_oracle.py) — the
    rotation cadence re-earns every oracle a driver-run green row.
    """
    return ops.paginate(_feed(spark, sf_dir), CURSOR, BATCH)


# --- A4: strong ordering / id assignment -------------------------------------


@register(
    "q_event_order",
    oracle=f"""
    SELECT
      id,
      CAST(row_number() OVER (ORDER BY time, id) AS BIGINT) AS minted_seq,
      CAST(split_part(id, '::', 1) AS BIGINT) AS parsed_seq
    FROM ({EVENTS_AS_FEED_SQL})
    """,
    group="A",
)
def q_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — mint a total order and parse composite ids (README.md:148-159).

    ``minted_seq`` = row_number over (time, id) (what an ingest job would
    assign for unordered-UUID feeds); ``parsed_seq`` = numeric prefix of
    the spec's ``sequence::uuid`` composite form (README.md:159). On this
    fixture both equal seq+1 offset/seq — the oracle cross-checks each.
    """
    f = _feed(spark, sf_dir).select("id", "time")
    minted = ops.mint_seq(f).withColumnRenamed("seq", "minted_seq")
    parsed = ops.parse_seq(minted).withColumnRenamed("seq", "parsed_seq")
    return parsed.select("id", "minted_seq", "parsed_seq")


# --- A5: compaction ----------------------------------------------------------

_COMPACT_SQL = f"""
SELECT * EXCLUDE (__rn) FROM (
  SELECT f.*, row_number() OVER (PARTITION BY subject ORDER BY seq DESC) AS __rn
  FROM ({EVENTS_AS_FEED_SQL}) f
) WHERE __rn = 1
"""


@register("q_compaction", oracle=_COMPACT_SQL, group="A")
def q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — log compaction: newest entry per subject (README.md:181-267).

    Single window per key: one hash shuffle on subject, linear in rows —
    the 100 TB-safe shape (never collect_list, never self-join).
    """
    return ops.compact(_feed(spark, sf_dir))


# --- A6: tombstones ----------------------------------------------------------


# Also enforced verbatim in pytest
# (tests/test_group_a_oracle.py::test_tombstone_oracle_parity).
TOMBSTONE_ORACLE_SQL = (
    f"SELECT * FROM ({_COMPACT_SQL}) WHERE coalesce(method, 'PUT') <> 'DELETE'"
)


@register("q_tombstone", oracle=TOMBSTONE_ORACLE_SQL, group="A")
def q_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — drop subjects whose latest entry is a DELETE (README.md:270-292).

    r14 slot rotation: regained a driver slot (from q_batch_page) — the
    spec's deletion semantics had been pytest-only since its slot was
    ceded to q_hyper_rollup in an earlier round."""
    return ops.drop_tombstoned(ops.compact(_feed(spark, sf_dir)))


# --- A7: read model ----------------------------------------------------------


@register(
    "q_read_model",
    oracle=f"""
    SELECT seq, id, type, time, subject,
           CAST(json_extract(data, '$.k') AS BIGINT) AS k
    FROM ({_COMPACT_SQL})
    WHERE coalesce(method, 'PUT') <> 'DELETE'
    """,
    group="A",
)
def q_read_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — aggregate-feed materialization (README.md:168-179). FLAGSHIP.

    Compaction ∘ tombstone-filter ∘ payload projection: the consistent
    latest-state-per-subject snapshot a consumer holds at feed end
    (README.md:177), with the JSON payload projected to typed columns.
    """
    rm = ops.read_model(_feed(spark, sf_dir))
    return rm.select(
        "seq",
        "id",
        "type",
        "time",
        "subject",
        F.get_json_object("data", "$.k").cast("long").alias("k"),
    )


# --- A10: dedup by id --------------------------------------------------------


@register(
    "q_dedup_id",
    oracle=f"SELECT DISTINCT * FROM (SELECT * FROM ({EVENTS_AS_FEED_SQL}) UNION ALL SELECT * FROM ({EVENTS_AS_FEED_SQL}))",
    group="A",
)
def q_dedup_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — idempotent-consumer dedup (README.md:113-114,:309).

    At-least-once delivery is simulated by a redelivered union of the feed
    with itself; dropDuplicates on the unique id restores exactly-once
    effects. Map-side partial dedup runs before the shuffle.
    """
    f = _feed(spark, sf_dir)
    return ops.dedup_by_id(f.unionAll(f))


# --- A11: type routing -------------------------------------------------------


@register(
    "q_type_route",
    oracle=f"""
    SELECT seq, id, subject, time,
           CASE WHEN type = '{TYPE_PREFIX}purchase'
                THEN CAST(json_extract(data, '$.k') AS BIGINT) END AS purchase_k,
           CASE WHEN type = '{TYPE_PREFIX}signup'
                THEN CAST(json_extract(data, '$.k') AS BIGINT) END AS signup_k
    FROM ({EVENTS_AS_FEED_SQL})
    WHERE type IN ('{TYPE_PREFIX}purchase', '{TYPE_PREFIX}signup')
    """,
    group="A",
)
def q_type_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — multi-type feed routing + per-type payload deserialization
    through the payload schema registry (README.md:162-166, :310: `type`
    "may be used to specify and deserialize the payload").

    Schemas are registered per event type (http_feeds_spark.schema);
    parsing is ONE from_json with the merged registry schema, and the
    per-type typed columns are generated from the registry — the plan
    holds a single JsonToStructs regardless of how many types register.
    """
    from pyspark.sql import types as T

    from http_feeds_spark import schema as S

    types = [f"{TYPE_PREFIX}purchase", f"{TYPE_PREFIX}signup"]
    for t in types:
        S.register_payload_schema(t, T.StructType([T.StructField("k", T.LongType())]))
    routed = ops.route_types(_feed(spark, sf_dir), types)
    parsed = S.parse_payloads(routed)
    return parsed.select("seq", "id", "subject", "time", *S.typed_payload_columns(types=types))


# --- A12: per-principal filtering --------------------------------------------


@register(
    "q_principal_filter",
    oracle=f"SELECT * FROM ({EVENTS_AS_FEED_SQL}) WHERE CAST(subject AS BIGINT) % 5 = 0",
    group="A",
)
def q_principal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — server-side filtering by authenticated principal
    (README.md:321-328): a row-level predicate over the feed."""
    f = _feed(spark, sf_dir)
    return ops.principal_filter(f, F.col("subject").cast("long") % 5 == 0)


# --- A1/A8 live: HTTP connector round-trip -----------------------------------


@register(
    "q_http_roundtrip",
    # the spec's worked example has a fully determined outcome: after
    # compaction + the DELETE tombstone only subject 9521234512349 remains
    # (README.md:242-266, :279-292)
    oracle="""
    SELECT CAST(2 AS BIGINT) AS seq,
           '9521234512349' AS subject,
           'org.http-feeds.example.inventory' AS type,
           CAST(0 AS BIGINT) AS quantity
    """,
    group="A",
)
def q_http_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A8 — end-to-end through the HTTP connector: an in-process stub
    server serves the spec's own worked example (3 inventory events,
    README.md:29-65, plus the DELETE tombstone, :279-288) as
    application/cloudevents-batch+json; the engine reads it with the
    `httpfeed` source, mints seq from the composite ids (:159), and
    materializes the read model (:168-179). The result is fully
    determined by the spec — the oracle is its literal value."""
    import sys as _sys

    for p in ["/root/repo", "/root/repo/tests"]:
        if p not in _sys.path:
            _sys.path.insert(0, p)
    from feed_server import FeedState, serve

    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.sources import http_feed

    state = FeedState()
    state.append("org.http-feeds.example.inventory", "9521234567899",
                 {"sku": "9521234567899", "quantity": 5}, time_iso="2021-01-01T00:00:01.000000Z")
    state.append("org.http-feeds.example.inventory", "9521234512349",
                 {"sku": "9521234512349", "quantity": 0}, time_iso="2021-12-01T00:00:15.000000Z")
    state.append("org.http-feeds.example.inventory", "9521234567899",
                 {"sku": "9521234567899", "quantity": 4}, time_iso="2021-01-01T00:00:22.000000Z")
    state.append("org.http-feeds.example.inventory", "9521234567899", None,
                 method="DELETE", time_iso="2021-12-31T00:00:01.000000Z")
    state.compact()

    srv, url = serve(state)
    try:
        http_feed.register(spark)
        wire = spark.read.format("httpfeed").option("url", url).load()
        rm = ops.read_model(ops.parse_seq(wire))
        out = rm.select(
            "seq",
            "subject",
            "type",
            F.get_json_object("data", "$.quantity").cast("long").alias("quantity"),
        )
        # materialize before the server goes away
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        srv.shutdown()


# A14 (CloudEvents parse/serialize) is merged into q_feed_scan above — the
# two queries shared the identical oracle SQL, and the merge frees a driver
# correctness slot for q_range_join (see queries/extended.py).


# --- A7b: temporal (SCD-2) read model ----------------------------------------


HISTORY_SCD2_ORACLE_SQL = f"""
WITH h AS (
  SELECT f.*,
         time AS valid_from,
         lead(time) OVER (PARTITION BY subject ORDER BY seq) AS valid_to
  FROM ({EVENTS_AS_FEED_SQL}) f
)
SELECT seq, id, type, time, subject, valid_from, valid_to,
       (valid_to IS NULL AND coalesce(method, 'PUT') <> 'DELETE') AS is_current
FROM h
WHERE coalesce(method, 'PUT') <> 'DELETE'
"""


@register("q_history_scd2", oracle=HISTORY_SCD2_ORACLE_SQL, group="A")
def q_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7b — temporal read model: the feed's full per-subject history as
    SCD-type-2 validity intervals (operators/feed.history_scd2). Where
    q_read_model keeps each subject's LATEST state (README.md:168-179),
    this keeps EVERY state with [valid_from, valid_to) — an as-of-T
    filter reproduces the read model a consumer that stopped replaying
    at T would hold (pinned in tests/test_group_a_oracle.py, along with
    full DuckDB value parity). One window, the same single shuffle as
    compaction. r14 slot rotation: driver-oracle-checked (slot from
    q_cube, whose grouping-sets family q_rollup still covers)."""
    h = ops.history_scd2(_feed(spark, sf_dir))
    return h.select(
        "seq", "id", "type", "time", "subject", "valid_from", "valid_to", "is_current"
    )
