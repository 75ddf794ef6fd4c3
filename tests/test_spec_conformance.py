"""Spec-conformance unit tests over the golden fixture (SURVEY.md §5.2).

The fixture is the spec's own worked example — the 3-event inventory feed
(/root/reference/README.md:29-65), its post-compaction 2-event form
(:242-266), and the DELETE tombstone for subject 9521234567899 (:279-288).
Each test encodes a normative MUST/SHOULD sentence; goldens are taken
verbatim from the spec.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SPEC_ROWS = [
    # (seq, id, time, subject, method, data) — FIXTURES.md §1
    (1, "1c6b8c6e-d8d0-4a91-b51c-1f56bd04c758", "2021-01-01T00:00:01", "9521234567899", "PUT",
     '{"sku":"9521234567899","updated":"2022-01-01T00:00:01Z","quantity":5}'),
    (2, "292042fb-ab04-4653-af90-19a24032bffe", "2021-12-01T00:00:15", "9521234512349", "PUT",
     '{"sku":"9521234512349","updated":"2022-01-01T00:00:12Z","quantity":0}'),
    (3, "fa3e2a22-398c-4d02-ad08-9415e43178e6", "2021-01-01T00:00:22", "9521234567899", "PUT",
     '{"sku":"9521234567899","updated":"2022-01-01T00:00:21Z","quantity":4}'),
]
TOMBSTONE = (4, "06b13630-e4c3-4d85-a669-ce66fc4daa75", "2021-12-31T00:00:01", "9521234567899", "DELETE", None)


@pytest.fixture(scope="module")
def golden_feed(spark):
    from datetime import datetime

    from http_feeds_spark.schema import ENVELOPE

    rows = [
        (seq, "1.0", id_, "org.http-feeds.example.inventory",
         "https://example.http-feeds.org/inventory",
         datetime.fromisoformat(ts), subj, method, "application/json", data)
        for (seq, id_, ts, subj, method, data) in SPEC_ROWS + [TOMBSTONE]
    ]
    return spark.createDataFrame(rows, schema=ENVELOPE)


def test_compaction_keeps_2_and_3(spark, golden_feed):
    """README.md:236-266: after the third event, compaction removes the
    first entry for subject 9521234567899; the feed contains seq {2,3}."""
    from http_feeds_spark.operators import feed as ops

    before_tombstone = golden_feed.filter(F.col("seq") <= 3)
    kept = sorted(r.seq for r in ops.compact(before_tombstone).collect())
    assert kept == [2, 3]


def test_read_model_after_delete(spark, golden_feed):
    """README.md:279-292: after the DELETE entry, clients must remove the
    aggregate; the read model contains only subject 9521234512349."""
    from http_feeds_spark.operators import feed as ops

    rm = ops.read_model(golden_feed).collect()
    assert [r.subject for r in rm] == ["9521234512349"]
    assert rm[0].seq == 2


def test_offset_scan_after_compacted_cursor(spark, golden_feed):
    """README.md:150-154: the server must respect the original position
    even if the lastEventId event has been deleted."""
    from http_feeds_spark.operators import feed as ops

    compacted = ops.compact(golden_feed)  # seq 1 and 3 removed (4 newest for subject)
    assert sorted(r.seq for r in compacted.collect()) == [2, 4]
    # cursor at seq 3 (now deleted): strictly-newer events only
    after = [r.seq for r in ops.offset_scan(compacted, 3).collect()]
    assert after == [4]


def test_empty_batch_signals_feed_end(spark, golden_feed):
    """README.md:79-82: an empty array means the end of the feed."""
    from http_feeds_spark.operators import feed as ops

    assert ops.paginate(golden_feed, 4, 100).count() == 0


def test_default_method_is_put(spark, golden_feed):
    """README.md:314: method defaults to PUT when omitted."""
    from http_feeds_spark.operators import feed as ops

    no_method = golden_feed.withColumn(
        "method", F.when(F.col("method") == "DELETE", None).otherwise(F.col("method"))
    )
    # with the DELETE nulled out, nothing is tombstoned
    rm = ops.read_model(no_method)
    assert sorted(r.subject for r in rm.collect()) == ["9521234512349", "9521234567899"]


def test_uuid6_ids_carry_the_order(spark):
    """README.md:156: time-ordered UUIDv6 is a sanctioned id encoding;
    its 60-bit timestamp must parse into a seq that orders events by time
    and supports position-stable offset scans (README.md:148-154)."""
    import uuid as uuid_mod

    from http_feeds_spark.operators import feed as ops

    def uuid6(ts_100ns: int, node: int) -> str:
        # assemble per the UUIDv6 layout: time_high(32) ‖ time_mid(16)
        # ‖ version=6 ‖ time_low(12) ‖ variant+clock_seq ‖ node
        time_high = (ts_100ns >> 28) & 0xFFFFFFFF
        time_mid = (ts_100ns >> 12) & 0xFFFF
        time_low = ts_100ns & 0xFFF
        fields = (time_high, time_mid, 0x6000 | time_low, 0x80, 0x00, node)
        return str(uuid_mod.UUID(fields=fields))

    base = 0x1EC9414C232AB00  # an arbitrary Gregorian 100-ns timestamp
    rows = [(uuid6(base + i, 0x91560955E826), i) for i in range(5)]
    df = spark.createDataFrame(rows, "id string, expected_order int")

    parsed = ops.parse_seq_uuid6(df)
    got = [r.expected_order for r in parsed.orderBy("seq").collect()]
    assert got == [0, 1, 2, 3, 4]
    seqs = {r.expected_order: r.seq for r in parsed.collect()}
    assert seqs[0] == base and seqs[4] == base + 4

    # offset scan over UUIDv6: strictly-newer events only (README.md:12)
    after = ops.offset_scan(parsed, seqs[2]).select("expected_order").collect()
    assert sorted(r.expected_order for r in after) == [3, 4]

    # auto-dispatch: composite prefix, UUIDv6 timestamp, opaque → null
    mixed = spark.createDataFrame(
        [("0000001000001::5f8de8ff-30d8-4fab-8f5a-c32f326d6f26",),
         (rows[0][0],),
         ("not-an-ordered-id",)],
        "id string",
    )
    auto = {r.id: r.seq for r in ops.parse_seq_auto(mixed).collect()}
    assert auto["0000001000001::5f8de8ff-30d8-4fab-8f5a-c32f326d6f26"] == 1000001
    assert auto[rows[0][0]] == base
    assert auto["not-an-ordered-id"] is None


def test_at_least_once_idempotency(spark, golden_feed):
    """README.md:113-114: consumers must process idempotently; dedup by id
    restores exactly-once effects after redelivery."""
    from http_feeds_spark.operators import feed as ops

    redelivered = golden_feed.unionAll(golden_feed.filter(F.col("seq") >= 3))
    assert ops.dedup_by_id(redelivered).count() == golden_feed.count()


def test_aggregate_feed_contains_every_aggregate(spark, golden_feed):
    """README.md:173: an aggregate feed must contain every aggregate at
    least once — so the read model (pre-tombstone) covers all subjects."""
    from http_feeds_spark.operators import feed as ops

    pre = golden_feed.filter(F.col("seq") <= 3)
    subjects_in_feed = {r.subject for r in pre.select("subject").distinct().collect()}
    subjects_in_model = {r.subject for r in ops.read_model(pre).collect()}
    assert subjects_in_model == subjects_in_feed
