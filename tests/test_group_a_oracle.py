"""Group A feed queries vs the DuckDB oracle (driver-check replica)."""

from __future__ import annotations

import pytest

GROUP_A = [
    "q_feed_scan",  # carries the former q_cloudevents_parse round-trip too
    "q_last_event_id",
    "q_batch_page",
    "q_event_order",
    "q_compaction",
    "q_read_model",
    "q_dedup_id",
    "q_type_route",
    "q_principal_filter",
]


@pytest.mark.parametrize("name", GROUP_A)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_harness import check_query

    report = check_query(spark, name, sf_dir)
    assert report["match"], report


def test_tombstone_oracle_parity(spark, sf_dir):
    """q_tombstone lost its DRIVER oracle slot to q_hyper_rollup (A6 is a
    strict sub-expression of the still-slot-checked A7), but the full
    DuckDB parity check lives on here."""
    from http_feeds_spark.queries import registry
    from http_feeds_spark.queries.feed_queries import TOMBSTONE_ORACLE_SQL
    from tests.oracle_harness import compare

    df = registry()["q_tombstone"].fn(spark, sf_dir)
    report = compare(df, TOMBSTONE_ORACLE_SQL, sf_dir)
    assert report["match"], report
