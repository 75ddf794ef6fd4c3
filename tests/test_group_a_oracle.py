"""Group A feed queries vs the DuckDB oracle (driver-check replica)."""

from __future__ import annotations

import pytest

GROUP_A = [
    "q_feed_scan",
    "q_last_event_id",
    "q_batch_page",
    "q_event_order",
    "q_compaction",
    "q_tombstone",
    "q_read_model",
    "q_dedup_id",
    "q_type_route",
    "q_principal_filter",
    "q_cloudevents_parse",
]


@pytest.mark.parametrize("name", GROUP_A)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_harness import check_query

    report = check_query(spark, name, sf_dir)
    assert report["match"], report
