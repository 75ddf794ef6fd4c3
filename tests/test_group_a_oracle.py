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
    """q_tombstone regained a DRIVER oracle slot in the r14 rotation;
    this pytest-side parity stays as the second, driver-independent
    checker (it predates the slot and costs nothing)."""
    from http_feeds_spark.queries import registry
    from http_feeds_spark.queries.feed_queries import TOMBSTONE_ORACLE_SQL
    from tests.oracle_harness import compare

    df = registry()["q_tombstone"].fn(spark, sf_dir)
    report = compare(df, TOMBSTONE_ORACLE_SQL, sf_dir)
    assert report["match"], report


def test_history_scd2_oracle_parity(spark, sf_dir):
    """A7b (q_history_scd2, driver-oracle-checked since the r14
    rotation): full DuckDB value parity for the SCD-2 validity
    intervals, kept as the driver-independent second checker."""
    from http_feeds_spark.queries import registry
    from http_feeds_spark.queries.feed_queries import HISTORY_SCD2_ORACLE_SQL
    from tests.oracle_harness import compare

    df = registry()["q_history_scd2"].fn(spark, sf_dir)
    report = compare(df, HISTORY_SCD2_ORACLE_SQL, sf_dir)
    assert report["match"], {k: v for k, v in report.items() if k != "first_diffs"}


def test_history_scd2_asof_equals_prefix_read_model(spark, sf_dir):
    """The temporal contract: an as-of-T filter over the SCD-2 history
    must equal the ordinary read model computed over the replay prefix
    time <= T — for a T mid-feed AND for T = feed end (where as-of
    reduces to is_current)."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.queries.feed_queries import _feed

    f = _feed(spark, sf_dir)
    hist = ops.history_scd2(f)

    # mid-feed cutoff: the median event time
    t_mid = f.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(time), 0.5) AS BIGINT)) AS t"
    ).collect()[0].t
    for T in [t_mid, f.agg(F.max("time")).collect()[0][0]]:
        asof = hist.where(
            (F.col("valid_from") <= F.lit(T))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(T)))
        ).select("seq", "id", "subject")
        prefix_rm = ops.read_model(f.where(F.col("time") <= F.lit(T))).select(
            "seq", "id", "subject"
        )
        got = {tuple(r) for r in asof.collect()}
        want = {tuple(r) for r in prefix_rm.collect()}
        assert got == want and len(want) > 0, (T, len(got), len(want))
