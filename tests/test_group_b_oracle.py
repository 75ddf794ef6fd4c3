"""Group B relational queries vs the DuckDB oracle (driver-check replica)."""

from __future__ import annotations

import pytest

GROUP_B = [
    "q_project",
    "q_filter",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_agg_group",
    "q_agg_distinct",
    "q_agg_approx",
    "q_rollup",
    "q_window_rank",
    "q_window_frame",
    "q_topk",
    "q_union",
    "q_intersect",
    "q_except",
    "q_fn_string",
    "q_fn_date",
    "q_fn_math",
    "q_fn_json",
    "q_udf",
]


@pytest.mark.parametrize("name", GROUP_B)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_harness import check_query

    report = check_query(spark, name, sf_dir)
    assert report["match"], report


def test_approx_distinct_accuracy(spark, sf_dir):
    """q_agg_approx has no oracle (HLL is engine-specific); assert the
    sketch is within 5% of the exact count instead."""
    from http_feeds_spark.queries import registry

    approx = {r["o_orderpriority"]: r["approx_customers"] for r in registry()["q_agg_approx"].fn(spark, sf_dir).collect()}
    exact = {r["o_orderpriority"]: r["n_customers"] for r in registry()["q_agg_distinct"].fn(spark, sf_dir).collect()}
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(2, 0.05 * e), (k, approx[k], e)


def test_udf_zscore_values(spark, sf_dir):
    """q_udf rows-only: spot-check the z-score math against a SQL window."""
    from pyspark.sql import functions as F

    from http_feeds_spark.queries import registry
    from http_feeds_spark.sources.tables import load_table

    got = registry()["q_udf"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    want = ev.select(
        "event_id",
        ((F.col("value") - F.avg("value").over(w)) / F.stddev_pop("value").over(w)).alias("z"),
    )
    j = got.join(want, "event_id")
    bad = j.filter(F.abs(F.col("value_z") - F.col("z")) > 1e-9).count()
    assert bad == 0
