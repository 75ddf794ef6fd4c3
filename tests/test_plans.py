"""Physical-plan guards: the properties that keep these queries fast at
100 TB must be visible in the executed plan — filters pushed to the scan,
small dims broadcast, top-k as TakeOrderedAndProject, partial aggregation
before the shuffle. A regression here is a scale bug even when results
stay correct."""

from __future__ import annotations

import pytest


def plan_of(spark, name, sf_dir):
    from http_feeds_spark.queries import registry

    df = registry()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown(spark, sf_dir):
    p = plan_of(spark, "q_filter", sf_dir)
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(l_shipdate" in p or "IsNotNull(l_shipdate)" in p


def test_projection_prunes_scan(spark, sf_dir):
    p = plan_of(spark, "q_project", sf_dir)
    assert "ReadSchema" in p
    # only the referenced columns reach the scan
    assert "l_extendedprice" in p and "l_tax" not in p


def test_broadcast_join(spark, sf_dir):
    p = plan_of(spark, "q_join_broadcast", sf_dir)
    assert "BroadcastHashJoin" in p


def test_topk_is_take_ordered(spark, sf_dir):
    p = plan_of(spark, "q_topk", sf_dir)
    assert "TakeOrderedAndProject" in p


def test_agg_has_partial_phase(spark, sf_dir):
    p = plan_of(spark, "q_agg_group", sf_dir)
    # partial + final hash aggregate = map-side combine before the shuffle
    assert p.count("HashAggregate") >= 2


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, "q_join_semi", sf_dir)
    assert "LeftAnti" in plan_of(spark, "q_join_anti", sf_dir)


def test_compaction_single_shuffle(spark, sf_dir):
    """The latest-per-subject window must shuffle exactly once (on the
    key) — no extra exchanges."""
    p = plan_of(spark, "q_compaction", sf_dir)
    assert p.count("Exchange hashpartitioning") == 1


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    from http_feeds_spark.queries import registry

    df = registry()["q_agg_group"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes THIS dataframe's plan on execution
    p = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in p, p[:800]
