"""Plan inspection utilities — how we check that Catalyst produced the
plan we want (pushdown, broadcast, partial agg, codegen) before trusting
an operator at scale. Used by tests/test_plans.py and during tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """The physical plan string. With `finalize`, runs the query first so
    AQE's final plan (with whole-stage-codegen `*(n)` markers) is shown —
    `df.write...` would NOT finalize this DataFrame's own queryExecution.
    """
    if finalize:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in executed_plan(df)


def is_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def is_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def shuffle_count(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange hashpartitioning")


def has_partial_aggregation(df: DataFrame) -> bool:
    return executed_plan(df).count("HashAggregate") >= 2


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """Requires execution (AQE finalization)."""
    return "*(1)" in executed_plan(df, finalize=True)
