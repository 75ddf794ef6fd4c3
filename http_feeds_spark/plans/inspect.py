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


# --- structural plan-tree walking (robust to rendered-string layout) --------
#
# Plan guards that slice executedPlan().toString() break (or vacuously pass)
# when Spark's textual layout shifts across versions/AQE settings. These
# helpers walk the PHYSICAL TREE instead: node identity comes from
# nodeName(), and AQE wrappers (AdaptiveSparkPlan, *QueryStage) are
# descended into explicitly, so assertions bind to actual operator
# parent/child structure.


def physical_root(df: DataFrame):
    """The root physical-plan JVM node (py4j handle)."""
    return df._jdf.queryExecution().executedPlan()


def plan_children(node) -> list:
    """Structural children of a plan node, descending through AQE
    wrappers: AdaptiveSparkPlan exposes its current sub-plan via
    executedPlan(); materialized query stages via plan()."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return [node.executedPlan()]
    if name.endswith("QueryStage"):
        return [node.plan()]
    if name == "ReusedExchange":
        # a leaf wrapper referencing another stage's exchange — descend
        # into the original so side-shape analysis (scalar aggregate,
        # literal frame) sees through the reuse (r11, plans/lint.py)
        return [node.child()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def subtree_names(node) -> list[str]:
    """nodeName() of every node in the subtree (pre-order)."""
    out = [node.nodeName()]
    for c in plan_children(node):
        out.extend(subtree_names(c))
    return out


def node_line(node, max_fields: int = 120) -> str:
    """One-line rendering of a SINGLE plan node (no children) — for
    asserting on a found node's keys/partitioning without re-entering
    string-slicing over the whole tree."""
    return node.simpleString(max_fields)


def find_nodes(node, predicate) -> list:
    """All subtree nodes whose nodeName() satisfies `predicate`."""
    hits = [node] if predicate(node.nodeName()) else []
    for c in plan_children(node):
        hits.extend(find_nodes(c, predicate))
    return hits


def node_metric(node, name: str) -> int:
    """Value of a node's SQL metric (e.g. "numOutputRows"). Only
    meaningful after the plan EXECUTED — run an action on the SAME
    DataFrame whose physical_root you walk (a derived frame like
    df.count() executes a different queryExecution and leaves this one's
    metrics at zero)."""
    return int(node.metrics().apply(name).value())
