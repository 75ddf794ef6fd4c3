from http_feeds_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    formatted_plan,
    has_partial_aggregation,
    has_pushed_filters,
    is_broadcast_join,
    is_take_ordered,
    shuffle_count,
    uses_whole_stage_codegen,
)
from http_feeds_spark.plans.inspect import (  # noqa: F401
    find_nodes,
    node_line,
    node_metric,
    physical_root,
    plan_children,
    subtree_names,
)
from http_feeds_spark.plans.lint import assert_clean, lint  # noqa: F401
