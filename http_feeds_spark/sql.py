"""SQL surface — register the engine's tables and derived feed views so
everything the DataFrame API serves is equally reachable from
``spark.sql`` (SURVEY §2's B-group is ANSI-expressible by construction;
this makes the A-group feed semantics first-class SQL objects too).

Views (TEMP, session-scoped — no catalog pollution):

    region nation customer supplier part orders lineitem events
    documents embeddings          — the driver tables, via load_table
                                    (ts normalization included)
    feed                          — events as the CloudEvents envelope
    feed_compacted                — latest entry per subject (A5)
    read_model                    — compaction minus tombstones (A7)
    feed_history                  — SCD-2 validity intervals (A7b);
                                    as-of-T = WHERE valid_from <= T
                                    AND (valid_to IS NULL OR valid_to > T)

Views are lazy plans, not materializations: a SQL query against
``read_model`` compiles to exactly the operator pipeline's plan
(same window, same pushdowns) — pinned in tests/test_sql_surface.py by
plan-for-plan result equality with the operator API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from http_feeds_spark.operators import feed as ops
from http_feeds_spark.schema import TABLE_NAMES
from http_feeds_spark.sources.tables import events_as_feed, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create/replace the session views; returns the registered names."""
    names = []
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    f = events_as_feed(load_table(spark, sf_dir, "events"))
    f.createOrReplaceTempView("feed")
    ops.compact(f).createOrReplaceTempView("feed_compacted")
    ops.read_model(f).createOrReplaceTempView("read_model")
    ops.history_scd2(f).createOrReplaceTempView("feed_history")
    names += ["feed", "feed_compacted", "read_model", "feed_history"]
    return names
