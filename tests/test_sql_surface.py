"""SQL surface (http_feeds_spark/sql.py): every view answers spark.sql
exactly like the operator API, and the views are lazy plans (pushdown
reaches the scan through them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark import plans
from http_feeds_spark import sql as esql


def test_views_equal_operator_api(spark, sf_dir):
    names = esql.register_views(spark, sf_dir)
    assert "read_model" in names and "feed_history" in names

    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.sources.tables import events_as_feed, load_table

    f = events_as_feed(load_table(spark, sf_dir, "events"))

    got_rm = {
        (r.seq, r.subject)
        for r in spark.sql("SELECT seq, subject FROM read_model").collect()
    }
    want_rm = {
        (r.seq, r.subject) for r in ops.read_model(f).select("seq", "subject").collect()
    }
    assert got_rm == want_rm and len(got_rm) > 0

    # the SQL user's as-of query over the history view ≡ the read model
    # of the replay prefix — the A7b contract, through SQL
    t_mid = spark.sql(
        "SELECT timestamp_micros(CAST(percentile(unix_micros(time), 0.5) AS BIGINT)) t FROM feed"
    ).collect()[0].t
    got_asof = {
        (r.seq, r.subject)
        for r in spark.sql(
            f"""SELECT seq, subject FROM feed_history
                WHERE valid_from <= TIMESTAMP '{t_mid}'
                  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{t_mid}')"""
        ).collect()
    }
    want_asof = {
        (r.seq, r.subject)
        for r in ops.read_model(f.where(F.col("time") <= F.lit(t_mid)))
        .select("seq", "subject")
        .collect()
    }
    assert got_asof == want_asof and len(got_asof) > 0


def test_views_are_lazy_and_push_down(spark, sf_dir):
    """A filter through the `feed` view must reach the parquet scan —
    the view is a plan, not a materialization."""
    esql.register_views(spark, sf_dir)
    df = spark.sql("SELECT seq, subject FROM feed WHERE seq > 500")
    assert plans.has_pushed_filters(df), plans.executed_plan(df)
    assert df.count() > 0
