"""Extended relational coverage: pivot, cube, scalar subqueries, as-of
join — the OLAP shapes users reach for beyond SURVEY §2's core list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from http_feeds_spark.queries import register
from http_feeds_spark.sources.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
    group="B",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — pivot (wide counts per event_type). Explicit value list ⇒
    single pass, no extra distinct-values job — required at scale."""
    ev = load_table(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    # pivot yields NULL for absent combinations; normalize to 0 like the
    # oracle's FILTER counts
    return piv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


@register(
    "q_cube",
    group="B",
    oracle="""
    SELECT coalesce(l_returnflag, '__ALL__') AS returnflag,
           coalesce(l_linestatus, '__ALL__') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — cube (all grouping-set combinations) in one Expand pass.
    r15 rotation wave 2: cycled back into a driver slot (q_rollup
    rotated out in turn — the Expand family's slot alternates, so every
    oracle string periodically re-earns a driver-run green row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("__ALL__")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("__ALL__")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
    group="B",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — scalar subquery through the SQL front end (Catalyst plans
    the subquery as a broadcast scalar, one extra stage)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@register(
    "q_agg_quantile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(quantile_cont(l_quantity, 0.99), 6) AS p99_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    group="B",
)
def q_agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — exact interpolated quantiles per group (Spark `percentile`
    ≡ DuckDB `quantile_cont`). At 100 TB the approx sketch
    (percentile_approx, one-pass mergeable) replaces this; exact is the
    correctness baseline. Rounded to absorb interpolation-formula ULPs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.expr("percentile(l_quantity, 0.99)"), 6).alias("p99_qty"),
    )


def ngram_sim_pairs(docs, tokens=None, *, k=64, bands=32, rows=2, threshold=0.3):
    """Verified 2-gram Jaccard pairs ≥ `threshold` — the ngram-sim
    pipeline body, shared-stage form (see llm.tokenized / llm._shingled).

    The PUBLIC default keeps the sharper k=64 / 32×2 banding:
    P[candidate | s=0.3] = 1-(1-0.09)^32 ≈ 0.95 at the verify threshold.
    Callers that accept ~0.90 candidate recall at s=0.3 (still 0.985 by
    s=0.4) can pass k=48/bands=24 for ~33% less wall time — the measured
    trade the benchmark query opts into (ADVICE r5: the weaker banding
    is an explicit opt-in, never the library default)."""
    from http_feeds_spark.functions import minhash as mh
    from http_feeds_spark.queries.llm import _shingled

    sh = _shingled(docs, 2, tokens)
    return mh.verified_jaccard_pairs(
        sh, k=k, bands=bands, rows=rows, threshold=threshold, materialize=True
    )


def _ngram_sim_pairs(docs, tokens=None):
    """The benchmark-profile invocation: k=48 / 24×2, evaluated vs
    k=64 / 32×2 (round 5, sf0.1): identical verified pair set (256 =
    256 pairs) at 7.47s → 4.98s (−33%). Recall contract: candidate
    recall ≈ 0.90 at s=0.3 (vs 0.95), rising steeply past the verify
    threshold (s=0.4 → 0.985) — the planted-recall guard at
    jaccard≈0.42 pins it. Generic callers should use
    :func:`ngram_sim_pairs` and its sharper default."""
    return ngram_sim_pairs(docs, tokens, k=48, bands=24)


@register("q_llm_ngram_sim", oracle=None, group="D")
def q_llm_ngram_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2d — n-gram Jaccard document similarity: 2-gram shingle sets
    (tuple-hashed to longs — see q_llm_dedup_near), MinHash-LSH
    candidates with k=48 / 24×2 banding, exact Jaccard verify ≥ 0.3.
    The lower n and threshold make this the 'similar documents' variant
    of the near-dup pipeline (same scalable shape); planted-recall guard
    in tests/test_extended.py. Rows-only check."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _ngram_sim_pairs(docs)


@register(
    "q_range_join",
    # the ORACLE runs the naive BETWEEN join DuckDB plans natively; Spark
    # runs the bucketized equi-join — equivalence is exactly the claim
    oracle="""
    SELECT p.purchase_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (SELECT event_id AS purchase_id,
                 epoch_us(ts) AS ws,
                 epoch_us(ts) + 3600000000 AS we
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, epoch_us(ts) AS t, value FROM events) e
      ON e.t BETWEEN p.ws AND p.we
    GROUP BY p.purchase_id
    """,
    group="B",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — range-containment join via bucketized intervals
    (operators/range_join.py): every purchase opens a 1-hour attribution
    window; count the events falling inside each window. The raw
    BETWEEN-predicate formulation would plan as a nested-loop join —
    the bucketized form is a hash equi-join plus replication bounded by
    span/width. The DuckDB oracle is that naive BETWEEN join, so the
    driver check asserts exact pair-set equivalence of the two plans."""
    from http_feeds_spark.operators.range_join import range_join

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("event_id", F.unix_micros("ts").alias("t"), "value")
    hour_us = 3_600_000_000
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("ws"),
        (F.unix_micros("ts") + hour_us).alias("we"),
    )
    joined = range_join(pts, windows, "t", "ws", "we", bucket_width=hour_us)
    return joined.groupBy("purchase_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@register(
    "q_hyper_rollup",
    # the ORACLE aggregates the RAW events straight to daily; Spark goes
    # events → hourly partials → daily merge — exactness of the mergeable-
    # partial design is the claim the driver check now enforces
    oracle="""
    SELECT date_trunc('day', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    group="C",
)
def q_hyper_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-ext — hypertable-style continuous aggregate (operators/
    rollup.py): hourly mergeable partials (count/sum/min/max, DECIMAL
    sums) re-aggregated to daily — the coarse answer comes from rollup
    rows, never re-scanning raw events, and is EXACT because every
    stored aggregate is mergeable (avg derived at the end). The DuckDB
    oracle aggregates the raw events directly to daily, so the driver
    check asserts daily-from-rollup ≡ daily-from-raw bit-exactly; the
    date-partitioned materialization path is asserted in tests."""
    from http_feeds_spark.operators import rollup as ru

    ev = load_table(spark, sf_dir, "events")
    hourly = ru.rollup_aggregate(ev, "1 hour")
    return ru.reaggregate(hourly, "1 day")


@register(
    "q_asof_join",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
             OVER w AS last_purchase_ts,
           last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
             OVER w AS last_purchase_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    group="B",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — as-of join (Spark has no native one): for every event, the
    user's most recent purchase at-or-before it. Expressed as a running
    last-non-null window — ONE shuffle on the key and a linear pass,
    instead of the naive per-row subquery. The same plan shape serves
    point-in-time feature lookup in training pipelines; for as-of against
    a second table, union the tagged streams first (same window after).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    purchase_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
        F.last(purchase_id, ignorenulls=True).over(w).alias("last_purchase_event"),
    )


# --- storage layout: Z-order data skipping -----------------------------------


@register("q_zorder_layout", oracle=None, group="B")
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout operator (operators/layout.py): lay the events
    table out along the Morton curve of (user_id, event_id) — built
    once under the session warehouse dir — and report the per-file
    min/max skipping rectangles as overlap counts for a narrow
    predicate on EACH curve dimension. The numbers ARE the data-skipping
    property (a stats-based reader prunes the non-overlapping files);
    the locality contrast vs a time-sorted control layout and read-back
    exactness are pinned in tests/test_layout.py. Rows-only (file
    rectangles are engine/layout-specific by nature)."""
    import os

    from http_feeds_spark.operators import layout as ly
    from http_feeds_spark.stores import parquet_exists

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    zpath = f"{wh}/zorder/{os.path.basename(sf_dir.rstrip('/'))}"
    if not parquet_exists(spark, zpath):
        ly.write_zordered(ev, zpath, ["user_id", "event_id"], n_files=16, bits=6)
    stats = ly.file_stats(spark, zpath, ["user_id", "event_id"]).collect()
    max_e = ev.agg(F.max("event_id")).collect()[0][0]
    n = len(stats)
    u_hit = sum(1 for r in stats if r.max_user_id >= 10 and r.min_user_id <= 40)
    e_hit = sum(
        1 for r in stats if r.max_event_id >= 0 and r.min_event_id <= max_e // 8
    )
    return spark.createDataFrame(
        [(n, u_hit, e_hit)],
        "n_files int, files_overlapping_user_slice int, files_overlapping_event_slice int",
    )
