"""Group B — relational core on the driver star schema (SURVEY.md §2.B).

These are the engine substrate the feed operators are built from (window,
anti-join, aggregation shapes) plus the bench workload. All pure built-in
DataFrame ops — JVM-side, whole-stage-codegen'd, no Python on the hot path.

Oracle-exactness rules (FIXTURES.md notes):
- double aggregations are computed over DECIMAL casts (exact,
  order-independent) and cast back to DOUBLE at the end — bit-identical in
  Spark and DuckDB regardless of summation order;
- averages are exact-decimal-sum / count in double arithmetic;
- top-k always tie-breaks on a unique key.

Scale posture per query is noted in the docstring (what the plan does at
100 TB: which side broadcasts, what shuffles, what pushes down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from http_feeds_spark.queries import register
from http_feeds_spark.sources.tables import load_table


def _dsum(col, alias: str, scale: str = "decimal(18,2)"):
    """Exact, order-independent sum of a double column via DECIMAL."""
    return F.sum(F.col(col).cast(scale)).cast("double").alias(alias)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- B1: projection / rename / cast ------------------------------------------


@register(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty,
           l_extendedprice AS price,
           l_returnflag AS flag
    FROM lineitem
    """,
    group="B",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — projection/rename/cast. Catalyst prunes the scan to the five
    referenced columns (ReadSchema in explain)."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


# --- B2: filter --------------------------------------------------------------


@register(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 40
    """,
    group="B",
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — conjunctive predicates + BETWEEN; all push down to Parquet
    (PushedFilters: GtEq/Lt on shipdate, Eq on returnflag, range on qty)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_returnflag") == "R")
        & F.col("l_quantity").between(10, 40)
    )


# --- B3: inner equi-join -----------------------------------------------------


@register(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
    group="B",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — hash equi-join orders⋈customer. customer is far below the
    broadcast threshold at every sf here, so AQE plans a broadcast hash
    join (no shuffle of the fact side); at 100 TB with a huge customer
    dim it degrades gracefully to sort-merge on the key."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


# --- B4: broadcast join ------------------------------------------------------


@register(
    "q_join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type, p.p_retailprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO'
    """,
    group="B",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — explicit broadcast of the small dim: the fact table never
    shuffles; the dim filter is applied before broadcast so only PROMO
    parts ship to executors. The correct 100 TB plan for star joins."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type", "p_retailprice"
    )


# --- B5: outer join ----------------------------------------------------------


@register(
    "q_join_left",
    oracle=None,
    pytest_oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    group="B",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — left outer join with a join-side predicate (kept in the ON
    clause: filtering after the join would drop the null-extended rows).
    r15 rotation wave 2: rotated out of its driver slot (q_join_inner /
    q_join_broadcast keep the join family slot-checked); identical
    DuckDB parity runs every pytest pass via tests/test_rotated_oracle.py."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


# --- B6: semi / anti join ----------------------------------------------------


@register(
    "q_join_semi",
    oracle=None,
    pytest_oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    group="B",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6a — left-semi join (EXISTS): customers with ≥1 urgent order.
    Semi joins ship only the key column of the probe side — the shape
    behind the read-model's "subject exists" checks. r15 rotation
    wave 2: rotated out as q_join_anti cycles back in (the semi/anti
    siblings alternate); parity stays in tests/test_rotated_oracle.py."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    group="B",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6b — left-anti join (NOT EXISTS): the tombstone-removal shape
    (SURVEY §2 A6) on relational data. r15 rotation wave 2: cycled
    back into a driver slot; q_join_semi rotates out this round (the
    promoted q_tombstone keeps the anti shape double-checked)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --- B7: hash aggregation (TPC-H Q1 shape) -----------------------------------


@register(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    group="B",
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 — TPC-H Q1-shaped hash aggregation: partial (map-side) agg before
    one shuffle on the two low-cardinality keys. DECIMAL arithmetic keeps
    the sums exact and order-independent, so results are bit-identical at
    any partition count — the property that makes this safe at 100 TB."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    # minimal decimal widths for the product terms: (12,2)×(5,2) stays
    # within precision 18 → Spark's compact-long decimal path (a (18,2)
    # cast pushes every product to the BigDecimal slow path; measured
    # ~17% slower with bit-identical results — values are exact either way)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# --- B8: distinct / approx distinct ------------------------------------------


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    group="B",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8a — exact count-distinct (two-phase: dedup shuffle then agg)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"), F.count("*").alias("n_orders"))
    )


@register("q_agg_approx", oracle=None, group="B")  # HLL sketches are engine-specific
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8b — approx count-distinct (HyperLogLog++). The 100 TB answer to
    distinct cardinality: one pass, fixed-size sketch, mergeable across
    partitions — no dedup shuffle. Rows-only check (sketch values are
    engine-specific); accuracy asserted in tests vs exact counts."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
    )


# --- B9: rollup --------------------------------------------------------------


@register(
    "q_rollup",
    oracle=None,
    pytest_oracle="""
    SELECT coalesce(n.n_name, '__ALL__') AS nation,
           coalesce(c.c_mktsegment, '__ALL__') AS segment,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    group="B",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 — rollup (hierarchical grouping sets) over a dim join. Spark
    expands grouping sets in one pass (Expand node) — no per-level rescan.
    Null markers are coalesced to a sentinel so they hash identically.
    r15 rotation wave 2: rotated out as q_cube cycles back in (the
    Expand family's slot alternates); parity stays in
    tests/test_rotated_oracle.py."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.rollup("n_name", "c_mktsegment")
        .agg(_dsum("c_acctbal", "total_bal"), F.count("*").alias("n_customers"))
        .select(
            F.coalesce("n_name", F.lit("__ALL__")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("__ALL__")).alias("segment"),
            "total_bal",
            "n_customers",
        )
    )


# --- B10: window ranking -----------------------------------------------------


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    group="B",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 — top-3 orders per customer: the same single-window-per-key plan
    as feed compaction (SURVEY §2 A5). Tie-broken on the unique orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


# --- B11: analytic window with frames ----------------------------------------


@register(
    "q_window_frame",
    oracle=None,
    pytest_oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    """,
    group="B",
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 — running total + lag with an explicit ROWS frame, deterministic
    order (date, unique key). DECIMAL window sum ⇒ exact prefix sums.
    r15 rotation wave 2: rotated out (q_window_rank keeps the window
    family's slot); parity stays driver-strict in
    tests/test_rotated_oracle.py."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# --- B12: top-k --------------------------------------------------------------


@register(
    "q_topk",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    ORDER BY total_spent DESC, o_custkey LIMIT 10
    """,
    group="B",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 — top-10 customers by exact total. orderBy+limit plans as
    TakeOrderedAndProject: per-partition heap top-k, 10-row driver merge —
    no global sort, the only sane top-k at 100 TB."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(_dsum("o_totalprice", "total_spent"), F.count("*").alias("n_orders"))
        .orderBy(F.col("total_spent").desc(), "o_custkey")
        .limit(10)
    )


# --- B13: set operations -----------------------------------------------------


@register(
    "q_union",
    oracle=None,
    pytest_oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
    """,
    group="B",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13a — UNION ALL of two filtered slices (no dedup ⇒ no shuffle).
    r15 rotation wave 2: rotated out as q_intersect/q_except cycle back
    in; parity stays in tests/test_rotated_oracle.py."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return ev.filter(F.col("event_type") == "purchase").unionAll(ev.filter(F.col("event_type") == "signup"))


@register(
    "q_intersect",
    group="B",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'error'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13b — INTERSECT (distinct semantics; plans as an aggregate+semi-join).
    r15 rotation wave 2: INTERSECT/EXCEPT cycle back into driver
    slots while q_union rotates out — the set-op family's slots
    alternate on the rotation cadence. r15 also moves both to the
    (user_id, day) grain: at the plain user_id grain every user carried
    every event type at sf0.01, so the results were all-or-nothing
    (q_except was EMPTY every round since r10 — a trivially-green
    driver row); day grain makes both sides discriminating (586 of
    1604 purchase user-days also error at sf0.01)."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    b = ev.filter(F.col("event_type") == "error").select("user_id", day)
    return a.intersect(b)


@register(
    "q_except",
    group="B",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13c — EXCEPT (distinct anti-join shape) at the (user_id, day)
    grain — see q_intersect for why (the user_id grain returned ZERO
    rows at sf0.01, a vacuously-green check). r15 rotation wave 2:
    cycled back into a driver slot with ~1060 real rows."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    a = ev.filter(F.col("event_type") == "view").select("user_id", day)
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return a.subtract(b)


# --- B14: string functions ---------------------------------------------------


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_prefix,
           CAST(length(p_name) AS INTEGER) AS name_len,
           p_brand || '/' || p_type AS brand_type,
           CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
           trim(p_name) AS name_trim,
           lpad(p_brand, 12, '*') AS brand_pad,
           replace(p_name, ' ', '_') AS name_snake,
           reverse(p_type) AS type_rev,
           CAST(instr(p_name, 'a') AS INTEGER) AS first_a,
           repeat(p_brand, 2) AS brand_twice
    FROM part
    """,
    group="B",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 — scalar string functions (all codegen'd built-ins)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%widget%"), 1).otherwise(0).alias("is_widget"),
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.trim("p_name").alias("name_trim"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_type").alias("type_rev"),
        F.instr("p_name", "a").alias("first_a"),
        F.repeat("p_brand", 2).alias("brand_twice"),
    )


# --- B15: date/time functions ------------------------------------------------


@register(
    "q_fn_date",
    oracle=None,
    pytest_oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           date_trunc('month', o_orderdate) AS order_month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS order_dom,
           CAST(isodow(o_orderdate) AS INTEGER) AS order_isodow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus_two_months
    FROM orders
    """,
    group="B",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 — scalar date/time functions; timestamps stay µs/UTC both
    sides. Day-of-week goes through ISO numbering (Mon=1..Sun=7), the
    encoding the engines share. r15 rotation wave 2: rotated out as
    q_fn_math cycles back in (scalar family alternation); parity stays
    in tests/test_rotated_oracle.py."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofmonth("o_orderdate").alias("order_dom"),
        (F.weekday("o_orderdate") + 1).alias("order_isodow"),
        # DATE stays off the contract surface: pandas-side normalization
        # renders engine DATEs inconsistently (midnight-timestamp vs
        # date), so calendar results ship as TIMESTAMP on both sides
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 2).cast("timestamp").alias("plus_two_months"),
    )


# --- B16: math functions -----------------------------------------------------


@register(
    "q_fn_math",
    group="B",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(power(l_quantity, 2) AS DOUBLE) AS qty_sq,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 — scalar math; identical double inputs ⇒ identical outputs.
    Only IEEE-exact operations (sqrt, sign, min/max) — transcendentals
    (exp/ln/pow with fractional exponents) go through platform libm and
    can differ by ULPs across engines, so they stay off the oracle
    surface. r15 rotation wave 2: cycled back into a driver slot while
    q_fn_date rotates out (the scalar family's slots alternate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


# --- B17: JSON / array functions ---------------------------------------------


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CASE WHEN list_contains(['click','view'], event_type) THEN 1 ELSE 0 END AS is_browse,
           array_to_string(list_sort(string_split(event_type, 'i')), ',') AS type_parts_sorted,
           string_split(event_type, 'i')[1] AS type_head,
           CAST(len(string_split(event_type, 'i')) AS INTEGER) AS type_n_parts
    FROM events
    """,
    group="B",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 — JSON path extraction (the feed's schemaless `data` payload
    pattern, spec README.md:310-316) + array construction, sort,
    element access (ASCII data, so lexical sorts agree across engines).
    Array results leave as joined STRINGS: a raw array column's pandas
    rendering depends on the session's Arrow setting (numpy vs list
    repr), which would make the driver's hash compare session-dependent."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    parts = F.split("event_type", "i")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
        F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0).alias("is_browse"),
        F.array_join(F.sort_array(parts), ",").alias("type_parts_sorted"),
        F.element_at(parts, 1).alias("type_head"),
        F.size(parts).alias("type_n_parts"),
    )


# --- B18: Pandas-UDF surface (rows-only) -------------------------------------


@register("q_udf", oracle=None, group="B")
def q_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 — the Arrow-vectorized Python escape hatch, demonstrated on a
    per-user z-score: grouped applyInPandas (one pandas frame per user).
    Rows-only check (float reduction order differs from SQL); accuracy
    covered in tests. At scale: one shuffle on the group key; groups must
    fit in worker memory — callers key on high-cardinality columns."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        mean = pdf["value"].mean()
        pdf["value_z"] = 0.0 if std == 0 else (pdf["value"] - mean) / std
        return pdf

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, value double, value_z double"
    )
