"""Automated sf10 oracle parity (r15, r14 verdict item 5).

The r14 round proved the scale tiers correct by hand for two queries;
this module makes the whole oracle-expressible headline family (the
bench's LEGACY12 + the substr head) a PERMANENT at-scale parity gate:
any future plan change must keep DuckDB value parity on the generated
sf10 tier (60M lineitem / 15M orders / 10M events / 500K docs), not
just at driver scale.

Two contract adaptations for scale, both r14 findings made actionable:

- **Set-based compare, not row materialization**: multi-million-row
  results (q_join_broadcast ≈ 10M rows at sf10) cannot go through the
  pytest harness's Python-side row normalization. The Spark result is
  written to parquet and compared inside DuckDB with EXCEPT ALL in both
  directions — multiset equality, the same worst case the driver's
  value hash enforces, at C++ speed.
- **DECIMAL-string contract above double saturation**: at sf10 the
  q_agg_group DECIMAL sums exceed ~17 significant digits and the two
  engines' decimal→double final casts differ by 1 ULP while the
  DECIMAL values are string-identical (BASELINE.md r14 log). The
  aggregation twin here keeps the sums in DECIMAL end-to-end and
  compares exact decimal STRINGS — sharper than the double contract,
  not looser.

The tiers are deterministic build-once artifacts (scale_tier.py); the
fixtures build them if absent (one-time cost), so the gate cannot
silently skip. The substr head runs on the sf1.0 tier (50K docs): its
map-side CPU is linear-in-tokens (measured, SCALING.md) and the sf10
run costs ~1 min of pure compute at local[32] — the plan shape is
identical, only the constant differs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.scale_tier import ensure_scale_tier
from http_feeds_spark.sources.tables import load_table
from tests.oracle_harness import duckdb_connect

SRC = "/root/testdata/sf0.1"
SF10_DIR = "/root/repo/spark-warehouse/scale_sf10.0"
SF1_DIR = "/root/repo/spark-warehouse/scale_sf1.0"

# LEGACY12 ∩ oracle-expressible, minus q_agg_group (decimal twin below)
# and q_llm_dedup_near (rows-only by design: hash-seeded LSH).
SF10_QUERIES = [
    "q_join_broadcast",
    "q_join_inner",
    "q_window_rank",
    "q_topk",
    "q_read_model",
    "q_stream_tumbling",
    "q_llm_dedup_exact",
    "q_llm_cosine",
    "q_llm_textstats",
    "q_llm_tokens",
]
SF1_QUERIES = ["q_llm_substr_scrub"]



pytestmark = pytest.mark.slow  # platform-integration tier (see pytest.ini)

@pytest.fixture(scope="module")
def sf10_dir(spark):
    ensure_scale_tier(spark, SRC, SF10_DIR, factor=100)
    return SF10_DIR


@pytest.fixture(scope="module")
def sf1_dir(spark):
    ensure_scale_tier(spark, SRC, SF1_DIR, factor=10)
    return SF1_DIR


def _duck_cast(duck_type: str, col: str) -> str:
    """Harmonizing cast for the EXCEPT compare: integer widths to
    BIGINT, floats to DOUBLE, timestamps to µs TIMESTAMP (Spark's
    parquet may read back as TIMESTAMPTZ), everything else as typed."""
    t = duck_type.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT"):
        return f'CAST("{col}" AS BIGINT) AS "{col}"'
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return f'CAST("{col}" AS DOUBLE) AS "{col}"'
    if "TIMESTAMP" in t:
        return f'CAST("{col}" AS TIMESTAMP) AS "{col}"'
    if t.startswith("DECIMAL"):
        return f'CAST("{col}" AS VARCHAR) AS "{col}"'
    return f'"{col}"'


def compare_in_duckdb(spark_df, oracle_sql: str, sf_dir: str, tmp_path) -> dict:
    """Driver-strict multiset parity without Python row materialization:
    Spark result → parquet → DuckDB EXCEPT ALL both ways vs the oracle."""
    path = str(tmp_path / "spark_res")
    spark_df.write.mode("overwrite").parquet(path)
    con = duckdb_connect(sf_dir)
    try:
        con.execute(f"CREATE VIEW spark_raw AS SELECT * FROM '{path}/*.parquet'")
        con.execute(f"CREATE TEMP TABLE oracle_raw AS SELECT * FROM ({oracle_sql})")
        s_cols = {r[0]: r[1] for r in con.execute("DESCRIBE spark_raw").fetchall()}
        o_cols = {r[0]: r[1] for r in con.execute("DESCRIBE oracle_raw").fetchall()}
        report = {
            "spark_cols": sorted(s_cols),
            "oracle_cols": sorted(o_cols),
            "spark_rows": con.execute("SELECT count(*) FROM spark_raw").fetchone()[0],
            "oracle_rows": con.execute("SELECT count(*) FROM oracle_raw").fetchone()[0],
        }
        report["cols_match"] = report["spark_cols"] == report["oracle_cols"]
        report["rows_match"] = report["spark_rows"] == report["oracle_rows"]
        if not (report["cols_match"] and report["rows_match"]):
            report["match"] = False
            return report
        s_sel = ", ".join(_duck_cast(s_cols[c], c) for c in sorted(s_cols))
        o_sel = ", ".join(_duck_cast(o_cols[c], c) for c in sorted(o_cols))
        diff = con.execute(
            f"SELECT count(*) FROM ("
            f"  (SELECT {s_sel} FROM spark_raw EXCEPT ALL SELECT {o_sel} FROM oracle_raw)"
            f"  UNION ALL"
            f"  (SELECT {o_sel} FROM oracle_raw EXCEPT ALL SELECT {s_sel} FROM spark_raw))"
        ).fetchone()[0]
        report["diff_rows"] = diff
        report["match"] = diff == 0
        return report
    finally:
        con.close()


@pytest.mark.parametrize("name", SF10_QUERIES)
def test_sf10_oracle_parity(spark, sf10_dir, tmp_path, name):
    from http_feeds_spark.queries import registry

    q = registry()[name]
    sql = q.oracle if q.oracle is not None else q.pytest_oracle
    report = compare_in_duckdb(q.fn(spark, sf10_dir), sql, sf10_dir, tmp_path)
    assert report["match"], (name, report)


@pytest.mark.parametrize("name", SF1_QUERIES)
def test_sf1_oracle_parity_cpu_tier(spark, sf1_dir, tmp_path, name):
    from http_feeds_spark.queries import registry

    q = registry()[name]
    sql = q.oracle if q.oracle is not None else q.pytest_oracle
    report = compare_in_duckdb(q.fn(spark, sf1_dir), sql, sf1_dir, tmp_path)
    assert report["match"], (name, report)


def test_sf10_agg_group_decimal_contract(spark, sf10_dir, tmp_path):
    """q_agg_group at sf10 under the DECIMAL-string contract: the sums
    that saturate a double's 17 significant digits stay DECIMAL
    end-to-end on BOTH engines and must be string-identical. Mirrors
    the registered plan (relational.py q_agg_group) minus the final
    double casts; avg_qty is excluded because it divides through the
    saturated double by construction (its exact numerator sum_qty is
    covered)."""
    li = load_table(spark, sf10_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2000-09-02"
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    df = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("string").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("string").alias("sum_base_price"),
        F.sum(price * (F.lit(1) - disc))
        .cast("decimal(38,4)").cast("string").alias("sum_disc_price"),
        F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
        .cast("decimal(38,6)").cast("string").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )
    sql = """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """
    report = compare_in_duckdb(df, sql, sf10_dir, tmp_path)
    assert report["match"], report
    # and the saturation is REAL at this scale: the sums genuinely
    # exceed double precision (>= 17 significant digits), so this
    # contract is doing work the double hash cannot
    assert report["spark_rows"] > 0
    con = duckdb_connect(sf10_dir)
    try:
        top = con.execute(
            "SELECT max(len(replace(s, '.', ''))) FROM ("
            "  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
            "  * (1 - CAST(l_discount AS DECIMAL(4,2)))"
            "  * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS s"
            "  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'"
            "  GROUP BY l_returnflag, l_linestatus)"
        ).fetchone()[0]
    finally:
        con.close()
    assert top >= 18, top  # sum_charge carries 6 decimals: > double precision
