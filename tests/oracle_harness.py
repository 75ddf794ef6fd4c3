"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
Parquet directory, then compares row count, column names, and values
exactly (strict: floats must match bit-for-bit after normalization — the
driver hashes values, so we hold ourselves to the worst case).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pandas as pd

from http_feeds_spark.schema import TABLE_NAMES

SF_DEFAULT = "/root/testdata/sf0.001"


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; generated tiers (the r14
        # scale_tier) are Spark-written parquet DIRECTORIES — glob those
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Return a comparison report dict; report['match'] is the verdict."""
    spark_pdf = spark_df.toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

    report = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(duck_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "oracle_cols": sorted(duck_pdf.columns),
    }
    report["cols_match"] = report["spark_cols"] == report["oracle_cols"]
    report["rows_match"] = report["spark_rows"] == report["oracle_rows"]
    if not (report["cols_match"] and report["rows_match"]):
        report["match"] = False
        return report

    s_rows, d_rows = _normalize(spark_pdf), _normalize(duck_pdf)
    report["match"] = s_rows == d_rows
    if not report["match"]:
        diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        report["first_diffs"] = diff[:3]
    return report


def check_query(spark, name: str, sf_dir: str = SF_DEFAULT) -> dict:
    from http_feeds_spark.queries import registry

    q = registry()[name]
    df = q.fn(spark, sf_dir)
    # rotated-out queries (SURVEY §8 slot rotation) keep full parity here
    sql = q.oracle if q.oracle is not None else q.pytest_oracle
    if sql is None:
        n = df.count()
        return {"match": n >= 0, "rows_only": True, "spark_rows": n}
    return compare(df, sql, sf_dir)
