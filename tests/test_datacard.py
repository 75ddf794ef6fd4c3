"""Corpus data card (operators/datacard.py): full DuckDB parity for the
one-pass rollup card, and the composition-share invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark.operators import datacard as dc
from tests.oracle_harness import compare


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_card_matches_duckdb(spark, sf_dir):
    """Value parity including both rollup margin levels. Spark's
    percentile_approx is exact below the sketch's 1/epsilon group size
    (default accuracy 10000 ≫ any fixture group), so it must equal
    DuckDB's percentile_disc here."""
    got = dc.data_card(_docs(spark, sf_dir))
    r = compare(got, dc.data_card_oracle_sql(), sf_dir)
    assert r["match"], {k: v for k, v in r.items() if k != "first_diffs"}


def test_card_shares_and_margins(spark, sf_dir):
    card = dc.data_card(_docs(spark, sf_dir)).collect()
    grand = [r for r in card if r.source is None and r.lang is None]
    assert len(grand) == 1 and grand[0].pct_docs == 1.0
    cells = [r for r in card if r.source is not None and r.lang is not None]
    assert abs(sum(r.pct_docs for r in cells) - 1.0) < 0.01
    assert sum(r.n_docs for r in cells) == grand[0].n_docs


def test_card_is_one_shuffle(spark, sf_dir):
    """The card must stay a single aggregation pass: one Exchange for
    the rollup (plus the scalar window over the tiny card result) —
    never a per-level union of scans."""
    from http_feeds_spark import plans

    card = dc.data_card(_docs(spark, sf_dir))
    assert plans.has_partial_aggregation(card)
    assert plans.shuffle_count(card) <= 2, plans.executed_plan(card)
