"""Exact-substring span dedup (operators/substr_dedup.py): full DuckDB
value parity for the stats AND the scrubbed text, planted-span
semantics, round-trip of clean docs, and the plan's aggregate shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark import plans
from http_feeds_spark.operators import substr_dedup as sd
from tests.oracle_harness import compare


def _docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_stats_match_duckdb(spark, sf_dir):
    got = sd.dup_span_stats(_docs(spark, sf_dir), length=12, min_count=2)
    r = compare(got, sd.stats_oracle_sql(length=12, min_count=2), sf_dir)
    assert r["match"], {k: v for k, v in r.items() if k != "first_diffs"}


def test_scrub_matches_duckdb(spark, sf_dir):
    got = sd.scrub_duplicated_spans(_docs(spark, sf_dir), length=12, min_count=2)
    r = compare(got, sd.scrub_oracle_sql(length=12, min_count=2), sf_dir)
    assert r["match"], {k: v for k, v in r.items() if k != "first_diffs"}


def test_planted_span_is_found_and_cut(spark):
    """A 6-token span planted verbatim into two otherwise-distinct docs
    must be marked in both at the right coverage, and scrubbing must cut
    exactly it; the clean doc is untouched (round-trip)."""
    span = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {span} four five six"),
            (2, f"seven eight {span} nine ten eleven twelve"),
            (3, "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"),
        ],
        "doc_id long, text string",
    )
    stats = {
        r.doc_id: r
        for r in sd.dup_span_stats(docs, length=6, min_count=2).collect()
    }
    assert stats[1].dup_tokens == 6 and stats[2].dup_tokens == 6
    assert stats[3].dup_tokens == 0 and stats[3].dup_frac == 0.0

    scrub = {
        r.doc_id: r
        for r in sd.scrub_duplicated_spans(docs, length=6, min_count=2).collect()
    }
    assert scrub[1].scrubbed_text == "one two three four five six"
    assert scrub[2].scrubbed_text == "seven eight nine ten eleven twelve"
    assert (
        scrub[3].scrubbed_text
        == "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    )


def test_overlapping_and_within_doc_repeats(spark):
    """Two properties the interval-union must get right: overlapping
    duplicated windows count each covered token ONCE, and a verbatim
    repeat WITHIN one document is a duplicate too (corpus-wide count,
    per the reference pass)."""
    # 8-token repeated run inside one doc: windows of length 4 at
    # positions 0..4 all repeat; union covers all 8 tokens + the bridge
    docs = spark.createDataFrame(
        [(1, "a b c d a b c d x y z w"), (2, "p q r s t u v w x1 y1 z1 w1")],
        "doc_id long, text string",
    )
    stats = {
        r.doc_id: r for r in sd.dup_span_stats(docs, length=4, min_count=2).collect()
    }
    # 'a b c d' occurs at pos 0 and 4 -> both windows duplicated,
    # covering tokens [0,4) and [4,8) = 8 tokens, no double count
    assert stats[1].dup_tokens == 8, stats[1]
    assert stats[2].dup_tokens == 0


def test_short_docs_yield_no_windows(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = sd.dup_span_stats(docs, length=12, min_count=2).collect()
    assert all(r.dup_tokens == 0 for r in rows)


def test_plan_shape(spark, sf_dir):
    """The frequency count must partial-aggregate map-side (the shuffle
    carries hash partials, not raw windows)."""
    stats = sd.dup_span_stats(_docs(spark, sf_dir), length=12, min_count=2)
    assert plans.has_partial_aggregation(stats)
    stats.write.format("noop").mode("overwrite").save()
