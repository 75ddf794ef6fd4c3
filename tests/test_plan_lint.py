"""plans.lint: each rule must fire on a constructed bad shape and stay
quiet on the corrected shape — the linter exists to catch the r9/r11
incident classes mechanically, so its tests ARE those incidents in
miniature. Integration: the repo's own hot shapes lint clean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.plans import assert_clean, lint


def _rules(findings):
    return {f["rule"] for f in findings}


@pytest.fixture(scope="module")
def texts(spark):
    return spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta row "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_expensive_above_generate_fires_and_fix_clears(texts):
    toks = F.regexp_extract_all(F.lower("text"), F.lit(r"[\p{L}\p{N}]+"), F.lit(0))
    # the r11 posting-build incident shape: size(analyze) beside
    # posexplode(analyze) hoists the regex above the Generate
    bad = texts.select(
        "doc_id", F.size(toks).alias("dl"), F.posexplode(toks).alias("pos", "term")
    )
    assert "expensive_above_generate" in _rules(lint(bad))

    good = (
        texts.select("doc_id", toks.alias("__toks"))
        .select("doc_id", F.size("__toks").alias("dl"), "__toks")
        .select("doc_id", "dl", F.posexplode("__toks").alias("pos", "term"))
    )
    assert "expensive_above_generate" not in _rules(lint(good))


def test_necessary_per_row_work_above_generate_is_not_flagged(texts):
    # tokenizing the GENERATED chunk is per-chunk by semantic necessity
    # (the expression consumes the generator output) — the chunk-search
    # shape must stay clean
    chunks = texts.select(
        "doc_id", F.explode(F.split("text", " ", 3)).alias("chunk")
    ).select(
        "doc_id",
        F.regexp_extract_all(F.lower("chunk"), F.lit("[a-z]+"), F.lit(0)).alias("t"),
    )
    assert "expensive_above_generate" not in _rules(lint(chunks))


def test_python_above_generate_fires_and_fix_clears(texts):
    import pandas as pd

    def mark(s):
        return s.map(lambda x: x + "!")

    mark.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(mark, "string")

    words = F.split("text", " ")
    # UDF over the DOCUMENT re-evaluated per exploded word
    bad = texts.select(
        "doc_id", udf(F.col("text")).alias("m"), F.explode(words).alias("w")
    )
    assert "python_above_generate" in _rules(lint(bad))

    good = texts.select("doc_id", udf(F.col("text")).alias("m"), words.alias("ws")).select(
        "doc_id", "m", F.explode("ws").alias("w")
    )
    assert "python_above_generate" not in _rules(lint(good))

    # a UDF consuming the generated rows is the intended per-row shape
    necessary = texts.select("doc_id", F.explode(words).alias("w")).select(
        "doc_id", udf(F.col("w")).alias("m")
    )
    assert "python_above_generate" not in _rules(lint(necessary))


def test_collapse_point_clears_pending(texts):
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
    # the aggregate between the regex and the generate collapses rows:
    # the regex is evaluated per DOC row, not per exploded row
    agg = (
        texts.select("doc_id", F.size(toks).alias("dl"), F.col("text"))
        .groupBy("dl")
        .agg(F.collect_list("doc_id").alias("ids"))
        .select("dl", F.explode("ids").alias("doc_id"))
    )
    assert "expensive_above_generate" not in _rules(lint(agg))


def test_cartesian_rules(spark):
    a = spark.range(10).select(F.col("id").alias("a"))
    b = spark.range(10).select(F.col("id").alias("b"))
    assert "cartesian_product" in _rules(lint(a.crossJoin(b)))

    # broadcast of a provably one-row scalar aggregate is the repo's
    # stats-frame idiom (retrieval.py) — exempt
    stats = b.agg(F.count("*").alias("n"))
    assert "cartesian_product" not in _rules(lint(a.crossJoin(F.broadcast(stats))))


def test_single_partition_funnel(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    assert "single_partition_funnel" in _rules(lint(df.repartition(1)))
    # scalar aggregate funnels AFTER a partial agg: exempt
    assert "single_partition_funnel" not in _rules(lint(df.agg(F.sum("id"))))
    # post-limit funnels: exempt
    assert "single_partition_funnel" not in _rules(
        lint(df.orderBy("id").limit(5).repartition(1))
    )


def test_expensive_in_lambda(texts):
    arr = F.split("text", " ")
    bad = texts.select(
        F.transform(
            F.sequence(F.lit(1), F.lit(5)),
            lambda i: F.regexp_extract(F.col("text"), "(a.)", 1),
        ).alias("xs")
    )
    assert "expensive_in_lambda" in _rules(lint(bad))
    good = texts.select(F.transform(arr, lambda w: F.length(w)).alias("ls"))
    assert "expensive_in_lambda" not in _rules(lint(good))


def test_assert_clean_raises_with_findings(texts):
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
    bad = texts.select(F.size(toks).alias("dl"), F.posexplode(toks).alias("p", "t"))
    with pytest.raises(AssertionError, match="expensive_above_generate"):
        assert_clean(bad)
    assert_clean(bad, ignore=("expensive_above_generate",))


def test_repo_hot_shapes_lint_clean(spark, sf_dir):
    """The shapes the incidents came from, post-fix: the posting build's
    exploded frame and the BM25 search path."""
    from http_feeds_spark.operators.text_index import _exploded_postings
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert_clean(_exploded_postings(docs))
    assert_clean(_exploded_postings(docs, analyzer="standard_porter"))

    from http_feeds_spark.operators import retrieval

    assert_clean(retrieval.bm25_topk(docs, ["the", "data"], k=10))


def test_lambda_necessity_exemption(texts, spark):
    """An expensive call CONSUMING the lambda variable (tokenizing each
    query term) is per-element by semantics — exempt; the same call
    over a column from below the lambda (the r9 inlined-lineage shape)
    stays flagged."""
    necessary = texts.select(
        F.transform(
            F.split("text", " "),
            lambda t: F.regexp_extract_all(F.lower(t), F.lit("[a-z]+"), F.lit(0)),
        ).alias("xs")
    )
    assert "expensive_in_lambda" not in _rules(lint(necessary))


def test_cartesian_local_literal_exemption(spark):
    """A broadcast nested-loop join against a driver-local literal
    frame (the query-vector idiom of cosine/ANN baselines) is a
    model-sized lookup, not a cartesian scale bug."""
    corpus = spark.range(100).select(F.col("id").alias("doc_id"))
    queries = spark.createDataFrame([(1, 0.5), (2, 0.7)], "qid long, t double")
    assert "cartesian_product" not in _rules(
        lint(corpus.crossJoin(F.broadcast(queries)))
    )


# DOCUMENTED lint suppressions — each a deliberate design, not a bug:
# the brute-force cosine/IVF baselines join every (query, candidate)
# pair BY DEFINITION (their docstrings call this the exact-baseline
# tier; the scale path is the persisted ANN index), and their query
# frames come from a parquet filter, which the linter correctly cannot
# prove model-sized. Anything else flagging here is a regression.
LINT_ALLOW = {
    "q_llm_cosine": {"cartesian_product"},
    "q_llm_ann_ivf": {"cartesian_product"},
    "q_llm_sql_search": {"cartesian_product"},
}


@pytest.mark.slow  # >30 s platform-integration (see pytest.ini)
def test_registry_wide_lint_is_clean(spark, sf_dir):
    """EVERY registered query's executed plan lints clean (modulo the
    documented brute-force allowlist above) — the linter as a standing
    regression gate over the whole surface. First sweep: 105/109 clean;
    two of the four flags were rule-refinement cases (per-element
    lambda tokenization, a marker past the lambda's own parens) now
    fixed as principled exemptions, and the rest are the allowlist."""
    from http_feeds_spark.queries import registry

    flagged = {}
    for name, ent in sorted(registry().items()):
        rules = {x["rule"] for x in lint(ent.fn(spark, sf_dir))}
        rules -= LINT_ALLOW.get(name, set())
        if rules:
            flagged[name] = sorted(rules)
    assert not flagged, flagged


def test_inferred_generate_filter_rederivation_fires_and_outer_clears(texts):
    """The r15 incident class in miniature: a plain explode over an
    alias of a lambda-built gram array makes InferFiltersFromGenerate
    plant a size()>0 filter whose alias-substituted pushdown re-derives
    element_at(split(text), i) per lambda element — quadratic in doc
    length (measured 130 s -> 2 s at 8K-word docs once fixed). The
    split() marker catches it; the explode_outer form (no inferred
    filter) with the token array materialized lints clean."""
    from http_feeds_spark.functions.text import word_shingles, words

    def grams_over(col):
        return word_shingles(col, 2)

    bad = (
        texts.select(F.col("doc_id").alias("__rid"), words("text").alias("__toks"))
        .withColumn("__gs", grams_over(F.col("__toks")))
        .select("__rid", F.explode("__gs").alias("__g"))
        .groupBy("__rid")
        .count()
    )
    assert "expensive_in_lambda" in _rules(lint(bad))

    good = (
        texts.select(F.col("doc_id").alias("__rid"), words("text").alias("__toks"))
        .withColumn("__gs", grams_over(F.col("__toks")))
        .select("__rid", F.explode_outer("__gs").alias("__g"))
        .where(F.col("__g").isNotNull())
        .groupBy("__rid")
        .count()
    )
    assert lint(good) == []
