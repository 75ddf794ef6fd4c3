"""Deterministic sampling/splitting (functions/sampling.py): the
reproducibility contracts training pipelines rely on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from http_feeds_spark.functions import sampling as smp


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")


WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_disjoint_exhaustive_and_stable(spark, docs):
    out = smp.with_split(docs, "doc_id", WEIGHTS)
    rows = out.collect()
    assert all(r.split in WEIGHTS for r in rows)  # exhaustive
    assert len(rows) == docs.count()              # one split per row
    # stability under repartitioning — the df.sample failure mode
    again = {
        r.doc_id: r.split
        for r in smp.with_split(docs.repartition(17), "doc_id", WEIGHTS).collect()
    }
    assert {r.doc_id: r.split for r in rows} == again


def test_split_ratios_and_seed_redraw(spark, docs):
    n = docs.count()
    counts = {
        r.split: r.c
        for r in smp.with_split(docs, "doc_id", WEIGHTS)
        .groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert abs(counts.get("train", 0) / n - 0.8) < 0.08
    assert abs(counts.get("val", 0) / n - 0.1) < 0.06
    # a different seed re-draws the partition
    a = {r.doc_id: r.split for r in smp.with_split(docs, "doc_id", WEIGHTS, seed=0).collect()}
    b = {r.doc_id: r.split for r in smp.with_split(docs, "doc_id", WEIGHTS, seed=1).collect()}
    assert a != b and set(a) == set(b)


def test_split_membership_survives_corpus_growth(spark, docs):
    """Adding documents never moves existing ones between splits."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    before = {r.doc_id: r.split for r in smp.with_split(half, "doc_id", WEIGHTS).collect()}
    after = {
        r.doc_id: r.split
        for r in smp.with_split(docs, "doc_id", WEIGHTS).collect()
        if r.doc_id in before
    }
    assert before == after


def test_split_weight_validation(docs):
    with pytest.raises(ValueError, match="sum to 1.0"):
        smp.with_split(docs, "doc_id", {"a": 0.5, "b": 0.1})


def test_deterministic_sample_stable_and_nested(spark, docs):
    s10 = {r.doc_id for r in smp.deterministic_sample(docs, "doc_id", 0.10).collect()}
    s30 = {r.doc_id for r in smp.deterministic_sample(docs, "doc_id", 0.30).collect()}
    n = docs.count()
    assert abs(len(s10) / n - 0.10) < 0.06
    assert abs(len(s30) / n - 0.30) < 0.08
    # threshold sampling nests: growing the fraction only ADDS members —
    # lets a pipeline scale up a pilot sample without re-selecting it
    assert s10 <= s30
    # stable across partition layouts
    again = {
        r.doc_id
        for r in smp.deterministic_sample(docs.repartition(13), "doc_id", 0.10).collect()
    }
    assert again == s10


def test_shuffled_for_training_deterministic_orders(spark, docs):
    o1 = [r.doc_id for r in smp.shuffled_for_training(docs, "doc_id", seed=0).collect()]
    o2 = [r.doc_id for r in smp.shuffled_for_training(docs, "doc_id", seed=0).collect()]
    o3 = [r.doc_id for r in smp.shuffled_for_training(docs, "doc_id", seed=1).collect()]
    assert o1 == o2                      # reproducible epoch order
    assert o1 != o3                      # new seed, new order
    assert sorted(o1) == sorted(o3)      # same corpus
    assert o1 != sorted(o1)              # actually shuffled


def test_train_split_query_registered(spark, sf_dir):
    from http_feeds_spark.queries import registry

    out = registry()["q_llm_train_split"].fn(spark, sf_dir)
    rows = out.collect()
    assert [r.split for r in rows] == ["test", "train", "val"]
    n = sum(r.n_docs for r in rows)
    by = {r.split: r.n_docs for r in rows}
    assert by["train"] > by["val"] and by["train"] > by["test"]
    assert n == sum(by.values())
