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


def test_decontaminate_finds_planted_contamination(spark, sf_dir):
    """Plant a near-copy of a train document into the test split; the
    decontamination join must surface exactly that pair with high
    overlap, and must never pair two docs from the same split."""
    from http_feeds_spark.functions import sampling as smp
    from http_feeds_spark.queries.llm import decontaminate
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = smp.with_split(docs, "doc_id", {"train": 0.9, "test": 0.1})

    # pick a real train doc with enough text, and a synthetic id that the
    # SAME hash split assigns to 'test'
    train_row = (
        split.filter((F.col("split") == "train") & (F.length("text") > 200))
        .orderBy("doc_id").first()
    )
    probe = spark.createDataFrame(
        [(i,) for i in range(3_000_000, 3_000_200)], "doc_id long"
    )
    test_id = (
        smp.with_split(probe, "doc_id", {"train": 0.9, "test": 0.1})
        .filter(F.col("split") == "test").orderBy("doc_id").first().doc_id
    )
    toks = train_row.text.split(" ")
    toks[len(toks) // 2] = "mutated"  # near-copy, one word changed
    contaminated = spark.createDataFrame(
        [(test_id, " ".join(toks))], "doc_id long, text string"
    )
    corpus = docs.union(contaminated)
    out = decontaminate(
        smp.with_split(corpus, "doc_id", {"train": 0.9, "test": 0.1})
    )
    rows = out.collect()
    planted = [r for r in rows if r.test_doc_id == test_id]
    assert any(r.train_doc_id == train_row.doc_id for r in planted), rows[:10]
    best = max(
        (r for r in planted if r.train_doc_id == train_row.doc_id),
        key=lambda r: r.n_shared_fps,
    )
    assert best.overlap_ratio > 0.5, best

    # split discipline: every pair crosses the split boundary
    splits = {r.doc_id: r.split for r in smp.with_split(
        corpus, "doc_id", {"train": 0.9, "test": 0.1}).collect()}
    for r in rows:
        assert splits[r.test_doc_id] == "test" and splits[r.train_doc_id] == "train"


def test_pack_into_bins_invariants_and_duckdb_parity(spark, sf_dir):
    """Offset packing: bins are contiguous from 0, each bin's load is
    bounded by budget + its largest member (a doc only overflows the bin
    it STARTS in), membership is deterministic, and the window math
    matches DuckDB exactly under an explicit order."""
    import duckdb

    from http_feeds_spark.functions import sampling as smp
    from http_feeds_spark.sources.tables import load_table

    budget = 500
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    packed = smp.pack_into_bins(docs, "n", budget)
    rows = packed.collect()
    bins = sorted({r.bin for r in rows})
    assert bins == list(range(len(bins)))  # contiguous from 0
    by_bin: dict[int, list] = {}
    for r in rows:
        by_bin.setdefault(r.bin, []).append(r.n)
    for b, sizes in by_bin.items():
        assert sum(sizes) < budget + max(sizes), (b, sum(sizes))
    # deterministic
    again = {(r.doc_id, r.bin) for r in smp.pack_into_bins(docs, "n", budget).collect()}
    assert again == {(r.doc_id, r.bin) for r in rows}

    # DuckDB parity of the window arithmetic under an explicit order
    spark_bins = {
        (r.doc_id, r.bin)
        for r in smp.pack_into_bins(docs, "n", budget, order_col="doc_id").collect()
    }
    pdf = docs.toPandas()
    duck = duckdb.connect()
    duck.register("d", pdf)
    want = {
        (int(a), int(b))
        for a, b in duck.execute(
            f"""
            SELECT doc_id,
                   CAST(floor((sum(n) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
                     / {budget}) AS BIGINT) AS bin
            FROM d
            """
        ).fetchall()
    }
    assert spark_bins == want


def test_mixture_proportions_binding_source_and_determinism(spark):
    """resample_to_mixture keeps the binding source whole, hits the
    target shares on the others, never duplicates or invents rows, and
    membership survives repartitioning."""
    docs = (
        spark.range(10_000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 6000, "A")
            .when(F.col("id") < 9000, "B")
            .otherwise("C")
            .alias("source"),
        )
    )
    # T = min(6000/.2, 3000/.3, 1000/.5) = 2000 -> keep A 1/15, B .2, C 1.0
    weights = {"A": 0.2, "B": 0.3, "C": 0.5}
    out = smp.resample_to_mixture(docs, weights, id_col="doc_id")
    got = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert got["C"] == 1000  # binding source: fraction exactly 1.0
    assert abs(got["A"] / 400 - 1.0) < 0.25   # expected 400 ± hash noise
    assert abs(got["B"] / 600 - 1.0) < 0.25   # expected 600
    # subset + stability across layouts
    ids = {r.doc_id for r in out.collect()}
    again = {
        r.doc_id
        for r in smp.resample_to_mixture(
            docs.repartition(13), weights, id_col="doc_id"
        ).collect()
    }
    assert again == ids
    assert ids <= {r.doc_id for r in docs.collect()}


def test_mixture_drops_unlisted_and_validates(spark):
    docs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "JUNK")], "doc_id long, source string"
    )
    out = smp.resample_to_mixture(docs, {"A": 0.5, "B": 0.5}, id_col="doc_id")
    assert {r.source for r in out.collect()} <= {"A", "B"}  # JUNK dropped
    with pytest.raises(ValueError, match="sum to 1.0"):
        smp.resample_to_mixture(docs, {"A": 0.5, "B": 0.1}, id_col="doc_id")
    with pytest.raises(ValueError, match="no rows"):
        smp.resample_to_mixture(docs, {"A": 0.5, "GHOST": 0.5}, id_col="doc_id")
    with pytest.raises(ValueError, match="positive"):
        smp.resample_to_mixture(docs, {"A": 1.0, "B": 0.0}, id_col="doc_id")


def test_domain_mix_query_registered(spark, sf_dir):
    """q_llm_domain_mix: named sources only, the uniform-corpus binding
    sources (src0/src1 at weight .4) kept whole, src2 (weight .2)
    halved within hash tolerance."""
    from http_feeds_spark.queries import registry
    from http_feeds_spark.sources.tables import load_table

    full = {
        r.source: r.c
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    rows = {r.source: r for r in registry()["q_llm_domain_mix"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"src0", "src1", "src2"}
    assert rows["src0"].n_docs == full["src0"]  # binding: kept whole
    assert rows["src1"].n_docs == full["src1"]
    assert 0.25 < rows["src2"].n_docs / full["src2"] < 0.75  # ~0.5 kept


def test_pack_rejects_non_numeric_order_col(spark, sf_dir):
    """ADVICE r5: the two-pass bucketing needs a numeric order key (its
    boundaries come from a percentile sketch) — a string curriculum
    column must fail loudly with guidance, not die inside
    percentile_approx (and must NOT be silently hashed, which would
    destroy the requested order)."""
    import pytest

    from http_feeds_spark.functions import sampling as smp
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n")
    )
    with pytest.raises(TypeError, match="NUMERIC order key"):
        smp.pack_into_bins(docs, "n", 500, order_col="lang")


def test_stratified_sample_exact(spark, sf_dir):
    """Exactly min(k, group size) per group; deterministic across
    layouts; different seeds draw different members; membership is a
    subset of the stratum."""
    from http_feeds_spark.functions import sampling as sa
    from http_feeds_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sizes = {r.source: r.c for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    k = 7
    got = sa.stratified_sample_exact(docs, "source", k, "doc_id")
    per = {r.source: r.c for r in got.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert per == {s: min(k, n) for s, n in sizes.items()}

    ids1 = {tuple(r) for r in got.select("source", "doc_id").collect()}
    ids2 = {
        tuple(r)
        for r in sa.stratified_sample_exact(docs.repartition(13), "source", k, "doc_id")
        .select("source", "doc_id")
        .collect()
    }
    assert ids1 == ids2
    ids_seed1 = {
        tuple(r)
        for r in sa.stratified_sample_exact(docs, "source", k, "doc_id", seed=1)
        .select("source", "doc_id")
        .collect()
    }
    assert ids_seed1 != ids1


def test_resample_with_replacement(spark, sf_dir):
    """Upsampling epochs: per-source output counts hit the target shares
    to ±1 row, composition is deterministic across layouts, (id, copy)
    is unique, and a scarce source repeats (copy > 0 exists)."""
    from http_feeds_spark.functions import sampling as sa
    from http_feeds_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    srcs = [r.source for r in docs.select("source").distinct().collect()]
    a, b = sorted(srcs)[:2]
    two = docs.where(F.col("source").isin([a, b]))
    ca = two.where(F.col("source") == a).count()
    target = 4 * (ca + two.where(F.col("source") == b).count())
    weights = {a: 0.7, b: 0.3}

    out = sa.resample_with_replacement(two, weights, target)
    per = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    for s, w in weights.items():
        assert abs(per[s] - w * target) <= 1, (s, per[s], w * target)

    assert out.groupBy("doc_id", "copy").count().where("count > 1").count() == 0
    assert out.where(F.col("copy") > 0).count() > 0  # genuine repetition

    again = {
        (r.doc_id, r.copy)
        for r in sa.resample_with_replacement(two.repartition(13), weights, target)
        .select("doc_id", "copy")
        .collect()
    }
    first = {(r.doc_id, r.copy) for r in out.select("doc_id", "copy").collect()}
    assert first == again

    # growth monotonicity: a larger target only ADDS copies
    bigger = {
        (r.doc_id, r.copy)
        for r in sa.resample_with_replacement(two, weights, target * 2)
        .select("doc_id", "copy")
        .collect()
    }
    assert first <= bigger


def test_export_training_shards(spark, sf_dir, tmp_path):
    """Shards re-read to exactly the packed set, rows inside each shard
    file are in (bin, shuffle-order) consumption order, and each shard
    holds only its own contiguous bin range."""
    from http_feeds_spark.functions import sampling as sa
    from http_feeds_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sized = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    packed = sa.pack_into_bins(sized, "n_tokens", 512)
    root = str(tmp_path / "shards")
    n_shards = sa.export_training_shards(docs, packed, root, bins_per_shard=4)
    assert n_shards >= 2

    back = spark.read.parquet(root)
    assert back.count() == packed.count()
    got_ids = {r.doc_id for r in back.select("doc_id").collect()}
    want_ids = {r.doc_id for r in packed.select("doc_id").collect()}
    assert got_ids == want_ids

    # bin-range containment per shard
    bad = back.where(
        (F.col("bin") / 4).cast("int") != F.col("shard")
    ).count()
    assert bad == 0

    # consumption order INSIDE each shard file: bins must be
    # non-decreasing in row order (read without shuffling row order)
    import glob

    import pyarrow.parquet as pq_

    for d in sorted(glob.glob(f"{root}/shard=*")):
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            bins = pq_.read_table(f, columns=["bin"]).column("bin").to_pylist()
            assert bins == sorted(bins), f
