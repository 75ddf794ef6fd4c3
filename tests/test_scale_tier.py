"""The sf0.1→sf1.0 scale tier generator (http_feeds_spark/scale_tier.py):
replication invariants at factor 3 over sf0.001 — the same code path
scale_curve.py runs at factor 10 over sf0.1."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark.scale_tier import (
    COPIED_TABLES,
    KEY_OFFSET,
    SCALED_TABLES,
    ensure_scale_tier,
)
from http_feeds_spark.sources.tables import load_table

FACTOR = 3


def _tier(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "tier")
    ensure_scale_tier(spark, sf_dir, dst, factor=FACTOR)
    return dst


def test_counts_schemas_and_idempotence(spark, sf_dir, tmp_path):
    dst = _tier(spark, sf_dir, tmp_path)
    for t in SCALED_TABLES:
        src_df, dst_df = load_table(spark, sf_dir, t), load_table(spark, dst, t)
        assert dst_df.count() == FACTOR * src_df.count(), t
        assert dst_df.schema.simpleString() == src_df.schema.simpleString(), t
    for t in COPIED_TABLES:
        assert load_table(spark, dst, t).count() == load_table(spark, sf_dir, t).count()
    # deterministic build-once: a second call is a no-op
    assert ensure_scale_tier(spark, sf_dir, dst, factor=FACTOR) is False


def test_work_shape_preserved(spark, sf_dir, tmp_path):
    """The replication must scale key cardinalities, not deepen hot keys
    or plant artificial duplicates."""
    dst = _tier(spark, sf_dir, tmp_path)

    # word salting: no cross-copy duplicate text (no clone-pair blowup
    # for exact/near/substr dedup), and n_chars tracks the salted text
    docs = load_table(spark, dst, "documents")
    assert docs.groupBy("text").count().where(F.col("count") > 1).count() == 0
    assert docs.where(F.length("text") != F.col("n_chars")).count() == 0

    # key shifts: copies occupy disjoint key ranges
    for t, key in [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        df = load_table(spark, dst, t)
        per_copy = (
            df.groupBy((F.col(key) / KEY_OFFSET).cast("int").alias("copy"))
            .count()
            .collect()
        )
        assert len(per_copy) == FACTOR, t
        counts = {r["count"] for r in per_copy}
        assert len(counts) == 1, (t, per_copy)

    # subject cardinality scales: read model output is FACTOR x
    from http_feeds_spark.queries import registry

    rm = registry()["q_read_model"]
    assert rm.fn(spark, dst).count() == FACTOR * rm.fn(spark, sf_dir).count()

    # embeddings: float element type kept, per-copy vectors perturbed
    emb = load_table(spark, dst, "embeddings")
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    v0 = emb.where(F.col("vec_id") == 0).collect()[0].embedding
    v1 = emb.where(F.col("vec_id") == KEY_OFFSET).collect()[0].embedding
    assert len(v0) == len(v1) and v0 != v1

    # referential integrity into the 1x dims survives (broadcast shape)
    li = load_table(spark, dst, "lineitem")
    part = load_table(spark, dst, "part")
    orphan = li.join(part, li.l_partkey == part.p_partkey, "left_anti").count()
    assert orphan == 0


def test_oracle_parity_holds_on_the_scaled_tier(spark, sf_dir, tmp_path):
    """Correctness at scale, not just speed: driver-strict DuckDB
    parity re-run against the GENERATED tier for one representative of
    each headline family — aggregation, broadcast join, feed read
    model (subjects scaled), text stats, exact dedup, cosine top-k.
    Any replication bug (key collision, salt corruption, perturbation
    breaking float exactness) shows up as a value-hash mismatch."""
    from tests.oracle_harness import check_query

    dst = _tier(spark, sf_dir, tmp_path)
    for name in [
        "q_agg_group",
        "q_join_broadcast",
        "q_read_model",
        "q_llm_textstats",
        "q_llm_dedup_exact",
        "q_llm_cosine",
    ]:
        report = check_query(spark, name, dst)
        assert report["match"], (name, {k: v for k, v in report.items() if k != "first_diffs"})
