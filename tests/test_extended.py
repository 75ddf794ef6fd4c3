"""Extended queries (pivot/cube/subquery/as-of) + maintenance compaction."""

from __future__ import annotations

import tempfile

import pytest

EXTENDED = ["q_pivot", "q_cube", "q_scalar_subquery", "q_asof_join", "q_agg_quantile"]


def test_ngram_sim_runs(spark, sf_dir):
    from http_feeds_spark.queries import registry

    assert registry()["q_llm_ngram_sim"].fn(spark, sf_dir).count() >= 0


def test_ngram_sim_planted_recall(spark, sf_dir):
    """Recall guard at the 0.3 threshold (protects the k=48/24×2 banding
    choice): plant a pair with 2-gram Jaccard ≈ 0.42 — mid-band between
    the verify threshold and the near-dup regime — and require the
    pipeline to surface it with the right similarity."""
    from http_feeds_spark.queries.extended import _ngram_sim_pairs
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = [f"tok{i}" for i in range(60)]
    variant = [f"mut{i}" if i % 5 == 0 else t for i, t in enumerate(base)]
    planted = docs.sparkSession.createDataFrame(
        [(2_000_001, " ".join(base)), (2_000_002, " ".join(variant))],
        "doc_id long, text string",
    )
    pairs = _ngram_sim_pairs(docs.union(planted))
    got = {(r.a, r.b): r.jaccard for r in pairs.collect() if r.a > 2_000_000}
    assert (2_000_001, 2_000_002) in got, got
    assert 0.3 <= got[(2_000_001, 2_000_002)] <= 0.6, got


def test_ngram_public_default_is_sharper_banding(spark, sf_dir):
    """ADVICE r5: the k=48/24×2 banding is a benchmark-profile opt-in,
    never the library default. The public ngram_sim_pairs defaults to
    k=64/32×2 (candidate recall ≈0.95 at s=0.3) and must also recover
    the mid-band planted pair."""
    import inspect

    from http_feeds_spark.queries.extended import ngram_sim_pairs
    from http_feeds_spark.sources.tables import load_table

    sig = inspect.signature(ngram_sim_pairs)
    assert sig.parameters["k"].default == 64
    assert sig.parameters["bands"].default == 32

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = [f"tok{i}" for i in range(60)]
    variant = [f"mut{i}" if i % 5 == 0 else t for i, t in enumerate(base)]
    planted = docs.sparkSession.createDataFrame(
        [(2_000_001, " ".join(base)), (2_000_002, " ".join(variant))],
        "doc_id long, text string",
    )
    pairs = ngram_sim_pairs(docs.union(planted))  # sharp default
    got = {(r.a, r.b): r.jaccard for r in pairs.collect() if r.a > 2_000_000}
    assert (2_000_001, 2_000_002) in got, got


def test_jaccard_suite_shares_tokens_and_matches_independent_runs(spark, sf_dir):
    """jaccard_suite must produce exactly the pair sets of the two
    independent pipelines while tokenizing the corpus once."""
    from http_feeds_spark.queries.extended import _ngram_sim_pairs
    from http_feeds_spark.queries.llm import _near_dup_pairs, jaccard_suite
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near_s, sim_s = jaccard_suite(docs)

    def pset(df):
        return {(r.a, r.b, r.jaccard) for r in df.collect()}

    assert pset(near_s) == pset(_near_dup_pairs(docs))
    assert pset(sim_s) == pset(_ngram_sim_pairs(docs))


@pytest.mark.parametrize("name", EXTENDED)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_harness import check_query

    report = check_query(spark, name, sf_dir)
    assert report["match"], report


def test_range_join_equals_naive_predicate_join(spark, sf_dir):
    """The bucketized range join must produce EXACTLY the pairs of the
    naive BETWEEN-predicate join (which plans as a nested loop — correct
    but unscalable; it is the semantic reference here)."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators.range_join import range_join
    from http_feeds_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("event_id", F.unix_micros("ts").alias("t"))
    hour_us = 3_600_000_000
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("ws"),
        (F.unix_micros("ts") + hour_us).alias("we"),
    )
    got = {
        (r.purchase_id, r.event_id)
        for r in range_join(pts, windows, "t", "ws", "we", hour_us).collect()
    }
    want = {
        (r.purchase_id, r.event_id)
        for r in pts.join(
            windows, (F.col("t") >= F.col("ws")) & (F.col("t") <= F.col("we"))
        ).collect()
    }
    assert got == want and len(got) > 0

    # an odd bucket width must not change the result (windows straddling
    # bucket boundaries replicate into both buckets)
    got_odd = {
        (r.purchase_id, r.event_id)
        for r in range_join(pts, windows, "t", "ws", "we", 777_000_001).collect()
    }
    assert got_odd == want


def test_hyper_rollup_exact_reaggregation(spark, sf_dir):
    """Daily served from the hourly rollup must EQUAL daily computed
    from raw events (mergeable partials make the hierarchy exact), and
    the materialized rollup must round-trip through its date-partitioned
    layout."""
    import tempfile

    from http_feeds_spark.operators import rollup as ru
    from http_feeds_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    def snap(df):
        return {
            (r.bucket_start, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value, r.avg_value)
            for r in df.collect()
        }

    from_raw = snap(ru.reaggregate(ru.rollup_aggregate(ev, "1 day"), "1 day"))
    from_rollup = snap(ru.reaggregate(ru.rollup_aggregate(ev, "1 hour"), "1 day"))
    assert from_rollup == from_raw and len(from_raw) > 0

    with tempfile.TemporaryDirectory() as tmp:
        ru.materialize_rollup(ev, f"{tmp}/rollup", "1 hour")
        stored = ru.read_rollup(spark, f"{tmp}/rollup")
        assert snap(ru.reaggregate(stored, "1 day")) == from_raw
        # far fewer rollup rows than raw events — the serving-cost win
        assert stored.count() < ev.count()


def test_compact_landing_zone(spark, sf_dir):
    """The maintenance rewrite preserves read-model semantics and seq
    positions (README.md:150-154, :181-192)."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.operators.maintenance import compact_landing_zone
    from http_feeds_spark.sources.tables import events_as_feed, load_table

    feed = events_as_feed(load_table(spark, sf_dir, "events"))
    with tempfile.TemporaryDirectory() as tmp:
        feed.write.parquet(f"{tmp}/landing")
        compacted = compact_landing_zone(spark, f"{tmp}/landing", f"{tmp}/compacted")

        # semantics: equals the query-side read model
        want = sorted(r.seq for r in ops.read_model(feed).collect())
        got = sorted(r.seq for r in compacted.collect())
        assert got == want

        # positions: a cursor pointing at a compacted-away event still
        # scans correctly (strictly-newer events only)
        cursor = 500
        after = sorted(r.seq for r in ops.offset_scan(compacted, cursor).collect())
        assert after == [s for s in got if s > cursor]

        # file-level pruning survives: seq range-partitioned output
        n_after = ops.offset_scan(compacted, cursor).count()
        assert n_after == len(after)


def test_compact_landing_zone_tombstone_horizon(spark):
    """Tombstone retention (README.md:279-292 + :154): the archive
    rewrite may physically drop a DELETE entry only once every consumer
    cursor is past it. Below-horizon tombstones vanish; above-horizon
    ones survive the rewrite so a mid-replay consumer still learns of
    the deletion."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators import feed as ops
    from http_feeds_spark.operators.maintenance import compact_landing_zone

    rows = [
        # (seq, subject, method)
        (1, "s1", None),       # PUT s1
        (2, "s2", None),       # PUT s2
        (3, "s1", "DELETE"),   # tombstone s1 — BELOW horizon
        (4, "s3", None),       # PUT s3
        (5, "s2", "DELETE"),   # tombstone s2 — ABOVE horizon
    ]
    feed = spark.createDataFrame(
        [
            (seq, f"id{seq}", "t", "src", None, subj, method, None, "{}")
            for seq, subj, method in rows
        ],
        "seq long, id string, type string, source string, time timestamp,"
        "subject string, method string, datacontenttype string, data string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        feed.write.parquet(f"{tmp}/landing")
        out = compact_landing_zone(
            spark, f"{tmp}/landing", f"{tmp}/compacted",
            tombstone_horizon_seq=4,
        )
        got = {(r.subject, r.seq, r.method) for r in out.collect()}
        # s1's tombstone (seq 3 <= 4): physically dropped; s1 gone entirely
        # s2's tombstone (seq 5 > 4): retained for mid-replay consumers
        assert got == {("s2", 5, "DELETE"), ("s3", 4, None)}

        # a consumer mid-replay (cursor=4) still sees the s2 deletion
        replay = ops.offset_scan(out, 4).collect()
        assert [(r.subject, r.method) for r in replay] == [("s2", "DELETE")]

        # horizon=None keeps the all-consumers-caught-up behavior
        out2 = compact_landing_zone(
            spark, f"{tmp}/landing", f"{tmp}/compacted2"
        )
        assert {(r.subject, r.seq) for r in out2.collect()} == {("s3", 4)}


def test_range_join_fractional_point_column(spark, sf_dir):
    """ADVICE r3: double point/bound columns must work (the exact `div`
    path applies only to integral types; fractional routes via floor)."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators.range_join import range_join
    from http_feeds_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000)
    pts = ev.select("event_id", F.col("value").alias("v"))  # double column
    windows = spark.range(10).select(
        F.col("id").alias("win_id"),
        (F.col("id") * 10.0).alias("lo"),
        (F.col("id") * 10.0 + 9.5).alias("hi"),
    )
    got = {
        (r.win_id, r.event_id)
        for r in range_join(pts, windows, "v", "lo", "hi", 7).collect()
    }
    want = {
        (r.win_id, r.event_id)
        for r in pts.join(
            windows, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert got == want and len(got) > 0


def test_tombstone_horizon_retains_null_seq_tombstones(spark):
    """A DELETE whose seq is null (opaque wire id — position unknown)
    can never be proven consumer-passed, so a horizon rewrite must
    RETAIN it; SQL three-valued logic would otherwise silently drop it
    (null <= horizon → null → filtered)."""
    from http_feeds_spark.operators import feed as ops

    feed = spark.createDataFrame(
        [
            (1, "id1", "s1", None),
            (None, "idX", "s2", "DELETE"),  # opaque-id tombstone
            (3, "id3", "s3", "DELETE"),     # positional, below horizon
        ],
        "seq long, id string, subject string, method string",
    )
    out = ops.drop_tombstoned(feed, horizon_seq=5)
    got = {(r.subject, r.method) for r in out.collect()}
    assert got == {("s1", None), ("s2", "DELETE")}  # null-seq DELETE kept


def test_lsh_tuner_matches_theory_and_engine_default(spark):
    """tune_bands: exact factorizations only, S-curve midpoint tracks
    the threshold at equal weights, and the engine's recall-heavy 16x2
    default for threshold 0.5 is recovered once missed near-dups cost
    ~5x a wasted verification."""
    from http_feeds_spark.functions import minhash as mh

    for thr, k in [(0.3, 32), (0.5, 32), (0.8, 32), (0.9, 64)]:
        b, r = mh.tune_bands(thr, k)
        assert b * r == k
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - thr) < 0.2, (thr, b, r, mid)
    assert mh.tune_bands(0.5, 32, fn_weight=5) == (16, 2)
    # the probability function itself (the MMDS identity)
    assert mh.lsh_probability(1.0, 16, 2) == 1.0
    assert mh.lsh_probability(0.0, 16, 2) == 0.0
    p = mh.lsh_probability(0.5, 16, 2)
    assert abs(p - (1 - (1 - 0.25) ** 16)) < 1e-12
