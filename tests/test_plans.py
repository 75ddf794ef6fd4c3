"""Physical-plan guards: the properties that keep these queries fast at
100 TB must be visible in the executed plan — filters pushed to the scan,
small dims broadcast, top-k as TakeOrderedAndProject, partial aggregation
before the shuffle. A regression here is a scale bug even when results
stay correct. (Assertions via http_feeds_spark.plans.)"""

from __future__ import annotations

from http_feeds_spark import plans


def q(spark, name, sf_dir):
    from http_feeds_spark.queries import registry

    return registry()[name].fn(spark, sf_dir)


def test_filter_pushdown(spark, sf_dir):
    df = q(spark, "q_filter", sf_dir)
    assert plans.has_pushed_filters(df)
    p = plans.executed_plan(df)
    assert "GreaterThanOrEqual(l_shipdate" in p or "IsNotNull(l_shipdate)" in p


def test_projection_prunes_scan(spark, sf_dir):
    p = plans.executed_plan(q(spark, "q_project", sf_dir))
    assert "ReadSchema" in p
    # only the referenced columns reach the scan
    assert "l_extendedprice" in p and "l_tax" not in p


def test_broadcast_join(spark, sf_dir):
    assert plans.is_broadcast_join(q(spark, "q_join_broadcast", sf_dir))


def test_topk_is_take_ordered(spark, sf_dir):
    assert plans.is_take_ordered(q(spark, "q_topk", sf_dir))


def test_agg_has_partial_phase(spark, sf_dir):
    assert plans.has_partial_aggregation(q(spark, "q_agg_group", sf_dir))


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in plans.executed_plan(q(spark, "q_join_semi", sf_dir))
    assert "LeftAnti" in plans.executed_plan(q(spark, "q_join_anti", sf_dir))


def test_compaction_single_shuffle(spark, sf_dir):
    """Latest-per-subject must shuffle exactly once (on the key) — no
    extra exchanges."""
    assert plans.shuffle_count(q(spark, "q_compaction", sf_dir)) == 1


def test_compaction_is_partial_aggregable(spark, sf_dir):
    """r10 skew robustness: compaction is max_by — PARTIAL aggregation
    runs before the key exchange, so each task ships one candidate row
    per subject it saw and a hot subject (10⁹ updates of one aggregate)
    can no longer serialize a single reducer the way the old
    row_number window did (which shipped and sorted EVERY row of a
    subject on one task)."""
    for name in ("q_compaction", "q_read_model"):
        p = plans.executed_plan(q(spark, name, sf_dir))
        assert "partial_max_by" in p, (name, p)
        assert "row_number" not in p, (name, p)


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    assert plans.uses_whole_stage_codegen(q(spark, "q_agg_group", sf_dir))


def test_mint_seq_no_global_sort(spark, sf_dir):
    """mint_seq must never collapse to a single-reducer sort: the rank is
    assigned per time-bucket slice + cumulative base, so the plan has a
    balanced hash exchange on the bucket but no SinglePartition
    exchange."""
    df = q(spark, "q_event_order", sf_dir)
    p = plans.executed_plan(df)
    assert "Exchange SinglePartition" not in p, p
    assert "hashpartitioning(__bkt" in p  # the per-slice rank shape


def test_landing_zone_partition_pruning(spark, sf_dir):
    """A date filter on the landing zone must prune directories at plan
    time (PartitionFilters), and a seq cursor must reach the parquet scan
    (PushedFilters) — the two predicates that make offset scans cheap at
    100 TB."""
    import tempfile

    from pyspark.sql import functions as F

    from http_feeds_spark.operators import maintenance
    from http_feeds_spark.sources.tables import events_as_feed, load_table

    feed = events_as_feed(load_table(spark, sf_dir, "events"))
    with tempfile.TemporaryDirectory() as tmp:
        maintenance.write_landing_zone(feed, f"{tmp}/zone", files_per_date=2)
        zone = maintenance.read_landing_zone(spark, f"{tmp}/zone")

        a_date = feed.select(F.to_date("time").alias("d")).first()["d"]
        day = zone.filter(F.col("event_date") == F.lit(a_date))
        p = plans.executed_plan(day.filter(F.col("seq") > 10))
        assert "PartitionFilters" in p and "event_date" in p.split("PartitionFilters", 1)[1][:200], p
        assert "PushedFilters" in p and "GreaterThan(seq,10)" in p, p

        # the archive round-trips the feed exactly
        assert zone.count() == feed.count()
        n_day = feed.filter(F.to_date("time") == F.lit(a_date)).count()
        assert day.count() == n_day


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts must
    join with NO exchange on either side — the write-time shuffle
    replaces every per-query shuffle (the 100 TB co-location story)."""
    import tempfile

    from pyspark.sql import functions as F

    from http_feeds_spark.operators import bucketing
    from http_feeds_spark.sources.tables import load_table

    with tempfile.TemporaryDirectory() as tmp:
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        bucketing.write_bucketed(orders, "orders_b", f"{tmp}/orders_b", "o_custkey", 8)
        bucketing.write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "customer_b", f"{tmp}/customer_b", "o_custkey", 8,
        )
        try:
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = bucketing.read_bucketed(spark, "orders_b").join(
                    bucketing.read_bucketed(spark, "customer_b"), "o_custkey"
                )
                p = plans.executed_plan(joined)
                assert "SortMergeJoin" in p, p
                assert "Exchange" not in p, p
                # and it computes the same rows as the plain join
                n_plain = orders.join(
                    customer, orders.o_custkey == customer.c_custkey
                ).count()
                assert joined.count() == n_plain
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        finally:
            spark.sql("DROP TABLE IF EXISTS orders_b")
            spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """salted_join must equal the plain join and spread the hot key's
    rows across multiple salt values (the skew-mitigation contract)."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators.skew import salted_join
    from http_feeds_spark.sources.tables import load_table

    # manufacture skew: point 30% of orders at custkey 1
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(1)).otherwise(F.col("o_custkey")),
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = salted_join(orders, customer, "o_custkey", [1], "o_orderkey", buckets=8)
    plain = orders.join(customer, "o_custkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("o_custkey").count().filter("o_custkey = 1").collect()
    b = plain.groupBy("o_custkey").count().filter("o_custkey = 1").collect()
    assert a[0]["count"] == b[0]["count"] and a[0]["count"] > 0
    # empty hot-key list degrades to the plain join (no untyped-array
    # analysis failure)
    unsalted = salted_join(orders, customer, "o_custkey", [], "o_orderkey")
    assert unsalted.count() == plain.count()


def test_pack_two_pass_no_global_window(spark, sf_dir):
    """pack_into_bins must run the distributed two-pass running sum: its
    Window is partitioned on the bucket id (balanced hash exchange on
    __pbkt) — never the global no-partition Window, whose plan collapses
    the whole dataset onto ONE task via an Exchange SinglePartition."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import sampling as smp
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tx.words("text")).alias("n_tokens")
    )
    packed = smp.pack_into_bins(d, "n_tokens", budget=2048)
    root = pi.physical_root(packed)
    wins = pi.find_nodes(root, lambda n: n == "Window")
    assert wins, pi.subtree_names(root)
    for w in wins:
        assert "__pbkt" in pi.node_line(w), pi.node_line(w)
    for e in pi.find_nodes(root, lambda n: n == "Exchange"):
        assert "SinglePartition" not in pi.node_line(e), pi.node_line(e)


def test_decontaminate_fp_equi_join_after_stop_fp(spark, sf_dir):
    """decontaminate's data-sized joins must all be EQUI-joins keyed on
    the fingerprint hash `fp` (never nested-loop/cartesian — the shape a
    raw overlap predicate would plan), with the stop-fingerprint
    aggregate present beneath them to cap hot-key fan-out."""
    df = q(spark, "q_llm_decontaminate", sf_dir)
    from http_feeds_spark.plans import inspect as pi

    root = plans.physical_root(df)
    names = plans.subtree_names(root)
    assert not any("Cartesian" in n or "NestedLoop" in n for n in names), names
    joins = pi.find_nodes(
        root, lambda n: n.endswith("HashJoin") or n == "SortMergeJoin"
    )
    # the stop-fp df-filter join and the test⋈train contamination join
    # key on fp; the winnowing re-join (r9 exploded formulation) and the
    # corpus anti-join key on the doc id — every one an equi-join
    fp_joins = [j for j in joins if "fp#" in pi.node_line(j)]
    assert len(fp_joins) >= 2, names
    assert "HashAggregate" in names, names  # the stop-fp document-freq agg


def test_local_top_items_bounds_shuffle_input(spark, sf_dir):
    """The heavy-hitter candidate stage must put at most per_partition
    rows per TASK into the distinct's shuffle — counted directly on the
    mapInPandas stage output — and the full operator's plan is that
    mapInPandas stage plus the distinct, nothing else."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import sketch as sk
    from http_feeds_spark.functions import text as tx
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tx.words(F.lower("text"))).alias("word")
    )
    m = 16
    cands = sk.local_top_candidates(toks, "word", per_partition=m)
    per_task = (
        cands.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert per_task and max(r["count"] for r in per_task) <= m, per_task

    out = sk.local_top_items(toks, "word", per_partition=m)
    names = plans.subtree_names(plans.physical_root(out))
    assert any("MapInPandas" in n for n in names), names
    n_parts = toks.select(F.spark_partition_id().alias("p")).distinct().count()
    assert out.count() <= m * n_parts


def test_ann_ivf_assignment_map_only(spark, sf_dir):
    """IVF cluster assignment must be map-only: every join in the plan is
    a broadcast (1-row centroid array / 4-row probe list / query vector),
    so the corpus is never hash-shuffled before the final top-k."""
    p = plans.executed_plan(q(spark, "q_llm_ann_ivf", sf_dir))
    assert plans.shuffle_count(q(spark, "q_llm_ann_ivf", sf_dir)) == 0, p
    assert "row_number" not in p  # the old windowed-argmin shape

def test_repetition_and_pii_are_shuffle_free(spark, sf_dir):
    """Both per-row filter families claim "map-only, scan-parallel" in
    SCALING.md — their plans must carry ZERO exchanges of any kind."""
    from http_feeds_spark.plans import inspect as pi

    for name in ("q_llm_repetition", "q_llm_pii"):
        root = pi.physical_root(q(spark, name, sf_dir))
        names = pi.subtree_names(root)
        # the planted-docs union is a local union of a parallelized list —
        # still no Exchange anywhere
        assert not any(n.startswith("Exchange") for n in names), (name, names)


def test_semantic_pairs_equi_join_on_cluster(spark, sf_dir):
    """SemDeDup's candidate stage must plan as an EQUI-join keyed on the
    cluster id — never a cartesian/nested-loop (the shape a raw cosine
    predicate over all pairs would produce): this join shape IS the
    O(N²/k) cost model."""
    from pyspark.sql import functions as F

    from http_feeds_spark.functions import kmeans as km
    from http_feeds_spark.operators import semdedup as sd
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = km.kmeans_centroids(emb, k=8, iters=1)
    pairs = sd.semantic_pairs(emb, cents, threshold=0.9)
    root = pi.physical_root(pairs)
    names = pi.subtree_names(root)
    assert not any("Cartesian" in n or "NestedLoop" in n for n in names), names
    joins = pi.find_nodes(
        root, lambda n: n.endswith("HashJoin") or n == "SortMergeJoin"
    )
    assert joins, names
    assert any("cluster#" in pi.node_line(j) for j in joins), [
        pi.node_line(j) for j in joins
    ]


def test_pq_search_scans_only_codes_with_partition_filter(spark, sf_dir):
    """The compressed tier's benched number must mean "PQ search": the
    corpus-sized scan is the CODES store and it carries the probed
    clusters as a PartitionFilter (only probed cluster=N/ dirs are
    read); the probe join is a broadcast (codes never shuffle); and no
    sort-merge/cartesian shape anywhere. The embeddings table may
    appear only as the small query-vector source."""
    from http_feeds_spark.plans import inspect as pi

    df = q(spark, "q_llm_ann_pq", sf_dir)
    root = pi.physical_root(df)
    p = plans.executed_plan(df)
    # the chunk of the plan describing the codes scan carries the
    # cluster partition filter
    chunks = [c for c in p.split("Scan parquet") if "/codes" in c[:2000]]
    assert chunks, p
    assert any(
        "PartitionFilters" in c and "cluster" in c.split("PartitionFilters", 1)[1][:200]
        for c in chunks
    ), p
    names = pi.subtree_names(root)
    assert any("BroadcastHashJoin" in n or "BroadcastNestedLoopJoin" in n for n in names), names
    assert not any("SortMergeJoin" in n or "Cartesian" in n for n in names), names


def test_substr_scrub_regroups_only_affected_docs(spark, sf_dir):
    """scrub_duplicated_spans' expensive branch (posexplode + ordered
    regroup) must be gated behind the affected-ids SEMI join: the
    collect_list aggregate's subtree contains a LeftSemi, and the
    untouched majority short-circuits through a LeftAnti union arm —
    that is the 'cost scales with affected docs' claim, in the plan."""
    from http_feeds_spark.plans import inspect as pi

    df = q(spark, "q_llm_substr_scrub", sf_dir)
    root = pi.physical_root(df)
    aggs = [
        a
        for a in pi.find_nodes(root, lambda n: "Aggregate" in n)
        if "collect_list" in pi.node_line(a, 400)
    ]
    assert aggs, pi.subtree_names(root)
    for a in aggs:
        sub = pi.subtree_names(a)
        lines = [
            pi.node_line(n)
            for n in pi.find_nodes(a, lambda n: "Join" in n)
        ]
        assert any("LeftSemi" in ln for ln in lines), (sub, lines)
    all_joins = [
        pi.node_line(n) for n in pi.find_nodes(root, lambda n: "Join" in n)
    ]
    assert any("LeftAnti" in ln for ln in all_joins), all_joins


def test_history_scd2_single_exchange(spark, sf_dir):
    """The SCD-2 temporal read model is ONE window over the subject key:
    exactly one exchange (the hash partitioning on subject), never a
    second shuffle or a SinglePartition collapse."""
    df = q(spark, "q_history_scd2", sf_dir)
    assert plans.shuffle_count(df) == 1, plans.executed_plan(df)
    p = plans.executed_plan(df)
    assert "Exchange SinglePartition" not in p, p


def test_erasure_filter_is_noop_until_a_ledger_exists(spark, sf_dir, tmp_path):
    """The 'costs nothing until an erasure happens' claim, in the plan:
    with no ledger the store read paths plan ZERO anti-joins; the moment
    one erase batch commits, the same search plans exactly one LeftAnti
    against the ids-only ledger."""
    from pyspark.sql import functions as F

    from http_feeds_spark.operators import ann_index as ai
    from http_feeds_spark.operators import erasure
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root = str(tmp_path / "ann")
    ai.build_index(spark, emb, root, k=8, iters=1)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def anti_joins(df):
        return [
            pi.node_line(n)
            for n in pi.find_nodes(pi.physical_root(df), lambda n: "Join" in n)
            if "LeftAnti" in pi.node_line(n)
        ]

    clean = ai.search(spark, queries, root, k=3, nprobe=8)
    assert anti_joins(clean) == [], anti_joins(clean)

    erasure.erase_ids(spark, root, spark.createDataFrame([(0,)], "id long"))
    filtered = ai.search(spark, queries, root, k=3, nprobe=8)
    assert len(anti_joins(filtered)) == 1, anti_joins(filtered)


def test_phrase_search_prunes_buckets_no_cartesian(spark, sf_dir, tmp_path):
    """Phrase retrieval must read only the phrase terms' hash buckets
    (partition filter on every posting scan) and narrow candidates by
    doc_id EQUI-joins — never a cartesian/nested-loop."""
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    df = ti.phrase_search(spark, root, ["the", "data", "filter"], k=10)
    p = plans.executed_plan(df)
    chunks = p.split("Scan parquet")[1:]
    post_chunks = [c for c in chunks if "positions" in c[:2000]]
    assert post_chunks, p
    for c in post_chunks:
        seg = c.split("PartitionFilters", 1)
        assert len(seg) == 2 and "bucket" in seg[1][:200], c[:600]
    names = pi.subtree_names(pi.physical_root(df))
    assert not any("Cartesian" in n or "NestedLoop" in n for n in names), names


def test_proximity_search_prunes_buckets_no_cartesian(spark, sf_dir, tmp_path):
    """Proximity retrieval keeps phrase_search's plan shape: every
    posting scan carries a bucket partition filter, candidates narrow by
    doc_id EQUI-joins, the greedy walk is in-plan array algebra (no
    Python UDF stage), and no cartesian/nested-loop appears."""
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    df = ti.proximity_search(spark, root, ["the", "data", "filter"], slop=2, k=10)
    p = plans.executed_plan(df)
    chunks = p.split("Scan parquet")[1:]
    post_chunks = [c for c in chunks if "positions" in c[:2000]]
    assert post_chunks, p
    for c in post_chunks:
        seg = c.split("PartitionFilters", 1)
        assert len(seg) == 2 and "bucket" in seg[1][:200], c[:600]
    names = pi.subtree_names(pi.physical_root(df))
    assert not any("Cartesian" in n or "NestedLoop" in n for n in names), names
    assert not any("Python" in n and "Eval" in n for n in names), names


def test_proximity_any_single_doc_exchange_no_cartesian(spark, sf_dir, tmp_path):
    """Unordered proximity: bucket partition filters on every posting
    scan, candidates narrowed by semi-joins, the sweep's windows share
    ONE doc_id hash partitioning, no cartesian and no Python stage."""
    from http_feeds_spark.operators import text_index as ti
    from http_feeds_spark.plans import inspect as pi
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "ti")
    ti.build_text_index(spark, docs, root)
    df = ti.proximity_search_any(
        spark, root, ["the", "data", "filter"], slop=2, k=10
    )
    p = plans.executed_plan(df)
    chunks = p.split("Scan parquet")[1:]
    post_chunks = [c for c in chunks if "positions" in c[:2000]]
    assert post_chunks, p
    for c in post_chunks:
        seg = c.split("PartitionFilters", 1)
        assert len(seg) == 2 and "bucket" in seg[1][:200], c[:600]
    names = pi.subtree_names(pi.physical_root(df))
    assert not any("Cartesian" in n or "NestedLoop" in n for n in names), names
    assert not any("Python" in n and "Eval" in n for n in names), names
    # the m running-max windows must collapse into ONE Window node over
    # one doc_id exchange (the second Window is the post-limit rank over
    # <= k rows), not m chained exchanges
    assert sum(1 for n in names if n.startswith("Window")) == 2, names


def test_postings_build_tokenizes_per_document_not_per_token(spark, sf_dir):
    """The posting-build explode must compute dl in a Project BELOW the
    Generate. The one-select shape (size(analyze(..)) next to
    posexplode(analyze(..))) hoists size() above the Generate, where
    Catalyst re-evaluates the WHOLE tokenization once per EXPLODED row —
    ~dl× per document; under standard_porter it materializes a SECOND
    ArrowEvalPython stage re-running the stemmer per exploded row.
    Measured ~8× the whole 50K-doc build (232s → 30s) and the porter
    build went from tens of minutes to 20s. Guard: the Generate's output
    carries only (doc_id, dl, pos, term) — no tokenization above it —
    and the porter plan holds at most the two per-DOCUMENT Python stages
    (the real one + InferFiltersFromGenerate's pushed size>0 filter)."""
    from http_feeds_spark.operators.text_index import _exploded_postings
    from http_feeds_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # standard: the Generate line must carry dl as a bound REFERENCE
    # (computed below), never re-derive it from the text above
    p = plans.executed_plan(_exploded_postings(docs))
    gen = [ln for ln in p.splitlines() if "Generate posexplode" in ln]
    assert len(gen) == 1, p
    assert "regexp_extract_all" not in gen[0], gen[0]
    above = p.split("Generate posexplode")[0]
    assert "regexp_extract_all" not in above, above

    # porter: token-multiplied Python stages would show as an
    # ArrowEvalPython ABOVE the Generate; both stages must sit below
    p = plans.executed_plan(_exploded_postings(docs, analyzer="standard_porter"))
    assert p.count("ArrowEvalPython") <= 2, p
    above = p.split("Generate posexplode")[0]
    assert "ArrowEvalPython" not in above, above
