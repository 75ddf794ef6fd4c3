"""Distributed connected components — duplicate-cluster closure at scale.

Near-dup pipelines (MinHash/SimHash/embedding LSH, queries/llm.py) emit
verified PAIRS; deduplication needs transitive CLOSURE (a~b, b~c ⇒
{a,b,c} is one cluster) plus one survivor per cluster. A driver-side
union-find over collected pairs caps out at driver memory — at 100 TB
the pair set is itself a big distributed table, so the closure must be
a shuffle algorithm.

This is the alternating large-star / small-star algorithm of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SoCC'14), expressed
in DataFrame ops:

- **large-star(u)**: connect every neighbor larger than u to the
  smallest node of Γ(u) ∪ {u};
- **small-star(u)**: over edges directed larger→smaller, connect all
  smaller neighbors (and u itself) to the minimum neighbor.

Each round = one partial-aggregated groupBy (per-node min) + one
equi-join per star, all on uniformly-hashed node ids; the edge set
contracts toward a star forest in O(log n) rounds with high probability
(the paper's bound; dedup graphs — short chains around clone clusters —
converge in 2-3). Nothing data-sized ever reaches the driver: the loop
control is ONE map-side-combined aggregate per round — (count,
order-independent hash-sum) of the new edge set — compared against the
previous round's pair; only when the cheap signature matches does the
definitive `exceptAll` set-equality check run (in practice exactly once,
on the final round). Lineage is truncated per round with localCheckpoint
so Catalyst never sees an unrolled multi-round plan.

Skew note: a mega-cluster funnels all its edges onto its minimum node.
The per-node min aggregation is map-side combined (hot key cost ≈ one
long per upstream partition), and the m-join's build side is one row
per node, so the hot root costs one fat-but-linear partition — the
algorithm's known behavior, not a quadratic blowup; AQE skew-split
handles the residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over larger→smaller directed edges (u > v).

    Emits (w, m) for every neighbor w of u with w > u, where m is the
    minimum of Γ(u) ∪ {u}; output stays larger→smaller directed."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over larger→smaller directed edges (u > v).

    For each u, connects every smaller neighbor (and u itself) to the
    minimum smaller neighbor; output stays larger→smaller directed."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        e.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = m.select("u", F.col("m").alias("v"))
    return relink.union(self_link).where(F.col("u") != F.col("v")).distinct()


DRIVER_EDGE_THRESHOLD = 1_000_000  # ids-only pairs ⇒ ≤ ~16 MB collected


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 25,
    driver_threshold: int = DRIVER_EDGE_THRESHOLD,
) -> DataFrame:
    """Label every node of an undirected edge list with its component id.

    Returns ``(node, component)`` with one row per distinct node that
    appears in a NON-self-loop edge (including component roots, which map
    to themselves); ``component`` is the MINIMUM node id of the
    component — i.e. directly the min-id survivor of a duplicate
    cluster. Input direction, self-loops, and duplicate edges are all
    tolerated, but nodes appearing ONLY in self-loop edges (u == v) get
    no output row: a self-pair carries no dedup information, and such
    docs pass through `dedup_corpus` untouched exactly like unpaired
    ones (pinned in tests/test_components.py).

    Raises RuntimeError if the star forest has not stabilized after
    `max_iterations` alternating rounds (the O(log n) bound makes this a
    bug trap, not a tuning knob).

    **Adaptive small-graph path**: after the dedup projection, if the
    ids-only edge count is ≤ ``driver_threshold`` the closure runs as a
    driver-side union-find on the collected pairs instead of the star
    rounds. This is the same adaptivity argument AQE makes: the edge
    LIST is already the model here (two ids per row — 1M edges ≈ 16 MB,
    a bounded, size-checked collect), and each distributed round costs
    several scheduled jobs that dominate wall time when the graph is
    small, which near-dup edge sets usually are even when the CORPUS is
    huge (edges ∝ duplicates, not documents). The distributed path is
    untouched above the threshold; both paths are pinned identical on
    the same graphs in tests/test_components.py, and round-bound tests
    force ``driver_threshold=0``.

    ``driver_threshold=0`` DISABLES the driver path entirely (no
    limit-collect is even attempted; every graph — including an empty
    edge set — runs the distributed loop). This is deliberate: 0 is the
    "force the distributed path" switch the round-bound tests rely on,
    not a size bound of zero.
    """

    def _sig(df: DataFrame) -> tuple:
        # one job, map-side combined: row count + order-independent sum of
        # per-edge hashes (DECIMAL so ANSI mode never overflows). Equal
        # signatures on distinct-deduped sets ⇒ equal sets (mod a ~2^-64
        # hash collision — the definitive exceptAll below closes that).
        return tuple(
            df.agg(
                F.count("*"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).first()
        )

    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # r15 (guide §1 job audit): decide the adaptive path with ONE
    # limit-collect instead of a full count job followed by a second
    # collect — ≤ threshold+1 ids-only rows come back (the same driver
    # bound the old path paid); when the graph is bigger, the
    # short-circuiting limit pull is cheap and the distributed loop
    # computes its signature as before.
    rows = (
        e.limit(driver_threshold + 1).collect() if driver_threshold > 0 else None
    )
    if rows is not None and len(rows) <= driver_threshold:
        from pyspark.sql import types as T
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            u, v = row.u, row.v
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union-by-min: the surviving root IS the min id
                parent[max(ru, rv)] = min(ru, rv)
        node_t = e.schema["u"].dataType
        schema = T.StructType(
            [T.StructField("node", node_t), T.StructField("component", node_t)]
        )
        return edges.sparkSession.createDataFrame(
            [(n, find(n)) for n in parent], schema
        )
    prev = _sig(e)
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        sig = _sig(nxt)
        # cheap per-round signal first; definitive set-equality only when
        # it matches (both sides distinct ⇒ empty one-sided diff suffices)
        if sig == prev and nxt.exceptAll(e).isEmpty():
            e = nxt
            break
        prev, e = sig, nxt
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return members.union(roots).distinct()


def incremental_components(
    prior: DataFrame,
    new_edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Incremental closure: fold a NEW batch of near-dup pairs into a
    prior ``(node, component)`` assignment without re-deriving the old
    pairs.

    At 100 TB with streaming appends, re-running LSH + closure over the
    full corpus per batch is the scale-killer; the prior assignment is
    already a contracted star forest, and stars preserve connectivity
    exactly — so feeding ``node—component`` edges (the prior rows) plus
    the new pairs back into the SAME loop yields the identical result as
    a full recompute over (old ∪ new) pairs (pinned in
    tests/test_components.py), while the loop starts from depth ≤ 1
    instead of raw chains. Cross-batch merges (a new pair bridging two
    prior clusters) relabel both to the global minimum, exactly as a
    full recompute would. Root self-rows (node == component) become
    self-loops and drop out harmlessly — root membership rides on its
    members' star edges; a prior cluster is never root-only.
    """
    prior_edges = prior.select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    return connected_components(
        prior_edges.unionByName(new_edges.select(src, dst)), src=src, dst=dst
    )


def dedup_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Filter a corpus to one survivor per near-duplicate cluster.

    `pairs` is a verified near-dup pair list (e.g. q_llm_dedup_near's
    output); the survivor of each cluster is its minimum id. Docs in no
    cluster pass through untouched — the anti-join only carries the
    (loser-id) side, never document payloads, so at 100 TB the exchange
    is ids-only."""
    losers = (
        connected_components(pairs, src=src, dst=dst)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
