"""Deterministic mini k-means for IVF coarse quantization (SURVEY §2 D3b).

Lloyd's algorithm shaped for Spark at 100 TB:

- **Assignment is map-only**: the k centroids travel as ONE broadcast
  row holding an array of (cid, vector) structs; each row computes all k
  squared distances in a single projection and takes the argmin with
  ``array_min`` over (d2, cid) structs. No expansion join, no window, no
  shuffle.
- **Update is an aggregate, not a collect of data**: per-dimension sums
  come from ``posexplode`` + groupBy(cluster, dim) with map-side partial
  aggregation — the shuffle carries k×dim partial sums per partition,
  never vectors. The k×dim result (metadata, e.g. 16×64 doubles) is
  collected to build the next round's broadcast literals.
- **Deterministic end to end**: seeds are the k lowest-id vectors (no
  RNG), and the update sums run in DECIMAL so the means are independent
  of partition order — reruns and different cluster layouts give
  bit-identical centroids (the property recall tests rely on).

Iterations are a driver-side loop of fixed depth (each is one narrow
aggregate job) — the standard pattern for iterative refinement where the
model is small and the data is huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq_dist(a, b) -> Column:
    """Sequential double-precision squared L2 distance of two arrays."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _d(x: float) -> str:
    """One double as exact SQL-literal text (repr round-trip); non-finite
    values render through CAST so the parsed-literal path accepts the
    same domain F.lit did (a poisoned vector taints its cluster mean)."""
    import math

    x = float(x)
    if math.isfinite(x):
        return f"{x!r}D"
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    return f"CAST('{'Infinity' if x > 0 else '-Infinity'}' AS DOUBLE)"


def _model_array(centroids: list[tuple[int, list[float]]]) -> Column | None:
    """[(cid, vector), ...] with cid = 0..k-1 in order → ONE
    array<array<double>> literal column (index = cid + 1), or None when
    the fast form does not apply (non-contiguous cids, empty model, or
    non-finite values JSON cannot carry — callers fall back to
    :func:`_centroid_literal`).

    Why (r15, guide §1/§7.2): the parsed ``array(named_struct(...))``
    form builds a k×dim-node expression TREE. Catalyst constant-folds it
    to a single Literal before execution either way, but every query
    that embeds the model pays analysis + optimization + codegen of the
    whole tree first — measured 3-4 s of driver time per ANN search
    build at 16×64, with explain output in the 100-500 KB range. Routing
    the same doubles through ``from_json`` of ONE string literal yields
    the identical folded Literal from a 3-node tree: construction is one
    py4j call, analysis is O(1), and the executed plan (and results) are
    bit-identical — json.dumps/from_json round-trips doubles exactly
    like the ``repr`` literal path."""
    import json
    import math

    if not centroids or [cid for cid, _ in centroids] != list(range(len(centroids))):
        return None
    if any(not math.isfinite(float(x)) for _, vec in centroids for x in vec):
        return None
    payload = json.dumps([[float(x) for x in vec] for _, vec in centroids])
    return F.from_json(F.lit(payload), "array<array<double>>")


def _centroid_literal(centroids: list[tuple[int, list[float]]]) -> Column:
    """[(cid, vector), ...] → one array<struct<cid,cvec>> literal column.

    Built as ONE parsed SQL expression, not k×dim nested ``F.lit`` calls:
    every ``F.lit``/``F.array``/``F.struct`` is a py4j round trip, and at
    16×64 that chatter alone cost ~1.1s per invocation with another
    ~0.6s of per-node plan overhead (measured round 5: literal build
    1.07s→0.00s, downstream plan construction 1.00s→0.36s, assignments
    bit-identical — ``repr`` of a Python float is the shortest exact
    round-trip string and Spark's ``D`` literal parses it back to the
    same double). The batched-ANN query builds this literal four times
    (two training rounds, corpus assignment, query probes), so the py4j
    form dominated its wall time at small scale."""
    parts = ",".join(
        "named_struct('cid',{},'cvec',array({}))".format(
            int(cid), ",".join(_d(x) for x in vec)
        )
        for cid, vec in centroids
    )
    return F.expr(f"array({parts})")


def assign_clusters(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Map-only nearest-centroid assignment (see module docstring).

    The centroid model rides as one folded Literal (``_model_array``)
    when its cids are the contiguous 0..k-1 the trainer produces — the
    transform index IS the cid then; the parsed named_struct tree
    remains as fallback. Identical folded plan, identical results."""
    arr = _model_array(centroids)
    if arr is not None:
        best = F.array_min(
            F.transform(
                arr,
                lambda c, i: F.struct(
                    sq_dist(F.col(vec_col), c).alias("d2"), i.alias("cid")
                ),
            )
        )
    else:
        best = F.array_min(
            F.transform(
                _centroid_literal(centroids),
                lambda c: F.struct(sq_dist(F.col(vec_col), c["cvec"]).alias("d2"), c["cid"].alias("cid")),
            )
        )
    return emb.withColumn(out_col, best["cid"])


def kmeans_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """Train k centroids with `iters` Lloyd rounds; returns
    [(cid, vector), ...] with cid in [0, k). Deterministic (see module
    docstring); empty clusters keep their previous centroid."""
    seed_rows = (
        emb.orderBy(id_col).limit(k).select(vec_col).collect()
    )  # k vectors — model-sized, not data-sized
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seed_rows)]
    if not centroids:
        return []
    dim = len(centroids[0][1])
    for _ in range(iters):
        assigned = assign_clusters(emb, centroids, vec_col)
        sums = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("val").cast("decimal(28,10)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )  # k×dim rows of partial-sum metadata
        acc: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cluster, [0.0] * dim)[r.dim] = float(r.s)
            counts[r.cluster] = r.n
        centroids = [
            (cid, [v / counts[cid] for v in acc[cid]]) if cid in acc else (cid, prev)
            for cid, prev in centroids
        ]
    return centroids


def probe_clusters(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only per-QUERY probe-cluster assignment: the same broadcast
    centroid literals as assign_clusters, but keeping the `nprobe`
    nearest clusters (array_sort over (d2, cid) structs + slice +
    explode) instead of the single argmin. Output = input columns plus
    one `cluster` row per probed cluster — queries replicate nprobe×,
    corpus vectors not at all."""
    marr = _model_array(centroids)
    if marr is not None:
        arr = F.transform(
            marr,
            lambda c, i: F.struct(
                sq_dist(F.col(vec_col), c).alias("d2"), i.alias("cid")
            ),
        )
    else:
        arr = F.transform(
            _centroid_literal(centroids),
            lambda c: F.struct(
                sq_dist(F.col(vec_col), c["cvec"]).alias("d2"), c["cid"].alias("cid")
            ),
        )
    return (
        queries.withColumn("__probe", F.explode(F.slice(F.array_sort(arr), 1, nprobe)))
        .withColumn("cluster", F.col("__probe.cid"))
        .drop("__probe")
    )


def search_assigned(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF search over an ALREADY cluster-assigned corpus — the back half
    of :func:`ann_search_batch`, shared with the persisted-index path
    (operators/ann_index.py) where assignment happened at build time.

    `assigned` carries (id_col, vec_col, cluster). Plan shape at 100 TB:
    query probe assignment is map-only on the query table; the candidate
    join is `assigned ⋈ probes ON cluster` — with `broadcast_queries`
    (the common case: queries ≪ corpus) that is a broadcast hash join,
    so the CORPUS NEVER SHUFFLES; per-query top-k is a window over
    (qid, cosine) rows — ids + one double per candidate, vectors never
    ride the ranking exchange. For query sets too large to broadcast,
    set broadcast_queries=False: the join becomes a hash shuffle on
    `cluster` (corpus shuffles once — the unavoidable cost at that
    regime; consider raising nlist so cluster fan-out stays balanced)."""
    from pyspark.sql import Window

    assigned = assigned.select(F.col(id_col), F.col(vec_col).alias("__cv"), "cluster")
    probes = probe_clusters(
        queries.select(F.col(qid_col), F.col(vec_col).alias("__qv")),
        centroids,
        nprobe,
        "__qv",
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    from http_feeds_spark.functions import vectors as vec

    scored = assigned.join(probes, "cluster")
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(qid_col))
    scored = (
        scored.select(
            qid_col,
            id_col,
            vec.cosine("__cv", "__qv").alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ann_search_batch(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN for a query TABLE (SURVEY §2 D3 at production shape: many
    queries, not a driver-side loop). Returns (qid, id, cosine_sim, rank)
    with rank 1..k per query. Corpus assignment is map-only (broadcast
    centroid literals); see :func:`search_assigned` for the search half's
    plan shape.

    ``exclude_self`` (default True) drops candidates whose corpus id
    equals the query id — correct ONLY when queries are drawn from the
    corpus and share its id space (the self-match is a trivial cosine=1
    hit). For an EXTERNAL query table whose ids are unrelated to corpus
    ids, set ``exclude_self=False``: otherwise each query silently loses
    the corpus row that happens to collide with its query_id."""
    assigned = assign_clusters(corpus, centroids, vec_col)
    return search_assigned(
        assigned,
        queries,
        centroids,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        qid_col=qid_col,
        vec_col=vec_col,
        broadcast_queries=broadcast_queries,
        exclude_self=exclude_self,
    )
