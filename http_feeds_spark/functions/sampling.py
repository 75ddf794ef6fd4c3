"""Deterministic sampling, splitting, and shuffling — the corpus-plumbing
staples of a training-data pipeline.

Everything here is VALUE-hash based (``xxhash64(id, seed)``), never
RNG-based: the same row lands in the same split/sample on every run, on
any cluster layout, at any partition count — the property training
reproducibility actually needs. Spark's ``df.sample`` is seeded per
partition, so a repartition silently reshuffles membership; these
operators are immune by construction, and they are pure map-side
projections (no shuffle, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bucket resolution for split thresholds: 1e6 buckets → weight granularity
# of 1e-6, plenty below any statistically meaningful split imbalance
_BUCKETS = 1_000_000


def hash_bucket(id_col, seed: int = 0, buckets: int = _BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from the id value."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(buckets)).cast("long")


def with_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. train/val/test).

    Splits are disjoint and exhaustive by construction: the id's hash
    bucket falls into one interval of the cumulative weight partition.
    Weights must sum to ~1.0 (validated); changing `seed` re-draws the
    whole partition, adding rows never moves existing ones.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # last split takes the remainder — exhaustive even under rounding
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~`fraction` of rows, membership stable across runs and
    repartitions (unlike ``df.sample``, whose per-partition RNG reshuffles
    membership when the layout changes)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(id_col, seed) < int(fraction * _BUCKETS))


def shuffled_for_training(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """Deterministic pseudorandom global order — "shuffle the corpus" for
    training epochs; a different seed gives a different but reproducible
    epoch order. One range exchange + sort (what a global orderBy costs);
    ties impossible because the id breaks them."""
    return df.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))


def resample_to_mixture(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Downsample to a target domain mixture: keep the LARGEST corpus
    whose per-source proportions match `weights` (training-data "domain
    reweighting" without upsampling — no row is ever duplicated).

    With per-source counts c_s and target shares w_s (sum ≈ 1), the
    largest achievable mixture size is T = min_s(c_s / w_s); each source
    keeps the fraction (w_s · T) / c_s — exactly 1.0 for the binding
    (scarcest-relative-to-target) source, less for the rest. Membership
    is the same value-hash rule as :func:`deterministic_sample`, so the
    kept set is stable across reruns, repartitions and cluster layouts,
    and is a strict subset of the input per source.

    Sources absent from `weights` are dropped (weight 0); a source named
    in `weights` with NO rows makes the mixture unattainable — that is
    an error, not a silent skew. Scale shape: one small aggregate
    (|sources| rows of driver metadata — model-sized, like the kmeans
    centroid collect) plus one map-only filter; no data shuffle."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"mixture weights must sum to 1.0, got {total}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be positive (omit a source to drop it)")
    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"mixture names sources with no rows: {missing}")
    t_max = min(counts[s] / w for s, w in weights.items())
    bucket = hash_bucket(id_col, seed)
    expr = None
    for s, w in sorted(weights.items()):
        keep = min(1.0, (w * t_max) / counts[s])
        cond = (F.col(source_col) == s) & (bucket < int(keep * _BUCKETS))
        expr = cond if expr is None else expr | cond
    return df.filter(expr)


def pack_into_bins(
    df: DataFrame,
    size_col: str,
    budget: int,
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "bin",
    order_col: str | None = None,
) -> DataFrame:
    """Sequence packing: assign documents to fixed-budget bins (context
    windows) by OFFSET — each doc's bin is where its start offset lands
    in the virtual concatenation of the seed-shuffled corpus:

        bin = floor((running_sum − size) / budget)

    One window over the deterministic shuffle order (a single range
    exchange — the same cost as the epoch shuffle itself, and the two
    compose: pack the order you train in). Offset packing is the
    streaming-concatenation semantics most LLM data loaders implement
    (docs crossing a boundary belong to the bin where they start, bins
    overflow by at most one tail doc); exact greedy close-when-full
    packing needs sequential state and belongs in the loader, not the
    engine. Deterministic end to end: same corpus + seed ⇒ identical
    bins. The math is plain ANSI window arithmetic — DuckDB-parity
    pinned in tests.

    ``order_col`` overrides the shuffle order with an explicit column
    (e.g. curriculum order, or a plain id order for engine-parity
    checks); default is the seeded epoch-shuffle order. The order key
    must be NUMERIC (validated): the bucket boundaries come from a
    percentile sketch over it. A non-numeric curriculum ranking should
    be materialized as its numeric rank first — hashing it here instead
    would silently destroy the very order the caller asked to pack by.

    Scale shape: a naive global running-sum window
    (``Window.orderBy`` with no partitionBy) collapses the whole
    dataset onto ONE task — a single-executor sort that dies at scale.
    This runs the distributed two-pass form instead (the mint_seq
    zipWithIndex shape, operators/feed.py): (1) approximate order-key
    bucket boundaries from one small percentile aggregate, (2) per-
    bucket size totals → cumulative base offsets (≤N rows of driver
    metadata), (3) per-bucket running sum + base under one balanced
    hash exchange on the bucket id. Identical output to the global
    window — equal order keys always share a bucket, so concatenating
    buckets in order IS the global order.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    parts = spark.sparkContext.defaultParallelism
    if order_col is None:
        key = F.xxhash64(F.col(id_col), F.lit(seed))
        # The default order key is a full-range 64-bit hash — uniform by
        # construction — so equi-spaced cuts bucket it as evenly as a
        # percentile sketch would, WITHOUT the sketch's full pass over
        # the input chain (r16, guide §1.2 "remove passes outright": at
        # pipeline tail this was one extra execution of the whole
        # upstream lineage). Bucketing is plumbing for the distributed
        # running sum: any monotone bucketing of the order key yields
        # the identical global concatenation, so bins are byte-identical
        # to the sketch form (determinism + parity pinned in tests).
        step = (1 << 64) // max(parts, 1)
        cuts = [(-(1 << 63)) + i * step for i in range(1, parts)]
    else:
        from pyspark.sql.types import NumericType

        dt = df.select(F.col(order_col).alias("__k")).schema[0].dataType
        if not isinstance(dt, NumericType):
            raise TypeError(
                f"pack_into_bins order_col {order_col!r} has type "
                f"{dt.simpleString()}; the two-pass bucketing needs a "
                "NUMERIC order key (materialize the ranking as a numeric "
                "rank column first)"
            )
        key = F.col(order_col)
        # explicit order keys have no known distribution — keep the
        # percentile sketch (one small aggregate) for balanced buckets
        fracs = [i / parts for i in range(1, parts)]
        cuts = (
            df.agg(F.percentile_approx(key, fracs).alias("qs")).collect()[0]["qs"]
            if fracs
            else []
        ) or []
    bounds = sorted(set(cuts))
    bkt = F.lit(0)
    for b in bounds:
        bkt = bkt + (key > F.lit(b)).cast("int")
    # one snapshot for the two passes: the per-bucket counts collected
    # below and the final running-sum join must see the SAME rows and
    # bucket assignment — a nondeterministic upstream recomputed across
    # the two jobs would give base offsets that disagree with the data.
    # The per-bucket size totals RIDE the snapshot job as observed
    # metrics (r16, guide §1/§2.4: the separate groupBy-collect was one
    # extra scheduled job per pack call over data the checkpoint already
    # scans): bucket count is bounded (|bounds|+1 ≤ defaultParallelism),
    # so one conditional sum per bucket is a fixed-width CollectMetrics
    # row, identical totals to the groupBy form.
    from pyspark.sql import Observation

    obs = Observation()
    n_bkts = len(bounds) + 1
    metrics = []
    for b in range(n_bkts):
        hit = F.col("__pbkt") == b
        metrics.append(
            F.sum(F.when(hit, F.col(size_col)).otherwise(F.lit(0))).alias(f"s{b}")
        )
        # presence, not just totals: a bucket whose rows all have size 0
        # must still reach base_df (the running-sum join is inner)
        metrics.append(F.sum(hit.cast("long")).alias(f"n{b}"))
    bucketed = (
        df.withColumn("__pk", key)
        .withColumn("__pbkt", bkt)
        .observe(obs, *metrics)
        .localCheckpoint()
    )
    got = obs.get
    counts = {
        b: got[f"s{b}"] for b in range(n_bkts) if (got[f"n{b}"] or 0) > 0
    }
    bases, acc = [], 0
    for bucket in sorted(counts):
        bases.append((bucket, acc))
        acc += counts[bucket]
    base_df = spark.createDataFrame(bases or [(0, 0)], "__pbkt int, __pbase long")
    w = (
        Window.partitionBy("__pbkt")
        .orderBy(F.col("__pk"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.col("__pbase") + F.sum(F.col(size_col)).over(w)
    return (
        bucketed.join(F.broadcast(base_df), "__pbkt")
        .withColumn(
            out_col,
            F.floor((running - F.col(size_col)) / F.lit(budget)).cast("long"),
        )
        .drop("__pk", "__pbkt", "__pbase")
    )


def stratified_sample_exact(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, membership
    deterministic and stable across runs/layouts — the per-group
    counterpart of deterministic_sample (which is per-ROW Bernoulli:
    right at corpus scale, wrong when a quota per stratum is the
    contract, e.g. "1000 eval docs per language").

    Selection = the k lowest xxhash64(id, seed) per group: one
    hash-ranked window (single shuffle on the group key) — the standard
    distributed equivalent of per-stratum reservoir sampling, with the
    hash as the reproducible "random" tape. A different seed draws a
    different but reproducible sample; growing a group only swaps
    members whose hash displaces an incumbent (bounded churn, like
    consistent hashing). Skew caveat: one giant stratum funnels its
    whole group through one task's window sort — at that shape,
    pre-filter with deterministic_sample to ~4k/|group| first (noted in
    SCALING.md)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def resample_with_replacement(
    df: DataFrame,
    weights: dict[str, float],
    target_total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    copy_col: str = "copy",
) -> DataFrame:
    """Resample to a target mixture ALLOWING repetition — the published
    LLM-mixture regime where scarce high-quality sources run for >1
    epoch (e.g. The Pile's per-source epoch factors, Gao et al. 2020):
    source s contributes ~weights[s]·target_total rows by repeating each
    of its docs floor(r) or floor(r)+1 times, r = w·T/c_s.

    The fractional epoch is EXACT and deterministic: within each
    source, the ceil(frac(r)·c_s) docs with the smallest
    xxhash64(id, seed) take the extra copy (hash-ranked, id tie-break —
    the stratified_sample_exact rule), so per-source output counts hit
    the target to ±1 row, composition is stable across runs/layouts,
    and growth is monotone: raising target_total only grows each
    source's extra-copy prefix (plus whole epochs), never swaps
    members. Output adds ``copy_col`` (0-based) so (id, copy) stays
    unique for downstream shuffling/packing.

    Scale shape: one |sources|-row count aggregate (model-sized) + ONE
    hash-ranked window per source partition (single shuffle on the
    source key — same skew caveat as stratified_sample_exact), then a
    map-only explode of sequence(0, n_copies-1); output size is the
    target, input is read once. Upsampling repeats ROWS, not
    bytes-on-disk: the explode materializes copies only into the
    downstream pipeline (pack/shuffle), which is the point — a trainer
    sees epochs without the landing zone storing them."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"mixture weights must sum to 1.0, got {total}")
    if target_total <= 0:
        raise ValueError("target_total must be positive")
    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"mixture names sources with no rows: {missing}")
    import math

    from pyspark.sql import Window

    w_rank = Window.partitionBy(source_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    base_c = F.lit(0)
    extra_k = F.lit(0)
    for s, w in sorted(weights.items()):
        r = (w * target_total) / counts[s]
        base, frac = int(r), r - int(r)
        base_c = F.when(F.col(source_col) == s, base).otherwise(base_c)
        extra_k = F.when(
            F.col(source_col) == s, int(math.ceil(frac * counts[s]) if frac else 0)
        ).otherwise(extra_k)
    out = (
        df.withColumn("__rk", F.row_number().over(w_rank))
        .withColumn("__n", base_c + (F.col("__rk") <= extra_k).cast("int"))
        .where(F.col("__n") > 0)
    )
    return (
        out.withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n", "__rk")
    )


def export_training_shards(
    corpus: DataFrame,
    packed: DataFrame,
    out_root: str,
    bins_per_shard: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    bin_col: str = "bin",
    seed: int = 0,
) -> int:
    """Materialize the packed training set as trainer-ready shards —
    the pipeline's terminal artifact: parquet under
    ``out_root/shard=N/``, one file per shard, rows in consumption
    order (bin ascending, then the epoch-shuffle order within a bin,
    matching the offset order pack_into_bins assigned by).

    A data loader then streams shard dirs in name order and rows in
    file order and sees exactly the virtual concatenation the packing
    computed — no loader-side sorting, no cross-shard coordination;
    shards are independent units of retry/distribution. One range-free
    shuffle: repartition ON the shard id (so shard N is one task → one
    file) + an in-partition sort. Returns the shard count.

    Shard sizing is bins_per_shard × budget tokens (caller picks it to
    land shards near the object-store sweet spot, e.g. ~256 MB-1 GB)."""
    joined = packed.join(corpus.select(id_col, text_col), id_col)
    shard = (F.col(bin_col) / F.lit(bins_per_shard)).cast("int").alias("shard")
    out = (
        joined.select("*", shard)
        .repartition(F.col("shard"))
        .sortWithinPartitions(
            F.col(bin_col), F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
        )
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(out_root)
    spark = corpus.sparkSession
    return (
        spark.read.parquet(out_root).select("shard").distinct().count()
    )
