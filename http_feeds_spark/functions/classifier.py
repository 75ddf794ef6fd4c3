"""Model-based quality classification — the hashed-bag-of-words linear
classifier the public pipelines run after heuristic gates (fastText-style
quality models; FineWeb-Edu's classifier stage is the best-known recent
example — heuristics pass ~everything, a trained scorer ranks it).

Spark-first design, mirroring functions/kmeans.py exactly:

- **features**: hashing-trick bag of words — token → xxhash64 % n_buckets.
  No vocabulary build, no fit step, no shuffle: the feature map is a pure
  per-row expression, stable across corpora (the property that lets one
  model score any shard without coordination).
- **scoring**: w·x + b evaluated JVM-side against ONE parsed weight-array
  literal (the centroid-literal trick, kmeans.py:42-74): per-row
  O(tokens) `element_at` lookups folded by `aggregate` — whole-stage
  codegen, map-only, zero Python in the hot path.
- **training**: majorized Newton on logistic loss (per-bucket steps
  g/h with the L1-majorizer curvature — provably monotone where plain
  GD needs thousands of rounds and raw diagonal Newton oscillates).
  Each round is one distributed pass: per-doc margin (map-only against
  the broadcast weights) → explode tokens → per-bucket gradient AND
  curvature sums (ONE map-side-combined aggregate, the only shuffle) →
  collect n_buckets partial stats (MODEL-sized, like kmeans' k×dim
  centroid sums — never data-sized) → driver-side weight update.
  Deterministic: no sampling, fixed iteration count.

At 100 TB: training cost is iters × (one scan + one bucket-keyed
shuffle of (bucket, err) pairs); the model itself is n_buckets doubles —
broadcast, never joined. Scoring is a pure map. Labels come from
wherever the pipeline gets them (human ratings, an LLM judge, a
heuristic gate used as weak supervision — the q_llm_quality_model
demo's choice).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_ids(tokens: Column, n_buckets: int) -> Column:
    """Hashing-trick feature ids: token → [0, n_buckets). Pure per-row
    expression (xxhash64 + pmod) — no vocabulary, no state."""
    return F.transform(tokens, lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets)))


def _weights_literal(weights: list[float]) -> Column:
    """ONE parsed literal for the whole weight vector (the kmeans
    centroid-literal pattern: a Python loop of lit() calls would py4j-
    chatter per element; a single `array(...)` expression string parses
    once and broadcasts with the plan)."""
    body = ",".join(f"{w!r}D" for w in weights)
    return F.expr(f"array({body})")


def margin(tokens: Column, weights: list[float], bias: float, n_buckets: int) -> Column:
    """mean(w[bucket]) + b — MEAN pooling over the token buckets, the
    fastText shape: margins are document-length-free, so one learning
    rate fits 10-token and 10k-token docs alike (sum pooling makes the
    gradient scale with doc length and diverges at any usable lr).
    Per-row O(tokens) lookups into the broadcast weight literal, folded
    JVM-side."""
    wlit = _weights_literal(weights)
    bids = bucket_ids(tokens, n_buckets)
    dots = F.aggregate(
        bids,
        F.lit(0.0),
        lambda acc, bid: acc + F.element_at(wlit, bid.cast("int") + 1),
    )
    return dots / F.greatest(F.size(bids), F.lit(1)) + F.lit(float(bias))


def score(tokens: Column, weights: list[float], bias: float, n_buckets: int) -> Column:
    """sigmoid(w·x + b) — the calibrated quality score in [0, 1]."""
    z = margin(tokens, weights, bias, n_buckets)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logistic(
    df: DataFrame,
    tokens_col: str,
    label_col: str,
    *,
    n_buckets: int = 512,
    iters: int = 8,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Majorized-Newton logistic regression over the hashed mean-pooled
    BoW (per-coordinate steps scaled by the blockwise L1-majorizer
    curvature — see the in-loop comment; lr=1.0 is the natural step).

    Returns (weights[n_buckets], bias). Each iteration runs ONE Spark
    job: per-doc error (map-only, broadcast weights) → explode bucket
    contributions → groupBy(bucket).sum(g, h) — map-side combined,
    shuffle carries ≤ n_buckets × partitions rows — → model-sized
    collect. L2 excludes the bias, per convention. Deterministic for a
    fixed input frame."""
    staged = df.select(
        bucket_ids(F.col(tokens_col), n_buckets).alias("__bids"),
        F.col(label_col).cast("double").alias("__y"),
    ).localCheckpoint()  # one snapshot: every round sees identical rows
    n = staged.count()
    if n == 0:
        raise ValueError("train_logistic: empty training frame")

    weights = [0.0] * n_buckets
    bias = 0.0
    for _ in range(iters):
        wlit = _weights_literal(weights)
        ntok = F.greatest(F.size("__bids"), F.lit(1))
        z = (
            F.aggregate(
                F.col("__bids"),
                F.lit(0.0),
                lambda acc, bid: acc + F.element_at(wlit, bid.cast("int") + 1),
            )
            / ntok
            + F.lit(bias)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("__y")
        # Curvature is the BLOCKWISE L1 MAJORIZER, not the raw diagonal
        # Hessian: mean pooling gives every row feature-L1 mass exactly 1
        # (+1 for the bias), so diag(R·Σᵢ pᵢ(1-pᵢ)·x_ib) with R=2
        # dominates XᵀDX and each coordinate step provably decreases the
        # loss even though all coordinates move at once (the raw diagonal
        # ignores that coupling and oscillates — measured on this corpus).
        # Linear in x ⇒ additive per token occurrence: each occurrence
        # contributes err/n to its bucket's gradient and R·p(1-p)/n to
        # its curvature; bucket -1 is the bias (full err / R·p(1-p) per
        # doc). ONE scan + ONE bucket-keyed aggregate per round covers
        # gradient, curvature, and intercept together.
        R = 2.0
        contrib = F.concat(
            F.transform(
                F.col("__bids"),
                lambda b: F.struct(
                    b.alias("b"),
                    (err / ntok).alias("g"),
                    (F.lit(R) * p * (1 - p) / ntok).alias("h"),
                ),
            ),
            F.array(
                F.struct(
                    F.lit(-1).cast("bigint").alias("b"),
                    err.alias("g"),
                    (F.lit(R) * p * (1 - p)).alias("h"),
                )
            ),
        )
        grad_rows = (
            staged.select(F.explode(contrib).alias("__c"))
            .groupBy(F.col("__c.b").alias("__b"))
            .agg(F.sum("__c.g").alias("__g"), F.sum("__c.h").alias("__h"))
            .collect()
        )  # ≤ n_buckets+1 rows — model-sized, the kmeans collect shape
        stats = {int(r["__b"]): (float(r["__g"]), float(r["__h"])) for r in grad_rows}
        weights = [
            w
            - lr
            * (stats.get(b, (0.0, 0.0))[0] + l2 * w * n)
            / (stats.get(b, (0.0, 0.0))[1] + l2 * n + 1e-9)
            for b, w in enumerate(weights)
        ]
        gb, hb = stats.get(-1, (0.0, 0.0))
        bias -= lr * gb / (hb + 1e-9)
    return weights, bias


def log_loss(
    df: DataFrame,
    tokens_col: str,
    label_col: str,
    weights: list[float],
    bias: float,
    n_buckets: int,
) -> float:
    """Mean logistic loss — the training-progress metric tests assert
    decreases. One map-only pass + one scalar aggregate."""
    p = score(F.col(tokens_col), weights, bias, n_buckets)
    eps = 1e-12
    y = F.col(label_col).cast("double")
    loss = -(
        y * F.log(F.greatest(p, F.lit(eps)))
        + (1 - y) * F.log(F.greatest(1 - p, F.lit(eps)))
    )
    row = df.agg(F.avg(loss)).collect()[0][0]
    if row is None or math.isnan(row):
        raise ValueError("log_loss: undefined over the given frame")
    return float(row)
