"""Parameter tuning for the vector index tiers — the ``tune_bands``
twin for IVF/PQ (SURVEY §2 D15/D32).

The vector tiers take nlist/nprobe/m/ksub from the caller, and at
100 TB those are the knobs a user gets wrong first: nlist too small
makes every probe scan a giant partition, ksub above the training
population makes sub-codebooks degenerate (the r7 test gotcha), and
nprobe is a recall/latency dial nobody can set without measuring. Two
pieces, mirroring FAISS's published practice:

- ``suggest_params`` — closed-form, driver-side: nlist ≈ growth·√N
  (the standard IVF sizing; capped so every centroid expects enough
  training points for a meaningful Lloyd fit), PQ ``m`` = the largest
  divisor of ``dim`` within the per-vector byte budget (one code byte
  per subquantizer), ``ksub`` = the largest power of two the training
  population supports. ``validate_pq_params`` is the refuse-loudly
  gate, generalizing the r7 lesson: sub-codebook k-means with more
  centroids than training points returns duplicate/empty codewords and
  recall silently rots — raise instead.

- ``tune_nprobe`` — empirical, on a held-out query sample: recall@k
  needs ground truth, and probing EVERY cluster (nprobe = nlist) is
  exhaustive search over the same store (exact for IVF; for PQ it holds
  the code approximation constant, isolating the nprobe dial), so the
  tuner reuses the tier's own ``search`` for both sides — no separate
  brute-force operator.
  It walks nprobe up by doubling and returns the smallest value whose
  sample recall meets the target, plus the measured curve. Cost: one
  exact pass + O(log nlist) approximate passes over a SAMPLE of
  queries (corpus never re-read beyond the probed partitions), so the
  tuner is a cheap offline step against the persisted index.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_POINTS_PER_CENTROID = 39  # FAISS's documented training-quality floor


def suggest_params(
    n_vectors: int,
    dim: int,
    *,
    growth: float = 4.0,
    pq_bytes: int | None = None,
    residual: bool = False,
    nlist: int | None = None,
) -> dict:
    """Closed-form starting parameters for a corpus of ``n_vectors``
    ``dim``-dimensional embeddings. Returns {"nlist", "m", "ksub"}
    (m/ksub only when ``pq_bytes`` is given — the per-vector code
    budget in bytes). An explicit ``nlist`` is kept verbatim and the
    residual ksub sizes against ITS per-cluster population — the
    mixed-explicit case the r9 auto-param builders hit. Deterministic;
    validated by validate_pq_params before returning."""
    if n_vectors <= 0 or dim <= 0:
        raise ValueError("n_vectors and dim must be positive")
    if nlist is None:
        nlist = max(1, int(round(growth * math.sqrt(n_vectors))))
        nlist = min(nlist, max(1, n_vectors // MIN_POINTS_PER_CENTROID))
    out: dict = {"nlist": nlist}
    if pq_bytes is not None:
        m = max(
            [d for d in range(1, dim + 1) if dim % d == 0 and d <= pq_bytes],
            default=1,
        )
        train_pop = n_vectors / nlist if residual else n_vectors
        ksub = 256
        while ksub > 2 and ksub * 4 > train_pop:  # ≥ 4 points per codeword
            ksub //= 2
        out.update({"m": m, "ksub": ksub})
        validate_pq_params(
            n_vectors, dim, nlist=nlist, m=m, ksub=ksub, residual=residual
        )
    return out


def validate_pq_params(
    n_vectors: int,
    dim: int,
    *,
    nlist: int,
    m: int,
    ksub: int,
    residual: bool = False,
) -> None:
    """Refuse-loudly gate for a PQ build: raises ValueError when the
    configuration cannot train meaningful codebooks. For flat PQ the
    sub-codebooks train on all N vectors; for residual PQ they train on
    per-cluster residuals whose EXPECTED population is N/nlist — ksub
    above either population is the silent-recall-rot configuration the
    r7 planted-cluster tests hit."""
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    if nlist > n_vectors:
        raise ValueError(f"nlist={nlist} exceeds corpus size {n_vectors}")
    train_pop = n_vectors / nlist if residual else n_vectors
    if ksub > train_pop:
        raise ValueError(
            f"ksub={ksub} exceeds the {'per-cluster residual ' if residual else ''}"
            f"training population (~{int(train_pop)}); lower ksub or nlist"
        )


def _recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Mean per-query |approx ∩ exact| / k — one ids-only join + two
    aggregates, no vectors move."""
    a = approx.select("query_id", "vec_id")
    e = exact.select("query_id", "vec_id")
    hits = a.join(e, ["query_id", "vec_id"], "semi")
    n_q = e.select("query_id").distinct().count()
    if n_q == 0:
        return 1.0
    return hits.count() / float(n_q * k)


def tune_nprobe(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    *,
    tier: str = "ivf",
    k: int = 10,
    target_recall: float = 0.95,
    max_nprobe: int | None = None,
) -> dict:
    """Smallest nprobe whose recall@k on the held-out ``queries``
    sample meets ``target_recall``, measured against the tier's own
    answer at FULL probe width (nprobe = nlist probes every partition:
    exhaustive exact search for IVF; for PQ it holds the code
    approximation constant, so the measured loss is exactly what the
    nprobe dial controls — ground truth needs no second operator either
    way). ``tier``: "ivf" (ann_index.search) or "pq" (pq_index.search).
    Returns {"nprobe", "recall", "curve": [(nprobe, recall), ...]}."""
    if tier == "ivf":
        from http_feeds_spark.operators import ann_index as mod

        nlist = len(mod.load_centroids(spark, index_root))
    elif tier == "pq":
        from http_feeds_spark.operators import pq_index as mod

        nlist = len(mod.load_model(spark, index_root)[0])
    else:
        raise ValueError(f"unknown tier {tier!r} (want 'ivf' or 'pq')")
    hi = min(max_nprobe or nlist, nlist)

    # ground truth at full probe width: for IVF this is exhaustive exact
    # search; for PQ it holds the code approximation CONSTANT so the
    # measured loss is exactly what the nprobe dial controls
    exact = mod.search(spark, queries, index_root, k=k, nprobe=nlist)
    exact = exact.localCheckpoint()  # one exact pass, reused per step

    curve: list[tuple[int, float]] = []
    nprobe = 1
    while True:
        approx = mod.search(spark, queries, index_root, k=k, nprobe=nprobe)
        r = _recall_at_k(approx, exact, k)
        curve.append((nprobe, round(r, 4)))
        if r >= target_recall or nprobe >= hi:
            return {"nprobe": nprobe, "recall": round(r, 4), "curve": curve}
        nprobe = min(nprobe * 2, hi)
