"""In-engine PCA / whitening for embedding columns — the standard
pre-ANN dimensionality reduction (Pearson 1901; the PCA+whitening
treatment of embedding indexes in Jégou & Chum ECCV 2012).

Why in-engine: reducing 768-dim float embeddings to 64-128 dims before
indexing cuts every downstream similarity cost ~10×, and the only
corpus-sized work PCA needs is ONE pass of second-moment accumulation
— exactly an aggregate. The model (d×d covariance, then the
eigenvectors) is driver-sized at any corpus scale; d=768 is a 2.3 MB
matrix.

Spark shape:

- **Moment accumulation is Arrow-batched mapInPandas**: each PARTITION
  accumulates its numpy Gram matrix (X'X), row sum, and count across
  its Arrow batches and emits ONE (d²+d+1)-double partial row. The
  partials are then reduced IN-ENGINE — flatten to (pos, val) pairs,
  hash-aggregate by pos (map-side combine keeps the shuffle at
  #partitions × (d²+d+1) rows), re-assemble with one global
  collect_list — so the driver receives EXACTLY ONE row whatever the
  corpus size or partition count (pinned in tests/test_pca.py).
- **Eigendecomposition is driver-side numpy** on the d×d model —
  model-sized, like the k-means centroid collect.
- **Projection is map-only** against broadcast component literals (the
  kmeans parsed-literal form): k dot products per row inside codegen,
  no Python, no shuffle.

Determinism: eigenvector signs are fixed by making each component's
largest-|loading| coordinate positive, so reruns and layouts agree —
numpy parity (up to that convention) is pinned in tests/test_pca.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from http_feeds_spark.functions import kmeans as km


def _moments_frame(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """ONE-row frame of the reduced second moments: the flattened
    [n] ++ rowsum[d] ++ gram[d·d] vector as sorted (pos, val) structs.

    Shape: one Arrow pass emits ONE partial row per partition (not per
    batch — the partial count is bounded by the partition count, never
    the corpus size); the element-wise sum happens in-engine via a
    (pos, val) hash aggregate with map-side combine (shuffle =
    #partitions × (d²+d+1) rows), and a final global collect_list packs
    the d²+d+1 reduced values into a single model-sized row."""
    import numpy as np
    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            X = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            if not len(X):
                continue
            n += int(X.shape[0])
            if s is None:
                s, g = X.sum(axis=0), X.T @ X
            else:
                s += X.sum(axis=0)
                g += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    part = emb.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    )
    flat = part.select(
        F.posexplode(
            F.concat(F.array(F.col("n").cast("double")), F.col("s"), F.col("g"))
        ).alias("pos", "val")
    )
    return (
        flat.groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("m"))
    )


def moments(emb: DataFrame, vec_col: str = "embedding") -> tuple:
    """(n, mean[d], cov[d,d]) from ONE corpus pass. The driver collects
    EXACTLY ONE row (see _moments_frame) regardless of corpus size or
    partition count."""
    import numpy as np

    rows = _moments_frame(emb, vec_col).collect()
    assert len(rows) == 1
    vals = [e.val for e in rows[0].m]
    if not vals:
        raise ValueError("moments of an empty embedding table")
    n = int(round(vals[0]))
    total = len(vals) - 1  # d + d²
    d = int(round((-1 + (1 + 4 * total) ** 0.5) / 2))
    s = np.asarray(vals[1 : 1 + d])
    g = np.asarray(vals[1 + d :]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def fit(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    whiten: bool = False,
    eps: float = 1e-9,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA: returns (mean, components[k][d], scales[k]) where
    projection = ((x - mean) @ components.T) * scales. scales is all
    ones unless `whiten` (then 1/sqrt(eigenvalue), making projected
    covariance identity). Components are sign-fixed (largest-|loading|
    coordinate positive) and ordered by descending eigenvalue."""
    import numpy as np

    _, mean, cov = moments(emb, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    scales = []
    for idx in order:
        v = vecs[:, idx]
        j = int(np.abs(v).argmax())
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        scales.append(
            float(1.0 / np.sqrt(max(vals[idx], eps))) if whiten else 1.0
        )
    return [float(x) for x in mean], comps, scales


def project_col(
    mean: list[float],
    components: list[list[float]],
    scales: list[float],
    vec_col: str = "embedding",
) -> Column:
    """array<double> of k principal coordinates — map-only JVM dot
    products against ONE folded model Literal (kmeans._model_array r15
    form; the parsed named_struct tree remains as fallback for
    non-finite models — identical folded plan and results either way)."""
    comp_arr = km._model_array(list(enumerate(components)))
    mean_arr = km._model_array([(0, mean)])
    scale_arr = km._model_array([(0, scales)])
    if comp_arr is not None and mean_arr is not None and scale_arr is not None:
        mean_lit = F.element_at(mean_arr, 1)
        scale_lit = F.element_at(scale_arr, 1)
        component = lambda c: c  # 2-D array element IS the vector  # noqa: E731
        lit = comp_arr
    else:
        lit = km._centroid_literal(list(enumerate(components)))
        mean_lit = km._centroid_literal([(0, mean)])[0]["cvec"]
        scale_lit = km._centroid_literal([(0, scales)])[0]["cvec"]
        component = lambda c: c["cvec"]  # noqa: E731
    centered = F.zip_with(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        mean_lit,
        lambda x, m: x.cast("double") - m,
    )
    dots = F.transform(
        lit,
        lambda c: F.aggregate(
            F.zip_with(centered, component(c), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.zip_with(dots, scale_lit, lambda v, s: v * s)


def transform(
    emb: DataFrame,
    mean: list[float],
    components: list[list[float]],
    scales: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """(id, pca) — the reduced embedding table. Map-only."""
    return emb.select(
        F.col(id_col), project_col(mean, components, scales, vec_col).alias(out_col)
    )
