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

- **Moment accumulation is Arrow-batched mapInPandas**: each batch
  contributes its numpy Gram matrix (X'X), row sum, and count — d²+d+1
  partial values per PARTITION, map-side reduced by one groupBy-free
  global aggregate (a d²-row key space would also work, but emitting
  one flattened struct row per batch keeps the shuffle at
  #batches × (d²+d+1) doubles, independent of corpus size).
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


def moments(emb: DataFrame, vec_col: str = "embedding") -> tuple:
    """(n, mean[d], cov[d,d]) from ONE corpus pass. Partial Gram/sum
    per Arrow batch; the driver reduces #batches partials."""
    import numpy as np
    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            if not len(X):
                continue
            yield pd.DataFrame(
                {
                    "n": [int(X.shape[0])],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )  # #batches × (d²+d+1) doubles — model-sized
    import numpy as np

    n = sum(r.n for r in rows)
    d = len(rows[0].s)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r.s)
        g += np.asarray(r.g).reshape(d, d)
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
    products against ONE parsed component literal (kmeans form)."""
    lit = km._centroid_literal(list(enumerate(components)))
    mean_lit = km._centroid_literal([(0, mean)])[0]["cvec"]
    centered = F.zip_with(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        mean_lit,
        lambda x, m: x.cast("double") - m,
    )
    scale_lit = km._centroid_literal([(0, scales)])[0]["cvec"]
    dots = F.transform(
        lit,
        lambda c: F.aggregate(
            F.zip_with(centered, c["cvec"], lambda x, w: x * w),
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
