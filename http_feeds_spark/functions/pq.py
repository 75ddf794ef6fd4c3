"""Product quantization (PQ) for compressed vector search.

Public algorithm: Jégou, Douze & Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) — split each D-dim vector into
``m`` contiguous subvectors, vector-quantize each subspace against its
own ``ksub``-entry codebook, and store only the ``m`` code indices per
vector. Distances are estimated Asymmetric-Distance-Computation (ADC)
style: the QUERY stays exact, and its distance to a code is the sum of
precomputed query-to-centroid subdistances.

Why this matters at 100 TB: raw float embeddings are the one corpus
column that cannot be cheaply rescanned (768-dim float32 = 3 KB/row;
at 10^10 rows that is ~30 TB for the ONE column). PQ codes at
``m`` bytes/vector (m=8..16) compress that 200-400× — the candidate
scan of a similarity search reads code bytes, not vector bytes, which
is the difference between an interactive search tier and a full-corpus
I/O job. This module is the compressed complement to the exact/IVF
paths in functions/kmeans.py and operators/ann_index.py.

Spark shape (everything JVM-side, no Python in the data path):

- **Training** reuses the deterministic Lloyd of functions/kmeans.py,
  once per subspace on ``slice(vec)`` — m small linear passes, model
  stays driver-sized (m×ksub×subdim doubles).
- **Encoding is map-only**: all m codebooks travel as broadcast parsed
  literals (kmeans._centroid_literal — the py4j-free form); each row
  computes m argmins in ONE projection. No shuffle, no UDF.
- **The ADC distance table is computed per query row, in the plan**:
  ``adc_table_col`` builds an array<array<double>> of query-to-centroid
  subdistances with a transform over the same literals — so search is
  distributed for ANY query-table size; the driver never collects query
  vectors (contrast: a numpy-side table would cap the query batch).
- **Scoring is two HOFs**: ``zip_with(codes, dt, (c,row) ->
  element_at(row, c+1))`` then a sum ``aggregate`` — whole-stage
  codegen territory, ids + one double ride the ranking exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from http_feeds_spark.functions import kmeans as km

Codebooks = list[list[tuple[int, list[float]]]]  # [subspace][cid] -> vec


def subvector(vec_col, sub: int, subdim: int) -> Column:
    """Subspace ``sub``'s slice of the vector (F.slice is 1-indexed)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.slice(v, sub * subdim + 1, subdim)


def train_codebooks(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
) -> Codebooks:
    """One deterministic Lloyd run per subspace over the sliced corpus.

    m × (iters+1) small aggregate jobs at build time; the returned model
    is m×ksub×(D/m) doubles — driver-sized however big the corpus is.
    Vector dim must divide evenly by m (validated on the first row)."""
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return [[] for _ in range(m)]
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    subdim = dim // m
    books: Codebooks = []
    for s in range(m):
        sliced = emb.select(
            F.col(id_col), subvector(vec_col, s, subdim).alias("__sub")
        )
        books.append(
            km.kmeans_centroids(sliced, id_col, "__sub", k=ksub, iters=iters)
        )
    return books


def _code_type(ksub: int) -> str:
    # one byte per code is the PQ promise; tinyint is signed so it holds
    # ksub <= 128 — the classical ksub=256 needs the next width up
    return "tinyint" if ksub <= 128 else "smallint"


def _books_array(codebooks: Codebooks) -> Column | None:
    """All m codebooks as ONE array<array<array<double>>> folded Literal
    (books[s][cid]), or None when the kmeans._model_array fast form does
    not apply to every book (see its docstring — r15: one 3-node tree
    instead of an m×ksub×subdim-node tree; folded plan and results are
    bit-identical)."""
    import json
    import math

    for book in codebooks:
        if not book or [cid for cid, _ in book] != list(range(len(book))):
            return None
        if any(not math.isfinite(float(x)) for _, vec in book for x in vec):
            return None
    payload = json.dumps(
        [[[float(x) for x in vec] for _, vec in book] for book in codebooks]
    )
    return F.from_json(F.lit(payload), "array<array<array<double>>>")


def encode_col(codebooks: Codebooks, vec_col: str = "embedding") -> Column:
    """array<tinyint> of m nearest-subcentroid codes — map-only, one
    projection, all m codebooks as one broadcast folded Literal."""
    subdim = len(codebooks[0][0][1])
    ksub = len(codebooks[0])
    books = _books_array(codebooks)
    if books is not None:
        v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        return F.transform(
            books,
            lambda book, s: F.array_min(
                F.transform(
                    book,
                    lambda c, i: F.struct(
                        km.sq_dist(
                            F.slice(v, s * subdim + F.lit(1), F.lit(subdim)), c
                        ).alias("d2"),
                        i.alias("cid"),
                    ),
                )
            )["cid"].cast(_code_type(ksub)),
        )
    codes = []
    for s, book in enumerate(codebooks):
        sub = subvector(vec_col, s, subdim)
        best = F.array_min(
            F.transform(
                km._centroid_literal(book),
                lambda c: F.struct(
                    km.sq_dist(sub, c["cvec"]).alias("d2"), c["cid"].alias("cid")
                ),
            )
        )
        codes.append(best["cid"].cast(_code_type(ksub)))
    return F.array(*codes)


def adc_table_col(codebooks: Codebooks, vec_col: str = "embedding") -> Column:
    """Per-ROW ADC distance table: dt[s][c] = ||querySub_s - centroid_{s,c}||².

    Computed inside the plan (transform over the codebook literals), so
    the table rides the query row — search stays fully distributed and
    the driver never sees a query vector. Codebook cids are 0..ksub-1 in
    order (kmeans contract), so dt[s] indexes by code directly."""
    subdim = len(codebooks[0][0][1])
    books = _books_array(codebooks)
    if books is not None:
        v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        return F.transform(
            books,
            lambda book, s: F.transform(
                book,
                lambda c: km.sq_dist(
                    F.slice(v, s * subdim + F.lit(1), F.lit(subdim)), c
                ),
            ),
        )
    tables = []
    for s, book in enumerate(codebooks):
        sub = subvector(vec_col, s, subdim)
        tables.append(
            F.transform(km._centroid_literal(book), lambda c: km.sq_dist(sub, c["cvec"]))
        )
    return F.array(*tables)


def adc_dist_col(codes_col: str = "codes", dt_col: str = "dt") -> Column:
    """Σ_s dt[s][code_s] — two JVM higher-order functions, no UDF."""
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    dt = F.col(dt_col) if isinstance(dt_col, str) else dt_col
    return F.aggregate(
        F.zip_with(codes, dt, lambda c, row: F.element_at(row, c.cast("int") + F.lit(1))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def encode(
    emb: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """(id, codes) — the compressed corpus. Map-only."""
    return emb.select(F.col(id_col), encode_col(codebooks, vec_col).alias(out_col))


def search_adc(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: Codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    broadcast_queries: bool = True,
    exclude_self: bool = False,
) -> DataFrame:
    """Brute-force ADC top-k: every query scores every code (use the
    IVF-pruned form in operators/pq_index.py to avoid the full scan).
    Returns (qid, id, adc_d2, rank) with rank 1..k per query, nearest
    first. Ties break on id for determinism.

    Plan: queries gain their dt map-only; with ``broadcast_queries``
    the cross join broadcasts q×(m×ksub doubles) rows and the CODES
    side never shuffles; ranking carries ids + one double."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(qid_col), adc_table_col(codebooks, vec_col).alias("__dt")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    scored = codes_df.select(F.col(id_col), F.col(codes_col)).crossJoin(q)
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(qid_col))
    scored = scored.select(
        qid_col, id_col, adc_dist_col(codes_col, "__dt").alias("adc_d2")
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("adc_d2").asc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
