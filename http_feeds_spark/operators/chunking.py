"""Document chunking — split documents into fixed-size overlapping
token windows with provenance, the universal pre-processing step of
context-window training and retrieval (RAG) pipelines.

Semantics: chunks of ``size`` tokens advance by stride = size − overlap;
the FINAL chunk is the remainder (possibly shorter), and a document
shorter than ``size`` yields exactly one chunk of itself. Every chunk
carries (doc_id, chunk_idx, start_tok, n_tok, chunk_text) so any
downstream hit maps back to its source span — the provenance contract
retrieval needs.

Spark shape: pure map-only — one ``transform`` over the chunk-start
sequence builds all chunk structs per row, one ``posexplode`` emits
them; no shuffle, no UDF, scan-parallel. Deterministic chunk ids =
(doc_id, chunk_idx). The fan-out is ~n_tokens/stride rows per doc
(each carrying a size-token text slice — the output is ~size/stride ×
corpus bytes, the overlap price every chunking pipeline pays;
overlap=0 keeps it at exactly one corpus copy).

ANSI-SQL-expressible end to end — full DuckDB value parity (including
chunk text) is pinned in tests/test_chunking.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tok, chunk_text) — see module
    docstring for the boundary semantics."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    # the token array is materialized as a COLUMN and the generate is the
    # OUTER variant — both load-bearing (r15 plan-lint incident): with the
    # split() expression inline, the transform lambda re-tokenized the
    # whole document per chunk (no CSE across lambda boundaries), and
    # with a plain posexplode Catalyst's InferFiltersFromGenerate plants
    # a size()>0 filter whose alias-substituted pushdown re-derives the
    # full chunk build from raw text — O(T²) per doc either way. The
    # outer generate infers no filter; its one null row per null-token
    # doc is dropped on the cheap generated column, which for split() is
    # exactly the rows a plain posexplode would drop (split never yields
    # an empty array).
    toks = F.col("__toks")
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start < max(n - overlap, 1)
    # (a start inside the previous chunk's tail would duplicate it)
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast(
        "int"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).alias("start_tok"),
            F.least(F.lit(size), n - i * stride).alias("n_tok"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("chunk_text"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__toks"),
    ).select(
        "doc_id", F.posexplode_outer(chunks).alias("chunk_idx", "c")
    ).where(F.col("c").isNotNull()).select(
        "doc_id",
        "chunk_idx",
        F.col("c.start_tok").alias("start_tok"),
        F.col("c.n_tok").cast("int").alias("n_tok"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def chunk_oracle_sql(size: int = 64, overlap: int = 8) -> str:
    """DuckDB twin over the registered `documents` view."""
    stride = size - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), spec AS (
  SELECT doc_id, t,
         CAST(ceil(greatest(len(t) - {overlap}, 1) / {stride}.0) AS INT) AS nc
  FROM toks
)
SELECT doc_id,
       i AS chunk_idx,
       i * {stride} AS start_tok,
       CAST(least({size}, len(t) - i * {stride}) AS INT) AS n_tok,
       array_to_string(t[i * {stride} + 1 : i * {stride} + {size}], ' ')
         AS chunk_text
FROM spec, UNNEST(generate_series(0, nc - 1)) AS u(i)
"""
