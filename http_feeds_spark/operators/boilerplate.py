"""Corpus-frequency boilerplate removal — strip repeated segments that
appear across many documents (headers, footers, license stanzas, nav
chrome), the sub-document counterpart of document-level dedup
(SURVEY §2 D2/D6 family; extension-level, like all of Group D).

Large-scale training corpora dedup at two granularities: whole documents
(MinHash/exact, operators/components.py) and repeated SPANS inside
otherwise-distinct documents. The standard web-corpus treatment drops
lines or paragraphs whose exact text recurs in ≥ m documents; the driver
corpus is single-space word soup with no line structure, so the unit
here is the aligned n-token FRAME — the same frame grid for every doc,
which makes recurrence well-defined and the whole operator three
DataFrame stages:

    segment:  tokens -> ceil(len/n) aligned frames      [map-only]
    count:    frames -> distinct-doc frequency           [one shuffle]
    strip:    anti-join frequent frames, re-assemble     [join + regroup]

100 TB posture: the frequency key is an 8-byte xxhash64, never
the segment text, so the counting shuffle carries hash + doc id per
frame; the frequent set is ids-only and joined (AQE broadcasts it when
small — it usually is: boilerplate is by definition low-cardinality);
re-assembly is one regroup per doc of (pos, segment) pairs — doc-sized
state, the same bound as carrying the text column itself. Alignment is
frame-quantized on purpose: a shifted copy of a boilerplate block lands
on different frames and is NOT caught — catching arbitrary-offset spans
needs sliding fingerprints (functions/text.add_winnow_fingerprints is
that path); the aligned frame grid is what makes exact recurrence
countable in one linear pass.

Engine-exactness: frames, hashes, frequency threshold and re-assembly
are all expressible in ANSI SQL — full DuckDB value parity (including
the reconstructed text) is pinned in tests/test_boilerplate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEGMENT_TOKENS = 10


def doc_segments(
    docs: DataFrame,
    n: int = SEGMENT_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, seg, seg_hash): the aligned n-token frames of each
    document. The final frame may be shorter than n (the tail). Map-only:
    one slice-and-explode per row, no shuffle."""
    # token array as a materialized COLUMN + the OUTER generate (r15
    # plan-lint incident, same fix as chunking.chunk_documents): inline
    # split() re-tokenized the doc per frame inside the lambda, and a
    # plain explode's inferred size()>0 filter re-derived the whole
    # frame build from raw text via alias-substituted pushdown — O(T²)
    # per doc both ways. explode_outer infers no filter; the null row a
    # null-text doc generates is dropped on the generated column.
    toks = F.col("__toks")
    nseg = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(toks, i * n + 1, n)).alias("seg"),
        ),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .select("doc_id", F.explode_outer(frames).alias("f"))
        .where(F.col("f").isNotNull())
        .select(
            "doc_id",
            F.col("f.pos").alias("pos"),
            F.col("f.seg").alias("seg"),
            # r15: 8-byte xxhash64 frequency key (was a 16-hex md5
            # prefix) — cheaper to compute, half the counting-shuffle
            # bytes; same ~2⁻⁶⁴ collision class, outputs identical (the
            # DuckDB parity twin keeps its md5 formulation and agrees)
            F.xxhash64("f.seg").alias("seg_hash"),
        )
    )


def frequent_segments(
    segments: DataFrame, min_docs: int, min_tokens: int = 1
) -> DataFrame:
    """(seg_hash) of every ELIGIBLE frame whose text recurs in >=
    min_docs DISTINCT documents — ids-only, one map-side-combined
    aggregate.

    ``min_tokens`` gates eligibility: frames shorter than it (the
    quantization tail of a document, possibly a single word) are never
    counted — a 1-token tail like "batch" recurs everywhere without
    being boilerplate, the same reason line-dedup pipelines skip short
    lines. A short tail can never textually equal a long frame, so
    filtering the COUNT side alone is sufficient — ineligible frames
    simply never match the frequent set."""
    eligible = segments.filter(F.size(F.split("seg", " ")) >= min_tokens)
    return (
        eligible.groupBy("seg_hash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("seg_hash")
    )


def strip_frequent_segments(
    docs: DataFrame,
    n: int = SEGMENT_TOKENS,
    min_docs: int = 2,
    min_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove corpus-frequent frames from every document; returns
    (doc_id, n_segments, n_removed, clean_text, n_chars_clean).

    Frames surviving the frequency gate re-assemble in frame order with
    single-space joins (concat_ws skips the removed frames' nulls), so a
    document with no frequent frames round-trips to its exact original
    text. Deterministic: the regroup sorts on the in-doc frame position."""
    if min_tokens is None:
        min_tokens = n  # full frames only by default — tails never count
    segs = doc_segments(docs, n, id_col, text_col)
    freq = frequent_segments(segs, min_docs, min_tokens).withColumn(
        "__freq", F.lit(True)
    )
    marked = segs.join(freq, "seg_hash", "left")
    # collect_list drops the NULLs the when() leaves for frequent frames,
    # so the regroup carries only surviving segments
    kept = F.when(F.col("__freq").isNull(), F.struct("pos", F.col("seg").alias("s")))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_segments"),
            F.sum(F.when(F.col("__freq").isNotNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["s"]),
            ).alias("clean_text"),
        )
        .withColumn("n_chars_clean", F.length("clean_text").cast("long"))
    )


def strip_oracle_sql(
    docs_sql: str,
    n: int = SEGMENT_TOKENS,
    min_docs: int = 2,
    min_tokens: int | None = None,
) -> str:
    """DuckDB-equivalent SQL for :func:`strip_frequent_segments` over a
    (doc_id, text) relation given as `docs_sql` — same frames, same
    frequency + eligibility gates, same re-assembly. Pytest-parity."""
    if min_tokens is None:
        min_tokens = n
    return f"""
    WITH src AS ({docs_sql}),
    t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM src
    ),
    seg AS (
      SELECT doc_id,
             CAST(i AS INTEGER) AS pos,
             array_to_string(toks[(i*{n}+1):(i*{n}+{n})], ' ') AS seg
      FROM t, LATERAL unnest(generate_series(0,
             CAST(ceil(len(toks) / {n}.0) AS INTEGER) - 1)) AS g(i)
    ),
    freq AS (
      SELECT substring(md5(seg), 1, 16) AS seg_hash
      FROM seg WHERE len(string_split(seg, ' ')) >= {min_tokens}
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ),
    marked AS (
      SELECT s.doc_id, s.pos, s.seg,
             substring(md5(s.seg), 1, 16) IN (SELECT seg_hash FROM freq) AS is_freq
      FROM seg s
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_segments,
           CAST(SUM(CASE WHEN is_freq THEN 1 ELSE 0 END) AS INTEGER) AS n_removed,
           array_to_string(list_transform(
             list_sort(COALESCE(
               list({{'pos': pos, 's': seg}}) FILTER (WHERE NOT is_freq), [])),
             x -> x.s), ' ') AS clean_text,
           CAST(len(array_to_string(list_transform(
             list_sort(COALESCE(
               list({{'pos': pos, 's': seg}}) FILTER (WHERE NOT is_freq), [])),
             x -> x.s), ' ')) AS BIGINT) AS n_chars_clean
    FROM marked GROUP BY doc_id
    """
