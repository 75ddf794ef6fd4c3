"""Exact-substring span dedup — remove token spans that repeat VERBATIM
anywhere in the corpus, at any offset (the sub-document counterpart of
document dedup, and the sliding-window complement of the aligned-frame
operator in operators/boilerplate.py, whose docstring names this path).

Public algorithm family: Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022) — their ExactSubstr pass marks every
≥ L-token span that occurs twice in the corpus. Their implementation is
a single-node suffix array; the distributed re-expression used by web
pipelines (and here) is stride-1 window HASHING: a span of ≥ L tokens
repeats iff each of its length-L windows repeats, so counting window
hashes finds exactly the same token coverage without any global index.

Three DataFrame stages, all JVM-side:

    windows:  tokens -> every L-token window, stride 1        [map-only]
    count:    window hash -> corpus frequency >= 2            [one shuffle]
    cover:    interval-union duplicated windows per doc       [window fn]
              -> per-doc dup-span stats, or scrubbed text

100 TB posture: stride-1 fan-out is ~n_tokens rows/doc — the price the
published pass pays too — but each row is (doc id, int pos, 16-hex hash
of the window TEXT), never the window text itself; the frequency count
is one map-side-combined aggregate on the hash; duplicate marking joins
ids-only (AQE broadcasts the frequent set when small); the coverage
union is a per-doc running-max window over the few DUPLICATED positions,
not all positions. Scrubbing fans duplicated windows out to covered
token positions (L× the duplicated subset only) and anti-joins the token
table. A doc's state never exceeds its own token count — the same bound
as carrying the text column.

Engine-exactness: windows, md5-prefix hashes, interval union and
re-assembly are all ANSI-SQL-expressible — full DuckDB value parity
(stats AND scrubbed text) is pinned in tests/test_substr_dedup.py.
Hash-collision caveat: a 64-bit md5 prefix standing in for window text
can collide (~2^-64 per pair) exactly as in boilerplate.py — accepted
corpus-scale risk, same as the published pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WINDOW_TOKENS = 12  # Lee et al. use 50 BPE tokens; the driver corpus'
#                     docs are ~100 words, so the default is scaled down


def doc_windows(
    docs: DataFrame,
    length: int = WINDOW_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, whash): every stride-1 window of `length` tokens,
    pos 0-based. Docs shorter than `length` yield no windows (they can
    still CONTAIN no duplicated span by definition). Map-only.

    r15 (guide §2.3/§4): window identity is a chained ``xxhash64`` over
    a PRE-HASHED token array materialized below the Generate — the
    previous form inlined ``slice(split(text), i, L)`` into the
    per-window lambda, so every window re-split the whole document
    (O(T²) tokenization per doc, the same class 6f413c7 fixed in
    chunking/boilerplate) and then built + md5'd an ~L-word string per
    window. Now the text is split and token-hashed once per doc, and
    each window is L long-hash chain steps; ``whash`` is 8 bytes instead
    of a 16-char string, halving the checkpoint and count-shuffle bytes.
    Two windows hash equal iff their token sequences are equal (modulo
    ~2⁻⁶⁴ chain collisions — the md5-prefix form carried the same class
    of risk); the scrub/stats outputs are value-identical, which the
    DuckDB oracle (which keeps its md5 formulation) re-proves."""
    th = F.col("__th")
    nwin = F.size(th) - F.lit(length) + 1
    # sequence(1, 0) DESCENDS in Spark — docs shorter than `length`
    # must produce an empty window array, not a bogus pos-0 window
    idx = F.when(nwin >= 1, F.sequence(F.lit(1), nwin)).otherwise(
        F.array().cast("array<int>")
    )
    wins = F.transform(
        idx,
        lambda i: F.struct(
            (i - 1).alias("pos"),
            F.aggregate(
                F.slice(th, i, length),
                F.lit(0).cast("bigint"),
                lambda acc, x: F.xxhash64(acc, x),
            ).alias("whash"),
        ),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.transform(
                F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)
            ).alias("__th"),
        )
        .select("doc_id", F.explode(wins).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.whash").alias("whash"))
    )


def duplicated_windows(
    windows: DataFrame, min_count: int = 2, materialize: bool = True
) -> DataFrame:
    """The windows whose text occurs >= min_count times corpus-wide
    (across OR within documents — a within-doc verbatim repeat is a
    duplicated span too, per the reference pass). One map-side-combined
    aggregate to the frequent-hash set (ids-only), one join back.

    ``materialize`` localCheckpoints the window frame first: it has TWO
    consumers (the frequency aggregate and the join-back), and the
    stride-1 fan-out plus per-window md5 is exactly the recompute worth
    paying for once (measured at sf0.1: ~40% off the full scrub; the
    q_llm_dedup_near precedent). Costs one executor-local materialization
    of (doc id, int, 16-hex) rows — ~n_tokens/doc, tiny next to text."""
    if materialize:
        windows = windows.localCheckpoint()
    freq = (
        windows.groupBy("whash")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("whash")
    )
    return windows.join(freq, "whash").select("doc_id", "pos")


def dup_span_stats(
    docs: DataFrame,
    length: int = WINDOW_TOKENS,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicated-span coverage: (doc_id, n_tokens, dup_tokens,
    dup_frac). dup_tokens = |union of [pos, pos+L) over duplicated
    windows| — the classic running-max interval union, per doc, ordered
    by pos: each window contributes max(0, pos+L − max(pos, max prior
    end)) tokens. Docs with no duplicated window report 0/0.0."""
    dups = duplicated_windows(
        doc_windows(docs, length, id_col, text_col), min_count
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_end = F.max(F.col("pos") + F.lit(length)).over(w)
    covered = F.greatest(
        F.col("pos") + F.lit(length) - F.greatest(F.col("pos"), F.coalesce(prior_end, F.lit(0))),
        F.lit(0),
    )
    per_doc = dups.select("doc_id", covered.alias("cov")).groupBy("doc_id").agg(
        F.sum("cov").cast("long").alias("dup_tokens")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


def scrub_duplicated_spans(
    docs: DataFrame,
    length: int = WINDOW_TOKENS,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut every duplicated span out of every document (the reference
    pass's destructive mode): returns (doc_id, n_tokens, dup_tokens,
    scrubbed_text) where scrubbed_text keeps the UNCOVERED tokens in
    order, single-space joined. A doc with no duplicated span
    round-trips to its exact original text; a fully-covered doc scrubs
    to ''.

    Shape: duplicated windows explode to their covered token positions
    (L× the DUPLICATED subset only), distinct, then an ids-only
    left_anti against the token table and one ordered regroup per doc —
    and ONLY docs that actually contain a duplicated span enter the
    explode/regroup at all: the untouched majority (dup coverage is
    sparse in a healthy corpus) passes through as original text via an
    ids-only anti-join, so the re-assembly cost scales with AFFECTED
    documents, not corpus size. (At sf0.1 463/5000 docs are affected and
    wall time is window-hashing-bound, so the gain is neutral there;
    at corpus scale text columns are ~KB each and shuffling only the
    affected ~10% through the regroup is what matters.)"""
    dups = duplicated_windows(
        doc_windows(docs, length, id_col, text_col), min_count
    )
    covered = (
        dups.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(length - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    affected_ids = covered.select("doc_id").distinct()
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    affected = base.join(affected_ids, "doc_id", "left_semi")
    toks = affected.select(
        "doc_id", F.posexplode(F.split("__text", " ")).alias("tpos", "tok")
    )
    kept = toks.join(covered, ["doc_id", "tpos"], "left_anti")
    regrouped = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("scrubbed_text"),
        F.count("*").cast("long").alias("kept_tokens"),
    )
    # fully-covered docs vanish from `kept` — restore them as '' via the
    # left join; untouched docs short-circuit with their original text
    scrubbed_affected = (
        affected.join(regrouped, "doc_id", "left")
        .select(
            "doc_id",
            F.size(F.split("__text", " ")).cast("long").alias("n_tokens"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.col("kept_tokens")).cast("long").alias("dup_tokens"),
            "scrubbed_text",
        )
    )
    untouched = base.join(affected_ids, "doc_id", "left_anti").select(
        "doc_id",
        F.size(F.split("__text", " ")).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("dup_tokens"),
        F.col("__text").alias("scrubbed_text"),
    )
    return scrubbed_affected.unionByName(untouched)


def stats_oracle_sql(length: int = WINDOW_TOKENS, min_count: int = 2) -> str:
    """DuckDB twin of dup_span_stats over the registered `documents`
    view — same windows, same md5-prefix hashes, same interval union."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), wins AS (
  SELECT doc_id, i - 1 AS pos,
         substr(md5(array_to_string(t[i:i+{length}-1], ' ')), 1, 16) AS whash
  FROM toks, UNNEST(generate_series(1, greatest(len(t) - {length} + 1, 0))) AS u(i)
), dups AS (
  SELECT doc_id, pos FROM wins
  WHERE whash IN (
    SELECT whash FROM wins GROUP BY whash HAVING count(*) >= {min_count}
  )
), cov AS (
  SELECT doc_id,
         greatest(pos + {length} - greatest(pos,
           coalesce(max(pos + {length}) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)), 0) AS c
  FROM dups
), per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       round(coalesce(p.dup_tokens, 0) / len(string_split(d.text, ' ')), 6)
         AS dup_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def scrub_oracle_sql(length: int = WINDOW_TOKENS, min_count: int = 2) -> str:
    """DuckDB twin of scrub_duplicated_spans (including the re-assembled
    text) over the registered `documents` view."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), wins AS (
  SELECT doc_id, i - 1 AS pos,
         substr(md5(array_to_string(t[i:i+{length}-1], ' ')), 1, 16) AS whash
  FROM toks, UNNEST(generate_series(1, greatest(len(t) - {length} + 1, 0))) AS u(i)
), dups AS (
  SELECT doc_id, pos FROM wins
  WHERE whash IN (
    SELECT whash FROM wins GROUP BY whash HAVING count(*) >= {min_count}
  )
), covered AS (
  SELECT DISTINCT doc_id, pos + j AS tpos
  FROM dups, UNNEST(generate_series(0, {length} - 1)) AS g(j)
), tok_rows AS (
  SELECT doc_id, t[i] AS tok, i - 1 AS tpos
  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
), kept AS (
  SELECT k.doc_id, k.tok, k.tpos FROM tok_rows k
  LEFT JOIN covered c ON k.doc_id = c.doc_id AND k.tpos = c.tpos
  WHERE c.doc_id IS NULL
), regrouped AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS scrubbed_text,
         CAST(count(*) AS BIGINT) AS kept_tokens
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(string_split(d.text, ' ')) - coalesce(r.kept_tokens, 0)
         AS BIGINT) AS dup_tokens,
       coalesce(r.scrubbed_text, '') AS scrubbed_text
FROM documents d LEFT JOIN regrouped r ON d.doc_id = r.doc_id
"""
