"""MinHash + LSH banding and SimHash for near-duplicate detection at scale.

The 100 TB design (SURVEY §2 D2): never compare all pairs. Each document
gets a k-permutation MinHash signature over its shingle set; signatures are
cut into b bands of r rows; documents sharing any exact band value become
candidate pairs via an equi-join on (band_id, band_hash) — O(candidates),
not O(n²). Candidates are then verified with exact Jaccard.

Implementation shape matters as much as the algorithm: signatures are
computed by EXPLODING shingles to rows and running 64 scalar `min(hash)`
aggregates — pure whole-stage-codegen expressions with map-side partial
aggregation (the shuffle carries 64 longs per doc, never the shingles).
The tempting alternative — nested higher-order functions
(array_min(transform(...)) × 64) — is catastrophically slower: Spark
re-inlines HOF argument expressions as plans deepen (no CSE across lambda
boundaries), measured >50× slower on the same data.

Permutations are simulated the standard way: perm_i(s) = xxhash64(s + salt_i)
(JVM built-in, codegen'd). All deterministic — no RNG at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- MinHash -----------------------------------------------------------------


def minhash_signature_cols(df: DataFrame, shingles_col: str, doc_col: str = "doc_id",
                           k: int = 64) -> DataFrame:
    """(doc, shingles) → (doc, mh0..mh{k-1}) via explode + k min-aggregates.

    One shuffle on doc_col with map-side partial mins; every expression is
    a scalar codegen'd hash — no higher-order functions anywhere.
    """
    ex = df.select(doc_col, F.explode(F.col(shingles_col)).alias("__sh"))
    # hash the variable-length shingle ONCE; derive each permutation by
    # hashing the fixed-width long with the seed literal (xxhash64 over
    # (long, int) — no per-permutation string allocation)
    base = ex.select(doc_col, F.xxhash64("__sh").alias("__h"))
    hashed = base.select(
        doc_col,
        *[F.xxhash64(F.col("__h"), F.lit(i)).alias(f"__h{i}") for i in range(k)],
    )
    return hashed.groupBy(doc_col).agg(*[F.min(f"__h{i}").alias(f"mh{i}") for i in range(k)])


def band_rows(sig_df: DataFrame, doc_col: str = "doc_id", bands: int = 16, rows: int = 4) -> DataFrame:
    """(doc, mh*) → (doc, band_id, band_hash): one row per band, hashing
    the r signature columns of that band. Scalar expressions only."""
    structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(F.concat_ws(",", *[F.col(f"mh{b * rows + j}") for j in range(rows)])).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig_df.select(doc_col, F.explode(F.array(*structs)).alias("b")).select(
        doc_col, F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )


def candidate_pairs(banded: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Self-join on (band_id, band_hash): the banding trick. Output one row
    per unordered candidate pair (a < b), deduped across bands."""
    left = banded.withColumnRenamed(doc_col, "a")
    right = banded.withColumnRenamed(doc_col, "b")
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_candidates(docs_with_shingles: DataFrame, shingles_col: str = "shingles",
                       doc_col: str = "doc_id", k: int = 32, bands: int = 16,
                       rows: int = 2, materialize: bool = True) -> DataFrame:
    """Full MinHash-LSH candidate pipeline: signatures → bands → pairs.

    Default k=32 with 16 bands × 2 rows: half the signature cost of
    k=64/16×4 AND a far better s-curve at the 0.5 verify threshold
    (P[candidate | s=0.5] = 1-(1-s²)¹⁶ ≈ 0.99 vs ≈ 0.64 for r=4; unrelated
    pairs still collide at ~s² per band, so junk candidates stay rare).
    Planted-duplicate recall is the regression guard in tests.

    `materialize` puts an explicit barrier (localCheckpoint) after the
    signature stage: (a) Catalyst/codegen cost explodes when the 64-column
    aggregate lineage is re-optimized under every downstream join
    (measured 100s→3s on the band stage alone), and (b) at 100 TB the
    signature table is the natural reuse/persist point anyway — real
    pipelines write it out (here: executor-local storage; on a cluster a
    parquet intermediate or `.persist(DISK_ONLY)`).
    """
    sig = minhash_signature_cols(docs_with_shingles, shingles_col, doc_col, k)
    if materialize:
        sig = sig.localCheckpoint()
    return candidate_pairs(band_rows(sig, doc_col, bands, rows), doc_col)


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verified_jaccard_pairs(
    shingled: DataFrame,
    shingles_col: str = "shingles",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    threshold: float = 0.5,
    materialize: bool = False,
) -> DataFrame:
    """The full LSH pipeline back half, shared by every Jaccard-similarity
    query (near-dup n=3 @0.5, ngram-sim n=2 @0.3): candidates from
    banding, exact-Jaccard verify by re-joining the shingle sets, emit
    (a, b, jaccard). The caller owns the shingle table (and its
    checkpoint barrier — it feeds three consumers here: signatures + both
    verify sides)."""
    cands = minhash_candidates(shingled, shingles_col, id_col, k, bands, rows, materialize)
    a = shingled.select(F.col(id_col).alias("a"), F.col(shingles_col).alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("b"), F.col(shingles_col).alias("sh_b"))
    return (
        cands.join(a, "a")
        .join(b, "b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# --- SimHash -----------------------------------------------------------------


def simhash_cols(df: DataFrame, tokens_col: str, doc_col: str = "doc_id") -> DataFrame:
    """(doc, tokens) → (doc, simhash bigint, blk0..blk3 int).

    Explode tokens, hash once per token, then 64 scalar conditional-sum
    aggregates (one per bit); bits pack into a single BIGINT via a bitwise
    OR chain (no arithmetic overflow in ANSI mode) and into 4×16-bit
    blocks for pigeonhole LSH. Map-side partial aggregation again: the
    shuffle carries 64 ints per doc.
    """
    ex = df.select(doc_col, F.explode(F.col(tokens_col)).alias("__t"))
    hashed = ex.select(doc_col, F.xxhash64("__t").alias("__h"))
    sums = hashed.groupBy(doc_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__s{j}")
            for j in range(64)
        ]
    )
    bits = sums.select(
        doc_col, *[(F.col(f"__s{j}") > 0).cast("long").alias(f"__b{j}") for j in range(64)]
    )
    # balanced OR tree (depth 6), not a left-nested chain (depth 64):
    # deeply nested expressions blow past codegen method limits and fall
    # back to slow interpreted evaluation
    terms = [F.shiftleft(F.col(f"__b{j}"), j) for j in range(64)]
    while len(terms) > 1:
        terms = [
            terms[i].bitwiseOR(terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    packed = terms[0]
    blocks = [
        F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).cast("int").alias(f"blk{b}")
        for b in range(4)
    ]
    return bits.withColumn("simhash", packed).select(doc_col, "simhash", *blocks)


def hamming_from_packed(a: Column, b: Column) -> Column:
    """Hamming distance between two packed 64-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(sig_df: DataFrame, doc_col: str = "doc_id", max_hamming: int = 3,
                       materialize: bool = True) -> DataFrame:
    """Pigeonhole LSH on Hamming distance: pairs within `max_hamming` must
    agree on ≥1 of the 4 16-bit blocks, so candidates come from block
    equi-joins; verify with exact popcount on the packed signatures.
    `materialize` — same barrier rationale as minhash_candidates."""
    if materialize:
        sig_df = sig_df.localCheckpoint()
    banded = sig_df.select(
        doc_col,
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("block_id"), F.col(f"blk{b}").alias("block_val")) for b in range(4)])
        ).alias("bb"),
    ).select(doc_col, "simhash", F.col("bb.block_id").alias("block_id"), F.col("bb.block_val").alias("block_val"))
    a = banded.select(F.col(doc_col).alias("a"), F.col("simhash").alias("sh_a"), "block_id", "block_val")
    b = banded.select(F.col(doc_col).alias("b"), F.col("simhash").alias("sh_b"), "block_id", "block_val")
    return (
        a.join(b, ["block_id", "block_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", hamming_from_packed(F.col("sh_a"), F.col("sh_b")).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# --- shared: sign-pattern blocks for embedding LSH ---------------------------


def sign_band_candidates(emb: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding", n_blocks: int = 4) -> DataFrame:
    """Sign-band LSH candidate pairs for embedding near-dup: bucket each
    vector by its n_blocks 16-sign blocks; pairs sharing any full block
    become candidates via an equi-join on (block_id, block_val).

    The join and the dedup-distinct carry ONLY (id, block) — never the
    vectors: at 100 TB a distinct over rows that still hold two 64-dim
    float arrays would haul ~0.5 KB of payload per candidate side through
    the exchange. Callers re-join the embeddings afterwards for the exact
    cosine verify."""
    signs = emb.select(
        id_col,
        simhash_blocks(
            F.transform(F.col(vec_col), lambda x: (x >= 0).cast("int")), n_blocks
        ).alias("__blocks"),
    )
    banded = signs.select(id_col, F.posexplode("__blocks").alias("block_id", "block_val"))
    a = banded.select(F.col(id_col).alias("a"), "block_id", "block_val")
    b = banded.select(F.col(id_col).alias("b"), "block_id", "block_val")
    return (
        a.join(b, ["block_id", "block_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash_blocks(sig: Column, n_blocks: int = 4) -> Column:
    """Pack a bit-array column into n_blocks integers (for the embedding
    sign-LSH, where the bit array is the sign pattern of the vector)."""
    width = 64 // n_blocks
    return F.array(
        *[
            F.aggregate(
                F.slice(sig, b * width + 1, width),
                F.lit(0).cast("long"),
                lambda acc, bit: acc * 2 + bit,
            )
            for b in range(n_blocks)
        ]
    )


def lsh_probability(s: float, bands: int, rows: int) -> float:
    """P(candidate | Jaccard = s) for the banding scheme: 1 − (1 − s^r)^b
    (the MMDS S-curve, Leskovec/Rajaraman/Ullman ch. 3)."""
    return 1.0 - (1.0 - s**rows) ** bands


def tune_bands(
    threshold: float, k: int, *, fn_weight: float = 1.0, fp_weight: float = 1.0
) -> tuple[int, int]:
    """(bands, rows) for a k-hash signature that best matches a Jaccard
    ``threshold``: among every exact factorization b·r = k, minimize the
    weighted S-curve error — the integral of missed-candidate
    probability above the threshold (false negatives) plus candidate
    probability below it (false positives), numerically on a fixed grid.
    Driver-side closed-form model search; deterministic (ties prefer
    more rows, i.e. fewer false positives, matching the usual
    verify-is-cheap regime where FNs are the real loss only when
    fn_weight says so).

    The rule of thumb (1/b)^(1/r) ≈ threshold falls out automatically:
    tune_bands(0.5, 32) → (8, 4) (curve centered at 0.59),
    tune_bands(0.8, 32) → (4, 8). The engine's own 16×2 default for the
    0.5-threshold near-dup pipeline is the RECALL-HEAVY choice (curve
    centered at 0.25 — misses almost nothing, verify filters the rest);
    it is what this tuner returns at fn_weight ≥ 5, i.e. when a missed
    near-duplicate costs ~5× a wasted verification."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    factorizations = [
        (k // r, r) for r in range(1, k + 1) if k % r == 0
    ]
    grid = [i / 200.0 for i in range(1, 200)]
    best = None
    for b, r in factorizations:
        fn = sum(
            1.0 - lsh_probability(s, b, r) for s in grid if s >= threshold
        )
        fp = sum(lsh_probability(s, b, r) for s in grid if s < threshold)
        cost = fn_weight * fn + fp_weight * fp
        key = (cost, -r)
        if best is None or key < best[0]:
            best = (key, (b, r))
    return best[1]
