"""Perceptual-hash image near-dup (functions/multimodal.perceptual_hash /
phash_near_dup): dHash parity with an independent Python reference,
stability under small same-length payload perturbations, planted-clone
recall through the banded pipeline, and the registered query's contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark.functions import multimodal as mm

PLANT = 10_000_000


def _py_dhash(b: bytes, rows: int = 8, cols: int = 8) -> int:
    """Independent reference of the stand-in dHash (same sampling rule)."""
    b = b or b"\x00"
    n = rows * (cols + 1)
    step = max(1, len(b) // n)
    grid = [b[i * step % len(b)] for i in range(n)]
    h = 0
    for r in range(rows):
        row = grid[r * (cols + 1) : (r + 1) * (cols + 1)]
        for c in range(cols):
            h = (h << 1) | int(row[c + 1] > row[c])
    return h - (1 << 64) if h >= 1 << 63 else h


def test_phash_matches_python_reference(spark):
    payloads = [
        (1, b"the quick brown fox jumps over the lazy dog" * 4),
        (2, bytes(range(256)) * 3),
        (3, b"\x00"),
        (4, b""),
    ]
    df = spark.createDataFrame(
        payloads, "doc_id long, payload binary"
    )
    got = {r.doc_id: r.phash for r in mm.perceptual_hash(df).collect()}
    want = {i: _py_dhash(b) for i, b in payloads}
    assert got == want


def test_phash_stable_under_small_perturbation(spark):
    """A few changed bytes (same length) move only adjacent grid cells —
    Hamming distance stays small; a different payload is far away."""
    base = (b"lorem ipsum dolor sit amet consectetur adipiscing elit " * 8)
    near = bytearray(base)
    near[40:43] = b"zzz"
    far = bytes(reversed(base))
    df = spark.createDataFrame(
        [(1, base), (2, bytes(near)), (3, far)], "doc_id long, payload binary"
    )
    h = {r.doc_id: r.phash for r in mm.perceptual_hash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[1], h[2]) <= 6
    assert ham(h[1], h[3]) > 10


def test_phash_near_dup_finds_planted_pairs(spark, sf_dir):
    """Every planted clone pairs with its source through the banded
    candidate join + exact Hamming verify — no all-pairs scan."""
    from http_feeds_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    clones = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + PLANT).alias("doc_id"),
        F.overlay("text", F.lit("zzz"), 10).alias("text"),
    )
    d = mm.with_binary_payload(base.unionByName(clones))
    pairs = mm.phash_near_dup(d, max_hamming=10)
    got = {(r.a, r.b) for r in pairs.collect()}
    for i in range(5):
        assert (i, i + PLANT) in got, f"planted clone {i} not recovered"
    # every returned pair respects the radius
    assert pairs.filter(F.col("hamming") > 10).count() == 0


def test_registered_query_contract(spark, sf_dir):
    """q_mm_phash_dedup: all 5 planted pairs present and flagged, and the
    result is deterministic across invocations."""
    from http_feeds_spark.queries import registry

    reg = registry()
    rows = lambda: [tuple(r) for r in reg["q_mm_phash_dedup"].fn(spark, sf_dir).collect()]
    first = rows()
    planted = [r for r in first if r[3]]
    assert len([r for r in planted if r[0] < 5 and r[1] == r[0] + 1_000_000]) == 5
    assert first == rows()
