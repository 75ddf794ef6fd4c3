"""Randomized property test: read_model ≡ a pure-Python reference on
arbitrary event logs (seeded RNG, one Spark job for all logs).

The spec's compaction + tombstone semantics (README.md:181-292) reduce
to: per subject keep the max-seq event; drop the subject if that event
is a DELETE. Fuzzing subjects/methods/orderings guards the window
implementation against edge cases the fixture tables never produce
(single-event subjects, all-DELETE subjects, DELETE-then-PUT revival,
interleavings)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _reference(events):
    """events: [(subject, seq, method)] → {subject: (seq, method)} minus
    tombstoned subjects."""
    latest = {}
    for subject, seq, method in events:
        if subject not in latest or seq > latest[subject][0]:
            latest[subject] = (seq, method)
    return {s: v for s, v in latest.items() if v[1] != "DELETE"}


def test_read_model_matches_reference_on_random_logs(spark):
    from http_feeds_spark.operators import feed as ops

    rng = random.Random(42)
    events = []
    for log in range(50):
        n_subjects = rng.randint(1, 8)
        n_events = rng.randint(1, 60)
        seqs = rng.sample(range(1, 10_000), n_events)
        for seq in seqs:
            subject = f"log{log}:s{rng.randrange(n_subjects)}"
            method = rng.choice(["PUT", "PUT", "PUT", "DELETE", None])
            events.append((subject, seq, method))
    rng.shuffle(events)  # arrival order ≠ seq order

    df = spark.createDataFrame(events, "subject string, seq long, method string")
    got = {
        r.subject: (r.seq, r.method)
        for r in ops.read_model(df).collect()
    }
    # absent method defaults to PUT (README.md:314)
    expected = _reference(
        [(s, q, m if m is not None else "PUT") for s, q, m in events]
    )
    normalized = {s: (q, m if m is not None else "PUT") for s, (q, m) in got.items()}
    assert normalized == expected
    # compact (without tombstone drop) keeps exactly one row per subject
    compacted = ops.compact(df)
    assert compacted.count() == compacted.select("subject").distinct().count()
