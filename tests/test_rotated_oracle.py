"""Slot-rotation protocol (SURVEY.md §8, r14): queries rotated OUT of the
driver's 50 oracle slots keep their FULL DuckDB value parity enforced here
on every pytest run, via the registry's `pytest_oracle` field — rotation
changes who the checker is, never whether the check runs.

Also pins the slot invariants the rotation must preserve:
- exactly 50 oracle-backed queries (the driver records only the first 50,
  so a 51st would be silently unchecked while LOOKING checked);
- oracle-backed queries register ahead of every rows-only query;
- oracle / pytest_oracle are mutually exclusive per query.
"""

from __future__ import annotations

import pytest

from http_feeds_spark.queries import registry

DRIVER_SLOT_CAP = 50


def _rotated_names() -> list[str]:
    return sorted(n for n, q in registry().items() if q.pytest_oracle is not None)


def test_slot_invariants():
    reg = registry()
    oracle_backed = [n for n, q in reg.items() if q.oracle is not None]
    assert len(oracle_backed) == DRIVER_SLOT_CAP, (
        len(oracle_backed),
        "driver records only the first 50 — every oracle must own a real slot",
    )
    # oracle-backed strictly ahead of rows-only in registration order
    kinds = [q.oracle is not None for q in reg.values()]
    assert kinds == sorted(kinds, reverse=True)
    for n, q in reg.items():
        assert not (q.oracle is not None and q.pytest_oracle is not None), n


def test_r15_rotation_set_documented():
    """Rotation wave 2 (r15): the seven r14 rotated-out queries cycled
    back into driver slots and seven composition shapes rotated out in
    their place — establishing the alternation cadence so every oracle
    string periodically re-earns a driver-run green row. Update this pin
    (and SURVEY §8) when rotating again."""
    assert _rotated_names() == [
        "q_fn_date",
        "q_join_left",
        "q_join_semi",
        "q_rollup",
        "q_stream_session",
        "q_union",
        "q_window_frame",
    ]
    # the full r14+r15 promoted set all hold real driver slots
    promoted = [
        # r14 wave
        "q_tombstone",
        "q_history_scd2",
        "q_llm_bm25",
        "q_llm_boilerplate",
        "q_llm_substr_scrub",
        "q_llm_datacard",
        "q_llm_chunks",
        # r15 wave (cycled back in)
        "q_batch_page",
        "q_cube",
        "q_except",
        "q_fn_math",
        "q_intersect",
        "q_join_anti",
        "q_stream_sliding",
    ]
    reg = registry()
    for name in promoted:
        assert reg[name].oracle is not None, name


@pytest.mark.parametrize("name", _rotated_names())
def test_rotated_out_parity(spark, sf_dir, name):
    """Full driver-strict DuckDB parity for every rotated-out query."""
    from tests.oracle_harness import compare

    q = registry()[name]
    report = compare(q.fn(spark, sf_dir), q.pytest_oracle, sf_dir)
    assert report["match"], {k: v for k, v in report.items() if k != "first_diffs"}
