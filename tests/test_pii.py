"""PII scrub (functions/pii.py): counts and redaction match Python `re`
exactly (same pattern text, different engine), the composition order is
load-bearing, scrubbing is idempotent, and the registered query leaves
zero residual PII."""

from __future__ import annotations

import re

from http_feeds_spark.functions import pii

CASES = [
    "mail me at alice.smith+test@example.co.uk today",
    "server at 192.168.0.1 and backup 10.0.0.255 rebooted",
    "call (555) 867-5309 or +1 555.867.5309 now",
    "ssn 123-45-6789 on file",
    "alice@example.com from 10.0.0.1 ssn 987-65-4321 tel 555-123-4567",
    "no pii here at all",
    "",
    "almost an ip 1.2.3 and almost a phone 555-12-3456",
]


def _ref_counts(text: str) -> dict[str, int]:
    out = {}
    for kind, pat, _ in pii.PII_PATTERNS:
        out[kind] = len(re.findall(pat, text))
    return out


def _ref_scrub(text: str) -> str:
    for _, pat, token in pii.PII_PATTERNS:
        text = re.sub(pat, token, text)
    return text


def test_counts_and_scrub_match_python_re(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in pii.add_pii_columns(df, "text").collect()}
    for i, t in enumerate(CASES):
        want = _ref_counts(t)
        for kind in want:
            assert got[i][f"n_pii_{kind}"] == want[kind], (i, kind, t)
        assert got[i]["n_pii"] == sum(want.values())
        assert got[i]["scrubbed"] == _ref_scrub(t), (i, t)


def test_order_is_load_bearing_email_before_ip(spark):
    """An email whose domain embeds a dotted quad must be absorbed WHOLE
    by the email pattern — were IP applied first it would punch an <IP>
    into the middle of the address and the email regex could no longer
    match the remainder."""
    t = "reach bob.1@mail.123.456.78.90.example.com ok"
    assert re.search(pii.IPV4_RE, t)  # the quad IS an IP match on its own
    df = spark.createDataFrame([(1, t)], "doc_id long, text string")
    row = pii.add_pii_columns(df, "text").collect()[0]
    assert row.scrubbed == "reach <EMAIL> ok"
    assert "<IP>" not in row.scrubbed


def test_scrub_is_idempotent(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    once = pii.add_pii_columns(df, "text").select("doc_id", "scrubbed")
    twice = pii.add_pii_columns(once.withColumnRenamed("scrubbed", "text"), "text")
    for r in twice.collect():
        assert r.text == r.scrubbed


def test_registered_query_zero_residual_and_planted_caught(spark, sf_dir):
    from http_feeds_spark.queries.llm import q_llm_pii

    rows = q_llm_pii(spark, sf_dir).collect()
    assert all(r.residual_pii == 0 for r in rows)
    planted = [r for r in rows if r.planted]
    assert planted and all(
        r.n_pii_email >= 1 and r.n_pii_ip >= 1 and r.n_pii_ssn >= 1 and r.n_pii_phone >= 1
        for r in planted
    )
    clean = [r for r in rows if not r.planted]
    assert all(r.n_pii == 0 for r in clean)  # the corpus itself is PII-free
