"""The driver invokes the contract from ITS OWN vanilla SparkSession —
no UTC conf, no Arrow conf, foreign cwd, no PYTHONPATH. Run sentinel
queries that way in a subprocess (a second in-process session would just
getOrCreate the fixture's). Each sentinel guards a failure this setup
actually caught:

- q_http_roundtrip: DataSource class must pickle by value
  (ModuleNotFoundError in the worker otherwise);
- q_fn_json: result rendering must not depend on the Arrow conf
  (raw array columns repr differently with Arrow on/off);
- q_feed_scan: nanos-timestamp + UTC confs must be applied at
  load_table call time, not only in our session factory;
- q_llm_bm25_index / q_zorder_layout: warehouse-dir stores must build
  and serve under the DRIVER's cwd-resolved spark.sql.warehouse.dir.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").appName("vanilla-gate").getOrCreate()
import __spark_entry__ as E
from oracle_harness import compare
qs, os_ = E.queries(), E.oracle_sql()
sf = "/root/testdata/sf0.001"
for name in ["q_feed_scan", "q_fn_json", "q_http_roundtrip"]:
    r = compare(qs[name](spark, sf), os_[name], sf)
    assert r["match"], (name, {k: v for k, v in r.items() if k != "first_diffs"})
# warehouse-writing queries: the driver's session resolves
# spark.sql.warehouse.dir against ITS OWN cwd — these must build their
# stores there and serve rows (a read-only or scheme-carrying warehouse
# path would fail here first, not in the driver's report)
for name in ["q_llm_bm25_index", "q_zorder_layout"]:
    n = qs[name](spark, sf).count()
    assert n > 0, (name, n)
print("VANILLA_OK")
"""


def test_sentinel_queries_from_vanilla_session(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=tmp_path,  # foreign cwd, like the driver
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "VANILLA_OK" in out.stdout


def test_driver_slot_budget_and_ordering():
    """The driver's correctness harness records only the FIRST 50
    registered queries. Two invariants keep every oracle-backed query
    inside that window: at most 50 queries carry an oracle, and the
    registry partitions oracle-backed queries ahead of rows-only ones.
    A 51st oracle query must consciously displace one, never silently
    fall off the driver's report."""
    from http_feeds_spark.queries import registry

    reg = registry()
    oracle = [n for n, q in reg.items() if q.oracle is not None]
    assert len(oracle) <= 50, (
        f"{len(oracle)} oracle-backed queries exceed the driver's 50-slot "
        "cap; demote one to a pytest-side oracle (q_tombstone pattern)"
    )
    names = list(reg)
    assert names[: len(oracle)] == oracle
