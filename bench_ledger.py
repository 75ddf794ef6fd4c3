#!/usr/bin/env python
"""Standing per-query local reference ledger (r12, verdict item 1).

The drift protocol in BASELINE.md judges a drive by normalizing against
the builder's idle-box reference — but through r11 only a few queries
had a recorded reference row, so every drifted row (ann_batch r9,
read_model r10, dedup_near r11) cost a bespoke A/B investigation. This
harness records the WHOLE headline set in one idle-box pass so future
adjudications are arithmetic:

- min-of-5 per query (vs bench.py's min-of-3), same noop-sink timing,
  same registry entries, same text-tier search rows;
- a calib probe (bench.py's fixed-cost JVM job) BEFORE and AFTER the
  sweep — a drifted calib pair means the box was not quiet and the
  ledger run should be discarded, not recorded;
- refuses to run when the 1-minute loadavg exceeds 1.0 (a ledger is a
  reference, not a drive — bench.py's 5.0 gate does not apply).

Output: one JSON line {"ledger": {name: sec}, "calib_before": s,
"calib_after": s, ...} plus a ready-to-paste markdown table on stderr.
Paste the table into BASELINE.md's ledger section. Reading a later
drive: normalized = drive_row x (ledger_calib / drive_calib); >2x the
ledger row = plan regression, else environment (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the maintained harness: HEADLINE, text tiers, calib

REPS = 5


def main() -> None:
    load = os.getloadavg()[0]
    if load > 1.0 and "--force" not in sys.argv:
        sys.exit(f"loadavg {load:.2f} > 1.0: a ledger needs an idle box "
                 "(pass --force to override and note it in BASELINE.md)")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from http_feeds_spark.queries import registry
    from http_feeds_spark.session import get_spark

    spark = get_spark(app_name="http-feeds-spark-ledger")
    reg = registry()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm-up
    calib_before = bench._calibrate(spark)

    ledger: dict[str, float] = {}
    for name in bench.HEADLINE:
        fn = reg[name].fn
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        ledger[name] = round(min(runs), 3)

    # the 50K text tiers (search rows only; builds reuse the warehouse)
    bench._bench_text_tier(spark, ledger)
    bench._bench_porter_tier(spark, ledger)

    calib_after = bench._calibrate(spark)
    out = {
        "metric": "per_query_reference_ledger",
        "reps": REPS,
        "ledger": ledger,
        "calib_before": calib_before,
        "calib_after": calib_after,
        "legacy12_subtotal": round(
            sum(ledger[n] for n in bench.LEGACY12 if n in ledger), 3
        ),
        "sf_dir": sf_dir,
        "loadavg_at_start": round(load, 2),
    }
    print(json.dumps(out))
    lines = ["| query | idle min-of-5 (s) |", "|---|---|"]
    lines += [f"| {n} | {s} |" for n, s in ledger.items()]
    lines += [f"| calib_s (before/after) | {calib_before} / {calib_after} |"]
    print("\n".join(lines), file=sys.stderr)


if __name__ == "__main__":
    main()
