#!/usr/bin/env python
"""Capture .explain('formatted') for every bench-headline query into
plans/r15/<name>_{before,after}.txt — the optimization round's plan
evidence. Usage: python plans/r15/capture_plans.py before|after [names...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r15")


def text_tier_frames(spark):
    from http_feeds_spark.operators import text_index as ti

    n_docs = int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", "50000"))
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    index_root = f"{wh}/bench_text/index_{n_docs}"
    porter_root = f"{wh}/bench_text/porter_index_{n_docs}"
    return {
        "text50k_bm25": lambda: ti.search(
            spark, index_root, ["window", "filter", "merge"], k=10
        ),
        "text50k_phrase": lambda: ti.phrase_search(
            spark, index_root, ["window", "filter"], k=10
        ),
        "text50k_proximity": lambda: ti.proximity_search(
            spark, index_root, ["window", "merge"], slop=3, k=10
        ),
        "text50k_proximity_any": lambda: ti.proximity_search_any(
            spark, index_root, ["window", "merge"], slop=3, k=10
        ),
        "text50k_porter_bm25": lambda: ti.search(
            spark, porter_root, ["window", "filter", "merge"], k=10
        ),
        "text50k_porter_phrase": lambda: ti.phrase_search(
            spark, porter_root, ["window", "filter"], k=10
        ),
    }


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    from bench import HEADLINE
    from http_feeds_spark.queries import registry
    from http_feeds_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    reg = registry()
    frames = {name: (lambda n=name: reg[n].fn(spark, SF_DIR)) for name in HEADLINE}
    frames.update(text_tier_frames(spark))
    for name, mk in frames.items():
        if only and name not in only:
            continue
        try:
            df = mk()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            text = f"EXPLAIN FAILED: {e!r}\n"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes")


if __name__ == "__main__":
    main()
