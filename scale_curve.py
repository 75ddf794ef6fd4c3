#!/usr/bin/env python
"""sf0.1 → sf1.0 scaling curve (r14): the first measured data point above
sf0.1 for SCALING.md's claimed shapes.

Generates the deterministic 10× tier (http_feeds_spark.scale_tier) into
the warehouse, then times the scale set — the legacy-12 plus the
dedup/ANN/substr heads — at BOTH scale factors (min-of-3, noop sink, the
bench.py protocol with its load gate and calib probe) and prints one JSON
line with per-query (sf0.1 s, sf1.0 s, ratio).

Reading the ratios: FACTOR× data should cost ≤ ~FACTOR× for linear
map-heavy plans and ~FACTOR·log-ish for shuffle-bound ones; fixed-output
/ partition-pruned paths (top-k, persisted-index search) should come in
well BELOW FACTOR because overhead and pruned reads dominate. Any query
far ABOVE the factor (the script flags > 1.6× factor) scales worse than
its SCALING.md inventory row claims — that is a found plan bug, exactly
the class the r10 50K text tier caught.

Measured r14 finding: at FACTOR=10 (sf1.0 ≈ 170 MB) every ratio lands in
0.9-2.6 — the whole set is inside this box's 32-core job-overhead floor,
which proves "no blowup" but does not bind the shapes. Set
SPARK_GRAFT_SCALE_FACTOR=100 (sf10 ≈ 1.7 GB, the BASELINE.md curve) to
put seconds of real work behind each query so the ratios discriminate.

q_llm_pipeline is intentionally absent: it is a composition whose stages
(dedup_near, groups, substr, quality) appear individually — the ledger's
decomposition argument (BASELINE.md r12).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import LEGACY12, _calibrate, _load_gate  # noqa: E402

HEADS = [
    "q_llm_dedup_groups",   # LSH + connected-components closure
    "q_llm_ann_batch",      # IVF ANN incl. per-call Lloyd training
    "q_llm_ann_index",      # search-only ANN (partition-pruned scan)
    "q_llm_substr_scrub",   # stride-1 window span dedup
    "q_llm_compress_quality",  # Arrow pandas-UDF map-only tier
]
SCALE_SET = LEGACY12 + HEADS


def main() -> None:
    """Two modes. Default: sf0.1 -> sf{factor/10} single-level tier over
    the full SCALE_SET (the r14 rungs). COMPOSED mode (r15, the sf100
    rung): SPARK_GRAFT_SCALE_COMPOSE=1 builds dst from the EXISTING
    sf10 tier (factor 10 on top, key offset cleared past level 1's
    range, fresh salt letter — see ensure_scale_tier) and compares
    sf10 -> sf100 over SPARK_GRAFT_SCALE_QUERIES (comma list, default
    the non-CPU-monster subset below; min-of-2, each rep is ~10 the
    work of an sf10 rep)."""
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    compose = os.environ.get("SPARK_GRAFT_SCALE_COMPOSE") == "1"
    gate = _load_gate()

    from http_feeds_spark.queries import registry
    from http_feeds_spark.scale_tier import ensure_scale_tier
    from http_feeds_spark.session import get_spark

    spark = get_spark(app_name="http-feeds-spark-scale-curve")
    reg = registry()

    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    if compose:
        # level 1 must exist (the r14 sf10 artifact); level 2 stacks on it
        base_dir = f"{wh}/scale_sf10.0"
        ensure_scale_tier(spark, src_dir, base_dir, factor=100)
        src_dir, factor, sf_label = base_dir, 10, 100.0
        dst_dir = f"{wh}/scale_sf{sf_label}"
        t0 = time.perf_counter()
        built = ensure_scale_tier(
            spark, base_dir, dst_dir, factor=10,
            key_offset=10_000_000_000, salt="y",
        )
    else:
        sf_label = round(0.1 * factor, 1)
        dst_dir = f"{wh}/scale_sf{sf_label}"
        t0 = time.perf_counter()
        built = ensure_scale_tier(spark, src_dir, dst_dir, factor=factor)
    build_s = round(time.perf_counter() - t0, 3) if built else 0.0

    spark.read.parquet(f"{src_dir}/lineitem.parquet").count()  # warm-up
    calib_s = _calibrate(spark)

    names = SCALE_SET
    reps = 3
    if compose:
        reps = 2  # each sf100 rep is real minutes; the ratio is the datum
        names = os.environ.get(
            "SPARK_GRAFT_SCALE_QUERIES",
            # the subset whose sf10 walls leave room for a 10x rep:
            # shuffle-bound heads + broadcast/pruned/fixed-output plans.
            # substr_scrub/tokens are excluded: already proven linear
            # map CPU at sf10, a 10-minute rep adds no information.
            "q_agg_group,q_join_broadcast,q_join_inner,q_window_rank,"
            "q_topk,q_read_model,q_stream_tumbling,q_llm_dedup_exact,"
            "q_llm_cosine,q_llm_dedup_near,q_llm_textstats,"
            "q_llm_dedup_groups,q_llm_ann_index",
        ).split(",")

    def bench(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = reg[name].fn
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            out[name] = round(min(runs), 3)
        return out

    small = bench(src_dir)
    large = bench(dst_dir)

    base_label = "sf10_s" if compose else "sf0.1_s"
    curve = {
        name: {
            base_label: small[name],
            f"sf{sf_label}_s": large[name],
            "ratio": round(large[name] / small[name], 2),
        }
        for name in names
    }
    suspects = [n for n, r in curve.items() if r["ratio"] > 1.6 * factor]
    print(
        json.dumps(
            {
                "metric": (
                    f"scale_curve_sf10_to_sf{sf_label}"
                    if compose
                    else f"scale_curve_sf01_to_sf{sf_label}"
                ),
                "factor": factor,
                "queries": curve,
                "superlinear_suspects": suspects,
                "tier_build_s": build_s,
                "calib_s": calib_s,
                "loadavg_1m": round(os.getloadavg()[0], 2),
                **gate,
            }
        )
    )


if __name__ == "__main__":
    main()
