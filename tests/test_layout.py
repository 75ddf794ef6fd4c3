"""Z-order layout (operators/layout.py): the locality guarantee the
curve exists for — point/range predicates on EITHER dimension overlap
few per-file rectangles, where a single-sorted layout prunes only its
own sort column — plus read-back correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_feeds_spark.operators import layout as ly


def _events(spark, sf_dir):
    from http_feeds_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _overlap_frac(stats, col, lo, hi):
    rows = stats.collect()
    n = len(rows)
    hit = sum(1 for r in rows if r[f"max_{col}"] >= lo and r[f"min_{col}"] <= hi)
    return hit / n, n


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order by (user_id, event_id): a narrow range on EITHER column
    must overlap a minority of file rectangles. The ts-sorted control
    layout prunes event_id-ish predicates but overlaps ~ALL files on
    user_id — the difference IS the operator's value."""
    ev = _events(spark, sf_dir)
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    ly.write_zordered(ev, zpath, ["user_id", "event_id"], n_files=16, bits=6)
    # control: the landing zone's natural time-sort
    ev.repartitionByRange(16, "ts").sortWithinPartitions("ts").write.parquet(spath)

    lo_u, hi_u = 10, 40  # narrow user slice
    zs = ly.file_stats(spark, zpath, ["user_id", "event_id"])
    ss = ly.file_stats(spark, spath, ["user_id", "event_id"])

    z_user, zn = _overlap_frac(zs, "user_id", lo_u, hi_u)
    s_user, sn = _overlap_frac(ss, "user_id", lo_u, hi_u)
    assert zn >= 8 and sn >= 8  # enough files for the fractions to mean much
    assert z_user <= 0.5, f"z-order user_id overlap {z_user}"
    assert s_user >= 0.9, f"control should NOT prune user_id ({s_user})"

    # the curve still prunes its other dimension too
    max_e = ev.agg(F.max("event_id")).collect()[0][0]
    z_eid, _ = _overlap_frac(zs, "event_id", 0, max_e // 8)
    assert z_eid <= 0.6, f"z-order event_id overlap {z_eid}"


def test_zordered_read_back_is_exact(spark, sf_dir, tmp_path):
    """Layout must never change query answers: a filtered read over the
    Z-ordered files equals the same filter on the source."""
    ev = _events(spark, sf_dir)
    zpath = str(tmp_path / "z")
    ly.write_zordered(ev, zpath, ["user_id", "event_id"], n_files=8, bits=5)
    back = spark.read.parquet(zpath)
    pred = (F.col("user_id").between(10, 40)) & (F.col("value") > 0)
    want = {r.event_id for r in ev.where(pred).collect()}
    got = {r.event_id for r in back.where(pred).collect()}
    assert got == want and len(want) > 0
    assert back.count() == ev.count()


def test_morton_interleave_is_correct(spark):
    """Bit-exact Morton check on a tiny frame: bin bits must interleave
    as b*d + i (a swapped or shifted interleave silently destroys
    locality without failing any scan)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3)], "a long, b long"
    ).select(F.col("a").alias("__bin_x"), F.col("b").alias("__bin_y"))
    z = df.select(ly.morton_value(["x", "y"], bits=2).alias("z")).collect()
    # x contributes even bit positions, y odd: (x,y)=(1,0)->1, (0,1)->2,
    # (3,3)->15
    assert [r.z for r in z] == [0, 1, 2, 15]
