"""Z-order layout (operators/layout.py): interleave correctness, the
clustering-quality claim, and the physical write path."""

from __future__ import annotations

import pyspark.sql.functions as F

from kinesis_dstream_spark.operators import layout
from kinesis_dstream_spark.tables import load_table


def _py_interleave(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_model(spark):
    rows = [(x, y) for x in (0, 1, 5, 100, 255) for y in (0, 3, 77, 200, 255)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", layout.interleave_bits(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _py_interleave(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_balances_dimensions(spark, sf_dir):
    """Single-dim layouts leave the OTHER dim's span near the full range;
    z-order must bound both. The assertable invariant: z-order's worse
    dim beats each single-dim layout's worse dim."""
    stats = {
        r["layout"]: r
        for r in layout.zorder_layout_stats(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert set(stats) == {"by_ts", "by_user", "zorder"}
    z = stats["zorder"]
    z_worst = max(z["avg_user_span"], z["avg_ts_span"])
    for single in ("by_ts", "by_user"):
        s = stats[single]
        assert z_worst < max(s["avg_user_span"], s["avg_ts_span"]), (single, stats)


def test_write_zorder_files_balance_dimensions(spark, sf_dir, tmp_path):
    """Read back each written file separately: a time-clustered write
    leaves every file spanning the FULL user range (no skipping on user
    predicates); z-ordered files must average a strictly smaller
    worst-dimension span, i.e. min/max stats prune on both dims.

    (Box *area* is not asserted: with the fixture's handful of distinct
    users, equal-count range partitioning on the skewed z distribution
    can straddle Morton-block boundaries, and area comparisons flip on
    sampling noise. Worst-dim balance is the scale-stable property.)"""
    ev = load_table(spark, sf_dir, "events")
    zpath = str(tmp_path / "zorder")
    tpath = str(tmp_path / "bytime")
    layout.write_zorder(ev, zpath, n_files=8)
    (
        layout.with_zorder_key(ev)
        .repartitionByRange(8, "qy")
        .sortWithinPartitions("qy")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    def avg_worst_span(path: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("qx") - F.min("qx") + 1).alias("sx"),
                (F.max("qy") - F.min("qy") + 1).alias("sy"),
            )
        )
        row = per_file.agg(F.avg(F.greatest("sx", "sy"))).first()
        return float(row[0])

    assert avg_worst_span(zpath) < avg_worst_span(tpath)


def test_zorder_write_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "z2")
    layout.write_zorder(ev, path, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.select(F.countDistinct("event_id")).first()[0] == ev.count()


def test_compact_small_files_conserves_and_bins(spark, sf_dir):
    """Rows conserved through the rewrite; after-count equals the bin
    formula; the compacted census is read from disk, not claimed."""
    import glob
    import os
    import shutil
    import tempfile

    from kinesis_dstream_spark.operators.layout import compact_small_files

    tag = os.path.basename(os.path.normpath(sf_dir))
    shutil.rmtree(f"{tempfile.gettempdir()}/kds_compact_u{os.getuid()}_{tag}", ignore_errors=True)
    rows = {r.stage: r for r in compact_small_files(spark, sf_dir).collect()}
    assert rows["before"].n_rows == rows["after"].n_rows
    assert rows["before"].n_files == 40
    assert rows["after"].n_files == -(-rows["after"].n_rows // 5000)
    # disk truth
    comp = f"{tempfile.gettempdir()}/kds_compact_u{os.getuid()}_{tag}/compacted"
    assert len(glob.glob(os.path.join(comp, "*.parquet"))) == rows["after"].n_files


def test_hilbert_curve_bijective_and_unit_steps():
    """Exhaustive over full grids at several widths: the key is a
    bijection onto [0, 4^bits) and consecutive keys are Manhattan-
    adjacent cells — the defining Hilbert locality property (Morton
    fails the adjacency test at every quadrant seam)."""
    import numpy as np

    for bits in (2, 3, 4, 6):
        n = 1 << bits
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = layout._hilbert_d_numpy(xs.ravel(), ys.ravel(), bits)
        assert sorted(d.tolist()) == list(range(n * n)), bits
        order = np.argsort(d)
        px, py = xs.ravel()[order], ys.ravel()[order]
        steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
        assert (steps == 1).all(), bits
        # Morton, for contrast, jumps at seams
        z = np.zeros(n * n, np.int64)
        for i in range(bits):
            z += ((xs.ravel() >> i) & 1) << (2 * i)
            z += ((ys.ravel() >> i) & 1) << (2 * i + 1)
        zorder = np.argsort(z)
        zsteps = np.abs(np.diff(xs.ravel()[zorder])) + np.abs(
            np.diff(ys.ravel()[zorder])
        )
        assert (zsteps > 1).any(), bits


def test_hilbert_layout_tightens_boxes_vs_zorder(spark, sf_dir):
    """The operator's reason to exist: on the fixture the Hilbert
    layout's avg per-file bounding-box area must not exceed z-order's."""
    ev = load_table(spark, sf_dir, "events")
    rows = {r["layout"]: r for r in layout.hilbert_layout_stats(ev).collect()}
    assert set(rows) == {"hilbert", "zorder"}
    assert rows["hilbert"]["avg_box_area"] <= rows["zorder"]["avg_box_area"]
