"""Data-layout clustering: z-order (Morton) interleaving for multi-dim
file skipping (SURVEY §2B E-1/E-6 depth).

At 100 TB the cheapest predicate is the one that never reads the file:
parquet min/max footer stats prune whole files when the data is
CLUSTERED on the filter column. Sorting clusters exactly one dimension —
a corpus laid out by time answers time filters with near-perfect
skipping but scans everything for a user/domain filter. The standard
multi-dimensional fix (Delta OPTIMIZE ZORDER, Hudi/Iceberg z-ordering)
is to sort by the Z-ORDER VALUE — the bit-interleave of the quantized
dimensions — so every file covers a small RECTANGLE of the key space and
min/max stats prune on BOTH dimensions.

Everything here is integer arithmetic on JVM-side expressions (exact,
DuckDB-reproducible), and the layout machinery is Spark-native:
quantization is fixed-bin integer scaling off a min/max aggregate (no
global sort, unlike ntile), and the physical write is
``repartitionByRange`` on the z-value — Spark's range partitioner
samples boundaries, so the 100 TB path never total-sorts either.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import os

# uid scoping for shared temp-dir store paths (r9-ADVICE: predictable
# /tmp names are a multi-user pre-creation/race hazard)
_UID = getattr(os, "getuid", lambda: 0)()

Z_BITS = 8  # 8 bits/dim -> 16-bit z-values, 256x256 grid


def interleave_bits(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton z-value of two `bits`-bit non-negative ints: x takes the
    even bit positions, y the odd. Pure integer shifts/masks — identical
    in any engine with 64-bit integer semantics."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _quantize(col: Column, lo: Column, hi: Column, bits: int = Z_BITS) -> Column:
    """Fixed-bin quantization to [0, 2^bits): ((v-lo)*2^bits) div (hi-lo+1).

    Integer div keeps it exact and engine-portable. Fixed bins (not
    quantiles) are the scale-friendly choice — one min/max aggregate
    instead of a global sort; skew across bins only unbalances file
    sizes, which the range partitioner re-balances at write time.
    """
    return F.floor(
        ((col.cast("long") - lo) * F.lit(1 << bits)) / (hi - lo + F.lit(1))
    ).cast("long")


def with_zorder_key(
    events: DataFrame, dim_x: str = "user_id", dim_y_ms: str = "ts", bits: int = Z_BITS
) -> DataFrame:
    """Attach quantized dims (qx, qy) and their z-value to each row.

    The min/max bounds ride a broadcast single-row cross join (scalars
    only — the classic pattern for corpus-level constants; no driver
    collect in the plan, so the whole thing stays one lazy DataFrame).
    """
    # events.ts reads as TIMESTAMP_NTZ; container TZ is UTC, so the cast
    # to TIMESTAMP is value-preserving (reference_ops.py:171-174 pattern)
    ms = F.unix_millis(F.col(dim_y_ms).cast("timestamp"))
    bounds = events.agg(
        F.min(dim_x).alias("lo_x"),
        F.max(dim_x).alias("hi_x"),
        F.min(ms).alias("lo_y"),
        F.max(ms).alias("hi_y"),
    )
    qx = _quantize(F.col(dim_x), F.col("lo_x"), F.col("hi_x"), bits)
    qy = _quantize(ms, F.col("lo_y"), F.col("hi_y"), bits)
    return (
        events.join(F.broadcast(bounds))
        .withColumn("qx", qx)
        .withColumn("qy", qy)
        .withColumn("zval", interleave_bits(F.col("qx"), F.col("qy"), bits))
    )


def zorder_layout_stats(
    events: DataFrame, n_buckets: int = 64, bits: int = Z_BITS
) -> DataFrame:
    """Quantified skipping benefit of z-order vs single-dim layouts.

    Assigns every row to one of `n_buckets` "files" under three layouts —
    clustered by time, clustered by user, clustered by z-value (each
    bucket = an equal slice of that key's range, what a range-partitioned
    write produces) — then reports the average per-file bounding box over
    the (user, time) grid: avg span of each dim and avg box area, all in
    quantized units. Small area ⇒ min/max stats prune on both dims.

    Deterministic integer arithmetic end-to-end → DuckDB-oracle-backed.
    The single unpivoted pass (one explode, one shuffle on
    (layout, bucket)) scans the corpus once for all three layouts.
    """
    keyed = with_zorder_key(events, bits=bits)
    shift = 2 * bits  # z-values live in [0, 2^(2*bits))
    layouts = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("by_ts").alias("layout"),
                    F.floor(F.col("qy") * n_buckets / F.lit(1 << bits))
                    .cast("long")
                    .alias("bucket"),
                ),
                F.struct(
                    F.lit("by_user").alias("layout"),
                    F.floor(F.col("qx") * n_buckets / F.lit(1 << bits))
                    .cast("long")
                    .alias("bucket"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.floor(F.col("zval") * n_buckets / F.lit(1 << shift))
                    .cast("long")
                    .alias("bucket"),
                ),
            )
        ).alias("lb"),
        "qx",
        "qy",
    ).select("lb.layout", "lb.bucket", "qx", "qy")
    per_file = layouts.groupBy("layout", "bucket").agg(
        (F.max("qx") - F.min("qx") + 1).alias("span_x"),
        (F.max("qy") - F.min("qy") + 1).alias("span_y"),
        F.count("*").alias("n_rows"),
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.round(F.avg("span_x"), 4).alias("avg_user_span"),
            F.round(F.avg("span_y"), 4).alias("avg_ts_span"),
            F.round(F.avg(F.col("span_x") * F.col("span_y")), 4).alias("avg_box_area"),
        )
        .orderBy("layout")
    )


def write_zorder(
    events: DataFrame, path: str, n_files: int = 16, bits: int = Z_BITS
) -> None:
    """Materialize the z-ordered layout: range-partition on the z-value
    (sampled boundaries — no total sort) and sort WITHIN each partition
    so parquet row-group stats are tight too. One file per partition;
    each covers a compact z-range ⇒ a small (user, time) rectangle."""
    (
        with_zorder_key(events, bits=bits)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


_COMPACT_SMALL_FILES = 40
_COMPACT_ROWS_PER_FILE = 5000


def compact_small_files(
    spark,
    sf_dir: str,
    rows_per_file: int = _COMPACT_ROWS_PER_FILE,
) -> DataFrame:
    """Small-file compaction — the table-maintenance job every
    long-running ingest needs: streaming/micro-batch writers emit a
    file per (trigger × partition), and a 100 TB table quietly decays
    into millions of KB-sized files whose open/footer/seek overhead
    dominates scans and whose listing stalls planning. Compaction
    rewrites them into row-budgeted files.

    Demo shape: stage the events fixture as 40 tiny files (the decay
    state), then compact to ⌈rows / rows_per_file⌉ files via
    ``repartition(k)`` — an all-to-all that writes exactly k
    uniformly-sized files. At 100 TB the same job runs per partition
    (compact WITHIN date/hour directories, preserving partition
    pruning), picks k from target BYTES (file-size stats, not row
    counts), and uses ``repartitionByRange`` on the table's cluster
    key + ``maxRecordsPerFile`` so compaction also restores sort
    locality — the zorder writer above is exactly that path.

    Returns the before/after accounting read back FROM DISK (file
    census + re-read row counts), which is what makes the oracle
    honest: rows must be conserved and the file count must equal the
    computed bin count.
    """
    import glob
    import os
    import shutil
    import tempfile

    from kinesis_dstream_spark.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"{tempfile.gettempdir()}/kds_compact_u{_UID}_{tag}"
    small, compacted = os.path.join(base, "small"), os.path.join(base, "compacted")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    if not os.path.exists(os.path.join(small, "_SUCCESS")):
        shutil.rmtree(base, ignore_errors=True)
        ev.repartition(_COMPACT_SMALL_FILES).write.mode("overwrite").parquet(small)
    n_rows = spark.read.parquet(small).count()
    k = -(-n_rows // rows_per_file)  # ceil
    spark.read.parquet(small).repartition(k).write.mode("overwrite").parquet(compacted)

    def census(path: str) -> tuple[int, int]:
        files = glob.glob(os.path.join(path, "*.parquet"))
        return len(files), spark.read.parquet(path).count()

    bf, br = census(small)
    af, ar = census(compacted)
    return spark.createDataFrame(
        [("before", bf, br), ("after", af, ar)],
        "stage string, n_files int, n_rows long",
    )


COMPACT_SMALL_FILES_SQL = f"""
WITH n AS (SELECT count(*) AS c FROM events)
SELECT 'before' AS stage, {_COMPACT_SMALL_FILES} AS n_files,
       CAST(c AS BIGINT) AS n_rows FROM n
UNION ALL
SELECT 'after', CAST((c + {_COMPACT_ROWS_PER_FILE} - 1) // {_COMPACT_ROWS_PER_FILE} AS INT),
       CAST(c AS BIGINT) FROM n
"""


def _hilbert_d_numpy(qx, qy, bits: int):
    """Vectorized Hilbert xy→d: per-bit rotate-reflect recurrence,
    s-local rotation variant — bijective with unit-step adjacency at
    every bit width (property-tested exhaustively over full grids in
    tests/test_layout.py). int64 throughout."""
    import numpy as np

    x = qx.astype(np.int64).copy()
    y = qy.astype(np.int64).copy()
    d = np.zeros_like(x)
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        refl = (ry == 0) & (rx == 1)
        nx = np.where(ry == 0, np.where(refl, s - 1 - y, y), x)
        ny = np.where(ry == 0, np.where(refl, s - 1 - x, x), y)
        x, y = nx, ny
    return d


def hilbert_key(qx: Column, qy: Column, bits: int = Z_BITS) -> Column:
    """Hilbert-curve index of a (qx, qy) grid cell — the stronger
    locality clustering (Databricks liquid clustering, Iceberg's
    hilbert ordering): unlike Morton order, the curve never jumps, so
    every run of consecutive keys covers a CONNECTED blob, tightening
    per-file bounding boxes beyond z-order's quadrant seams.

    Implementation note (measured): the recurrence REWRITES both
    coordinates each round from both coordinates, so an unrolled
    Column-expression version grows ~3× per bit — at 8 bits that
    compiled to a 111 MiB task binary and a 400 s stage. The scale
    path is an Arrow-vectorized pandas UDF running the identical
    recurrence as `bits` rounds of NumPy vector ops (deterministic
    int64 — the oracle twin runs the same rounds as SQL CTEs, where
    per-round materialization is free). This is the documented
    "drop to Pandas UDF when built-ins genuinely can't express it"
    case: the z-interleave IS expressible linearly; Hilbert isn't.
    """

    @F.pandas_udf("long")
    def _h(px: pd.Series, py: pd.Series) -> pd.Series:
        return pd.Series(_hilbert_d_numpy(px.to_numpy(), py.to_numpy(), bits))

    return _h(qx.cast("long"), qy.cast("long"))


def hilbert_layout_stats(
    events: DataFrame, n_buckets: int = 64, bits: int = Z_BITS
) -> DataFrame:
    """Head-to-head skipping benefit: z-order vs Hilbert layout on the
    same (user, time) grid, same equal-slice bucketing, same bounding-
    box metric as ``zorder_layout_stats`` — the measurement that
    justifies paying the (marginally costlier) Hilbert key at write
    time. Expected: Hilbert's avg_box_area ≤ z-order's (no quadrant
    seams), asserted in pytest rather than hardcoded.

    Same single-pass plan shape: one explode, one (layout, bucket)
    shuffle of quantized pairs.
    """
    shift = 2 * bits
    keyed = with_zorder_key(events, bits=bits).withColumn(
        "hval", hilbert_key(F.col("qx"), F.col("qy"), bits)
    )
    layouts = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.floor(F.col("hval") * n_buckets / F.lit(1 << shift))
                    .cast("long")
                    .alias("bucket"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.floor(F.col("zval") * n_buckets / F.lit(1 << shift))
                    .cast("long")
                    .alias("bucket"),
                ),
            )
        ).alias("lb"),
        "qx",
        "qy",
    ).select("lb.layout", "lb.bucket", "qx", "qy")
    per_file = layouts.groupBy("layout", "bucket").agg(
        (F.max("qx") - F.min("qx") + 1).alias("span_x"),
        (F.max("qy") - F.min("qy") + 1).alias("span_y"),
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.round(F.avg("span_x"), 4).alias("avg_user_span"),
            F.round(F.avg("span_y"), 4).alias("avg_ts_span"),
            F.round(F.avg(F.col("span_x") * F.col("span_y")), 4).alias("avg_box_area"),
        )
        .orderBy("layout")
    )
