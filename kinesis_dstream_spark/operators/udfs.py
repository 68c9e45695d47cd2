"""UDF surface (SURVEY §2B E-14): the three Python extension points.

Ordered by preference at scale:

1. **Built-in expressions** — everything else in this repo; always first
   choice (whole-stage codegen, no Python).
2. **pandas UDF / applyInPandas / mapInPandas** — Arrow-batched; the
   right tool when the semantics genuinely need Python (numpy kernels,
   exact quantiles, model inference). 10-100x faster than row UDFs.
3. **Row-at-a-time Python UDF** — kept here as the explicitly-marked
   slow path, for parity with what the reference's row-per-row Python
   loop (``app/hs_contacts.py:121``) would look like under Spark.

Each demo is deterministic so the oracle gate can cover the UDF plumbing
itself, not just happy-path execution.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType


@F.udf(IntegerType())
def _py_token_count(text):
    """Row-at-a-time Python UDF (the slow path, E-14 tier 3):
    str | None -> int. Unannotated on purpose — pyspark tries (and
    warns it can't) infer a pandas eval type from scalar hints on a
    plain ``F.udf``; the return type is the decorator argument."""
    if text is None:
        return 0
    return len(text.split())


@F.udf(IntegerType(), useArrow=True)
def _arrow_py_token_count(text):
    """Arrow-OPTIMIZED Python UDF (E-14 tier 2.5, r11): the same
    scalar function as ``_py_token_count`` but shipped over Arrow
    batches instead of pickled rows — Spark ≥3.5's ``useArrow=True``
    path. Same Python-per-VALUE cost as the row UDF (unlike a pandas
    UDF's vectorized kernel) but the serialization boundary is
    columnar, which is most of the row path's overhead. The plan node
    is ArrowEvalPython (pinned in tests/test_plans.py) vs the row
    UDF's BatchEvalPython — completing the UDF execution matrix:
    BatchEvalPython / ArrowEvalPython / (scalar|grouped-agg) pandas /
    UDTF / mapInPandas."""
    if text is None:
        return 0
    return len(text.split())


@F.pandas_udf(DoubleType())
def _pd_log1p_value(v: pd.Series) -> pd.Series:
    """Arrow-batched scalar pandas UDF (E-14 tier 2): numpy kernel."""
    import numpy as np

    return pd.Series(np.log1p(v.to_numpy()))


def udf_token_counts(documents: DataFrame) -> DataFrame:
    """Python UDF vs built-in, side by side — results must agree.

    The oracle checks both columns, which pins the UDF's semantics to the
    JVM tokenizer's (and the plan test pins that only THIS query carries
    a BatchEvalPython node).
    """
    from kinesis_dstream_spark.functions.textfns import tokens

    return documents.select(
        "doc_id",
        _py_token_count(F.col("text")).alias("py_tokens"),
        F.size(tokens(F.col("text"))).alias("jvm_tokens"),
    )


def arrow_udf_token_counts(documents: DataFrame) -> DataFrame:
    """Arrow-optimized Python UDF vs built-in, side by side — the
    ``useArrow=True`` twin of ``udf_token_counts``; the shared oracle
    pins that the Arrow serialization path changes NOTHING about the
    values, and the plan test pins that this query carries
    ArrowEvalPython (not BatchEvalPython)."""
    from kinesis_dstream_spark.functions.textfns import tokens

    return documents.select(
        "doc_id",
        _arrow_py_token_count(F.col("text")).alias("py_tokens"),
        F.size(tokens(F.col("text"))).alias("jvm_tokens"),
    )


def pandas_udf_value_transform(events: DataFrame) -> DataFrame:
    """Scalar pandas UDF over the event stream: log1p(value), rounded.

    log1p on identical doubles is bit-identical across numpy and DuckDB's
    ln(1+x)? Not guaranteed — so round to 6dp for the oracle.
    """
    return events.select(
        "event_id",
        F.round(_pd_log1p_value(F.col("value")), 6).alias("log_value"),
    )


@F.pandas_udf(LongType())
def _pd_weighted_mean_fp(v_fp: pd.Series, w: pd.Series) -> int:
    """GROUPED_AGG pandas UDAF (E-14's last tier, r9-verdict task 3):
    a Series→scalar aggregating pandas UDF usable INSIDE
    ``groupBy().agg()`` next to built-in aggregates — the one UDF
    variant the surface lacked. Exact fixed-point weighted mean:
    trunc(Σ v_fp·w / Σ w) in int64, order-independent by construction
    (integer sums commute), with trunc-toward-zero division spelled
    out because Python ``//`` floors while Spark ``DIV`` / DuckDB
    ``//`` truncate — they differ on negative numerators."""
    import numpy as np

    num = int((v_fp.to_numpy(np.int64) * w.to_numpy(np.int64)).sum())
    den = int(w.to_numpy(np.int64).sum())
    q = abs(num) // den
    return q if num >= 0 else -q


@F.pandas_udf(LongType())
def _pd_count_rows(w: pd.Series) -> int:
    """Companion UDAF: Spark REFUSES to mix a GROUPED_AGG pandas UDF
    with built-in aggregates in one ``agg()`` (INVALID_PANDAS_UDF_
    PLACEMENT), so the exhibit's count/sum columns must themselves be
    pandas aggregates to share the single group pass."""
    return len(w)


@F.pandas_udf(LongType())
def _pd_sum_long(w: pd.Series) -> int:
    import numpy as np

    return int(w.to_numpy(np.int64).sum())


def udaf_weighted_mean(events: DataFrame) -> DataFrame:
    """The UDAF exhibit: per event_type, an exact integer weighted mean
    of ``value`` (weights ``event_id % 7 + 1`` — deterministic, no side
    table) computed by the GROUPED_AGG pandas UDF above. Fixed-point
    in, fixed-point out, one final division for the rounded double —
    the functions/exact.py discipline, so the DuckDB oracle
    hash-matches bit-for-bit. The n/sum_w columns ride along as
    companion pandas aggregates because Spark disallows mixing the
    GROUPED_AGG pandas tier with built-in aggregate functions in one
    ``agg()`` — a real surface constraint worth pinning (the
    alternative is a second groupBy + a join).

    Scale note (the honest price of this tier): unlike built-in
    aggregates and unlike Spark's own partial-aggregation path, a
    GROUPED_AGG pandas UDF has NO map-side combine — every group row
    shuffles to its reducer, where the whole group materializes as one
    Arrow batch. Fine for bounded-cardinality keys like event_type;
    for additive statistics at 100 TB prefer the built-in fixed-point
    sum (this same result IS expressible as sum(v*w) DIV sum(w) — the
    oracle proves it); the UDAF tier earns its keep only when the
    per-group kernel is genuinely non-relational (learned quantizers,
    scipy solves).
    """
    from kinesis_dstream_spark.functions.exact import fixedpoint

    prepped = events.select(
        "event_type",
        fixedpoint(F.col("value"), 1_000_000).alias("v_fp"),
        (F.col("event_id") % 7 + 1).cast("long").alias("w"),
    )
    return (
        prepped.groupBy("event_type")
        .agg(
            _pd_count_rows("w").alias("n"),
            _pd_sum_long("w").alias("sum_w"),
            _pd_weighted_mean_fp("v_fp", "w").alias("wmean_fp"),
        )
        .select(
            "event_type",
            "n",
            "sum_w",
            "wmean_fp",
            F.round(F.col("wmean_fp") / 1_000_000.0, 6).alias("wmean_value"),
        )
    )


UDAF_WEIGHTED_MEAN_SQL = """
WITH p AS (
  SELECT event_type,
         CAST(round(value * 1000000) AS BIGINT) AS v_fp,
         CAST(event_id % 7 + 1 AS BIGINT) AS w
  FROM events
)
SELECT event_type, count(*) AS n, CAST(sum(w) AS BIGINT) AS sum_w,
       CAST(CAST(sum(v_fp * w) AS BIGINT) // CAST(sum(w) AS BIGINT) AS BIGINT)
         AS wmean_fp,
       round(CAST(CAST(sum(v_fp * w) AS BIGINT) // CAST(sum(w) AS BIGINT)
                  AS BIGINT) / 1000000.0, 6) AS wmean_value
FROM p GROUP BY 1
"""


_MEDIAN_SCHEMA = "event_type string, n bigint, median_value double"


def exact_median_by_group(events: DataFrame) -> DataFrame:
    """applyInPandas grouped-map (E-14): exact per-group median.

    Spark has no exact-median aggregate (percentile_approx is a sketch),
    so this is a case where Python is *semantically* required — the
    canonical applyInPandas use. Each group arrives as one pandas frame;
    numpy's interpolated median matches DuckDB's ``median`` on doubles
    exactly (both average the two middle values).

    Scale note: each group materializes as ONE in-memory pandas frame —
    fine for low-cardinality keys like event_type; for high-cardinality
    or skewed keys use ``exact_median_by_group_ranked`` (same result,
    JVM-side, spill-safe) — the two are pinned equal by pytest and share
    one oracle.
    """

    def median(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "median_value": [float(np.median(pdf["value"].to_numpy()))],
            }
        )

    return events.groupBy("event_type").applyInPandas(median, _MEDIAN_SCHEMA)


def exact_median_by_group_ranked(events: DataFrame) -> DataFrame:
    """Exact per-group median, fully distributed (the scale path).

    Rank-selection instead of per-group materialization: one shuffle
    keyed by the group, a window sort that SPILLS (UnsafeExternalSorter)
    instead of building a pandas frame per group, then only the middle
    one/two rows per group survive into a tiny final aggregate. Works
    for any key cardinality and any group size; ties among equal values
    don't affect which VALUES the middle positions hold, so the result
    is deterministic and equals numpy/DuckDB interpolated median
    (average of the two middle values on even counts). NULL values are
    dropped before ranking (and excluded from n) so this path, the
    applyInPandas twin (pandas skips NaN), and the SQL oracle's MEDIAN
    agree on any fixture.
    """
    from pyspark.sql import Window

    by_group = Window.partitionBy("event_type")
    ordered = by_group.orderBy("value")
    mid = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            F.row_number().over(ordered).alias("rn"),
            F.count("*").over(by_group).alias("n"),
        )
        # middle one (odd n) or two (even n) rows: (n+1)//2 and (n+2)//2
        .filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
    )
    return mid.groupBy("event_type").agg(
        F.max("n").alias("n"), F.avg("value").alias("median_value")
    )


def udtf_token_explode(spark, documents: DataFrame) -> DataFrame:
    """Python UDTF (E-14): one input row -> N output rows, SQL-lateral.

    The table-function surface the reference lacks entirely: a Python
    class whose eval() yields rows, registered and invoked laterally in
    SQL. Token positions are emitted so the fan-out is order-preserving
    and oracle-checkable (DuckDB zips parallel unnests).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class TokenExplode:
        def eval(self, text: str):
            for i, tok in enumerate(text.split()):
                yield i, tok

    spark.udtf.register("token_explode", TokenExplode)
    documents.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.token "
        "FROM _udtf_docs d, LATERAL token_explode(d.text) s"
    )


def arrow_norm_stats(embeddings: DataFrame) -> DataFrame:
    """mapInArrow (E-14 tier 2b): zero-copy Arrow batch transform.

    One tier below pandas UDFs: batches arrive as ``pyarrow.RecordBatch``
    with NO pandas conversion — for kernels that operate on Arrow
    buffers directly (here: the list<float> embedding column is viewed
    as one flat numpy array + offsets, L2 norms computed with a single
    reshaped einsum — no per-row objects anywhere). This is the shape
    feature-extraction / model-inference stages want at 100 TB: fixed
    batch cost, no object churn, and the output schema is declared so
    Catalyst plans around it like any other node.

    Deterministic float arithmetic (float64, rounded; max_abs is a
    single-element pick so it is exact) → oracle-checked against DuckDB
    list aggregation. The fixture's vectors are unit-norm, so l2_norm
    doubles as a fixture sanity column; max_abs/n_dims vary per row and
    carry the real per-row check.
    """
    import pyarrow as pa

    def norms(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            # flat values buffer + offsets: zero-copy views of the Arrow
            # memory; fixture vectors are fixed-dim so one reshape does it
            flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offsets)
            if len(widths) and (widths == widths[0]).all():
                m = flat.reshape(len(widths), widths[0])
                sq = (m**2).sum(axis=1)
                mx = np.abs(m).max(axis=1)
            else:  # ragged fallback: per-row slices off the same buffer
                rows = [flat[offsets[i] : offsets[i + 1]] for i in range(len(widths))]
                sq = np.array([(r**2).sum() for r in rows])
                mx = np.array([np.abs(r).max() if len(r) else 0.0 for r in rows])
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(widths.astype("int32"), pa.int32()),
                    pa.array(np.round(np.sqrt(sq), 4), pa.float64()),
                    pa.array(np.round(mx, 6), pa.float64()),
                ],
                ["vec_id", "n_dims", "l2_norm", "max_abs"],
            )

    return embeddings.select("vec_id", "embedding").mapInArrow(
        norms, "vec_id long, n_dims int, l2_norm double, max_abs double"
    )
