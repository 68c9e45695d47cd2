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
from pyspark.sql.types import DoubleType, IntegerType


@F.udf(IntegerType())
def _py_token_count(text: str) -> int:
    """Row-at-a-time Python UDF (the slow path, E-14 tier 3)."""
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


def pandas_udf_value_transform(events: DataFrame) -> DataFrame:
    """Scalar pandas UDF over the event stream: log1p(value), rounded.

    log1p on identical doubles is bit-identical across numpy and DuckDB's
    ln(1+x)? Not guaranteed — so round to 6dp for the oracle.
    """
    return events.select(
        "event_id",
        F.round(_pd_log1p_value(F.col("value")), 6).alias("log_value"),
    )


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
