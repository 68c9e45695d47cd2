"""Order-independent (bit-reproducible) float aggregation.

Floating-point SUM/AVG results depend on accumulation order, which
differs between engines (and between runs of a distributed engine). For
oracle-checked outputs that is a correctness hazard: two mathematically
equal sums can round differently.

The fix: fixed-point aggregation. Scale each per-row value (a
deterministic, order-free expression) to an integer, sum exactly in
int64, divide back once. Both Spark and DuckDB then produce *identical
doubles*, so any rounding matches too.

SQL twins (used in oracle_sql):
  sum:  round(CAST(sum(CAST(round(expr * S) AS BIGINT)) AS BIGINT) / S, dp)
  avg:  round(CAST(sum(CAST(round(expr * S) AS BIGINT)) AS BIGINT)
              / count(*) / S, dp)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixedpoint(expr: Column, scale: int) -> Column:
    """Per-row fixed-point representation: round(expr*scale) as int64."""
    return F.round(expr * scale, 0).cast("long")


def exact_sum(expr: Column, scale: int = 100, dp: int | None = 2) -> Column:
    """Order-independent sum of a double expression at 1/scale precision."""
    s = F.sum(fixedpoint(expr, scale)) / float(scale)
    return F.round(s, dp) if dp is not None else s


def exact_avg(expr: Column, scale: int = 100, dp: int | None = 4) -> Column:
    """Order-independent mean: exact integer sum / count / scale."""
    a = F.sum(fixedpoint(expr, scale)) / F.count(F.lit(1)) / float(scale)
    return F.round(a, dp) if dp is not None else a


def sum_sql(expr_sql: str, scale: int = 100, dp: int = 2) -> str:
    """DuckDB twin of exact_sum (sum(BIGINT) is HUGEINT → cast back)."""
    return (
        f"round(CAST(sum(CAST(round(({expr_sql}) * {scale}) AS BIGINT)) AS BIGINT)"
        f" / {scale}.0, {dp})"
    )


def avg_sql(expr_sql: str, scale: int = 100, dp: int = 4) -> str:
    """DuckDB twin of exact_avg."""
    return (
        f"round(CAST(sum(CAST(round(({expr_sql}) * {scale}) AS BIGINT)) AS BIGINT)"
        f" / count(*) / {scale}.0, {dp})"
    )
