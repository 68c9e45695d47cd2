"""Vector math over array columns.

Two tiers, same semantics:

1. **Native expressions** (``zip_with`` + ``aggregate``): run entirely in
   the JVM, no Python round-trip, fully composable with Catalyst (can sit
   under filters/joins and be pushed around). Preferred for
   correctness-checked paths because the arithmetic (sequential
   left-to-right fold) is bit-reproducible against the DuckDB oracle's
   ``list_``* functions.
2. **Arrow pandas-UDF fast path** (numpy): ~10-100x faster per element for
   wide vectors or huge pair counts; used in the similarity operators'
   bulk scoring where a 100 TB run would be dominated by FLOPs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (native, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array column (native)."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column) -> Column:
    """Return the unit-length version of an array column (native).

    Normalizing once per row turns every later cosine into a plain dot
    product — the standard trick that makes all-pairs similarity a single
    multiply-add pass per pair.
    """
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (native)."""
    return dot(a, b) / (norm(a) * norm(b))


@F.pandas_udf(DoubleType())
def dot_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched dot product: numpy over stacked batches.

    Each Arrow batch of array<double> values becomes one (batch, dim)
    ndarray; the dot is a single vectorized einsum — the fast path for
    bulk pair scoring.
    """
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", av, bv))
