"""Skew-mitigation helpers (SURVEY §7 hard-part 4: 100 TB habits).

AQE's skew-join splitting handles most cases automatically; these
helpers are the explicit salting variants for when a key distribution is
so hot that even split partitions overwhelm one reducer — the classic
power-law user_id / event_type case in training-data pipelines.

Both transformations are semantics-preserving: tests assert the salted
plans return byte-identical results to their unsalted twins, and the
driver oracle for the registered queries is the *unsalted* SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg_count_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-stage aggregation: count + sum per key, salted.

    Stage 1 groups on (key, salt) — a hot key's rows spread over
    ``n_salts`` reducers; stage 2 combines the ``n_salts`` partials per
    key (tiny). Works for any algebraic aggregate expressible as
    combinable partials; count/sum shown here. The salt is random — the
    combine step makes the result independent of salt assignment.
    """
    salted = df.withColumn("_salt", F.floor(F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count("*").alias("_cnt"),
        F.sum(value_col).alias("_sum"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_cnt").alias("n_rows"),
        F.sum("_sum").alias(f"sum_{value_col}"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big (left) side, replicate the
    small (right) side ``n_salts`` times, join on (key, salt).

    A hot left key's rows land on ``n_salts`` different reducers instead
    of one. Cost: the right side is shuffled ``n_salts``× — only worth it
    when the right side is far smaller than the hot key's row count (else
    use broadcast, which needs no salting at all).
    """
    l_salted = left.withColumn("_salt", F.floor(F.rand(seed=11) * n_salts).cast("int"))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(
        r_replicated,
        (F.col(left_key) == F.col(right_key)) & (l_salted["_salt"] == r_replicated["_salt"]),
    ).drop("_salt")
