"""Fixture-table loaders (schemas documented in FIXTURES.md).

All tables are driver-generated parquet under ``/root/testdata/sf*/``.
Loading is a plain ``spark.read.parquet`` — no schema coercion — so
Catalyst's vectorized parquet reader, predicate pushdown, and column
pruning apply untouched. At 100 TB these would be partitioned/bucketed
tables behind a catalog; the loader keeps that swap to a one-liner.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects by
# default; this legacy conf maps it to int64 nanos, which we convert to a
# proper TimestampType via *integer* division (ns → µs). Integer div is
# load-bearing: double arithmetic on ~1.7e18 ns loses microsecond
# precision (2^53 mantissa), which would silently skew every event-time
# comparison against the oracle.
NANOS_AS_LONG_CONF = "spark.sql.legacy.parquet.nanosAsLong"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set(NANOS_AS_LONG_CONF, "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
