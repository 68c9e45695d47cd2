"""Batch file-format scans & sinks beyond parquet (SURVEY §2B E-1).

The reference's only "format" is the JSON body of an HTTP response
(`app/hs_contacts.py:91-104`); persistent formats all come from Spark
built-ins here. CSV and JSON are the interchange paths a pipeline at
100 TB still needs at its edges (vendor drops, log ingestion) even
though parquet is the storage format.

Scale notes:
- Explicit schemas ALWAYS — `inferSchema`/schema-of-JSON sampling is an
  extra full scan of the input before the real one.
- CSV/JSON readers split by file and by block for uncompressed input, so
  a directory of files parallelizes; one giant .gz file does not (gzip
  is not splittable — the classic single-task scan trap).
- Casting/parsing happens in the scan itself (no Python), and column
  pruning still applies: unread JSON fields are never parsed thanks to
  the Jackson streaming parser.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_dstream_spark.tables import load_table

_CSV_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)

_JSON_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def roundtrip_dir(sf_dir: str) -> str:
    """Deterministic per-sf staging dir (overwritten each run)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join("/tmp", "kds_formats_roundtrip", tag)


def csv_json_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV + JSON sinks → scan both back → join → aggregate.

    Exercises the E-1 surface end-to-end: `df.write.csv/json` and
    `spark.read.csv/json` with explicit schemas. The numeric columns ride
    the CSV path, the timestamp column rides JSON (ISO-8601 text), and
    the final aggregate joins the two round-tripped halves on the key —
    so a lossy write or a mis-parsed read in EITHER format breaks the
    DuckDB oracle, which computes the same aggregate straight from
    parquet.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = roundtrip_dir(sf_dir)
    csv_dir, json_dir = os.path.join(base, "csv"), os.path.join(base, "json")
    orders.select(*_CSV_COLS).write.mode("overwrite").option("header", True).csv(csv_dir)
    orders.select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).write.mode("overwrite").json(json_dir)

    csv_df = spark.read.schema(_CSV_SCHEMA).option("header", True).csv(csv_dir)
    json_df = spark.read.schema(_JSON_SCHEMA).json(json_dir)

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        csv_df.join(json_df, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_price"),
            F.min(F.year("o_orderdate")).alias("first_year"),
            F.max(F.year("o_orderdate")).alias("last_year"),
        )
    )


def partitioned_orders_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet write + partition-pruned read (E-1).

    Writes orders partitioned by order year (`partitionBy("o_year")`),
    then reads back with a filter on the partition column. At 100 TB this
    is THE layout decision that matters most: the year filter is resolved
    against directory names during planning (PartitionFilters), so a
    one-year query lists and reads ~1/7 of the files — zero bytes of the
    other years are ever opened. The plan test asserts the pruning shows
    up as a PartitionFilter, not a post-scan data filter.
    """
    from kinesis_dstream_spark.functions.exact import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    out = os.path.join(roundtrip_dir(sf_dir), "orders_by_year")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("o_year") == 1995)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def bucketed_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write + shuffle-free co-located join (E-1/E-3).

    Both sides are written `bucketBy(8, <join key>)` (same Murmur3 hash
    family as shuffle partitioning), so at read time Catalyst proves the
    partitionings line up and plans the orders⋈lineitem join with NO
    Exchange on either side — at 100 TB that's the difference between
    re-shuffling the fact table on every run and paying the shuffle once
    at ingest. The pre-write `repartition(8, key)` gives one file per
    bucket per table instead of files × tasks.
    """
    from kinesis_dstream_spark.functions.exact import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    loc = os.path.join(roundtrip_dir(sf_dir), "bucketed")
    (
        orders.select("o_orderkey", "o_orderpriority")
        .repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(loc, "orders"))
        .saveAsTable("kds_orders_bucketed")
    )
    (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(8, "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(loc, "lineitem"))
        .saveAsTable("kds_lineitem_bucketed")
    )
    o = spark.table("kds_orders_bucketed")
    li = spark.table("kds_lineitem_bucketed")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(revenue).alias("revenue"),
        )
    )


def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC sink → scan back → aggregate (E-1).

    ORC is Spark's other first-class columnar format (`df.write.orc` /
    `spark.read.orc`), common where Hive-era warehouses feed a Spark
    pipeline. Same pushdown machinery as parquet: the shipdate filter
    and the 5-column projection reach the ORC scan (predicate pushdown +
    column pruning), so the read-back pays for a fraction of the file
    bytes. The DuckDB oracle computes the identical aggregate straight
    from the source parquet — any loss or type drift in the ORC
    write/read path (timestamps are the usual suspect) breaks the hash.
    """
    from kinesis_dstream_spark.functions.exact import exact_avg, exact_sum

    li = load_table(spark, sf_dir, "lineitem")
    out = os.path.join(roundtrip_dir(sf_dir), "lineitem_orc")
    li.select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ).write.mode("overwrite").orc(out)

    back = spark.read.orc(out)
    return (
        back.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(F.col("l_extendedprice")).alias("sum_price"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
        )
    )


def schema_evolution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift across parquet generations + mergeSchema read (E-1).

    The production scenario every long-lived dataset hits: generation 1
    files were written before a column existed; generation 2 adds it.
    Orders split by key parity: gen1 writes (o_orderkey, o_custkey,
    o_orderstatus); gen2 additionally carries o_totalprice. A
    ``mergeSchema`` read reconciles the union schema and surfaces the
    missing column as NULLs on gen1 rows — the report counts rows and
    nulls per generation plus the priced total, so a read that dropped
    the new column, invented values for old rows, or lost rows in
    either generation breaks the oracle (which computes the same
    accounting from the raw table).

    Scale note: schema merging is a FOOTER-ONLY operation (no data
    bytes read to reconcile schemas), but footer-listing cost grows
    with file count — at 100 TB the schema belongs in a catalog
    (Delta/Iceberg metadata), with mergeSchema as the migration path;
    the NULL-for-missing semantics shown here are identical there.
    """
    from kinesis_dstream_spark.functions.exact import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(roundtrip_dir(sf_dir), "orders_generations")
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    gen1.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", True).parquet(base)
    return (
        merged.groupBy("gen")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").isNull().cast("long")).alias("null_price_rows"),
            exact_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias(
                "priced_total"
            ),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
    )


def corrupt_record_quarantine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine on CSV ingest (E-1 / the record-level
    analog of the reference's transport retry taxonomy, O-10): real
    pipelines receive broken lines, and the production posture is
    PERMISSIVE parse + corrupt-record capture — load what parses,
    quarantine what doesn't, account for both. (The reference handles
    transport-level faults with retries, app/hs_contacts.py:83-105;
    record-level faults need this sink-side path.)

    Staging corrupts a deterministic subset (every o_orderkey % 37 == 0
    gets a non-numeric price field) of an orders CSV; the read uses an
    explicit schema + ``columnNameOfCorruptRecord``, so broken lines
    surface as all-null rows carrying the raw line. The report buckets
    rows into per-status totals (good) and one ``__quarantined__`` row
    — counts and exact totals match the oracle computed from the raw
    table, so a parser that silently dropped OR silently coerced
    corrupt lines breaks the hash.

    Scale: the corrupt-record column costs nothing on clean rows; the
    quarantine path is a filter, not an exception — no per-record
    Python, no job failure from bad input (the 100 TB posture:
    quarantine, don't crash — same as the media decoders).
    """
    from kinesis_dstream_spark.functions.exact import exact_sum
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    orders = load_table(spark, sf_dir, "orders")
    staged = os.path.join(roundtrip_dir(sf_dir), "orders_corrupt_csv")
    price_field = F.when(
        F.col("o_orderkey") % 37 == 0, F.lit("#CORRUPT#")
    ).otherwise(F.format_number(F.col("o_totalprice"), 2))
    lines = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.regexp_replace(price_field, ",", ""),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(staged)

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(staged)
    )
    return (
        parsed.groupBy(
            F.when(F.col("_corrupt_record").isNotNull(), "__quarantined__")
            .otherwise(F.col("o_orderstatus"))
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias(
                "total_price"
            ),
        )
    )


def dynamic_partition_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning (E-1/E-3 optimizer depth) — the
    join-driven sibling of ``partitioned_orders_prune_stats``: there
    the pruning literal sits in the query text; here the prunable
    years are only discoverable by EXECUTING the dimension side (top-2
    revenue years from the small per-year rollup), the real shape of
    every fact⋈dim star query ("this quarter's partitions", "these
    campaign days"). Static planning cannot prune — Spark's DPP
    instead broadcasts the dim's join-key values at runtime and
    injects them as a partition filter into the fact scan
    (``dynamicpruning#`` subquery in the plan, pinned in
    tests/test_plans.py), so a 100 TB fact table opens only the
    matching year directories even though no year literal exists
    anywhere in the query.

    The oracle computes the same top-2-years rollup declaratively —
    the hash match proves runtime pruning changed WHAT was read, not
    what was computed.
    """
    from kinesis_dstream_spark.functions.exact import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    out = os.path.join(roundtrip_dir(sf_dir), "orders_by_year")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            orders.withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(out)
        )
    fact = spark.read.parquet(out)
    # dimension side: top-2 years by exact revenue among 1995+ — values
    # knowable only at runtime (deterministic: integer revenue, year
    # tiebreak). The date filter matters twice: it is the business cut
    # AND the "selective predicate" Spark's DPP rule requires on the
    # pruning side before it will inject the runtime filter.
    dim = (
        orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(exact_sum(F.col("o_totalprice")).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("o_year").asc())
        .limit(2)
        .select("o_year")
    )
    return (
        fact.join(dim, "o_year")
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


DYNAMIC_PRUNE_SQL = """
WITH yearly AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  GROUP BY 1
), top2 AS (
  SELECT o_year FROM yearly ORDER BY rev DESC, o_year ASC LIMIT 2
)
SELECT o.o_year, count(*) AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0, 2) AS total_price
FROM (SELECT year(o_orderdate) AS o_year, o_totalprice FROM orders) o
JOIN top2 USING (o_year)
GROUP BY o.o_year
"""
