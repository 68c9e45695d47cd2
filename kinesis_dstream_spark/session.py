"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen to also be the right default on a 1000-executor
cluster reading ~100 TB:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch) so the same declarative plan adapts to real sizes.
- Arrow-enabled Python interop so any unavoidable pandas UDF moves data in
  columnar batches instead of pickled rows.
- A moderate ``spark.sql.shuffle.partitions`` locally; AQE coalesces down /
  splits up from there. On a real cluster this would be sized to
  ~2-3x total cores and AQE handles the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kinesis-dstream-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Honors ``SPARK_GRAFT_CPUS`` for local core count (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Local mode runs ALL executor threads inside the driver JVM, whose
    # default heap is 1g — badly undersized for 32 concurrent tasks
    # (bench r5 OOMed in a blocked-join stage exactly this way). Size it
    # like the per-executor memory a real cluster node would get. Only
    # effective when this process launches the JVM (always true for
    # bench/pytest, which start fresh interpreters).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", driver_mem)
        # Adaptive Query Execution: coalesce post-shuffle partitions and
        # split skewed ones at runtime — essential at 100 TB where static
        # partition counts are always wrong for some stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for any pandas UDF / toPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in fixtures are ns-precision; keep Spark from silently
        # corrupting them on parquet read/write.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.session.timeZone", "UTC")
        # Quieter local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
