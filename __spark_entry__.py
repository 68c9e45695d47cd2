"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference O-2..O-5 semantics on
the events fixture, SURVEY §7 step 0). ``queries()`` / ``oracle_sql()``
expose the full operator inventory from SURVEY §2 via
kinesis_dstream_spark.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_dstream_spark import registry  # noqa: E402
from kinesis_dstream_spark.operators import reference_ops  # noqa: E402
from kinesis_dstream_spark.tables import load_table  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, SMOKE_SF_DIR, "events")
    return reference_ops.poll_window_filter(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-expressible query."""
    return registry.oracle_sql()
