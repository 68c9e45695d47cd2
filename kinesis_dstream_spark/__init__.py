"""kinesis_dstream_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``sazzrahman/kinesis-dstream`` (an incremental, event-time-windowed HTTP
poller feeding a Kinesis-style sink; see SURVEY.md) as an idiomatic Spark
engine:

- batch relational surface: DataFrame/SQL over parquet (SURVEY §2 E-1..E-8)
- streaming surface: Structured Streaming with a custom polling source,
  watermarks, windows, and foreachBatch sinks (SURVEY §2 O-1..O-11 / E-9)
- LLM-data-pipeline operators: dedup, similarity search, text analysis,
  multimodal columns (SURVEY §2B E-10..E-14)

Everything is DataFrame-first: logical plans are declared with the public
DataFrame/SQL API and physical strategy is left to Catalyst/Tungsten/AQE.
"""

from kinesis_dstream_spark.session import get_spark
from kinesis_dstream_spark.tables import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]

__version__ = "0.1.0"
