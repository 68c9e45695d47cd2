"""Custom sources & sinks.

- ``polling`` — a Python Data Source (Spark 4 API) that emulates the
  reference's paginated HTTP poll (reference ``app/hs_contacts.py:51-126``)
  over local parquet fixtures: batch reader with page-partitioned scans,
  plus a micro-batch streaming reader whose offsets are the reference's
  ``(window_end, cursor)`` pair (SURVEY §3.1).
- ``sinks`` — foreachBatch sink adapters: a Kinesis ``put_records``-shaped
  adapter (import-gated on boto3, mirroring the reference's *intended*
  sink, README.md:2) and a local log/parquet sink (its *implemented* sink,
  ``app/hs_contacts.py:120-123``).
"""
