"""Structured Streaming surface (SURVEY §2 O-1..O-11 / E-9).

- ``jobs`` — streaming query builders: windowed aggregation with
  watermarks, streaming dedup, stream-static joins, bounded
  (availableNow) runs whose results are oracle-checkable.
- ``control`` — the control plane (reference ``app/app.py``) on
  ``spark.streams``: start/stop/status of named streaming jobs.
"""
