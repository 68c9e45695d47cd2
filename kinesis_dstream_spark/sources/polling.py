"""A paginated "poll" data source on the Python Data Source API.

The reference's only custom component is its source: an incremental,
paginated poller (``app/hs_contacts.py:51-126``) that fetches pages of
100 rows with a cursor and tumbles an event-time window forward
(``:139-147``). This module re-expresses that as a first-class Spark
source:

- **batch**: ``spark.read.format("paged_poll")`` — each *page* becomes an
  input partition, so what the reference fetched serially Spark scans in
  parallel. The page size is the reference's ``limit`` knob.
- **streaming**: ``spark.readStream.format("paged_poll")`` — micro-batch
  offsets are row cursors (the reference's ``(window_end, after)`` pair
  collapses to a monotone row offset over the replayed event log);
  ``rows_per_batch`` emulates ``maxOffsetsPerTrigger``-style rate control
  (the Spark upgrade of the reference's sleep-based backpressure, O-10).

The "remote API" is emulated by a local parquet file read via pyarrow
(the container has no network); the reader structure — plan offsets,
fetch a page, convert to rows — is exactly what an HTTP-backed
implementation would keep, swapping ``_fetch_page`` for a request call
with retry/backoff (reference O-10 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "paged_poll"
DEFAULT_PAGE_SIZE = 100  # the reference's limit=100 (app/hs_contacts.py:101)


# Retry policy for the "remote" fetch (reference O-10: network error and
# RATE_LIMIT both slept 10 s and retried the same page forever,
# app/hs_contacts.py:106-111,129-133). Spark upgrade: bounded attempts
# with exponential backoff inside the reader — beyond that, task retry
# (spark.task.maxFailures) and streaming checkpoint/restart take over,
# replaying from the committed offset instead of losing the window.
FETCH_MAX_ATTEMPTS = 3
FETCH_BACKOFF_S = 0.2


def _fetch_with_retry(fetch, max_attempts: int = FETCH_MAX_ATTEMPTS):
    """Run ``fetch()`` with bounded exponential-backoff retries on
    transient (IO) errors; non-transient errors raise immediately —
    mirroring the reference's fatal-vs-retryable branch."""
    import time as _time

    last = None
    for attempt in range(max_attempts):
        try:
            return fetch()
        except (OSError, IOError) as e:
            last = e
            if attempt + 1 < max_attempts:
                _time.sleep(FETCH_BACKOFF_S * (2**attempt))
    raise last


def _read_table(path: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = _fetch_with_retry(lambda: pq.read_table(path))
    # Spark's Python row converter requires tz-aware datetimes; the
    # fixture's ns timestamps are tz-naive → cast to µs UTC here (ns→µs
    # truncation matches the engine-wide convention, see tables.py).
    for i, field in enumerate(table.schema):
        if pa.types.is_timestamp(field.type) and field.type.tz is None:
            table = table.set_column(
                i,
                pa.field(field.name, pa.timestamp("us", tz="UTC")),
                table.column(i).cast(pa.timestamp("us", tz="UTC"), safe=False),
            )
    return table


def _arrow_schema_to_spark(path: str) -> StructType:
    """Derive the Spark schema from the parquet footer (planning-time)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow.parquet as pq

    return from_arrow_schema(pq.read_schema(path))


@dataclass
class _PageRange(InputPartition):
    start: int
    end: int


class PagedPollDataSource(DataSource):
    """Options: ``path`` (parquet file), ``page_size`` (rows per page)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _arrow_schema_to_spark(self.options["path"])

    def reader(self, schema: StructType) -> "PagedPollBatchReader":
        return PagedPollBatchReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "PagedPollStreamReader":
        return PagedPollStreamReader(schema, self.options)


class PagedPollBatchReader(DataSourceReader):
    """One partition per page: the parallel version of cursor pagination."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.fields = schema.fieldNames()

    def partitions(self):
        import pyarrow.parquet as pq

        n_rows = pq.read_metadata(self.path).num_rows
        return [
            _PageRange(start, min(start + self.page_size, n_rows))
            for start in range(0, n_rows, self.page_size)
        ]

    def read(self, partition: _PageRange):
        # Arrow-sliced page fetch; yields arrow batches directly (the
        # fast path the Python DataSource API supports — no per-row
        # Python tuples).
        table = _read_table(self.path).slice(
            partition.start, partition.end - partition.start
        )
        yield from table.to_batches()


class PagedPollStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offsets are row cursors over the event log.

    The reference's window bookkeeping lived in process memory
    (``begin_time``, ``after``) and died with the process; here the
    offset dict is checkpointed by Spark, giving exactly-once planning
    for free (SURVEY §4 fault-tolerance row).
    """

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.rows_per_batch = int(options.get("rows_per_batch", 500))
        self._n_rows = None

    def _total_rows(self) -> int:
        if self._n_rows is None:
            import pyarrow.parquet as pq

            self._n_rows = pq.read_metadata(self.path).num_rows
        return self._n_rows

    def initialOffset(self) -> dict:
        return {"cursor": 0}

    def read(self, start: dict):
        cursor = start["cursor"]
        end = min(cursor + self.rows_per_batch, self._total_rows())
        if end <= cursor:
            return iter([]), {"cursor": cursor}
        table = _read_table(self.path).slice(cursor, end - cursor)
        # SimpleDataSourceStreamReader prefetches driver-side and pickles
        # the batch into its cache — must be a materialized list, not a
        # generator; rows_per_batch bounds the memory footprint.
        rows = [
            tuple(row[f] for f in table.schema.names) for row in table.to_pylist()
        ]
        return rows, {"cursor": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        cursor, stop = start["cursor"], end["cursor"]
        table = _read_table(self.path).slice(cursor, stop - cursor)
        return (
            tuple(row[f] for f in table.schema.names) for row in table.to_pylist()
        )


def register(spark) -> None:
    """Register the source so ``format("paged_poll")`` resolves."""
    spark.dataSource.register(PagedPollDataSource)


def _attach_writer() -> None:
    """Attach the writer to PagedPollDataSource (Spark 4 Python Data
    Source API: ``writer(schema, overwrite)`` on the DataSource)."""
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _Writer(DataSourceWriter):
        def __init__(self, options):
            self.out_dir = options["path"]

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.out_dir, exist_ok=True)
            path = os.path.join(self.out_dir, f"part-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(path, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
                    n += 1
            return WriterCommitMessage()

    def writer(self, schema, overwrite):  # noqa: ANN001
        return _Writer(self.options)

    PagedPollDataSource.writer = writer


_attach_writer()
