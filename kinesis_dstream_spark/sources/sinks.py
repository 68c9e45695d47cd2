"""foreachBatch sink adapters (reference O-9).

The reference *intended* a Kinesis sink (README.md:2, boto3 imported at
``app/hs_contacts.py:7``, ``KINESIS_STREAM_NAME`` asserted at
``app/hs_engagements.py:159``) but only ever implemented a rotating log
file (``app/hs_contacts.py:120-123``). Both shapes exist here as
foreachBatch writers:

- ``KinesisPutRecordsSink`` — batches rows into ``put_records`` calls of
  ≤500 records (the Kinesis API limit), import-gated on boto3. Each
  executor partition ships its own batches (``foreachPartition``), so the
  sink scales with the cluster instead of the reference's one-process
  serial emit.
- ``JsonLogSink`` — the local analog of the reference's log sink: appends
  micro-batches as JSON lines partitioned by batch id.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class KinesisPutRecordsSink:
    """Kinesis Data Stream sink via boto3 put_records (500-record chunks).

    Usage: ``writeStream.foreachBatch(KinesisPutRecordsSink(stream, key))``.
    boto3 is import-gated: constructing the sink without boto3 installed
    raises a clear error instead of failing inside executors.
    """

    stream_name: str
    partition_key_col: str
    region: str = "us-east-1"
    chunk_size: int = 500  # Kinesis PutRecords hard limit
    max_attempts: int = 5  # partial-failure re-put budget per chunk
    backoff_s: float = 0.2

    def __post_init__(self):
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover - boto3 absent here
            raise ImportError(
                "KinesisPutRecordsSink requires boto3; install it or use "
                "JsonLogSink for local runs"
            ) from e

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:  # pragma: no cover
        stream, key_col, region, chunk = (
            self.stream_name,
            self.partition_key_col,
            self.region,
            self.chunk_size,
        )

        max_attempts, backoff_s = self.max_attempts, self.backoff_s

        def put_chunk(client, records):
            _put_records_with_retry(client, stream, records, max_attempts, backoff_s)

        def put_partition(rows):
            import boto3

            client = boto3.client("kinesis", region_name=region)
            buf = []
            for row in rows:
                d = row.asDict(recursive=True)
                buf.append(
                    {
                        "Data": json.dumps(d, default=str).encode(),
                        "PartitionKey": str(d[key_col]),
                    }
                )
                if len(buf) >= chunk:
                    put_chunk(client, buf)
                    buf = []
            if buf:
                put_chunk(client, buf)

        # Empty-batch elision (reference O-8): foreachPartition on an
        # empty frame is a no-op, no guard needed.
        batch_df.foreachPartition(put_partition)


def _put_batch_with_retry(
    put,
    records: list,
    max_attempts: int,
    backoff_s: float,
    failed_count_key: str,
    responses_key: str,
    api_name: str,
) -> None:
    """Partial-failure re-put loop shared by the Kinesis and Firehose sinks.

    Both APIs PARTIALLY fail under throttling (a nonzero failed-count
    field on an HTTP 200); dropping those records would silently lose the
    at-least-once delivery the reference's RATE_LIMIT retry loop
    provided. Re-put only the entries whose response carries an
    ErrorCode — order within the response array matches the request
    array — with bounded exponential backoff, raising if the budget
    exhausts so the micro-batch retries instead of ack'ing lost data.
    """
    import time as _time

    pending = records
    for attempt in range(max_attempts):
        resp = put(pending)
        if not resp.get(failed_count_key):
            return
        pending = [
            rec
            for rec, res in zip(pending, resp[responses_key])
            if res.get("ErrorCode")
        ]
        if attempt + 1 < max_attempts:
            _time.sleep(backoff_s * (2**attempt))
    raise RuntimeError(
        f"{api_name}: {len(pending)} records still failing after "
        f"{max_attempts} attempts"
    )


def _put_records_with_retry(
    client, stream: str, records: list, max_attempts: int, backoff_s: float
) -> None:
    """Kinesis Data Streams ``put_records`` with partial-failure re-puts
    (response: FailedRecordCount / Records[].ErrorCode)."""
    _put_batch_with_retry(
        lambda recs: client.put_records(StreamName=stream, Records=recs),
        records,
        max_attempts,
        backoff_s,
        failed_count_key="FailedRecordCount",
        responses_key="Records",
        api_name="Kinesis put_records",
    )


def _put_record_batch_with_retry(
    client, stream: str, records: list, max_attempts: int, backoff_s: float
) -> None:
    """Firehose ``put_record_batch`` with partial-failure re-puts
    (response: FailedPutCount / RequestResponses[].ErrorCode)."""
    _put_batch_with_retry(
        lambda recs: client.put_record_batch(
            DeliveryStreamName=stream, Records=recs
        ),
        records,
        max_attempts,
        backoff_s,
        failed_count_key="FailedPutCount",
        responses_key="RequestResponses",
        api_name="Firehose put_record_batch",
    )


@dataclass
class FirehosePutRecordBatchSink:
    """Kinesis Data Firehose sink via boto3 ``put_record_batch``.

    The reference README names "Kinesis Data Stream or Firehose"
    (README.md:2) as the intended sink; this is the Firehose half of that
    pair. Same shape as :class:`KinesisPutRecordsSink` — foreachBatch →
    foreachPartition, 500-record chunks (the PutRecordBatch hard limit),
    partial-failure re-puts through the shared retry helper — but
    Firehose records carry only ``Data`` (no partition key: Firehose is a
    delivery stream, not a sharded stream).
    """

    delivery_stream_name: str
    region: str = "us-east-1"
    chunk_size: int = 500  # Firehose PutRecordBatch hard limit
    max_attempts: int = 5
    backoff_s: float = 0.2

    def __post_init__(self):
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover - boto3 absent here
            raise ImportError(
                "FirehosePutRecordBatchSink requires boto3; install it or "
                "use JsonLogSink for local runs"
            ) from e

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:  # pragma: no cover
        stream, region, chunk = self.delivery_stream_name, self.region, self.chunk_size
        max_attempts, backoff_s = self.max_attempts, self.backoff_s

        def put_partition(rows):
            import boto3

            client = boto3.client("firehose", region_name=region)
            buf = []
            for row in rows:
                d = row.asDict(recursive=True)
                # newline-delimited JSON: Firehose concatenates records,
                # so each record must carry its own delimiter
                buf.append({"Data": (json.dumps(d, default=str) + "\n").encode()})
                if len(buf) >= chunk:
                    _put_record_batch_with_retry(
                        client, stream, buf, max_attempts, backoff_s
                    )
                    buf = []
            if buf:
                _put_record_batch_with_retry(
                    client, stream, buf, max_attempts, backoff_s
                )

        # Empty-batch elision (reference O-8): foreachPartition on an
        # empty frame is a no-op, no guard needed.
        batch_df.foreachPartition(put_partition)


@dataclass
class JsonLogSink:
    """Local JSON-lines sink — the reference's implemented log sink,
    minus the 1 MB rotation (Spark's file sink semantics replace it).

    Executors stream their own partitions to
    ``batch-NNNNNN-part-NNNNN.jsonl`` files (``foreachPartition``, like
    the Kinesis sink) — the micro-batch is never collected to the driver,
    so batch size is bounded by executor memory, not driver memory.

    File names are derived from the deterministic (batch_id, partitionId)
    pair — NOT a uuid — and written via temp-file + atomic rename, so a
    retried task replaces its predecessor's (possibly partial) file
    instead of leaving a duplicate; foreachPartition has no task-commit
    protocol, so the rename is the commit. With speculative execution two
    attempts may race the rename, but both write identical content and
    rename is atomic, so the survivor is still a single complete file.
    ``out_dir`` must be a shared filesystem on a real cluster (it's local
    disk on local[_])."""

    out_dir: str

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        out_dir = self.out_dir
        os.makedirs(out_dir, exist_ok=True)

        def write_partition(rows):
            import json as _json
            import os as _os
            import uuid as _uuid

            from pyspark import TaskContext

            first = next(rows, None)
            if first is None:  # empty-partition elision: no empty files
                return
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            path = _os.path.join(out_dir, f"batch-{batch_id:06d}-part-{pid:05d}.jsonl")
            tmp = f"{path}.{_uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                for row in _chain_one(first, rows):
                    f.write(_json.dumps(row.asDict(recursive=True), default=str) + "\n")
            _os.replace(tmp, path)  # atomic: retries overwrite, never duplicate

        batch_df.foreachPartition(write_partition)


def _chain_one(first, rest):
    yield first
    yield from rest
