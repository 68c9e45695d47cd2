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
                    client.put_records(StreamName=stream, Records=buf)
                    buf = []
            if buf:
                client.put_records(StreamName=stream, Records=buf)

        # Empty-batch elision (reference O-8): foreachPartition on an
        # empty frame is a no-op, no guard needed.
        batch_df.foreachPartition(put_partition)


@dataclass
class JsonLogSink:
    """Local JSON-lines sink — the reference's implemented log sink,
    minus the 1 MB rotation (Spark's file sink semantics replace it)."""

    out_dir: str

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        rows = [r.asDict(recursive=True) for r in batch_df.collect()]
        path = os.path.join(self.out_dir, f"batch-{batch_id:06d}.jsonl")
        with open(path, "w") as f:
            for d in rows:
                f.write(json.dumps(d, default=str) + "\n")
