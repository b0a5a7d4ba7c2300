"""Airtable as a native Spark data sink (Python DataSource write path):
``df.write.format("airtable").save()``.

The reference uploads record batches of 10 from the driver
(R/airtable.R:151-232); the existing ``sources.airtable`` helpers keep that
driver-side shape. This sink moves the upload into Spark's V2 write
protocol instead:

- **Executor-parallel uploads**: each partition POSTs its own record
  batches (rate-limit sleep per batch, like the reference's 0.25 s), so
  throughput scales with the cluster, not the driver's single connection.
- **Commit protocol**: every task returns a WriterCommitMessage with its
  batch manifest; ``commit()`` runs once on the driver only after ALL
  tasks succeeded — a failed task aborts the job and, with the
  transactional ``dir:`` transport, leaves nothing visible (tasks stage to
  temp files; commit renames them in). Speculative/retried tasks are
  deduplicated by partition id at commit time.

Transports: ``transport=dir:<path>`` appends JSONL batch files under the
given directory (deterministic local form of the REST calls — tests and
offline runs); ``transport=requests`` does real HTTP against
``url``/``baseid``/``table``/``apikey`` options.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

BATCH_SIZE = 10


class _Manifest(WriterCommitMessage):
    def __init__(self, partition_id: int, staged: list[str], n_records: int):
        self.partition_id = partition_id
        self.staged = staged
        self.n_records = n_records


class AirtableWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.schema = schema
        self.transport = options.get("transport", "requests")

    # -- executor side ------------------------------------------------------------

    def write(self, rows: Iterator[Row]) -> _Manifest:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        staged: list[str] = []
        n = 0
        batch: list[dict] = []

        def flush() -> None:
            nonlocal batch
            if not batch:
                return
            if self.transport.startswith("dir:"):
                root = os.path.join(self.transport[4:], "_staged")
                os.makedirs(root, exist_ok=True)
                # unique name per attempt: a retried task stages fresh files
                path = os.path.join(root, f"p{pid}-{uuid.uuid4().hex}.jsonl")
                with open(path, "w") as f:
                    for rec in batch:
                        f.write(json.dumps(rec, sort_keys=True) + "\n")
                staged.append(path)
            else:
                import time

                import requests

                requests.post(
                    f"{self.options['url']}/v0/{self.options['baseid']}/{self.options['table']}",
                    headers={"Authorization": f"Bearer {self.options['apikey']}"},
                    json={"records": batch},
                )
                time.sleep(0.25)  # reference's rate-limit pause
            batch = []

        for row in rows:
            d = row.asDict(recursive=True)
            batch.append({"fields": {k: v for k, v in d.items() if v is not None}})
            n += 1
            if len(batch) >= BATCH_SIZE:
                flush()
        flush()
        return _Manifest(pid, staged, n)

    # -- driver side, after every task succeeded ----------------------------------

    def commit(self, messages: list[_Manifest]) -> None:
        if not self.transport.startswith("dir:"):
            return  # REST uploads are already live; nothing to publish
        root = self.transport[4:]
        os.makedirs(root, exist_ok=True)
        seen: set[int] = set()
        for m in sorted(messages, key=lambda m: m.partition_id):
            if m.partition_id in seen:
                continue  # speculative duplicate attempt
            seen.add(m.partition_id)
            for i, path in enumerate(m.staged):
                final = os.path.join(root, f"part-{m.partition_id:05d}-{i}.jsonl")
                os.replace(path, final)

    def abort(self, messages: list[_Manifest]) -> None:
        for m in messages:
            if m is None:
                continue
            for path in m.staged:
                if os.path.exists(path):
                    os.remove(path)


class AirtableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "airtable"

    def writer(self, schema: StructType, overwrite: bool) -> AirtableWriter:
        return AirtableWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(AirtableDataSource)
