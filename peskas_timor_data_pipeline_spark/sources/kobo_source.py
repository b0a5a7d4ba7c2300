"""Kobo submissions as a native Spark data source (PySpark 4 Python
DataSource API): ``spark.read.format("kobo").load()``.

This replaces the reference's driver-side paginated fetch + 32-session
furrr fan-out (S1/S14, R/retrieve-survey-data.R:32-233,
R/ingest-pds-data.R:182-185) with Spark's own scan machinery:

- **Executor-parallel partitions**: the submission id-space splits into
  ``numPartitions`` disjoint ranges; each task fetches its range's pages
  independently (the REST API supports ``_id`` range queries), so ingest
  parallelism is cluster-sized, not driver-sized.
- **Predicate pushdown into REST**: ``pushFilters`` accepts ``_id``
  equality/range filters and turns them into API-side query constraints —
  an incremental load (``F.col("_id") > last_seen``) fetches only new
  submissions instead of filtering after download (the since-id pattern,
  S1).
- **Transports**: ``transport=fake:<n>`` serves a deterministic synthetic
  feed (tests/demos, no network); ``transport=requests`` does real HTTP.
  The fake lives here (not in tests) so executors can import it.

Rows are (``_id``, ``_submission_time``, ``payload``) with the raw
submission JSON in ``payload`` — downstream stages apply ``from_json``
with their explicit survey-version schema (§1.4), keeping this source
schema-stable across survey revisions.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "_id bigint, _submission_time string, payload string"


class _IdRange(InputPartition):
    def __init__(self, lo: int, hi: int | None):
        self.lo = lo  # exclusive
        self.hi = hi  # inclusive; None = open-ended


def _fake_rows(n: int, lo: int, hi: int | None) -> Iterator[tuple]:
    """Deterministic synthetic submission feed with ids 1..n."""
    last = n if hi is None else min(n, hi)
    for i in range(max(0, lo) + 1, last + 1):
        payload = {"_id": i, "survey": {"catch": i % 7, "gear": f"g{i % 3}"}}
        yield (i, f"2024-01-{(i % 28) + 1:02d}T00:00:00", json.dumps(payload))


class KoboReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.n_partitions = int(options.get("numpartitions", "8"))
        self.max_id = int(options.get("maxid", "1000000"))
        self.since_id = 0  # grows via pushed filters
        self.eq_id: int | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("_id",):
                self.since_id = max(self.since_id, int(f.value))
            elif isinstance(f, EqualTo) and f.attribute == ("_id",):
                self.eq_id = int(f.value)
            else:
                yield f  # not pushable: Spark evaluates it post-scan

    def partitions(self) -> list[InputPartition]:
        if self.eq_id is not None:
            return [_IdRange(self.eq_id - 1, self.eq_id)]
        lo, hi = self.since_id, self.max_id
        if hi <= lo:
            return [_IdRange(lo, hi)]
        step = max(1, (hi - lo) // self.n_partitions)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            _IdRange(a, b if i < len(bounds) - 2 else None)
            for i, (a, b) in enumerate(zip(bounds, bounds[1:]))
        ]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        transport = self.options.get("transport", "requests")
        if transport.startswith("fake:"):
            yield from _fake_rows(int(transport.split(":", 1)[1]), partition.lo, partition.hi)
            return
        import requests  # real path: range-query the API per partition

        from peskas_timor_data_pipeline_spark.sources.rest import (
            fetch_kobo_paginated,
        )

        url = self.options["url"]
        asset = self.options["assetid"]
        auth = None
        if "username" in self.options:
            auth = (self.options["username"], self.options.get("password", ""))
        # Both range bounds ride in the REST query, so each partition
        # downloads exactly its own id-range (no overlapping tails); the
        # client-side check is belt-and-braces against a non-conforming
        # server and stops the scan (break, not continue) past hi.
        for sub in fetch_kobo_paginated(
            requests.get, url, asset, auth=auth,
            since_id=partition.lo, until_id=partition.hi,
        ):
            _id = int(sub["_id"])
            if partition.hi is not None and _id > partition.hi:
                break
            yield (_id, sub.get("_submission_time", ""), json.dumps(sub))


class KoboStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the source: the offset IS the last-seen ``_id`` —
    the reference's since-id incremental fetch (S1) elevated to a real
    Structured Streaming source with checkpointed offsets. Each micro-batch
    reads ``(last_id, latest]``; a restart resumes from the checkpoint, so
    re-ingestion is exactly-once without any anti-join against the sink
    (the batch pattern S14 needs)."""

    def __init__(self, options: dict):
        self.options = options
        self.transport = options.get("transport", "requests")

    def initialOffset(self) -> dict:
        return {"last_id": int(self.options.get("sinceid", "0"))}

    def _rows_after(self, lo: int, hi: int | None) -> Iterator[tuple]:
        if self.transport.startswith("fake:"):
            yield from _fake_rows(int(self.transport.split(":", 1)[1]), lo, hi)
            return
        import requests

        from peskas_timor_data_pipeline_spark.sources.rest import (
            fetch_kobo_paginated,
        )

        auth = None
        if "username" in self.options:
            auth = (self.options["username"], self.options.get("password", ""))
        for sub in fetch_kobo_paginated(
            requests.get,
            self.options["url"],
            self.options["assetid"],
            auth=auth,
            since_id=lo,
            until_id=hi,
        ):
            _id = int(sub["_id"])
            if hi is None or _id <= hi:
                yield (_id, sub.get("_submission_time", ""), json.dumps(sub))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows = list(self._rows_after(int(start["last_id"]), None))
        last = max((r[0] for r in rows), default=int(start["last_id"]))
        return iter(rows), {"last_id": last}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows_after(int(start["last_id"]), int(end["last_id"]))


class KoboDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kobo"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> KoboReader:
        return KoboReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> KoboStreamReader:
        return KoboStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KoboDataSource)
