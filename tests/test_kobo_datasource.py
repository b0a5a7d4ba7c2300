"""The native Python DataSource for Kobo submissions: executor-parallel
id-range partitions and predicate pushdown into the REST query."""

from __future__ import annotations

from pyspark.sql import functions as F


def _read(spark, **opts):
    from peskas_timor_data_pipeline_spark.sources.kobo_source import register

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    reader = spark.read.format("kobo")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_kobo_source_reads_partitioned(spark):
    df = _read(spark, transport="fake:100", maxId="100", numPartitions="4")
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4
    row = df.filter(F.col("_id") == 7).collect()[0]
    assert row._submission_time.startswith("2024-01-08")
    assert '"gear": "g1"' in row.payload  # 7 % 3 == 1

def test_kobo_source_pushes_id_range_into_rest_query(spark):
    df = _read(spark, transport="fake:100", maxId="100", numPartitions="4")
    inc = df.filter(F.col("_id") > 90)
    assert inc.count() == 10
    # pushdown proof: the GreaterThan reached the source, so no post-scan
    # Filter node remains in the plan
    import re

    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Filter \(", plan)  # no Filter NODE post-scan
    # unpushable filters still work (evaluated by Spark post-scan)
    assert df.filter(F.col("payload").contains('"catch": 3')).count() > 0


class _FakeKoboServer:
    """Kobo-like endpoint honoring ``{"_id": {"$gt": lo, "$lte": hi}}``
    queries; records how many rows each request serves so tests can prove
    the partitioned scan fetches each id exactly once."""

    def __init__(self, n: int, page: int = 1000):
        self.n, self.page = n, page
        self.served: list[int] = []

    def get(self, url, params=None, auth=None, headers=None):
        import json as _json
        from urllib.parse import parse_qs, urlparse

        if params and "query" in params:
            bounds = _json.loads(params["query"])["_id"]
        else:  # follow-up page: bounds ride in the next-link query string
            qs = parse_qs(urlparse(url).query)
            bounds = _json.loads(qs["query"][0])["_id"] if "query" in qs else {}
        lo, hi = bounds.get("$gt", 0), bounds.get("$lte", self.n)
        start = int(parse_qs(urlparse(url).query).get("start", ["0"])[0])
        ids = [i for i in range(1, self.n + 1) if lo < i <= hi]
        chunk = ids[start:start + self.page]
        self.served.append(len(chunk))
        nxt = None
        if start + self.page < len(ids):
            q = _json.dumps({"_id": bounds})
            nxt = f"{url.split('?')[0]}?start={start + self.page}&query={q}"
        results = [
            {"_id": i, "_submission_time": f"2024-01-01T00:00:{i % 60:02d}"}
            for i in chunk
        ]

        class _Resp:
            def json(self_inner):
                return {"results": results, "next": nxt}

        return _Resp()


def test_kobo_partitions_fetch_disjoint_ranges(monkeypatch):
    """Scale probe for the real-HTTP path: with N partitions over a
    100-submission corpus, the server must serve exactly 100 rows TOTAL —
    the round-1 bug (no $lte in the query) made every partition download
    the whole id-tail, ~(N+1)/2 x corpus bytes."""
    import sys
    import types

    from peskas_timor_data_pipeline_spark.sources.kobo_source import KoboReader

    server = _FakeKoboServer(100, page=10)
    stub = types.ModuleType("requests")
    stub.get = server.get
    monkeypatch.setitem(sys.modules, "requests", stub)

    reader = KoboReader(
        {"url": "http://fake", "assetid": "a1", "maxid": "100",
         "numpartitions": "4", "transport": "requests"}
    )
    seen: list[int] = []
    for part in reader.partitions():
        seen.extend(row[0] for row in reader.read(part))
    assert sorted(seen) == list(range(1, 101))  # no gaps, no duplicates
    assert sum(server.served) == 100  # server-side: each id served ONCE


def test_fetch_kobo_paginated_pushes_both_bounds():
    """until_id lands in the API-side query JSON alongside since_id."""
    import json as _json

    from peskas_timor_data_pipeline_spark.sources.rest import (
        fetch_kobo_paginated,
    )

    captured = {}

    def fake_get(url, params=None, auth=None):
        captured.update(params or {})

        class _Resp:
            def json(self_inner):
                return {"results": [], "next": None}

        return _Resp()

    list(fetch_kobo_paginated(fake_get, "http://x", "a", since_id=10, until_id=25))
    assert _json.loads(captured["query"]) == {"_id": {"$gt": 10, "$lte": 25}}


def test_kobo_stream_resumes_from_checkpoint(spark, tmp_path):
    """The streaming source's offset is the last-seen _id: run 1 ingests
    ids 1..50; run 2 (same checkpoint, feed grown to 100) appends ONLY
    51..100 — incremental exactly-once across restarts with no anti-join."""
    from peskas_timor_data_pipeline_spark.sources.kobo_source import register

    register(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain(n):
        stream = (
            spark.readStream.format("kobo")
            .option("transport", f"fake:{n}")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)

    drain(50)
    ids = sorted(r._id for r in spark.read.parquet(sink).collect())
    assert ids == list(range(1, 51))
    drain(100)  # feed grew; checkpointed offset skips 1..50
    ids = sorted(r._id for r in spark.read.parquet(sink).collect())
    assert ids == list(range(1, 101))  # no duplicates, no gaps
