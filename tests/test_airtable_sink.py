"""The V2 write path for the Airtable sink: executor-parallel batched
uploads with a commit protocol (staged files become visible only at
commit; aborts leave nothing)."""

from __future__ import annotations

import glob
import json
import os


def test_airtable_sink_batches_and_commits(spark, tmp_path):
    from peskas_timor_data_pipeline_spark.sources.airtable_sink import register

    register(spark)
    out = str(tmp_path / "air")
    df = spark.range(25).selectExpr(
        "CAST(id AS INT) AS landing_id",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('site', id % 3) END AS site",
    ).repartition(3)
    (
        df.write.format("airtable")
        .option("transport", f"dir:{out}")
        .mode("append")
        .save()
    )
    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert files, "commit must publish staged batches"
    recs = []
    for f in files:
        with open(f) as fh:
            recs += [json.loads(l) for l in fh]
    assert len(recs) == 25
    # record shape: {"fields": {...}} with nulls dropped (reference
    # semantics, R/airtable.R:151-232)
    by_id = {r["fields"]["landing_id"]: r["fields"] for r in recs}
    assert set(by_id) == set(range(25))
    assert "site" not in by_id[0] and by_id[1]["site"] == "site1"
    # batching: no file exceeds the 10-record API limit
    for f in files:
        with open(f) as fh:
            assert sum(1 for _ in fh) <= 10
    # nothing left staged
    assert not glob.glob(os.path.join(out, "_staged", "*"))
