"""Airtable source/sink record conversion (S11/S12, R/airtable.R).

The REST transport is driver-side (rest.py pattern); these converters map
between Airtable's record JSON shape ({id, fields{...}, createdTime}) and
DataFrames. Batches of 10 on upload mirror the API limit
(R/airtable.R:151-232)."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def records_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Airtable records -> DataFrame (air_records_to_tibble,
    R/airtable.R:86-132): one row per record, fields unpacked, record id
    kept as ``_airtable_id``. List-valued fields stay arrays."""
    rows = [
        {"_airtable_id": r.get("id"), **(r.get("fields") or {})} for r in records
    ]
    return spark.createDataFrame(rows)


def df_to_record_batches(df: DataFrame, batch_size: int = 10) -> Iterator[list[dict]]:
    """DataFrame -> POST/PATCH record batches (air_tibble_to_records +
    upload batching, R/airtable.R:151-232). Collects via toLocalIterator so
    only one batch is in driver memory at a time."""
    batch: list[dict] = []
    id_col = "_airtable_id"
    for row in df.toLocalIterator():
        d = row.asDict(recursive=True)
        rec_id = d.pop(id_col, None)
        rec = {"fields": {k: v for k, v in d.items() if v is not None}}
        if rec_id:
            rec["id"] = rec_id
        batch.append(rec)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch
