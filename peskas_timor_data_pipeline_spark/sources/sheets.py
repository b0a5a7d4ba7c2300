"""Google Sheets as landed tables (S9) + the two-way validation-flags
sync workflow (S10).

The reference reads every sheet tab as all-character columns
(``googlesheets4::range_read(col_types = "c")``,
R/ingest-metadata-tables.R:36-63) and writes the merged flags table back
with ``sheet_write`` (R/validate-landings.R:323-331). Mirroring the
Airtable sink's offline story, the transport here is pluggable:

- ``dir:<path>`` — each tab is ``<path>/<tab>.csv`` (header row, all
  strings — exactly a sheet's data model). Reads are native Spark CSV
  scans; writes stage through Spark's CSV writer and publish with an
  atomic rename, so a failed job never half-overwrites the sheet.
- ``requests`` — Sheets API v4 ``values.get`` / ``values.update`` with an
  injectable ``http`` callable (tests never need network; real runs pass
  ``requests``).

Sheets are KB-scale dimension/flags tables; the read lands them as
broadcast-sized frames (the reference's metadata-dim pattern), while the
sync MERGE itself is pure DataFrame algebra (``sync_flags_frames``)
that would scale to any flags volume.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the reference's flags-tab column types: "iDDclDc"
# (R/validate-landings.R:276-279)
FLAGS_SCHEMA = (
    "submission_id int, submission_date date, flag_date date, alert string, "
    "validated boolean, validated_when_ymd date, comments string"
)


def read_sheet(
    spark: SparkSession,
    transport: str,
    sheet_id: str,
    tab: str,
    http=None,
    api_key: str | None = None,
) -> DataFrame:
    """One sheet tab as an all-string DataFrame (``col_types = "c"``).
    Callers cast late, the engine's S3/S4 discipline."""
    if transport.startswith("dir:"):
        path = os.path.join(transport[4:], f"{tab}.csv")
        return spark.read.csv(path, header=True, inferSchema=False)
    url = (
        f"https://sheets.googleapis.com/v4/spreadsheets/{sheet_id}"
        f"/values/{tab}"
    )
    if http is None:  # pragma: no cover - network path
        import requests

        http = requests.get
    payload = http(url, params={"key": api_key} if api_key else None)
    values = (payload.json() if hasattr(payload, "json") else payload)["values"]
    header, rows = values[0], values[1:]
    # ragged rows: sheets drop trailing empties (pad with nulls) and can
    # return stray cells beyond the header range (truncate) — an unhandled
    # long row would fail createDataFrame with an opaque length error
    padded = [
        r[: len(header)] + [None] * (len(header) - len(r)) for r in rows
    ]
    return spark.createDataFrame(padded, ", ".join(f"`{h}` string" for h in header))


def write_sheet(
    df: DataFrame,
    transport: str,
    sheet_id: str,
    tab: str,
    http=None,
    api_key: str | None = None,
) -> None:
    """Overwrite one tab (``sheet_write`` semantics). ``dir:`` stages via
    Spark's CSV writer then renames atomically — no driver-side collect; a
    crash mid-write leaves the previous tab intact."""
    if transport.startswith("dir:"):
        root = transport[4:]
        os.makedirs(root, exist_ok=True)
        staging = os.path.join(root, f"_staging_{tab}")
        (
            df.select([F.col(c).cast("string") for c in df.columns])
            .coalesce(1)
            .write.mode("overwrite")
            .csv(staging, header=True, emptyValue=None)
        )
        part = glob.glob(os.path.join(staging, "part-*.csv"))[0]
        os.replace(part, os.path.join(root, f"{tab}.csv"))
        shutil.rmtree(staging, ignore_errors=True)
        return
    if http is None:  # pragma: no cover - network path
        import requests

        http = requests.put
    values = [df.columns] + [
        [None if v is None else str(v) for v in row]
        for row in df.toLocalIterator()
    ]
    http(
        f"https://sheets.googleapis.com/v4/spreadsheets/{sheet_id}"
        f"/values/{tab}",
        params={"valueInputOption": "RAW", **({"key": api_key} if api_key else {})},
        json={"values": values},
    )


def typed_flags(raw: DataFrame) -> DataFrame:
    """Cast an all-string flags tab to the reference's ``iDDclDc`` types."""
    return raw.select(
        F.col("submission_id").cast("int"),
        F.col("submission_date").cast("date"),
        F.col("flag_date").cast("date"),
        F.col("alert"),
        F.lower(F.col("validated")).cast("boolean").alias("validated"),
        F.col("validated_when_ymd").cast("date"),
        F.col("comments"),
    )


def unite_alerts(
    df: DataFrame, alert_cols: list[str], out_col: str = "alert"
) -> DataFrame:
    """The reference's alert unite (R/validate-landings.R:211-230):
    per-validator alert numbers joined with ``-`` skipping nulls
    (``concat_ws`` IS ``unite(na.rm=TRUE)``), empty -> "0"."""
    joined = F.concat_ws("-", *[F.col(c).cast("string") for c in alert_cols])
    return df.withColumn(
        out_col, F.when(joined == "", "0").otherwise(joined)
    )


def sync_flags_sheet(
    spark: SparkSession,
    transport: str,
    sheet_id: str,
    tab: str,
    local_alerts: DataFrame,
    http=None,
    api_key: str | None = None,
) -> DataFrame:
    """End-to-end S10 workflow: read the remote flags tab, merge with the
    freshly-computed local alerts under the reference's precedence rules
    (``rest.sync_flags_frames``), write the merged table back, return it."""
    from peskas_timor_data_pipeline_spark.sources.rest import sync_flags_frames

    remote = typed_flags(
        read_sheet(spark, transport, sheet_id, tab, http=http, api_key=api_key)
    )
    merged = sync_flags_frames(local_alerts, remote)
    write_sheet(merged, transport, sheet_id, tab, http=http, api_key=api_key)
    return merged
