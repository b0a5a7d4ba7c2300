"""Hash-based id helpers (SURVEY.md §2.7 Hash).

The reference anonymizes trip ids with digest::digest(paste(landing_id,
tracker_trip_id)) (R/format-public-data.R:310-319). We standardize on
md5(concat_ws(' ', ...)) — deterministic, engine-portable (identical in
Spark, DuckDB, Python hashlib), and collision-safe at any scale."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def anonymized_id(*cols: Column, sep: str = " ") -> Column:
    """Stable anonymized id from one or more key columns."""
    return F.md5(F.concat_ws(sep, *[c.cast("string") for c in cols]))
