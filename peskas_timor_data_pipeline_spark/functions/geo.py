"""Geospatial column expressions (SURVEY.md §2.7 Geo, A7).

The reference uses geosphere::distGeo (WGS84 geodesic) for end->start trip
distances (R/preprocess-pds-trips.R:127-131, R/validate-pds-trips.R:296-307)
and findInterval grid binning for track maps (R/ingest-pds-data.R:388-408).

Haversine (spherical) replaces distGeo: divergence <0.5% at the <=200 km
scales the thresholds operate on (2 km consecutive-trip, 3 km start-end,
200 km range) — tolerance documented in tests. Pure column expression;
whole-stage-codegen friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)


def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lng) points."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def bbox_filter(
    df: DataFrame,
    lat: str,
    lng: str,
    lat_min: float = -9.74,
    lat_max: float = -7.98,
    lng_min: float = 124.03,
    lng_max: float = 127.29,
) -> DataFrame:
    """Bounding-box row filter (Timor-Leste bbox,
    R/ingest-pds-data.R:314-320). Plain predicates -> parquet pushdown."""
    return df.filter(
        (F.col(lat) >= lat_min)
        & (F.col(lat) <= lat_max)
        & (F.col(lng) >= lng_min)
        & (F.col(lng) <= lng_max)
    )


def grid_cell(coord: Column, origin: float, step: float) -> Column:
    """findInterval-style grid cell index (A7: 0.001° map grid / 0.1°
    indicator grid, R/ingest-pds-data.R:388-408,494-573)."""
    return F.floor((coord - F.lit(origin)) / F.lit(step)).cast("long")
