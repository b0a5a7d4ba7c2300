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


def point_in_polygon(
    lat: Column, lng: Column, polygon: list[tuple[float, float]]
) -> Column:
    """Ray-casting point-in-polygon test for a STATIC polygon (the
    reference's st_within against the national boundary,
    R/ingest-pds-data.R:744-747), generated as a pure column expression:
    one parity term per edge, no UDF, whole-stage-codegen friendly.

    ``polygon``: [(lat, lng), ...] vertices (closed implicitly). Suitable
    for boundary polygons up to a few thousand vertices (expression size
    grows linearly); beyond that, pre-simplify the polygon.
    """
    terms = []
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        crosses = ((F.lit(y1) > lat) != (F.lit(y2) > lat))
        # intersection x of the edge with the horizontal ray at `lat`
        x_at = F.lit(x1) + (lat - F.lit(y1)) * F.lit((x2 - x1)) / F.lit((y2 - y1) if y2 != y1 else 1e-12)
        terms.append(F.when(crosses & (lng < x_at), 1).otherwise(0))
    parity = terms[0]
    for t in terms[1:]:
        parity = parity + t
    return (parity % 2) == 1
