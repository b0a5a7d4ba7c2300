"""Date/time helpers (SURVEY.md §2.7 Date/time).

The reference's binning uses lubridate::floor_date with unit in
{day, week(week_start=7 i.e. Sunday), month, year}
(R/format-public-data.R:368-373, R/estimate-catch.R:66, R/merge-trips.R:138).
Spark's date_trunc('week') is ISO Monday-start, so Sunday weeks need the
next_day/date_sub identity below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def week_start_sunday(d: Column) -> Column:
    """Sunday-start week truncation: the Sunday on or before ``d``
    (floor_date(unit='week', week_start=7)). next_day(d,'SUN') is the
    strictly-next Sunday, so minus 7 lands on-or-before."""
    return F.date_sub(F.next_day(F.to_date(d), "SUN"), 7)


def floor_date(d: Column, unit: str) -> Column:
    """lubridate::floor_date equivalent returning DateType."""
    unit = unit.lower()
    if unit == "day":
        return F.to_date(d)
    if unit == "week":
        return week_start_sunday(d)
    if unit in ("month", "year"):
        return F.trunc(F.to_date(d), unit)
    if unit == "minute":
        return F.date_trunc("minute", d)
    raise ValueError(f"unsupported unit: {unit}")
