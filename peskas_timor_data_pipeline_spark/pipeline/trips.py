"""PDS tracker-trip pipeline: preprocess -> descriptors -> validate ->
merge with landings (SURVEY.md §3.2).

- ``preprocess_trips``: typed read done by sources; here tz-normalize and
  parse ``Last Seen`` ("%a %b %d %X UTC %Y", R/preprocess-pds-trips.R:50-62)
- ``track_descriptors``: per-trip GPS summaries — start/end geodesic
  distance, speed-outlier share, time-trace dispersion
  (R/preprocess-pds-trips.R:101-145)
- ``merge_consecutive_trips``: pairwise sessionization of trips with
  <3 h gap and <2 km end->start distance (R/validate-pds-trips.R:242-308)
- ``validate_trips``: alerts 8/9/12/13 + dedup + ``Last Seen`` sanity
  (R/validate-pds-trips.R:17-114,149-204)
- ``merge_trips``: constrained 1:1-per-day match with landings
  (R/merge-trips.R:17-65) via operators.joins.one_to_one_day_match
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from peskas_timor_data_pipeline_spark.functions.geo import haversine_m
from peskas_timor_data_pipeline_spark.operators.restructure import distinct_except
from peskas_timor_data_pipeline_spark.operators.windows import sessionize


def preprocess_trips(raw: DataFrame, timezone: str = "Asia/Dili") -> DataFrame:
    """Parse `Last Seen` and rename to snake_case working columns."""
    return raw.select(
        F.col("Trip").alias("trip"),
        F.col("Started").alias("started"),
        F.col("Ended").alias("ended"),
        F.col("Boat").alias("boat"),
        F.col("`Duration (Seconds)`").alias("duration_s"),
        F.col("`Range (Meters)`").alias("range_m"),
        F.col("`Distance (Meters)`").alias("distance_m"),
        F.col("IMEI").alias("imei"),
        F.col("`Device Id`").alias("device_id"),
        F.to_timestamp(F.col("`Last Seen`"), "EEE MMM dd HH:mm:ss 'UTC' yyyy").alias(
            "last_seen"
        ),
    )


def track_descriptors(tracks: DataFrame, speed_cutoff: float = 30.0) -> DataFrame:
    """Per-trip GPS summaries (R/preprocess-pds-trips.R:122-145):
    start/end positions + geodesic distance between them, proportion of
    speed outliers (>30 m/s), sd of inter-fix intervals (trace dispersion).
    One groupBy(Trip); first/last pinned by explicit Time ordering via
    min/max struct (deterministic, unlike dplyr first/last)."""
    by_time = F.struct(F.col("Time"), F.col("Lat"), F.col("Lng"))
    per_trip = tracks.groupBy("Trip").agg(
        F.min(by_time).alias("__first__"),
        F.max(by_time).alias("__last__"),
        F.round(
            F.avg(F.when(F.col("`Speed (M/S)`") > speed_cutoff, 1.0).otherwise(0.0)), 6
        ).alias("outliers_proportion"),
        F.count(F.lit(1)).alias("n_fixes"),
    )
    out = per_trip.select(
        "Trip",
        F.col("__first__.Lat").alias("start_lat"),
        F.col("__first__.Lng").alias("start_lng"),
        F.col("__last__.Lat").alias("end_lat"),
        F.col("__last__.Lng").alias("end_lng"),
        "outliers_proportion",
        "n_fixes",
    )
    return out.withColumn(
        "start_end_distance",
        haversine_m(
            F.col("start_lat"), F.col("start_lng"), F.col("end_lat"), F.col("end_lng")
        ),
    )


def timetrace_dispersion(tracks: DataFrame) -> DataFrame:
    """sd of successive fix intervals per trip (`timetrace_dispersion`,
    R/preprocess-pds-trips.R:136-140) — needs a lag, so separate window
    pass from the plain aggregates above."""
    w = Window.partitionBy("Trip").orderBy("Time")
    diffs = tracks.withColumn(
        "__dt__",
        F.col("Time").cast("double") - F.lag(F.col("Time").cast("double")).over(w),
    )
    return diffs.groupBy("Trip").agg(
        F.round(F.stddev("__dt__"), 6).alias("timetrace_dispersion")
    )


def merge_consecutive_trips(
    trips: DataFrame,
    max_gap_h: float = 3.0,
    max_km: float = 2.0,
    descriptors: DataFrame | None = None,
) -> DataFrame:
    """Merge boat trips separated by <3 h and <2 km end->start into one
    logical trip (R/validate-pds-trips.R:242-308): session id via running
    sum, then per-session first/last/sums.

    NOTE: the reference's one-step lag() chains at most PAIRWISE; the
    running-sum sessionization here closes full chains (documented
    deviation — strictly better-defined, SURVEY.md §7.4)."""
    w = Window.partitionBy("boat").orderBy("started")
    prepared = (
        trips.withColumn("prev_ended", F.lag("ended").over(w))
        .withColumn("prev_end_lat", F.lag("end_lat").over(w))
        .withColumn("prev_end_lng", F.lag("end_lng").over(w))
    )
    close_in_time = (
        F.col("prev_ended").isNotNull()
        & (
            (F.col("started").cast("double") - F.col("prev_ended").cast("double"))
            <= max_gap_h * 3600
        )
    )
    close_in_space = (
        F.col("prev_end_lat").isNull()
        | (
            haversine_m(
                F.col("prev_end_lat"),
                F.col("prev_end_lng"),
                F.col("start_lat"),
                F.col("start_lng"),
            )
            <= max_km * 1000
        )
    )
    sess = sessionize(
        prepared, ["boat"], "started", close_in_time & close_in_space, "session_id"
    )
    return sess.groupBy("boat", "session_id").agg(
        F.min("trip").alias("trip"),
        F.min("started").alias("started"),
        F.max("ended").alias("ended"),
        F.sum("distance_m").alias("distance_m"),
        F.max("range_m").alias("range_m"),
        F.first("imei").alias("imei"),
        F.first("device_id").alias("device_id"),
        F.max("last_seen").alias("last_seen"),
        F.count(F.lit(1)).alias("n_merged"),
    ).withColumn(
        "duration_s",
        F.col("ended").cast("double") - F.col("started").cast("double"),
    )


def validate_trips(
    trips: DataFrame,
    max_duration_h: float = 96.0,
    min_duration_h: float = 0.0,
    max_km: float = 200.0,
    se_km: float = 3.0,
    max_outliers: float = 0.1,
    max_dispersion: float = 500.0,
) -> DataFrame:
    """Alerts 8 (duration bounds), 9 (distance), 12 (one-way trip), 13
    (track quality) + ontology rename (R/validate-pds-trips.R:75-94,149-204).
    Input: merged sessions with start/end coordinates + descriptor columns
    (``start_end_distance``, ``outliers_proportion``,
    ``timetrace_dispersion``) joined; alerts 12/13 are skipped when their
    descriptor columns are absent.

    Semantics notes vs the reference:
    - alert 8 checks BOTH duration bounds (`> max_hrs` OR `< min_hrs`,
      R/validate-pds-trips.R:161-163).
    - alert 12: the reference's ``case_when(dist > km*1000 ~ 9, TRUE ~ NA,
      se_dist > se_km*100 ~ 12, TRUE ~ NA)`` places a catch-all TRUE arm
      *before* the one-way condition, so alert 12 is dead code there
      (R/validate-pds-trips.R:176-180). We implement the documented intent
      (one-way trip: start->end distance above threshold) with alert 9
      taking precedence, matching the reference's first-match-wins order.
      The reference's ``se_km * 100`` (not *1000) scale is preserved.
    - alert 13 nulls distance + timestamps when track quality is poor
      (outlier share or trace dispersion above threshold,
      R/validate-pds-trips.R:187-201)."""
    deduped = distinct_except(trips, ["trip"]) if "trip" in trips.columns else trips
    sane = deduped.filter(
        F.col("last_seen").isNull()
        | (F.col("last_seen") >= F.col("ended"))
    )
    alert_8 = F.when(
        (F.col("duration_s") > max_duration_h * 3600)
        | (F.col("duration_s") < min_duration_h * 3600),
        8,
    )
    has_se = "start_end_distance" in sane.columns
    alert_9 = F.when(F.col("distance_m") > max_km * 1000, 9)
    if has_se:
        alert_9 = alert_9.when(F.col("start_end_distance") > se_km * 100, 12)
    has_quality = {"outliers_proportion", "timetrace_dispersion"} <= set(sane.columns)
    alert_13 = (
        F.when(
            (F.col("outliers_proportion") > max_outliers)
            | (F.col("timetrace_dispersion") > max_dispersion),
            13,
        )
        if has_quality
        else F.lit(None).cast("int")
    )
    out = (
        sane.withColumn("alert_8", alert_8)
        .withColumn("alert_9", alert_9)
        .withColumn("alert_13", alert_13)
    )
    quality_ok = F.col("alert_13").isNull()
    return out.select(
        F.col("trip").alias("tracker_trip_id"),
        F.when(F.col("alert_8").isNull() & quality_ok, F.col("started")).alias(
            "tracker_trip_start"
        ),
        F.when(F.col("alert_8").isNull() & quality_ok, F.col("ended")).alias(
            "tracker_trip_end"
        ),
        F.when(F.col("alert_8").isNull(), F.col("duration_s")).alias(
            "tracker_trip_duration"
        ),
        # distance is nulled by alert 9 (too long) and alert 13 (poor track);
        # alert 12 (one-way) flags but keeps the distance, as the reference's
        # distance-cleaning condition only tests the >km branch
        F.when((F.col("alert_9") == 9) | F.col("alert_13").isNotNull(), F.lit(None))
        .otherwise(F.col("distance_m"))
        .alias("tracker_trip_distance"),
        F.col("imei").alias("tracker_imei"),
        F.col("device_id").alias("tracker_device_id"),
        F.col("last_seen").alias("tracker_last_seen"),
        F.concat_ws("-", "alert_8", "alert_9", "alert_13").alias("alert"),
    )


def merge_trips(landings: DataFrame, validated_trips: DataFrame) -> DataFrame:
    """Constrained 1:1-per-day match on (landing_date, tracker_imei)
    (J5, R/merge-trips.R:17-65); a PDS trip's landing date is the date of
    its end timestamp."""
    from peskas_timor_data_pipeline_spark.operators.joins import one_to_one_day_match

    trips_dated = validated_trips.withColumn(
        "landing_date", F.to_date("tracker_trip_end")
    )
    return one_to_one_day_match(
        landings, trips_dated, ["landing_date", "tracker_imei"]
    )


def downsample_tracks(
    tracks: DataFrame, unit: str = "minute", first_cols: tuple[str, ...] = ("Lat", "Lng"),
    mean_cols: tuple[str, ...] = ("`Speed (M/S)`",),
) -> DataFrame:
    """1 s GPS fixes -> per-minute track (R/merge-trips.R:135-151): truncate
    Time, per (Trip, minute) keep the FIRST fix's position fields and the
    mean speed. dplyr's first is input-order-dependent; here it is pinned to
    the earliest Time via a min(struct) — one shuffle, map-side partial
    aggregation (60x data reduction before it)."""
    def clean(c: str) -> str:
        return c.strip("`")

    tcol = F.date_trunc(unit, F.col("Time")).alias("Time")
    by_time = F.struct(F.col("Time"), *[F.col(c) for c in first_cols])
    firsts = F.min(by_time).alias("__first__")
    means = [F.avg(F.col(c)).alias(clean(c) + "_mean") for c in mean_cols]
    agg = tracks.groupBy(F.col("Trip"), tcol).agg(firsts, *means)
    return agg.select(
        "Trip",
        "Time",
        *[F.col("__first__").getField(clean(c)).alias(clean(c)) for c in first_cols],
        *[F.col("`" + clean(c) + "_mean`") for c in mean_cols],
    )
