"""Domain tests for the PDS-trips stages — tinytest invariant ports
(inst/tinytest/test_validated_pds_trips.R, test_merged_trips.R) plus the
sessionization case from FIXTURES.md §3."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.pipeline.trips import (
    downsample_tracks,
    merge_consecutive_trips,
    merge_trips,
    track_descriptors,
    timetrace_dispersion,
    validate_trips,
)


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _trips_fixture(spark):
    # boat 1: two trips 2h apart ending/starting ~1.1km apart -> must merge;
    # boat 2: isolated long trip (>96h -> alert 8) and huge distance (alert 9)
    # Timestamps as STRINGS cast in Spark: naive Python datetimes would be
    # interpreted in the driver's system TZ, not the session TZ (Asia/Dili).
    rows = [
        (1, "2023-05-01 06:00:00", "2023-05-01 10:00:00", 1,
         3600.0 * 4, 1000.0, 5000.0, "867452048", "d1", None,
         -8.55, 125.56, -8.56, 125.57),
        (2, "2023-05-01 12:00:00", "2023-05-01 15:00:00", 1,
         3600.0 * 3, 900.0, 4000.0, "867452048", "d1", None,
         -8.555, 125.575, -8.54, 125.58),
        (3, "2023-05-03 00:00:00", "2023-05-08 00:00:00", 2,
         3600.0 * 120, 250000.0, 500000.0, "867452099", "d2", None,
         -8.6, 125.4, -8.9, 126.9),
    ]
    schema = (
        "trip int, started string, ended string, boat int, "
        "duration_s double, range_m double, distance_m double, imei string, "
        "device_id string, last_seen string, start_lat double, "
        "start_lng double, end_lat double, end_lng double"
    )
    df = spark.createDataFrame(rows, schema)
    return (
        df.withColumn("started", F.to_timestamp("started"))
        .withColumn("ended", F.to_timestamp("ended"))
        .withColumn("last_seen", F.to_timestamp("last_seen"))
    )


def test_merge_consecutive_trips(spark):
    sessions = merge_consecutive_trips(_trips_fixture(spark))
    fmt = sessions.withColumn(
        "started_s", F.date_format("started", "yyyy-MM-dd HH:mm:ss")
    ).withColumn("ended_s", F.date_format("ended", "yyyy-MM-dd HH:mm:ss"))
    rows = {r.trip: r for r in fmt.collect()}
    assert len(rows) == 2  # boat 1's two trips merged into one session
    merged = rows[1]
    assert merged.n_merged == 2
    assert merged.distance_m == 9000.0
    assert merged.started_s == "2023-05-01 06:00:00"
    assert merged.ended_s == "2023-05-01 15:00:00"
    # recomputed duration spans the merged session
    assert merged.duration_s == 9 * 3600


def test_validate_trips_alerts_and_invariants(spark):
    sessions = merge_consecutive_trips(_trips_fixture(spark))
    validated = validate_trips(sessions)
    rows = {r.tracker_trip_id: r for r in validated.collect()}
    # alert 8 (duration>96h) and 9 (distance>200km) null the values
    bad = rows[3]
    assert "8" in bad.alert and "9" in bad.alert
    assert bad.tracker_trip_duration is None
    assert bad.tracker_trip_distance is None
    good = rows[1]
    assert good.alert == ""
    # tinytest invariants: start < end, ids unique
    assert validated.filter(
        F.col("tracker_trip_start") >= F.col("tracker_trip_end")
    ).count() == 0
    assert validated.count() == validated.select("tracker_trip_id").distinct().count()


def test_track_descriptors(spark):
    rows = [
        (_t("2023-05-01 06:00:00"), 1, 1, -8.55, 125.56, 2.0, 10.0, 90.0),
        (_t("2023-05-01 06:00:10"), 1, 1, -8.553, 125.562, 35.0, 20.0, 91.0),
        (_t("2023-05-01 06:00:30"), 1, 1, -8.56, 125.57, 3.0, 30.0, 92.0),
    ]
    cols = ["Time", "Boat", "Trip", "Lat", "Lng", "Speed (M/S)", "Range (Meters)", "Heading"]
    tracks = spark.createDataFrame(rows, cols)
    desc = track_descriptors(tracks).collect()[0]
    assert desc.n_fixes == 3
    assert abs(desc.outliers_proportion - 1 / 3) < 1e-6
    # haversine start->end ~1.9km for this delta (tolerance vs distGeo <0.5%)
    assert 1500 < desc.start_end_distance < 2500
    disp = timetrace_dispersion(tracks).collect()[0]
    # intervals 10s, 20s -> sample sd = 7.071068
    assert abs(disp.timetrace_dispersion - 7.071068) < 1e-5


def test_merge_trips_one_to_one(spark):
    landings = spark.createDataFrame(
        [
            (dt.date(2023, 5, 1), "867452048", 11, 50.0),
            (dt.date(2023, 5, 8), "867452099", 12, 30.0),
            (dt.date(2023, 5, 8), "867452099", 13, 20.0),  # 2 same-day -> unmatched
        ],
        ["landing_date", "tracker_imei", "landing_id", "landing_catch"],
    )
    validated = validate_trips(merge_consecutive_trips(_trips_fixture(spark)))
    merged = merge_trips(landings, validated)
    # tinytest: landing ids and tracker ids stay unique
    nn = merged.filter(F.col("landing_id").isNotNull())
    assert nn.count() == nn.select("landing_id").distinct().count()
    tt = merged.filter(F.col("tracker_trip_id").isNotNull())
    assert tt.count() == tt.select("tracker_trip_id").distinct().count()
    # boat1's merged session matches the 5-01 landing 1:1
    matched = merged.filter(
        F.col("landing_id").isNotNull() & F.col("tracker_trip_id").isNotNull()
    ).collect()
    assert len(matched) == 1 and matched[0].landing_id == 11
    # the duplicated-day landings pass through unmatched
    assert merged.filter(F.col("landing_id").isin(12, 13)).filter(
        F.col("tracker_trip_id").isNotNull()
    ).count() == 0


def test_validate_trips_quality_and_oneway_alerts(spark):
    # descriptor columns present -> alerts 12 (one-way) and 13 (quality) live;
    # alert 8 lower bound fires on the too-short trip
    rows = [
        # trip, started, ended, duration_s, distance_m, se_dist, outl, disp
        (1, "2023-05-01 06:00:00", "2023-05-01 10:00:00", 4 * 3600.0, 5000.0, 100.0, 0.0, 10.0),
        (2, "2023-05-02 06:00:00", "2023-05-02 10:00:00", 4 * 3600.0, 5000.0, 900.0, 0.0, 10.0),   # one-way: 900 > 3*100
        (3, "2023-05-03 06:00:00", "2023-05-03 10:00:00", 4 * 3600.0, 5000.0, 100.0, 0.5, 10.0),   # poor quality
        (4, "2023-05-04 06:00:00", "2023-05-04 06:00:30", 30.0, 100.0, 10.0, 0.0, 1.0),            # too short (<0.25h)
    ]
    df = spark.createDataFrame(
        rows,
        "trip int, started string, ended string, duration_s double, "
        "distance_m double, start_end_distance double, "
        "outliers_proportion double, timetrace_dispersion double",
    )
    df = (
        df.withColumn("started", F.to_timestamp("started"))
        .withColumn("ended", F.to_timestamp("ended"))
        .withColumn("imei", F.lit("867452048"))
        .withColumn("device_id", F.lit("d1"))
        .withColumn("last_seen", F.lit(None).cast("timestamp"))
    )
    out = {
        r.tracker_trip_id: r
        for r in validate_trips(df, min_duration_h=0.25, se_km=3.0).collect()
    }
    assert out[1].alert == ""
    # alert 12 flags but KEEPS the distance (reference's distance-cleaning
    # condition only tests the >km branch)
    assert out[2].alert == "12" and out[2].tracker_trip_distance == 5000.0
    # alert 13 nulls distance and timestamps
    assert out[3].alert == "13"
    assert out[3].tracker_trip_distance is None
    assert out[3].tracker_trip_start is None
    # alert 8 lower bound nulls duration + timestamps
    assert out[4].alert == "8"
    assert out[4].tracker_trip_duration is None
    assert out[4].tracker_trip_end is None


def test_downsample_tracks_minute_grain(spark):
    rows = [
        (_t("2023-05-01 06:00:05"), 1, -8.55, 125.56, 2.0),
        (_t("2023-05-01 06:00:45"), 1, -8.56, 125.57, 4.0),
        (_t("2023-05-01 06:01:10"), 1, -8.57, 125.58, 6.0),
    ]
    tracks = spark.createDataFrame(
        rows, ["Time", "Trip", "Lat", "Lng", "Speed (M/S)"]
    )
    out = {
        r.Time.isoformat(): r
        for r in downsample_tracks(tracks, mean_cols=("`Speed (M/S)`",)).collect()
    }
    m0 = out["2023-05-01T06:00:00"]
    # first fix (earliest Time) wins the position; speed is the minute mean
    assert m0.Lat == -8.55 and abs(m0["Speed (M/S)_mean"] - 3.0) < 1e-9
    assert out["2023-05-01T06:01:00"].Lat == -8.57
