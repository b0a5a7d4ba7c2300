"""Metadata cleaning specs (pt_validate_*, R/preprocess-metadata-tables.R)."""

import pytest

from peskas_timor_data_pipeline_spark.pipeline.metadata import (
    MetadataValidationError,
    clean_metadata,
    validate_boats,
    validate_flags,
    validate_reg_boats,
    validate_vessels_stats,
    validate_vms_installs,
)


def test_vms_installs_damage_before_install_raises(spark):
    """Reference :118-131: damage recorded on/before installation stops
    the pipeline; damage strictly after passes and the date column casts."""
    ok = spark.createDataFrame(
        [
            ("A", "installation", 1, "2023-01-01"),
            ("A", "damage recorded", 1, "2023-06-01"),
            ("B", "installation", 2, "2023-02-01"),
        ],
        "device_imei string, device_event_type string, boat_id int, device_event_date string",
    )
    out = validate_vms_installs(ok)
    assert dict(out.dtypes)["device_event_date"] == "date"

    bad = spark.createDataFrame(
        [
            ("A", "installation", 1, "2023-06-01"),
            ("A", "damage recorded", 1, "2023-01-01"),
        ],
        "device_imei string, device_event_type string, boat_id int, device_event_date string",
    )
    # default matches OBSERVED reference behavior: the reference's
    # any(isFALSE(...)) stop-guard is dormant, so violations flow through
    assert validate_vms_installs(bad).count() == 2
    with pytest.raises(MetadataValidationError, match="damage recorded"):
        validate_vms_installs(bad, strict=True)


def test_flags_null_message_dropped_and_dup_id_raises(spark):
    f = spark.createDataFrame(
        [(1, "cat", "msg"), (2, "cat", None), (3, "cat", "other")],
        "flag_id int, flag_category string, flag_message string",
    )
    out = validate_flags(f)
    assert out.count() == 2
    assert dict(out.dtypes)["flag_id"] == "string"

    dup = spark.createDataFrame(
        [(1, "cat", "msg"), (1, "cat", "other")],
        "flag_id int, flag_category string, flag_message string",
    )
    with pytest.raises(MetadataValidationError, match="not unique"):
        validate_flags(dup)


def test_boats_length_gate(spark):
    ok = spark.createDataFrame(
        [(5.0, "2023-01-02 10:30"), (None, "2023-01-02 10:30")],
        "boat_length double, last_modified_time string",
    )
    out = validate_boats(ok)
    assert dict(out.dtypes)["last_modified_time"] == "timestamp"

    bad = spark.createDataFrame(
        [(30.0, "2023-01-02 10:30")],
        "boat_length double, last_modified_time string",
    )
    # default matches OBSERVED reference behavior (dormant length guard)
    assert validate_boats(bad).count() == 1
    with pytest.raises(MetadataValidationError, match="unvalid"):
        validate_boats(bad, strict=True)


def test_reg_boats_case_when(spark):
    """Dili pins 2022; a decrease or a missing 2022 falls back to 2016."""
    reg = spark.createDataFrame(
        [
            ("Dili", 100, 80),      # Dili: always 2022 even though it fell
            ("Aileu", 50, 40),      # decrease -> 2016
            ("Baucau", 50, None),   # missing -> 2016
            ("Manatuto", 50, 60),   # increase -> 2022
        ],
        "Municipality string, registered_boats_2016 int, registered_boats_2022 int",
    )
    got = {r.reporting_region: r.n_boats for r in validate_reg_boats(reg).collect()}
    assert got == {"Dili": 80, "Aileu": 50, "Baucau": 50, "Manatuto": 60}


def test_vessels_stats_split_and_trim(spark):
    vs = spark.createDataFrame(
        [(" Dili | canoe | ignored", "12", "2024-01-01")],
        "boat_numbers string, n_boats string, info_date string",
    )
    row = validate_vessels_stats(vs).collect()[0]
    assert (row.reporting_region, row.type, row.n_boats) == ("Dili", "canoe", 12)


def test_clean_metadata_dispatch(spark):
    """Placeholder tables pass through; typed tables get their casts."""
    tables = {
        "catch_types": spark.createDataFrame([(1,)], "x int"),
        "vessel_types": spark.createDataFrame([("7", "skiff")], "boat_code string, name string"),
        "devices": spark.createDataFrame([(123,)], "device_imei long"),
        "unknown_extra": spark.createDataFrame([(1,)], "y int"),
    }
    out = clean_metadata(tables)
    assert out["catch_types"].collect() == tables["catch_types"].collect()
    assert dict(out["vessel_types"].dtypes)["boat_code"] == "int"
    assert dict(out["devices"].dtypes)["device_imei"] == "string"
    assert "unknown_extra" in out
