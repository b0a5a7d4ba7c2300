"""Domain tests for the landings stages — ports of the reference's unit
tests (tests/testthat/test-pre-process-landings.R) and tinytest assertions
(inst/tinytest/test_validated_landings.R)."""

from __future__ import annotations

from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.pipeline.landings import (
    merge_landings,
    nest_attachments,
    nest_species,
    unnest_catches,
)


def _wide_fixture(spark):
    cols = {
        "_id": "101",
        "date": "2023-05-02",
        "total_catch_value": "25",
        "species_group.0.species_group/species": "3",
        "species_group.0.species_group/food_or_sale": "food",
        "species_group.0.species_group/no_fish_by_length_group/no_individuals_5_10": "20",
        "species_group.0.species_group/no_fish_by_length_group/no_individuals_10_15": "5",
        "species_group.1.species_group/species": "7",
        "species_group.1.species_group/food_or_sale": "sale",
        "species_group.1.species_group/no_fish_by_length_group/no_individuals_over60": "2",
        "species_group.1.species_group/no_fish_by_length_group/fish_length_over60": "75",
        "_attachments.0.download_url": "http://x/1.jpg",
        "_attachments.0.id": "9001",
    }
    row2 = dict.fromkeys(cols, None)
    row2["_id"] = "102"
    row2["date"] = "2023-05-03"
    return spark.createDataFrame(
        [tuple(cols.values()), tuple(row2.values())], list(cols.keys())
    )


def test_nest_species_structure_and_values(spark):
    nested = nest_species(_wide_fixture(spark))
    assert "species_group" in nested.columns
    assert not any(c.startswith("species_group.") for c in nested.columns)

    r = nested.filter(F.col("_id") == "101").collect()[0]
    assert len(r.species_group) == 2
    first = r.species_group[0]
    # reference's own value check: class 5_10 -> mean_length 7.5, n 20
    assert first.species == "3"
    assert first.length_individuals[0].mean_length == 7.5
    assert first.length_individuals[0].n_individuals == 20.0
    # over60 takes the surveyed actual length
    second = r.species_group[1]
    assert second.length_individuals[0].mean_length == 75.0
    assert second.length_individuals[0].n_individuals == 2.0

    # no-catch submission nests to an empty array, not null rows
    empty = nested.filter(F.col("_id") == "102").collect()[0]
    assert list(empty.species_group) == []


def test_nest_attachments(spark):
    nested = nest_attachments(_wide_fixture(spark))
    r = nested.filter(F.col("_id") == "101").collect()[0]
    assert r._attachments[0].download_url == "http://x/1.jpg"
    empty = nested.filter(F.col("_id") == "102").collect()[0]
    assert list(empty._attachments) == []


def test_unnest_catches_roundtrip(spark):
    nested = nest_species(_wide_fixture(spark))
    flat = unnest_catches(nested, ["_id"])
    catch = flat.filter(F.col("_id") == "101")
    assert catch.count() == 3  # 2 length classes + 1 over60
    total = catch.agg(F.sum("n_individuals")).collect()[0][0]
    assert total == 27.0
    # keep_empty: the no-catch submission still has its row
    assert flat.filter(F.col("_id") == "102").count() == 1


def test_merge_landings_coalesce(spark):
    v1 = spark.createDataFrame([("1", "GN")], ["_id", "gear"])
    v2 = spark.createDataFrame([("2", "HL", "5")], ["_id", "trip_group/gear_type", "trip_group/habitat"])
    merged = merge_landings({"v1": v1, "v2": v2})
    rows = {r._id: r for r in merged.collect()}
    assert rows["1"].survey_version == "v1"
    assert rows["1"].gear_type == "GN"  # coalesced from v1's `gear`
    assert rows["2"].gear_type == "HL"
    assert rows["2"].habitat == "5"
