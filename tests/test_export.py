import datetime as dt

import json

from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.pipeline.export import json_records, to_portal


def test_to_portal_ontology(spark):
    df = spark.createDataFrame(
        [(dt.date(2023, 5, 1), "CLP", 120.5, 3.2), (dt.date(2023, 5, 1), "XXX", 1.0, 1.0)],
        "landing_period date, catch_taxon string, landing_catch double, catch_price double",
    )
    out = to_portal(df, spark)
    assert {"period", "catch_kg", "price_usd", "fish_group", "period_label"} <= set(out.columns)
    rows = {r.catch_taxon: r for r in out.collect()}
    assert rows["CLP"].fish_group == "Small pelagics"
    assert rows["XXX"].fish_group is None  # reference: TRUE ~ NA_character_
    assert rows["CLP"].period_label == "May 2023"


def test_fish_group_table_complete_and_variant_rules(spark):
    """Every taxon of R/export.R:287-352 maps; the two reference variants
    disagree exactly where the reference's case_whens do (MZZ label, SUR's
    first-match branch)."""
    from peskas_timor_data_pipeline_spark.pipeline.export import (
        FISH_GROUPS,
        FISH_GROUPS_INGEST,
    )

    exp = dict(FISH_GROUPS)
    ing = dict(FISH_GROUPS_INGEST)
    # full export coverage: 10 groups, ~50 distinct taxa
    assert len(exp) >= 49
    assert set(exp.values()) == {
        "Molluscs", "Shrimps", "Other", "Crustaceans", "Cephalopods",
        "Sharks and rays", "Large demersals", "Large pelagics",
        "Small demersals", "Small pelagics",
    }
    assert exp["MZZ"] == "Other" and ing["MZZ"] == "Unknown"
    assert exp["SUR"] == "Small demersals" and ing["SUR"] == "Large demersals"
    # everything else agrees between the two reference copies
    diffs = {t for t in exp if t in ing and exp[t] != ing[t]}
    assert diffs == {"MZZ", "SUR"}


def test_json_records(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    rec = json.loads(json_records(df).collect()[0].value)
    assert rec == {"id": 1, "name": "a"}
