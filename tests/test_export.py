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
    assert rows["CLP"].fish_group == "Sardines and herrings"
    assert rows["XXX"].fish_group == "Other"  # unknown taxa roll to Other
    assert rows["CLP"].period_label == "May 2023"


def test_json_records(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    rec = json.loads(json_records(df).collect()[0].value)
    assert rec == {"id": 1, "name": "a"}
