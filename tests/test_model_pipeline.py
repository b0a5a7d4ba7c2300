"""GLMM model-variant pipeline (pipeline/model_pipeline.py): the
run_models chain (R/model-catch.R:305-559) composed from green M4/M5/M6
operators — month x region granularity, the 13-taxa loop as a group key."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.pipeline.model_pipeline import (
    catch_model_frame_per_taxa,
    landings_model_frame,
    model_indicators,
    predict_monthly,
    with_model_factors,
)


def _trips(spark):
    rows = []
    lid = 0
    for region, imei in (("Lautem", 100), ("Dili", 200)):
        for month in range(1, 7):
            for k in range(2 + month % 2):
                lid += 1
                rows.append(
                    (
                        region,
                        imei + k % 2,
                        1000 + lid,
                        lid,
                        dt.date(2019, month, 3 + k),
                        float(10 + 5 * k + month),
                    )
                )
    return spark.createDataFrame(
        rows,
        "region string, tracker_imei int, tracker_trip_id int, "
        "landing_id int, landing_date date, landing_value double",
    )


def _catch(spark, trips):
    taxa = ["SNA", "TUN", "XYZ"]  # XYZ is outside taxa_list -> MZZ
    rows = []
    for t in trips.collect():
        for i, tax in enumerate(taxa):
            if (t.landing_id + i) % 3 == 0:
                continue  # structural zeros for the ZI mass
            rows.append(
                (
                    t.region,
                    t.landing_id,
                    t.landing_date,
                    tax,
                    float(500 + 250 * i + 10 * (t.landing_id % 7)),
                )
            )
    return spark.createDataFrame(
        rows,
        "region string, landing_id int, landing_date date, "
        "catch_taxon string, weight double",
    )


def test_factor_columns_match_reference_recode(spark):
    df = spark.createDataFrame(
        [(dt.date(2019, 5, 1),), (dt.date(2019, 6, 1),)],
        "landing_period date",
    )
    out = {r.landing_period.month: r for r in with_model_factors(df).collect()}
    assert out[5].version == "v1" and out[6].version == "v2"
    assert out[5].month == "05" and out[5].period == "2019-5"


def test_landings_frame_trims_first_and_last_month(spark):
    trips = _trips(spark)
    lf = landings_model_frame(trips)
    # imeis active Jan..Jun -> trimmed frame spans Feb..May only
    months = {
        r.landing_period.month
        for r in lf.select("landing_period").distinct().collect()
    }
    assert months == {2, 3, 4, 5}
    # completion: every surviving (imei, month) cell exists, zeros filled
    imei_months = lf.groupBy("region", "imei").count().collect()
    assert all(r["count"] == 4 for r in imei_months)


def test_taxa_frame_groups_unlisted_to_mzz_with_zero_fill(spark):
    trips = _trips(spark)
    cf = catch_model_frame_per_taxa(_catch(spark, trips), ["SNA", "TUN"])
    taxa = {
        r.grouped_taxa
        for r in cf.select("grouped_taxa").distinct().collect()
    }
    assert taxa == {"SNA", "TUN", "MZZ"}
    # every (landing, taxon) cell present: zero weights are real rows
    per_landing = cf.groupBy("region", "landing_id").count().collect()
    assert all(r["count"] == 3 for r in per_landing)
    assert cf.filter("landing_weight = 0").count() > 0


def test_predict_monthly_composes_blups(spark):
    fits = spark.createDataFrame(
        [
            ("r1", "fixed", "intercept", None, 1.0),
            ("r1", "blup", "month", "01", 0.5),
            ("r1", "blup", "period", "2019-1", -0.25),
        ],
        "region string, kind string, term string, level string, "
        "estimate double",
    )
    spine = spark.createDataFrame(
        [("r1", dt.date(2019, 1, 1), "01", "2019-1", "v1")],
        "region string, landing_period date, month string, period string, "
        "version string",
    )
    out = predict_monthly(fits, spine, ["region"], "mu").collect()[0]
    # unseen version level contributes 0: mu = exp(1 + 0.5 - 0.25)
    assert out.mu == pytest.approx(2.7182818**1.25, rel=1e-6)


def test_model_indicators_end_to_end_shape(spark):
    trips = _trips(spark)
    catch = _catch(spark, trips)
    boats = spark.createDataFrame(
        [("Lautem", 40), ("Dili", 60)], "region string, n_boats int"
    )
    out = model_indicators(
        trips, catch, boats, ["SNA", "TUN"], max_iter=10
    )
    agg = out["aggregated"]
    rows = agg.collect()
    # month x region granularity, one row per spine cell
    assert len(rows) == len({(r.region, r.landing_period) for r in rows})
    assert {r.region for r in rows} == {"Lautem", "Dili"}
    for r in rows:
        assert r.n_boats in (40, 60)
        if r.catch is not None and r.catch > 0 and r.price_kg is not None:
            assert r.price_kg > 0
    # predictions are positive where defined (log link)
    assert all(
        r.n_landings_per_boat is None or r.n_landings_per_boat > 0
        for r in rows
    )

    taxa = out["taxa"].collect()
    # region x taxon x month granularity; shares sum to 1 per cell
    assert {t.grouped_taxa for t in taxa} == {"SNA", "TUN", "MZZ"}
    by_cell: dict = {}
    for t in taxa:
        if t.taxon_share is not None:
            by_cell.setdefault((t.region, t.landing_period), 0.0)
            by_cell[(t.region, t.landing_period)] += t.taxon_share
    assert by_cell and all(
        abs(s - 1.0) < 1e-6 for s in by_cell.values()
    )
    # taxon_catch re-proportions the aggregate catch
    agg_catch = {
        (r.region, r.landing_period): r.catch for r in rows
    }
    for t in taxa:
        if t.taxon_catch is not None:
            total = agg_catch[(t.region, t.landing_period)]
            assert t.taxon_catch <= total + 1e-9
