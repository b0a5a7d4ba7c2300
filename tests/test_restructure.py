"""Unit tests for restructuring operators — models the reference's only
unit-test file (tests/testthat/test-pre-process-landings.R): nested shape
assertions plus value-level checks."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from peskas_timor_data_pipeline_spark.operators.restructure import (
    coalesce_columns,
    deterministic_sample_n,
    distinct_except,
    nest,
    pivot_longer,
    pivot_wider,
    replicate_rows,
    unite,
    unnest,
)


def _catch_df(spark):
    rows = [
        ("t1", "CLP", 7.5, 20.0),
        ("t1", "CLP", 12.5, 5.0),
        ("t1", "TUN", 30.0, 2.0),
        ("t2", "MZZ", 17.5, 1.0),
    ]
    return spark.createDataFrame(rows, ["trip_id", "species", "mean_length", "n_individuals"])


def test_nest_unnest_roundtrip(spark):
    df = _catch_df(spark)
    nested = nest(df, ["trip_id"], "species_group", order_by=["species", "mean_length"])
    assert isinstance(nested.schema["species_group"].dataType, ArrayType)
    assert isinstance(nested.schema["species_group"].dataType.elementType, StructType)
    t1 = nested.filter(F.col("trip_id") == "t1").collect()[0]
    assert len(t1.species_group) == 3
    # value-level check mirroring the reference's (class 5_10 -> 7.5 -> 20)
    assert t1.species_group[0].mean_length == 7.5
    assert t1.species_group[0].n_individuals == 20.0

    flat = unnest(nested, "species_group")
    assert sorted(tuple(r) for r in flat.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_unnest_keep_empty(spark):
    df = spark.createDataFrame(
        [("a", [(1.0,)]), ("b", [])],
        "id string, xs array<struct<v double>>",
    )
    out = unnest(df, "xs", keep_empty=True)
    assert out.count() == 2  # empty array keeps its row with null v
    assert out.filter("id = 'b'").collect()[0].v is None


def test_pivot_roundtrip(spark):
    df = _catch_df(spark)
    wide = pivot_wider(
        df.groupBy("trip_id", "species").agg(F.sum("n_individuals").alias("n")),
        ["trip_id"],
        "species",
        "n",
        agg=F.first("n"),
        values=["CLP", "TUN", "MZZ"],
    )
    assert set(wide.columns) == {"trip_id", "CLP", "TUN", "MZZ"}
    long = pivot_longer(wide, ["trip_id"], ["CLP", "TUN", "MZZ"], "species", "n")
    assert long.filter("species = 'CLP' and trip_id = 't1'").collect()[0].n == 25.0


def test_coalesce_columns(spark):
    df = spark.createDataFrame(
        [(None, "x", "y"), ("a", None, "z"), (None, None, None)],
        ["v3_fuel", "v2_fuel", "v1_fuel"],
    )
    out = coalesce_columns(df, {"fuel": ["v3_fuel", "v2_fuel", "v1_fuel"]})
    assert [r.fuel for r in out.collect()] == ["x", "a", None]
    assert out.columns == ["fuel"]


def test_unite_na_rm(spark):
    df = spark.createDataFrame([(1, None, 3), (None, None, None)], "a int, b int, c int")
    out = unite(df, "alert", ["a", "b", "c"])
    vals = [r.alert for r in out.collect()]
    assert vals == ["1-3", None]


def test_distinct_except(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 10), (3, "y", 20)], ["Trip", "boat", "dist"]
    )
    out = distinct_except(df, ["Trip"])
    got = sorted((r.boat, r.dist, r.Trip) for r in out.collect())
    assert got == [("x", 10, 1), ("y", 20, 3)]  # min-Trip survivor


def test_deterministic_sample_stable(spark):
    df = _catch_df(spark)
    a = sorted(map(tuple, deterministic_sample_n(df, ["trip_id"], 1).collect()))
    b = sorted(map(tuple, deterministic_sample_n(df.repartition(7), ["trip_id"], 1).collect()))
    assert a == b  # stable across partitionings


def test_replicate_rows(spark):
    df = spark.createDataFrame([(1,), (2,)], ["v"])
    assert replicate_rows(df, 5).count() == 10


def test_point_in_polygon(spark):
    from pyspark.sql import functions as F
    from peskas_timor_data_pipeline_spark.functions.geo import point_in_polygon

    # unit square (0,0)-(1,1); Timor-ish bbox semantics are the same
    square = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    pts = spark.createDataFrame(
        [(0.5, 0.5, True), (1.5, 0.5, False), (-0.1, 0.2, False), (0.9999, 0.0001, True)],
        "lat double, lng double, expected boolean",
    )
    out = pts.withColumn("inside", point_in_polygon(F.col("lat"), F.col("lng"), square))
    for r in out.collect():
        assert r.inside == r.expected, (r.lat, r.lng)


def test_convert_length(spark):
    from pyspark.sql import functions as F
    from peskas_timor_data_pipeline_spark.operators.weights import convert_length

    catch = spark.createDataFrame(
        [("CLP", "FL", 20.0), ("TUN", "TL", 30.0)],
        "species string, length_type string, length double",
    )
    # FL->TL regression exists for CLP only; TUN passes through
    ll = spark.createDataFrame(
        [("CLP", "FL", 1.5, 1.1)], "species string, length_type string, aL double, bL double"
    )
    out = convert_length(catch, "length", ll, on=["species", "length_type"])
    rows = {r.species: r for r in out.collect()}
    assert abs(rows["CLP"].length - (1.5 + 20.0 * 1.1)) < 1e-9
    assert rows["TUN"].length == 30.0


def test_snapshot_diff_classification_and_null_safety(spark):
    """added/removed/changed/unchanged classes, changed column naming
    (sorted, comma-joined), and null-safe comparison: null -> value is a
    change, null == null is not."""
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (4, "d", None),
         (5, "e", 5.0)],
        "k long, s string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "B", 2.5),        # changed: both cols
         (3, None, 3.5),       # changed: x only (null s == null s)
         (4, "D", None),       # changed: s only (null x == null x)
         (6, "f", 6.0)],       # added; 5 removed
        "k long, s string, x double",
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert (got[1].change, got[1].changed_cols) == ("unchanged", "")
    assert (got[2].change, got[2].changed_cols) == ("changed", "s,x")
    assert (got[3].change, got[3].changed_cols) == ("changed", "x")
    assert (got[4].change, got[4].changed_cols) == ("changed", "s")
    assert (got[5].change, got[6].change) == ("removed", "added")


def test_profile_columns_nulls_distincts_and_numeric_minmax(spark):
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "a", None), (3, None, -1.0), (3, "b", 4.0)],
        "k long, s string, v double",
    )
    got = {r.column_name: r for r in profile_columns(df).collect()}
    assert set(got) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["k"].n_null, got["k"].n_distinct) == (0, 3)
    assert (got["s"].n_null, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_null, got["v"].n_distinct) == (1, 3)
    assert (got["k"].min_value, got["k"].max_value) == (1.0, 3.0)
    assert (got["v"].min_value, got["v"].max_value) == (-1.0, 4.0)
    assert got["s"].min_value is None and got["s"].max_value is None


def test_dataset_fingerprint_detects_any_change(spark):
    """Same content in different row order fingerprints identically; a
    single changed value, a duplicated row (xor blind spot), and a null
    flip each move at least one of (xor48, sum_hi/sum_lo, n_null)."""
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        dataset_fingerprint,
    )

    base = [(1, "a"), (2, "b"), (3, None)]
    df1 = spark.createDataFrame(base, "k long, v string")
    df2 = spark.createDataFrame(list(reversed(base)), "k long, v string")
    fp = lambda df: {r.column_name: (r.n_rows, r.n_null, r.xor48, r.sum_hi, r.sum_lo)
                     for r in dataset_fingerprint(df).collect()}
    assert fp(df1) == fp(df2)

    changed = spark.createDataFrame([(1, "a"), (2, "B"), (3, None)], "k long, v string")
    assert fp(changed)["v"] != fp(df1)["v"]
    assert fp(changed)["k"] == fp(df1)["k"]

    # duplicating a row keeps xor of the duped value-pair but moves the sums
    duped = spark.createDataFrame(base + [(1, "a")], "k long, v string")
    d, o = fp(duped)["k"], fp(df1)["k"]
    assert d[0] == o[0] + 1 and (d[3], d[4]) != (o[3], o[4])

    nulled = spark.createDataFrame([(1, "a"), (2, None), (3, None)], "k long, v string")
    assert fp(nulled)["v"][1] == 2
