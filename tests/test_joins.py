"""Operator-level join tests (J5/J9/J10 cases not covered by the oracle)."""

from __future__ import annotations


def test_asof_join_backward_ties_and_missing(spark):
    from peskas_timor_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, ts int, v string"
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 15, 200), (1, 20, 250), (2, 99, 300)],
        "k int, ts int, p int",
    )
    out = {
        (r.k, r.ts): (r.matched_ts, r.p)
        for r in asof_join(left, right, ["k"], "ts", ["p"]).collect()
    }
    assert out[(1, 10)] == (8, 100)
    # equal timestamps: the right row at ts=20 matches (ties match right)
    assert out[(1, 20)] == (20, 250)
    # no right row at-or-before -> nulls, left row preserved
    assert out[(2, 5)] == (None, None)


def test_asof_join_single_shuffle(spark):
    from peskas_timor_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10, "a")], "k int, ts int, v string")
    right = spark.createDataFrame([(1, 8, 100)], "k int, ts int, p int")
    plan = (
        asof_join(left, right, ["k"], "ts", ["p"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + window => one exchange on the key, and NO join node at all
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_interval_join_bins_and_boundaries(spark):
    from peskas_timor_data_pipeline_spark.operators.joins import interval_join

    # interval spans many bins; points on both boundaries included exactly once
    pts = spark.createDataFrame(
        [(1, 1000.0, "p1"), (1, 9999.0, "p2"), (1, 10000.0, "p3"), (1, 10001.0, "p4")],
        "k int, ts double, pid string",
    )
    iv = spark.createDataFrame(
        [(1, 1000.0, 10000.0, "trip1")], "k int, s double, e double, trip string"
    )
    out = interval_join(pts, iv, ["k"], "ts", "s", "e", bin_seconds=60)
    got = sorted(r.pid for r in out.collect())
    assert got == ["p1", "p2", "p3"]
    # no duplicate matches despite the interval covering ~150 bins
    assert out.count() == out.dropDuplicates(["pid", "trip"]).count()


def test_join_nested_carry_scalars_equivalent_and_fewer_exchanges(spark, sf_dir):
    """carry_scalars threads scalar cols through the explode instead of
    re-joining them: identical rows, one shuffle instead of two."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.joins import join_nested
    from peskas_timor_data_pipeline_spark.operators.restructure import nest, unnest

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    nested = nest(li, ["l_orderkey", "l_returnflag"], "items", ["l_partkey", "l_quantity"])

    def summarize(df):
        return (
            unnest(df, "items")
            .groupBy("l_returnflag", "p_brand")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        )

    base = join_nested(nested, "items", part, on="l_partkey", keys=["l_orderkey", "l_returnflag"])
    carry = join_nested(
        nested, "items", part, on="l_partkey",
        keys=["l_orderkey", "l_returnflag"], carry_scalars=True,
    )
    assert sorted(map(tuple, summarize(base).collect())) == sorted(
        map(tuple, summarize(carry).collect())
    )
    n_ex = lambda df: df._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert n_ex(carry) < n_ex(base)


def test_scd2_intervals_chain_and_current(spark):
    import datetime

    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.joins import scd2_intervals

    ts = lambda s: datetime.datetime.fromisoformat(s)
    changes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), 10, "a"),
            (1, ts("2024-03-01 00:00:00"), 11, "b"),
            (1, ts("2024-02-01 00:00:00"), 12, "c"),
            (2, ts("2024-05-01 00:00:00"), 20, "z"),
        ],
        "key int, ts timestamp, change_id int, status string",
    )
    out = scd2_intervals(changes, ["key"], "ts", "change_id").orderBy(
        "key", "valid_from"
    )
    rows = out.collect()
    # intervals chain: each valid_to equals the next valid_from per key
    k1 = [r for r in rows if r.key == 1]
    assert [r.status for r in k1] == ["a", "c", "b"]
    assert k1[0].valid_to == k1[1].valid_from
    assert k1[1].valid_to == k1[2].valid_from
    assert k1[2].valid_to is None and k1[2].is_current
    assert not k1[0].is_current and not k1[1].is_current
    # singleton key: one open-ended current version
    k2 = [r for r in rows if r.key == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].valid_to is None
    # deterministic tiebreak: same-ts changes order by change_id
    dup = spark.createDataFrame(
        [(3, ts("2024-01-01 00:00:00"), 2, "late"), (3, ts("2024-01-01 00:00:00"), 1, "early")],
        "key int, ts timestamp, change_id int, status string",
    )
    d = scd2_intervals(dup, ["key"], "ts", "change_id").orderBy("change_id").collect()
    assert [r.status for r in d] == ["early", "late"]
    assert d[0].valid_to == d[0].valid_from  # zero-length superseded version
    assert d[1].is_current


def test_grid_neighbor_join_exact_vs_brute_force(spark):
    """Grid blocking finds exactly the brute-force pair set — including
    pairs straddling cell borders — and each pair exactly once."""
    import itertools
    import math
    import random

    from peskas_timor_data_pipeline_spark.operators.joins import (
        grid_neighbor_join,
    )

    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(80)]
    # force border-straddling pairs around the cell edge at x=10, r=5
    pts += [(100, 9.999, 5.0), (101, 10.001, 5.0), (102, 14.999, 5.0)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = sorted(
        (r.id_a, r.id_b) for r in grid_neighbor_join(df, "id", "x", "y", 5.0).collect()
    )
    expect = sorted(
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if math.dist(a[1:], b[1:]) <= 5.0
    )
    assert got == expect


def test_grid_neighbor_join_rejects_nonpositive_radius(spark):
    import pytest

    from peskas_timor_data_pipeline_spark.operators.joins import (
        grid_neighbor_join,
    )

    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="radius"):
        grid_neighbor_join(df, "id", "x", "y", 0.0)


def test_fuzzy_join_1edit_covers_all_edit_kinds(spark):
    """Equality, substitution, deletion, and insertion all match; distance-2
    strings do not, even when they share a deletion variant."""
    from peskas_timor_data_pipeline_spark.operators.joins import fuzzy_join_1edit

    left = spark.createDataFrame(
        [("cat",), ("ct",), ("cart",), ("bat",), ("dog",)], "a string"
    )
    right = spark.createDataFrame([("cat",)], "b string")
    got = sorted(r.left_value for r in
                 fuzzy_join_1edit(left, right, "a", "b").collect())
    assert got == ["bat", "cart", "cat", "ct"]  # dog is distance 3

    # 'ab' vs 'bc' SHARE the deletion variant 'b' (a false candidate the
    # blocking generates) but are distance 2 — the verify must prune it;
    # 'ac' vs 'bc' is a true substitution match
    l2 = spark.createDataFrame([("ab",), ("ac",)], "a string")
    r2 = spark.createDataFrame([("cd",), ("bc",)], "b string")
    got2 = sorted((r.left_value, r.right_value) for r in
                  fuzzy_join_1edit(l2, r2, "a", "b").collect())
    assert got2 == [("ac", "bc")]
