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
