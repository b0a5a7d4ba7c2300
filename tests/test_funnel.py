"""Funnel + retention-cohort operator tests (hand-computed fixtures)."""

from __future__ import annotations

import datetime


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_funnel_strict_ordering_and_rates(spark):
    """User 1 completes the funnel; user 2's click precedes their view
    (does not advance); user 3's purchase is simultaneous with the click
    (strict > rejects it); user 4 never views."""
    from peskas_timor_data_pipeline_spark.operators.funnel import funnel

    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        (2, _ts(1), "click"), (2, _ts(2), "view"),
        (3, _ts(1), "view"), (3, _ts(2, 5), "click"), (3, _ts(2, 5), "purchase"),
        (4, _ts(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.step: r for r in funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert got[1].n_users == 3          # users 1, 2, 3 viewed
    assert got[2].n_users == 2          # 1 and 3 clicked after viewing
    assert got[3].n_users == 1          # only 1 purchased after the click
    assert got[1].conv_from_prev is None and got[1].conv_from_top == 1.0
    assert got[2].conv_from_prev == round(2 / 3, 6)
    assert got[3].conv_from_prev == 0.5
    assert got[3].conv_from_top == round(1 / 3, 6)


def test_retention_cohorts_matrix(spark):
    """Two users start week 0 (one returns week 1), one starts week 1:
    cohort sizes, offsets, and shares are exact."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        retention_cohorts,
    )

    rows = [
        (1, _ts(1)), (1, _ts(9)),        # weeks 0 and 1
        (2, _ts(2)),                     # week 0 only
        (3, _ts(10)), (3, _ts(11)),      # week 1 (same week twice)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort_week, r.week_offset): r for r in retention_cohorts(
        df, "user_id", "ts", epoch="2024-01-01"
    ).collect()}
    assert got[(0, 0)].n_active == 2 and got[(0, 0)].n_cohort == 2
    assert got[(0, 1)].n_active == 1 and got[(0, 1)].retention == 0.5
    assert got[(1, 0)].n_active == 1 and got[(1, 0)].retention == 1.0
    assert set(got) == {(0, 0), (0, 1), (1, 0)}


def test_growth_accounting_ledger_reconciles(spark):
    """Hand-built three-week scenario: the ledger classifies every user
    correctly and active = new + retained + resurrected telescopes."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        growth_accounting,
    )

    # week 0: u1, u2   week 1: u1, u3   week 2: u2 (resurrects), u3
    rows = [
        (1, _ts(1)), (2, _ts(2)),
        (1, _ts(9)), (3, _ts(10)),
        (2, _ts(16)), (3, _ts(17)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.week: r for r in growth_accounting(df, "user_id", "ts").collect()}
    w0, w1, w2 = got[0], got[1], got[2]
    assert (w0.active, w0.new, w0.retained, w0.resurrected, w0.churned) == (2, 2, 0, 0, 0)
    assert (w1.active, w1.new, w1.retained, w1.resurrected, w1.churned) == (2, 1, 1, 0, 1)
    assert (w2.active, w2.new, w2.retained, w2.resurrected, w2.churned) == (2, 0, 1, 1, 1)
    # the week after the last active one carries the final churn (active=0
    # rows come from the full-outer week spine)
    w3 = got[3]
    assert (w3.active, w3.new, w3.retained, w3.resurrected, w3.churned) == (0, 0, 0, 0, 2)
    assert set(got) == {0, 1, 2, 3}
    for r in got.values():
        assert r.active == r.new + r.retained + r.resurrected


def test_pagerank_fixed_point_hand_values(spark):
    """2-node cycle sits at the uniform fixed point exactly; a dangling
    chain A->B gives the hand-computed nano values (base 75e6, damped
    integer update) after 3 iterations."""
    from peskas_timor_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    cycle = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", 1)], "s string, d string, w long"
    )
    got = {r.node: r.rank_nanos for r in pagerank_fixed_point(
        cycle, "s", "d", "w", n_iter=3).collect()}
    assert got == {"A": 500_000_000, "B": 500_000_000}

    chain = spark.createDataFrame([("A", "B", 1)], "s string, d string, w long")
    got2 = {r.node: r.rank_nanos for r in pagerank_fixed_point(
        chain, "s", "d", "w", n_iter=3).collect()}
    assert got2 == {"A": 75_000_000, "B": 138_750_000}


def test_pagerank_weight_contract(spark):
    """ADVICE r05 retirement: weights are cast to long BEFORE summing and
    non-positive / sub-1 fractional weights are dropped up front — a node
    whose only outgoing edges have weight 0 (or 0.4, truncating to 0)
    contributes no mass but must not NULL-poison the rank frame, and
    fractional weights >= 1 truncate per edge (2.9 counts as 2)."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    edges = spark.createDataFrame(
        [
            (1, 2, 2.9),   # truncates to 2
            (1, 3, 1.0),
            (2, 3, 0.4),   # truncates to 0 -> dropped: node 2 dangles
            (3, 1, -5.0),  # dropped: node 3 dangles
        ],
        "s long, d long, w double",
    )
    got = {r.node: r.rank_nanos
           for r in pagerank_fixed_point(edges, "s", "d", "w", n_iter=2).collect()}
    # all 4 endpoint nodes present, every rank a non-null long
    assert set(got) == {1, 2, 3}
    assert all(isinstance(v, int) and v > 0 for v in got.values())
    # node 1 splits 2:1 between 2 and 3 (2.9 -> 2), so rank(2) > rank(3)
    # after damping from an equal start... iteration 1: contributions to 2
    # = 2/3 of r1, to 3 = 1/3 of r1; nodes 2,3 send nothing (dropped).
    assert got[2] > got[3]
