"""Property-based checks for this round's operators: funnel and CUSUM must
agree with brute-force pure-Python replicas on arbitrary tiny event logs /
series, not just the fixture corpus."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EPOCH = datetime.datetime(2024, 1, 1)

users = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=30)
etypes = st.sampled_from(["a", "b", "c"])
event_rows = st.lists(st.tuples(users, times, etypes), min_size=0, max_size=16)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_rows)
def test_funnel_matches_brute_force(spark, rows):
    from peskas_timor_data_pipeline_spark.operators.funnel import funnel

    df = spark.createDataFrame(
        [(u, EPOCH + datetime.timedelta(seconds=t), e) for u, t, e in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {r.step: r.n_users for r in funnel(
        df, "user_id", "ts", "event_type", ["a", "b", "c"]
    ).collect()}

    # brute force: walk each user's sorted events through the step machine
    expect = {1: 0, 2: 0, 3: 0}
    for u in {r[0] for r in rows}:
        evs = sorted((t, e) for uu, t, e in rows if uu == u)
        t_cur, step = None, 0
        for want in "abc":
            nxt = [t for t, e in evs
                   if e == want and (t_cur is None or t > t_cur)]
            if not nxt:
                break
            t_cur = min(nxt)
            step += 1
            expect[step] += 1
    assert got == expect


series_rows = st.lists(
    st.integers(min_value=0, max_value=20), min_size=1, max_size=20
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=series_rows)
def test_cusum_matches_numpy_argmax(spark, vals):
    import numpy as np

    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        cusum_changepoint,
    )

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, x long, v long"
    )
    row = cusum_changepoint(df, "g", "x", "v").collect()[0]

    v = np.array(vals, dtype=np.int64)
    n = len(v)
    run = np.cumsum(v)
    i = np.arange(1, n + 1)
    s = np.abs(n * run - i * v.sum())
    k = int(np.argmax(s))  # numpy argmax takes the FIRST max = earliest x
    assert row.cp_order == k
    assert row.n_points == n
    assert abs(row.cusum_abs - s[k] / n) < 1e-6
    assert row.mean_before == round(run[k] / (k + 1), 6)
