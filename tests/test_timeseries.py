from __future__ import annotations

import math

import numpy as np


def test_dtw_reference_known_values():
    from peskas_timor_data_pipeline_spark.operators.timeseries import dtw_distance_np

    a = np.array([1.0, 2.0, 3.0])
    # identity alignment
    assert dtw_distance_np(a, a) == 0.0
    # classic warp: [1,2,3] vs [1,1,2,2,3,3] aligns perfectly under DTW
    assert dtw_distance_np(a, np.array([1.0, 1.0, 2.0, 2.0, 3.0, 3.0])) == 0.0
    # hand-computed: [1,2] vs [2,2] -> |1-2| + min-path 0 = 1
    assert dtw_distance_np(np.array([1.0, 2.0]), np.array([2.0, 2.0])) == 1.0
    # band constraint forbids the long warp and raises the cost
    assert dtw_distance_np(a, np.array([1.0, 1.0, 1.0, 1.0, 2.0, 3.0]), band=1) > 0.0
    assert math.isnan(dtw_distance_np(np.array([]), a))


def test_dtw_to_pattern_groups(spark):
    from peskas_timor_data_pipeline_spark.operators.timeseries import dtw_to_pattern

    rows = [
        # user 1: exactly the pattern, time-stretched -> distance 0
        (1, 0, 10.0), (1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (1, 4, 30.0),
        # user 2: constant series
        (2, 0, 10.0), (2, 1, 10.0), (2, 2, 10.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, t int, v double")
    out = {
        r.user_id: (r.dtw_dist, r.n_points)
        for r in dtw_to_pattern(df, ["user_id"], "t", "v", [10.0, 20.0, 30.0]).collect()
    }
    assert out[1] == (0.0, 5)
    # user 2 vs [10,20,30]: DP cost = |10-20| + |10-30| = 30
    assert out[2] == (30.0, 3)


def test_seasonal_decompose_pure_weekly_signal(spark):
    """A noiseless series value = 10 + e[phase] with zero-mean weekly
    effects must decompose exactly: interior trend = 10, seasonal = the
    phase effect, residual = 0; the 3 edge rows at each end (truncated
    trend window) stay null."""
    import datetime

    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    effects = [3.0, -3.0, 1.0, -1.0, 0.0, 2.0, -2.0]
    rows = []
    for i in range(21):
        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=i)
        rows.append(("g", d, 10.0 + effects[i % 7]))
    df = spark.createDataFrame(rows, "g string, day date, value double")
    got = {r.day: r for r in seasonal_decompose(
        df, "g", "day", "value", period=7, trend_window=3).collect()}
    assert len(got) == 21
    for i in range(21):
        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=i)
        r = got[d]
        if i < 3 or i > 17:
            assert r.trend is None and r.seasonal is None and r.residual is None
        else:
            assert abs(r.trend - 10.0) < 1e-9
            assert abs(r.seasonal - effects[i % 7]) < 1e-9
            assert abs(r.residual) < 1e-9


def test_cusum_changepoint_detects_level_shift(spark):
    """A clean 10->20 level shift at the series midpoint: peak lands on the
    last pre-shift day, means/shift are exact, and the standardized stat
    crosses the KS threshold. A constant series stays undetected with the
    peak pinned (tie-break) to the first day."""
    import datetime

    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        cusum_changepoint,
    )

    d0 = datetime.date(2024, 1, 1)
    rows = [("shift", d0 + datetime.timedelta(days=i), 10 if i < 5 else 20)
            for i in range(10)]
    rows += [("flat", d0 + datetime.timedelta(days=i), 7) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, day date, v long")
    out = {r.g: r for r in cusum_changepoint(df, "g", "day", "v").collect()}

    s = out["shift"]
    assert s.cp_order == d0 + datetime.timedelta(days=4)
    assert s.n_points == 10
    assert s.mean_before == 10.0 and s.mean_after == 20.0 and s.shift == 10.0
    # sabs = |10*50 - 5*150| = 250; stat = 250/(sqrt(10)*sqrt(2500)) ~ 1.5811
    assert abs(s.cusum_abs - 25.0) < 1e-9
    assert abs(s.cusum_stat - 1.581139) < 1e-6
    assert s.detected is True

    f = out["flat"]
    assert f.cp_order == d0
    assert f.cusum_stat == 0.0 and f.detected is False
    assert f.mean_before == 7.0


def test_rolling_slope_exact_on_linear_series(spark):
    """y = 3x + noise-free line gives slope exactly 3 on every full frame;
    short head frames and a flat series behave as documented."""
    import datetime

    from peskas_timor_data_pipeline_spark.operators.windows import rolling_slope

    rows = [("lin", i, 3 * i + 10) for i in range(10)]
    rows += [("flat", i, 5) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = rolling_slope(df, "g", "x", "y", window_rows=7)
    got = {(r.g, r.x): r.slope for r in out.collect()}
    for i in range(10):
        if i < 6:
            assert got[("lin", i)] is None
        else:
            assert got[("lin", i)] == 3.0
    assert got[("flat", 7)] == 0.0
    assert got[("flat", 3)] is None


def test_dtw_expr_bit_equals_numpy_twin(spark):
    """The pure-Catalyst DTW fold equals the numpy DP bit for bit on
    random series (incl. an out-of-band +inf case and a single-point
    series) — the min-over-paths identity in practice."""
    import math
    import random

    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        dtw_to_pattern,
        dtw_to_pattern_expr,
    )

    rng = random.Random(13)
    pattern = [1.0, 4.0, 2.0, 8.0]
    rows = []
    for uid in range(12):
        n = rng.randint(1, 9) if uid < 10 else 20  # uid 10,11: beyond m+band
        for i in range(n):
            rows.append((uid, i, round(rng.uniform(-5, 10), 3)))
    df = spark.createDataFrame(rows, "u long, i long, v double")
    kw = dict(keys=["u"], value_col="v", pattern=pattern, band=3)
    a = {r.u: (r.dtw_dist, r.n_points)
         for r in dtw_to_pattern(df, order_col=["i"], **kw).collect()}
    b = {r.u: (r.dtw_dist, r.n_points)
         for r in dtw_to_pattern_expr(df, order_cols=["i"], **kw).collect()}
    assert set(a) == set(b)
    for u in a:
        assert a[u][1] == b[u][1]
        if math.isinf(a[u][0]):
            assert math.isinf(b[u][0])
        else:
            assert a[u][0] == b[u][0], (u, a[u], b[u])
    assert math.isinf(a[10][0]) and math.isinf(a[11][0])
