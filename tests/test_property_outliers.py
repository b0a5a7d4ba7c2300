"""Property check: loc_scale_bounds (M1, the LocScaleB reimplementation
behind every MAD validator) agrees with a pure-Python computation of the
published formula — median +/- k*1.4826*MAD on the log1p scale, expm1
back-transform, degenerate guards — on arbitrary inputs."""

from __future__ import annotations

import math
import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K = 3.0
MAD_C = 1.4826


def reference_bounds(values):
    xs = [math.log1p(v) for v in values if v is not None]
    if not xs or all(v == 0 for v in values if v is not None):
        return None
    med = statistics.median(xs)
    mad = statistics.median(abs(x - med) for x in xs)
    if mad <= 0:
        return None
    return (
        math.expm1(med - K * MAD_C * mad),
        math.expm1(med + K * MAD_C * mad),
    )


vals = st.one_of(
    st.none(),
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=32),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(groups=st.dictionaries(
    st.integers(0, 3), st.lists(vals, min_size=1, max_size=15), min_size=1, max_size=4,
))
def test_loc_scale_bounds_matches_formula(spark, groups):
    from peskas_timor_data_pipeline_spark.operators.outliers import loc_scale_bounds

    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r.g: (r.lower_bound, r.upper_bound)
        for r in loc_scale_bounds(df, "v", keys=["g"], k=K, logt=True).collect()
    }
    for g, vs in groups.items():
        want = reference_bounds(vs)
        if want is None:
            assert got[g] == (None, None), f"group {g}: expected degenerate"
        else:
            lo, hi = got[g]
            assert math.isclose(lo, want[0], rel_tol=1e-9, abs_tol=1e-9), g
            assert math.isclose(hi, want[1], rel_tol=1e-9, abs_tol=1e-9), g


def test_winsorize_clamps_to_group_band(spark):
    """Clamped values sit inside [P5, P95] per group; interior values are
    untouched; row count is preserved (winsorize rewrites, never drops)."""
    from peskas_timor_data_pipeline_spark.operators.outliers import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 1000.0), ("b", 0.0),
            ("b", 50.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, ["g"], "v", 0.05, 0.95).collect()
    assert len(out) == len(rows)
    for r in out:
        lo, hi = r["__lo__"], r["__hi__"]
        assert lo <= r.v_wins <= hi
        if lo <= r.v <= hi:
            assert r.v_wins == r.v
    # group a: P5 of 1..100 (type-7) = 5.95, P95 = 95.05
    a = [r for r in out if r.g == "a"][0]
    assert abs(a["__lo__"] - 5.95) < 1e-9 and abs(a["__hi__"] - 95.05) < 1e-9
