"""Property check: the set-based length-weight rewrite (M2) equals the
reference's rowwise semantics — per catch row, weight = percentile over
a*length^b across ALL parameter rows sharing the species code, times
n_individuals — computed independently with numpy."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

Q = 0.75

codes = st.sampled_from(["CLP", "TUN", "MZZ"])
lengths = st.sampled_from([5.0, 10.0, 15.0, 20.0])  # binned classes (5 cm)
params = st.lists(
    st.tuples(codes, st.floats(0.005, 0.05), st.floats(2.5, 3.2)),
    min_size=1, max_size=6,
)
catch = st.lists(
    st.tuples(codes, lengths, st.integers(1, 50)), min_size=1, max_size=10,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(params=params, catch=catch)
def test_estimate_weights_matches_rowwise_numpy(spark, params, catch):
    from peskas_timor_data_pipeline_spark.operators.weights import estimate_weights

    pdf = spark.createDataFrame(params, "code string, a double, b double")
    cdf = spark.createDataFrame(
        [(i, c, ln, n) for i, (c, ln, n) in enumerate(catch)],
        "row_id int, code string, length double, n int",
    )
    out = {
        r.row_id: (r.weight, r.n_candidates)
        for r in estimate_weights(
            cdf, pdf, "code", "length", "n", ["row_id"], quantile=Q
        ).collect()
    }
    for i, (c, ln, n) in enumerate(catch):
        cands = [a * ln**b for (pc, a, b) in params if pc == c]
        if not cands:
            assert i not in out  # inner join: no params -> row drops
            continue
        want = float(np.percentile(cands, Q * 100)) * n
        got_w, got_k = out[i]
        assert got_k == len(cands)
        assert math.isclose(got_w, want, rel_tol=1e-9), (i, got_w, want)
