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


texts = st.lists(
    st.text(alphabet="abc X", min_size=0, max_size=60), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=texts)
def test_cdc_segments_match_pure_python(spark, docs):
    """CDC boundaries/segments equal a hashlib-based replica on arbitrary
    strings (including repeats, empties, and sub-window texts)."""
    import hashlib

    from peskas_timor_data_pipeline_spark.llm.dedup import cdc_segments

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {}
    for r in cdc_segments(df, "doc_id", "text", window=8, mask_hex=1).collect():
        got.setdefault(r.doc_id, []).append((r.seg_idx, r.seg_len, r.seg_hash))

    for did, text in enumerate(docs):
        bounds = [0]
        for i in range(8, len(text) + 1):
            h = hashlib.md5(text[i - 8:i].encode()).hexdigest()
            if h[-1] == "0":
                bounds.append(i)
        if bounds[-1] != len(text):
            bounds.append(len(text))
        segs = [text[a:b] for a, b in zip(bounds, bounds[1:])]
        expect = [
            (i, len(s), hashlib.md5(s.encode()).hexdigest())
            for i, s in enumerate(segs)
        ]
        assert sorted(got.get(did, [])) == sorted(expect)


points = st.lists(
    st.tuples(st.floats(min_value=0, max_value=20, allow_nan=False),
              st.floats(min_value=0, max_value=20, allow_nan=False)),
    min_size=0, max_size=25,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=points)
def test_grid_neighbor_join_property(spark, pts):
    import itertools
    import math

    from peskas_timor_data_pipeline_spark.operators.joins import (
        grid_neighbor_join,
    )

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(
        (r.id_a, r.id_b)
        for r in grid_neighbor_join(df, "id", "x", "y", 3.0).collect()
    )
    expect = sorted(
        (a[0], b[0])
        for a, b in itertools.combinations(rows, 2)
        if math.dist(a[1:], b[1:]) <= 3.0
    )
    assert got == expect


words = st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
                 min_size=1, max_size=10)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ls=words, rs=words)
def test_fuzzy_join_matches_brute_force_levenshtein(spark, ls, rs):
    from peskas_timor_data_pipeline_spark.operators.joins import fuzzy_join_1edit

    left = spark.createDataFrame([(w,) for w in set(ls)], "a string")
    right = spark.createDataFrame([(w,) for w in set(rs)], "b string")
    got = sorted((r.left_value, r.right_value) for r in
                 fuzzy_join_1edit(left, right, "a", "b").collect())
    expect = sorted((a, b) for a in set(ls) for b in set(rs) if _lev(a, b) <= 1)
    assert got == expect
