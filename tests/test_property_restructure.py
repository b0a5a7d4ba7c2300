"""Property-based roundtrips for the restructuring operators that carry the
reference's signature data model (SURVEY.md §1.1): nest→unnest must be the
identity on non-empty groups for ANY input, and pivot_longer→pivot_wider
must recover the original wide frame."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

vals = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5), vals, vals),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=rows)
def test_nest_unnest_roundtrip(spark, data):
    from peskas_timor_data_pipeline_spark.operators.restructure import nest, unnest

    # seq disambiguates duplicate rows so the multiset comparison is exact
    df = spark.createDataFrame(
        [(k, s, a, b) for (k, s, a, b) in data],
        "k int, seq int, a int, b int",
    )
    nested = nest(df, ["k"], "items", order_by=["seq", "a", "b"])
    back = unnest(nested, "items", keep_empty=True)
    none_safe = lambda row: tuple((v is None, v) for v in row)
    got = sorted(((r.k, r.seq, r.a, r.b) for r in back.collect()), key=none_safe)
    want = sorted(data, key=none_safe)
    assert got == [tuple(w) for w in want]


wide_rows = st.lists(
    st.tuples(st.integers(0, 9), vals, vals, vals), min_size=1, max_size=15,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=wide_rows)
def test_pivot_longer_wider_roundtrip(spark, data):
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        pivot_longer,
        pivot_wider,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(data, "id int, m1 int, m2 int, m3 int")
    long = pivot_longer(df, ["id"], ["m1", "m2", "m3"])
    wide = pivot_wider(
        long, ["id"], "name", "value",
        agg=F.first("value"), values=["m1", "m2", "m3"],
    )
    got = sorted((r.id, r.m1, r.m2, r.m3) for r in wide.collect())
    assert got == sorted(data)
