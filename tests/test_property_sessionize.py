"""Property check: gap-based sessionization (A6) produces exactly the
sessions a sequential scan would — same partition, same boundaries —
for arbitrary event layouts."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GAP_S = 600  # new session when gap >= 10 min


def ts(seconds: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=seconds)


def reference_sessions(times):
    """Sequential scan: session index per (sorted) event."""
    out, sid = [], 0
    for prev, cur in zip([None, *sorted(times)], sorted(times)):
        if prev is not None and cur - prev >= GAP_S:
            sid += 1
        out.append((cur, sid))
    return dict(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(groups=st.dictionaries(
    st.integers(0, 2),
    st.lists(st.integers(0, 7200), min_size=1, max_size=15, unique=True),
    min_size=1, max_size=3,
))
def test_sessionize_matches_sequential_scan(spark, groups):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from peskas_timor_data_pipeline_spark.operators.windows import sessionize

    rows = [(g, ts(t)) for g, times in groups.items() for t in times]
    df = spark.createDataFrame(rows, "g int, t timestamp")
    w = Window.partitionBy("g").orderBy("t")
    gap = F.unix_timestamp("t") - F.unix_timestamp(F.lag("t").over(w))
    prepared = df.withColumn("gap_s", gap)
    out = sessionize(
        prepared, ["g"], "t",
        new_session=F.col("gap_s").isNull() | (F.col("gap_s") < GAP_S),
    )
    got = {(r.g, r.t): r.session_id for r in out.collect()}
    for g, times in groups.items():
        want = reference_sessions(times)
        # session ids are per-engine labels; boundaries must agree exactly:
        # two events share a Spark session iff the sequential scan says so
        for a in times:
            for b in times:
                same_got = got[(g, ts(a))] == got[(g, ts(b))]
                same_want = want[a] == want[b]
                assert same_got == same_want, (g, a, b)
