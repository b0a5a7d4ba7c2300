"""Property-based checks: the one-shuffle rewrites (asof_join, interval_join,
scd2_intervals) must agree with brute-force reference implementations on
arbitrary small inputs, not just the fixture corpus. Spark runs once per
example batch (lists of rows), so each property executes a handful of plans,
not hundreds."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EPOCH = datetime.datetime(2024, 1, 1)


def ts(seconds: int) -> datetime.datetime:
    return EPOCH + datetime.timedelta(seconds=seconds)


# keys drawn from a tiny alphabet so sides actually collide
keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)

left_rows = st.lists(st.tuples(keys, times), min_size=0, max_size=12)
right_rows = st.lists(st.tuples(keys, times, st.integers(0, 99)), min_size=0, max_size=12)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    from peskas_timor_data_pipeline_spark.operators.joins import asof_join

    # dedup right on (key, ts): the operator contract (latest-at-ts) needs a
    # unique change per instant, same as the SCD2 caller enforces
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "k int, ts timestamp, row_id int",
    ).filter("row_id is not null")
    rdf = spark.createDataFrame(
        [(k, ts(t), v) for k, t, v in right] or [(None, None, None)],
        "k int, ts timestamp, payload int",
    ).filter("payload is not null")

    got = {
        r.row_id: (r.matched_ts, r.payload)
        for r in asof_join(ldf, rdf, ["k"], "ts", ["payload"]).collect()
    }

    for i, (k, t) in enumerate(left):
        cand = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        want = max(cand, default=None)  # latest ts; (ts) unique per key
        if want is None:
            assert got[i] == (None, None)
        else:
            assert got[i] == (ts(want[0]), want[1])


interval_rows = st.lists(
    st.tuples(keys, times, st.integers(0, 20)), min_size=0, max_size=10
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(points=left_rows, intervals=interval_rows)
def test_interval_join_matches_bruteforce(spark, points, intervals):
    from peskas_timor_data_pipeline_spark.operators.joins import interval_join

    pdf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(points)] or [(None, None, None)],
        "k int, ts timestamp, pid int",
    ).filter("pid is not null")
    idf = spark.createDataFrame(
        [(k, ts(s), ts(s + d), j) for j, (k, s, d) in enumerate(intervals)]
        or [(None, None, None, None)],
        "k int, s timestamp, e timestamp, iid int",
    ).filter("iid is not null")

    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, ["k"], "ts", "s", "e", bin_seconds=7
        ).collect()
    }
    want = {
        (i, j)
        for i, (pk, t) in enumerate(points)
        for j, (ik, s, d) in enumerate(intervals)
        if pk == ik and s <= t <= s + d
    }
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(changes=st.lists(st.tuples(keys, times), min_size=1, max_size=12, unique=True))
def test_scd2_intervals_partition_the_timeline(spark, changes):
    from peskas_timor_data_pipeline_spark.operators.joins import scd2_intervals

    cdf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(changes)],
        "k int, ts timestamp, cid int",
    )
    rows = scd2_intervals(cdf, ["k"], "ts", "cid").collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: (r.valid_from, r.cid))
        # intervals chain with no gaps/overlaps; exactly one open current
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from and not a.is_current
        assert vs[-1].valid_to is None and vs[-1].is_current
        assert len(vs) == sum(1 for ck, _ in changes if ck == k)


digits = st.text(alphabet="0123456789", min_size=0, max_size=8)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    facts=st.lists(digits, min_size=1, max_size=10),
    dim=st.lists(st.text(alphabet="0123456789", min_size=1, max_size=10),
                 min_size=1, max_size=8, unique=True),
)
def test_suffix_regex_join_matches_bruteforce(spark, facts, dim):
    from peskas_timor_data_pipeline_spark.operators.joins import suffix_regex_join

    MIN_LEN = 3
    fdf = spark.createDataFrame(
        [(i, f) for i, f in enumerate(facts)], "fid int, imei_digits string"
    )
    ddf = spark.createDataFrame([(d,) for d in dim], "imei string")
    out = {
        r["fid"]: (r["__matches__"], r["matched_value"])
        for r in suffix_regex_join(
            fdf, ddf, "imei_digits", "imei", min_len=MIN_LEN
        ).collect()
    }
    assert set(out) == set(range(len(facts)))  # every fact row survives
    for i, f in enumerate(facts):
        cands = (
            sorted(d for d in dim if d.endswith(f)) if len(f) >= MIN_LEN else []
        )
        n, matched = out[i]
        assert n == len(cands), (f, cands)
        assert matched == (cands[0] if len(cands) == 1 else None), (f, cands)


# --- segment dedup vs pure-Python reference ---------------------------------------------

# tiny token alphabet so segments collide across documents
seg_tokens = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9
)
seg_corpus = st.lists(seg_tokens, min_size=1, max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=seg_corpus, seg_words=st.integers(min_value=1, max_value=4))
def test_segment_dedup_matches_bruteforce(spark, corpus, seg_words):
    """On arbitrary tiny corpora, segment_dedup must agree with a direct
    Python first-occurrence walk: same segment counts, same survivors, same
    rebuilt text."""
    from peskas_timor_data_pipeline_spark.llm.dedup import segment_dedup

    texts = {i: " ".join(toks) for i, toks in enumerate(corpus)}

    # pure-Python reference: split into seg_words chunks, global
    # first-occurrence by (doc, pos), rebuild
    seen: set[str] = set()
    expect = {}
    segs_by_doc = {}
    for did in sorted(texts):
        toks = texts[did].split(" ")
        segs = [" ".join(toks[p:p + seg_words])
                for p in range(0, len(toks), seg_words)]
        segs_by_doc[did] = segs
    for did in sorted(segs_by_doc):
        kept = []
        for seg in segs_by_doc[did]:
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        expect[did] = (len(segs_by_doc[did]), len(kept), " ".join(kept))

    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_segs, r.n_kept, r.rebuilt)
           for r in segment_dedup(df, "doc_id", "text", seg_words).collect()}
    assert got == expect
