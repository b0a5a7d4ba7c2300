"""Property tests for the round-8 operators.

Hypothesis drives SMALL random instances through the Spark operators and
checks them against independent pure-Python replays: k-truss against a
direct triangle-support peeling, the KS statistic against a brute-force
ECDF sweep, JS divergence against a dict-based computation, isotonic
calibration against a real pool-adjacent-violators implementation, and
winnowing against the textbook rightmost-min window scan.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# --- k-truss ---------------------------------------------------------------------

def _py_ktruss(edges, k, rounds):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    sup = {}
    for _ in range(rounds):
        sup = {ed: 0 for ed in e}
        for x, y in e:
            for z in range(max(x, y) + 1, 13):
                if (y, z) in e and (x, z) in e:
                    for ed in ((x, y), (y, z), (x, z)):
                        sup[ed] += 1
        e = {ed for ed in e if sup[ed] >= k - 2}
    return {ed: sup[ed] for ed in e}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0, max_size=40,
    ),
    k=st.integers(min_value=3, max_value=5),
)
@settings(**_SETTINGS)
def test_ktruss_matches_reference_peeling(spark, edges, k):
    from peskas_timor_data_pipeline_spark.operators.graph import k_truss

    expected = _py_ktruss(edges, k, 3)
    if edges:
        df = spark.createDataFrame(edges, "src int, dst int")
    else:
        df = spark.createDataFrame([], "src int, dst int")
    got = {
        (r.a, r.b): r.support
        for r in k_truss(df, "src", "dst", k=k, n_rounds=3).collect()
    }
    assert got == expected


# --- KS two-sample ---------------------------------------------------------------

@given(
    xs=st.lists(st.floats(0.0, 10.0, allow_nan=False), min_size=1, max_size=30),
    ys=st.lists(st.floats(0.0, 10.0, allow_nan=False), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_ks_two_sample_matches_bruteforce(spark, xs, ys):
    from peskas_timor_data_pipeline_spark.operators.estimate import ks_two_sample

    # quantize exactly as the operator does
    qa = sorted(math.floor(v * 100) for v in xs)
    qb = sorted(math.floor(v * 100) for v in ys)
    grid = sorted(set(qa) | set(qb))
    d = max(
        abs(sum(1 for v in qa if v <= g) / len(qa)
            - sum(1 for v in qb if v <= g) / len(qb))
        for g in grid
    )
    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, value double")
    out = ks_two_sample(df, "g", "value", "a", "b").collect()[0]
    assert out.n_a == len(xs) and out.n_b == len(ys)
    assert abs(out.d_stat - d) < 1e-6


def test_ks_two_sample_empty_side_is_null(spark):
    from peskas_timor_data_pipeline_spark.operators.estimate import ks_two_sample

    df = spark.createDataFrame([("a", 1.0)], "g string, value double")
    out = ks_two_sample(df, "g", "value", "a", "b").collect()[0]
    assert out.n_b == 0 and out.d_stat is None and out.drift_95 is None


# --- JS divergence ---------------------------------------------------------------

@given(
    ta=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=20),
    tb=st.lists(st.sampled_from(["aa", "bb", "cc", "ee"]), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_js_divergence_matches_dict_computation(spark, ta, tb):
    from peskas_timor_data_pipeline_spark.llm.text import js_divergence

    def dist(toks):
        c = {}
        for t in toks:
            c[t] = c.get(t, 0) + 1
        n = sum(c.values())
        return c, n

    ca, na = dist(ta)
    cb, nb = dist(tb)
    jsd = 0.0
    for w in set(ca) | set(cb):
        p = ca.get(w, 0) / na
        q = cb.get(w, 0) / nb
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    da = spark.createDataFrame([(" ".join(ta),)], "text string")
    db = spark.createDataFrame([(" ".join(tb),)], "text string")
    out = js_divergence(da, db, "text").collect()[0]
    assert out.n_tokens_a == na and out.n_tokens_b == nb
    assert abs(out.jsd_nats - jsd) < 1e-5
    # bounded by ln 2, non-negative
    assert -1e-9 <= out.jsd_nats <= math.log(2) + 1e-9


# --- isotonic calibration ---------------------------------------------------------

def _py_pav(pairs):
    """Real pool-adjacent-violators on (n, pos) bin stats in bin order:
    returns the fitted monotone value per bin."""
    blocks = [[n, pos] for n, pos in pairs]  # [weight, sum]
    idx = [[i] for i in range(len(pairs))]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            idx[i].extend(idx[i + 1])
            del blocks[i + 1], idx[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    out = {}
    for blk, members in zip(blocks, idx):
        for m in members:
            out[m] = blk[1] / blk[0]
    return out


@given(
    data=st.lists(
        st.tuples(
            st.floats(0.0, 0.999, allow_nan=False),
            st.integers(0, 1),
        ),
        min_size=1, max_size=60,
    ),
)
@settings(**_SETTINGS)
def test_isotonic_fit_matches_pav(spark, data):
    from peskas_timor_data_pipeline_spark.operators.estimate import isotonic_fit

    n_bins = 10
    stats = {}
    for p, y in data:
        b = min(int(p * n_bins), n_bins - 1)
        n, pos = stats.get(b, (0, 0))
        stats[b] = (n + 1, pos + y)
    order = sorted(stats)
    pav = _py_pav([stats[b] for b in order])
    expected = {b: pav[i] for i, b in enumerate(order)}

    df = spark.createDataFrame(
        [(float(p), int(y)) for p, y in data], "p double, y int"
    )
    rows = isotonic_fit(df, "p", "y", n_bins=n_bins).collect()
    got = {r.bin: r.iso_p for r in rows}
    assert set(got) == set(expected)
    for b in got:
        assert abs(got[b] - expected[b]) < 1e-6
    # monotone non-decreasing in bin order
    seq = [got[b] for b in sorted(got)]
    assert all(seq[i] <= seq[i + 1] + 1e-9 for i in range(len(seq) - 1))


# --- winnowing --------------------------------------------------------------------

def _py_winnow(text, k, w):
    n = len(text) - k + 1
    if n < 1:
        return set()
    hs = [hashlib.md5(text[i:i + k].encode()).hexdigest()[:8] for i in range(n)]
    starts = range(max(n - w + 1, 1))
    sel = set()
    for s in starts:
        win = hs[s:s + w]
        best = min(win)
        # rightmost minimal
        pos = max(i for i, h in enumerate(win) if h == best)
        sel.add((s + pos + 1, best))
    return sel


@given(
    text=st.text(alphabet="abcd ", min_size=0, max_size=120),
)
@settings(**_SETTINGS)
def test_winnow_matches_reference_scan(spark, text):
    from peskas_timor_data_pipeline_spark.llm.dedup import winnow_fingerprints

    expected = _py_winnow(text, 5, 4)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r.fp_pos, r.fp)
        for r in winnow_fingerprints(df, "doc_id", "text", 5, 4).collect()
    }
    assert got == expected


def test_winnow_guarantee_shared_span_shares_fingerprint(spark):
    """The winnowing guarantee: documents sharing a substring of length
    >= k + w - 1 share at least one identical fingerprint."""
    from peskas_timor_data_pipeline_spark.llm.dedup import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, "prefix one. " + shared + " suffix one"),
        (2, "totally different lead-in: " + shared + " and another tail"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", 16, 8).collect()
    s1 = {r.fp for r in fps if r.doc_id == 1}
    s2 = {r.fp for r in fps if r.doc_id == 2}
    assert s1 & s2
