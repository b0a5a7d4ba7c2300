"""Property tests for the round-8 batch-2/3 operators.

Hypothesis drives SMALL random instances through the Spark operators and
checks them against independent pure-Python replays: Mann-Whitney and
Kruskal-Wallis against naive midrank computations, association rules
against a brute-force basket dictionary, pointer jumping against a
direct parent-chase loop, Spearman against rank-Pearson, ACF against the
textbook estimator, HITS against a dict replay of the integer recursion,
and attribution against a sequential event walk.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _midranks(vals):
    """value -> midrank over the multiset (1-based, ties averaged)."""
    from collections import Counter

    c = Counter(vals)
    out, cum = {}, 0
    for v in sorted(c):
        out[v] = cum + (c[v] + 1) / 2
        cum += c[v]
    return out


# --- Mann-Whitney --------------------------------------------------------------


@given(
    xs=st.lists(st.integers(0, 8), min_size=1, max_size=20),
    ys=st.lists(st.integers(0, 8), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_mann_whitney_matches_naive(spark, xs, ys):
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        mann_whitney_u,
    )

    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney_u(df, "g", "v", "a", "b", grid=1).collect()[0]
    r = _midranks(xs + ys)
    ra = sum(r[v] for v in xs)
    ua = ra - len(xs) * (len(xs) + 1) / 2
    n, na, nb = len(xs) + len(ys), len(xs), len(ys)
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(xs + ys).values())
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1))) if n > 1 else 0.0
    if var > 0:
        assert out["u_a"] == round(ua, 6)
        z = (ua - na * nb / 2) / math.sqrt(var)
        assert abs(out["z"] - z) < 1e-6
    else:
        assert out["u_a"] is None and out["z"] is None


# --- Kruskal-Wallis -------------------------------------------------------------


@given(
    data=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6)),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_kruskal_wallis_matches_naive(spark, data):
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        kruskal_wallis,
    )

    rows = [(f"g{g}", float(v)) for g, v in data]
    df = spark.createDataFrame(rows, "g string, v double")
    out = kruskal_wallis(df, "g", "v", grid=1).collect()[0]
    vals = [v for _, v in data]
    r = _midranks(vals)
    groups = {}
    for g, v in data:
        groups.setdefault(g, []).append(v)
    n, k = len(vals), len(groups)
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(vals).values())
    corr = 1 - ties / (n**3 - n) if n >= 2 else 0.0
    if n >= 2 and k >= 2 and corr > 0:
        s = sum(sum(r[v] for v in vs) ** 2 / len(vs) for vs in groups.values())
        h = 12 / (n * (n + 1)) * s - 3 * (n + 1)
        assert abs(out["h"] - h) < 1e-5
        assert abs(out["h_corrected"] - h / corr) < 1e-5
    else:
        assert out["h"] is None


# --- association rules -----------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 6), st.sampled_from("abcd")),
        min_size=1,
        max_size=30,
    ),
    min_sup=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_association_rules_match_bruteforce(spark, rows, min_sup):
    from collections import defaultdict
    from itertools import combinations

    from peskas_timor_data_pipeline_spark.operators.affinity import (
        association_rules,
    )

    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["pair_support"], r["antecedent_support"],
            r["consequent_support"], r["n_baskets"],
        )
        for r in association_rules(df, "basket", "item", min_sup).collect()
    }
    baskets = defaultdict(set)
    for b, i in rows:
        baskets[b].add(i)
    item_sup = defaultdict(int)
    for items in baskets.values():
        for i in items:
            item_sup[i] += 1
    pair_sup = defaultdict(int)
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            pair_sup[(a, b)] += 1
    expect = {}
    for (a, b), ps in pair_sup.items():
        if ps >= min_sup and item_sup[a] >= min_sup and item_sup[b] >= min_sup:
            expect[(a, b)] = (ps, item_sup[a], item_sup[b], len(baskets))
            expect[(b, a)] = (ps, item_sup[b], item_sup[a], len(baskets))
    assert got == expect


# --- pointer jumping --------------------------------------------------------------


@given(
    n=st.integers(2, 25),
    seed=st.integers(0, 10**6),
    rounds=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_pointer_jump_matches_chase(spark, n, seed, rounds):
    import random

    from peskas_timor_data_pipeline_spark.operators.graph import (
        pointer_jump_closure,
    )

    rng = random.Random(seed)
    # random forest: each node's parent is a smaller id (or itself = root)
    parents = {1: 1}
    for k in range(2, n + 1):
        parents[k] = rng.randint(1, k) if rng.random() < 0.9 else k
        if parents[k] == k:
            parents[k] = k  # explicit root
    nodes = spark.createDataFrame(
        sorted(parents.items()), "node int, parent int"
    )
    out = {r["node"]: r for r in
           pointer_jump_closure(nodes, "node", "parent", n_rounds=rounds).collect()}
    horizon = 2 ** rounds
    for k in range(1, n + 1):
        # replay exactly: walk min(horizon, to-root) steps from k
        anc, dist = k, 0
        while dist < horizon and parents[anc] != anc:
            anc, dist = parents[anc], dist + 1
        assert out[k]["root"] == anc
        assert out[k]["depth"] == dist
        assert out[k]["resolved"] == (parents[anc] == anc)


# --- Spearman ---------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=2,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_spearman_matches_rank_pearson(spark, pts):
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        spearman_correlation,
    )

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    out = spearman_correlation(df, "x", "y", grid_x=1, grid_y=1).collect()[0]
    rx = _midranks([x for x, _ in pts])
    ry = _midranks([y for _, y in pts])
    xs = [rx[x] for x, _ in pts]
    ys = [ry[y] for _, y in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    vx = sum((a - mx) ** 2 for a in xs)
    vy = sum((b - my) ** 2 for b in ys)
    if vx > 0 and vy > 0:
        assert abs(out["rho"] - num / math.sqrt(vx * vy)) < 1e-6
    else:
        assert out["rho"] is None


# --- ACF --------------------------------------------------------------------------


@given(
    xs=st.lists(st.integers(0, 50), min_size=3, max_size=40),
    max_lag=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_autocorrelation_matches_textbook(spark, xs, max_lag):
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        autocorrelation,
    )

    df = spark.createDataFrame(list(enumerate(xs)), "i int, x int")
    out = {r["lag"]: r for r in
           autocorrelation(df, "i", "x", max_lag=max_lag).collect()}
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    for lag in range(1, max_lag + 1):
        if lag >= n:
            assert lag not in out or out[lag]["acf"] is None
            continue
        if den == 0:
            assert out[lag]["acf"] is None
            continue
        ref = sum((xs[t] - m) * (xs[t + lag] - m) for t in range(n - lag)) / den
        assert abs(out[lag]["acf"] - ref) < 1e-6


# --- HITS -------------------------------------------------------------------------


@given(
    edges=st.lists(
        st.tuples(st.integers(1, 5), st.integers(10, 14)),
        min_size=1,
        max_size=15,
    ),
    rounds=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_hits_matches_integer_replay(spark, edges, rounds):
    from peskas_timor_data_pipeline_spark.operators.graph import hits_scores

    df = spark.createDataFrame(edges, "src int, dst int")
    out = hits_scores(df, "src", "dst", n_rounds=rounds, top_r=50).collect()
    E = sorted(set(edges))
    NANO = 1_000_000_000
    h = {s: NANO for s, _ in E}
    a = {}
    for _ in range(rounds):
        raw = {}
        for s, d in E:
            raw[d] = raw.get(d, 0) + h[s]
        m = max(raw.values())
        a = {d: v * NANO // m for d, v in raw.items()}
        raw = {}
        for s, d in E:
            raw[s] = raw.get(s, 0) + a[d]
        m = max(raw.values())
        h = {s: v * NANO // m for s, v in raw.items()}
    assert {r["node"]: r["score_nano"] for r in out if r["side"] == "hub"} == h
    assert {r["node"]: r["score_nano"]
            for r in out if r["side"] == "authority"} == a


# --- attribution -------------------------------------------------------------------


@given(
    evs=st.lists(
        st.tuples(st.integers(1, 3), st.sampled_from(["t1", "t2", "buy"])),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_attribution_matches_sequential_walk(spark, evs):
    from collections import defaultdict

    from peskas_timor_data_pipeline_spark.operators.funnel import (
        multi_touch_attribution,
    )

    rows = [(u, i, t) for i, (u, t) in enumerate(evs)]
    df = spark.createDataFrame(rows, "u int, i int, typ string")
    out = {r["channel"]: r for r in multi_touch_attribution(
        df, "u", ["i"], "typ", "buy").collect()}
    touches = defaultdict(lambda: [0, 0, 0])  # n, last, lin_micro
    per_user = defaultdict(list)
    for u, i, t in rows:
        per_user[u].append((i, t))
    for u, seq in per_user.items():
        seq.sort()
        window = []
        for _, t in seq:
            if t == "buy":
                if window:
                    k = len(window)
                    for w in window:
                        touches[w][0] += 1
                        touches[w][2] += math.floor(1e6 / k + 0.5)
                    touches[window[-1]][1] += 1
                window = []
            else:
                window.append(t)
    expect = {
        ch: (v[0], v[1], v[2]) for ch, v in touches.items() if v[0] > 0
    }
    got = {
        ch: (r["n_touches"], r["last_touch_conversions"],
             r["linear_credit_micro"])
        for ch, r in out.items()
    }
    assert got == expect
