"""Property tests for the round-7 operators.

Hypothesis drives SMALL random instances through the Spark operators and
checks invariants the pinned examples can't cover: k-core against an
independent Python peeling on arbitrary edge sets, Neyman allocation's
budget/zero-variance contracts on arbitrary integer strata, Cohen's kappa
against a direct Python computation on arbitrary label pairings, and the
signature-store matcher's exact-match/novel-content guarantees.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_kcore(edges: set[tuple[int, int]], k: int, rounds: int):
    """Independent reference peeling: same pinned-round semantics."""
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        e = {(a, b) for a, b in e if a in alive and b in alive}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0, max_size=40,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_kcore_matches_reference_peeling(spark, edges, k):
    """For ANY small graph (dupes/self-loops/direction included) the
    operator's pinned-round peeling equals the independent Python replay,
    and with enough rounds every survivor meets the degree bound inside
    the surviving subgraph (the fixpoint k-core property)."""
    from peskas_timor_data_pipeline_spark.operators.graph import k_core

    rounds = 12  # >= node count: guaranteed fixpoint on <=12 nodes
    expected = _py_kcore(set(edges), k, rounds)
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "src int, dst int"
    ).filter("src IS NOT NULL")
    got = {r.node: r.degree for r in
           k_core(df, "src", "dst", k=k, n_rounds=rounds).collect()}
    assert got == expected
    # fixpoint property: survivors' degrees within the core are >= k
    assert all(d >= k for d in got.values())


@given(
    strata=st.lists(
        st.lists(st.integers(0, 50), min_size=1, max_size=12),
        min_size=1, max_size=5,
    ),
)
@settings(**_SETTINGS)
def test_neyman_allocation_contracts(spark, strata):
    """For ANY integer strata: per-stratum moments are exact, n<2 or
    zero-variance strata get alloc 0 weight, the allocation never exceeds
    total_n + one rounding step per stratum, and equals the direct
    textbook computation."""
    import math

    from peskas_timor_data_pipeline_spark.operators.estimate import (
        neyman_allocation,
    )

    rows = [(f"s{i}", v) for i, vals in enumerate(strata) for v in vals]
    df = spark.createDataFrame(rows, "stratum string, m long")
    total_n = 100
    out = {r.stratum: r for r in
           neyman_allocation(df, ["stratum"], "m", total_n).collect()}
    weights = {}
    for i, vals in enumerate(strata):
        n = len(vals)
        s, s2 = sum(vals), sum(v * v for v in vals)
        var = (n * s2 - s * s) / (n * (n - 1)) if n >= 2 else 0.0
        weights[f"s{i}"] = n * math.sqrt(var)
        r = out[f"s{i}"]
        assert r.n_rows == n and r.sum_m == s
        assert r.var_micro == math.floor(var * 1_000_000 + 0.5)
    wsum = 0.0
    for w in sorted(weights.values()):
        wsum += w
    for name, w in weights.items():
        expect = math.floor(total_n * w / wsum + 0.5) if wsum > 0 else 0
        assert out[name].alloc_n == expect
    assert sum(r.alloc_n for r in out.values()) <= total_n + len(strata)


@given(
    labels=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
        min_size=1, max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_cohen_kappa_matches_direct_computation(spark, labels):
    """For ANY pairing over a shared label set the integer contingency
    arithmetic equals the direct kappa computation (including negative
    kappa — floor, not truncation, on the signed ratio)."""
    import math

    from peskas_timor_data_pipeline_spark.operators.estimate import cohen_kappa

    df = spark.createDataFrame(labels, "a string, b string")
    row = cohen_kappa(df, "a", "b").collect()[0]
    n = len(labels)
    agree = sum(1 for x, y in labels if x == y)
    pe_num = sum(
        sum(1 for x, _ in labels if x == c) * sum(1 for _, y in labels if y == c)
        for c in "abc"
    )
    assert (row.n, row.n_agree, row.pe_num) == (n, agree, pe_num)
    assert row.po_ppm == agree * 1_000_000 // n
    assert row.pe_ppm == pe_num * 1_000_000 // (n * n)
    if n * n != pe_num:
        assert row.kappa_micro == math.floor(
            1_000_000.0 * (n * agree - pe_num) / (n * n - pe_num)
        )
        assert row.kappa_micro <= 1_000_000
    else:  # chance agreement certain: kappa undefined, not a crash
        assert row.kappa_micro is None


def test_cohen_kappa_perfect_and_degenerate(spark):
    """Perfect agreement pins kappa at exactly 1e6 micro; a single
    repeated label pair (pe_num == n^2) is the degenerate guard case."""
    from peskas_timor_data_pipeline_spark.operators.estimate import cohen_kappa

    df = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z"), ("x", "x")], "a string, b string"
    )
    assert cohen_kappa(df, "a", "b").collect()[0].kappa_micro == 1_000_000


def test_canonical_url_cases(spark):
    """Canonicalization folds scheme/www/query/fragment/trailing-slash and
    case; the extractor finds every URL and never crosses whitespace."""
    from peskas_timor_data_pipeline_spark.llm.text import (
        extract_canonical_urls,
    )

    rows = [
        (1, "x https://WWW.Example.COM/Path/?q=1#f y http://example.com/path"),
        (2, "bare http://a.b.org/ and http://a.b.org trailing"),
        (3, "no urls here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.url, r.canonical, r.host)
           for r in extract_canonical_urls(df, "doc_id", "text").collect()}
    assert (1, "https://WWW.Example.COM/Path/?q=1#f",
            "example.com/path", "example.com") in got
    assert (1, "http://example.com/path", "example.com/path",
            "example.com") in got
    assert (2, "http://a.b.org/", "a.b.org", "a.b.org") in got
    assert (2, "http://a.b.org", "a.b.org", "a.b.org") in got
    assert not any(d == 3 for d, *_ in got)


@given(seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_signature_store_exact_match_and_novelty(spark, seed):
    """A batch doc whose text is bit-identical to a store doc always
    matches it with full agreement; a batch doc with disjoint content
    never reports a >= min_agree match against that store."""
    from peskas_timor_data_pipeline_spark.llm.dedup import (
        match_signature_store, minhash_signature,
    )

    # store docs must be mutually DISSIMILAR (distinct md5-derived bodies),
    # else the exact twin ties all 16 slots with a near-identical sibling
    # and the min-id tie-break legitimately picks the sibling
    store_rows = [
        (i, f"doc {hashlib.md5(f'{seed}/{i}'.encode()).hexdigest()} " * 3)
        for i in range(4)
    ]
    batch_rows = [(100, store_rows[2][1]),                    # exact dup
                  (101, "totally unrelated fresh content " * 4)]
    store = spark.createDataFrame(store_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    ssig = minhash_signature(store, "doc_id", "text", 16, 5)
    bsig = minhash_signature(batch, "doc_id", "text", 16, 5)
    out = {r.batch_id: r for r in match_signature_store(
        bsig, ssig, "doc_id", 16, 8, min_agree=12).collect()}
    assert out[100].store_id == 2
    assert out[100].n_agree == 16
    assert out[100].est_jaccard_ppm == 1_000_000
    assert 101 not in out


def _py_lpa(edges: set[tuple[int, int]], rounds: int):
    """Independent synchronous min-tie LPA replay."""
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs: dict[int, list[int]] = {}
    for a, b in e:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            counts: dict[int, int] = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(
                (lab for lab in counts),
                key=lambda lab: (-counts[lab], lab),
            )
        labels = new
    return labels


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=30,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_label_propagation_matches_reference(spark, edges, rounds):
    """For ANY small graph the pinned-round synchronous min-tie LPA
    equals the independent Python replay — community assignment is a
    pure function of the graph."""
    from peskas_timor_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    expected = _py_lpa(set(edges), rounds)
    df = spark.createDataFrame(list(edges), "src int, dst int")
    got = {r.node: r.label for r in
           label_propagation(df, "src", "dst", n_rounds=rounds).collect()}
    assert got == expected


def test_pmi_collocations_hand_computed(spark):
    """Counts and the PMI value match the direct computation on a tiny
    corpus with one planted collocation."""
    import math

    from peskas_timor_data_pipeline_spark.llm.text import pmi_collocations

    rows = [(i, "new york is big and new york is old") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.w1, r.w2): r for r in
           pmi_collocations(df, "doc_id", "text", min_count=6).collect()}
    r = out[("new", "york")]
    # per doc: 'new york' twice, 9 tokens; 3 docs
    assert (r.c12, r.c1, r.c2) == (6, 6, 6)
    n_tokens = 27
    assert r.pmi == round(math.log(6 * n_tokens / (6 * 6)), 6)
    assert ("york", "is") in out and ("is", "big") not in out  # c12=3 < 6


@given(
    n1_extra=st.integers(0, 20), n2_extra=st.integers(0, 20),
    overlap=st.integers(1, 20),
)
@settings(**_SETTINGS)
def test_chapman_estimate_matches_formula(spark, n1_extra, n2_extra, overlap):
    """For ANY two-pass design the estimator equals the textbook Chapman
    formula with Seber variance (non-duplicated distinct counts)."""
    import math

    from peskas_timor_data_pipeline_spark.operators.estimate import (
        chapman_estimate,
    )

    # pass 1 = [0, overlap + n1_extra); pass 2 = [0, overlap) plus its own tail
    first_ids = list(range(overlap + n1_extra))
    second_ids = list(range(overlap)) + [1000 + i for i in range(n2_extra)]
    first = spark.createDataFrame([(i,) for i in first_ids * 2], "k long")
    second = spark.createDataFrame([(i,) for i in second_ids], "k long")
    row = chapman_estimate(first, second, "k").collect()[0]
    n1, n2, m = len(first_ids), len(second_ids), overlap
    assert (row.n1, row.n2, row.m) == (n1, n2, m)
    assert row.n_hat == (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert row.var_floor == math.floor(
        (n1 + 1.0) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1.0) * (m + 1) * (m + 2))
    )


def test_zipf_slope_exact_power_law(spark):
    """A corpus whose frequencies are an exact power law freq = C/rank
    recovers slope -1 (up to 6dp) with intercept ln(C)."""
    from peskas_timor_data_pipeline_spark.llm.text import zipf_slope

    # token w{r} appears exactly 1200/r times, r = 1..8
    words = []
    for r in range(1, 9):
        words += [f"w{r:02d}"] * (1200 // r)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_slope(df, "text", top_r=8).collect()[0]
    assert row.n_points == 8
    # 1200/r is not exact for r=7 (171 vs 171.43) — slope lands near -1
    assert abs(row.slope + 1.0) < 0.01
    assert abs(row.intercept - 7.09) < 0.02  # ln(1200) = 7.0901


def test_mutual_knn_requires_reciprocity(spark):
    """A hub vector that appears in others' neighbor lists but does not
    reciprocate yields no mutual pair; a genuinely close pair does."""
    from peskas_timor_data_pipeline_spark.llm.similarity import mutual_knn

    dim = 4
    rows = [
        # two near-identical vectors: each other's top-1 -> mutual
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        # orthogonal-ish cloud
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r.id_a, r.id_b) for r in
           mutual_knn(df, "vec_id", "embedding", k=1, dim=dim,
                      n_cells=2, n_probe=2).collect()}
    assert (1, 2) in out
    # with k=1, each of 3/4/5 has exactly one neighbor slot; reciprocity
    # of (1,2) excludes any pair involving the cloud unless two cloud
    # members pick each other — assert no pair contains vector 1 or 2
    # beyond the mutual twin
    assert all(p == (1, 2) or (1 not in p and 2 not in p) for p in out)
