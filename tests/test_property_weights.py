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


types_ = st.sampled_from(["TL", "FL"])
# rfish snapshot rows: (code, species, Type, a, b, aTL?, EsQ?, has_ll, aL, bL)
rfish_rows = st.lists(
    st.tuples(
        codes,
        st.sampled_from(["sA", "sB", "sC"]),
        types_,
        st.floats(0.005, 0.05),
        st.floats(2.5, 3.2),
        st.one_of(st.none(), st.floats(0.005, 0.05)),
        st.one_of(st.none(), st.just("yes"), st.just("No")),
        st.booleans(),
        st.floats(-0.5, 0.5),
        st.floats(0.8, 1.3),
    ),
    min_size=1,
    max_size=8,
)
catch_typed = st.lists(
    st.tuples(codes, lengths, types_, st.integers(0, 50)), min_size=1, max_size=8,
)


def _rowwise_reference(rfish, code, length, ltype, n):
    """Pure-Python transliteration of estimate_weight
    (R/calculate-weights.R:511-569) + get_morphometric_tables (:452-508)."""
    lw = {
        (c, s, t, a, b)
        for (c, s, t0, a0, b, aTL, esq, has_ll, aL, bL) in rfish
        for (t, a) in ([("TL", aTL)] if aTL is not None else []) + [(t0, a0)]
        if a is not None and not (esq or "").lower() == "yes"
    }
    ll = {
        (c, s, l1, l2, aL2, bL2)
        for (c, s, t, a, b, aTL, esq, has_ll, aL, bL) in rfish
        if has_ll
        for (l1, l2, aL2, bL2) in [
            ("TL", "FL", aL, bL),
            ("FL", "TL", -aL / bL, 1.0 / bL),
        ]
    }
    cands = [a * length**b for (c, s, t, a, b) in lw if c == code and t == ltype]
    cands += [
        a * (aL2 + length * bL2) ** b
        for (c, s, l1, l2, aL2, bL2) in ll
        if c == code and l2 == ltype
        for (c2, s2, t, a, b) in lw
        if c2 == c and s2 == s and t == l1
    ]
    if not cands:
        return None, 0
    coeff = {"CLP": 0.7}.get(code, 0.9)
    if n == 0:
        return 0.0, len(cands)
    return float(np.percentile(cands, coeff * 100)) * n, len(cands)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rfish=rfish_rows, catch=catch_typed)
def test_estimate_weights_ll_matches_rowwise_reference(spark, rfish, catch):
    """The set-based LL-routed estimator equals a rowwise transliteration
    of the reference's estimate_weight, including length-length conversion
    through BOTH directions (inverted reciprocal params) and per-code
    quantile coefficients."""
    from peskas_timor_data_pipeline_spark.operators.weights import (
        estimate_weights_ll,
        morphometric_tables,
    )

    rdf = spark.createDataFrame(
        [
            (c, s, 0.0, 100.0, t, a, b, aTL, esq,
             "TL" if has_ll else None, "FL" if has_ll else None,
             aL if has_ll else None, bL if has_ll else None)
            for (c, s, t, a, b, aTL, esq, has_ll, aL, bL) in rfish
        ],
        "interagency_code string, Species string, LengthMin double, "
        "LengthMax double, Type string, a double, b double, aTL double, "
        "EsQ string, Length1 string, Length2 string, aL double, bL double",
    )
    lw, ll = morphometric_tables(rdf)
    cdf = spark.createDataFrame(
        [(i, c, ln, t, n) for i, (c, ln, t, n) in enumerate(catch)],
        "row_id int, code string, length double, ltype string, n int",
    )
    out = {
        r.row_id: (r.weight, r.n_candidates)
        for r in estimate_weights_ll(
            cdf, lw, ll, "code", "length", "ltype", "n", ["row_id"],
            coeff_map={"CLP": 0.7}, default_coeff=0.9,
        ).collect()
    }
    for i, (c, ln, t, n) in enumerate(catch):
        want_w, want_k = _rowwise_reference(rfish, c, ln, t, n)
        if want_w is None:
            assert i not in out
            continue
        got_w, got_k = out[i]
        assert got_k == want_k, (i, got_k, want_k)
        assert math.isclose(got_w, want_w, rel_tol=1e-9, abs_tol=1e-12), (
            i, got_w, want_w,
        )


def test_estimate_weights_ll_drops_null_candidate_weights(spark):
    """The reference filters !is.na(weight) before quantile()
    (R/calculate-weights.R:556). An lw row with null b (the table builder
    only requires non-null a, same as the reference) must not contribute a
    null candidate: nulls sort first under the ascending rank window, so
    an unfiltered null would inflate __n__ and shift every percentile
    position. With one valid candidate the percentile IS that candidate
    and n_candidates counts only it."""
    from peskas_timor_data_pipeline_spark.operators.weights import (
        estimate_weights_ll,
    )

    lw = spark.createDataFrame(
        [("CLP", "s", "TL", 2.0, 1.0), ("CLP", "s", "TL", 3.0, None)],
        "interagency_code string, Species string, Type string, a double, b double",
    )
    ll = spark.createDataFrame(
        [], "interagency_code string, Species string, Length1 string, "
            "Length2 string, aL double, bL double",
    )
    cdf = spark.createDataFrame(
        [(1, "CLP", 10.0, "TL", 4)],
        "row_id int, code string, length double, ltype string, n int",
    )
    rows = estimate_weights_ll(
        cdf, lw, ll, "code", "length", "ltype", "n", ["row_id"],
        coeff_map={}, default_coeff=0.9,
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_candidates == 1
    assert math.isclose(rows[0].weight, 2.0 * 10.0 * 4, rel_tol=1e-12)


def test_estimate_weights_ll_rejects_oversized_params(spark):
    """The params tables are contractually dimension-scale (broadcast +
    combo-window width both bounded by them); an oversized table must fail
    loudly at plan-build, not die on executors at scale."""
    import pytest

    from peskas_timor_data_pipeline_spark.operators.weights import (
        estimate_weights_ll,
    )

    lw = spark.createDataFrame(
        [("CLP", "s", "TL", 0.01 + i / 1000.0, 3.0) for i in range(20)],
        "interagency_code string, Species string, Type string, a double, b double",
    )
    ll = spark.createDataFrame(
        [], "interagency_code string, Species string, Length1 string, "
            "Length2 string, aL double, bL double",
    )
    cdf = spark.createDataFrame(
        [(1, "CLP", 10.0, "TL", 4)],
        "row_id int, code string, length double, ltype string, n int",
    )
    with pytest.raises(ValueError, match="max_params_rows"):
        estimate_weights_ll(
            cdf, lw, ll, "code", "length", "ltype", "n", ["row_id"],
            max_params_rows=10,
        )
    # at/below the bound the same call plans fine
    out = estimate_weights_ll(
        cdf, lw, ll, "code", "length", "ltype", "n", ["row_id"],
        max_params_rows=20,
    ).collect()
    assert len(out) == 1 and out[0].n_candidates == 20


def test_inverted_ll_params_roundtrip(spark):
    """The inverted reciprocal rows undo the base conversion exactly:
    FL->TL then TL->FL returns the original length."""
    from peskas_timor_data_pipeline_spark.operators.weights import (
        morphometric_tables,
    )

    rdf = spark.createDataFrame(
        [("CLP", "s", 0.0, 100.0, "TL", 0.01, 3.0, None, None,
          "TL", "FL", 1.7, 1.12)],
        "interagency_code string, Species string, LengthMin double, "
        "LengthMax double, Type string, a double, b double, aTL double, "
        "EsQ string, Length1 string, Length2 string, aL double, bL double",
    )
    _, ll = morphometric_tables(rdf)
    rows = {(r.Length1, r.Length2): (r.aL, r.bL) for r in ll.collect()}
    assert set(rows) == {("TL", "FL"), ("FL", "TL")}
    aF, bF = rows[("TL", "FL")]  # forward: FL-observed -> TL
    aI, bI = rows[("FL", "TL")]  # inverse
    for length in (3.0, 10.0, 47.5):
        fwd = aF + length * bF
        back = aI + fwd * bI
        assert math.isclose(back, length, rel_tol=1e-12)


def test_resolve_species_country_fallback_and_missing_row(spark):
    """resolve_species: country filter keeps in-country records; a code
    whose matches have NO in-country record falls back to all its matches
    (R/calculate-weights.R:186-195); retrieve_lengths appends a null row
    for codes resolving to nothing (:245-260 add_row)."""
    from peskas_timor_data_pipeline_spark.sources.fishbase import (
        resolve_species,
        retrieve_lengths,
    )

    snapshot = spark.createDataFrame(
        [
            ("Genus", "Sardinella", "Sardinella gibbosa", 626),
            ("Genus", "Sardinella", "Sardinella albella", 360),
            ("Genus", "Caranx", "Caranx ignobilis", 360),
            ("Species", "Caranx tille", "Caranx tille", 360),
        ],
        "rank string, name string, species string, c_code int",
    )
    taxa = spark.createDataFrame(
        [
            ("CLP", "Sardinella", "Genus"),
            ("CGX", "Caranx", "Genus"),
            ("CGX", "Caranx tille", "Species"),
            ("ZZZ", "Nomatch", "Genus"),
        ],
        "interagency_code string, name string, taxa_rank string",
    )
    got = {
        (r.interagency_code, r.species)
        for r in resolve_species(snapshot, taxa, [626]).collect()
    }
    # CLP has a 626 record -> only that species; CGX has none -> all matches
    assert got == {
        ("CLP", "Sardinella gibbosa"),
        ("CGX", "Caranx ignobilis"),
        ("CGX", "Caranx tille"),
    }
    lw = spark.createDataFrame(
        [("Sardinella gibbosa", 0.01, 3.0), ("Caranx tille", 0.02, 2.9)],
        "species string, a double, b double",
    )
    full = retrieve_lengths(snapshot, taxa, lw, [626]).collect()
    by_code = {}
    for r in full:
        by_code.setdefault(r.interagency_code, []).append(r)
    assert {r.species for r in by_code["CLP"]} == {"Sardinella gibbosa"}
    assert {r.species for r in by_code["CGX"]} == {"Caranx tille"}
    # no-species codes still present, as a null row
    assert [r.species for r in by_code["ZZZ"]] == [None]


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
