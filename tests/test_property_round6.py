"""Property tests for the round-6 operators.

Hypothesis drives SMALL random instances through the Spark operators and
checks invariants the pinned examples can't cover: the weighted
reservoir's structural contract on arbitrary weight vectors, the b-bit
estimator's dominance/bounds on random signature pairs, and the
cluster-safe split's no-straddle guarantee on arbitrary edge sets.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    weights=st.lists(st.integers(min_value=-2, max_value=9),
                     min_size=1, max_size=25),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_weighted_reservoir_structural_contract(spark, weights, k):
    """For ANY integer weight vector: ranks are dense 1..min(k, eligible),
    only positive-weight rows are ever sampled, every sampled row reports
    its (clamped) weight, and the draw is a pure function of (salt, id) —
    adding an ineligible row never changes who is sampled."""
    from peskas_timor_data_pipeline_spark.llm.text import (
        weighted_reservoir_sample,
    )

    rows = [(i, "g", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    out = weighted_reservoir_sample(df, "id", "grp", "w", k=k).collect()
    eligible = {i for i, w in enumerate(weights) if w > 0}
    assert sorted(r.sample_rank for r in out) == list(
        range(1, min(k, len(eligible)) + 1)
    )
    assert {r.id for r in out} <= eligible
    for r in out:
        assert r.weight == min(weights[r.id], 64)
    # ineligible rows are invisible to the draw
    df2 = spark.createDataFrame(
        rows + [(999, "g", 0)], "id long, grp string, w long"
    )
    again = weighted_reservoir_sample(df2, "id", "grp", "w", k=k).collect()
    assert {(r.id, r.sample_rank) for r in again} == {
        (r.id, r.sample_rank) for r in out
    }


@given(texts=st.lists(
    st.text(alphabet="abcdef ", min_size=8, max_size=40),
    min_size=2, max_size=5,
))
@settings(**_SETTINGS)
def test_bbit_estimator_dominance_and_bounds(spark, texts):
    """For ANY pair of documents: b-bit agreement DOMINATES full-width
    agreement (equal 32-bit hashes always have equal low bits), both
    estimates live in their algebraic ranges (full in [0, 1e6]; b=2
    corrected in [-1e6/3, 1e6]), and identical docs saturate both."""
    from peskas_timor_data_pipeline_spark.llm.dedup import (
        bbit_minhash_jaccard,
        minhash_signature,
    )

    docs = [(i, t) for i, t in enumerate(texts)] + [(100, texts[0])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = 8
    sigs = minhash_signature(df, "doc_id", "text", n, 3)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(len(texts)) for b in range(len(texts)) if a < b]
        + [(0, 100)],
        "id_a long, id_b long",
    )
    out = bbit_minhash_jaccard(sigs, pairs, "doc_id", n, b=2).collect()
    got = {(r.id_a, r.id_b): r for r in out}
    for r in out:
        assert r.n_agree_bbit >= r.n_agree_full
        assert 0 <= r.est_full_ppm <= 1_000_000
        assert -333_334 <= r.est_bbit_ppm <= 1_000_000
    twin = got[(0, 100)]  # planted identical doc
    if len(texts[0].strip()) >= 3:
        assert twin.n_agree_full == n
        assert twin.est_full_ppm == 1_000_000 and twin.est_bbit_ppm == 1_000_000


@given(edges=st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=0, max_size=25,
))
@settings(**_SETTINGS)
def test_cluster_safe_split_no_straddle_on_random_graphs(spark, edges):
    """For ANY edge set: every connected component lands in exactly one
    split, all 31 docs are assigned, and canonical ids agree with the
    component labeling."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.llm.cluster import (
        cluster_safe_split,
        connected_components,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(31)], "doc_id long, text string"
    )
    clean = [(a, b) for a, b in edges if a != b]
    if clean:
        comp = connected_components(
            spark.createDataFrame(clean, "id_a long, id_b long")
        )
    else:
        comp = spark.createDataFrame([], "node long, component long")
    out = cluster_safe_split(docs, "doc_id", comp)
    rows = out.collect()
    assert len(rows) == 31
    straddle = (
        out.groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0
    comp_map = {r.node: r.component for r in comp.collect()}
    for r in rows:
        assert r.canonical_id == comp_map.get(r.doc_id, r.doc_id)
