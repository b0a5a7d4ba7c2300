"""Empty-frame edges: every core operator must return a well-typed empty
(or correctly-shaped) result on empty input rather than erroring — at
lake scale an empty partition, an empty incremental batch, or a filter
that matches nothing is the common case, not the exception."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_empty_frames_through_core_operators(spark):
    from peskas_timor_data_pipeline_spark.llm.dedup import exact_dedup
    from peskas_timor_data_pipeline_spark.llm.text import chunk_documents
    from peskas_timor_data_pipeline_spark.operators.joins import (
        asof_join,
        interval_join,
        scd2_intervals,
    )
    from peskas_timor_data_pipeline_spark.operators.outliers import loc_scale_bounds
    from peskas_timor_data_pipeline_spark.operators.restructure import nest, unnest

    docs = _empty(spark, "doc_id long, text string")
    assert chunk_documents(docs, "doc_id", "text").count() == 0
    assert exact_dedup(docs, "doc_id", ["text"]).count() == 0

    ev = _empty(spark, "k int, ts timestamp, v double")
    # empty left, empty right
    assert asof_join(ev, ev.select("k", "ts"), ["k"], "ts", []).count() == 0
    # non-empty left, empty right: left rows survive with null match
    one = spark.createDataFrame([(1,)], "k int").select(
        "k", F.timestamp_seconds(F.lit(100)).alias("ts"), F.lit(1.0).alias("v")
    )
    res = asof_join(one, ev.select("k", "ts", "v").withColumnRenamed("v", "rv"),
                    ["k"], "ts", ["rv"]).collect()
    assert len(res) == 1 and res[0].rv is None
    assert interval_join(
        ev, _empty(spark, "k int, s timestamp, e timestamp"), ["k"], "ts", "s", "e"
    ).count() == 0
    assert scd2_intervals(_empty(spark, "k int, ts timestamp, cid int"),
                          ["k"], "ts", "cid").count() == 0

    vals = _empty(spark, "g int, v double")
    bounds = loc_scale_bounds(vals, "v", keys=["g"])
    assert bounds.count() == 0

    flat = _empty(spark, "k int, a int, b int")
    nested = nest(flat, ["k"], "items", order_by=["a"])
    assert nested.count() == 0
    assert unnest(nested, "items").count() == 0


def test_empty_group_split_and_sampling(spark):
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        deterministic_sample_n,
    )

    df = _empty(spark, "g int, v int")
    assert deterministic_sample_n(df, ["g"], n=1).count() == 0


def test_empty_frames_through_round3_operators(spark):
    """The round-3 additions must also survive empty (and degenerate)
    inputs: empty corpus for segment dedup / quality buckets / CMS /
    snapshot diff, empty query set for MMR and recall, and a text with no
    spaces (single segment) for segment dedup."""
    from peskas_timor_data_pipeline_spark.llm.dedup import segment_dedup
    from peskas_timor_data_pipeline_spark.llm.similarity import (
        mmr_topk,
        topk_recall,
    )
    from peskas_timor_data_pipeline_spark.llm.text import quality_buckets
    from peskas_timor_data_pipeline_spark.operators.restructure import snapshot_diff
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    docs = _empty(spark, "doc_id long, text string, source string")
    assert segment_dedup(docs, "doc_id", "text").count() == 0
    assert quality_buckets(docs, "doc_id", "text", "source").count() == 0
    toks = _empty(spark, "tok string")
    sketch = cms_sketch(toks, "tok")
    assert sketch.count() == 0
    probe = spark.createDataFrame([("x",)], "tok string")
    assert cms_estimate(probe, sketch, "tok").collect()[0].est_c == 0

    kv = _empty(spark, "k long, v string")
    assert snapshot_diff(kv, kv, ["k"]).count() == 0
    one = spark.createDataFrame([(1, "a")], "k long, v string")
    assert snapshot_diff(kv, one, ["k"]).collect()[0].change == "added"
    assert snapshot_diff(one, kv, ["k"]).collect()[0].change == "removed"

    emb = _empty(spark, "vec_id long, embedding array<float>")
    some = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert mmr_topk(emb, some, "vec_id", "embedding", k=2, pool=3, dim=2).count() == 0
    assert topk_recall(
        _empty(spark, "query_id long, cand_id long"),
        _empty(spark, "query_id long, cand_id long"),
    ).count() == 0

    # no-space text: one single segment, kept
    single = spark.createDataFrame([(1, "lonelyword")], "doc_id long, text string")
    r = segment_dedup(single, "doc_id", "text").collect()[0]
    assert (r.n_segs, r.n_kept, r.rebuilt) == (1, 1, "lonelyword")


def test_empty_frames_through_round3b_operators(spark):
    """Empty and single-row degenerates through this round's additions:
    nothing throws, shapes stay sane."""
    from peskas_timor_data_pipeline_spark.llm.dedup import cdc_segments, lsh_eval
    from peskas_timor_data_pipeline_spark.llm.text import bm25_topk, dsir_select
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        funnel,
        retention_cohorts,
    )
    from peskas_timor_data_pipeline_spark.operators.joins import grid_neighbor_join
    from peskas_timor_data_pipeline_spark.operators.restructure import profile_columns
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        cusum_changepoint,
    )
    from peskas_timor_data_pipeline_spark.operators.windows import rolling_slope

    docs = _empty(spark, "doc_id long, text string")
    assert bm25_topk(docs, "doc_id", "text", [(1, ["x"])], k=3).count() == 0
    assert cdc_segments(docs, "doc_id", "text").count() == 0
    row = lsh_eval(docs, "doc_id", "text").collect()[0]
    assert (row.n_truth, row.n_candidates, row.true_positives) == (0, 0, 0)
    assert row.precision is None and row.recall is None

    tgt = _empty(spark, "doc_id long, text string, tgt boolean")
    assert dsir_select(tgt, "doc_id", "text", "tgt", k=5).count() == 0

    ev = _empty(spark, "user_id long, ts timestamp, event_type string")
    steps = funnel(ev, "user_id", "ts", "event_type", ["a", "b"]).collect()
    assert [r.n_users for r in sorted(steps, key=lambda r: r.step)] == [0, 0]
    assert retention_cohorts(ev, "user_id", "ts").count() == 0

    pts = _empty(spark, "id long, x double, y double")
    assert grid_neighbor_join(pts, "id", "x", "y", 1.0).count() == 0
    lone = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    assert grid_neighbor_join(lone, "id", "x", "y", 1.0).count() == 0

    kv = _empty(spark, "k long, v double")
    prof = {r.column_name: r for r in profile_columns(kv).collect()}
    assert prof["k"].n_rows == 0 and prof["k"].n_distinct == 0
    assert prof["v"].min_value is None

    series = _empty(spark, "g string, day date, v long")
    assert cusum_changepoint(series, "g", "day", "v").count() == 0
    xseries = _empty(spark, "g string, x long, v long")
    assert rolling_slope(xseries, "g", "x", "v").count() == 0
    one = spark.createDataFrame(
        [("g", 1, 5)], "g string, day long, v long"
    )
    cp = cusum_changepoint(one, "g", "day", "v").collect()[0]
    assert cp.n_points == 1 and cp.cusum_stat == 0.0 and cp.detected is False
    assert cp.mean_after is None and cp.shift is None


def test_round4_operators_on_empty_and_degenerate_inputs(spark):
    """Every round-4 operator must return an empty (or well-defined)
    result on empty input instead of raising — ANSI mode turns unguarded
    divisions into runtime errors, and several ops take eager actions
    (counts, checkpoints) that see the empty frame first."""
    from pyspark.sql import functions as F  # noqa: F401

    from peskas_timor_data_pipeline_spark.llm.dedup import containment_pairs
    from peskas_timor_data_pipeline_spark.llm.similarity import (
        binary_topk_rerank,
        cell_exemplars,
        jl_project,
    )
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        impute_pmm_replicates,
    )
    from peskas_timor_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from peskas_timor_data_pipeline_spark.operators.restructure import (
        dataset_fingerprint,
    )
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        dtw_to_pattern_expr,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(empty_docs, "doc_id", "text").count() == 0

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert jl_project(empty_vecs, "vec_id", "embedding", dim=4, k=2).count() == 0
    assert cell_exemplars(empty_vecs, "vec_id", "embedding", dim=4, n_cells=4).count() == 0
    assert binary_topk_rerank(
        empty_vecs, empty_vecs, "vec_id", "embedding", dim=4, method="scan"
    ).count() == 0

    empty_series = spark.createDataFrame([], "k string, ord string, x int, v int")
    assert impute_pmm_replicates(empty_series, ["k"], "ord", "x", "v").count() == 0

    empty_events = spark.createDataFrame([], "g string, u long")
    regs = hll_sketch(empty_events, ["g"], "u")
    assert regs.count() == 0
    assert hll_estimate(regs, ["g"]).count() == 0

    empty_edges = spark.createDataFrame([], "s string, d string, w long")
    assert pagerank_fixed_point(empty_edges, "s", "d", "w", n_iter=2).count() == 0

    empty_ts = spark.createDataFrame([], "u long, i long, v double")
    assert dtw_to_pattern_expr(
        empty_ts, ["u"], ["i"], "v", [1.0, 2.0], band=2
    ).count() == 0

    # fingerprint of an EMPTY table is still one row per column (all-zero
    # state) — that is the fingerprint of emptiness, not an error
    fp = {r.column_name: r for r in dataset_fingerprint(empty_docs).collect()}
    assert fp["text"].n_rows == 0 and fp["text"].n_null == 0


def test_empty_frames_through_round7_operators(spark):
    from peskas_timor_data_pipeline_spark.llm.dedup import (
        match_signature_store, minhash_signature,
    )
    from peskas_timor_data_pipeline_spark.llm.similarity import mutual_knn
    from peskas_timor_data_pipeline_spark.llm.text import (
        extract_canonical_urls, pmi_collocations, zipf_slope,
    )
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        chapman_estimate, cohen_kappa, neyman_allocation,
    )
    from peskas_timor_data_pipeline_spark.operators.graph import (
        k_core, label_propagation,
    )

    edges = _empty(spark, "src int, dst int")
    assert k_core(edges, "src", "dst", k=2).count() == 0
    assert label_propagation(edges, "src", "dst").count() == 0

    docs = _empty(spark, "doc_id long, text string")
    assert extract_canonical_urls(docs, "doc_id", "text").count() == 0
    assert pmi_collocations(docs, "doc_id", "text").count() == 0
    # zipf over nothing: no points, NULL fit rather than a crash
    z = zipf_slope(docs, "text").collect()
    assert len(z) == 1 and z[0].n_points == 0 and z[0].slope is None

    strata = _empty(spark, "s string, m long")
    assert neyman_allocation(strata, ["s"], "m", 100).count() == 0
    # kappa over nothing: the contingency is empty -> no rows (callers
    # treat an absent verdict as "nothing to agree on")
    assert cohen_kappa(strata, "s", "m").count() in (0, 1)

    keys = _empty(spark, "k long")
    row = chapman_estimate(keys, keys, "k").collect()[0]
    assert (row.n1, row.n2, row.m) == (0, 0, 0)
    assert row.n_hat == 0  # (0+1)(0+1)//(0+1) - 1

    emb = _empty(spark, "vec_id long, embedding array<double>")
    assert mutual_knn(emb, "vec_id", "embedding", k=1, dim=4).count() == 0

    # empty batch against a real store / real batch against an empty store
    store = spark.createDataFrame(
        [(1, "stored body text " * 4)], "doc_id long, text string"
    )
    ssig = minhash_signature(store, "doc_id", "text", 16, 5)
    bsig_empty = minhash_signature(docs, "doc_id", "text", 16, 5)
    assert match_signature_store(bsig_empty, ssig, "doc_id", 16, 8, 12).count() == 0
    assert match_signature_store(ssig, bsig_empty, "doc_id", 16, 8, 12).count() == 0
