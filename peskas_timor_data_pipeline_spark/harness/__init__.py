"""Correctness harness: named queries + DuckDB oracle twins.

Each module contributes ``QUERIES: dict[name, (spark_fn, oracle_sql|None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` exercises one operator family
from SURVEY.md §2 on the driver's synthetic tables, and the oracle SQL is its
ANSI-SQL twin for DuckDB. Column names/aliases match exactly (the driver
sorts columns by name and hashes values).

Determinism conventions (see SURVEY.md §7.4):
- every double aggregate is rounded; granularity scales with magnitude so
  float summation-order differences cannot flip the rounded value
- ordered firsts/medians use explicit orderings, never input order
- pseudo-random choices use md5-based ordering, identical in both engines
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Registry front-of-line for round 4.  The driver records ~50 CORRECTNESS
# rows per round in registry order; its round-3 window covered exactly the
# first 50 round-3 priority entries.  Front of line now: (a) the 30
# queries the driver has NEVER sampled (round 3's overflow, relative
# order kept), then (b) every query fixed, re-oracled, or added in round
# 4 — the six red rows' fixes (d7/e4-e7 scalarization, ts2's new DTW
# oracle), the new M4b/M6 oracles, e15b's ANN path, v_metadata, the new
# a35/e19/w13/d13/mm11/g1/t27/p17/e20/e21 operators, and m2b/a31 whose
# fixture/oracle changed. 51 oracle-checked entries; the two rows-only
# GLMMs trail (a re-record adds nothing over their standing rows).
_PRIORITY_R04 = (
    # (a) never driver-sampled
    "e16_mrl_recall", "d11_cdc_segments", "j13_grid_neighbor_join",
    "t25_ngram_novelty", "w10_event_transitions", "a29_ab_test",
    "e17_top_eigenvector", "a30_log_histogram_quantiles",
    "mm10_audio_decimate", "t26_freq_spectrum", "w11_rolling_active_users",
    "p15_k_anonymity", "w12_session_paths", "a32_benford",
    "p16_fk_audit", "e18_ivf_cell_stats", "j14_fuzzy_join",
    "a33_time_to_convert", "m10_poisson_bootstrap", "d12_best_representative",
    "a34_bounce_rate", "a26_winsorize", "t20_normalize", "t21_bpe_merges",
    "e13_int8_topk", "e14_rrf_fusion", "e15_hard_negatives",
    "t22_bm25_topk", "t23_bpe_encode",
    # (b) round-4 fixes and additions
    "d7_repeated_grams", "e4_group_centroids", "e5_kmeans_refine",
    "e6_quantize_int8", "e7_pq_encode", "ts2_dtw_alignment",
    "m4b_glmm_1ri", "m6_pmm", "e15b_hard_negatives_ann", "v_metadata",
    "a35_hll", "e19_jl_projection", "w13_ewma", "d13_containment",
    "mm11_channel_stats", "g1_pagerank", "t27_vocab_growth",
    "p17_dataset_fingerprint", "e20_binary_topk", "e21_cell_exemplars", "e22_ivf_probe_sweep",
    "a36_sliding_hll", "w15_ohlc", "w16_interval_union", "t30_source_similarity", "p18_fd_audit", "t31_psi_drift", "m11_theil_sen", "m12_mann_kendall", "a38_gini", "e23_embedding_audit", "d14_bloom_decontaminate", "mm13_audio_clipping", "t36_tokenizer_fertility", "d15_dup_rate_scout",
    "m2b_length_weight_ll", "a31_growth_accounting",
    # rows-only by design (dense-inverse Henderson solve): recorded last
    "m4_glmm", "m4zi_glmm",
)


def registry() -> dict[str, tuple[QueryFn, str | None]]:
    from peskas_timor_data_pipeline_spark.harness import (
        aggregates_q,
        core_relational_q,
        flagship,
        llm_q,
        stats_q,
        validators_q,
        windows_q,
    )

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (flagship, core_relational_q, aggregates_q, windows_q,
                validators_q, stats_q, llm_q):
        for name, entry in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = entry
    missing = [n for n in _PRIORITY_R04 if n not in merged]
    if missing:
        raise ValueError(f"priority list names unknown queries: {missing}")
    out: dict[str, tuple[QueryFn, str | None]] = {}
    for name in _PRIORITY_R04:
        out[name] = merged[name]
    for name in merged:
        if name not in out:
            out[name] = merged[name]
    return out
