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

# Registry front-of-line for round 5.  The driver records ~50 CORRECTNESS
# rows per round in registry order.  Front of line: (a) round 4's two red
# rows, now fixed (d7's ASCII-normalized shingles; e22's memory-shaped
# oracle), (b) the queries the driver has NEVER sampled — round 4's
# overflow plus everything added in round 5 (fish-group recode, d7
# checksum twin, LSH skew-cap, repetition signals, triangle count, span
# masking, star CC, Kneser-Ney, temperature mixture, IVFPQ, MRL funnel,
# band planner, BH FDR, source diversity), then (c) every query whose
# engine or oracle changed in round 5 — the TIMESTAMP_NTZ output class
# (asof joins, SCD2, session window, downsample, tumbling window,
# sessionization, interval join/union, OHLC, time-to-convert,
# bounce-rate, session-paths) and the window-form m4b GLMM oracle.
# Oracle-checked entries lead; the two rows-only GLMMs trail (they are
# pinned by frozen-fixture hashes in pytest instead).
_PRIORITY_R05 = (
    # (a) round-4 red rows, fixed this round
    "d7_repeated_grams", "e22_ivf_probe_sweep",
    # (b) never driver-sampled
    "a36_sliding_hll", "w15_ohlc", "w16_interval_union",
    "t30_source_similarity", "p18_fd_audit", "t31_psi_drift",
    "m11_theil_sen", "m12_mann_kendall", "a38_gini",
    "e23_embedding_audit", "d14_bloom_decontaminate", "mm13_audio_clipping",
    "t36_tokenizer_fertility", "d15_dup_rate_scout", "a31_growth_accounting",
    "p7b_fish_groups", "d7b_gram_checksum", "d2b_lsh_skew_capped",
    "t37_repetition_signals", "g2_triangle_count", "d16_repeated_span_mask",
    "d5b_dup_clusters_star", "t38_kneser_ney_logprob", "t39_temperature_mixture",
    "e24_ivfpq_topk", "e25_mrl_funnel", "d17_band_planner", "m13_bh_fdr",
    "t40_source_diversity", "e24b_ivfpq_refine",
    # (c) engine or oracle changed in round 5
    "m4b_glmm_1ri", "j10_asof_join", "j10b_asof_forward",
    "j10c_asof_nearest_tolerance", "j12_scd2_temporal",
    "a23_session_window", "w6_downsample", "a17_tumbling_window",
    "a6_sessionization", "j11_interval_join", "a33_time_to_convert",
    "a34_bounce_rate", "w12_session_paths",
    "d2_minhash_lsh_jaccard", "m2b_length_weight_ll",
    # high-value standing coverage to round out the ~50-row window
    "d1_exact_dedup", "d5_dup_clusters", "e3_ivf_ann", "e8_pq_adc_topk",
    "e11_semdedup", "t1_langid", "t22_bm25_topk", "m6_pmm",
    "v_combined", "v_metadata", "g1_pagerank", "a35_hll",
    "p1_pattern_projection", "j5_one_to_one_day_match",
    "w4_spine_completion", "m9_share_redistribution",
    # rows-only by design (dense-inverse Henderson solve, frozen-fixture
    # pinned in tests/test_glmm_frozen_fixture.py): recorded last
    "m4_glmm", "m4zi_glmm",
)
_PRIORITY_R04 = _PRIORITY_R05  # kept name used by registry()


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
