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

# Registry front-of-line for round 10.  The driver records ~50 CORRECTNESS
# rows per round in registry order.  Order (verdict r09 asks #2/#3):
# (a) rp3/rp4 — NEW this round (data_report.Rmd composition + dispersion
#     frames), sampled immediately so no evidence gap opens,
# (b) the 20 queries whose driver evidence still dates to r04 (oldest in
#     the r01-r09 union ledger), alphabetical,
# (c) top-up from the r05 evidence tail (47 queries), alphabetical —
#     ~28 fit in the ~50-row window; the rest lead r11.
_PRIORITY_R10 = (
    # (a) new in r10 (data_report.Rmd aggregate twins — VERDICT r09 #3;
    #     rp5/rp6 extend the same closure to the treemap and nutrient
    #     frames, Rmd:1281-1299 / :1440-1449)
    "rp3_catch_composition", "rp4_period_dispersion",
    "rp5_category_share", "rp6_nutrient_density",
    # (b) oldest evidence (last driver-sampled r04), alphabetical
    "j14_fuzzy_join", "m10_poisson_bootstrap", "m6_pmm",
    "mm10_audio_decimate", "mm11_channel_stats", "p15_k_anonymity",
    "p16_fk_audit", "p17_dataset_fingerprint", "t20_normalize",
    "t21_bpe_merges", "t22_bm25_topk", "t23_bpe_encode",
    "t25_ngram_novelty", "t26_freq_spectrum", "t27_vocab_growth",
    "ts2_dtw_alignment", "v_metadata", "w10_event_transitions",
    "w11_rolling_active_users", "w13_ewma",
    # (c) r05 evidence tail, alphabetical (overflow rolls into r11)
    "a17_tumbling_window", "a23_session_window", "a31_growth_accounting",
    "a33_time_to_convert", "a34_bounce_rate", "a36_sliding_hll",
    "a38_gini", "a6_sessionization", "d14_bloom_decontaminate",
    "d15_dup_rate_scout", "d16_repeated_span_mask", "d17_band_planner",
    "d1_exact_dedup", "d2_minhash_lsh_jaccard", "d2b_lsh_skew_capped",
    "d5_dup_clusters", "d5b_dup_clusters_star", "e22_ivf_probe_sweep",
    "e24_ivfpq_topk", "e24b_ivfpq_refine", "e25_mrl_funnel", "e3_ivf_ann",
    "g2_triangle_count", "j10_asof_join", "j10b_asof_forward",
    "j10c_asof_nearest_tolerance", "j11_interval_join",
    "j12_scd2_temporal", "m11_theil_sen", "m12_mann_kendall",
    "m13_bh_fdr", "m2b_length_weight_ll", "m4b_glmm_1ri",
    "mm13_audio_clipping", "p18_fd_audit", "p7b_fish_groups",
    "t30_source_similarity", "t31_psi_drift", "t36_tokenizer_fertility",
    "t37_repetition_signals", "t38_kneser_ney_logprob",
    "t39_temperature_mixture", "t40_source_diversity",
    "w12_session_paths", "w15_ohlc", "w16_interval_union",
    "w6_downsample",
)
_PRIORITY_R04 = _PRIORITY_R10  # kept name used by registry()


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
