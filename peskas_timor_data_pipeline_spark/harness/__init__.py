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

# Registry front-of-line for round 3.  The driver records ~50 CORRECTNESS
# rows per round in registry order; rounds 1+2 covered 100 of 123 queries
# (zero overlap).  The 23 from round 2 still lacking a driver row go
# FIRST, followed by w8_cumulative_distinct (round 2's only red row —
# re-check after the BIGINT cast fix), the m4 family (m4_poisson_glm
# gained a recursive-CTE oracle), and then every query ADDED in round 3
# in authorship order — all driver-unverified, so the ~50-row window
# always lands on unverified queries; the overflow leads round 4.
_PRIORITY_R03 = (
    "d5_dup_clusters", "d6_decontaminate", "d7_repeated_grams",
    "e3_ivf_ann", "e4_group_centroids", "e5_kmeans_refine",
    "e6_quantize_int8", "e7_pq_encode", "e8_pq_adc_topk",
    "t7_redact", "t8_weighted_sample", "t9_repetition",
    "t10_heavy_hitters", "t11_shuffle_shards", "t12_chunking",
    "t13_quality_gate", "t14_group_split", "t15_unigram_logprob",
    "t16_pack_sequences", "mm2_resize_plumbing", "mm3_image_decode",
    "mm4_audio_decode", "mm5_video_frame_sample",
    "w8_cumulative_distinct",
    "m4_poisson_glm", "m4_glmm", "m4zi_glmm",
    # new in round 3 — no driver rows yet, keep inside the ~50-row window
    "mm6_phash_neardup", "t17_mixture_sample", "t18_bigram_logprob",
    "d8_cross_source_overlap", "e9_silhouette",
    "d9_segment_dedup", "t19_quality_buckets", "e10_ann_recall",
    "e11_semdedup", "mm7_silence_runs", "e12_mmr_topk",
    "a25_count_min", "p13_snapshot_diff", "ts3_seasonal_decompose", "ts4_cusum_changepoint", "p14_profile_columns", "w9_rolling_slope", "d10_lsh_eval", "t24_dsir_select", "mm8_image_resize", "mm9_scene_cuts", "a27_funnel", "a28_retention_cohorts", "e16_mrl_recall", "d11_cdc_segments", "j13_grid_neighbor_join", "t25_ngram_novelty", "w10_event_transitions", "a29_ab_test", "e17_top_eigenvector", "a30_log_histogram_quantiles", "mm10_audio_decimate", "t26_freq_spectrum", "w11_rolling_active_users", "p15_k_anonymity", "a31_growth_accounting", "w12_session_paths", "a32_benford", "p16_fk_audit", "e18_ivf_cell_stats", "j14_fuzzy_join", "a33_time_to_convert", "m10_poisson_bootstrap", "d12_best_representative", "a34_bounce_rate",
    "a26_winsorize", "t20_normalize", "t21_bpe_merges", "e13_int8_topk",
    "e14_rrf_fusion", "e15_hard_negatives", "t22_bm25_topk", "t23_bpe_encode",
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
    missing = [n for n in _PRIORITY_R03 if n not in merged]
    if missing:
        raise ValueError(f"priority list names unknown queries: {missing}")
    out: dict[str, tuple[QueryFn, str | None]] = {}
    for name in _PRIORITY_R03:
        out[name] = merged[name]
    for name in merged:
        if name not in out:
            out[name] = merged[name]
    return out
