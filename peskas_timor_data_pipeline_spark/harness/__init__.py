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

# Registry front-of-line for round 8.  The driver records ~50 CORRECTNESS
# rows per round in registry order.  Round 7 sampled 50/50 green (no red
# rows to lead with), so round 8 is (a) the queries added this round,
# then (b) the full stale-evidence tail: both r02 leftovers and EVERY
# query whose last driver sample is r03 (verdict r07 ask #2 — after this
# window no query's evidence predates r04), then (c) the oldest r04 rows
# as top-up.
_PRIORITY_R08 = (
    # (a) new in round 8
    "d20b_store_match_banded", "d21_winnow_fingerprints", "m15_ks_drift",
    "t45_js_divergence", "g5_ktruss", "m16_isotonic_calibration",
    # (b) last driver-sampled r02
    "w5_proration", "w7_rolling_range",
    # last driver-sampled r03 (complete set, alphabetical)
    "a25_count_min", "a27_funnel", "a28_retention_cohorts",
    "d10_lsh_eval", "d6_decontaminate", "d8_cross_source_overlap",
    "d9_segment_dedup", "e10_ann_recall", "e11_semdedup", "e12_mmr_topk",
    "e8_pq_adc_topk", "e9_silhouette", "m4_poisson_glm",
    "mm2_resize_plumbing", "mm3_image_decode", "mm4_audio_decode",
    "mm5_video_frame_sample", "mm6_phash_neardup", "mm7_silence_runs",
    "mm8_image_resize", "mm9_scene_cuts",
    "p13_snapshot_diff", "p14_profile_columns",
    "t10_heavy_hitters", "t11_shuffle_shards", "t12_chunking",
    "t13_quality_gate", "t14_group_split", "t15_unigram_logprob",
    "t16_pack_sequences", "t17_mixture_sample", "t18_bigram_logprob",
    "t19_quality_buckets", "t24_dsir_select",
    "t7_redact", "t8_weighted_sample", "t9_repetition",
    "ts3_seasonal_decompose", "ts4_cusum_changepoint",
    "w8_cumulative_distinct", "w9_rolling_slope",
    # (c) top-up: oldest r04 rows
    "a26_winsorize", "a29_ab_test", "a30_log_histogram_quantiles",
    # (d) new in round 8, batches 2-5 — past the 50-row sample window by
    # design (verdict r07 ask #2 reserves this round's sample for the
    # stale tail); these lead the r09 sample. Each passed all six
    # selfcheck axes at its commit (see DRIVERSIM_r08.log tail).
    "a41_assoc_rules", "g6_link_prediction", "g7_tree_closure",
    "m17_mann_whitney", "m18_chi_square", "ts5_acf", "w17_attribution",
    "t46_readability", "e27_pca_top2",
    "m19_kruskal_wallis", "m20_spearman", "ts6_holt_linear",
    "e28_pca_project", "g8_hits", "a42_decayed_agg", "e29_ivf_cell_split",
    "m21_classification_report", "m22_roc_auc", "m23_calibration_ece",
    "t47_good_turing", "m24_power_analysis", "m25_brown_forsythe",
    "m26_kaplan_meier", "a43_rfm_segments",
)
_PRIORITY_R04 = _PRIORITY_R08  # kept name used by registry()


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
