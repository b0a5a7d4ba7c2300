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

# Registry front-of-line for round 9.  The driver records ~50 CORRECTNESS
# rows per round in registry order.  Order (verdict r08 asks #1/#2):
# (a) e8_pq_adc_topk FIRST — the one red row in the r08 ledger (oracle
#     OOM in the driver's tighter DuckDB; the oracle is now the
#     single-join long-form ADC, proven at --duckdb-mem 50MB),
# (b) the 24 round-8 queries that have never been driver-sampled,
# (c) top-up from the oldest evidence tail (last sampled r04),
#     alphabetical — 25 fit in the ~50-row window; the rest lead r10.
_PRIORITY_R09 = (
    # (a) driver-red in r08
    "e8_pq_adc_topk",
    # (a') new in r09 (report-feeding summaries — closes VERDICT r08
    # "missing" #3; sampled immediately so no evidence gap opens)
    "rp1_enumerator_activity", "rp2_form_completeness",
    # (b) never driver-sampled (added late r08)
    "a41_assoc_rules", "g6_link_prediction", "g7_tree_closure",
    "m17_mann_whitney", "m18_chi_square", "ts5_acf", "w17_attribution",
    "t46_readability", "e27_pca_top2",
    "m19_kruskal_wallis", "m20_spearman", "ts6_holt_linear",
    "e28_pca_project", "g8_hits", "a42_decayed_agg", "e29_ivf_cell_split",
    "m21_classification_report", "m22_roc_auc", "m23_calibration_ece",
    "t47_good_turing", "m24_power_analysis", "m25_brown_forsythe",
    "m26_kaplan_meier", "a43_rfm_segments",
    # (c) oldest evidence (last driver-sampled r04), alphabetical
    "a29_ab_test", "a30_log_histogram_quantiles", "a32_benford",
    "a35_hll", "d11_cdc_segments", "d12_best_representative",
    "d13_containment", "e13_int8_topk", "e14_rrf_fusion",
    "e15_hard_negatives", "e15b_hard_negatives_ann", "e16_mrl_recall",
    "e17_top_eigenvector", "e18_ivf_cell_stats", "e19_jl_projection",
    "e20_binary_topk", "e21_cell_exemplars", "e4_group_centroids",
    "e5_kmeans_refine", "e6_quantize_int8", "e7_pq_encode",
    "g1_pagerank", "j13_grid_neighbor_join", "j14_fuzzy_join",
    "m10_poisson_bootstrap",
    # remaining r04 tail (past the expected window; rolls into r10)
    "m6_pmm", "mm10_audio_decimate", "mm11_channel_stats",
    "p15_k_anonymity", "p16_fk_audit", "p17_dataset_fingerprint",
    "t20_normalize", "t21_bpe_merges", "t22_bm25_topk", "t23_bpe_encode",
    "t25_ngram_novelty", "t26_freq_spectrum", "t27_vocab_growth",
    "ts2_dtw_alignment", "v_metadata", "w10_event_transitions",
    "w11_rolling_active_users", "w13_ewma",
)
_PRIORITY_R04 = _PRIORITY_R09  # kept name used by registry()


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
