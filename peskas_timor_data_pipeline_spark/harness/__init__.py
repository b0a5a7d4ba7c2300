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

# Registry front-of-line for round 7.  The driver records ~50 CORRECTNESS
# rows per round in registry order.  Round 6 sampled 50/50 green (no red
# rows to lead with), so round 7 is (a) the five queries added this round
# — k-core peeling, Neyman allocation, Cohen's kappa, URL canonicalization,
# incremental signature-store dedup — then (b) the freshness rotation:
# every query whose last driver sample is r01 or r02, oldest evidence
# first (the r02 tail that round 6's 50-row window did not reach), topped
# up with the oldest r03 rows to fill the window.
_PRIORITY_R07 = (
    # (a) new in round 7
    "g3_kcore", "a39_neyman_allocation", "a40_cohen_kappa",
    "t42_url_hosts", "d20_store_match", "g4_label_propagation",
    "t43_pmi_collocations", "e26_mutual_knn", "t44_zipf_slope",
    "m14_capture_recapture",
    # (b) stale-evidence rotation: last driver-sampled r01
    "a16_salted_agg", "a18_grouping_rollup", "a19_kmv_distinct",
    "f_math_hash_json",
    # last driver-sampled r02
    "a20_kmv_set_ops", "a21_incremental_rollup", "a22_sampled_quantile",
    "a24_weighted_median", "d3_simhash", "d4_embedding_near_dup",
    "e1_cosine_topk", "e2_lsh_ann",
    "m2_length_weight", "m3_ols_cooks", "m5_impute_replicates",
    "m7_interpolation", "m8_species_resolution", "m9_share_redistribution",
    "mm1_binary_meta",
    "t1_langid", "t2_quality_score", "t3_token_counts", "t4_fingerprint",
    "t5_tfidf", "t6_stratified_sample", "ts1_subsequence_search",
    "v_categorical", "v_combined", "v_dates", "v_duration", "v_imei",
    "v_outlier_fishers", "v_price", "v_price_per_kg", "v_regularity",
    "v_unit_conversion",
    "w1_lead_lag", "w2_top1_per_group", "w3_group_share",
    "w4_spine_completion", "w5_proration", "w7_rolling_range",
    # top-up: oldest r03 rows
    "a25_count_min", "a27_funnel", "a28_retention_cohorts",
)
_PRIORITY_R04 = _PRIORITY_R07  # kept name used by registry()


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
