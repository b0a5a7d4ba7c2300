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

# Registry front-of-line for round 6.  The driver records ~50 CORRECTNESS
# rows per round in registry order.  Front of line: (a) round 5's two red
# rows, now root-caused and fixed — d7's oracle had the repo's single
# HUGEINT output column (sum(CASE..) uncast; pandas/arrow degrades HUGEINT
# to float64 so the driver's value hash saw "5.0" vs "5" while fetchall
# locally saw int vs int), e23 hashed an order-dependent rounded float avg,
# now an exact power-of-two comparison ladder with integer-only outputs —
# plus their diagnostic twins (d7b re-confirms alongside, d7c is new and
# localizes any residual shared-count divergence); (b) the re-split
# oracle-checked crossed GLMMs (the last rows-only entries, retired this
# round); (c) the freshness rotation VERDICT r05 asked for: ≥20 rows whose
# last driver sample was r01–r02 (the p/j/a/o/f/w/v/m §2 families), oldest
# evidence first, so driver verdicts don't go stale while local sweeps
# drift.
_PRIORITY_R06 = (
    # (a) round-5 red rows, fixed this round, + twins
    "d7_repeated_grams", "e23_embedding_audit",
    "d7c_shared_checksum", "d7b_gram_checksum",
    # (b) crossed GLMMs, re-split into oracle-checked form this round,
    # + queries added in round 6
    "m4_glmm", "m4zi_glmm", "t41_weighted_reservoir", "d18_bbit_minhash",
    "d19_cluster_safe_split",
    # (c) stale-evidence rotation: last driver-sampled r01–r02
    "flagship_cpue",
    "p1_pattern_projection", "p2_filter_project", "p3_semi_join",
    "p4_anti_join", "p5_mutate_across", "p6_coalesce_columns",
    "p7_case_when_recode", "p9_type_casts", "p10_replicate_rows",
    "p11_sample_deterministic", "p12_distinct_except",
    "j1_left_join_dims", "j2_inner_join", "j3_right_join_spine",
    "j4_full_outer_coalesce", "j5_one_to_one_day_match",
    "j6_reduce_join_unite", "j7_join_nested", "j8_complete_crossfill",
    "j9_suffix_match_join",
    "a1_groupby_stats", "a2_summarise_across", "a3_add_count",
    "a4_conditional_agg", "a5_mode_per_group", "a7_grid_binning",
    "a8_mad_bounds_grouped", "a9_mad_alert_global", "a10_quantile_group",
    "a11_pivot_longer", "a11_pivot_wider", "a12_two_level_nest",
    "a13_rollup_two_level", "a14_time_binned_multisource",
    "a15_metric_unpivot",
    "o1_sort_topn", "o2_union_by_name", "o4_set_ops",
    "f_string_functions", "f_date_functions", "f_math_hash_json",
    "w1_lead_lag", "w2_top1_per_group", "w3_group_share", "w5_proration",
    "v_imei", "v_dates", "v_outlier_fishers",
    "m2_length_weight", "m3_ols_cooks", "m5_impute_replicates",
    "m7_interpolation", "m8_species_resolution",
)
_PRIORITY_R04 = _PRIORITY_R06  # kept name used by registry()


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
