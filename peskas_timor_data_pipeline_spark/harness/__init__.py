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

# Queries that already have a driver-verified green row in
# CORRECTNESS_r01.json (the round-1 driver recorded exactly the first 50
# registry entries in order).  Round 2 puts everything ELSE first so the
# driver's per-run budget covers the queries that still lack a recorded
# verification; these 50 keep their relative order at the tail.
_DRIVER_VERIFIED_R01 = frozenset({
    "flagship_cpue", "p2_filter_project", "p3_semi_join", "p4_anti_join",
    "p6_coalesce_columns", "p7_case_when_recode", "p9_type_casts",
    "p10_replicate_rows", "p11_sample_deterministic", "p12_distinct_except",
    "j1_left_join_dims", "j3_right_join_spine", "j4_full_outer_coalesce",
    "j5_one_to_one_day_match", "j6_reduce_join_unite",
    "j8_complete_crossfill", "j9_suffix_match_join", "o1_sort_topn",
    "o2_union_by_name", "o4_set_ops", "f_string_functions",
    "f_date_functions", "f_math_hash_json", "p1_pattern_projection",
    "p5_mutate_across", "j2_inner_join", "j7_join_nested", "j10_asof_join",
    "j11_interval_join", "j12_scd2_temporal", "a1_groupby_stats",
    "a2_summarise_across", "a3_add_count", "a4_conditional_agg",
    "a5_mode_per_group", "a6_sessionization", "a7_grid_binning",
    "a8_mad_bounds_grouped", "a9_mad_alert_global", "a10_quantile_group",
    "a11_pivot_wider", "a11_pivot_longer", "a12_two_level_nest",
    "a13_rollup_two_level", "a14_time_binned_multisource",
    "a15_metric_unpivot", "a16_salted_agg", "a17_tumbling_window",
    "a18_grouping_rollup", "a19_kmv_distinct",
})


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
    out: dict[str, tuple[QueryFn, str | None]] = {}
    for name in merged:
        if name not in _DRIVER_VERIFIED_R01:
            out[name] = merged[name]
    for name in merged:
        if name in _DRIVER_VERIFIED_R01:
            out[name] = merged[name]
    return out
