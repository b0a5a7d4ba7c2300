"""Report-feeding summaries (SURVEY §3.4 tail; VERDICT r08 "missing" #3).

The reference renders three ad-hoc reports from validated data
(`inst/report/enumerators_summary.Rmd`, `unanswered_summary.Rmd` via
`generate_form_summary.R`, `data_report.Rmd`); the render itself is out
of engine scope, but the aggregates that FEED them are plain grouped
summaries this module names:

- :func:`enumerator_activity` — submissions / active-days per landing
  site per month over a completed day spine
  (enumerators_summary.Rmd:195-218, the submissions_month table);
- :func:`completeness_by_group` — per-(site, column) answered/missing
  accounting (unanswered_summary.Rmd:74-84, the miss_plots frame, as
  counts rather than a ggplot).

Scale shape: both are single partial-aggregated groupBys over the fact
scan; spine completion and the unpivot run on group-cardinality
dimension frames.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enumerator_activity(
    df: DataFrame,
    site_col: str,
    date_col: str,
    id_col: str,
) -> DataFrame:
    """Monthly survey-activity summary per landing site
    (enumerators_summary.Rmd:195-218): submissions per month, days with
    at least one submission ("working days"), and the site's mean
    active days per month — computed over a COMPLETED day spine (the
    Rmd right-joins a calendar frame, :166-171) so silent days count as
    zeros, not gaps.

    The spine is the distinct observed dates across ALL sites (pinned
    by the data, not the wall clock — the Rmd's ``Sys.Date()`` endpoint
    is not reproducible). Per (site, date) counts are one
    partial-aggregated groupBy over the fact scan; the spine cross and
    everything after run on site x day dimension frames.

    Returns one row per (site, month): (site, month, submissions,
    active_days, mean_active_days) — mean_active_days is the site's
    average over its months, an exact-integer ratio divided once.
    """
    per_day = (
        df.select(
            F.col(site_col).alias("site"),
            F.to_date(F.col(date_col)).alias("d"),
            F.col(id_col).alias("__id__"),
        )
        .groupBy("site", "d")
        .agg(F.count("__id__").alias("n_sub"))
    )
    dates = per_day.select("d").distinct()
    sites = per_day.select("site").distinct()
    spine = sites.crossJoin(dates)
    completed = spine.join(per_day, ["site", "d"], "left").select(
        "site",
        F.trunc(F.col("d"), "month").alias("month"),
        F.coalesce("n_sub", F.lit(0)).alias("n_sub"),
    )
    monthly = completed.groupBy("site", "month").agg(
        F.sum("n_sub").cast("long").alias("submissions"),
        F.sum((F.col("n_sub") > 0).cast("int")).cast("long").alias(
            "active_days"
        ),
    )
    site_tot = monthly.groupBy("site").agg(
        F.sum("active_days").alias("__ad__"),
        F.count(F.lit(1)).alias("__nm__"),
    )
    return monthly.join(F.broadcast(site_tot), "site").select(
        "site",
        "month",
        "submissions",
        "active_days",
        F.round(F.col("__ad__") / F.col("__nm__"), 6).alias(
            "mean_active_days"
        ),
    )


def completeness_by_group(
    df: DataFrame,
    group_col: str,
    cols: Sequence[str],
) -> DataFrame:
    """Per-(group, column) form-completeness accounting
    (unanswered_summary.Rmd:74-84): for each surveyed column, how many
    rows in the group answered it and what fraction is missing — the
    numbers behind the reference's per-site missing-values plot.

    One groupBy over the fact scan computes (rows, n_missing) for every
    column at once; the long (group, column) layout is a stack over the
    group-cardinality wide result, never over data rows.

    Returns (group, column_name, n_rows, n_missing, missing_ppm) —
    missing_ppm an exact integer (n_missing * 1e6 div n_rows).
    """
    cols = list(cols)
    aggs = [F.count(F.lit(1)).cast("long").alias("__n__")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"__m_{c}__")
        )
    wide = df.groupBy(F.col(group_col).alias("group")).agg(*aggs)
    stack = ", ".join(f"'{c}', `__m_{c}__`" for c in cols)
    return wide.select(
        "group",
        F.col("__n__").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_missing)"
        ),
    ).select(
        "group",
        "column_name",
        "n_rows",
        "n_missing",
        F.expr("n_missing * 1000000L div n_rows").alias("missing_ppm"),
    )
