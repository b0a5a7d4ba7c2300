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
  counts rather than a ggplot);
- :func:`catch_composition` — per-(region, taxa) catch totals completed
  over the full region x taxa grid with per-region percentage shares
  (data_report.Rmd:1067-1078, the municipal catch-composition stacked
  bars; the year x taxa variant at :813-820 is the same shape);
- :func:`period_dispersion` — per-period median / sd / se / t-CI of a
  landing-level value (data_report.Rmd:357-368, the revenue and CPUE
  time-series frames with their qt()-based confidence ribbon);
- :func:`category_share` — per-(dim, category) landing counts with
  per-category percentage shares (data_report.Rmd:1281-1299, the
  habitat/gear/catch-use treemap frames);
- :func:`habitat_nutrient_density` — per-(habitat, nutrient) median
  individuals-per-kg density (data_report.Rmd:1440-1449).

Scale shape: all are single partial-aggregated groupBys over the fact
scan; spine/grid completion and the unpivot run on group-cardinality
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


def catch_composition(
    df: DataFrame,
    region_col: str,
    taxa_col: str,
    catch_col: str,
) -> DataFrame:
    """Per-region catch composition with percentage shares
    (data_report.Rmd:1067-1078): sum catch per (region, taxa), complete
    the region x taxa grid with zeros (tidyr::complete with
    fill = list(catch = 0)), compute each region's total and every
    taxa's percent share of it — the frame behind the reference's
    municipal catch-composition stacked-bar chart. The annual variant
    at :813-820 (year x grouped_taxa + complete) is the same shape with
    year as the region axis.

    One partial-aggregated groupBy over the fact scan; the grid
    completion, per-region totals, and the percent division all run on
    group-cardinality frames (regions x taxa), broadcast-joined.

    Returns (region, taxa, catch, total_catch, percent_catch) — catch
    summed as-is, percent rounded to 6 so float division cannot flip a
    digit between engines when catch values are integer-scaled.
    """
    agg = (
        df.select(
            F.col(region_col).alias("region"),
            F.col(taxa_col).alias("taxa"),
            F.col(catch_col).alias("__c__"),
        )
        .groupBy("region", "taxa")
        .agg(F.sum("__c__").alias("catch"))
    )
    grid = agg.select("region").distinct().crossJoin(
        F.broadcast(agg.select("taxa").distinct())
    )
    completed = grid.join(agg, ["region", "taxa"], "left").select(
        "region", "taxa", F.coalesce("catch", F.lit(0)).alias("catch")
    )
    totals = completed.groupBy("region").agg(
        F.sum("catch").alias("total_catch")
    )
    return completed.join(F.broadcast(totals), "region").select(
        "region",
        "taxa",
        "catch",
        "total_catch",
        F.round(F.col("catch") / F.col("total_catch") * 100.0, 6).alias(
            "percent_catch"
        ),
    )


# qt(0.975, dof) for dof 1..7, where the Cornish-Fisher expansion is poor
# (dof=1: ~9.7 vs the true 12.706). Closed forms for dof 1 (tan(0.475*pi))
# and 2 (0.95*sqrt(2/(4*0.975*0.025))), cross-checked to 1e-13 against an
# exact-tail Simpson quadrature of the t pdf; dof 3..7 from the quadrature
# (abs error <= 1e-9). Oracles import THIS table so literals never diverge.
QT975_SMALL_DOF = {
    1: 12.706204736174696,
    2: 4.302652729749464,
    3: 3.1824463052837135,
    4: 2.7764451051977783,
    5: 2.57058183563632,
    6: 2.4469118511449777,
    7: 2.364624251592777,
}


def period_dispersion(df: DataFrame, period_col: str, value_col: str) -> DataFrame:
    """Per-period dispersion frame behind the reference's revenue/CPUE
    time series (data_report.Rmd:357-368): median, sample sd, n,
    se = sd/sqrt(n) and the qt(0.975, n-1)-scaled confidence interval
    (`ic = se * qt((1 - 0.05) / 2 + .5, n - 1)`).

    Determinism (SURVEY §7.4): the sd uses the exact sum-of-squares
    identity sqrt((sum(x^2) - sum(x)^2/n)/(n-1)) — exact when callers
    feed integer-scaled values (both engines sum identical integers),
    unlike builtin stddev_samp whose central-moment accumulation is
    partition-order dependent. The t quantile matches R's qt: exact
    precomputed values for dof = n-1 in 1..7 (where the series expansion
    is poor — Cornish-Fisher at dof=1 gives ~9.7 vs the true 12.706,
    ADVICE r10; the lookup values are verified to <=1e-9 by closed
    forms for dof 1-2 and exact-tail quadrature for 3-7), and the
    Cornish-Fisher expansion around z = 1.959963984540054 for dof >= 8
    (<1e-4 absolute error there). Byte-identical between engines
    because both evaluate the same literals/polynomial.

    One partial-aggregated groupBy over the landing-level input.
    Returns (period, med, sd, n, se, ic); sd/se/ic null when n < 2.
    """
    z = 1.959963984540054
    g1 = (z**3 + z) / 4.0
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96.0
    g3 = (3 * z**7 + 19 * z**5 + 17 * z**3 - 15 * z) / 384.0
    g = (
        df.select(
            F.col(period_col).alias("period"),
            F.col(value_col).alias("__v__"),
        )
        .filter(F.col("__v__").isNotNull())
        .groupBy("period")
        .agg(
            F.median("__v__").alias("__med__"),
            F.sum("__v__").alias("__s__"),
            F.sum(F.col("__v__") * F.col("__v__")).alias("__ss__"),
            F.count("__v__").cast("long").alias("n"),
        )
    )
    nn = F.col("n").cast("double")
    var = (F.col("__ss__") - F.col("__s__") * F.col("__s__") / nn) / (nn - 1)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    dof = nn - 1
    tq_cf = (
        F.lit(z)
        + F.lit(g1) / dof
        + F.lit(g2) / (dof * dof)
        + F.lit(g3) / (dof * dof * dof)
    )
    tq = None
    for d, val in QT975_SMALL_DOF.items():
        cond = F.col("n") == F.lit(d + 1)
        tq = F.when(cond, F.lit(val)) if tq is None else tq.when(cond, F.lit(val))
    tq = tq.otherwise(tq_cf)
    se = sd / F.sqrt(nn)
    guard = F.col("n") >= 2
    return g.select(
        "period",
        F.round("__med__", 6).alias("med"),
        F.when(guard, F.round(sd, 6)).alias("sd"),
        "n",
        F.when(guard, F.round(se, 6)).alias("se"),
        F.when(guard, F.round(se * tq, 6)).alias("ic"),
    )


def category_share(
    df: DataFrame,
    dim_col: str,
    category_col: str,
) -> DataFrame:
    """Per-(dim, category) landing counts with the share of each
    category's total (data_report.Rmd:1281-1299, the "Gear used" treemap
    frame; :1244-1247 "Habitat exploited" and :1318-1321 "Catch use" are
    the same shape with a different dim): count landings per (dim,
    category), total per category, share = round(n / n_tot * 100, 2) —
    the Rmd's exact mutate. Null dim/category rows are dropped
    (na.omit), like the reference.

    One partial-aggregated groupBy over the landing-level input; the
    category totals and the share division run on group-cardinality
    frames, broadcast-joined. Integer count ratios divided once, so the
    rounding is engine-stable.

    Returns (dim, category, n, n_tot, pct).
    """
    counts = (
        df.filter(
            F.col(dim_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .select(
            F.col(dim_col).alias("dim"), F.col(category_col).alias("category")
        )
        .groupBy("dim", "category")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = counts.groupBy("category").agg(
        F.sum("n").cast("long").alias("n_tot")
    )
    return counts.join(F.broadcast(totals), "category").select(
        "dim",
        "category",
        "n",
        "n_tot",
        F.round(F.col("n") / F.col("n_tot") * 100.0, 2).alias("pct"),
    )


def habitat_nutrient_density(
    df: DataFrame,
    habitat_col: str,
    catch_col: str,
    nutrient_cols: Sequence[str],
    conv_factors: dict[str, float],
) -> DataFrame:
    """Median per-kg nutrient density per habitat
    (data_report.Rmd:1440-1449): unpivot the per-landing nutrient mass
    columns to long, normalize by catch (value / catch), convert to
    individuals-per-kg via the RDI conversion factor
    (value * 1000 / conv_factor), then per (habitat, nutrient) the
    median, divided by 10 and rescaled x100 exactly as the Rmd does.

    The per-row arithmetic chain is identical IEEE ops in both engines;
    only the median (interpolated, same rule in Spark and DuckDB) runs
    per group — one partial shuffle of landing-level rows, the unpivot
    is a stack over the row, never a join.

    Returns (habitat, nutrient, inds_kg) with inds_kg rounded to 6.
    """
    cols = list(nutrient_cols)
    stack = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = df.select(
        F.col(habitat_col).alias("habitat"),
        F.col(catch_col).alias("__catch__"),
        F.expr(f"stack({len(cols)}, {stack}) AS (nutrient, __value__)"),
    ).filter(F.col("__catch__").isNotNull() & (F.col("__catch__") != 0))
    conv = F.create_map(
        *[x for c in cols for x in (F.lit(c), F.lit(float(conv_factors[c])))]
    )
    inds = long.select(
        "habitat",
        "nutrient",
        (
            (F.col("__value__") / F.col("__catch__")) * 1000.0
            / conv[F.col("nutrient")]
        ).alias("__inds__"),
    )
    return inds.groupBy("habitat", "nutrient").agg(
        F.round(F.median("__inds__") / 10.0 * 100.0, 6).alias("inds_kg")
    )
