"""Round-9 semantics fixes (ADVICE r08): chi-square structural zeros,
rank-stat NULL deletion, GLM key dtypes, classification_report f1=0,
retention_cohorts lineage cut."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_chi_square_structural_zero_cell(spark):
    """An unobserved (a, b) combination must contribute (0-E)^2/E = E to
    the table statistic and appear as an obs=0 grid row (ADVICE r08: the
    pre-r09 operator summed observed cells only, understating chi2)."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        chi_square_independence,
    )

    # 2x2 with (r2, c2) never observed: margins 20/10 x 20/10, n=30
    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 10 + [("r2", "c1")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square_independence(df, "a", "b").collect()
    assert len(out) == 4  # full grid, not the 3 observed cells
    cell = {(r["a"], r["b"]): r for r in out}
    zero = cell[("r2", "c2")]
    assert zero["obs"] == 0
    assert zero["expected"] == pytest.approx(10 * 10 / 30, abs=1e-6)
    # exact chi2: 0.8333.. + 1.6666.. + 1.6666.. + 3.3333.. = 7.5
    assert out[0]["chi2_micro"] / 1e6 == pytest.approx(7.5, abs=4e-6)
    assert out[0]["dof"] == 1


def test_rank_stats_ignore_null_values(spark):
    """NULL values must be pairwise-deleted (ADVICE r08): a NULL bin
    would enter the cumulative window where Spark orders NULLS FIRST but
    DuckDB NULLS LAST — and pollute n_a/n_b."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        kruskal_wallis,
        ks_two_sample,
        mann_whitney_u,
        roc_auc,
    )

    base = [("a", 0.1), ("a", 0.4), ("a", 0.9), ("b", 0.2), ("b", 0.8)]
    clean = spark.createDataFrame(base, "g string, v double")
    dirty = spark.createDataFrame(
        base + [("a", None), ("b", None)], "g string, v double"
    )
    for fn in (
        lambda d: ks_two_sample(d, "g", "v", "a", "b"),
        lambda d: mann_whitney_u(d, "g", "v", "a", "b"),
        lambda d: kruskal_wallis(d, "g", "v"),
    ):
        assert fn(dirty).collect() == fn(clean).collect()

    lab = [(1, 0.9), (1, 0.7), (0, 0.3), (0, 0.1)]
    c = spark.createDataFrame(lab, "y int, s double")
    d = spark.createDataFrame(lab + [(1, None)], "y int, s double")
    assert roc_auc(d, "y", "s").collect() == roc_auc(c, "y", "s").collect()


def test_glm_keys_keep_input_dtype(spark):
    """Integer group keys must come back as integers, not strings
    (ADVICE r08): the applyInPandas schema is derived from the input
    frame, the dtw_to_pattern convention."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        glmm_random_intercepts,
        poisson_glm_per_group,
    )

    rows = [
        (m, g, float(x), float(2 + x + 3 * (g % 2)))
        for m in (1, 2)
        for g in range(4)
        for x in range(6)
    ]
    df = spark.createDataFrame(rows, "month int, grp int, x double, y double")
    fit = poisson_glm_per_group(df, ["month"], "y", ["x"], max_iter=5)
    assert dict(fit.dtypes)["month"] == "int"
    assert {r["month"] for r in fit.select("month").distinct().collect()} == {1, 2}

    df2 = df.withColumn("f", (F.col("grp") % 2).cast("string"))
    glmm = glmm_random_intercepts(df2, ["month"], "y", ["f"], max_iter=3)
    assert dict(glmm.dtypes)["month"] == "int"


def test_classification_report_all_wrong_class_f1_zero(spark):
    """tp=0 with both predictions and support present: precision=0,
    recall=0, and f1 must be 0.0 (sklearn convention) — not NULL
    (ADVICE r08). NULL stays only where a ratio is undefined."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        classification_report,
    )

    rows = (
        [("a", "a")] * 4
        + [("d", "a")] * 2   # d: all wrong (fn=2)
        + [("a", "d")] * 3   # d also predicted wrongly (fp=3)
    )
    df = spark.createDataFrame(rows, "t string, p string")
    out = {r["label"]: r for r in classification_report(df, "t", "p").collect()}
    d = out["d"]
    assert (d["support"], d["tp"], d["fp"], d["fn"]) == (2, 0, 3, 2)
    assert d["precision"] == 0.0 and d["recall"] == 0.0
    assert d["f1"] == 0.0  # defined and zero, not NULL


def test_retention_cohorts_single_cell_agg(spark):
    """The cohort-cell aggregation is materialized before sizes derive
    from it (ADVICE r08): values unchanged, one event-scan lineage."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        retention_cohorts,
    )

    rows = [
        ("u1", "2024-01-01"), ("u1", "2024-01-08"),
        ("u2", "2024-01-02"), ("u2", "2024-01-16"),
        ("u3", "2024-01-09"),
    ]
    df = spark.createDataFrame(rows, "u string, ts string")
    out = {
        (r["cohort_week"], r["week_offset"]): r
        for r in retention_cohorts(df, "u", "ts").collect()
    }
    assert out[(0, 0)]["n_cohort"] == 2
    assert out[(0, 1)]["n_active"] == 1
    assert out[(0, 2)]["retention"] == pytest.approx(0.5)
    assert out[(1, 0)]["n_cohort"] == 1


def test_enumerator_activity_spine_and_means(spark):
    """Silent days count as zero-activity spine rows; mean active days
    is the site's average over months (enumerators_summary.Rmd:195-218)."""
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        enumerator_activity,
    )

    rows = [
        ("siteA", "2024-01-01", 1), ("siteA", "2024-01-01", 2),
        ("siteA", "2024-01-03", 3),
        ("siteA", "2024-02-05", 4),
        ("siteB", "2024-02-05", 5),  # siteB silent all of January
    ]
    df = spark.createDataFrame(rows, "site string, d string, id int")
    out = {
        (r.site, r.month.month): r
        for r in enumerator_activity(df, "site", "d", "id").collect()
    }
    a_jan = out[("siteA", 1)]
    assert a_jan.submissions == 3 and a_jan.active_days == 2
    # siteA: jan 2 days + feb 1 day -> mean 1.5
    assert a_jan.mean_active_days == 1.5
    # siteB january exists via the spine, all zeros
    b_jan = out[("siteB", 1)]
    assert b_jan.submissions == 0 and b_jan.active_days == 0


def test_completeness_by_group_counts(spark):
    from peskas_timor_data_pipeline_spark.pipeline.report import (
        completeness_by_group,
    )

    rows = [
        ("g1", 1.0, "u"), ("g1", None, "u"), ("g1", None, None),
        ("g2", 2.0, "v"),
    ]
    df = spark.createDataFrame(rows, "g string, v double, u string")
    out = {
        (r.group, r.column_name): r
        for r in completeness_by_group(df, "g", ["v", "u"]).collect()
    }
    assert out[("g1", "v")].n_missing == 2
    assert out[("g1", "v")].missing_ppm == 666666
    assert out[("g1", "u")].n_missing == 1
    assert out[("g2", "v")].n_missing == 0
    assert out[("g2", "v")].n_rows == 1


def test_period_dispersion_small_dof_exact_t_quantile(spark):
    """For n-1 <= 7 the ic ribbon must use the exact qt(0.975, dof)
    lookup, not the Cornish-Fisher expansion (ADVICE r10: at dof=1 the
    expansion gives ~9.7 vs the true 12.706 — a 25% ribbon error on
    short periods). Checks every lookup dof plus the first expansion dof."""
    import math

    from peskas_timor_data_pipeline_spark.pipeline.report import (
        QT975_SMALL_DOF,
        period_dispersion,
    )

    # period "pK" has K+1 values 0, 10, 20, ... -> n = K+1, sd/se exact
    rows = [(f"p{n}", float(10 * i)) for n in range(2, 10) for i in range(n)]
    df = spark.createDataFrame(rows, "period string, v double")
    out = {r.period: r for r in period_dispersion(df, "period", "v").collect()}
    z = 1.959963984540054
    g1 = (z**3 + z) / 4.0
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96.0
    g3 = (3 * z**7 + 19 * z**5 + 17 * z**3 - 15 * z) / 384.0
    for n in range(2, 10):
        vals = [10.0 * i for i in range(n)]
        mean = sum(vals) / n
        sd = math.sqrt(sum((x - mean) ** 2 for x in vals) / (n - 1))
        se = sd / math.sqrt(n)
        dof = n - 1
        tq = QT975_SMALL_DOF.get(
            dof, z + g1 / dof + g2 / dof**2 + g3 / dof**3
        )
        assert abs(out[f"p{n}"].ic - round(se * tq, 6)) < 1e-9, n
    # dof=1 sanity: the exact value, nowhere near the expansion's ~9.7
    two = spark.createDataFrame([("q", 0.0), ("q", 10.0)], "period string, v double")
    r = period_dispersion(two, "period", "v").collect()[0]
    se = (10.0 / math.sqrt(2)) / math.sqrt(2)  # sd=7.0710678, se=5.0
    assert abs(r.ic - round(se * 12.706204736174696, 6)) < 1e-9
