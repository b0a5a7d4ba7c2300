"""GLMM model-variant estimation pipeline (SURVEY.md §3.3, model path).

The reference keeps TWO estimation paths: the live estimator
(``estimate_pipeline.py`` here) and the model-based variant
``run_models`` (R/model-catch.R:305-411) that the production DAG holds
in reserve (data-pipeline.yaml:242-243). This module composes that
second path from the repo's green operators, exactly as
``estimate_pipeline.py`` composes the first:

- per-region GLMM of monthly landings per boat — glmmTMB
  ``n_landings ~ (1|month)+(1|period)+(1|version)``, poisson for
  Lautem / Gamma elsewhere (model_landings, R/model-catch.R:80-138) —
  via the M4 ``glmm_random_intercepts`` operator;
- zero-inflated poisson GLMMs of landing value and landing weight
  (model_value/model_catch, R/model-catch.R:140-189,270-303);
- a per-taxon catch GLMM where the reference's 13-taxa for-loop
  (model_catch_per_taxa, R/model-catch.R:191-268) becomes ONE grouped
  fit with (region, grouped_taxa) as the group key — the loop
  disappears into the shuffle, the run_models region loop likewise;
- prediction at month x period x version granularity (predict_variable
  / estimate_statistics, R/model-catch.R:408-445): mu = exp(beta0 +
  u_month + u_period + u_version), times (1 - pi) for the
  zero-inflated models;
- the reference's two imputation stages (Amelia m=20 then mice PMM
  m=5, R/model-catch.R:408-516) as the deterministic M5
  mean-replicate and M6 PMM operators;
- fleet scaling ``catch = landing_weight * n_landings_per_boat *
  n_boats`` and ``price_kg`` (R/model-catch.R:488-499), and taxa
  shares re-proportioned onto the aggregate catch
  (model_taxa_porportion, R/model-catch.R:518-559).

Scale shape: model FRAMES are built by partial-aggregated groupBys over
the trip/catch facts (one scan each); the GLMM fits run as
``applyInPandas`` on month x factor model frames per (region[, taxon])
group — thousands of rows per group, never fact-scale; every
prediction join is against dimension-sized fit output (broadcast).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from peskas_timor_data_pipeline_spark.operators.estimate import (
    glmm_random_intercepts,
    impute_mean_replicates,
    impute_pmm_replicates,
)

FACTORS = ["month", "period", "version"]
VERSION_CUTOFF = "2019-05-01"
#: taxa never counted toward the price-per-kg landing set
#: (run_models, R/model-catch.R:333-344)
NON_PK_TAXA = ("MZZ", "IAX", "SWX")


def with_model_factors(
    df: DataFrame, period_col: str = "landing_period"
) -> DataFrame:
    """Add the reference's three random-effect factor columns
    (R/model-catch.R:116-127): calendar ``month`` (seasonality, shared
    across years), ``period`` (year-month — the trend axis) and the
    two-level survey ``version`` split at 2019-05-01."""
    p = F.col(period_col)
    return (
        df.withColumn("month", F.date_format(p, "MM"))
        .withColumn(
            "period",
            F.concat_ws(
                "-", F.year(p).cast("string"), F.month(p).cast("string")
            ),
        )
        .withColumn(
            "version",
            F.when(p <= F.lit(VERSION_CUTOFF).cast("date"), "v1").otherwise(
                "v2"
            ),
        )
    )


def landings_model_frame(
    trips: DataFrame,
    region_col: str = "region",
    imei_col: str = "tracker_imei",
    trip_col: str = "tracker_trip_id",
    date_col: str = "landing_date",
) -> DataFrame:
    """Monthly landings-per-tracker model frame (model_landings,
    R/model-catch.R:80-125): per (region, imei, month) distinct-trip
    counts, completed onto each region's imei x month grid (W4 spine
    completion — ``tidyr::complete``), with each tracker's FIRST and
    LAST months dropped as incomplete (the reference's
    first_trip/last_seen trim)."""
    monthly = (
        trips.withColumn(
            "landing_period", F.trunc(F.to_date(F.col(date_col)), "month")
        )
        .groupBy(
            F.col(region_col).alias("region"),
            F.col(imei_col).alias("imei"),
            "landing_period",
        )
        .agg(F.countDistinct(F.col(trip_col)).alias("n_landings"))
    )
    # per-imei observed window; months strictly inside it survive the trim
    spans = monthly.groupBy("region", "imei").agg(
        F.min("landing_period").alias("first_month"),
        F.max("landing_period").alias("last_month"),
    )
    months = monthly.select("region", "landing_period").distinct()
    grid = spans.join(months, "region").filter(
        (F.col("landing_period") > F.col("first_month"))
        & (F.col("landing_period") < F.col("last_month"))
    )
    frame = grid.join(
        monthly, ["region", "imei", "landing_period"], "left"
    ).select(
        "region",
        "imei",
        "landing_period",
        F.coalesce("n_landings", F.lit(0)).cast("double").alias("n_landings"),
    )
    return with_model_factors(frame)


def catch_model_frame_per_taxa(
    catch: DataFrame,
    taxa_list: Sequence[str],
    region_col: str = "region",
    landing_col: str = "landing_id",
    taxon_col: str = "catch_taxon",
    weight_col: str = "weight",
    date_col: str = "landing_date",
) -> DataFrame:
    """Per-taxon landing-weight model frame (model_catch_per_taxa,
    R/model-catch.R:191-245): taxa outside ``taxa_list`` group to MZZ,
    per (region, taxon, landing, month) kg sums are completed over the
    taxon x observed-landing grid with 0 fill (a taxon ABSENT from a
    landing is a true zero — the zero-inflation mass), taxon '0'
    dropped."""
    taxa = [str(t) for t in taxa_list]
    tagged = (
        catch.withColumn(
            "landing_period", F.trunc(F.to_date(F.col(date_col)), "month")
        )
        .withColumn(
            "grouped_taxa",
            F.when(
                F.col(taxon_col).isin([*taxa, "0"]), F.col(taxon_col)
            ).otherwise("MZZ"),
        )
        .groupBy(
            F.col(region_col).alias("region"),
            F.col("grouped_taxa"),
            F.col(landing_col).alias("landing_id"),
            "landing_period",
        )
        .agg((F.sum(weight_col) / 1000.0).alias("landing_weight"))
    )
    landings = tagged.select(
        "region", "landing_id", "landing_period"
    ).distinct()
    taxa_dim = tagged.select("region", "grouped_taxa").distinct()
    grid = landings.join(taxa_dim, "region")
    frame = (
        grid.join(
            tagged,
            ["region", "grouped_taxa", "landing_id", "landing_period"],
            "left",
        )
        .filter(F.col("grouped_taxa") != "0")
        .select(
            "region",
            "grouped_taxa",
            "landing_id",
            "landing_period",
            F.coalesce("landing_weight", F.lit(0.0)).alias("landing_weight"),
        )
    )
    return with_model_factors(frame)


def fit_indicator_glmm(
    frame: DataFrame,
    keys: Sequence[str],
    y_col: str,
    family: str = "poisson",
    zero_inflated: bool = False,
    **glmm_kwargs,
) -> DataFrame:
    """One grouped GLMM fit with the reference's crossed random-intercept
    structure ``(1|month)+(1|period)+(1|version)`` (every model in
    R/model-catch.R uses exactly this formula)."""
    return glmm_random_intercepts(
        frame,
        keys,
        y_col,
        FACTORS,
        family=family,
        zero_inflated=zero_inflated,
        **glmm_kwargs,
    )


def predict_monthly(
    fits: DataFrame,
    spine: DataFrame,
    keys: Sequence[str],
    out_col: str,
    zero_inflated: bool = False,
) -> DataFrame:
    """GLMM prediction on a month spine (predict_variable,
    R/model-catch.R:413-445): for each spine row,
    ``mu = exp(beta0 + u_month + u_period + u_version)`` from the fit's
    BLUPs, times ``1 - sigmoid(zi linear predictor)`` when the fit is
    zero-inflated — glmmTMB's type="response" conditional expectation.
    A factor level unseen at fit time contributes 0 (the random effect's
    prior mean). All join sides are fit-output dimension frames."""
    keys = list(keys)
    fixed = fits.filter(F.col("kind") == "fixed").select(
        *keys, F.col("estimate").alias("__b0__")
    )
    # left: a spine group with no fit (e.g. a region with no pk landings)
    # keeps its rows with a NULL prediction — the imputation stage's job
    out = spine.join(F.broadcast(fixed), keys, "left")
    for fac in FACTORS:
        blup = fits.filter(
            (F.col("kind") == "blup") & (F.col("term") == fac)
        ).select(
            *keys,
            F.col("level").alias(fac),
            F.col("estimate").alias(f"__u_{fac}__"),
        )
        out = out.join(F.broadcast(blup), [*keys, fac], "left")
    eta = F.col("__b0__")
    for fac in FACTORS:
        eta = eta + F.coalesce(F.col(f"__u_{fac}__"), F.lit(0.0))
    mu = F.exp(eta)
    if zero_inflated:
        zi_fixed = fits.filter(F.col("kind") == "zi_fixed").select(
            *keys, F.col("estimate").alias("__zb0__")
        )
        out = out.join(F.broadcast(zi_fixed), keys, "left")
        for fac in FACTORS:
            zblup = fits.filter(
                (F.col("kind") == "zi_blup") & (F.col("term") == fac)
            ).select(
                *keys,
                F.col("level").alias(fac),
                F.col("estimate").alias(f"__zu_{fac}__"),
            )
            out = out.join(F.broadcast(zblup), [*keys, fac], "left")
        zeta = F.col("__zb0__")
        for fac in FACTORS:
            zeta = zeta + F.coalesce(F.col(f"__zu_{fac}__"), F.lit(0.0))
        mu = mu * (F.lit(1.0) - F.lit(1.0) / (F.lit(1.0) + F.exp(-zeta)))
    pred = out.withColumn(out_col, mu)
    drop = [c for c in pred.columns if c.startswith("__")]
    return pred.drop(*drop)


def _region_spine(frame: DataFrame) -> DataFrame:
    """Distinct (region, landing_period, factors) cells of a model frame
    — the get_frame() prediction spine (R/model-catch.R:447-463)."""
    return frame.select("region", "landing_period", *FACTORS).distinct()


def model_indicators(
    trips: DataFrame,
    catch: DataFrame,
    boats_dim: DataFrame,
    taxa_list: Sequence[str],
    poisson_regions: Sequence[str] = ("Lautem",),
    m_amelia: int = 20,
    m_pmm: int = 5,
    seed: int = 666,
    **glmm_kwargs,
) -> dict[str, DataFrame]:
    """The composed model-based estimation DAG (run_models +
    estimate_statistics + estimates_per_taxa, R/model-catch.R:305-559),
    every region at once — the reference maps run_models over
    municipalities serially; here region is a group key everywhere.

    Inputs: ``trips`` (region, tracker_imei, tracker_trip_id,
    landing_id, landing_date, landing_value), ``catch`` (region,
    landing_id, landing_date, catch_taxon, weight grams), ``boats_dim``
    (region, n_boats), ``taxa_list`` = the reference's modelled taxa.

    Returns ``{"aggregated": region x month indicators (catch, revenue,
    price_kg, n_landings_per_boat, n_boats), "taxa": region x taxon x
    month catch shares re-proportioned onto the aggregate catch}``.
    """
    # --- landings-per-boat model: poisson for the reference's named
    # regions, Gamma elsewhere (model_landings, R/model-catch.R:126-137)
    lf = landings_model_frame(trips)
    pois = [str(r) for r in poisson_regions]
    fits_landings = fit_indicator_glmm(
        lf.filter(F.col("region").isin(pois)),
        ["region"], "n_landings", family="poisson", **glmm_kwargs,
    ).unionByName(
        fit_indicator_glmm(
            lf.filter(~F.col("region").isin(pois)),
            ["region"], "n_landings", family="gamma", **glmm_kwargs,
        )
    )
    # --- landing value models, all landings and the price-per-kg subset
    # (model_value + the pk_ids filter, R/model-catch.R:270-344)
    vf = with_model_factors(
        trips.filter(F.col("landing_value").isNotNull()).withColumn(
            "landing_period", F.trunc(F.to_date("landing_date"), "month")
        )
    )
    fits_value = fit_indicator_glmm(
        vf, ["region"], "landing_value",
        family="poisson", zero_inflated=True, **glmm_kwargs,
    )
    pk_ids = (
        catch.filter(~F.col("catch_taxon").isin(list(NON_PK_TAXA)))
        .select("landing_id")
        .distinct()
    )
    fits_value_pk = fit_indicator_glmm(
        vf.join(pk_ids, "landing_id", "semi"),
        ["region"], "landing_value",
        family="poisson", zero_inflated=True, **glmm_kwargs,
    )
    # --- total landing-weight model (model_catch, R/model-catch.R:140-189)
    cf_all = (
        catch.withColumn(
            "landing_period", F.trunc(F.to_date("landing_date"), "month")
        )
        .groupBy("region", "landing_id", "landing_period")
        .agg((F.sum("weight") / 1000.0).alias("landing_weight"))
    )
    cf_all = with_model_factors(cf_all)
    fits_catch = fit_indicator_glmm(
        cf_all, ["region"], "landing_weight",
        family="poisson", zero_inflated=True, **glmm_kwargs,
    )
    # --- predictions on the shared region x month spine, full-joined
    # into one estimations frame (estimate_statistics, :408-445)
    spine = _region_spine(with_model_factors(
        trips.withColumn(
            "landing_period", F.trunc(F.to_date("landing_date"), "month")
        )
    ))
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    # each prediction joins its fit frame up to 8 times (fixed + 3 BLUP
    # factors, twice for zero-inflated) — pin the applyInPandas output
    # once per model rather than re-fitting per join (the g1/e17 rule)
    fits_landings = materialize(fits_landings)
    fits_value = materialize(fits_value)
    fits_value_pk = materialize(fits_value_pk)
    fits_catch = materialize(fits_catch)
    est = predict_monthly(
        fits_landings, spine, ["region"], "n_landings_per_boat"
    )
    est = predict_monthly(
        fits_value, est, ["region"], "landing_revenue", zero_inflated=True
    )
    est = predict_monthly(
        fits_value_pk, est, ["region"], "landing_revenue_pk",
        zero_inflated=True,
    )
    est = predict_monthly(
        fits_catch, est, ["region"], "landing_weight", zero_inflated=True
    )

    # --- the reference's double imputation collapse: Amelia m=20 mean
    # replicates, plausibility thresholds -> NULL, then mice PMM m=5
    # (R/model-catch.R:408-516). Values enter PMM integer-scaled (cents /
    # month index), the M6 engine-exactness contract.
    for c in ("n_landings_per_boat", "landing_revenue",
              "landing_revenue_pk", "landing_weight"):
        est = impute_mean_replicates(
            est, ["region"], "landing_period", c, m=m_amelia, seed=seed
        ).withColumnRenamed("is_imputed", f"__imp_{c}__")
    est = (
        est.withColumn(
            "is_imputed",
            F.col("__imp_landing_weight__"),
        )
        .withColumn(
            "landing_weight",
            F.when(F.col("landing_weight") >= 0.25, F.col("landing_weight")),
        )
        .withColumn(
            "landing_revenue",
            F.when(F.col("landing_revenue") >= 1.0, F.col("landing_revenue")),
        )
        .withColumn(
            "landing_revenue_pk",
            F.when(
                F.col("landing_revenue_pk") >= 1.0,
                F.col("landing_revenue_pk"),
            ),
        )
    )
    est = est.drop(*[c for c in est.columns if c.startswith("__imp_")])
    est = est.withColumnRenamed("is_imputed", "__amelia_imp__").withColumn(
        "__month_idx__",
        (F.year("landing_period") * 12 + F.month("landing_period")).cast(
            "long"
        ),
    )
    for c in ("landing_weight", "landing_revenue", "landing_revenue_pk"):
        est = est.withColumn(
            "__cents__", F.round(F.col(c) * 100).cast("long")
        ).drop(c)
        est = impute_pmm_replicates(
            est, ["region"], "landing_period", "__month_idx__", "__cents__",
            m=m_pmm, seed=seed,
        )
        # PMM stamps its own is_imputed; the reference carries the
        # Amelia-stage missMatrix flag through instead
        est = (
            est.withColumn(c, F.col("__cents__") / 100.0)
            .drop("__cents__", "is_imputed")
        )
    est = est.drop("__month_idx__").withColumnRenamed(
        "__amelia_imp__", "is_imputed"
    )

    # --- fleet scaling (R/model-catch.R:488-499)
    aggregated = (
        est.join(F.broadcast(boats_dim), "region", "left")
        .withColumn(
            "catch",
            F.col("landing_weight")
            * F.col("n_landings_per_boat")
            * F.col("n_boats"),
        )
        .withColumn(
            "revenue",
            F.col("landing_revenue")
            * F.col("n_landings_per_boat")
            * F.col("n_boats"),
        )
        .withColumn(
            "revenue_pk",
            F.col("landing_revenue_pk")
            * F.col("n_landings_per_boat")
            * F.col("n_boats"),
        )
        .withColumn(
            "price_kg",
            F.when(
                F.col("catch") > 0, F.col("revenue_pk") / F.col("catch")
            ),
        )
        .drop("landing_revenue_pk", "revenue_pk")
    )

    # --- per-taxon models: the 13-taxa loop as ONE grouped fit with
    # (region, grouped_taxa) keys (model_catch_per_taxa, :191-268), then
    # shares re-proportioned onto the aggregate catch
    # (model_taxa_porportion, :518-559)
    tf = catch_model_frame_per_taxa(catch, taxa_list)
    fits_taxa = materialize(fit_indicator_glmm(
        tf, ["region", "grouped_taxa"], "landing_weight",
        family="poisson", zero_inflated=True, **glmm_kwargs,
    ))
    taxa_spine = _region_spine(tf).join(
        tf.select("region", "grouped_taxa").distinct(), "region"
    )
    taxa_pred = predict_monthly(
        fits_taxa, taxa_spine, ["region", "grouped_taxa"], "taxon_weight",
        zero_inflated=True,
    )
    w_share = Window.partitionBy("region", "landing_period")
    taxa_share = taxa_pred.withColumn(
        "taxon_share",
        F.when(
            F.sum("taxon_weight").over(w_share) > 0,
            F.col("taxon_weight") / F.sum("taxon_weight").over(w_share),
        ),
    )
    taxa = taxa_share.join(
        aggregated.select("region", "landing_period", "catch"),
        ["region", "landing_period"],
    ).withColumn("taxon_catch", F.col("taxon_share") * F.col("catch"))

    return {"aggregated": aggregated, "taxa": taxa}
