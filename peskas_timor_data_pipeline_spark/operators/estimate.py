"""Estimation operators (SURVEY.md §3.3, M4-M9, A13).

The reference's DAG runs `estimate_fishery_indicators` — weighted group
means per (region, month) with spine completion and imputation
(R/estimate-catch.R:24-60; NOT the GLMM variant, which exists as
`model_indicators` but is off the live path, data-pipeline.yaml:242-243).

Spark shape: the monthly aggregates are tiny (regions x months), so the
statistical steps run as `applyInPandas` over driver-sized groups AFTER the
big distributed aggregation — never per-row. The Poisson GLM here is a
self-contained IRLS on numpy (no statsmodels in the container), provided
for the GLMM-analogue path (M4).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def redistribute_shares(
    df: DataFrame,
    keys: Sequence[str],
    share_value: str,
    total_value: str,
    out_col: str = "redistributed",
) -> DataFrame:
    """Taxa-proportion redistribution (M9, R/estimate-catch.R:583-613):
    per-group share = value/sum(value)*100, re-applied to a group total."""
    w = Window.partitionBy(*keys)
    share = F.col(share_value) / F.sum(share_value).over(w) * 100.0
    return df.withColumn("share_pct", share).withColumn(
        out_col, F.col(total_value) * F.col("share_pct") / 100.0
    )


def glm_per_group(
    df: DataFrame,
    keys: Sequence[str],
    y_col: str,
    x_cols: Sequence[str],
    family: str = "poisson",
    max_iter: int = 25,
    tol: float = 1e-10,
) -> DataFrame:
    """Per-group GLM (log link) via IRLS on numpy — the GLMM analogue
    (M4) as `applyInPandas` at group granularity (groups are
    months x regions — driver-sized).

    Families mirror the reference's glmmTMB calls: ``poisson`` for landing
    counts (R/model-catch.R:80-138) and ``gamma`` for strictly-positive
    catch/value models (R/model-catch.R:140-189). Under the log link the
    IRLS weights are w=mu (poisson) and w=1 (gamma, constant dispersion);
    both use z = eta + (y-mu)/mu.

    Returns (keys..., term, coef, n_obs) — deterministic (log-link
    least-squares start, fixed iteration cap/tolerance, no sampling)."""
    import numpy as np

    if family not in ("poisson", "gamma"):
        raise ValueError(f"unsupported family: {family}")
    x_cols = list(x_cols)
    out_fields = ", ".join(f"{k} string" for k in keys)
    schema = f"{out_fields}, term string, coef double, n_obs long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.column_stack([np.ones(len(pdf))] + [pdf[c].to_numpy(float) for c in x_cols])
        y = pdf[y_col].to_numpy(float)
        # glm.fit-style start: eta0 = log(y + 0.1); a zero start diverges
        # under the log link whenever y spans orders of magnitude
        eta0 = np.log(np.maximum(y, 0.0) + 0.1)
        beta = np.linalg.lstsq(X, eta0, rcond=None)[0]
        for _ in range(max_iter):
            eta = X @ beta
            mu = np.exp(np.clip(eta, -30, 30))
            W = mu if family == "poisson" else np.ones_like(mu)
            z = eta + (y - mu) / np.maximum(mu, 1e-12)
            XtW = X.T * W
            try:
                new = np.linalg.solve(XtW @ X, XtW @ z)
            except np.linalg.LinAlgError:
                break
            if np.max(np.abs(new - beta)) < tol:
                beta = new
                break
            beta = new
        terms = ["intercept"] + x_cols
        out = pd.DataFrame({"term": terms, "coef": beta, "n_obs": len(pdf)})
        for k in keys:
            out[k] = str(pdf[k].iloc[0])
        return out[[*keys, "term", "coef", "n_obs"]]

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def poisson_glm_per_group(
    df: DataFrame,
    keys: Sequence[str],
    y_col: str,
    x_cols: Sequence[str],
    max_iter: int = 25,
    tol: float = 1e-10,
) -> DataFrame:
    """Poisson specialization of :func:`glm_per_group` (kept as the named
    entry point the harness/m4 query uses)."""
    return glm_per_group(
        df, keys, y_col, x_cols, family="poisson", max_iter=max_iter, tol=tol
    )


def impute_mean_replicates(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    m: int = 5,
    seed: int = 666,
    noise_sd_frac: float = 0.1,
) -> DataFrame:
    """Multiple-imputation analogue (M5/M6, Amelia m=40 / mice m=5 with
    set.seed(666), R/estimate-catch.R:176-199): per series, missing values
    are filled with the series mean plus seeded gaussian noise, averaged
    over m replicates. Runs as applyInPandas over month-granularity groups;
    seeded per-group so results are partition-stable."""
    import numpy as np

    schema_fields = df.select(*keys, order_col).schema.fields
    key_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_fields)
    schema = f"{key_schema}, {value_col} double, is_imputed boolean"

    def impute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        vals = pdf[value_col].to_numpy(float)
        missing = pd.isna(vals)
        base = np.nanmean(vals) if (~missing).any() else 0.0
        sd = np.nanstd(vals) if (~missing).sum() > 1 else 0.0
        import hashlib

        key_repr = "\x1f".join(str(pdf[k].iloc[0]) for k in keys)
        digest = int(hashlib.md5(key_repr.encode()).hexdigest()[:8], 16)
        group_seed = (seed + digest) % (2**31)  # process-stable, unlike hash()
        rng = np.random.RandomState(group_seed)
        draws = base + rng.normal(0.0, noise_sd_frac * sd, size=(m, int(missing.sum())))
        filled = vals.copy()
        filled[missing] = draws.mean(axis=0)
        out = pdf[[*keys, order_col]].copy()
        out[value_col] = filled
        out["is_imputed"] = missing
        return out

    return df.groupBy(*keys).applyInPandas(impute, schema=schema)
