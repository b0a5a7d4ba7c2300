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
    # key schema derived from the input frame (ADVICE r08): hardcoding
    # string silently re-typed integer month/region keys, breaking joins
    # back to the typed source frame (the dtw_to_pattern convention)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
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
            out[k] = pdf[k].iloc[0]
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


def glmm_random_intercepts(
    df: DataFrame,
    keys: Sequence[str],
    y_col: str,
    factor_cols: Sequence[str],
    family: str = "poisson",
    max_iter: int = 200,
    tol: float = 1e-8,
    zero_inflated: bool = False,
    zi_outer_iter: int = 40,
    zi_inner_iter: int = 25,
    zi_tol: float = 1e-7,
) -> DataFrame:
    """Per-group GLMM with crossed random intercepts — the Spark analogue of
    the reference's ``glmmTMB(n_landings ~ (1|month) + (1|period) +
    (1|version), family=poisson|Gamma)`` (M4, R/model-catch.R:80-138), and,
    with ``zero_inflated=True``, of the catch models' ``ziformula =
    ~ (1|month) + (1|period) + (1|version)`` (:166-189).

    Estimation is PQL (penalized quasi-likelihood): IRLS on the link-scale
    working response where each step solves Henderson's mixed-model
    equations — a ridge-penalized weighted least squares with one penalty
    ``1/sigma_f^2`` per random factor — and variance components update by
    the EM step ``sigma_f^2 <- (||u_f||^2 + tr(C_ff)) / q_f`` (posterior
    mean square plus posterior-covariance trace). Deterministic: no
    sampling, fixed start, fixed tolerances. glmmTMB integrates the same
    likelihood by Laplace approximation; PQL agrees closely when counts
    aren't tiny and is the standard big-data fallback.

    Zero inflation (poisson only) runs an outer EM: the E step splits each
    observed zero into structural-vs-sampling responsibility ``zhat = pi /
    (pi + (1-pi) exp(-mu))``; the M step refits the count model with prior
    weights ``1 - zhat`` and a Bernoulli-logit GLMM (same random-intercept
    structure, fractional working response) for the zero process.

    Runs as ``applyInPandas`` at group granularity — groups are
    municipality-sized model frames (months x devices), never row-scale;
    the heavy lifting upstream (the per-trip aggregation that BUILDS the
    model frame) stays distributed.

    Returns one long frame per group:
      kind='fixed',    term='intercept', level=NULL, estimate=beta0
      kind='variance', term=<factor>,    level=NULL, estimate=sigma_f^2
      kind='blup',     term=<factor>,    level=<lvl>, estimate=u_f,lvl
    plus, when zero-inflated, the same three kinds prefixed ``zi_`` for the
    logit zero model.
    """
    import numpy as np

    if family not in ("poisson", "gamma"):
        raise ValueError(f"unsupported family: {family}")
    if zero_inflated and family != "poisson":
        raise ValueError("zero_inflated requires family='poisson'")
    factor_cols = list(factor_cols)
    # key schema derived from the input frame (ADVICE r08): hardcoding
    # string silently re-typed integer month/region keys, breaking joins
    # back to the typed source frame (the dtw_to_pattern convention)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    schema = (
        f"{out_fields}, kind string, term string, level string, "
        "estimate double, n_obs long"
    )

    def pql(C, qs, y, fam, weights, sol, sigma2, iters):
        """Penalized IRLS + EM variance updates; returns (sol, sigma2)."""
        for _ in range(iters):
            eta = np.clip(C @ sol, -30, 30)
            if fam == "binomial":
                mu = 1.0 / (1.0 + np.exp(-eta))
                V = np.maximum(mu * (1.0 - mu), 1e-8)
                W, z = V, eta + (y - mu) / V
            else:
                mu = np.exp(eta)
                W = mu if fam == "poisson" else np.ones_like(mu)
                z = eta + (y - mu) / np.maximum(mu, 1e-12)
            W = W * weights
            A = (C.T * W) @ C
            pen = np.concatenate(
                [[0.0]] + [np.full(q, 1.0 / s2) for q, s2 in zip(qs, sigma2)]
            )
            A[np.diag_indices_from(A)] += pen
            try:
                Ainv = np.linalg.inv(A)
            except np.linalg.LinAlgError:
                break
            new_sol = Ainv @ ((C.T * W) @ z)
            new_sigma2 = sigma2.copy()
            off = 1
            for i, q in enumerate(qs):
                blk = slice(off, off + q)
                u_f = new_sol[blk]
                new_sigma2[i] = max(
                    (u_f @ u_f + np.trace(Ainv[blk, blk])) / q, 1e-8
                )
                off += q
            delta = max(
                np.max(np.abs(new_sol - sol)), np.max(np.abs(new_sigma2 - sigma2))
            )
            sol, sigma2 = new_sol, new_sigma2
            if delta < tol:
                break
        return sol, sigma2

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([*factor_cols]).reset_index(drop=True)
        y = pdf[y_col].to_numpy(float)
        n = len(y)
        blocks, qs = [], []
        for fcol in factor_cols:
            levels = sorted(pdf[fcol].astype(str).unique())
            idx = pdf[fcol].astype(str).map({l: j for j, l in enumerate(levels)})
            Zf = np.zeros((n, len(levels)))
            Zf[np.arange(n), idx.to_numpy()] = 1.0
            blocks.append((fcol, levels, Zf))
            qs.append(len(levels))
        C = np.column_stack([np.ones(n)] + [b[2] for b in blocks])
        q_total = sum(qs)
        sol = np.zeros(1 + q_total)
        sol[0] = np.log(np.maximum(y.mean(), 1e-8))
        sigma2 = np.ones(len(qs))
        rows: list[tuple] = []
        if not zero_inflated:
            sol, sigma2 = pql(C, qs, y, family, np.ones(n), sol, sigma2, max_iter)
        else:
            zi_sol = np.zeros(1 + q_total)
            zi_sol[0] = -1.0
            zi_sigma2 = np.ones(len(qs))
            zhat = np.where(y == 0, 0.5, 0.0)
            for _ in range(zi_outer_iter):  # outer EM
                sol, sigma2 = pql(
                    C, qs, y, family, 1.0 - zhat, sol, sigma2, zi_inner_iter
                )
                zi_sol, zi_sigma2 = pql(
                    C, qs, zhat, "binomial", np.ones(n), zi_sol, zi_sigma2,
                    zi_inner_iter,
                )
                mu = np.exp(np.clip(C @ sol, -30, 30))
                pi = 1.0 / (1.0 + np.exp(-np.clip(C @ zi_sol, -30, 30)))
                new_zhat = np.where(
                    y == 0, pi / np.maximum(pi + (1 - pi) * np.exp(-mu), 1e-12), 0.0
                )
                if np.max(np.abs(new_zhat - zhat)) < zi_tol:
                    zhat = new_zhat
                    break
                zhat = new_zhat
            rows.append(("zi_fixed", "intercept", None, float(zi_sol[0])))
            off = 1
            for (fcol, levels, _), q, s2 in zip(blocks, qs, zi_sigma2):
                rows.append(("zi_variance", fcol, None, float(s2)))
                rows.extend(
                    ("zi_blup", fcol, lvl, float(zi_sol[off + j]))
                    for j, lvl in enumerate(levels)
                )
                off += q
        rows.insert(0, ("fixed", "intercept", None, float(sol[0])))
        off = 1
        for (fcol, levels, _), q, s2 in zip(blocks, qs, sigma2):
            rows.append(("variance", fcol, None, float(s2)))
            rows.extend(
                ("blup", fcol, lvl, float(sol[off + j]))
                for j, lvl in enumerate(levels)
            )
            off += q
        out = pd.DataFrame(rows, columns=["kind", "term", "level", "estimate"])
        out["n_obs"] = n
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, "kind", "term", "level", "estimate", "n_obs"]]

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


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
    set.seed(666), R/estimate-catch.R:176-199): per series, each missing
    value is filled with the series mean plus the average of ``m``
    replicate perturbations drawn uniformly from
    ``±noise_sd_frac * sd(series)``.

    Redefinition vs the reference (sanctioned, SURVEY §2.8): Amelia's
    bootstrap-EM posterior draws become DETERMINISTIC md5-derived draws —
    replicate ``r``'s perturbation for a row is a pure function of
    ``(seed, keys, order_col, r)`` — so the result is reproducible on any
    engine and ORACLE-CHECKABLE (DuckDB recomputes identical draws), which
    seeded RNG state never is. Pure column expressions: window stats +
    higher-order array functions, no Python, no shuffle beyond the window.

    Returns the input columns with ``value_col`` filled and ``is_imputed``
    added."""
    w = Window.partitionBy(*keys)
    base = F.coalesce(F.avg(value_col).over(w), F.lit(0.0))
    sd = F.coalesce(F.stddev_pop(value_col).over(w), F.lit(0.0))
    draw_key = F.concat_ws(
        "\x1f",
        F.lit(str(seed)),
        *[F.col(k).cast("string") for k in keys],
        F.col(order_col).cast("string"),
    )
    # mean over m replicates of uniform(-0.5, 0.5): the first 12 hex chars
    # of md5(key#r) as a 48-bit integer, scaled by 2^-48
    noise_mean = F.expr(
        f"aggregate(transform(sequence(0, {m - 1}), r -> "
        f"cast(conv(substring(md5(concat(__ik__, '#', cast(r as string))), 1, 12), 16, 10) as double)"
        f" / 281474976710656.0 - 0.5), "
        f"cast(0.0 as double), (acc, x) -> acc + x) / {m}"
    )
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.col("__base__") + 2.0 * noise_sd_frac * F.col("__sd__") * noise_mean
    )
    return (
        df.withColumn("__ik__", draw_key)
        .withColumn("__base__", base)
        .withColumn("__sd__", sd)
        .withColumn("is_imputed", F.col(value_col).isNull())
        .withColumn(value_col, filled)
        .drop("__ik__", "__base__", "__sd__")
    )


def impute_pmm_replicates(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    x_col: str,
    value_col: str,
    m: int = 5,
    donors: int = 5,
    seed: int = 666,
) -> DataFrame:
    """Predictive-mean-matching multiple imputation (M6, ``mice(method=
    'pmm', m=5, seed=666)``, R/model-catch.R:465-516): per series, fit the
    predictive model on observed rows, rank observed DONORS by
    ``|yhat_donor - yhat_missing|``, draw one of the ``donors`` nearest per
    replicate, and impute each replicate with the donor's OBSERVED value —
    then average the ``m`` replicates, exactly as the reference's
    ``complete('all') |> bind_rows() |> summarise(mean)`` collapse does.
    Unlike M5's mean+noise this preserves PMM's defining property: every
    replicate's imputation is a genuinely observed value from the donor
    pool, so imputations can never leave the support of the data.

    Redefinition vs the reference (same sanction as M5): mice's seeded RNG
    becomes md5-derived draws — replicate ``r`` for a missing row picks
    donor ``hash(seed, keys, order, r) mod pool_size`` from the ranked
    pool — reproducible on any engine and oracle-checkable.

    Engine-exactness contract: ``x_col`` and ``value_col`` must be
    INTEGER-scaled (days / cents — cast upstream, like the cusum
    operator). The predictive model is single-predictor OLS, whose slope
    numerator ``nb = n*sum(xy) - sum(x)*sum(y)`` is then an exact integer,
    and since ``yhat_m - yhat_d = b*(x_m - x_d)``, ranking donors by the
    exact integer ``|nb * (x_m - x_d)|`` reproduces the predicted-mean
    ranking with no float anywhere near the discrete donor choice (a
    float-ranked pool could flip donors between engines on a last-ulp
    tie). Requires ``|nb| * max|dx| < 2^63``; a degenerate fit (<2
    distinct x observed) ranks by proximity tie-break alone, matching
    mice's intercept-only fallback where all predicted means are equal.

    Scale shape: one partial-aggregated groupBy for the fit, one
    series-keyed join of missing rows to observed donors (never cross-
    series), a bounded top-``donors`` window, and a ``collect_list``
    bounded by ``donors``; the replicate average is a higher-order fold —
    no Python, nothing driver-side.

    Returns the input columns with ``value_col`` filled (double; missing
    rows in series with zero observed rows stay null — PMM has no donor)
    plus ``is_imputed``.
    """
    keys = list(keys)
    x, y = F.col(x_col).cast("long"), F.col(value_col).cast("long")
    obs = df.filter(F.col(value_col).isNotNull())
    den = F.col("__n__") * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    coef = (
        obs.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            F.sum(x).alias("__sx__"),
            F.sum(y).alias("__sy__"),
            F.sum(x * x).alias("__sxx__"),
            F.sum(x * y).alias("__sxy__"),
        )
        .select(
            *keys,
            F.when(
                den != 0,
                F.col("__n__") * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__"),
            )
            .otherwise(F.lit(0))
            .alias("__nb__"),
        )
    )
    miss = (
        df.filter(F.col(value_col).isNull())
        .select(*keys, F.col(order_col), x.alias("__xm__"))
        .join(coef, keys)
    )
    don = obs.select(
        *keys, x.alias("__xd__"), y.alias("__yd__"), F.col(order_col).alias("__od__")
    )
    w_pool = Window.partitionBy(*keys, order_col).orderBy(
        F.abs(F.col("__nb__") * (F.col("__xm__") - F.col("__xd__"))).asc(),
        F.col("__od__").asc(),
    )
    pool = (
        miss.join(don, keys)
        .withColumn("__rk__", F.row_number().over(w_pool))
        .filter(F.col("__rk__") <= donors)
        .groupBy(*keys, order_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__rk__"), F.col("__yd__")))
            ).alias("__pool__")
        )
    )
    draw_key = F.concat_ws(
        "\x1f",
        F.lit(str(seed)),
        *[F.col(k).cast("string") for k in keys],
        F.col(order_col).cast("string"),
    )
    drawn_mean = F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0 as bigint), (acc, r) -> "
        f"acc + __pool__[cast(cast(conv(substring(md5(concat(__ik__, '#', "
        f"cast(r as string))), 1, 12), 16, 10) as bigint) % size(__pool__) "
        f"as int)].__yd__) / cast({m} as double)"
    )
    imputed = pool.withColumn("__ik__", draw_key).select(
        *keys, order_col, drawn_mean.alias("__fill__")
    )
    out = df.join(imputed, [*keys, order_col], "left")
    return (
        out.withColumn("is_imputed", F.col(value_col).isNull())
        .withColumn(
            value_col,
            F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
            .otherwise(F.col("__fill__")),
        )
        .drop("__fill__")
    )


def bh_adjust(
    pvals: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
    m: int | None = None,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a frame of test
    p-values (Benjamini & Hochberg 1995): rank the p-values ascending
    (ties broken by key), find the largest rank i with
    p_(i) <= i * alpha / m, and mark every test at or below that rank
    significant — the standard guard against the "ran 40 experiment
    metrics, 2 hit p<0.05 by luck" trap.

    ``m`` is the number of tests (defaults to the frame's non-null
    p-value count). Null p-values (degenerate tests, e.g. a saturated
    A/B pool with zero pooled variance) pass through unranked and
    not-significant.

    Scale contract: the input is one row per TEST (metrics, cohorts,
    feature flags) — dimension-sized by definition — so the global rank
    window is bounded; the heavy lifting (computing each test's
    statistic) happens upstream on the event data, never here.

    Returns the input plus (bh_rank int|null, significant boolean).
    """
    ranked_src = pvals.filter(F.col(p_col).isNotNull())
    w = Window.orderBy(F.asc(p_col), F.asc(key_col))
    wg = Window.partitionBy()
    m_expr = F.lit(float(m)) if m is not None else F.count(F.lit(1)).over(wg)
    ranked = ranked_src.withColumn("bh_rank", F.row_number().over(w))
    passed = F.col(p_col) <= (
        F.col("bh_rank").cast("double") * F.lit(float(alpha)) / m_expr
    )
    flagged = ranked.withColumn(
        "__kmax__",
        F.max(F.when(passed, F.col("bh_rank"))).over(wg),
    ).select(
        *pvals.columns,
        F.col("bh_rank").cast("int").alias("bh_rank"),
        (F.col("bh_rank") <= F.coalesce(F.col("__kmax__"), F.lit(0))).alias(
            "significant"
        ),
    )
    skipped = pvals.filter(F.col(p_col).isNull()).select(
        *pvals.columns,
        F.lit(None).cast("int").alias("bh_rank"),
        F.lit(False).alias("significant"),
    )
    return flagged.unionByName(skipped)


def neyman_allocation(
    df: DataFrame,
    strata_cols: Sequence[str],
    measure_col: str,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: n_h proportional to
    N_h * S_h (Neyman 1934) — the survey-sampling counterpart of the
    reference's stratified estimation (R/estimate-catch.R's region x month
    strata); at corpus scale it sizes per-source human-eval or QA samples
    so high-variance sources get proportionally more budget than a fixed
    per-stratum quota (the t6 policy) would give them.

    Determinism contract: ``measure_col`` must be integer-exact after
    ``cast("long")`` (counts, quantities, cents). The per-stratum moments
    (n, sum, sum of squares) are then EXACT integer aggregates —
    order-free on any engine — and every float that follows (the variance
    ratio, sqrt, the allocation share) is a fixed per-row IEEE expression
    over those integers, bit-identical across engines. The one cross-strata
    reduction, sum(N_h*S_h), is folded in pinned (sorted) order because
    float addition is not associative. The squared moments run in
    DECIMAL(38,0) — cents-scale measures overflow BIGINT (1M rows at
    10^4 cents puts sum_m^2 at 10^20 > 2^63; ANSI mode would throw),
    while the 38-digit envelope matches the oracle's HUGEINT path; the
    decimal->double conversion is round-to-nearest in both engines.

    Shape: one partial-aggregated groupBy over the strata (dimension-sized
    output), one sorted-fold over the strata frame broadcast back — the
    fact table is touched exactly once.

    Returns one row per stratum: strata cols, n_rows, sum_m, var_micro
    (sample variance in micro-units), alloc_n (floor(total_n*share+0.5);
    strata with zero variance or n<2 get weight 0).
    """
    m = F.col(measure_col).cast("long")
    md = m.cast("decimal(19,0)")
    per = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(m).alias("sum_m"),
        F.sum(md * md).alias("sum_m2"),
    )
    # exact variance numerator in DECIMAL(38,0) (overflow-safe for cents
    # at billions of rows); denominator in double (n*(n-1) as LONG would
    # itself overflow past ~3e9 rows)
    var_expr = F.when(
        F.col("n_rows") >= 2,
        (
            F.col("n_rows").cast("decimal(38,0)") * F.col("sum_m2")
            - F.col("sum_m").cast("decimal(38,0)")
            * F.col("sum_m").cast("decimal(38,0)")
        ).cast("double")
        / (
            F.col("n_rows").cast("double")
            * (F.col("n_rows").cast("double") - F.lit(1.0))
        ),
    ).otherwise(F.lit(0.0))
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    # materialize the strata frame: it feeds BOTH the weight-total fold
    # and the final projection — without the lineage cut the plan scans
    # the fact table twice (seen in PLANS.md) just to re-derive 6 rows
    per = materialize(
        per.withColumn("__var__", var_expr).withColumn(
            "__w__", F.col("n_rows").cast("double") * F.sqrt(F.col("__var__"))
        )
    )
    # pinned-order fold of the strata weights (tiny frame): sort the
    # collected list, fold with 0.0 init — identical order both engines
    total = per.agg(
        F.expr(
            "aggregate(sort_array(collect_list(__w__)), 0D, (a, x) -> a + x)"
        ).alias("__wsum__")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            *strata_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_m").cast("long").alias("sum_m"),
            F.expr("cast(floor(__var__ * 1000000 + 0.5d) as bigint)").alias(
                "var_micro"
            ),
            F.when(F.col("__wsum__") > 0,
                   F.expr(f"cast(floor({total_n}D * __w__ / __wsum__ + 0.5d)"
                          " as bigint)"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("alloc_n"),
        )
    )


def cohen_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement over two categorical columns
    with a shared label set — the labeled-training-data QA gate (how well
    do two annotation passes or a model-vs-human pair agree beyond
    chance). kappa = (p_o - p_e) / (1 - p_e) with p_e from the raters'
    marginal distributions.

    Everything up to the final ratio is EXACT integer arithmetic from
    contingency counts: p_o = n_agree/n and p_e = sum_k(rowsum_k *
    colsum_k)/n^2 reduce to the signed integer expression
    kappa = (n*n_agree - pe_num) / (n^2 - pe_num). The output is
    integer-exact ppm: truncating div for the non-negative p terms,
    floor() over the one double division for the (signed) kappa — floor
    agrees across engines for either sign, truncation does not.

    Shape: one groupBy over the label-pair contingency (|labels|^2 rows),
    marginals derived from it — the fact table is scanned once; null
    labels in either rater are excluded (standard pairwise deletion).

    Returns one row: n, n_agree, pe_num, po_ppm, pe_ppm, kappa_micro
    (NULL when chance agreement is certain, pe_num == n^2).
    Contract: n <= ~3e9 pairs so n*n (the degenerate guard and the kappa
    numerator) stays inside BIGINT — pe_ppm is already overflow-free via
    its double form; 3 billion labeled pairs is far past any real
    annotation QA set.
    """
    pairs = (
        df.filter(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
        .groupBy(F.col(rater_a).alias("__la__"), F.col(rater_b).alias("__lb__"))
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    row_m = pairs.groupBy("__la__").agg(F.sum("__c__").alias("__ra__"))
    col_m = pairs.groupBy("__lb__").agg(F.sum("__c__").alias("__cb__"))
    # coalesce: raters with NO shared label produce an empty marginal
    # join, whose sum is NULL — the true pe mass over shared labels is 0
    pe = (
        row_m.join(col_m, row_m["__la__"] == col_m["__lb__"])
        .agg(F.coalesce(
            F.sum(F.col("__ra__") * F.col("__cb__")), F.lit(0)
        ).alias("pe_num"))
    )
    tot = pairs.agg(
        F.sum("__c__").alias("n"),
        F.sum(F.when(F.col("__la__") == F.col("__lb__"), F.col("__c__"))
              .otherwise(F.lit(0))).alias("n_agree"),
    )
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_agree").cast("long").alias("n_agree"),
            F.col("pe_num").cast("long").alias("pe_num"),
            F.expr("n_agree * 1000000L div n").alias("po_ppm"),
            # pe_num is O(n^2), so pe_num * 1e6 overflows BIGINT past
            # n ~ 3e6 pairs; floor over the identical double expression
            # keeps both engines bit-equal at any n (and agrees with the
            # integer div exactly while pe_num * 1e6 < 2^53)
            F.expr(
                "cast(floor(1000000D * pe_num"
                " / (cast(n as double) * cast(n as double))) as bigint)"
            ).alias("pe_ppm"),
            # pe == 1 (chance agreement is certain) leaves kappa undefined;
            # NULL, not a division-by-zero (ANSI mode throws on the latter)
            F.expr(
                "CASE WHEN n * n != pe_num THEN"
                " cast(floor(1000000D * (n * n_agree - pe_num)"
                " / (n * n - pe_num)) as bigint) END"
            ).alias("kappa_micro"),
        )
    )


def chapman_estimate(
    first: DataFrame, second: DataFrame, key_col: str
) -> DataFrame:
    """Chapman's bias-corrected capture-recapture estimator (Chapman
    1951; the Lincoln-Petersen family the reference's domain literature
    uses for boat/fisher population sizing from two survey passes):
    N_hat = (n1+1)(n2+1)/(m+1) - 1 over the distinct keys seen in each
    pass and their overlap, with Seber's variance. Both passes can be
    arbitrarily large frames; the estimate reduces to three distinct
    counts (two aggs and one semi-joined agg — no pairwise anything).

    Integer outputs: n_hat uses truncating integer division (all terms
    non-negative); the variance — whose exact integer numerator can
    overflow 2^63 at large n — is the fixed per-row IEEE double
    expression (n1+1)(n2+1)(n1-m)(n2-m) / ((m+1)^2 (m+2)), floored.

    Returns one row: (n1, n2, m, n_hat, var_floor).
    """
    f = first.select(F.col(key_col).alias("__k__")).distinct()
    s = second.select(F.col(key_col).alias("__k__")).distinct()
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    f, s = materialize(f), materialize(s)
    n1 = f.agg(F.count(F.lit(1)).alias("n1"))
    n2 = s.agg(F.count(F.lit(1)).alias("n2"))
    m = f.join(s, "__k__", "left_semi").agg(F.count(F.lit(1)).alias("m"))
    return (
        n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("m").cast("long").alias("m"),
            F.expr(
                "(n1 + 1L) * (n2 + 1L) div (m + 1L) - 1L"
            ).alias("n_hat"),
            F.expr(
                "cast(floor(cast(n1 + 1 as double) * cast(n2 + 1 as double)"
                " * cast(n1 - m as double) * cast(n2 - m as double)"
                " / (cast(m + 1 as double) * cast(m + 1 as double)"
                " * cast(m + 2 as double))) as bigint)"
            ).alias("var_floor"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    grid: int = 100,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test (M15): D = sup over x of
    |ECDF_a(x) - ECDF_b(x)| between the ``value_col`` distributions of two
    groups — the standard distribution-drift monitor for training-data
    pipelines (did this month's quality scores / prices / token counts
    shift against the reference slice?). Large-sample 5% critical value
    c(0.05)*sqrt((n_a+n_b)/(n_a*n_b)) with c = 1.358 (Smirnov asymptote).

    Values are quantized onto a 1/``grid`` lattice via floor(value*grid)
    (exact double multiply + floor — identical IEEE both engines; round()
    would flip on grid-exact values between HALF_UP dialects). The ECDF
    axis is therefore the quantized-value vocabulary, NOT the row count:
    after one partial-aggregated groupBy on the bin, the cumulative sums
    run on a dimension-sized frame, so the single-partition ordering
    window is bounded by the lattice span (grid x value range), never by
    corpus size — the same bounded-axis trick as the log-histogram
    quantiles (a30). Quantization moves D by at most the mass in any
    half-open lattice cell; at drift-monitoring granularity that is the
    bin resolution the caller chose.

    Returns one row: (n_a, n_b, d_stat, d_crit_95, drift_95) with the
    doubles rounded 6dp (cumulative counts are exact integers; the single
    division + abs + max are per-row/order-independent, so no pinned-fold
    machinery is needed). Degenerate inputs (either side empty) emit NULL
    statistics rather than tripping ANSI division.
    """
    # pairwise deletion (ADVICE r08): NULL values would floor to a NULL
    # bin that enters the cumulative window, where Spark orders NULLS
    # FIRST but DuckDB defaults NULLS LAST -- filter them like cohen_kappa
    tagged = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.floor(F.col(value_col) * grid).cast("long").alias("bin"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("ia"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("ib"),
    )
    per_bin = tagged.groupBy("bin").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_bin.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = per_bin.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    return cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.abs(
                    F.col("cum_a") / F.col("n_a")
                    - F.col("cum_b") / F.col("n_b")
                ),
            )
        ).alias("__d__"),
    ).select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(F.col("__d__"), 6),
        ).alias("d_stat"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.lit(1.358)
                * F.sqrt(
                    (F.col("n_a") + F.col("n_b"))
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ),
        ).alias("d_crit_95"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            (F.col("__d__")
             > F.lit(1.358)
             * F.sqrt(
                 (F.col("n_a") + F.col("n_b"))
                 / (F.col("n_a").cast("double") * F.col("n_b"))
             )).cast("int"),
        ).alias("drift_95"),
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 50,
) -> DataFrame:
    """Binned isotonic calibration (M16): fit the best monotone
    non-decreasing map from a score in [0,1) to P(label=1) — the standard
    calibration step for quality/relevance classifiers in training-data
    pipelines (a filter threshold is only meaningful if the score is
    calibrated). Equivalent to pool-adjacent-violators on the bin means,
    but computed CLOSED-FORM via the minimax characterization
    (Robertson, Wright & Dykstra 1988):

        iso[p] = max_{i <= p} min_{j >= p} mean(y over bins i..j)

    PAV itself is inherently sequential; the minimax form is pure
    relational algebra on the BIN grid: one partial-aggregated groupBy
    onto <= n_bins rows, prefix sums, the i<=j pair frame (n_bins^2/2
    rows — dimension-sized by construction, like a pivot header), a
    reversed running-min window per i, and a final group-max. The only
    data-sized step is the first aggregation; everything after is
    O(n_bins^2) regardless of corpus size.

    min_{j>=p} mean(i..j) for i<=p equals the reversed running min
    rm(i, j=p), so no inequality join is needed: iso[p] =
    max over i of rm(i, p) — a plain groupBy on the pair frame.

    Determinism: bin means are ratios of exact integer prefix sums (one
    correctly-rounded division per pair row); running min / group max of
    doubles are order-independent; output rounds 6dp once.

    Returns one row per NON-EMPTY bin: (bin, bin_lo, n, pos, frac_pos,
    iso_p) with iso_p monotone non-decreasing in bin.
    """
    b = df.select(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.col(label_col).cast("long").alias("y"),
    ).filter(F.col("bin") >= 0)
    per_bin = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w_pre = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = per_bin.select(
        "bin", "n", "pos",
        F.sum("n").over(w_pre).alias("cn"),
        F.sum("pos").over(w_pre).alias("cp"),
    )
    lo = pre.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cp") - F.col("pos")).alias("cp0"),
    )
    hi = pre.select(
        F.col("bin").alias("j"), F.col("cn").alias("cnj"), F.col("cp").alias("cpj")
    )
    pairs = lo.join(hi, F.col("i") <= F.col("j")).select(
        "i", "j",
        ((F.col("cpj") - F.col("cp0"))
         / (F.col("cnj") - F.col("cn0"))).alias("avg"),
    )
    w_rm = (
        Window.partitionBy("i")
        .orderBy(F.col("j").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iso = (
        pairs.withColumn("rm", F.min("avg").over(w_rm))
        .groupBy("j")
        .agg(F.max("rm").alias("__iso__"))
        .withColumnRenamed("j", "bin")
    )
    return (
        per_bin.join(iso, "bin")
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("bin") / F.lit(float(n_bins)), 6).alias("bin_lo"),
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("pos") / F.col("n"), 6).alias("frac_pos"),
            F.round(F.col("__iso__"), 6).alias("iso_p"),
        )
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    grid: int = 100,
) -> DataFrame:
    """Two-sample Mann-Whitney U / Wilcoxon rank-sum test (M17): the
    nonparametric location-shift companion to the KS drift monitor
    (``ks_two_sample``) — "did the new slice's values systematically
    rank above the reference's?" without any normality assumption.
    Normal approximation with the standard tie correction
    (Lehmann, *Nonparametrics*, eq. 1.38).

    Same bounded-lattice shape as M15: values quantize onto a
    1/``grid`` lattice (floor — exact IEEE both engines), one
    partial-aggregated groupBy collapses the corpus to the lattice
    vocabulary, and the single-partition rank window runs on that
    dimension-sized frame, never on rows. Tied ranks use the midrank
    convention, which on the lattice is EXACT integer arithmetic in
    half-units: 2*R_a = sum over bins of ca * (2*cum_before + t + 1),
    accumulated as DECIMAL(38,0) (BIGINT overflows past ~3e9 rows —
    the a39/a40 overflow lesson). Every float (z, the tie-corrected
    sigma) is one fixed IEEE expression over those exact moments.

    Returns one row: (n_a, n_b, u_a, z, shift_95) with u_a the exact
    U statistic of group A (a half-integer, rounded 6dp for the hashed
    output), z its tie-corrected normal deviate, shift_95 the 5%
    two-sided verdict. Degenerate inputs (either side empty, or every
    value in one tied bin) emit NULL statistics rather than tripping
    ANSI division.
    """
    # pairwise deletion (ADVICE r08): NULL values would floor to a NULL
    # bin that enters the cumulative window, where Spark orders NULLS
    # FIRST but DuckDB defaults NULLS LAST -- filter them like cohen_kappa
    tagged = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.floor(F.col(value_col) * grid).cast("long").alias("bin"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("ia"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("ib"),
    )
    per_bin = tagged.groupBy("bin").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    d38 = "decimal(38,0)"
    ranked = per_bin.select(
        F.col("ca").cast(d38).alias("ca"),
        (F.col("ca") + F.col("cb")).cast(d38).alias("t"),
        F.sum(F.col("ca") + F.col("cb")).over(w).cast(d38).alias("cum_t"),
    )
    mom = ranked.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum(F.col("t") - F.col("ca")).cast("long").alias("n_b"),
        F.sum(
            F.col("ca")
            * (F.lit(2).cast(d38) * (F.col("cum_t") - F.col("t"))
               + F.col("t") + F.lit(1).cast(d38))
        ).cast(d38).alias("r2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast(d38)
        .alias("tie_sum"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = n_a + n_b
    u2 = F.col("r2_a").cast("double") - n_a * (n_a + 1.0)  # 2*U_a
    var = (
        n_a * n_b / 12.0
        * ((n + 1.0) - F.col("tie_sum").cast("double") / (n * (n - 1.0)))
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0)
    z = (u2 - n_a * n_b) / (F.lit(2.0) * F.sqrt(var))
    return mom.select(
        "n_a",
        "n_b",
        F.when(ok, F.round(u2 / 2.0, 6)).alias("u_a"),
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, (F.abs(z) > 1.959964).cast("int")).alias("shift_95"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-square test of independence (M18) between two categorical
    columns — the standard contingency-table QA check (is label
    distribution independent of source shard? is the status mix
    independent of priority?). Per-cell Pearson contributions plus the
    table-level statistic and degrees of freedom on every row.

    Shape: one partial-aggregated groupBy builds the contingency cells;
    row totals, column totals and the grand total are three aggregates
    of the CELL frame (dimension-sized, broadcast back) — the corpus is
    read exactly once. At 100 TB the cell frame is |A|x|B|, a dimension
    table by construction.

    Determinism: each cell's contribution is computed from exact
    integer moments — diff = obs*n - rt*ct as DECIMAL(38,0) (exact to
    ~1e19-row tables), squared/divided in one fixed IEEE expression —
    and rounded to integer micro-units; the table statistic is the
    order-independent BIGINT sum of those micro-units (SURVEY §7.4:
    float sums never enter hashed outputs unrounded).

    Returns one row per grid cell — the FULL r x c cross of observed
    row/column categories, including structurally-zero combinations
    (obs = 0), whose Pearson contribution is (0-E)^2/E = E; omitting
    them (the pre-r09 behavior, ADVICE r08) understates chi2_micro on
    any table with empty cells while dof still counts the full grid.
    Columns: (col_a, col_b, obs, expected, contrib_micro, chi2_micro,
    dof).
    """
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    d38 = "decimal(38,0)"
    # One corpus scan; the cell frame is |A|x|B| dimension-sized by
    # construction, so materializing it makes the three margin
    # aggregates and the grid join read a tiny cached frame, not the
    # corpus, regardless of exchange-reuse luck.
    cells = materialize(
        df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("obs"))
    )
    rt = cells.groupBy(col_a).agg(F.sum("obs").alias("rt"))
    ct = cells.groupBy(col_b).agg(F.sum("obs").alias("ct"))
    tot = cells.agg(
        F.sum("obs").cast(d38).alias("n"),
        F.countDistinct(col_a).alias("n_rows_dim"),
        F.countDistinct(col_b).alias("n_cols_dim"),
    )
    # full r x c grid: every observed row category x every observed
    # column category; margins rt/ct are >= 1 by construction so the
    # Pearson denominator below can never reach zero
    grid = rt.crossJoin(F.broadcast(ct))
    diff = (
        F.col("obs").cast(d38) * F.col("n")
        - F.col("rt").cast(d38) * F.col("ct").cast(d38)
    ).cast("double")
    denom = (
        F.col("n").cast("double")
        * F.col("rt").cast("double")
        * F.col("ct").cast("double")
    )
    scored = (
        grid.join(F.broadcast(cells), [col_a, col_b], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            col_a,
            col_b,
            F.col("obs").cast("long").alias("obs"),
            F.round(
                F.col("rt").cast("double") * F.col("ct") / F.col("n"), 6
            ).alias("expected"),
            F.floor(F.lit(1e6) * diff * diff / denom + 0.5)
            .cast("long")
            .alias("contrib_micro"),
            ((F.col("n_rows_dim") - 1) * (F.col("n_cols_dim") - 1))
            .cast("long")
            .alias("dof"),
        )
    )
    table = scored.agg(F.sum("contrib_micro").cast("long").alias("chi2_micro"))
    return scored.crossJoin(F.broadcast(table))


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    grid: int = 100,
) -> DataFrame:
    """Kruskal-Wallis k-sample rank test (M19): does ANY of k slices'
    value distributions sit systematically above the others — the
    one-shot generalization of the Mann-Whitney pair test (``H`` reduces
    to it at k=2) used to monitor a metric across many sources/shards at
    once. Tie-corrected H (Kruskal & Wallis 1952, eq. 2.4).

    Same bounded-lattice determinism as m15/m17: values quantize onto a
    1/``grid`` floor lattice; per-(bin, group) and per-bin counts are
    exact integer aggregates; doubled midranks make every group rank sum
    an exact DECIMAL(38,0); the one cross-group float reduction
    (sum of R_g^2/n_g) folds in pinned sorted order (the a39 rule —
    float addition is not associative, and group count k is
    dimension-sized). The tie term N^3 - N stays exact in DECIMAL.

    Returns one row: (n_total, k_groups, dof, h, h_corrected) rounded
    6dp; degenerate inputs (all values in one tied bin, n < 2, k < 2)
    emit NULL statistics.
    """
    d38 = "decimal(38,0)"
    # pairwise deletion of NULL values (ADVICE r08) -- see ks_two_sample
    tagged = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.floor(F.col(value_col) * grid).cast("long").alias("bin"),
    )
    per_gb = tagged.groupBy("bin", "grp").agg(
        F.count(F.lit(1)).alias("cg")
    )
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    per_gb = materialize(per_gb)
    per_bin = per_gb.groupBy("bin").agg(F.sum("cg").alias("t"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    bin_rank = per_bin.select(
        "bin",
        F.col("t").cast(d38).alias("t"),
        F.sum("t").over(w).cast(d38).alias("cum_t"),
    )
    per_group = (
        per_gb.join(bin_rank, "bin")
        .groupBy("grp")
        .agg(
            F.sum("cg").cast(d38).alias("n_g"),
            F.sum(
                F.col("cg").cast(d38)
                * (F.lit(2).cast(d38) * (F.col("cum_t") - F.col("t"))
                   + F.col("t") + F.lit(1).cast(d38))
            ).cast(d38).alias("r2_g"),
        )
        .withColumn(
            "__term__",
            F.col("r2_g").cast("double") * F.col("r2_g").cast("double")
            / (F.lit(4.0) * F.col("n_g").cast("double")),
        )
    )
    per_group = materialize(per_group)
    folded = per_group.agg(
        F.expr(
            "aggregate(sort_array(collect_list(__term__)), 0D, (a, x) -> a + x)"
        ).alias("s"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_g").cast(d38).alias("n"),
    )
    ties = per_bin.agg(
        F.sum(
            F.col("t").cast(d38) * F.col("t").cast(d38) * F.col("t").cast(d38)
            - F.col("t").cast(d38)
        ).cast(d38).alias("tie_sum")
    )
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (nd * (nd + 1.0)) * F.col("s")
        - F.lit(3.0) * (nd + 1.0)
    )
    corr = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        F.col("n") * F.col("n") * F.col("n") - F.col("n")
    ).cast("double")
    ok = (F.col("n") >= 2) & (F.col("k_groups") >= 2) & (corr > 0)
    return folded.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("long").alias("n_total"),
        "k_groups",
        (F.col("k_groups") - 1).cast("long").alias("dof"),
        F.when(ok, F.round(h, 6)).alias("h"),
        F.when(ok, F.round(h / corr, 6)).alias("h_corrected"),
    )


def spearman_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    grid_x: int = 1,
    grid_y: int = 100,
) -> DataFrame:
    """Spearman rank correlation (M20) between two numeric columns —
    the monotone-association QA check (does quality score track document
    length? does price track quantity?) that Pearson's r gets wrong on
    heavy tails. Computed as Pearson over midranks with full tie
    handling.

    Determinism: both columns quantize onto floor lattices; each
    column's midrank map is built from exact integer cumulative counts
    on its OWN dimension-sized bin grid (one window each), joined back
    by bin key. DOUBLED midranks are exact integers, so all five rank
    moments are exact DECIMAL(38,0) sums (the doubling cancels in the
    ratio); the final rho is one fixed IEEE expression. Decimal budget:
    n*Sxy stays inside 38 digits to ~1e9 rows (documented contract, the
    a39 convention); the variance product is cast to double per factor
    BEFORE multiplying (their product overflows any fixed precision).

    Returns one row: (n, rho) with rho rounded 6dp; constant columns
    emit NULL.
    """
    d38 = "decimal(38,0)"
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    binned = materialize(
        df.select(
            F.floor(F.col(x_col) * grid_x).cast("long").alias("bx"),
            F.floor(F.col(y_col) * grid_y).cast("long").alias("by"),
        )
    )

    def rank_map(col: str) -> DataFrame:
        per = binned.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return per.select(
            col,
            (
                F.lit(2).cast(d38)
                * (F.sum("c").over(w).cast(d38) - F.col("c").cast(d38))
                + F.col("c").cast(d38) + F.lit(1).cast(d38)
            ).alias(f"r_{col}"),
        )

    ranked = (
        binned.groupBy("bx", "by")
        .agg(F.count(F.lit(1)).cast(d38).alias("c"))
        .join(rank_map("bx"), "bx")
        .join(rank_map("by"), "by")
    )
    mom = ranked.agg(
        F.sum("c").cast(d38).alias("n"),
        F.sum(F.col("c") * F.col("r_bx")).cast(d38).alias("sx"),
        F.sum(F.col("c") * F.col("r_by")).cast(d38).alias("sy"),
        F.sum(F.col("c") * F.col("r_bx") * F.col("r_bx")).cast(d38).alias("sxx"),
        F.sum(F.col("c") * F.col("r_by") * F.col("r_by")).cast(d38).alias("syy"),
        F.sum(F.col("c") * F.col("r_bx") * F.col("r_by")).cast(d38).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    den = F.sqrt(vx * vy)
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.when((vx > 0) & (vy > 0), F.round(num / den, 6)).alias("rho"),
    )


def classification_report(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 (M21) from (truth, predicted) label
    pairs — the evaluation table for every quality/language/topic
    classifier a training-data pipeline gates on (scikit-learn's
    classification_report, distributed). Classes are the UNION of
    observed truth and predicted labels, so a class the model never
    predicts (or invents) still shows its zeros.

    Shape: one partial-aggregated groupBy builds the confusion cells;
    the two margins are aggregates of the CELL frame (label-cardinality-
    sized, broadcast back) — the corpus is read exactly once, the m18
    chi-square shape. Counts are exact integers; precision/recall/F1 are
    single fixed IEEE expressions over them rounded 6dp, with NULL when
    the denominator is zero (never predicted / zero support).

    Returns one row per class: (label, support, tp, fp, fn, precision,
    recall, f1).
    """
    cells = df.select(
        F.col(truth_col).alias("__t__"), F.col(pred_col).alias("__p__")
    ).groupBy("__t__", "__p__").agg(F.count(F.lit(1)).alias("n"))
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    cells = materialize(cells)
    truth_m = cells.groupBy(F.col("__t__").alias("label")).agg(
        F.sum("n").alias("support"),
        F.sum(F.when(F.col("__t__") == F.col("__p__"), F.col("n"))
              .otherwise(0)).alias("tp_t"),
    )
    pred_m = cells.groupBy(F.col("__p__").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    rep = truth_m.join(pred_m, "label", "full_outer").select(
        "label",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        F.coalesce("tp_t", F.lit(0)).cast("long").alias("tp"),
        (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp_t", F.lit(0)))
        .cast("long").alias("fp"),
        (F.coalesce("support", F.lit(0)) - F.coalesce("tp_t", F.lit(0)))
        .cast("long").alias("fn"),
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp") / (F.col("tp") + F.col("fn"))
    return rep.select(
        "label", "support", "tp", "fp", "fn",
        F.when(F.col("tp") + F.col("fp") > 0, F.round(prec, 6))
        .alias("precision"),
        F.when(F.col("tp") + F.col("fn") > 0, F.round(rec, 6)).alias("recall"),
        # f1 = 0.0 when precision+recall == 0 but both are DEFINED
        # (tp=0 with predictions and support present) — scikit-learn's
        # convention, which this mirrors (ADVICE r08); NULL only when
        # precision or recall is itself undefined
        F.when(
            (F.col("tp") + F.col("fp") > 0) & (F.col("tp") + F.col("fn") > 0),
            F.when(
                prec + rec > 0,
                F.round(F.lit(2.0) * prec * rec / (prec + rec), 6),
            ).otherwise(F.lit(0.0)),
        ).alias("f1"),
    )


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    grid: int = 1_000_000,
) -> DataFrame:
    """ROC AUC (M22) of a numeric score against a binary label — the
    threshold-free ranking metric for quality classifiers. Computed via
    the rank-sum identity AUC = (R_pos - n_pos(n_pos+1)/2)/(n_pos*n_neg)
    with midrank tie handling, i.e. exactly the Mann-Whitney machinery
    (m17) read as a probability: the estimate includes the standard
    +0.5 credit for ties.

    Same bounded-lattice determinism as m15/m17: scores quantize onto a
    1/``grid`` floor lattice, doubled midranks make the positive rank
    sum an exact DECIMAL(38,0), and AUC is ONE fixed IEEE division over
    exact integers, rounded 6dp.

    Returns one row: (n_pos, n_neg, auc, gini) — gini = 2*AUC - 1;
    degenerate inputs (single-class) emit NULLs.
    """
    d38 = "decimal(38,0)"
    # pairwise deletion of NULL scores (ADVICE r08) -- see ks_two_sample
    tagged = df.filter(F.col(score_col).isNotNull()).select(
        F.floor(F.col(score_col) * grid).cast("long").alias("bin"),
        F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0).alias("ip"),
    )
    per_bin = tagged.groupBy("bin").agg(
        F.sum("ip").alias("cp"), F.count(F.lit(1)).alias("t")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_bin.select(
        F.col("cp").cast(d38).alias("cp"),
        F.col("t").cast(d38).alias("t"),
        F.sum("t").over(w).cast(d38).alias("cum_t"),
    )
    mom = ranked.agg(
        F.sum("cp").cast("long").alias("n_pos"),
        F.sum(F.col("t") - F.col("cp")).cast("long").alias("n_neg"),
        F.sum(
            F.col("cp")
            * (F.lit(2).cast(d38) * (F.col("cum_t") - F.col("t"))
               + F.col("t") + F.lit(1).cast(d38))
        ).cast(d38).alias("r2_pos"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (
        F.col("r2_pos").cast("double") - np_ * (np_ + 1.0)
    ) / (F.lit(2.0) * np_ * nn)
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return mom.select(
        "n_pos",
        "n_neg",
        F.when(ok, F.round(auc, 6)).alias("auc"),
        F.when(ok, F.round(F.lit(2.0) * auc - 1.0, 6)).alias("gini"),
    )


def calibration_ece(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Expected calibration error (M23) of a probabilistic score against
    a binary label — the companion of the isotonic fit (m16): how far do
    predicted probabilities sit from observed frequencies, weighted by
    bin mass. ECE = sum_b (n_b/N) * |pos_b/n_b - mean_score_b|.

    Determinism: scores enter as exact integer MICRO-units
    (floor(score*1e6)), so per-bin score mass, positives and counts are
    exact integer aggregates; each bin's weighted gap is one fixed IEEE
    expression rounded to integer micro-units, and the ECE total is
    their order-independent BIGINT sum (the m18 convention — a float
    sum over bins would be order-dependent). max_ce is an order-free
    max over the per-bin gaps.

    Returns one row: (n, n_bins_used, ece_micro, max_ce_micro) — divide
    by 1e6 for the conventional values.
    """
    binned = df.select(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(int(n_bins) - 1),
        ).alias("bin"),
        F.floor(F.col(score_col) * 1_000_000).cast("long").alias("s_micro"),
        F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0).alias("y"),
    ).filter(F.col("bin") >= 0)
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("y").alias("pos_b"),
        F.sum("s_micro").cast("decimal(38,0)").alias("sm_b"),
    )
    tot = per_bin.agg(F.sum("n_b").alias("n"))
    gap = F.abs(
        F.col("pos_b").cast("double") / F.col("n_b")
        - F.col("sm_b").cast("double") / (F.col("n_b") * F.lit(1e6))
    )
    scored = per_bin.crossJoin(F.broadcast(tot)).select(
        F.floor(
            F.lit(1e6) * (F.col("n_b") / F.col("n")) * gap + 0.5
        ).cast("long").alias("ce_micro"),
        F.floor(F.lit(1e6) * gap + 0.5).cast("long").alias("gap_micro"),
    )
    return scored.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum("ce_micro").cast("long").alias("ece_micro"),
        F.max("gap_micro").cast("long").alias("max_ce_micro"),
    )


def required_sample_size(
    df: DataFrame,
    group_cols: Sequence[str],
    success_expr: str,
    rel_mde: float = 0.1,
    z_alpha: float = 1.959964,
    z_power: float = 0.841621,
) -> DataFrame:
    """A/B test power analysis (M24): per segment, the sample size each
    arm needs to detect a ``rel_mde`` relative lift over the segment's
    OBSERVED baseline rate at the given significance/power (two-sided
    normal approximation for two proportions, Fleiss eq. 3.18 —
    defaults: 5% alpha, 80% power). The design-stage companion of the
    a29 analysis op: "how long must this experiment run per segment."

    Determinism: the baseline rate comes from exact integer counts (one
    partial-aggregated groupBy — the corpus is read once); everything
    after is a fixed per-row IEEE chain over those integers, rounded
    6dp, with the required n emitted as ceil (exactly representable
    boundary cases are identical IEEE in both engines). Degenerate
    segments (zero or saturated baseline, lifted rate >= 1) emit NULL.

    Returns one row per segment: (group cols, n_obs, successes, p1, p2,
    n_per_arm).
    """
    cells = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.expr(f"CASE WHEN {success_expr} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("successes"),
    )
    p1 = F.col("successes").cast("double") / F.col("n_obs")
    p2 = p1 * (1.0 + float(rel_mde))
    pbar = (p1 + p2) / 2.0
    num = (
        F.lit(float(z_alpha)) * F.sqrt(F.lit(2.0) * pbar * (1.0 - pbar))
        + F.lit(float(z_power))
        * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    )
    n_arm = F.ceil(num * num / ((p2 - p1) * (p2 - p1)))
    ok = (F.col("n_obs") > 0) & (p1 > 0) & (p2 < 1)
    return cells.select(
        *group_cols,
        "n_obs",
        "successes",
        F.when(F.col("n_obs") > 0, F.round(p1, 6)).alias("p1"),
        F.when(ok, F.round(p2, 6)).alias("p2"),
        F.when(ok, n_arm.cast("long")).alias("n_per_arm"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    grid: int = 100,
) -> DataFrame:
    """Brown-Forsythe variance-equality test (M25; Brown & Forsythe
    1974 — Levene's test with median centers, the robust choice): do k
    slices differ in SPREAD, completing the rank-test family (m17/m19
    ask about location, this asks about dispersion — a drift monitor
    can need either answer). One-way ANOVA F on z = |x - median_g|.

    Lattice determinism, extended to the median: values quantize onto
    the 1/``grid`` floor lattice and BOTH the group medians (lower
    median on the lattice — the smallest bin with 2*cum >= n) and the
    absolute deviations live in integer lattice units, so every moment
    (S_g, Q_g, n_g) is an exact DECIMAL(38,0) aggregate. The two
    cross-group reductions of the rational terms S_g^2/n_g fold in
    pinned sorted order (the a39 rule); everything else is one fixed
    IEEE expression over exact integers.

    Shape: one (bin, group) partial agg; median via a per-group
    cumulative window on the group's OWN lattice vocabulary; z-moments
    via a second pass over the (bin, group) frame joined to the
    medians (never the raw rows); the k-row group frame folds and
    broadcasts. The corpus is read once.

    Returns one row: (n_total, k_groups, df1, df2, f_stat) rounded
    6dp; degenerate inputs (k < 2, all deviations zero) emit NULL.
    """
    d38 = "decimal(38,0)"
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    gb = materialize(
        df.select(
            F.col(group_col).alias("grp"),
            F.floor(F.col(value_col) * grid).cast("long").alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = gb.select(
        "grp", "bin", "c", F.sum("c").over(w).alias("cum")
    )
    n_g = gb.groupBy("grp").agg(F.sum("c").alias("n_g"))
    med = (
        cum.join(n_g, "grp")
        .filter(F.lit(2) * F.col("cum") >= F.col("n_g"))
        .groupBy("grp")
        .agg(F.min("bin").alias("med_bin"))
    )
    z_mom = (
        gb.join(med, "grp")
        .select(
            "grp",
            F.col("c").cast(d38).alias("c"),
            F.abs(F.col("bin") - F.col("med_bin")).cast(d38).alias("z"),
        )
        .groupBy("grp")
        .agg(
            F.sum("c").cast(d38).alias("n_g"),
            F.sum(F.col("c") * F.col("z")).cast(d38).alias("s_g"),
            F.sum(F.col("c") * F.col("z") * F.col("z")).cast(d38).alias("q_g"),
        )
        .withColumn(
            "__ratio__",
            F.col("s_g").cast("double") * F.col("s_g").cast("double")
            / F.col("n_g").cast("double"),
        )
    )
    z_mom = materialize(z_mom)
    folded = z_mom.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast(d38).alias("n"),
        F.sum("s_g").cast(d38).alias("s_tot"),
        F.sum("q_g").cast(d38).alias("q_tot"),
        F.expr(
            "aggregate(sort_array(collect_list(__ratio__)), 0D, (a, x) -> a + x)"
        ).alias("r_sum"),
    )
    nd = F.col("n").cast("double")
    ssb = F.col("r_sum") - (
        F.col("s_tot").cast("double") * F.col("s_tot").cast("double") / nd
    )
    ssw = F.col("q_tot").cast("double") - F.col("r_sum")
    kd = F.col("k").cast("double")
    f_stat = (ssb / (kd - 1.0)) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k").cast(d38)) & (ssw > 0)
    return folded.select(
        F.col("n").cast("long").alias("n_total"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n").cast("long") - F.col("k")).cast("long").alias("df2"),
        F.when(ok, F.round(f_stat, 6)).alias("f_stat"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve (M26; Kaplan & Meier 1958) over
    right-censored integer durations — time-to-churn, document lifetime,
    time-to-first-failure: S(t) = prod over event times t_i <= t of
    (1 - d_i / n_i), with censored subjects leaving the risk set without
    an event.

    Determinism contract: durations are INTEGERS (days, hours — the
    caller's lattice). Risk sets and event counts are then exact integer
    aggregates, and the KM product is evaluated in LOG space with each
    factor's ln(1 - d/n) rounded to integer NANO-units BEFORE the
    cumulative sum — the running reduction is an exact BIGINT prefix
    sum, immune to both engines' window-aggregation association order
    (DuckDB's segment-tree windows re-associate float sums; integers
    don't care). S(t) = exp(nano/1e9) rounded 6dp differs from the
    true product by < 1e-9 per factor — quantization, not drift. A time
    where the whole risk set fails (d = n) sends survival to exact 0
    from there on.

    Shape: one partial-aggregated groupBy on the duration lattice, one
    cumulative window over the (dimension-sized) distinct-time frame,
    one broadcast of the total count. The corpus is read once.

    Returns one row per distinct EVENT time: (t, n_risk, n_events,
    n_censored, survival).
    """
    per_t = df.select(
        F.col(duration_col).cast("long").alias("t"),
        F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0).alias("e"),
    ).groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("e")).cast("long").alias("c"),
    )
    tot = per_t.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("n"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risky = per_t.crossJoin(F.broadcast(tot)).select(
        "t", "d", "c",
        (F.col("n") - (F.sum(F.col("d") + F.col("c")).over(w)
                       - (F.col("d") + F.col("c")))).alias("n_risk"),
    )
    # ln factor in exact nano units; d == n_risk -> survival hits exact 0
    # (flagged with a sentinel the cumulative sum propagates)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.lit(1e9)
            * F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk")
            )
            + 0.5
        ).cast("long"),
    ).otherwise(F.lit(None))
    stepped = risky.select(
        "t", "d", "c", "n_risk",
        term.alias("__ln_nano__"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("__dead__"),
    )
    cum = stepped.select(
        "t", "d", "c", "n_risk",
        F.sum(F.coalesce("__ln_nano__", F.lit(0))).over(w).alias("__cum__"),
        F.sum("__dead__").over(w).alias("__dead_cum__"),
    )
    return cum.filter(F.col("d") > 0).select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("__dead_cum__") > 0, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("__cum__").cast("double") / F.lit(1e9)), 6)
        )
        .alias("survival"),
    )
