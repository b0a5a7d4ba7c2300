"""Statistical operators (SURVEY.md §2.8 M2/M3/M4/M5/M7/M9) on star-schema
analogues. Every family has at least one hash-checked DuckDB oracle —
including the GLMM (m4_poisson_glm's unrolled IRLS and m4b_glmm_1ri's
arrowhead Henderson replay); only the crossed-intercept/ZI variants
(m4_glmm, m4zi_glmm), whose Henderson solve needs a dense matrix inverse
no SQL engine can replay, remain rows-only."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.harness.tables import load
from peskas_timor_data_pipeline_spark.operators.estimate import (
    impute_mean_replicates,
    poisson_glm_per_group,
    redistribute_shares,
)
from peskas_timor_data_pipeline_spark.operators.interpolate import interpolate_linear
from peskas_timor_data_pipeline_spark.operators.outliers import ols_cooks_distance
from peskas_timor_data_pipeline_spark.operators.weights import estimate_weights


# --- M2: set-based length-weight estimator -----------------------------------

def m2_length_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    # catch rows: length = l_quantity, n = l_linenumber, species code = brand
    catch = (
        li.join(part.select("p_partkey", "p_brand"), li.l_partkey == part.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("p_brand").alias("code"),
            F.col("l_quantity").alias("length"),
            F.col("l_linenumber").cast("double").alias("n_ind"),
        )
        .distinct()  # catch-row identity = full tuple (keys alone collide)
    )
    # LW parameter table: every part of the same brand is a candidate species
    params = part.select(
        F.col("p_brand").alias("code"),
        (F.col("p_retailprice") / 10000.0).alias("a"),
        (1.0 + (F.col("p_size") % 10) / 10.0).alias("b"),
    )
    weights = estimate_weights(
        catch, params, "code", "length", "n_ind",
        ["l_orderkey", "l_linenumber", "l_returnflag"], quantile=0.75,
    )
    return weights.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("weight"), 6).alias("avg_weight"),
        F.round(F.sum("weight"), 2).alias("total_weight"),
        F.max("n_candidates").alias("max_candidates"),
    )


M2_ORACLE = """
WITH catch AS (
  SELECT DISTINCT l_orderkey, l_linenumber, l_returnflag, p_brand AS code,
         l_quantity AS length, CAST(l_linenumber AS DOUBLE) AS n_ind
  FROM lineitem JOIN part ON l_partkey = p_partkey
), params AS (
  SELECT p_brand AS code, p_retailprice / 10000.0 AS a,
         1.0 + (p_size % 10) / 10.0 AS b
  FROM part
), weights AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, code, length,
         quantile_cont(a * pow(length, b), 0.75) * min(n_ind) AS weight,
         count(*) AS n_candidates
  FROM catch JOIN params USING (code)
  GROUP BY l_orderkey, l_linenumber, l_returnflag, code, length
)
SELECT l_returnflag, count(*) AS n_rows,
       round(avg(weight), 6) AS avg_weight,
       round(sum(weight), 2) AS total_weight,
       max(n_candidates) AS max_candidates
FROM weights GROUP BY l_returnflag
"""


# --- M2b: full LL-routed weight estimation (S17/M8 snapshot builder + M2) -----

def m2b_length_weight_ll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference weight path: raw snapshot frame ->
    morphometric_tables (incl. the TL-coefficient variant, quality filter,
    and INVERTED reciprocal LL params) -> estimate_weights_ll (direct +
    length-converted candidates, per-code quantile coefficients)."""
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize
    from peskas_timor_data_pipeline_spark.operators.weights import (
        estimate_weights_ll,
        morphometric_tables,
    )

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    # materialized: estimate_weights_ll references the catch frame twice
    # (candidate domain + final row join) and the join+distinct over the
    # full lineitem is the dominant fixture cost — one lineage cut halves it
    catch = materialize(
        li.join(part.select("p_partkey", "p_brand"), li.l_partkey == part.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("p_brand").alias("code"),
            F.col("l_quantity").alias("length"),
            F.when(F.col("l_linenumber") % 2 == 0, "TL").otherwise("FL").alias("ltype"),
            F.col("l_linenumber").cast("double").alias("n_ind"),
        )
        .distinct()
    )
    # the real FishBase dimension is KB-scale; sample the synthetic stand-in
    # to match the operator's dimension-table contract (a full 20k-row part
    # table as "params" cost 15s of bench for routing logic a 1/10 sample
    # exercises identically — VERDICT r03 item 9)
    rfish = part.filter(F.col("p_partkey") % 10 == 0).select(
        F.col("p_brand").alias("interagency_code"),
        F.col("p_type").alias("Species"),
        F.lit(0.0).alias("LengthMin"),
        F.lit(100.0).alias("LengthMax"),
        F.when(F.col("p_size") % 2 == 0, "TL").otherwise("FL").alias("Type"),
        (F.col("p_retailprice") / 10000.0).alias("a"),
        (1.0 + (F.col("p_size") % 10) / 10.0).alias("b"),
        F.when(F.col("p_size") % 3 == 0, F.col("p_retailprice") / 20000.0).alias("aTL"),
        F.when(F.col("p_size") % 7 == 0, F.lit("yes")).alias("EsQ"),
        F.when(F.col("p_size") % 4 == 0, F.lit("TL")).alias("Length1"),
        F.when(F.col("p_size") % 4 == 0, F.lit("FL")).alias("Length2"),
        F.when(F.col("p_size") % 4 == 0, (F.col("p_size") % 5) / 10.0).alias("aL"),
        F.when(F.col("p_size") % 4 == 0, 1.0 + (F.col("p_size") % 3) / 10.0).alias("bL"),
    )
    lw, ll = morphometric_tables(rfish)
    weights = estimate_weights_ll(
        catch, lw, ll, "code", "length", "ltype", "n_ind",
        ["l_orderkey", "l_linenumber", "l_returnflag"],
        coeff_map={"Brand#11": 0.7, "Brand#21": 0.75},
        default_coeff=0.9,
    )
    return weights.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("weight"), 6).alias("avg_weight"),
        F.round(F.sum("weight"), 2).alias("total_weight"),
        F.max("n_candidates").alias("max_candidates"),
    )


M2B_ORACLE = """
WITH rfish AS (
  SELECT p_brand AS code, p_type AS Species,
         CASE WHEN p_size % 2 = 0 THEN 'TL' ELSE 'FL' END AS Type,
         p_retailprice / 10000.0 AS a,
         1.0 + (p_size % 10) / 10.0 AS b,
         CASE WHEN p_size % 3 = 0 THEN p_retailprice / 20000.0 END AS aTL,
         CASE WHEN p_size % 7 = 0 THEN 'yes' END AS EsQ,
         CASE WHEN p_size % 4 = 0 THEN 'TL' END AS Length1,
         CASE WHEN p_size % 4 = 0 THEN 'FL' END AS Length2,
         CASE WHEN p_size % 4 = 0 THEN (p_size % 5) / 10.0 END AS aL,
         CASE WHEN p_size % 4 = 0 THEN 1.0 + (p_size % 3) / 10.0 END AS bL
  FROM part WHERE p_partkey % 10 = 0
), lw AS (
  SELECT DISTINCT code, Species, Type, a, b FROM (
    SELECT code, Species, 'TL' AS Type, aTL AS a, b, EsQ FROM rfish
    UNION ALL
    SELECT code, Species, Type, a, b, EsQ FROM rfish
  ) WHERE a IS NOT NULL AND NOT coalesce(lower(EsQ) = 'yes', FALSE)
), ll AS (
  SELECT DISTINCT code, Species, Length1, Length2, aL, bL FROM (
    SELECT code, Species, Length2 AS Length1, Length1 AS Length2,
           -aL / bL AS aL, 1.0 / bL AS bL FROM rfish
    UNION ALL
    SELECT code, Species, Length1, Length2, aL, bL FROM rfish
  ) WHERE aL IS NOT NULL
), catch AS (
  SELECT DISTINCT l_orderkey, l_linenumber, l_returnflag, p_brand AS code,
         l_quantity AS length,
         CASE WHEN l_linenumber % 2 = 0 THEN 'TL' ELSE 'FL' END AS ltype,
         CAST(l_linenumber AS DOUBLE) AS n_ind
  FROM lineitem JOIN part ON l_partkey = p_partkey
), domain AS (
  SELECT DISTINCT code, ltype, length FROM catch
  WHERE code IS NOT NULL AND code <> '0' AND ltype IS NOT NULL
        AND length IS NOT NULL
), cands AS (
  SELECT d.code, d.ltype, d.length, lw.a * pow(d.length, lw.b) AS w
  FROM domain d JOIN lw ON d.code = lw.code AND lw.Type = d.ltype
  UNION ALL
  SELECT d.code, d.ltype, d.length, lw.a * pow(ll.aL + d.length * ll.bL, lw.b) AS w
  FROM domain d
  JOIN ll ON d.code = ll.code AND ll.Length2 = d.ltype
  JOIN lw ON ll.code = lw.code AND ll.Species = lw.Species AND lw.Type = ll.Length1
), per_combo AS (
  -- mirror the engine's NA-weight drop (R/calculate-weights.R:556)
  SELECT code, ltype, length,
         quantile_cont(w, 0.7) AS p70, quantile_cont(w, 0.75) AS p75,
         quantile_cont(w, 0.9) AS p90, count(*) AS n_candidates
  FROM cands WHERE w IS NOT NULL GROUP BY 1, 2, 3
), weights AS (
  SELECT c.l_returnflag,
         CASE WHEN c.n_ind = 0 THEN 0.0 ELSE
           (CASE c.code WHEN 'Brand#11' THEN p70 WHEN 'Brand#21' THEN p75
                        ELSE p90 END) * c.n_ind END AS weight,
         n_candidates
  FROM catch c JOIN per_combo USING (code, ltype, length)
)
SELECT l_returnflag, count(*) AS n_rows,
       round(avg(weight), 6) AS avg_weight,
       round(sum(weight), 2) AS total_weight,
       max(n_candidates) AS max_candidates
FROM weights GROUP BY l_returnflag
"""


# --- M8: taxize/FishBase snapshot species resolution ---------------------------

def m8_species_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-dispatched species lookup from a flattened snapshot dim with the
    reference's country-filter-with-fallback semantics
    (sources/fishbase.py::resolve_species)."""
    from peskas_timor_data_pipeline_spark.sources.fishbase import resolve_species

    part = load(spark, sf_dir, "part")
    snapshot = part.select(
        F.when(F.col("p_size") % 2 == 0, "Species").otherwise("Genus").alias("rank"),
        F.when(F.col("p_size") % 2 == 0, F.col("p_type"))
        .otherwise(F.expr("split_part(p_type, ' ', 1)"))
        .alias("name"),
        F.col("p_type").alias("species"),
        F.col("p_size").alias("c_code"),
    )
    taxa = (
        part.filter(F.col("p_size") % 3 == 0)
        .select(
            F.col("p_brand").alias("interagency_code"),
            F.expr("split_part(p_type, ' ', 1)").alias("name"),
            F.lit("Genus").alias("taxa_rank"),
        )
        .distinct()
        .unionByName(
            part.filter(F.col("p_size") % 11 == 0)
            .select(
                F.col("p_brand").alias("interagency_code"),
                F.col("p_type").alias("name"),
                F.lit("Species").alias("taxa_rank"),
            )
            .distinct()
        )
    )
    resolved = resolve_species(snapshot, taxa, [33])
    return resolved.groupBy("interagency_code").agg(
        F.count(F.lit(1)).alias("n_species")
    )


M8_ORACLE = """
WITH snapshot AS (
  SELECT CASE WHEN p_size % 2 = 0 THEN 'Species' ELSE 'Genus' END AS rank,
         CASE WHEN p_size % 2 = 0 THEN p_type
              ELSE split_part(p_type, ' ', 1) END AS name,
         p_type AS species, p_size AS c_code
  FROM part
), taxa AS (
  SELECT DISTINCT p_brand AS code, split_part(p_type, ' ', 1) AS name,
         'Genus' AS taxa_rank
  FROM part WHERE p_size % 3 = 0
  UNION
  SELECT DISTINCT p_brand, p_type, 'Species' FROM part WHERE p_size % 11 = 0
), cands AS (
  SELECT t.code, s.species, s.c_code
  FROM taxa t JOIN snapshot s ON t.name = s.name AND t.taxa_rank = s.rank
), in_country AS (
  SELECT code, species FROM cands WHERE c_code IN (33)
), fallback AS (
  SELECT code, species FROM cands
  WHERE code NOT IN (SELECT DISTINCT code FROM in_country)
), resolved AS (
  SELECT DISTINCT code, species FROM (
    SELECT * FROM in_country UNION ALL SELECT * FROM fallback)
)
SELECT code AS interagency_code, count(*) AS n_species
FROM resolved GROUP BY 1
"""


# --- M3: OLS + Cook's distance in closed form -----------------------------------

def m3_ols_cooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .select(
            "o_orderkey",
            F.log1p("qty").alias("x"),
            F.log1p("o_totalprice").alias("y"),
        )
    )
    fitted = ols_cooks_distance(per_order, "x", "y")
    sample = fitted.filter(F.col("o_orderkey") % 100 == 0)
    return sample.select(
        "o_orderkey",
        F.round("fitted", 6).alias("fitted"),
        F.round("resid", 6).alias("resid"),
        F.round(F.col("cooksd") * 1e6, 3).alias("cooksd_ppm"),
    )


M3_ORACLE = """
WITH pts AS (
  SELECT o_orderkey, ln(1 + qty) AS x, ln(1 + o_totalprice) AS y
  FROM (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem GROUP BY l_orderkey) t
  JOIN orders ON l_orderkey = o_orderkey
), stats AS (
  SELECT count(*) AS n, avg(x) AS xbar, avg(y) AS ybar,
         sum(x * x) AS sxx_raw, sum(x * y) AS sxy_raw
  FROM pts
), fit AS (
  SELECT pts.*, n, xbar,
         (sxy_raw - n * xbar * ybar) / (sxx_raw - n * xbar * xbar) AS slope,
         ybar - (sxy_raw - n * xbar * ybar) / (sxx_raw - n * xbar * xbar) * xbar AS intercept,
         sxx_raw - n * xbar * xbar AS sxx
  FROM pts, stats
), resids AS (
  SELECT *, intercept + slope * x AS fitted, y - (intercept + slope * x) AS resid
  FROM fit
), sse AS (
  SELECT sum(resid * resid) AS sse_v FROM resids
)
SELECT o_orderkey,
       round(fitted, 6) AS fitted,
       round(resid, 6) AS resid,
       round((resid * resid * (1.0/n + (x - xbar)*(x - xbar)/sxx))
             / (2 * (sse_v / (n - 2)) * pow(1 - (1.0/n + (x - xbar)*(x - xbar)/sxx), 2))
             * 1e6, 3) AS cooksd_ppm
FROM resids, sse
WHERE o_orderkey % 100 = 0
"""


# --- M7: window-based linear interpolation ----------------------------------------

def m7_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Tie-free average: sum exact integer cents (order-independent), divide
    # once — money averages otherwise land exactly on .5 rounding boundaries
    # (cents/n rationals) where engine summation order flips the digit.
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100)) / F.count(F.lit(1)) / 100.0,
            6,
        ).alias("avg_price")
    )
    # inject gaps deterministically: every 3rd month is "unobserved"
    gappy = monthly.withColumn(
        "avg_price",
        F.when(F.month("period") % 3 != 0, F.col("avg_price")),
    )
    filled = interpolate_linear(
        gappy, ["o_orderpriority"], "period", "avg_price", out_col="price_filled"
    )
    # floor-quantize, not round(): midpoints of 6-decimal values are exact
    # .5 ties at the 7th digit, where Spark (decimal-repr HALF_UP) and
    # DuckDB (binary round) disagree; floor(x*1e4+0.5) is the same IEEE op
    # sequence in both engines.
    return filled.select(
        "o_orderpriority",
        "period",
        (F.floor(F.col("price_filled") * 1e4 + 0.5) / 1e4).alias("price_filled"),
        "is_imputed",
    )


M7_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         round(sum(round(o_totalprice * 100)) / count(*) / 100.0, 6) AS avg_price
  FROM orders GROUP BY 1, 2
), gappy AS (
  SELECT o_orderpriority, period,
         CASE WHEN month(period) % 3 <> 0 THEN avg_price END AS v
  FROM monthly
), indexed AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY period) AS rn
  FROM gappy
), ctx AS (
  SELECT *,
    last_value(v IGNORE NULLS) OVER (PARTITION BY o_orderpriority ORDER BY period
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        OVER (PARTITION BY o_orderpriority ORDER BY period
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
    first_value(v IGNORE NULLS) OVER (PARTITION BY o_orderpriority ORDER BY period
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        OVER (PARTITION BY o_orderpriority ORDER BY period
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
  FROM indexed
)
SELECT o_orderpriority, period,
       floor((CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + ((nv - pv) * (rn - prn)) / (nrn - prn)
             END) * 1e4 + 0.5) / 1e4 AS price_filled,
       v IS NULL AND coalesce(pv, nv) IS NOT NULL AS is_imputed
FROM ctx
"""


# --- M9: taxa-proportion redistribution ----------------------------------------------

def m9_share_redistribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    monthly_flag = li.groupBy(
        F.trunc(F.to_date("l_shipdate"), "month").alias("period"),
        "l_returnflag",
    ).agg(F.sum("l_quantity").alias("catch_taxa"))
    # independent "total estimate" per period to re-apply shares to
    totals = li.groupBy(
        F.trunc(F.to_date("l_shipdate"), "month").alias("period")
    ).agg((F.sum(F.col("l_extendedprice")) / 1000.0).alias("total_est"))
    df = monthly_flag.join(totals, "period")
    out = redistribute_shares(df, ["period"], "catch_taxa", "total_est")
    return out.select(
        "period",
        "l_returnflag",
        F.round("share_pct", 6).alias("share_pct"),
        F.round("redistributed", 4).alias("redistributed"),
    )


M9_ORACLE = """
WITH monthly_flag AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS period, l_returnflag,
         sum(l_quantity) AS catch_taxa
  FROM lineitem GROUP BY 1, 2
), totals AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS period,
         sum(l_extendedprice) / 1000.0 AS total_est
  FROM lineitem GROUP BY 1
)
SELECT period, l_returnflag,
       round(catch_taxa / sum(catch_taxa) OVER (PARTITION BY period) * 100.0, 6) AS share_pct,
       round(total_est * (catch_taxa / sum(catch_taxa) OVER (PARTITION BY period) * 100.0) / 100.0, 4) AS redistributed
FROM monthly_flag JOIN totals USING (period)
"""


# --- M4: per-group Poisson GLM via applyInPandas (hash-checked since r03) --------------

# Iteration count pinned IDENTICALLY in the Spark query (max_iter, tol=0 so
# the early-convergence break never fires) and the unrolled DuckDB oracle.
# Poisson IRLS from the log-link least-squares start converges quadratically
# (machine precision by ~5 iterations on these monthly counts); running a
# fixed 8 on both sides makes per-iteration float-path differences (numpy
# lstsq/solve vs closed-form Cramer in SQL) irrelevant — both engines sit on
# the same MLE fixed point long before iteration 8, and coefs are rounded to
# 6 dp.
_M4_ITERS = 8


def m4_poisson_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority poisson GLM of monthly order counts on a month index —
    the reference's landing-rate trend model shape (R/model-catch.R:80-138)
    reduced to its fixed-effect core so DuckDB can replay it exactly: the
    IRLS loop is unrolled as chained CTEs in the oracle, 8 pinned
    iterations on both sides (see _M4_ITERS note)."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    indexed = monthly.withColumn(
        "month_idx",
        F.months_between(F.col("period"), F.lit("1995-01-01").cast("date")),
    )
    fits = poisson_glm_per_group(
        indexed, ["o_orderpriority"], "n_orders", ["month_idx"],
        max_iter=_M4_ITERS, tol=0.0,
    )
    return fits.select(
        "o_orderpriority", "term", F.round("coef", 6).alias("coef"), "n_obs"
    ).orderBy("o_orderpriority", "term")


def _m4_irls_sql(iters: int = _M4_ITERS) -> str:
    """Unrolled fixed-iteration IRLS as chained CTEs (DuckDB 1.0 disallows
    aggregates in a recursive CTE's recursive term, so the d5/t16 recursion
    trick doesn't apply; with a pinned iteration count unrolling is exact).

    Replays glm_per_group's poisson path step for step: start
    beta = lstsq([1 x], ln(y + 0.1)) (closed form for the 2-param case —
    initialization differences vanish at the fixed point), then per
    iteration mu = exp(clip(eta, ±30)), z = eta + (y - mu)/max(mu, 1e-12),
    and the 2x2 weighted normal equations solved by Cramer's rule."""
    ctes = ["""data AS MATERIALIZED (
  SELECT o_orderpriority AS grp,
         CAST(count(*) AS DOUBLE) AS y,
         CAST(datediff('month', DATE '1995-01-01',
                       date_trunc('month', o_orderdate)) AS DOUBLE) AS x
  FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
)""", """init AS (
  SELECT grp, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         sum(ln(y + 0.1)) AS se, sum(x * ln(y + 0.1)) AS sxe
  FROM data GROUP BY grp
)""", """beta0 AS (
  SELECT grp,
         (se - ((n * sxe - sx * se) / (n * sxx - sx * sx)) * sx) / n AS b0,
         (n * sxe - sx * se) / (n * sxx - sx * sx) AS b1
  FROM init
)"""]
    for i in range(iters):
        ctes.append(f"""mu{i} AS (
  SELECT grp, x, y, eta, exp(greatest(least(eta, 30.0), -30.0)) AS mu
  FROM (SELECT d.grp, d.x, d.y, b.b0 + b.b1 * d.x AS eta
        FROM data d JOIN beta{i} b USING (grp))
)""")
        ctes.append(f"""s{i} AS (
  SELECT grp, sum(mu) AS s0, sum(mu * x) AS s1, sum(mu * x * x) AS s2,
         sum(mu * z) AS t0, sum(mu * x * z) AS t1
  FROM (SELECT grp, x, mu, eta + (y - mu) / greatest(mu, 1e-12) AS z
        FROM mu{i})
  GROUP BY grp
)""")
        ctes.append(f"""beta{i + 1} AS (
  SELECT grp,
         (s2 * t0 - s1 * t1) / (s0 * s2 - s1 * s1) AS b0,
         (s0 * t1 - s1 * t0) / (s0 * s2 - s1 * s1) AS b1
  FROM s{i}
)""")
    return (
        "WITH " + ",\n".join(ctes) + f""",
nobs AS (SELECT grp, count(*) AS n_obs FROM data GROUP BY grp)
SELECT b.grp AS o_orderpriority, t.term,
       round(CASE t.term WHEN 'intercept' THEN b.b0 ELSE b.b1 END, 6) AS coef,
       nobs.n_obs
FROM beta{iters} b
CROSS JOIN (VALUES ('intercept'), ('month_idx')) t(term)
JOIN nobs USING (grp)
"""
    )


# --- M4: crossed-random-intercept GLMMs, oracle-checked via month-block elimination ----

# Pinned iteration counts (tol=0 both sides so exactly these steps run in
# both engines; the m4b contraction argument gives 5dp agreement despite
# the different per-step float paths — numpy dense inverse in the engine,
# closed-form Schur reduction in the oracle).
_M4X_ITERS = 40          # plain crossed fit: PQL iterations
_M4ZI_OUTER = 4          # zero-inflated: outer EM rounds
_M4ZI_INNER = 5          # zero-inflated: inner PQL iterations per model


def m4_glmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's landing-rate model shape (R/model-catch.R:80-138):
    counts per (priority, month) modeled as n ~ (1|month) + (1|half),
    poisson log link, fitted per priority group via PQL with genuinely
    CROSSED random intercepts (every month level appears under both half
    levels, so the Henderson system's month x half coupling block M is
    non-diagonal and the engine's generic dense solve is exercised).

    The second factor is the 2-level era split ('H1' <= 1997 < 'H2'; the fixture spans 1995-2001) —
    the reduced crossed design VERDICT r05 asked for: with one factor at
    2 levels the oracle can eliminate the diagonal month block and replay
    the remaining (intercept, H1, H2) Schur complement as a closed-form
    3x3 adjugate inverse, window-function only (see _m4_crossed_sql).
    Iterations pinned (_M4X_ITERS, tol=0) so both engines run the exact
    same step count."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        glmm_random_intercepts,
    )

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    frame = monthly.select(
        "o_orderpriority",
        "n_orders",
        F.date_format("period", "MM").alias("month"),
        F.when(F.year("period") <= 1997, "H1").otherwise("H2").alias("half"),
    )
    fits = glmm_random_intercepts(
        frame, ["o_orderpriority"], "n_orders", ["month", "half"],
        family="poisson", max_iter=_M4X_ITERS, tol=0.0,
    )
    return fits.select(
        "o_orderpriority", "kind", "term", "level",
        F.round("estimate", 5).alias("estimate"), "n_obs",
    ).orderBy("o_orderpriority", "kind", "term", "level")


def m4zi_glmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflated variant (ziformula analogue, R/model-catch.R:166-189):
    structural zeros injected deterministically (every 5th month), the EM
    mixture fit recovers both the count model and the logit zero model on
    the same crossed (1|month) + (1|half) structure as m4_glmm. Outer EM
    and inner PQL iteration counts pinned (_M4ZI_OUTER x _M4ZI_INNER,
    tol=0) so the oracle can unroll the exact step sequence: poisson PQL
    (prior weights 1-zhat) -> binomial PQL (working response zhat) ->
    zhat responsibility update, repeated."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        glmm_random_intercepts,
    )

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    frame = monthly.select(
        "o_orderpriority",
        F.when(F.month("period") % 5 == 0, 0.0)
        .otherwise(F.col("n_orders"))
        .alias("n_orders"),
        F.date_format("period", "MM").alias("month"),
        F.when(F.year("period") <= 1997, "H1").otherwise("H2").alias("half"),
    )
    fits = glmm_random_intercepts(
        frame, ["o_orderpriority"], "n_orders", ["month", "half"],
        family="poisson", zero_inflated=True, tol=0.0,
        zi_outer_iter=_M4ZI_OUTER, zi_inner_iter=_M4ZI_INNER, zi_tol=0.0,
    )
    return fits.select(
        "o_orderpriority", "kind", "term", "level",
        F.round("estimate", 5).alias("estimate"), "n_obs",
    ).orderBy("o_orderpriority", "kind", "term", "level")


# State columns carried by every iteration CTE of the crossed oracles.
# Cell granularity: one row per (grp, month-level, half-level); cnt0/cntp
# split the cell's observation rows by y==0 vs y>0 (zi prior weights and
# the binomial working response are constant on each sub-split because
# zhat, mu, pi are functions of the cell's eta only).
_M4X_STATIC = ("grp, mlvl, hlvl, cnt0, cntp, sy, mrep, hrep, grep, "
               "nm, nh, nrows")


def _m4x_pql_step(prev: str, new: str, cols: dict, zi_weighted: bool,
                  binomial: bool, passthrough: str) -> str:
    """One PQL iteration (Henderson solve + EM variance update) for the
    crossed (1|month) + (1|half) model, as a single MATERIALIZED CTE of
    window sums — zero joins (the m4b DuckDB-memory lesson).

    Derivation: order unknowns [b0, u_month (diag block D), u_half]. With
    W-weighted sufficient statistics per cell, eliminate the month block
    (D_g = B_g + 1/s2m is diagonal because months don't co-occur within a
    row), leaving the 3x3 symmetric Schur complement S over
    [intercept, H1, H2]; invert S by adjugate, back-substitute u_month,
    and read the EM traces off the same pieces:
      diag(Ainv)_month_g = 1/D_g + v_g' Sinv v_g,  v_g = (B_g, M_gA, M_gB)/D_g
      tr(Ainv)_half      = Sinv_AA + Sinv_BB
    which replays numpy's  sigma2_f <- (||u_f||^2 + tr(Ainv_ff)) / q_f
    exactly (operators/estimate.py::glmm_random_intercepts)."""
    b0, um, uA, uB, s2m, s2y = (cols[k] for k in
                                ("b0", "um", "uA", "uB", "s2m", "s2y"))
    uh = f"CASE WHEN hlvl = 'H1' THEN {uA} ELSE {uB} END"
    eta = f"greatest(least({b0} + {um} + {uh}, 30.0), -30.0)"
    if binomial:
        mu = "1.0 / (1.0 + exp(-eta))"
        wc = "greatest(mu * (1.0 - mu), 1e-8) * (cnt0 + cntp)"
        rz = ("greatest(mu * (1.0 - mu), 1e-8) * eta * (cnt0 + cntp) "
              "+ (zh * cnt0 - mu * (cnt0 + cntp))")
    else:
        mu = "exp(eta)"
        if zi_weighted:
            wc = "mu * (cntp + (1.0 - zh) * cnt0)"
            rz = ("mu * eta * (cntp + (1.0 - zh) * cnt0) "
                  "+ (mu / greatest(mu, 1e-12)) "
                  "* ((sy - mu * cntp) + (1.0 - zh) * (0.0 - mu * cnt0))")
        else:
            wc = "mu * (cnt0 + cntp)"
            rz = ("mu * eta * (cnt0 + cntp) "
                  "+ (mu / greatest(mu, 1e-12)) * (sy - mu * (cnt0 + cntp))")
    return f"""{new} AS MATERIALIZED (
  SELECT {_M4X_STATIC},
         b0n AS {b0}, umn AS {um}, uAn AS {uA}, uBn AS {uB},
         greatest(sum(mrep * (umn * umn + ddiag)) OVER wg / nm, 1e-8) AS {s2m},
         greatest((uAn * uAn + uBn * uBn + iAA + iBB) / nh, 1e-8) AS {s2y}{passthrough}
  FROM (
    SELECT *,
           (rg - bg * b0n - mga * uAn - mgb * uBn) / dg AS umn,
           1.0 / dg + (bg * bg * i00 + mga * mga * iAA + mgb * mgb * iBB
             + 2.0 * bg * mga * i0A + 2.0 * bg * mgb * i0B
             + 2.0 * mga * mgb * iAB) / (dg * dg) AS ddiag
    FROM (
      SELECT *,
             (sAA * sBB - sAB * sAB) / det AS i00,
             -(s0A * sBB - s0B * sAB) / det AS i0A,
             (s0A * sAB - s0B * sAA) / det AS i0B,
             (s00 * sBB - s0B * s0B) / det AS iAA,
             -(s00 * sAB - s0A * s0B) / det AS iAB,
             (s00 * sAA - s0A * s0A) / det AS iBB,
             ((sAA * sBB - sAB * sAB) * t0 - (s0A * sBB - s0B * sAB) * tA
               + (s0A * sAB - s0B * sAA) * tB) / det AS b0n,
             (-(s0A * sBB - s0B * sAB) * t0 + (s00 * sBB - s0B * s0B) * tA
               - (s00 * sAB - s0A * s0B) * tB) / det AS uAn,
             ((s0A * sAB - s0B * sAA) * t0 - (s00 * sAB - s0A * s0B) * tA
               + (s00 * sAA - s0A * s0A) * tB) / det AS uBn
      FROM (
        SELECT *,
               s00 * (sAA * sBB - sAB * sAB) - s0A * (s0A * sBB - sAB * s0B)
                 + s0B * (s0A * sAB - sAA * s0B) AS det
        FROM (
          SELECT *,
                 sum(wc) OVER wg - sum(mrep * bg * bg / dg) OVER wg AS s00,
                 sum(ha * wc) OVER wg - sum(mrep * bg * mga / dg) OVER wg AS s0A,
                 sum(hb * wc) OVER wg - sum(mrep * bg * mgb / dg) OVER wg AS s0B,
                 sum(ha * wc) OVER wg + 1.0 / {s2y}
                   - sum(mrep * mga * mga / dg) OVER wg AS sAA,
                 sum(hb * wc) OVER wg + 1.0 / {s2y}
                   - sum(mrep * mgb * mgb / dg) OVER wg AS sBB,
                 -sum(mrep * mga * mgb / dg) OVER wg AS sAB,
                 sum(rz) OVER wg - sum(mrep * bg * rg / dg) OVER wg AS t0,
                 sum(ha * rz) OVER wg - sum(mrep * mga * rg / dg) OVER wg AS tA,
                 sum(hb * rz) OVER wg - sum(mrep * mgb * rg / dg) OVER wg AS tB
          FROM (
            SELECT *,
                   sum(wc) OVER wm AS bg,
                   sum(rz) OVER wm AS rg,
                   sum(ha * wc) OVER wm AS mga,
                   sum(hb * wc) OVER wm AS mgb,
                   sum(wc) OVER wm + 1.0 / {s2m} AS dg
            FROM (
              SELECT *, {wc} AS wc, {rz} AS rz
              FROM (
                SELECT *,
                       CASE WHEN hlvl = 'H1' THEN 1.0 ELSE 0.0 END AS ha,
                       CASE WHEN hlvl = 'H2' THEN 1.0 ELSE 0.0 END AS hb,
                       {eta} AS eta, {mu} AS mu
                FROM {prev}
              )
            ) WINDOW wm AS (PARTITION BY grp, mlvl)
          ) WINDOW wg AS (PARTITION BY grp)
        )
      )
    )
  ) WINDOW wg AS (PARTITION BY grp)
)"""


_M4X_COUNT = {"b0": "b0", "um": "um", "uA": "uA", "uB": "uB",
              "s2m": "s2m", "s2y": "s2y"}
_M4X_ZERO = {"b0": "zb0", "um": "zum", "uA": "zuA", "uB": "zuB",
             "s2m": "zs2m", "s2y": "zs2y"}


def _m4x_prefix_sql(zi: bool) -> list[str]:
    """Shared static CTEs: monthly model frame -> (grp, mlvl, hlvl) cells
    with y==0 / y>0 split counts, level-representative flags, level
    counts, and the engine's initial state (b0 = ln(max(mean y, 1e-8)),
    u = 0, sigma2 = 1; zi adds zb0 = -1, zhat = 0.5 on zero rows)."""
    y_expr = ("CASE WHEN month(period) % 5 = 0 THEN 0.0 ELSE y END"
              if zi else "y")
    zi_init = (", -1.0 AS zb0, 0.0 AS zum, 0.0 AS zuA, 0.0 AS zuB,"
               " 1.0 AS zs2m, 1.0 AS zs2y,"
               " CASE WHEN cnt0 > 0 THEN 0.5 ELSE 0.0 END AS zh"
               if zi else "")
    return [f"""monthly AS (
  SELECT o_orderpriority AS grp,
         date_trunc('month', o_orderdate) AS period,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2
)""", f"""data AS (
  SELECT grp, strftime(period, '%m') AS mlvl,
         CASE WHEN year(period) <= 1997 THEN 'H1' ELSE 'H2' END AS hlvl,
         {y_expr} AS yv
  FROM monthly
)""", """cell AS MATERIALIZED (
  SELECT grp, mlvl, hlvl,
         CAST(sum(CASE WHEN yv = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS cnt0,
         CAST(sum(CASE WHEN yv <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS cntp,
         sum(yv) AS sy
  FROM data GROUP BY grp, mlvl, hlvl
)""", """base AS (
  SELECT grp, mlvl, hlvl, cnt0, cntp, sy,
         CASE WHEN row_number() OVER (PARTITION BY grp, mlvl ORDER BY hlvl) = 1
              THEN 1.0 ELSE 0.0 END AS mrep,
         CASE WHEN row_number() OVER (PARTITION BY grp, hlvl ORDER BY mlvl) = 1
              THEN 1.0 ELSE 0.0 END AS hrep,
         CASE WHEN row_number() OVER (PARTITION BY grp ORDER BY mlvl, hlvl) = 1
              THEN 1.0 ELSE 0.0 END AS grep
  FROM cell
)""", f"""it0 AS MATERIALIZED (
  SELECT {_M4X_STATIC},
         ln(greatest(sum(sy) OVER wg / nrows, 1e-8)) AS b0,
         0.0 AS um, 0.0 AS uA, 0.0 AS uB, 1.0 AS s2m, 1.0 AS s2y{zi_init}
  FROM (
    SELECT *, sum(mrep) OVER wg AS nm, sum(hrep) OVER wg AS nh,
           sum(cnt0 + cntp) OVER wg AS nrows
    FROM base WINDOW wg AS (PARTITION BY grp)
  ) WINDOW wg AS (PARTITION BY grp)
)"""]


def _m4x_final_sql(last: str, zi: bool) -> str:
    """Emit the long (kind, term, level, estimate) frame from the final
    iteration state: fixed intercept + per-factor variance from the group
    representative, month blups from month representatives, half blups
    from half representatives (the half's u picked by level)."""
    parts = []
    for pfx, c in (("", _M4X_COUNT),) + ((("zi_", _M4X_ZERO),) if zi else ()):
        parts.append(f"""  SELECT grp AS o_orderpriority, '{pfx}fixed' AS kind,
         'intercept' AS term, CAST(NULL AS VARCHAR) AS level,
         round({c['b0']}, 5) AS estimate, n_obs
  FROM fin WHERE grep = 1.0""")
        parts.append(f"""  SELECT grp, '{pfx}variance', 'month',
         CAST(NULL AS VARCHAR), round({c['s2m']}, 5), n_obs
  FROM fin WHERE grep = 1.0""")
        parts.append(f"""  SELECT grp, '{pfx}variance', 'half',
         CAST(NULL AS VARCHAR), round({c['s2y']}, 5), n_obs
  FROM fin WHERE grep = 1.0""")
        parts.append(f"""  SELECT grp, '{pfx}blup', 'month', mlvl,
         round({c['um']}, 5), n_obs
  FROM fin WHERE mrep = 1.0""")
        parts.append(f"""  SELECT grp, '{pfx}blup', 'half', hlvl,
         round(CASE WHEN hlvl = 'H1' THEN {c['uA']} ELSE {c['uB']} END, 5),
         n_obs
  FROM fin WHERE hrep = 1.0""")
    union = "\n  UNION ALL\n".join(parts)
    return f""",
fin AS (
  SELECT *, CAST(nrows AS BIGINT) AS n_obs FROM {last}
)
SELECT * FROM (
{union}
)
ORDER BY o_orderpriority, kind, term, level
"""


def _m4_crossed_sql(iters: int = _M4X_ITERS) -> str:
    """Plain crossed poisson GLMM oracle: {iters} unrolled PQL steps."""
    ctes = _m4x_prefix_sql(zi=False)
    for i in range(1, iters + 1):
        ctes.append(_m4x_pql_step(f"it{i-1}", f"it{i}", _M4X_COUNT,
                                  zi_weighted=False, binomial=False,
                                  passthrough=""))
    return "WITH " + ",\n".join(ctes) + _m4x_final_sql(f"it{iters}", zi=False)


def _m4zi_crossed_sql(outer: int = _M4ZI_OUTER,
                      inner: int = _M4ZI_INNER) -> str:
    """Zero-inflated crossed GLMM oracle: per outer EM round, {inner}
    weighted-poisson PQL steps (passthrough: zi state + zhat), {inner}
    binomial PQL steps on the zhat working response (passthrough: count
    state + zhat), then the responsibility update
    zhat = pi / max(pi + (1-pi) e^(-mu), 1e-12) on zero cells."""
    zcols = ", ".join(f"{_M4X_ZERO[k]}" for k in
                      ("b0", "um", "uA", "uB", "s2m", "s2y"))
    ccols = ", ".join(f"{_M4X_COUNT[k]}" for k in
                      ("b0", "um", "uA", "uB", "s2m", "s2y"))
    ctes = _m4x_prefix_sql(zi=True)
    n = 0
    for _ in range(outer):
        for _ in range(inner):
            n += 1
            ctes.append(_m4x_pql_step(
                f"it{n-1}", f"it{n}", _M4X_COUNT, zi_weighted=True,
                binomial=False, passthrough=f", {zcols}, zh"))
        for _ in range(inner):
            n += 1
            ctes.append(_m4x_pql_step(
                f"it{n-1}", f"it{n}", _M4X_ZERO, zi_weighted=False,
                binomial=True, passthrough=f", {ccols}, zh"))
        n += 1
        ctes.append(f"""it{n} AS MATERIALIZED (
  SELECT {_M4X_STATIC}, {ccols}, {zcols},
         CASE WHEN cnt0 > 0
              THEN pi / greatest(pi + (1.0 - pi) * exp(-mu), 1e-12)
              ELSE 0.0 END AS zh
  FROM (
    SELECT *,
           exp(greatest(least(b0 + um
             + CASE WHEN hlvl = 'H1' THEN uA ELSE uB END, 30.0), -30.0)) AS mu,
           1.0 / (1.0 + exp(-greatest(least(zb0 + zum
             + CASE WHEN hlvl = 'H1' THEN zuA ELSE zuB END, 30.0), -30.0))) AS pi
    FROM it{n-1}
  )
)""")
    return "WITH " + ",\n".join(ctes) + _m4x_final_sql(f"it{n}", zi=True)


# --- M4b: single-random-intercept GLMM with an exact Henderson/arrowhead oracle ---------

# Pinned PQL iteration count for the hash-checked single-RI variant: tol=0
# on both sides so exactly this many IRLS+EM steps run.  With one random
# factor Henderson's penalized system is an ARROWHEAD matrix
# [[a, b^T], [b, D]] (D diagonal: one-hot Z makes level-level cross terms
# vanish), so the solve AND the EM update's tr(Ainv[blk,blk]) have closed
# forms via the Schur complement s = a - sum(b_g^2/D_g):
#   beta0 = (r0 - sum(b_g r_g / D_g)) / s
#   u_g   = (r_g - b_g beta0) / D_g
#   diag(Ainv)_g = 1/D_g + (b_g/D_g)^2 / s
# Per-iteration float paths (numpy inv vs closed form) differ, but PQL is a
# contraction on these well-conditioned monthly counts — both engines sit on
# the same fixed point long before iteration 40, and estimates round to 5dp
# (same argument as _M4_ITERS above).
_M4B_ITERS = 40


def m4b_glmm_1ri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked M4 entry: Poisson GLMM ``n_orders ~ (1|month)`` per
    priority — the same PQL/Henderson/EM code path as m4_glmm
    (R/model-catch.R:80-138's random-intercept structure) restricted to one
    factor so the oracle can replay the solve in closed form."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        glmm_random_intercepts,
    )

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    frame = monthly.select(
        "o_orderpriority",
        "n_orders",
        F.date_format("period", "MM").alias("month"),
    )
    fits = glmm_random_intercepts(
        frame, ["o_orderpriority"], "n_orders", ["month"],
        family="poisson", max_iter=_M4B_ITERS, tol=0.0,
    )
    return fits.select(
        "o_orderpriority", "kind", "term", "level",
        F.round("estimate", 5).alias("estimate"), "n_obs",
    ).orderBy("o_orderpriority", "kind", "term", "level")


def _m4b_glmm_sql(iters: int = _M4B_ITERS) -> str:
    """Unrolled PQL, window-function form: the per-iteration state is ONE
    materialized CTE per iteration (grp, lvl, cnt, sy, u, b0, s2) and every
    per-group reduction is a window sum over an explicit lvl-ordered frame —
    ZERO per-iteration joins.

    Why: the previous form (5 materialized CTEs + ~8 hash joins per
    iteration x 40 iterations) exceeded DuckDB's memory accounting at any
    tested memory_limit up to 400 MB — each join's hash table carries a
    ~2 MB block-granular minimum and the deep CTE DAG keeps them alive
    together, so the oracle OOM'd whenever the driver host ran DuckDB
    with a constrained memory_limit (the e22 lesson, r04). The window form
    runs at memory_limit='100MB' with 40 iterations.

    The rewrite is closed-form per (grp, lvl) cell: mu and eta are constant
    within a cell (eta = b0 + u), so the per-row working-response sums
    collapse to cnt*mu and cnt*mu*eta + k*(sy - cnt*mu) with
    k = mu/greatest(mu, 1e-12). Verified BIT-IDENTICAL to the previous
    row-wise form at sf0.001/0.01/0.1 (all 70 output rows equal)."""
    W = ("WINDOW w AS (PARTITION BY grp ORDER BY lvl "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)")
    ctes = ["""data AS (
  SELECT o_orderpriority AS grp,
         strftime(date_trunc('month', o_orderdate), '%m') AS lvl,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
)""", """st0 AS (
  SELECT grp, ln(greatest(avg(y), 1e-8)) AS b0 FROM data GROUP BY grp
)""", """cell AS (
  SELECT grp, lvl, CAST(count(*) AS DOUBLE) AS cnt, sum(y) AS sy
  FROM data GROUP BY grp, lvl
)""", """it0 AS MATERIALIZED (
  SELECT c.grp, c.lvl, c.cnt, c.sy, 0.0::DOUBLE AS u, s.b0, 1.0::DOUBLE AS s2
  FROM cell c JOIN st0 s ON s.grp = c.grp
)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""it{i} AS MATERIALIZED (
  SELECT grp, lvl, cnt, sy, u, b0,
         greatest((sum(u * u) OVER w
                   + sum(vr) OVER w) / (count(*) OVER w), 1e-8) AS s2
  FROM (
    SELECT grp, lvl, cnt, sy,
           (rg - bg * (r0 - sbrd) / (a - sb2d)) / (bg + inv_s2) AS u,
           (r0 - sbrd) / (a - sb2d) AS b0,
           1.0 / (bg + inv_s2)
             + (bg / (bg + inv_s2)) * (bg / (bg + inv_s2)) / (a - sb2d) AS vr
    FROM (
      SELECT grp, lvl, cnt, sy, bg, rg, inv_s2,
             sum(bg) OVER w AS a,
             sum(rg) OVER w AS r0,
             sum(bg * bg / (bg + inv_s2)) OVER w AS sb2d,
             sum(bg * rg / (bg + inv_s2)) OVER w AS sbrd
      FROM (
        SELECT grp, lvl, cnt, sy,
               cnt * mu AS bg,
               cnt * mu * eta
                 + (mu / greatest(mu, 1e-12)) * (sy - cnt * mu) AS rg,
               1.0 / s2 AS inv_s2
        FROM (SELECT grp, lvl, cnt, sy, u, s2,
                     greatest(least(b0 + u, 30.0), -30.0) AS eta,
                     exp(greatest(least(b0 + u, 30.0), -30.0)) AS mu
              FROM it{i - 1})
      ) {W}
    ) {W}
  ) {W}
)""")
    return (
        "WITH " + ",\n".join(ctes) + f""",
fin AS (
  SELECT grp, lvl, u, b0, s2,
         CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n_obs,
         row_number() OVER (PARTITION BY grp ORDER BY lvl) AS rn
  FROM it{iters}
)
SELECT * FROM (
  SELECT grp AS o_orderpriority, 'fixed' AS kind, 'intercept' AS term,
         CAST(NULL AS VARCHAR) AS level, round(b0, 5) AS estimate, n_obs
  FROM fin WHERE rn = 1
  UNION ALL
  SELECT grp, 'variance', 'month', CAST(NULL AS VARCHAR), round(s2, 5), n_obs
  FROM fin WHERE rn = 1
  UNION ALL
  SELECT grp, 'blup', 'month', lvl, round(u, 5), n_obs FROM fin
)
ORDER BY o_orderpriority, kind, term, level
"""
    )



# --- M5: seeded multiple-imputation analogue (rows-only check) --------------------------

def m5_impute_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked since round 2: the md5-derived replicate draws are
    recomputed identically by the DuckDB oracle (see the operator's
    redefinition note). Exact-cents monthly averages + floor-quantized
    output, per the m7 float-tie discipline."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100)) / F.count(F.lit(1)) / 100.0,
            6,
        ).alias("avg_price")
    )
    gappy = monthly.withColumn(
        "avg_price", F.when(F.month("period") % 4 != 0, F.col("avg_price"))
    )
    out = impute_mean_replicates(
        gappy, ["o_orderpriority"], "period", "avg_price", m=5, seed=666
    )
    return out.select(
        "o_orderpriority",
        "period",
        (F.floor(F.col("avg_price") * 1e4 + 0.5) / 1e4).alias("avg_price"),
        "is_imputed",
    )


M5_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         round(sum(round(o_totalprice * 100)) / count(*) / 100.0, 6) AS avg_price
  FROM orders GROUP BY 1, 2
), gappy AS (
  SELECT o_orderpriority, period,
         CASE WHEN month(period) % 4 <> 0 THEN avg_price END AS v
  FROM monthly
), stats AS (
  SELECT *,
    coalesce(avg(v) OVER (PARTITION BY o_orderpriority), 0) AS base,
    coalesce(stddev_pop(v) OVER (PARTITION BY o_orderpriority), 0) AS sd,
    concat_ws(chr(31), '666', o_orderpriority, CAST(period AS VARCHAR)) AS ik
  FROM gappy
)
SELECT o_orderpriority, period,
  floor((CASE WHEN v IS NOT NULL THEN v ELSE
    base + 2.0 * 0.1 * sd * (list_sum(list_transform(generate_series(0, 4),
      r -> ('0x' || substr(md5(concat(ik, '#', CAST(r AS VARCHAR))), 1, 12))::BIGINT
           / 281474976710656.0 - 0.5)) / 5)
  END) * 1e4 + 0.5) / 1e4 AS avg_price,
  v IS NULL AS is_imputed
FROM stats
"""


# --- M6: predictive-mean-matching imputation (mice pmm analogue) ------------------------

def m6_pmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMM imputation of the gappy monthly price series (every 4th month
    nulled, as in m5): exact-cents integer values, month-index predictor,
    md5-seeded donor draws from the 5 nearest-predicted-mean observed
    donors, replicates averaged (operators/estimate.py::
    impute_pmm_replicates — the mice(method='pmm') analogue the reference
    runs at R/model-catch.R:465-516)."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        impute_pmm_replicates,
    )

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(
        F.expr(
            "cast(sum(cast(round(o_totalprice * 100) as long)) div count(*) as long)"
        ).alias("price_cents")
    )
    gappy = monthly.select(
        "o_orderpriority",
        "period",
        F.when(F.month("period") % 4 != 0, F.col("price_cents")).alias("price_cents"),
        F.months_between(F.col("period"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("month_idx"),
    )
    out = impute_pmm_replicates(
        gappy, ["o_orderpriority"], "period", "month_idx", "price_cents",
        m=5, donors=5, seed=666,
    )
    return out.select(
        "o_orderpriority",
        "period",
        F.round(F.col("price_cents") / 100.0, 6).alias("avg_price"),
        "is_imputed",
    )


M6_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS grp,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // count(*) AS BIGINT) AS pc
  FROM orders GROUP BY 1, 2
), gappy AS (
  SELECT grp, period,
         CASE WHEN month(period) % 4 <> 0 THEN pc END AS y,
         CAST(datediff('month', DATE '1995-01-01', period) AS BIGINT) AS x
  FROM monthly
), coef AS (
  SELECT grp,
         CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) <> 0
              THEN count(*) * sum(x * y) - sum(x) * sum(y)
              ELSE 0 END AS nb
  FROM gappy WHERE y IS NOT NULL GROUP BY grp
), miss AS (
  SELECT g.grp, g.period, g.x AS xm, c.nb
  FROM gappy g JOIN coef c USING (grp) WHERE g.y IS NULL
), don AS (
  SELECT grp, x AS xd, y AS yd, period AS od FROM gappy WHERE y IS NOT NULL
), ranked AS (
  SELECT m.grp, m.period, d.yd,
         row_number() OVER (PARTITION BY m.grp, m.period
                            ORDER BY abs(m.nb * (m.xm - d.xd)), d.od) AS rk
  FROM miss m JOIN don d ON d.grp = m.grp
), pool AS (
  SELECT grp, period, list(yd ORDER BY rk) AS pl
  FROM ranked WHERE rk <= 5 GROUP BY grp, period
), drawn AS (
  SELECT grp, period,
         list_sum(list_transform(generate_series(0, 4), r ->
           pl[CAST(('0x' || substr(md5(concat(
                concat_ws(chr(31), '666', grp, CAST(period AS VARCHAR)),
                '#', CAST(r AS VARCHAR))), 1, 12))::BIGINT % len(pl)
              AS INTEGER) + 1]
         )) / 5.0 AS fill
  FROM pool
)
SELECT g.grp AS o_orderpriority, g.period,
       round((CASE WHEN g.y IS NOT NULL THEN CAST(g.y AS DOUBLE)
                   ELSE d.fill END) / 100.0, 6) AS avg_price,
       g.y IS NULL AS is_imputed
FROM gappy g LEFT JOIN drawn d ON d.grp = g.grp AND d.period = g.period
"""


QUERIES = {
    "m2_length_weight": (m2_length_weight, M2_ORACLE),
    "m2b_length_weight_ll": (m2b_length_weight_ll, M2B_ORACLE),
    "m8_species_resolution": (m8_species_resolution, M8_ORACLE),
    "m3_ols_cooks": (m3_ols_cooks, M3_ORACLE),
    "m7_interpolation": (m7_interpolation, M7_ORACLE),
    "m9_share_redistribution": (m9_share_redistribution, M9_ORACLE),
    "m4_poisson_glm": (m4_poisson_glm, _m4_irls_sql()),
    "m4_glmm": (m4_glmm, _m4_crossed_sql()),
    "m4b_glmm_1ri": (m4b_glmm_1ri, _m4b_glmm_sql()),
    "m4zi_glmm": (m4zi_glmm, _m4zi_crossed_sql()),
    "m5_impute_replicates": (m5_impute_replicates, M5_ORACLE),
    "m6_pmm": (m6_pmm, M6_ORACLE),
}


# --- M10: Poisson bootstrap CI ----------------------------------------------------------

def m10_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean discount cents per return flag via the
    Poisson bootstrap — 16 md5-deterministic replicates, ALL computed in
    one aggregation pass. The oracle replays every draw, every replicate
    mean, and the percentile CI."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        poisson_bootstrap_ci,
    )

    li = load(spark, sf_dir, "lineitem").withColumn(
        "disc_cents", F.round(F.col("l_discount") * 100).cast("long")
    )
    row_key = F.concat_ws(
        "#",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
    )
    return poisson_bootstrap_ci(
        li, ["l_returnflag"], "disc_cents", row_key, n_resamples=16
    )


def _m10_sql() -> str:
    cums = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
            0.9810118431238462, 0.9963401531726563)
    import math as _math
    hex_cuts = [format(_math.floor(c * 65536) - 1, "04x") for c in cums]
    chain = " || ".join(f"md5(rk || '~{j}')" for j in range(2))
    wcols = []
    for b in range(16):
        piece = f"substr(chain, {1 + 4 * b}, 4)"
        w = " + ".join(f"CAST({piece} > '{h}' AS INTEGER)" for h in hex_cuts)
        wcols.append(f"CAST({w} AS BIGINT) AS w{b}")
    sums = ", ".join(
        f"CAST(sum(w{b} * v) AS BIGINT) AS swv{b}, "
        f"CAST(sum(w{b}) AS BIGINT) AS sw{b}"
        for b in range(16)
    )
    arms = " UNION ALL ".join(
        f"SELECT l_returnflag, CASE WHEN sw{b} > 0 "
        f"THEN swv{b} / CAST(sw{b} AS DOUBLE) END AS m FROM agged"
        for b in range(16)
    )
    return f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(round(l_discount * 100) AS BIGINT) AS v,
         concat_ws('#', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
                   CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)) AS rk
  FROM lineitem
), chained AS (
  SELECT l_returnflag, v, {chain} AS chain FROM base
), weighted AS (
  SELECT l_returnflag, v, {", ".join(wcols)} FROM chained
), agged AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
         {sums}
  FROM weighted GROUP BY l_returnflag
), reps AS ({arms}),
cis AS (
  SELECT l_returnflag,
         round(quantile_cont(m, 0.025), 6) AS ci_lo,
         round(quantile_cont(m, 0.975), 6) AS ci_hi
  FROM reps GROUP BY l_returnflag
)
SELECT a.l_returnflag, a.n AS n_rows,
       round(a.sv / CAST(a.n AS DOUBLE), 6) AS mean,
       c.ci_lo, c.ci_hi
FROM agged a JOIN cis c USING (l_returnflag)
"""


QUERIES["m10_poisson_bootstrap"] = (m10_poisson_bootstrap, _m10_sql())


# --- M11: Theil-Sen robust slope per group ----------------------------------------------

def m11_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of the monthly order-count trend per priority:
    the MEDIAN of all pairwise slopes — robust to outlier months where
    the m4 GLM's least squares is not. Slopes are exact-integer ratios
    evaluated once in double (identical in both engines, so their
    ordering can't flip); the median is rank arithmetic over the sorted
    slope set (the m2b idiom — no percentile buffers), with the even-n
    midpoint averaged from two exact doubles.

    Scale shape: the pairwise self-join is per GROUP (n ~ 80 months →
    ~3k pairs), never corpus-wide; groups fan out across executors. The
    group-local O(n^2) is the estimator's own definition (production
    Theil-Sen at larger n subsamples pairs first)."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    m = monthly.select(
        "o_orderpriority",
        F.months_between(F.col("period"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.col("n_orders").cast("long").alias("y"),
    )
    a = m.select("o_orderpriority", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = m.select("o_orderpriority", F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "o_orderpriority")
        .filter(F.col("x1") < F.col("x2"))
        .select(
            "o_orderpriority",
            ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))).alias("s"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("s")
    ranked = slopes.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority"))
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return mid.groupBy("o_orderpriority").agg(
        F.round(F.avg("s"), 6).alias("theil_sen_slope"),
        F.max("n").cast("long").alias("n_pairs"),
    )


M11_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(datediff('month', DATE '1995-01-01',
                       date_trunc('month', o_orderdate)) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
), slopes AS (
  SELECT a.o_orderpriority,
         (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS s
  FROM monthly a JOIN monthly b
    ON a.o_orderpriority = b.o_orderpriority AND a.x < b.x
), ranked AS (
  SELECT o_orderpriority, s,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY s) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM slopes
)
SELECT o_orderpriority,
       round(avg(s), 6) AS theil_sen_slope,
       CAST(max(n) AS BIGINT) AS n_pairs
FROM ranked
WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
GROUP BY o_orderpriority
"""

QUERIES["m11_theil_sen"] = (m11_theil_sen, M11_ORACLE)


# --- M12: Mann-Kendall trend test per group ---------------------------------------------

def m12_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the monthly order counts per
    priority — the nonparametric partner of m11's Theil-Sen slope. The
    statistic S = sum of sign(y2 - y1) over ordered pairs and the
    tie-corrected variance are EXACT integers; only the final z (with the
    continuity correction) touches floats, off exact operands, rounded.

    Same group-local pairwise shape as m11 — the join is per group and
    the test is defined on series that fit a group."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.to_date("o_orderdate"), "month").alias("period"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    m = monthly.select(
        "o_orderpriority",
        F.months_between(F.col("period"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.col("n_orders").cast("long").alias("y"),
    )
    a = m.select("o_orderpriority", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = m.select("o_orderpriority", F.col("x").alias("x2"), F.col("y").alias("y2"))
    s_stat = (
        a.join(b, "o_orderpriority")
        .filter(F.col("x1") < F.col("x2"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long")).alias("S"))
    )
    ties = (
        m.groupBy("o_orderpriority", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("__g__"),
            F.sum(F.col("t")).alias("n"),
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias("tie_adj"),
        )
    )
    joined = s_stat.join(ties, "o_orderpriority")
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_adj")
    )
    z = F.when(
        F.col("S") > 0, (F.col("S") - 1) / F.sqrt(var18 / F.lit(18.0))
    ).when(
        F.col("S") < 0, (F.col("S") + 1) / F.sqrt(var18 / F.lit(18.0))
    ).otherwise(F.lit(0.0))
    return joined.select(
        "o_orderpriority",
        F.col("S").alias("s_stat"),
        F.col("n").cast("long").alias("n_points"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("trend_detected"),
    )


M12_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(datediff('month', DATE '1995-01-01',
                       date_trunc('month', o_orderdate)) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
), s_stat AS (
  SELECT a.o_orderpriority,
         CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS S
  FROM monthly a JOIN monthly b
    ON a.o_orderpriority = b.o_orderpriority AND a.x < b.x
  GROUP BY a.o_orderpriority
), ties AS (
  SELECT o_orderpriority, CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj
  FROM (SELECT o_orderpriority, y, count(*) AS t FROM monthly GROUP BY o_orderpriority, y)
  GROUP BY o_orderpriority
)
SELECT s.o_orderpriority, s.S AS s_stat, t.n AS n_points,
       round(CASE WHEN s.S > 0 THEN (s.S - 1) / sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_adj) / 18.0)
                  WHEN s.S < 0 THEN (s.S + 1) / sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_adj) / 18.0)
                  ELSE 0.0 END, 6) AS z,
       abs(CASE WHEN s.S > 0 THEN (s.S - 1) / sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_adj) / 18.0)
                WHEN s.S < 0 THEN (s.S + 1) / sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_adj) / 18.0)
                ELSE 0.0 END) > 1.96 AS trend_detected
FROM s_stat s JOIN ties t USING (o_orderpriority)
"""

QUERIES["m12_mann_kendall"] = (m12_mann_kendall, M12_ORACLE)


# --- M13: Benjamini-Hochberg FDR over a panel of A/B metrics ---------------------------

# metric name -> per-user conversion predicate (variant = user_id parity,
# the a29 experiment design, read out across SIX metrics at once — the
# multiple-comparisons setting BH exists for)
_M13_METRICS = {
    "purchase_gt100": "event_type = 'purchase' AND value > 100",
    "any_purchase": "event_type = 'purchase'",
    "any_click": "event_type = 'click'",
    "any_error": "event_type = 'error'",
    "any_signup": "event_type = 'signup'",
    "value_gt200": "value > 200",
}

# Abramowitz-Stegun 26.2.17 polynomial tail of the standard normal CDF:
# the one transcendental is exp(); every coefficient is written as the
# SAME literal in both engines so the expression trees are identical
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def m13_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six two-proportion z-tests (user_id-parity variants, one per
    metric) -> two-sided normal p-values (Abramowitz-Stegun 26.2.17
    polynomial, identical literal trees in both engines) ->
    Benjamini-Hochberg step-up at alpha=0.05
    (operators/estimate.py::bh_adjust). The experimentation-platform
    readout: which metric movements survive multiple-comparison
    control."""
    from peskas_timor_data_pipeline_spark.operators.estimate import bh_adjust

    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        *[
            F.max(F.when(F.expr(pred), 1).otherwise(0)).alias(f"c_{name}")
            for name, pred in _M13_METRICS.items()
        ]
    ).select((F.col("user_id") % 2).alias("variant"), *[f"c_{n}" for n in _M13_METRICS])
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[F.sum(f"c_{n}").cast("long").alias(f"s_{n}") for n in _M13_METRICS],
    )
    a = per.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("na"), *[F.col(f"s_{n}").alias(f"ca_{n}") for n in _M13_METRICS]
    )
    b = per.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("nb"), *[F.col(f"s_{n}").alias(f"cb_{n}") for n in _M13_METRICS]
    )
    j = a.crossJoin(b)

    def z_of(n: str):
        pa = F.col(f"ca_{n}") / F.col("na")
        pb = F.col(f"cb_{n}") / F.col("nb")
        pool = (F.col(f"ca_{n}") + F.col(f"cb_{n}")) / (F.col("na") + F.col("nb"))
        se = F.sqrt(pool * (1 - pool) * (1 / F.col("na") + 1 / F.col("nb")))
        return F.when(se > 0, (pa - pb) / se)

    wide = j.select(
        "na", "nb",
        *[F.col(f"ca_{n}") for n in _M13_METRICS],
        *[F.col(f"cb_{n}") for n in _M13_METRICS],
        *[z_of(n).alias(f"z_{n}") for n in _M13_METRICS],
    )
    stack_args = ", ".join(
        f"'{n}', ca_{n}, cb_{n}, z_{n}" for n in _M13_METRICS
    )
    long = wide.select(
        "na", "nb",
        F.expr(
            f"stack({len(_M13_METRICS)}, {stack_args}) as (metric, conv_a, conv_b, z)"
        ),
    )
    az = F.abs(F.col("z"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    b1, b2, b3, b4, b5 = (F.lit(c) for c in _AS_B)
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    phi = F.exp(-az * az / F.lit(2.0)) * F.lit(_INV_SQRT_2PI)
    scored = long.select(
        "metric", "na", "conv_a", "nb", "conv_b",
        F.round("z", 6).alias("z_stat"),
        F.round(F.lit(2.0) * phi * poly, 6).alias("p_value"),
    )
    return bh_adjust(scored, "metric", "p_value", alpha=0.05, m=len(_M13_METRICS))


def _m13_sql() -> str:
    convs = ",\n         ".join(
        f"max(CASE WHEN {pred} THEN 1 ELSE 0 END) AS c_{name}"
        for name, pred in _M13_METRICS.items()
    )
    sums = ", ".join(f"CAST(sum(c_{n}) AS BIGINT) AS s_{n}" for n in _M13_METRICS)
    stack_rows = "\n    UNION ALL ".join(
        f"SELECT '{n}' AS metric, na, ca_{n} AS conv_a, nb, cb_{n} AS conv_b,"
        f" z_{n} AS z FROM wide"
        for n in _M13_METRICS
    )

    def z_sql(n: str) -> str:
        return (
            f"CASE WHEN sqrt(((ca_{n} + cb_{n}) / (na + nb))"
            f" * (1 - (ca_{n} + cb_{n}) / (na + nb)) * (1 / na + 1 / nb)) > 0"
            f" THEN (ca_{n} / na - cb_{n} / nb)"
            f" / sqrt(((ca_{n} + cb_{n}) / (na + nb))"
            f" * (1 - (ca_{n} + cb_{n}) / (na + nb)) * (1 / na + 1 / nb))"
            f" END AS z_{n}"
        )

    zs = ",\n         ".join(z_sql(n) for n in _M13_METRICS)
    b1, b2, b3, b4, b5 = _AS_B
    return f"""
WITH users AS (
  SELECT user_id % 2 AS variant,
         {convs}
  FROM events GROUP BY user_id
), per AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users, {sums}
  FROM users GROUP BY variant
), a AS (SELECT n_users AS na, {", ".join(f"s_{n} AS ca_{n}" for n in _M13_METRICS)} FROM per WHERE variant = 0),
b AS (SELECT n_users AS nb, {", ".join(f"s_{n} AS cb_{n}" for n in _M13_METRICS)} FROM per WHERE variant = 1),
wide AS (
  SELECT na, nb,
         {", ".join(f"ca_{n}" for n in _M13_METRICS)},
         {", ".join(f"cb_{n}" for n in _M13_METRICS)},
         {zs}
  FROM a CROSS JOIN b
), longf AS (
    {stack_rows}
), scored AS MATERIALIZED (
  SELECT metric, na, conv_a, nb, conv_b,
         round(z, 6) AS z_stat,
         round(2.0::DOUBLE
               * (exp(-abs(z) * abs(z) / 2.0::DOUBLE) * {_INV_SQRT_2PI}::DOUBLE)
               * ((1.0::DOUBLE / (1.0::DOUBLE + 0.2316419::DOUBLE * abs(z)))
                  * ({b1}::DOUBLE
                     + (1.0::DOUBLE / (1.0::DOUBLE + 0.2316419::DOUBLE * abs(z)))
                     * ({b2}::DOUBLE
                        + (1.0::DOUBLE / (1.0::DOUBLE + 0.2316419::DOUBLE * abs(z)))
                        * ({b3}::DOUBLE
                           + (1.0::DOUBLE / (1.0::DOUBLE + 0.2316419::DOUBLE * abs(z)))
                           * ({b4}::DOUBLE
                              + (1.0::DOUBLE / (1.0::DOUBLE + 0.2316419::DOUBLE * abs(z)))
                              * {b5}::DOUBLE))))), 6) AS p_value
  FROM longf
), ranked AS MATERIALIZED (
  SELECT *, row_number() OVER (ORDER BY p_value, metric) AS bh_rank
  FROM scored WHERE p_value IS NOT NULL
), kmax AS (
  SELECT max(CASE WHEN p_value <= CAST(bh_rank AS DOUBLE) * 0.05::DOUBLE / 6.0::DOUBLE
                  THEN bh_rank END) AS k FROM ranked
)
SELECT r.metric, r.na, r.conv_a, r.nb, r.conv_b, r.z_stat, r.p_value,
       CAST(r.bh_rank AS INTEGER) AS bh_rank,
       r.bh_rank <= coalesce(k.k, 0) AS significant
FROM ranked r CROSS JOIN kmax k
UNION ALL
SELECT metric, na, conv_a, nb, conv_b, z_stat, p_value,
       CAST(NULL AS INTEGER) AS bh_rank, FALSE AS significant
FROM scored WHERE p_value IS NULL
"""


QUERIES["m13_bh_fdr"] = (m13_bh_fdr, _m13_sql())


# --- M14: Chapman capture-recapture --------------------------------------------------------

def m14_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman's bias-corrected two-pass population estimate
    (operators/estimate.py::chapman_estimate) — the Lincoln-Petersen
    family used for boat/fisher population sizing: pass 1 = customers
    seen in 1-in-3 orders, pass 2 = customers in 1-in-5 orders, overlap
    via semi-join. Integer n_hat by truncating div (all terms
    non-negative); Seber variance as a floored per-row double (its exact
    integer numerator can pass 2^63)."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        chapman_estimate,
    )

    o = load(spark, sf_dir, "orders")
    first = o.filter(F.col("o_orderkey") % 3 == 0).select("o_custkey")
    second = o.filter(F.col("o_orderkey") % 5 == 0).select("o_custkey")
    return chapman_estimate(first, second, "o_custkey")


M14_ORACLE = """
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 3 = 0),
s AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 5 = 0),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s) AS n2,
         (SELECT CAST(count(*) AS BIGINT)
          FROM f WHERE o_custkey IN (SELECT o_custkey FROM s)) AS m
)
SELECT n1, n2, m,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS n_hat,
       CAST(floor(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                  * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
                  / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                     * CAST(m + 2 AS DOUBLE))) AS BIGINT) AS var_floor
FROM stats
"""

QUERIES["m14_capture_recapture"] = (m14_capture_recapture, M14_ORACLE)


# --- M15: two-sample Kolmogorov-Smirnov drift test -----------------------------------------

def m15_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators/estimate.py::ks_two_sample):
    KS D between the click and purchase event-value distributions on a
    1/100 value lattice (floor quantization — exact both engines), with
    the Smirnov 5% critical value. Cumulative counts are exact integers;
    the single division/abs/max chain is per-row + order-independent, so
    no pinned-fold machinery is needed."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        ks_two_sample,
    )

    e = load(spark, sf_dir, "events")
    return ks_two_sample(e, "event_type", "value", "click", "purchase")


M15_ORACLE = """
WITH t AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS bin,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
), pb AS MATERIALIZED (
  SELECT bin, CAST(sum(ia) AS BIGINT) AS ca, CAST(sum(ib) AS BIGINT) AS cb
  FROM t GROUP BY bin
), cum AS MATERIALIZED (
  SELECT CAST(sum(ca) OVER (ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER (ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
  FROM pb
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM pb
), agg AS (
  SELECT max(n_a) AS n_a, max(n_b) AS n_b,
         max(CASE WHEN n_a > 0 AND n_b > 0 THEN
             abs(CAST(cum_a AS DOUBLE) / n_a - CAST(cum_b AS DOUBLE) / n_b)
             END) AS d
  FROM cum CROSS JOIN tot
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN round(d, 6) END AS d_stat,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         round(1.358::DOUBLE * sqrt(CAST(n_a + n_b AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6)
       END AS d_crit_95,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST(d > 1.358::DOUBLE * sqrt(CAST(n_a + n_b AS DOUBLE)
              / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS INTEGER)
       END AS drift_95
FROM agg
"""

QUERIES["m15_ks_drift"] = (m15_ks_drift, M15_ORACLE)


# --- M16: isotonic calibration (closed-form PAV) --------------------------------------------

def m16_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned isotonic calibration (operators/estimate.py::isotonic_fit,
    minimax form of pool-adjacent-violators): scores are the fractional
    parts of event values (uniform [0,1)), labels are md5-seeded
    Bernoulli draws with P(y=1)=score — calibrated by construction, so
    the monotone fit should hug the diagonal. Bin means are exact-integer
    ratios; running-min/max over doubles are order-independent."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        isotonic_fit,
    )

    e = load(spark, sf_dir, "events")
    scored = e.filter(F.col("value").isNotNull()).select(
        (F.col("value") - F.floor(F.col("value"))).alias("p"),
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long") % 1000000
            < F.floor(
                (F.col("value") - F.floor(F.col("value"))) * 1000000
            ).cast("long")
        ).cast("int").alias("y"),
    )
    return isotonic_fit(scored, "p", "y", n_bins=20)


M16_ORACLE = """
WITH scored AS MATERIALIZED (
  SELECT value - floor(value) AS p,
         CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000
              < CAST(floor((value - floor(value)) * 1000000) AS BIGINT)
         THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), b AS (
  SELECT least(CAST(floor(p * 20) AS INTEGER), 19) AS bin, y
  FROM scored WHERE p >= 0
), per_bin AS MATERIALIZED (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM b GROUP BY bin
), pre AS MATERIALIZED (
  SELECT bin, n, pos,
         CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         CAST(sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
  FROM per_bin
), pairs AS MATERIALIZED (
  SELECT lo.bin AS i, hi.bin AS j,
         CAST(hi.cp - (lo.cp - lo.pos) AS DOUBLE)
         / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS avg
  FROM pre lo JOIN pre hi ON lo.bin <= hi.bin
), rmins AS MATERIALIZED (
  SELECT i, j,
         min(avg) OVER (PARTITION BY i ORDER BY j DESC
                        ROWS UNBOUNDED PRECEDING) AS rm
  FROM pairs
), iso AS (
  SELECT j AS bin, max(rm) AS iso FROM rmins GROUP BY j
)
SELECT CAST(pb.bin AS INTEGER) AS bin,
       round(pb.bin / 20.0, 6) AS bin_lo,
       pb.n, pb.pos,
       round(CAST(pb.pos AS DOUBLE) / pb.n, 6) AS frac_pos,
       round(iso.iso, 6) AS iso_p
FROM per_bin pb JOIN iso USING (bin)
"""

QUERIES["m16_isotonic_calibration"] = (m16_isotonic_calibration, M16_ORACLE)


# --- M17: Mann-Whitney U rank-sum test ---------------------------------------------------

def m17_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum location-shift test (operators/estimate.py::
    mann_whitney_u) between the click and purchase event-value
    distributions on the same 1/100 lattice as the KS monitor (m15):
    midranks are exact half-integers accumulated as DECIMAL(38,0), the
    tie-corrected z is one fixed IEEE expression over those exact
    moments."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        mann_whitney_u,
    )

    e = load(spark, sf_dir, "events")
    return mann_whitney_u(e, "event_type", "value", "click", "purchase")


M17_ORACLE = """
WITH t AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS bin,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
), pb AS MATERIALIZED (
  SELECT bin, CAST(sum(ia) AS HUGEINT) AS ca,
         CAST(sum(ia) + sum(ib) AS HUGEINT) AS t
  FROM t GROUP BY bin
), cum AS MATERIALIZED (
  SELECT ca, t,
         CAST(sum(t) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS HUGEINT)
           AS cum_t
  FROM pb
), mom AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         CAST(sum(t - ca) AS BIGINT) AS n_b,
         sum(ca * (2 * (cum_t - t) + t + 1)) AS r2_a,
         sum(t * t * t - t) AS tie_sum
  FROM cum
), m2 AS (
  SELECT n_a, n_b,
         CAST(r2_a AS DOUBLE)
           - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) AS u2,
         CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
         CAST(tie_sum AS DOUBLE) AS ties
  FROM mom
), m3 AS (
  SELECT *,
         CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
           * ((n + 1.0) - ties / (n * (n - 1.0))) AS var
  FROM m2
), m4 AS (
  SELECT *,
         (u2 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           / (2.0 * sqrt(var)) AS z,
         (n_a > 0 AND n_b > 0 AND var > 0) AS ok
  FROM m3
)
SELECT n_a, n_b,
       CASE WHEN ok THEN round(u2 / 2.0, 6) END AS u_a,
       CASE WHEN ok THEN round(z, 6) END AS z,
       CASE WHEN ok THEN CAST(abs(z) > 1.959964 AS INTEGER) END AS shift_95
FROM m4
"""

QUERIES["m17_mann_whitney"] = (m17_mann_whitney, M17_ORACLE)


# --- M18: chi-square independence test ---------------------------------------------------

def m18_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table independence QA (operators/estimate.py::
    chi_square_independence) between order status and priority: per-cell
    Pearson contributions in exact integer micro-units, BIGINT-summed
    into the table statistic — no float sum touches the hashed output."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        chi_square_independence,
    )

    o = load(spark, sf_dir, "orders")
    return chi_square_independence(o, "o_orderstatus", "o_orderpriority")


M18_ORACLE = """
WITH cells AS MATERIALIZED (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS obs
  FROM orders GROUP BY o_orderstatus, o_orderpriority
), rt AS (
  SELECT o_orderstatus, CAST(sum(obs) AS BIGINT) AS rt
  FROM cells GROUP BY o_orderstatus
), ct AS (
  SELECT o_orderpriority, CAST(sum(obs) AS BIGINT) AS ct
  FROM cells GROUP BY o_orderpriority
), tot AS (
  SELECT CAST(sum(obs) AS HUGEINT) AS n,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nr,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nc
  FROM cells
), grid AS (
  -- full r x c grid (r09, ADVICE r08): structurally-zero cells
  -- contribute (0-E)^2/E = E to the statistic
  SELECT rt.o_orderstatus, rt.rt, ct.o_orderpriority, ct.ct
  FROM rt CROSS JOIN ct
), scored AS MATERIALIZED (
  SELECT g.o_orderstatus, g.o_orderpriority,
         CAST(COALESCE(c.obs, 0) AS BIGINT) AS obs,
         round(CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE)
               / CAST(tot.n AS DOUBLE), 6) AS expected,
         CAST(floor(
           1000000.0
           * CAST(CAST(COALESCE(c.obs, 0) AS HUGEINT) * tot.n
                  - CAST(g.rt AS HUGEINT) * CAST(g.ct AS HUGEINT) AS DOUBLE)
           * CAST(CAST(COALESCE(c.obs, 0) AS HUGEINT) * tot.n
                  - CAST(g.rt AS HUGEINT) * CAST(g.ct AS HUGEINT) AS DOUBLE)
           / (CAST(tot.n AS DOUBLE) * CAST(g.rt AS DOUBLE)
              * CAST(g.ct AS DOUBLE))
           + 0.5) AS BIGINT) AS contrib_micro,
         (tot.nr - 1) * (tot.nc - 1) AS dof
  FROM grid g
  LEFT JOIN cells c USING (o_orderstatus, o_orderpriority)
  CROSS JOIN tot
), table_stat AS (
  SELECT CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro FROM scored
)
SELECT s.o_orderpriority, s.o_orderstatus, s.obs, s.expected,
       s.contrib_micro, t.chi2_micro, s.dof
FROM scored s CROSS JOIN table_stat t
"""

QUERIES["m18_chi_square"] = (m18_chi_square, M18_ORACLE)


# --- M19: Kruskal-Wallis k-sample rank test ----------------------------------------------

def m19_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H (operators/estimate.py::
    kruskal_wallis) across ALL FOUR event types' value distributions on
    the m15/m17 lattice — the k-sample generalization of m17. The one
    cross-group float reduction folds in pinned sorted order."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        kruskal_wallis,
    )

    e = load(spark, sf_dir, "events")
    return kruskal_wallis(e, "event_type", "value")


M19_ORACLE = """
WITH t AS (
  SELECT event_type AS grp, CAST(floor(value * 100) AS BIGINT) AS bin
  FROM events WHERE value IS NOT NULL
), pgb AS MATERIALIZED (
  SELECT bin, grp, CAST(count(*) AS BIGINT) AS cg FROM t GROUP BY bin, grp
), pb AS MATERIALIZED (
  SELECT bin, CAST(sum(cg) AS HUGEINT) AS t FROM pgb GROUP BY bin
), br AS MATERIALIZED (
  SELECT bin, t,
         CAST(sum(t) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS HUGEINT)
           AS cum_t
  FROM pb
), pg AS MATERIALIZED (
  SELECT grp, CAST(sum(cg) AS HUGEINT) AS n_g,
         sum(CAST(cg AS HUGEINT) * (2 * (cum_t - t) + t + 1)) AS r2_g
  FROM pgb JOIN br USING (bin) GROUP BY grp
), terms AS (
  SELECT n_g,
         CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
           / (4.0 * CAST(n_g AS DOUBLE)) AS term
  FROM pg
), folded AS (
  SELECT list_reduce([0.0::DOUBLE] || list_sort(list(term)), (a, b) -> a + b)
           AS s,
         CAST(count(*) AS BIGINT) AS k_groups,
         CAST(sum(n_g) AS HUGEINT) AS n
  FROM terms
), ties AS (
  SELECT sum(t * t * t - t) AS tie_sum FROM pb
), calc AS (
  SELECT k_groups, n,
         12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * s
           - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
         1.0 - CAST(tie_sum AS DOUBLE) / CAST(n * n * n - n AS DOUBLE)
           AS corr
  FROM folded CROSS JOIN ties
)
SELECT CAST(n AS BIGINT) AS n_total, k_groups,
       CAST(k_groups - 1 AS BIGINT) AS dof,
       CASE WHEN n >= 2 AND k_groups >= 2 AND corr > 0
            THEN round(h, 6) END AS h,
       CASE WHEN n >= 2 AND k_groups >= 2 AND corr > 0
            THEN round(h / corr, 6) END AS h_corrected
FROM calc
"""

QUERIES["m19_kruskal_wallis"] = (m19_kruskal_wallis, M19_ORACLE)


# --- M20: Spearman rank correlation ------------------------------------------------------

def m20_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho (operators/estimate.py::spearman_correlation)
    between lineitem quantity and extended price: midranks off each
    column's own lattice grid, five exact DECIMAL(38,0) rank moments,
    rho one fixed IEEE expression."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        spearman_correlation,
    )

    li = load(spark, sf_dir, "lineitem")
    return spearman_correlation(
        li, "l_quantity", "l_extendedprice", grid_x=1, grid_y=100
    )


M20_ORACLE = """
WITH b AS MATERIALIZED (
  SELECT CAST(floor(l_quantity * 1) AS BIGINT) AS qx,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS qy
  FROM lineitem
), pairs AS MATERIALIZED (
  SELECT qx, qy, CAST(count(*) AS HUGEINT) AS c FROM b GROUP BY qx, qy
), cx AS MATERIALIZED (
  SELECT qx, CAST(sum(c) AS HUGEINT) AS cnt FROM pairs GROUP BY qx
), rx AS MATERIALIZED (
  SELECT qx,
         2 * (CAST(sum(cnt) OVER (ORDER BY qx ROWS UNBOUNDED PRECEDING)
                   AS HUGEINT) - cnt) + cnt + 1 AS r_x
  FROM cx
), cy AS MATERIALIZED (
  SELECT qy, CAST(sum(c) AS HUGEINT) AS cnt FROM pairs GROUP BY qy
), ry AS MATERIALIZED (
  SELECT qy,
         2 * (CAST(sum(cnt) OVER (ORDER BY qy ROWS UNBOUNDED PRECEDING)
                   AS HUGEINT) - cnt) + cnt + 1 AS r_y
  FROM cy
), mom AS (
  SELECT CAST(sum(c) AS HUGEINT) AS n,
         sum(c * r_x) AS sx, sum(c * r_y) AS sy,
         sum(c * r_x * r_x) AS sxx, sum(c * r_y * r_y) AS syy,
         sum(c * r_x * r_y) AS sxy
  FROM pairs JOIN rx USING (qx) JOIN ry USING (qy)
), calc AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS num,
         CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
         CAST(n * syy - sy * sy AS DOUBLE) AS vy
  FROM mom
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN vx > 0 AND vy > 0
            THEN round(num / sqrt(vx * vy), 6) END AS rho
FROM calc
"""

QUERIES["m20_spearman"] = (m20_spearman, M20_ORACLE)


# --- M22: ROC AUC via rank-sum -----------------------------------------------------------

def m22_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ranking quality (operators/estimate.py::roc_auc)
    of the m16 calibrated-score construction: scores are fractional
    event values, labels md5-seeded Bernoulli(score) draws — a
    better-than-random ranker by construction. AUC comes out of the
    m17 midrank machinery as one exact-integer division."""
    from peskas_timor_data_pipeline_spark.operators.estimate import roc_auc

    e = load(spark, sf_dir, "events")
    scored = e.filter(F.col("value").isNotNull()).select(
        (F.col("value") - F.floor(F.col("value"))).alias("p"),
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long") % 1000000
            < F.floor(
                (F.col("value") - F.floor(F.col("value"))) * 1000000
            ).cast("long")
        ).cast("int").alias("y"),
    )
    return roc_auc(scored, "y", "p", grid=1_000_000)


M22_ORACLE = """
WITH scored AS MATERIALIZED (
  SELECT value - floor(value) AS p,
         CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000
              < CAST(floor((value - floor(value)) * 1000000) AS BIGINT)
         THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), t AS (
  SELECT CAST(floor(p * 1000000) AS BIGINT) AS bin, y AS ip FROM scored
), pb AS MATERIALIZED (
  SELECT bin, CAST(sum(ip) AS HUGEINT) AS cp,
         CAST(count(*) AS HUGEINT) AS t
  FROM t GROUP BY bin
), cum AS MATERIALIZED (
  SELECT cp, t,
         CAST(sum(t) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS HUGEINT)
           AS cum_t
  FROM pb
), mom AS (
  SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
         CAST(sum(t - cp) AS BIGINT) AS n_neg,
         sum(cp * (2 * (cum_t - t) + t + 1)) AS r2_pos
  FROM cum
), calc AS (
  SELECT n_pos, n_neg,
         (CAST(r2_pos AS DOUBLE)
          - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0))
         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
  FROM mom
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN round(auc, 6) END AS auc,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN round(2.0 * auc - 1.0, 6) END
         AS gini
FROM calc
"""

QUERIES["m22_roc_auc"] = (m22_roc_auc, M22_ORACLE)


# --- M23: expected calibration error ------------------------------------------------------

def m23_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error (operators/estimate.py::
    calibration_ece) of the same construction as m16/m22 — calibrated
    by design, so ECE should sit near the binning noise floor. Scores
    enter as exact integer micro-units; the total is a BIGINT sum of
    per-bin micro-rounded gaps."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        calibration_ece,
    )

    e = load(spark, sf_dir, "events")
    scored = e.filter(F.col("value").isNotNull()).select(
        (F.col("value") - F.floor(F.col("value"))).alias("p"),
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long") % 1000000
            < F.floor(
                (F.col("value") - F.floor(F.col("value"))) * 1000000
            ).cast("long")
        ).cast("int").alias("y"),
    )
    return calibration_ece(scored, "p", "y", n_bins=20)


M23_ORACLE = """
WITH scored AS MATERIALIZED (
  SELECT value - floor(value) AS p,
         CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000
              < CAST(floor((value - floor(value)) * 1000000) AS BIGINT)
         THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), b AS (
  SELECT least(CAST(floor(p * 20) AS INTEGER), 19) AS bin,
         CAST(floor(p * 1000000) AS BIGINT) AS s_micro, y
  FROM scored WHERE floor(p * 20) >= 0
), per_bin AS MATERIALIZED (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b,
         CAST(sum(s_micro) AS HUGEINT) AS sm_b
  FROM b GROUP BY bin
), tot AS (
  SELECT CAST(sum(n_b) AS BIGINT) AS n FROM per_bin
), gaps AS (
  SELECT n_b,
         abs(CAST(pos_b AS DOUBLE) / n_b
             - CAST(sm_b AS DOUBLE) / (n_b * 1000000.0)) AS gap,
         tot.n
  FROM per_bin CROSS JOIN tot
), ce AS (
  SELECT n,
         CAST(floor(1000000.0 * (n_b / n) * gap + 0.5) AS BIGINT) AS ce_micro,
         CAST(floor(1000000.0 * gap + 0.5) AS BIGINT) AS gap_micro
  FROM gaps
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_bins_used,
       CAST(sum(ce_micro) AS BIGINT) AS ece_micro,
       CAST(max(gap_micro) AS BIGINT) AS max_ce_micro
FROM ce
"""

QUERIES["m23_calibration_ece"] = (m23_calibration_ece, M23_ORACLE)


# --- M24: A/B power analysis (required sample size) --------------------------------------

def m24_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment required sample size (operators/estimate.py::
    required_sample_size): each order-priority segment's observed
    fulfilled-rate baseline, lifted 10% relative, at 5% alpha / 80%
    power — "how many orders per arm before the experiment can read".
    Baselines are exact integer counts; the Fleiss chain is one fixed
    IEEE expression per segment."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        required_sample_size,
    )

    o = load(spark, sf_dir, "orders")
    return required_sample_size(
        o, ["o_orderpriority"], "o_orderstatus = 'F'", rel_mde=0.1
    )


M24_ORACLE = """
WITH cells AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS successes
  FROM orders GROUP BY o_orderpriority
), c1 AS (
  SELECT *, CAST(successes AS DOUBLE) / n_obs AS p1 FROM cells
), c2 AS (
  SELECT *, p1 * 1.1::DOUBLE AS p2 FROM c1
), c3 AS (
  SELECT *, (p1 + p2) / 2.0::DOUBLE AS pbar FROM c2
), c4 AS (
  SELECT *,
         1.959964::DOUBLE * sqrt(2.0::DOUBLE * pbar * (1.0::DOUBLE - pbar))
         + 0.841621::DOUBLE
           * sqrt(p1 * (1.0::DOUBLE - p1) + p2 * (1.0::DOUBLE - p2)) AS num
  FROM c3
)
SELECT o_orderpriority, n_obs, successes,
       CASE WHEN n_obs > 0 THEN round(p1, 6) END AS p1,
       CASE WHEN n_obs > 0 AND p1 > 0 AND p2 < 1 THEN round(p2, 6) END AS p2,
       CASE WHEN n_obs > 0 AND p1 > 0 AND p2 < 1
            THEN CAST(ceil(num * num / ((p2 - p1) * (p2 - p1))) AS BIGINT)
       END AS n_per_arm
FROM c4
"""

QUERIES["m24_power_analysis"] = (m24_power_analysis, M24_ORACLE)


# --- M25: Brown-Forsythe variance-equality test ------------------------------------------

def m25_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion drift across all event types (operators/estimate.py::
    brown_forsythe): Levene-with-medians F on lattice deviations — the
    spread companion of the m17/m19 location tests. Medians and
    deviations live in integer lattice units; the two cross-group
    rational folds run in pinned sorted order."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        brown_forsythe,
    )

    e = load(spark, sf_dir, "events")
    return brown_forsythe(e, "event_type", "value")


M25_ORACLE = """
WITH gb AS MATERIALIZED (
  SELECT event_type AS grp, CAST(floor(value * 100) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(floor(value * 100) AS BIGINT)
), cum AS MATERIALIZED (
  SELECT grp, bin, c,
         CAST(sum(c) OVER (PARTITION BY grp ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM gb
), ng AS (
  SELECT grp, CAST(sum(c) AS BIGINT) AS n_g FROM gb GROUP BY grp
), med AS MATERIALIZED (
  SELECT grp, min(bin) AS med_bin
  FROM cum JOIN ng USING (grp)
  WHERE 2 * cum >= n_g GROUP BY grp
), zm AS MATERIALIZED (
  SELECT gb.grp,
         CAST(sum(c) AS HUGEINT) AS n_g,
         sum(CAST(c AS HUGEINT) * CAST(abs(bin - med_bin) AS HUGEINT)) AS s_g,
         sum(CAST(c AS HUGEINT) * CAST(abs(bin - med_bin) AS HUGEINT)
             * CAST(abs(bin - med_bin) AS HUGEINT)) AS q_g
  FROM gb JOIN med ON gb.grp = med.grp
  GROUP BY gb.grp
), ratio AS (
  SELECT *, CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
            AS r FROM zm
), folded AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_g) AS HUGEINT) AS n,
         CAST(sum(s_g) AS HUGEINT) AS s_tot,
         CAST(sum(q_g) AS HUGEINT) AS q_tot,
         list_reduce([0.0::DOUBLE] || list_sort(list(r)), (a, b) -> a + b)
           AS r_sum
  FROM ratio
), calc AS (
  SELECT *,
         r_sum - (CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS ssb,
         CAST(q_tot AS DOUBLE) - r_sum AS ssw
  FROM folded
)
SELECT CAST(n AS BIGINT) AS n_total, k AS k_groups,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n - k AS BIGINT) AS df2,
       CASE WHEN k >= 2 AND n > k AND ssw > 0
            THEN round((ssb / (CAST(k AS DOUBLE) - 1.0))
                       / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
       END AS f_stat
FROM calc
"""

QUERIES["m25_brown_forsythe"] = (m25_brown_forsythe, M25_ORACLE)


# --- M26: Kaplan-Meier survival curve ----------------------------------------------------

def m26_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-first-error survival per user (operators/estimate.py::
    kaplan_meier): duration = days from a user's first event to their
    first error (censored at the 2024-01-31 observation end). Risk sets
    are exact integer cumsums; the KM product runs in log space with
    nano-rounded factors so the running reduction is an exact BIGINT
    prefix sum."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        kaplan_meier,
    )

    e = load(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(F.col("event_type") == "error", F.to_date("ts"))
        ).alias("de"),
    )
    dur = pu.select(
        F.when(
            F.col("de").isNotNull(), F.datediff(F.col("de"), F.col("d0"))
        )
        .otherwise(
            F.datediff(F.lit("2024-01-31").cast("date"), F.col("d0"))
        )
        .alias("dur"),
        F.when(F.col("de").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    return kaplan_meier(dur, "dur", "ev")


M26_ORACLE = """
WITH pu AS MATERIALIZED (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0,
         min(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END) AS de
  FROM events GROUP BY user_id
), dur AS (
  SELECT CASE WHEN de IS NOT NULL THEN date_diff('day', d0, de)
              ELSE date_diff('day', d0, DATE '2024-01-31') END AS t,
         CASE WHEN de IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM pu
), per_t AS MATERIALIZED (
  SELECT t, CAST(sum(e) AS BIGINT) AS d,
         CAST(count(*) - sum(e) AS BIGINT) AS c
  FROM dur GROUP BY t
), tot AS (
  SELECT CAST(sum(d + c) AS BIGINT) AS n FROM per_t
), risky AS MATERIALIZED (
  SELECT t, d, c,
         n - (CAST(sum(d + c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) - (d + c)) AS n_risk
  FROM per_t CROSS JOIN tot
), stepped AS (
  SELECT *,
         CASE WHEN d < n_risk
              THEN CAST(floor(1000000000.0
                              * ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                              + 0.5) AS BIGINT) END AS lnn,
         CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dead
  FROM risky
), cum AS (
  SELECT t, d, c, n_risk,
         CAST(sum(COALESCE(lnn, 0)) OVER (ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm,
         CAST(sum(dead) OVER (ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dc
  FROM stepped
)
SELECT CAST(t AS BIGINT) AS t, n_risk, d AS n_events, c AS n_censored,
       CASE WHEN dc > 0 THEN 0.0
            ELSE round(exp(CAST(cm AS DOUBLE) / 1000000000.0), 6)
       END AS survival
FROM cum WHERE d > 0
"""

QUERIES["m26_kaplan_meier"] = (m26_kaplan_meier, M26_ORACLE)
