"""Validation / alert operator library (SURVEY.md §2.9) — the reference's
"query library".

Each validator consumes a fact frame (+ optionally a broadcast dimension)
and emits (id, cleaned_value(s), alert_number); NULL alert = pass; failing
values are nulled, mirroring `case_when(is.na(alert) ~ value, TRUE ~ NA)`
(R/validation-functions.R throughout; orchestration
R/validate-landings.R:21-207; thresholds inst/conf.yml:98-128).

Validators are columnar `when`-expressions and broadcast joins — zero UDFs,
fully pushdown-friendly. An orchestrator reduce-joins the outputs and unites
alert codes (J6 + O5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.operators.joins import reduce_join
from peskas_timor_data_pipeline_spark.operators.restructure import unite


def _cleaned(value: Column, alert: Column) -> Column:
    """Null the value where the alert fired (reference semantics)."""
    return F.when(alert.isNull(), value)


def validate_bounds(
    df: DataFrame,
    id_col: str,
    value_col: str,
    lower: float | None,
    upper: float | None,
    alert_number: int,
    out_name: str | None = None,
) -> DataFrame:
    """Range validator (alert 5 trip duration <=96 h, alert 6 price>1500,
    alert 20 mesh<=200 mm ...; R/validation-functions.R:95-111,207-231)."""
    out_name = out_name or value_col
    v = F.col(value_col)
    cond = F.lit(False)
    if lower is not None:
        cond = cond | (v < lower)
    if upper is not None:
        cond = cond | (v > upper)
    alert = F.when(v.isNotNull() & cond, F.lit(alert_number))
    return df.select(
        F.col(id_col),
        _cleaned(v, alert).alias(out_name),
        alert.alias(f"alert_{alert_number}"),
    )


def validate_date_order(
    df: DataFrame,
    id_col: str,
    event_date: str,
    submission_date: str,
    max_delay_days: int = 28,
    alert_order: int = 4,
    alert_delay: int = 10,
) -> DataFrame:
    """Date-order + submission-delay validator (alerts 4/10,
    R/validation-functions.R:74-94): event after submission is impossible;
    submission more than ``max_delay_days`` after the event is stale."""
    ev, sub = F.to_date(F.col(event_date)), F.to_date(F.col(submission_date))
    alert = F.when(ev > sub, F.lit(alert_order)).when(
        F.datediff(sub, ev) > max_delay_days, F.lit(alert_delay)
    )
    return df.select(
        F.col(id_col),
        _cleaned(ev, alert).alias(event_date),
        alert.alias(f"alert_{alert_order}_{alert_delay}"),
    )


def validate_categorical(
    df: DataFrame,
    id_col: str,
    value_col: str,
    dim: DataFrame,
    dim_col: str,
    alert_number: int,
) -> DataFrame:
    """Foreign-key validator (alerts 14/15 gear, 16 site, 19 habitat;
    R/validation-functions.R:533-628): value must exist in the (broadcast)
    dimension; nulls pass through unvalidated."""
    codes = dim.select(F.col(dim_col).alias("__code__")).distinct()
    joined = df.join(
        F.broadcast(codes), df[value_col] == F.col("__code__"), "left"
    )
    alert = F.when(
        F.col(value_col).isNotNull() & F.col("__code__").isNull(), F.lit(alert_number)
    )
    return joined.select(
        F.col(id_col),
        _cleaned(F.col(value_col), alert).alias(value_col),
        alert.alias(f"alert_{alert_number}"),
    )


def validate_unit_conversion(
    df: DataFrame,
    id_col: str,
    value_col: str,
    unit_col: str,
    convert_when: str,
    factor: float,
    upper: float,
    alert_number: int = 20,
) -> DataFrame:
    """Unit-normalizing bound validator (alert 20 mesh size: inches -> mm
    x25.4 then <=200 mm, R/validation-functions.R:630-655)."""
    v = F.when(F.col(unit_col) == convert_when, F.col(value_col) * factor).otherwise(
        F.col(value_col)
    )
    alert = F.when(v.isNotNull() & (v > upper), F.lit(alert_number))
    return df.select(
        F.col(id_col),
        _cleaned(v, alert).alias(f"{value_col}_std"),
        alert.alias(f"alert_{alert_number}"),
    )


def validate_regularity(
    df: DataFrame,
    id_col: str,
    species_col: str,
    value_col: str,
    n_col: str,
    alert_number: int = 22,
) -> DataFrame:
    """Catch-regularity consistency validator (alert 22,
    R/validation-functions.R:115-184): per submission, the no-catch marker
    (species == "0"), total catch value and summed individual counts must
    agree — a no-catch trip with positive value/count, or a catch trip with
    a non-positive one, is internally inconsistent.

    Input is the unnested long frame (one row per catch row); species and
    value are submission-level constants repeated by the unnest, so
    ``min`` reproduces dplyr's order-dependent ``first`` deterministically.
    ``sum`` is wrapped in ``coalesce(.., 0)`` to match R's
    ``sum(na.rm=TRUE)`` returning 0 on all-NA groups (SURVEY.md §7.4)."""
    agg = df.groupBy(id_col).agg(
        F.min(F.col(species_col)).alias("species"),
        F.min(F.abs(F.col(value_col).cast("double"))).alias("total_value"),
        F.coalesce(
            F.sum(F.abs(F.col(n_col).cast("double"))), F.lit(0.0)
        ).alias("n_units"),
    )
    is_zero = F.col("species") == "0"
    v, n = F.col("total_value"), F.col("n_units")
    alert = F.when(
        (is_zero & (n > 0))
        | (is_zero & (v > 0))
        | (~is_zero & (n <= 0))
        | (~is_zero & (v <= 0))
        | ((v <= 0) & (n > 0))
        | ((v > 0) & (n <= 0)),
        F.lit(alert_number),
    )
    return agg.select(
        F.col(id_col),
        F.col("species"),
        _cleaned(v, alert).alias("total_value"),
        _cleaned(n, alert).alias("n_units"),
        alert.alias(f"alert_{alert_number}"),
    )


def combine_validators(
    base: DataFrame,
    validator_outputs: Sequence[DataFrame],
    id_col: str,
    alert_out: str = "alert",
) -> DataFrame:
    """Orchestrator (R/validate-landings.R:135-154 + :226-229): reduce-left-
    join all validator frames on the id, then unite their alert columns into
    one '-'-separated code string (NULL = fully clean row)."""
    joined = reduce_join([base, *validator_outputs], on=id_col, how="left")
    alert_cols = [c for c in joined.columns if c.startswith("alert_")]
    return unite(joined, alert_out, alert_cols)
