"""Morphometric length-weight estimation, set-based (SURVEY.md M2).

The reference computes per-catch-row weights ROWWISE: filter the
length-weight parameter table to the row's species code, convert length
types via length-length regressions, compute candidate weights a*length^b
per matching species, and take a per-taxon quantile x n_individuals
(`estimate_weight`, R/calculate-weights.R:511-569; rowwise call :356-366).

Here the rowwise loop becomes one declarative plan: explode catch rows
against the (broadcast) parameter table on the species-code key, compute
candidate weights as a column, and reduce with an exact percentile per
catch-row key. The parameter table is KB-scale (FishBase snapshot) so the
join is a broadcast hash join; the only shuffle is the per-row-key
aggregation, which reuses the catch table's natural partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def estimate_weights(
    catch: DataFrame,
    params: DataFrame,
    code_col: str,
    length_col: str,
    n_col: str,
    row_keys: Sequence[str],
    a_col: str = "a",
    b_col: str = "b",
    quantile: float | Column = 0.75,
) -> DataFrame:
    """Per catch row: candidate weights ``a * length^b`` over every parameter
    row sharing the species code; weight = percentile(candidates, q) * n.

    Returns one row per ``row_keys`` with columns ``weight`` (grams, like the
    reference) and ``n_candidates``.
    """
    q = F.lit(quantile) if isinstance(quantile, float) else quantile
    # The candidate percentile depends only on (code, length) — lengths are
    # binned (5-cm classes in the reference), so the computation domain is
    # tiny regardless of catch-table size. Deduplicate it, evaluate the
    # percentile once per combo, broadcast the result back. This turns an
    # O(rows x candidates) explode into O(combos x candidates) + one
    # broadcast join — the difference between 48M and 100k intermediate
    # rows at sf0.1, and between a shuffle and none at 100 TB.
    domain = catch.select(code_col, length_col).distinct()
    cand_w = domain.join(F.broadcast(params), on=code_col, how="inner").withColumn(
        "__w__", F.col(a_col) * F.pow(F.col(length_col), F.col(b_col))
    )
    per_combo = cand_w.groupBy(code_col, length_col).agg(
        F.percentile("__w__", q).alias("__pw__"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    joined = catch.join(F.broadcast(per_combo), on=[code_col, length_col], how="inner")
    return joined.select(
        *row_keys,
        (F.col("__pw__") * F.col(n_col)).alias("weight"),
        "n_candidates",
    )


def convert_length(
    df: DataFrame,
    length_col: str,
    ll_params: DataFrame,
    on: str | Sequence[str],
    aL: str = "aL",
    bL: str = "bL",
    out_col: str | None = None,
) -> DataFrame:
    """Length-length regression conversion ``aL + length * bL``
    (R/calculate-weights.R:480-502, incl. the inverted reciprocal params the
    reference pre-builds). Broadcast join + column arithmetic."""
    out_col = out_col or length_col
    joined = df.join(F.broadcast(ll_params), on=on, how="left")
    converted = F.when(
        F.col(aL).isNotNull() & F.col(bL).isNotNull(),
        F.col(aL) + F.col(length_col) * F.col(bL),
    ).otherwise(F.col(length_col))
    return joined.withColumn(out_col, converted).drop(
        *[c for c in (aL, bL) if c != out_col]
    )


def scale_nutrients(
    df: DataFrame, weight_col: str, nutrient_cols: Sequence[str]
) -> DataFrame:
    """Scale per-kg nutrient concentrations by estimated catch weight
    (R/calculate-weights.R:368-375): nutrient_total = mu * weight / 1000."""
    out = df
    for c in nutrient_cols:
        out = out.withColumn(c, F.col(c) * F.col(weight_col) / 1000.0)
    return out
