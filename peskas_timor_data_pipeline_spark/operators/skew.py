"""Skew-aware aggregation (SURVEY.md §7.2 step 8).

Species codes in the real data are Zipfian ("MZZ"/other swallows a large
share of catch rows); a plain groupBy concentrates the hot key in one
task. The salted two-phase rewrite spreads each key over ``n_salts``
sub-keys, partial-aggregates, then reduces — turning one hot partition
into n_salts even ones. AQE's skew-join handling covers joins; this covers
aggregations, where AQE cannot split a single group.

Only algebraic aggregates (sum/count/min/max and anything built from them,
e.g. avg = sum/count) can be salted; holistic ones (median) cannot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. The salt is derived deterministically from
    ``salt_source`` (default: a stable hash of all non-key columns) so
    results are partition-independent.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _out, (_in, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"non-algebraic aggregate cannot be salted: {fn}")

    if salt_source is None:
        non_keys = [c for c in df.columns if c not in keys]
        salt_source = F.hash(*[F.col(c) for c in non_keys])
    salted = df.withColumn("__salt__", F.pmod(salt_source, F.lit(n_salts)))

    partial = salted.groupBy(*keys, "__salt__").agg(
        *[fns[fn](F.col(c)).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[refn[fn](F.col(out)).alias(out) for out, (_c, fn) in aggs.items()]
    )
