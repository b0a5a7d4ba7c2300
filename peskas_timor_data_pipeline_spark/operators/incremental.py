"""Incremental rollup maintenance (continuous aggregates).

The reference recomputes every monthly summary from scratch each 2-day run
(R/format-public-data.R:363-457 re-reads all landings since 2018). At
100 TB that full re-aggregation is the dominant cost; the fix is the
hypertable/continuous-aggregate pattern: keep the rollup as compact
mergeable state (sum/count/min/max — algebraic aggregates), and fold each
new batch's PARTIAL aggregate into it. Cost per refresh is
O(batch + rollup), never O(history).

Mean/derived metrics are finalized from (sum, count) at read time;
medians/percentiles are NOT algebraic — keep those on the batch path or
carry a mergeable sketch (operators/sketches.py) instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure -> (partial agg over raw rows, merge agg over partials)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_rollup(
    batch: DataFrame, keys: Sequence[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial-aggregate one batch: ``measures`` maps output column ->
    (agg_name in {sum,count,min,max}, source column)."""
    aggs = []
    for out, (how, col) in measures.items():
        partial_fn, _ = _ALGEBRAIC[how]
        aggs.append(partial_fn(col).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_rollup(
    existing: DataFrame | None,
    partial: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a batch's partial aggregate into the rollup state. Union +
    re-aggregate: the union's groupBy partial-aggregates map-side, and both
    inputs are already one-row-per-group, so the shuffle carries at most
    2 rows per affected group — never the raw history."""
    if existing is None:
        return partial
    aggs = []
    for out, (how, _col) in measures.items():
        _, merge_fn = _ALGEBRAIC[how]
        aggs.append(merge_fn(out).alias(out))
    return existing.unionByName(partial).groupBy(*keys).agg(*aggs)
