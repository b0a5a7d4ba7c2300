"""Deterministic replacements for order-dependent dplyr idioms
(SURVEY.md §4.2 item 1, §7.4).

dplyr's first()/last() and positional bind_cols depend on row order, which
does not exist in a distributed engine. These aggregate by an explicit
ordering column instead: first = value at the minimum of (order, value)
struct — one aggregate, no window, deterministic under any partitioning."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_first(value: Column, order_by: Column) -> Column:
    """Value of the row with the smallest ``order_by`` (ties broken by the
    value itself)."""
    return F.min(F.struct(order_by.alias("o"), value.alias("v")))["v"]


def ordered_last(value: Column, order_by: Column) -> Column:
    """Value of the row with the largest ``order_by``."""
    return F.max(F.struct(order_by.alias("o"), value.alias("v")))["v"]


def mgsub(col: Column, replacements: dict[str, str]) -> Column:
    """Chained multi-pattern regex replacement (textclean::mgsub,
    R/clean-raw-data.R:46-74: 25 column-name normalization patterns).
    Applied in dict order, like the reference's sequential gsub chain."""
    out = col
    for pattern, repl in replacements.items():
        out = F.regexp_replace(out, pattern, repl)
    return out


def rename_columns(df, replacements: dict[str, str]):
    """The column-name version of mgsub (P8): regex-rewrite every column
    name; pure metadata, no computation."""
    import re

    mapping = {}
    for c in df.columns:
        new = c
        for pattern, repl in replacements.items():
            new = re.sub(pattern, repl, new)
        if new != c:
            mapping[c] = new
    return df.withColumnsRenamed(mapping)
