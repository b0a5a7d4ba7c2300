"""Column-surgery and restructuring operators (SURVEY.md §2.2, A11-A12).

Implements the reference's tidyr/dplyr restructuring surface on Spark:

- nest/unnest       <-> tidyr::nest / unnest(keep_empty=TRUE)
                        (R/pt_nest_species.R:82-113, R/calculate-weights.R:376-394)
- pivot_longer/wider <-> tidyr::pivot_longer / pivot_wider
                        (R/pt_nest_species.R:43-55, R/validation-functions.R:764)
- coalesce_columns  <-> the reference's `coalist` helper
                        (R/clean-raw-data.R:237-253, R/merge-landings.R:124-163)
- unite             <-> tidyr::unite(na.rm=TRUE) (R/validate-landings.R:226-229)
- distinct_except   <-> distinct(across(-col), .keep_all=TRUE)
                        (R/validate-pds-trips.R:38-39)
- deterministic_sample_n <-> sample_n(1) per group (R/merge-trips.R:112-113),
                        re-keyed to a stable hash order so results are
                        reproducible across partitionings.
- replicate_rows    <-> slice(rep(1:n(), each=k)) (R/estimate-catch.R:93-96)

All are pure Catalyst expressions: nesting is a shuffle-once
groupBy+collect_list; unnesting is a narrow explode. At 100 TB the nest
shuffle is the only wide stage and partitions by the nest key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nest(
    df: DataFrame,
    keys: Sequence[str],
    nested_col: str,
    value_cols: Sequence[str] | None = None,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Group ``df`` by ``keys`` and pack the remaining columns into an
    array<struct> column ``nested_col`` (tidyr::nest).

    ``order_by`` pins the intra-array order (dplyr preserves input order,
    which is not reproducible under distribution — we sort explicitly, see
    SURVEY.md §7.4 on order-dependence).

    Multi-level nesting tip: ``df.repartition(coarsest_key)`` first — hash
    partitioning on the coarsest key satisfies the clustering requirement
    of every finer ``groupBy(coarsest_key, ...)``, so all nest levels share
    ONE exchange (asserted in tests/test_plans.py).
    """
    value_cols = list(value_cols or [c for c in df.columns if c not in keys])
    packed = F.collect_list(F.struct(*[F.col(c) for c in value_cols]))
    if order_by:
        # Sort by the requested columns by packing them first in the struct,
        # sorting the array, then projecting the payload back out.
        sort_struct = F.collect_list(
            F.struct(*[F.col(c) for c in order_by], F.struct(*value_cols).alias("__payload__"))
        )
        out = df.groupBy(*keys).agg(F.sort_array(sort_struct).alias("__sorted__"))
        return out.withColumn(
            nested_col, F.expr("transform(__sorted__, x -> x.__payload__)")
        ).drop("__sorted__")
    return df.groupBy(*keys).agg(packed.alias(nested_col))


def unnest(df: DataFrame, nested_col: str, keep_empty: bool = True) -> DataFrame:
    """Explode an array<struct> column back to flat rows
    (tidyr::unnest; keep_empty=True matches unnest(keep_empty=TRUE) via
    explode_outer, emitting a null row for empty/NULL arrays)."""
    exploder = F.explode_outer if keep_empty else F.explode
    df = df.withColumn("__x__", exploder(F.col(nested_col))).drop(nested_col)
    inner_fields = [f.name for f in df.schema["__x__"].dataType.fields]
    return df.select("*", *[F.col(f"__x__.{f}").alias(f) for f in inner_fields]).drop("__x__")


def pivot_longer(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    names_to: str = "name",
    values_to: str = "value",
) -> DataFrame:
    """Unpivot ``value_cols`` into (names_to, values_to) long format
    (tidyr::pivot_longer) via the built-in ``stack`` expression."""
    n = len(value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    expr = f"stack({n}, {pairs}) as (`{names_to}`, `{values_to}`)"
    return df.select(*id_cols, F.expr(expr))


def pivot_wider(
    df: DataFrame,
    id_cols: Sequence[str],
    names_from: str,
    values_from: str,
    agg: Column | None = None,
    values: Sequence[str] | None = None,
) -> DataFrame:
    """Pivot long->wide (tidyr::pivot_wider). Provide ``values`` (the
    distinct pivot keys) when known: it removes the extra distinct-collect
    job and makes the output schema static — essential on big inputs."""
    agg = agg if agg is not None else F.first(values_from)
    grouped = df.groupBy(*id_cols)
    pivoted = grouped.pivot(names_from, list(values)) if values else grouped.pivot(names_from)
    return pivoted.agg(agg)


def coalesce_columns(
    df: DataFrame, mapping: dict[str, Sequence[str]], drop_sources: bool = True
) -> DataFrame:
    """Declarative coalesce spec: for each target column take the first
    non-null across a priority list of source columns.

    Reproduces the reference's `coalist` (R/clean-raw-data.R:237-253) and the
    cross-survey-version merges (R/merge-landings.R:124-163) as one
    deterministic projection. Missing sources are skipped (the v1/v2/v3
    survey schemas each carry a subset).
    """
    out = df
    for target, sources in mapping.items():
        present = [c for c in sources if c in out.columns]
        if not present:
            continue
        out = out.withColumn(f"__{target}__", F.coalesce(*[F.col(c) for c in present]))
        if drop_sources:
            out = out.drop(*[c for c in present if c != target])
        out = out.withColumn(target, F.col(f"__{target}__")).drop(f"__{target}__")
    return out


def unite(
    df: DataFrame, target: str, cols: Sequence[str], sep: str = "-", drop: bool = True
) -> DataFrame:
    """Concatenate columns into one string, skipping nulls
    (tidyr::unite(na.rm=TRUE); alert-code union R/validate-landings.R:226-229).
    All-null rows yield NULL (not empty string), matching the reference's
    downstream `alert == NA` checks."""
    joined = F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])
    out = df.withColumn(target, F.when(joined == "", None).otherwise(joined))
    if drop:
        out = out.drop(*[c for c in cols if c != target])
    return out


def distinct_except(df: DataFrame, ignore: Sequence[str]) -> DataFrame:
    """Deduplicate on all columns except ``ignore``, keeping one arbitrary-
    but-deterministic survivor (distinct(across(-Trip), .keep_all=TRUE),
    R/validate-pds-trips.R:38-39). Survivor = min by the ignored columns so
    the result is partition-stable."""
    keys = [c for c in df.columns if c not in set(ignore)]
    w_cols = [F.min(F.struct(*[F.col(c) for c in ignore])).alias("__keep__")]
    kept = df.groupBy(*keys).agg(*w_cols)
    return kept.select(*keys, *[F.col(f"__keep__.{c}").alias(c) for c in ignore]).select(
        *df.columns
    )


def deterministic_sample_n(
    df: DataFrame, keys: Sequence[str], n: int = 1, salt: str = "0"
) -> DataFrame:
    """Take ``n`` rows per group in a stable pseudo-random order.

    The reference uses sample_n(1) (R/merge-trips.R:112-113), which is not
    reproducible; we order by md5 of the full row + salt, which behaves like
    a seeded shuffle but is identical on every engine and partitioning.
    """
    from pyspark.sql.window import Window

    order_key = F.md5(F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in df.columns]))
    w = Window.partitionBy(*keys).orderBy(order_key)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )


def replicate_rows(df: DataFrame, times: int) -> DataFrame:
    """Duplicate every row ``times``x (slice(rep(1:n(), each=k)),
    R/estimate-catch.R:93-96 — small-group padding before imputation).
    Narrow explode; no shuffle."""
    return (
        df.withColumn("__rep__", F.explode(F.array_repeat(F.lit(1), times)))
        .drop("__rep__")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Dataset-version diff — the release audit run between two snapshots
    of a curated table (the companion to the S7/S8 versioned-artifact
    store): classify every key as ``added`` (new only), ``removed`` (old
    only), ``changed`` (present in both, any compared column differs,
    null-safely), or ``unchanged``, and name the differing columns.

    One full-outer join on the version key — co-partitioned both sides,
    nothing row-wise — then pure column expressions for the
    classification; works at any scale the join works at.

    Returns (keys..., change, changed_cols) where ``changed_cols`` is a
    comma-joined sorted list ('' unless change = 'changed').
    """
    compare_cols = (
        [c for c in old.columns if c not in keys]
        if compare_cols is None
        else list(compare_cols)
    )
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_old__"),
        *[F.col(c).alias(f"__o_{c}__") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_new__"),
        *[F.col(c).alias(f"__n_{c}__") for c in compare_cols],
    )
    j = o.join(n, list(keys), "full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}__").eqNullSafe(F.col(f"__n_{c}__")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_arr = F.array_sort(
        F.filter(F.array(*diffs), lambda x: x.isNotNull())
    )
    change = (
        F.when(F.col("__in_old__").isNull(), "added")
        .when(F.col("__in_new__").isNull(), "removed")
        .when(F.size(changed_arr) > 0, "changed")
        .otherwise("unchanged")
    )
    return j.select(
        *keys,
        change.alias("change"),
        F.when(change == "changed", F.array_join(changed_arr, ","))
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass data profile — the release-QA summary run before publishing
    a dataset version: per column, row count, null count, exact distinct
    count, and (numeric columns only) min/max as doubles. Non-numeric
    columns report null min/max rather than a lexicographic one, and
    distinct counts exclude nulls (the SQL COUNT(DISTINCT) contract).

    Scale shape: ONE aggregation pass — the multiple exact distincts
    compile to a single expand+partial-agg shuffle (rows x |cols| expand,
    the standard exact-profiling cost; swap in approx_count_distinct when
    a sketch is acceptable), and the (1 x wide) result unpivots to
    (column, stats) rows driver-free with ``stack``.

    Returns (column_name, n_rows, n_null, n_distinct, min_value, max_value).
    """
    from pyspark.sql.types import NumericType

    cols = list(cols) if cols is not None else list(df.columns)
    # column names are interpolated into stack() literals and backtick
    # aliases below; a quote/backtick in a name would produce malformed
    # SQL (an injection surface on untrusted schemas), so reject early
    bad = [c for c in cols if "'" in c or "`" in c]
    if bad:
        raise ValueError(
            f"profile_columns: column names may not contain quotes/backticks: {bad}"
        )
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}__"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}__"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}__"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}__"))
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        mn = f"`__mn_{c}__`" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`__mx_{c}__`" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"'{c}', __n__ - `__nn_{c}__`, `__nd_{c}__`, {mn}, {mx}"
        )
    stacked = row.selectExpr(
        "__n__ AS n_rows",
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column_name, n_null, n_distinct, min_value, max_value)",
    )
    return stacked.select(
        "column_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    )


def dataset_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive per-column content fingerprint — the manifest
    that verifies a migration/rewrite of a 100 TB table WITHOUT sorting or
    shipping it: two datasets match iff every column row agrees. Per
    column: row count, null count, the bit_xor of the 48-bit md5 value
    hashes (set fingerprint; xor cancels duplicate pairs, hence also:)
    and the 48-bit hash SUM split into high/low 24-bit-piece sums
    (multiset fingerprint — catches duplicate-count changes xor misses;
    the split keeps each piece-sum under 2^63 to ~500 billion rows, no
    modular arithmetic needed under ANSI overflow checks).

    All aggregates partial-aggregate map-side; ONE pass, one tiny row
    out, unpivoted driver-free with stack. NULLs are counted but not
    hashed (a null is not the string 'null').

    Returns (column_name, n_rows, n_null, xor48, sum_hi, sum_lo).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    bad = [c for c in cols if "'" in c or "`" in c]
    if bad:
        raise ValueError(
            f"dataset_fingerprint: column names may not contain quotes/backticks: {bad}"
        )
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}__"))
        aggs.append(F.expr(
            f"bit_xor(cast(conv(substring(md5(cast(`{c}` as string)), 1, 12), 16, 10) as bigint))"
        ).alias(f"__x_{c}__"))
        hx = (
            f"cast(conv(substring(md5(cast(`{c}` as string)), 1, 12), 16, 10)"
            f" as bigint)"
        )
        aggs.append(F.expr(f"sum({hx} div {1 << 24})").alias(f"__shi_{c}__"))
        aggs.append(F.expr(f"sum({hx} % {1 << 24})").alias(f"__slo_{c}__"))
    row = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __n__ - `__nn_{c}__`, `__x_{c}__`, `__shi_{c}__`, `__slo_{c}__`"
        for c in cols
    )
    return row.selectExpr(
        "__n__ AS n_rows",
        f"stack({len(cols)}, {parts}) AS (column_name, n_null, xor48, sum_hi, sum_lo)",
    ).select("column_name", "n_rows", "n_null", "xor48", "sum_hi", "sum_lo")
