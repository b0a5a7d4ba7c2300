"""Join operators (SURVEY.md §2.3).

Scale notes: all metadata dimensions in the reference are KB-MB (15 Google-
Sheets tables, inst/conf.yml:60-75) so J1/J2/J7/J9 broadcast. The only
big-big joins are the per-day trip match (J5) and explode⋈length-weight
(M2); both shuffle on their natural keys and benefit from AQE skew handling.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reduce_join(
    dfs: Sequence[DataFrame], on: Sequence[str] | str, how: str = "left"
) -> DataFrame:
    """Fold a list of frames into one by repeated join on a shared key
    (purrr::reduce(left_join), R/validate-landings.R:135-154 — 14 validator
    outputs into one validated row). Each input is keyed 1:1 so the joins
    are shuffle-on-key merges; Catalyst reuses the exchange across steps."""
    return reduce(lambda a, b: a.join(b, on=on, how=how), dfs)


def complete(
    df: DataFrame,
    dims: Sequence[str | Sequence[str]],
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """tidyr::complete — expand to the cartesian product of the distinct
    values of each dim (a str = single column; a sequence = `nesting(...)`,
    i.e. observed combinations only), left-join the data back, fill gaps.

    (R/estimate-catch.R:131-135, R/model-catch.R:226-235,
    R/format-public-data.R:853-859.)

    The spine sides are distinct-projections (small); the crossJoin of
    distinct dims stays tiny relative to the fact table, then one left join
    re-attaches facts.
    """
    spines: list[DataFrame] = []
    keys: list[str] = []
    for d in dims:
        cols = [d] if isinstance(d, str) else list(d)
        spines.append(df.select(*cols).distinct())
        keys.extend(cols)
    spine = reduce(lambda a, b: a.crossJoin(b), spines)
    out = spine.join(df, on=keys, how="left")
    if fill:
        out = out.fillna(fill)
    return out


def one_to_one_day_match(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Constrained 1:1-per-key full join (J5, R/merge-trips.R:17-49).

    Landings and tracker trips are only matched where BOTH sides have exactly
    one row for the (landing_date, tracker_imei) key; every other row passes
    through unmatched (null columns from the other side). Implemented as a
    count-window on each side, a full join of the n==1 slices, and a union
    of the remainders — one shuffle per side on the match key.
    """
    from pyspark.sql.window import Window

    on = list(on)
    w = Window.partitionBy(*on)

    lcount = left.withColumn("__n__", F.count(F.lit(1)).over(w))
    rcount = right.withColumn("__n__", F.count(F.lit(1)).over(w))
    l1 = lcount.filter(F.col("__n__") == 1).drop("__n__")
    r1 = rcount.filter(F.col("__n__") == 1).drop("__n__")
    lrest = lcount.filter(F.col("__n__") != 1).drop("__n__")
    rrest = rcount.filter(F.col("__n__") != 1).drop("__n__")

    matched = l1.join(r1, on=on, how="full")
    return matched.unionByName(lrest, allowMissingColumns=True).unionByName(
        rrest, allowMissingColumns=True
    )


def suffix_regex_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_col: str,
    dim_col: str,
    min_len: int = 5,
) -> DataFrame:
    """Suffix match join (J9): survey-entered trailing IMEI digits matched as
    a suffix of a full device IMEI (R/validation-functions.R:12-48).

    NOT a nested-loop: the dimension is expanded to one row per (code,
    suffix) — codes are short (<=15 digits), so the expansion is bounded —
    and the match becomes a broadcast EQUI-join on the suffix. O(facts)
    instead of O(facts x dim): the difference between a hash probe and
    300M endswith comparisons at sf0.1, and the only shape that survives a
    full-corpus IMEI check at 100 TB.

    Adds ``__matches__`` = number of dim codes ending with the fact's
    digits (0 -> alert, 1 -> replace, >1 -> ambiguous) and
    ``matched_value`` = the unique match when n==1.
    """
    suffixes = dim.select(
        F.col(dim_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({dim_col})),"
                f" i -> substring({dim_col}, i, length({dim_col})))"
            )
        ).alias("__suffix__"),
    ).filter(F.length("__suffix__") >= min_len)
    matches = (
        facts.join(
            F.broadcast(suffixes),
            (F.col(fact_col) == F.col("__suffix__"))
            & (F.length(F.col(fact_col)) >= min_len),
            "left",
        )
        .groupBy(*facts.columns)
        .agg(
            F.count(F.col(dim_col)).alias("__matches__"),
            F.min(F.col(dim_col)).alias("__candidate__"),
        )
    )
    return matches.withColumn(
        "matched_value",
        F.when(F.col("__matches__") == 1, F.col("__candidate__")),
    ).drop("__candidate__")


def join_nested(
    df: DataFrame,
    nested_col: str,
    dim: DataFrame,
    on: str,
    keys: Sequence[str],
    how: str = "left",
    order_by: Sequence[str] | None = None,
    reattach: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    carry_scalars: bool = False,
) -> DataFrame:
    """Join a dimension into rows of a nested array<struct> column (J7,
    purrr::map(species_group, left_join, ...) R/calculate-weights.R:300-316):
    explode -> broadcast join -> re-nest. The dim is broadcast so the
    shuffles are the re-nest groupBy on ``keys`` plus the scalar re-attach
    join.

    ``carry_scalars=True`` threads ALL scalar columns through the explode
    as extra group keys instead of re-joining them afterwards — ONE shuffle
    total instead of two. Results are identical (the keys functionally
    determine the scalars); prefer it whenever the scalar columns are plain
    hashable types and narrow enough that duplicating them per nested row
    is cheaper than a second shuffle of the whole table — at 100 TB that
    trade almost always favors carrying."""
    from peskas_timor_data_pipeline_spark.operators.restructure import nest, unnest

    if carry_scalars:
        group_keys = [c for c in df.columns if c != nested_col]
        flat = unnest(df, nested_col)
        joined = flat.join(F.broadcast(dim), on=on, how=how)
        value_cols = [c for c in joined.columns if c not in group_keys]
        return nest(joined, group_keys, nested_col, value_cols, order_by=order_by)

    flat = unnest(df.select(*keys, nested_col), nested_col)
    joined = flat.join(F.broadcast(dim), on=on, how=how)
    value_cols = [c for c in joined.columns if c not in keys]
    renested = nest(joined, keys, nested_col, value_cols, order_by=order_by)
    scalars = df.drop(nested_col)
    return scalars.join(renested, on=list(keys), how="left")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    right_ts_out: str = "matched_ts",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the matching right row sharing
    ``keys`` — ``backward`` = latest right with ``right.ts <= left.ts``
    (default; ties match), ``forward`` = earliest right with ``right.ts >=
    left.ts``, ``nearest`` = whichever side is closer (tie -> backward).
    ``tolerance`` (seconds for time columns, same units for numerics)
    nulls out matches farther than the bound — pandas ``merge_asof``
    semantics: an out-of-tolerance side never blocks the other. The
    canonical trip-track/time-series alignment operator the reference
    approximates with its per-day 1:1 match (J5).

    Spark has no native as-of join; a naive range join is O(n*m) per key.
    This is the union+window rewrite: tag both sides, sort within each key
    partition by (ts, side), fill the right payload with
    ``last/first(ignorenulls)``, keep left rows. ONE shuffle (the window
    partition), no join node at all — at 100 TB this is the difference
    between a sort within partitions and an exploding range join.
    ``nearest`` computes both fills over the SAME sorted window — still
    one shuffle. (Equal-ts rights sort before left, so the backward fill
    owns distance-0 matches; that is exactly the nearest tie rule.)
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload_cols collide with left columns: {overlap}")
    # right side sorts BEFORE left at equal ts (tag 0) so the backward fill
    # matches ties; for pure-forward semantics it must sort AFTER (tag 2)
    # so the following-window still sees an equal-ts right row
    r_side = 2 if direction == "forward" else 0
    l_tagged = left.withColumn("__side__", F.lit(1)).withColumn(
        "__rts__", F.lit(None).cast(right.schema[ts_col].dataType)
    )
    for c in payload_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *keys,
        F.col(ts_col),
        F.lit(r_side).alias("__side__"),
        F.col(ts_col).alias("__rts__"),
        *payload_cols,
    )
    l_cols = [c for c in l_tagged.columns if c not in r_tagged.columns]
    r_aligned = r_tagged
    for c in l_cols:
        r_aligned = r_aligned.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    unioned = l_tagged.unionByName(r_aligned.select(l_tagged.columns))

    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    def _num(col):
        if isinstance(right.schema[ts_col].dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    order = [F.col(ts_col).asc(), F.col("__side__").asc()]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("__rts__", ignorenulls=True).over(wb).alias("__b_ts__"))
        fills += [
            F.last(c, ignorenulls=True).over(wb).alias(f"__b_{c}__")
            for c in payload_cols
        ]
    if direction in ("forward", "nearest"):
        fills.append(F.first("__rts__", ignorenulls=True).over(wf).alias("__f_ts__"))
        fills += [
            F.first(c, ignorenulls=True).over(wf).alias(f"__f_{c}__")
            for c in payload_cols
        ]
    filled = unioned.select("*", *fills).filter(F.col("__side__") == 1)

    lt = _num(F.col(ts_col))
    if direction == "nearest":
        db = lt - _num(F.col("__b_ts__"))
        df_ = _num(F.col("__f_ts__")) - lt
        b_ok = F.col("__b_ts__").isNotNull() & (
            F.lit(True) if tolerance is None else (db <= F.lit(float(tolerance)))
        )
        f_ok = F.col("__f_ts__").isNotNull() & (
            F.lit(True) if tolerance is None else (df_ <= F.lit(float(tolerance)))
        )
        use_b = b_ok & (~f_ok | (db <= df_))
        out = filled.withColumn(
            right_ts_out,
            F.when(use_b, F.col("__b_ts__")).when(f_ok, F.col("__f_ts__")),
        )
        for c in payload_cols:
            out = out.withColumn(
                c,
                F.when(use_b, F.col(f"__b_{c}__")).when(f_ok, F.col(f"__f_{c}__")),
            )
        drop = ["__b_ts__", "__f_ts__"] + [
            f"__{s}_{c}__" for s in "bf" for c in payload_cols
        ]
    else:
        side = "b" if direction == "backward" else "f"
        mts = F.col(f"__{side}_ts__")
        dist = (lt - _num(mts)) if direction == "backward" else (_num(mts) - lt)
        ok = mts.isNotNull() & (
            F.lit(True) if tolerance is None else (dist <= F.lit(float(tolerance)))
        )
        out = filled.withColumn(right_ts_out, F.when(ok, mts))
        for c in payload_cols:
            out = out.withColumn(c, F.when(ok, F.col(f"__{side}_{c}__")))
        drop = [f"__{side}_ts__"] + [f"__{side}_{c}__" for c in payload_cols]
    return out.drop("__side__", "__rts__", *drop)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join (GPS fix -> trip window containment,
    R/merge-trips.R:71-151's time alignment) without a range join.

    A raw ``ON p.ts BETWEEN i.start AND i.end`` is a broadcast-nested-loop
    at scale. Instead both sides discretize to ``bin_seconds`` time bins:
    intervals explode to the bins they cover, points compute one bin, and
    the match is an EQUI-join on (keys, bin) + a residual containment
    filter. Each point matches an interval exactly once (its single bin hits
    one exploded row per interval). Shuffle is on (keys, bin) — the
    explode factor is interval_length/bin_seconds, so pick a bin near the
    typical interval length."""
    keys = list(keys)

    from pyspark.sql import types as T

    def _sec(df, c):
        # TIMESTAMP_NTZ cannot cast straight to double; go through
        # TIMESTAMP (session TZ, pinned UTC by the harness) first —
        # a no-op for TimestampType, schema-aware so plain numeric
        # epoch columns still work
        col = F.col(c)
        if isinstance(
            df.schema[c].dataType,
            (T.DateType, T.TimestampType, T.TimestampNTZType),
        ):
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    binned_pts = points.withColumn(
        "__bin__", F.floor(_sec(points, ts_col) / bin_seconds).cast("long")
    )
    s_bin = F.floor(_sec(intervals, start_col) / bin_seconds).cast("long")
    e_bin = F.floor(_sec(intervals, end_col) / bin_seconds).cast("long")
    exploded = intervals.withColumn("__bin__", F.explode(F.sequence(s_bin, e_bin)))
    return (
        binned_pts.join(exploded, [*keys, "__bin__"])
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bin__")
    )


def scd2_intervals(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build SCD2 (slowly-changing-dimension type 2) validity intervals
    from a change log: each change row becomes a dimension version valid
    over ``[ts, next change ts)``; the latest version per key has a null
    ``valid_to`` and ``is_current=true``. This is the lake-side pattern
    for the reference's mutable metadata dims (Google-Sheets tables,
    device installs — R/validation-functions.R:3-6 joins devices to
    installs by current state; SCD2 is the point-in-time-correct
    generalization).

    ONE shuffle (the window partition on ``keys``); the lead() is a
    per-key sorted scan, so the build is O(changes) regardless of history
    depth. Ordering is total via ``tiebreak_col``, so interval bounds are
    deterministic under same-timestamp changes. Point-in-time lookups
    against the result should use :func:`asof_join` on the change log (one
    shuffle, no range join) rather than an inequality join on the
    intervals.
    """
    from pyspark.sql.window import Window

    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    out = changes.withColumn(valid_to, F.lead(ts_col).over(w))
    return out.withColumnRenamed(ts_col, valid_from).withColumn(
        current_col, F.col(valid_to).isNull()
    )


def grid_neighbor_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
    round_to: int = 6,
) -> DataFrame:
    """Radius self-join via grid blocking — the canonical scalable spatial
    join: bucket points into ``radius``-sized cells, replicate each point
    as a PROBE into its 3x3 cell neighborhood, equi-join probes against
    build points in their own cell, then verify the exact euclidean
    distance. Every true pair has cell offsets within +-1, so blocking is
    exact (no misses), and the ``id_a < id_b`` gate emits each pair
    exactly once (the probe-from-the-smaller-id copy survives; the mirror
    match fails the gate).

    Scale shape: ONE equi-join shuffle on the cell key after a constant
    9x narrow replication of the probe side — candidate volume is bounded
    by per-cell density, never |points|^2. Skewed hot cells are ordinary
    join skew (AQE splits them). Contract: ids unique per point.

    Returns (id_a, id_b, dist) for pairs with dist <= radius.
    """
    if not radius > 0:
        raise ValueError(f"radius must be positive, got {radius}")
    pts = df.select(
        F.col(id_col).alias("__id__"),
        F.col(x_col).cast("double").alias("__x__"),
        F.col(y_col).cast("double").alias("__y__"),
        F.floor(F.col(x_col) / radius).cast("long").alias("__cx__"),
        F.floor(F.col(y_col) / radius).cast("long").alias("__cy__"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = pts.select(
        F.col("__id__").alias("id_a"),
        F.col("__x__").alias("xa"),
        F.col("__y__").alias("ya"),
        F.explode(offsets).alias("__o__"),
        (F.col("__cx__")).alias("__pcx__"),
        (F.col("__cy__")).alias("__pcy__"),
    ).select(
        "id_a", "xa", "ya",
        (F.col("__pcx__") + F.col("__o__.dx")).alias("__cx__"),
        (F.col("__pcy__") + F.col("__o__.dy")).alias("__cy__"),
    )
    build = pts.select(
        F.col("__id__").alias("id_b"),
        F.col("__x__").alias("xb"),
        F.col("__y__").alias("yb"),
        "__cx__", "__cy__",
    )
    # explicit products, not pow(x, 2): Math.pow is only 1-ulp accurate,
    # multiplication is exact IEEE — keeps the verify predicate
    # bit-identical to the oracle's (dx*dx + dy*dy)
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        probes.join(build, ["__cx__", "__cy__"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= radius * radius)
        .select(
            "id_a", "id_b", F.round(F.sqrt(d2), round_to).alias("dist")
        )
    )


def fuzzy_join_1edit(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """Fuzzy equi-join at edit distance <= 1 via deletion-neighborhood
    blocking (the FastSS/SymSpell trick): each side emits the string
    itself plus every single-deletion variant; any pair within one edit
    (substitution, insertion, or deletion) shares at least one variant,
    so candidates come from a plain EQUI-join on the variant key — never
    an all-pairs product — and an exact ``levenshtein <= 1`` verify prunes
    the neighborhood's false candidates.

    Scale shape: a (len+1)x narrow expansion per side (Generate), ONE
    variant-keyed shuffle join, distinct pairs, then the Levenshtein
    verify runs only on candidates. Blocking is provably complete for one
    edit; for k edits, recurse the deletion depth (cost (len choose k)).
    """
    def variants(df: DataFrame, col: str, side: str) -> DataFrame:
        v = (
            f"array_union(array({col}), "
            f"transform(sequence(1, length({col})), "
            f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))))"
        )
        return df.select(
            F.col(col).alias(f"{side}_value"),
            F.explode(F.expr(v)).alias("__v__"),
        ).distinct()

    lv = variants(left, left_col, "left")
    rv = variants(right, right_col, "right")
    cands = lv.join(rv, "__v__").select("left_value", "right_value").distinct()
    return cands.filter(
        F.levenshtein(F.col("left_value"), F.col("right_value")) <= 1
    )
