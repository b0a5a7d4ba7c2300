"""Mergeable distinct-count sketches (KMV / bottom-k).

Spark's production path for approximate distinct counting is the built-in
HLL++ (``approx_count_distinct`` — partial-aggregated, bounded state). Its
estimates, however, are engine-specific: no other system reproduces them
bit-for-bit, so they can't be reconciled across engines or against an
oracle. The KMV (k-minimum-values) sketch here fills that gap: every hash
is md5, the sketch is the k smallest unit-interval hashes of the distinct
values, and the estimator (k-1)/h_k is a deterministic closed form — any
engine with md5 computes the identical estimate, which makes cross-engine
audits (and the driver's DuckDB gate) possible.

Mergeability is the scale property: the union sketch of two groups is just
the bottom-k of their combined hash sets, so per-partition/per-source
sketches roll up without rescanning the data — the same algebra
Theta/KMV sketches use in Druid/DataSketches.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 12 hex chars = 48 bits: exactly representable in a double (2^53), uniform
# on (0, 1] after the +1 offset that avoids a zero divisor.
_HEX_CHARS = 12
_SCALE = 16 ** _HEX_CHARS


def unit_hash(col: Column) -> Column:
    """md5-derived uniform hash in (0, 1], identical in any md5 engine."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, _HEX_CHARS), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(_SCALE))


def kmv_sketch(
    df: DataFrame, keys: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Bottom-k sketch per group: (keys..., hs: array<double> ascending,
    n_kept). ``hs`` holds the k smallest distinct unit hashes of
    ``value_col`` — the whole sketch state, mergeable via ``merge_sketches``.

    Shape: dedup on (keys, h) — map-side partial dedup, one shuffle — then a
    per-group bottom-k via window row_number. Rows beyond k are dropped at
    the filter, so downstream state is k doubles per group regardless of
    group size."""
    h = unit_hash(F.col(value_col)).alias("__h__")
    hashed = df.select(*[F.col(c) for c in keys], h).dropDuplicates(
        [*keys, "__h__"]
    )
    w = Window.partitionBy(*keys).orderBy("__h__")
    kept = hashed.withColumn("__rn__", F.row_number().over(w)).filter(
        F.col("__rn__") <= k
    )
    return kept.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__h__")).alias("hs"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def kmv_estimate(k: int) -> Column:
    """Distinct-count estimate from a sketch row: exact ``n_kept`` while the
    group has fewer than k distinct values (the sketch IS the value set),
    else (k-1)/h_k."""
    return F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((k - 1) / F.element_at(F.col("hs"), k))


def uniform_row_sample(
    df: DataFrame, keys: list[str], row_key: Column, k: int = 128
) -> DataFrame:
    """Deterministic uniform sample of ``k`` rows per group: bottom-k by the
    md5 unit hash of ``row_key`` (a unique row identifier). The hash plays
    the RNG, so the 'random' sample is identical on any engine and stable
    under repartitioning.

    CONTRACT: ``row_key`` must be unique — or at least any rows sharing a
    key must be value-identical in every column the sample feeds. A
    duplicate key ties the hash; if the tie straddles the rank-k boundary,
    each engine keeps an arbitrary one of the tied PHYSICAL rows (found in
    real dirty data: ~20% duplicated ids with differing measures). Fold
    the measured columns into the key when ids can repeat.

    This is the quantile-sketch building block: percentile(sample) estimates
    percentile(population) with error ~1/sqrt(k), and samples MERGE — the
    bottom-k of a union of group samples is the union's sample — so
    per-partition sampling rolls up without touching raw data again.
    Standing alternative to shuffling every value into an exact
    percentile (A8/A10) when the group is billions of rows.

    Executed as TWO-LEVEL bottom-k (the merge property above, applied to
    the plan itself): a single window partitioned only by low-cardinality
    ``keys`` sorts the ENTIRE group in one task — parallelism pinned at
    n_groups forever, the 199/200-straggler shape. Level 1 ranks within
    (keys, salt) — ``n_salts`` deterministic shards derived from the row
    hash — keeping each sort 1/n_salts the size; level 2 ranks the
    surviving k·n_salts rows per group, a constant-size frame at any data
    scale. The global bottom-k is always inside the union of per-salt
    bottom-k's, so the selected rows are identical."""
    n_salts = 64
    hashed = df.withColumn("__h__", unit_hash(row_key)).withColumn(
        "__salt__", F.pmod(F.xxhash64(F.col("__h__")), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*keys, "__salt__").orderBy("__h__")
    survivors = (
        hashed.withColumn("__rn__", F.row_number().over(w1))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__", "__salt__")
    )
    w2 = Window.partitionBy(*keys).orderBy("__h__")
    return (
        survivors.withColumn("__rn__", F.row_number().over(w2))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__", "__h__")
    )


def kmv_set_estimates(pairs: DataFrame, k: int) -> DataFrame:
    """Theta-sketch-style set algebra on two KMV sketches carried as
    ``hs_a``/``hs_b`` array columns: adds ``est_union``, ``est_inter``,
    ``est_jaccard``.

    Estimator: the union sketch U = bottom-k of hs_a ∪ hs_b estimates
    |A ∪ B| like any KMV; ρ = fraction of U's hashes present in BOTH input
    sketches estimates Jaccard directly (U is a uniform sample of A ∪ B);
    |A ∩ B| ≈ ρ·|A ∪ B|. Everything is closed-form array arithmetic on
    2·k doubles per row — set overlap between 100 TB partitions compared
    without rescanning either side."""
    out = pairs.withColumn(
        "__u__", F.slice(F.array_sort(F.array_union("hs_a", "hs_b")), 1, k)
    )
    kk = F.size("__u__")
    tau = F.expr("element_at(__u__, size(__u__))")
    est_union = F.when(kk < k, kk.cast("double")).otherwise((k - 1) / tau)
    rho = (
        F.size(F.array_intersect(F.col("__u__"), F.array_intersect("hs_a", "hs_b")))
        / kk
    )
    return (
        out.withColumn("est_union", est_union)
        .withColumn("est_jaccard", rho)
        .withColumn("est_inter", rho * F.col("est_union"))
        .drop("__u__")
    )


def merge_sketches(sketches: DataFrame, k: int, keys: list[str] | None = None) -> DataFrame:
    """Union-merge sketches (optionally regrouped onto coarser ``keys``,
    e.g. per-source -> global): bottom-k of the combined hash arrays.
    Never touches the original data — this is the rollup path that makes
    per-partition sketching O(k) to combine at any fan-in."""
    keys = keys or []
    exploded = sketches.select(
        *[F.col(c) for c in keys], F.explode("hs").alias("__h__")
    ).dropDuplicates([*keys, "__h__"])
    if keys:
        w = Window.partitionBy(*keys).orderBy("__h__")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("__h__")
    kept = exploded.withColumn("__rn__", F.row_number().over(w)).filter(
        F.col("__rn__") <= k
    )
    return kept.groupBy(*[F.col(c) for c in keys]).agg(
        F.sort_array(F.collect_list("__h__")).alias("hs"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def cms_sketch(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as pure column
    expressions: ``d`` independent hash rows, each with ``16^chars``
    buckets; a bucket key is the leading hex substring of
    ``md5('cms<j>#' || item)`` — staying in hex-STRING space keeps the
    bucketing identical in any engine with md5, no base conversion. Point
    estimate = min over the d rows of the bucket count, which only ever
    OVER-counts (collisions add), never under.

    The companion to the exact heavy-hitters pass: the sketch is
    ``d * 16^chars`` rows TOTAL regardless of corpus size or item
    cardinality, partial-aggregates map-side, and merges across shards /
    days / sources by summing bucket counts — the frequency analogue of
    the KMV distinct sketch above.

    Returns (seed, bucket, c) — the sketch table.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("seed"),
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{j}#"), F.col(item_col).cast("string"))),
                    1,
                    bucket_hex_chars,
                ).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .select("r.seed", "r.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    d: int = 4,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Point-query the Count-Min sketch for each item: recompute the d
    bucket keys, join the (tiny, broadcast) sketch table, take the min
    bucket count. Missing buckets count 0 (the item was never seen).

    Returns the items frame + ``est_c``.
    """
    keyed = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("seed"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"cms{j}#"),
                                    F.col(item_col).cast("string"),
                                )
                            ),
                            1,
                            bucket_hex_chars,
                        ).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("r"),
    ).select("*", "r.seed", "r.bucket").drop("r")
    joined = keyed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    others = [c for c in items.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_c"))
    )


def log_histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    round_to: int = 6,
) -> DataFrame:
    """Approximate quantiles from a base-2 log histogram of integer cents —
    the mergeable, ENGINE-EXACT alternative to percentile sketches
    (HdrHistogram's idea): bucket = floor(log2(cents)) computed as
    ``length(bin(cents)) - 1`` (pure integer/string arithmetic, no float
    log at a power-of-two boundary to disagree on), estimate = the
    bucket's geometric midpoint ``1.5 * 2^b`` cents. Relative error is
    bounded by the bucket ratio (2x); buckets merge by adding counts, so
    shards sketch independently — the property that matters at 100 TB.

    Scale shape: one partial-aggregated (group, bucket) count — at most
    ~64 buckets per group cross the shuffle regardless of row count —
    then a cumulative window over the tiny bucket frame and one
    conditional-min pick per quantile. Contract: values must be positive
    money-scale doubles (cents >= 1 after rounding).

    Returns (group, n, and one ``p{q}`` column per requested quantile).
    """
    from pyspark.sql.window import Window

    cents = F.round(F.col(value_col) * 100).cast("long")
    bucket = (F.length(F.bin(cents)) - 1).cast("int")
    counts = (
        df.select(F.col(group_col), bucket.alias("__b__"))
        .groupBy(group_col, "__b__")
        .agg(F.count(F.lit(1)).cast("long").alias("__c__"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(group_col)
    cum = counts.select(
        group_col,
        "__b__",
        F.sum("__c__").over(w).alias("__cum__"),
        F.sum("__c__").over(wall).alias("__n__"),
    )
    # F.shiftleft requires a literal bit count; the SQL form takes a column
    est = F.round(
        3.0 * F.expr("shiftleft(CAST(1 AS BIGINT), __b__)") / 200.0, round_to
    )
    picked = cum.withColumn("__est__", est)
    aggs = [F.max("__n__").alias("n")]
    for q in quantiles:
        name = f"p{str(q).replace('0.', '')}"
        target = F.ceil(F.lit(q) * F.col("__n__")).cast("long")
        aggs.append(
            F.min(F.when(F.col("__cum__") >= target, F.col("__est__"))).alias(name)
        )
    return picked.groupBy(group_col).agg(*aggs)


# Poisson(1) inverse-CDF cutpoints: P(X<=k) for k = 0..4; mass above 4
# collapses to 5. Draws live on a 16-bit grid (u = (i+1)/65536); the
# comparison happens in STRING space — fixed-width lowercase hex orders
# numerically, so u > c iff hex4(i) > hex4(floor(65536*c) - 1).
_POISSON_CUM = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
                0.9810118431238462, 0.9963401531726563)
_POISSON_HEX_CUTS = tuple(
    format(math.floor(c * 65536) - 1, "04x") for c in _POISSON_CUM
)


def poisson_bootstrap_ci(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    row_key: Column,
    n_resamples: int = 16,
    ci: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Distributed bootstrap confidence interval for the per-group mean —
    the Poisson bootstrap (Chamandy et al.): instead of resampling n rows
    WITH replacement (a global pass per replicate), each row independently
    appears ``w ~ Poisson(1)`` times in each replicate, so ALL replicates
    are computed in ONE aggregation pass: 2*B sum expressions
    (sum(w_b*v), sum(w_b)) over the corpus — no explode, no shuffle growth
    with B. Draws are md5-deterministic: ceil(B/8) digests per row (the
    minhash chain trick — hashing once serves 8 draws), each 16-bit slice
    pushed through the inverse CDF as five lexicographic hex compares
    (measured fastest: hex->long conv cost 2.3x more, a per-draw constant
    map was rebuilt per row because CreateMap does not constant-fold).
    Zero RNG state; every replicate is engine-reproducible. Per-row cost
    is linear in B — size B to the precision the CI needs, not more.

    Exactness: ``value`` must be integer-scaled; replicate means are exact
    integer ratios and the CI percentile interpolates identical doubles in
    any engine. Rows sharing a ``row_key`` draw identical weights
    (correlated duplicates — fold distinguishing columns into the key).

    Returns (keys..., n_rows, mean, ci_lo, ci_hi).
    """
    n_md5 = -(-n_resamples * 4 // 32)  # 4 hex chars (16 bits) per draw
    chain = F.concat(
        *[
            F.md5(F.concat(row_key, F.lit(f"~{j}")))
            for j in range(n_md5)
        ]
    )
    base = df.select(
        *keys,
        F.col(value_col).cast("long").alias("__v__"),
        chain.alias("__chain__"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("__n__"),
        F.sum("__v__").alias("__sv__"),
    ]
    for b in range(n_resamples):
        piece = F.substring("__chain__", 1 + 4 * b, 4)
        w = sum(
            (piece > F.lit(h)).cast("int") for h in _POISSON_HEX_CUTS
        ).cast("long")
        aggs.append(F.sum(w * F.col("__v__")).alias(f"__swv{b}__"))
        aggs.append(F.sum(w).alias(f"__sw{b}__"))
    agged = base.groupBy(*keys).agg(*aggs)
    # (keys, 1 row) x B -> long replicate frame via stack; a tiny-group
    # replicate can draw all-zero weights: null its mean (percentile skips
    # nulls in both engines) instead of dividing 0/0
    parts = ", ".join(
        f"{b}, CASE WHEN __sw{b}__ > 0 "
        f"THEN __swv{b}__ / CAST(__sw{b}__ AS DOUBLE) END"
        for b in range(n_resamples)
    )
    reps = agged.selectExpr(
        *keys,
        "__n__", "__sv__",
        f"stack({n_resamples}, {parts}) AS (__b__, __mean__)",
    )
    lo_q, hi_q = (1.0 - ci) / 2.0, 1.0 - (1.0 - ci) / 2.0
    return reps.groupBy(*keys).agg(
        F.max("__n__").alias("n_rows"),
        F.round(F.max("__sv__") / F.max("__n__"), round_to).alias("mean"),
        F.round(F.percentile("__mean__", lo_q), round_to).alias("ci_lo"),
        F.round(F.percentile("__mean__", hi_q), round_to).alias("ci_hi"),
    )


# --- HyperLogLog (register-max sketch, engine-exact md5 flavor) -------------------------

def hll_sketch(
    df: DataFrame, keys: list[str], value_col: str, b: int = 10
) -> DataFrame:
    """HyperLogLog registers per group — the constant-memory distinct
    sketch (2^b bytes of state per group vs KMV's k doubles), in the same
    engine-exact md5 flavor as :func:`kmv_sketch`: Spark's own HLL++
    (``approx_count_distinct``) is the production default but its
    estimates are engine-private; these registers are reproducible by any
    engine with md5, so sketches built by different systems reconcile.

    Register math is pure integer arithmetic: the 48-bit md5 prefix splits
    into a top-``b``-bit bucket and a (48-b)-bit tail; rho = leading-zero
    count of the tail + 1 comes from the tail's binary STRING length
    (``conv(v, 10, 2)``), never a float log2 whose boundary rounding could
    differ across engines. One partial-aggregated ``max`` per (group,
    bucket) — register max is what makes HLL mergeable: union =
    element-wise max, so per-partition/per-day sketches roll up without
    rescanning (same algebra the streaming-histogram proof covers).

    Returns (keys..., j, M) register rows — at most 2^b per group.
    """
    rest = 48 - b
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, _HEX_CHARS), 16, 10
    ).cast("long")
    j = (h / F.lit(1 << rest)).cast("long").alias("j")
    v = (h % F.lit(1 << rest)).alias("__v__")
    rho = (
        F.when(F.col("__v__") == 0, F.lit(rest + 1))
        .otherwise(F.lit(rest + 1) - F.length(F.conv(F.col("__v__"), 10, 2)))
        .alias("__rho__")
    )
    return (
        df.select(*[F.col(c) for c in keys], j, v)
        .select(*keys, "j", rho)
        .groupBy(*keys, "j")
        .agg(F.max("__rho__").alias("M"))
    )


def hll_estimate(
    registers: DataFrame, keys: list[str], b: int = 10, round_to: int = 3
) -> DataFrame:
    """Distinct estimate from HLL registers: E = alpha_m * m^2 / Z with the
    standard small-range linear-counting correction (E <= 2.5m with empty
    registers -> m*ln(m/zeros)). The harmonic sum Z is ENGINE-EXACT despite
    being float: every 2^-M term is a multiple of 2^-(48-b+1) and the total
    is < 2^b, so all partial sums fit the 53-bit mantissa and no summation
    order can change the value."""
    m = 1 << b
    # standard HLL bias constants (Flajolet et al. 2007): the closed form
    # 0.7213/(1+1.079/m) is the LARGE-m asymptote; m in {16,32,64} has
    # dedicated constants, below which the sketch is unspecified
    if b < 4:
        raise ValueError(f"hll_estimate requires b >= 4 (got b={b})")
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(b, 0.7213 / (1.0 + 1.079 / m))
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("__z_used__"),
        F.count(F.lit(1)).alias("__n_regs__"),
    )
    zeros = F.lit(m) - F.col("__n_regs__")
    z = F.col("__z_used__") + zeros.cast("double")
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(m) / zeros)
    ).otherwise(raw)
    return agg.select(
        *keys,
        F.lit(m).alias("m"),
        zeros.cast("long").alias("n_empty"),
        F.round(est, round_to).alias("est_distinct"),
    )
