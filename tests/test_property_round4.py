"""Property tests for the round-4 operators.

Hypothesis drives SMALL random instances through the Spark operators and
checks invariants a pinned example can't cover: PMM's support guarantee on
arbitrary gappy series, fingerprint permutation-invariance/sensitivity,
and the EWMA fold against an independent Python reference.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_pmm_fills_come_from_observed_support(spark, values):
    """For ANY gappy integer series: every imputed value is the mean of
    <=5 draws from the OBSERVED values (so it lies in [min, max] of the
    observed support and is a multiple of 1/5), observed rows pass
    through unchanged, and a fully-null series stays null."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        impute_pmm_replicates,
    )

    rows = [("k", f"p{i:02d}", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, ord string, x int, v int")
    out = {r.ord: r for r in impute_pmm_replicates(
        df, ["k"], "ord", "x", "v", m=5, donors=5, seed=1).collect()}
    observed = [v for v in values if v is not None]
    for i, v in enumerate(values):
        r = out[f"p{i:02d}"]
        if v is not None:
            assert r.v == float(v) and not r.is_imputed
        elif not observed:
            assert r.v is None and r.is_imputed
        else:
            assert r.is_imputed
            assert min(observed) <= r.v <= max(observed)
            assert (r.v * 5) % 1 == 0  # mean of 5 integer draws


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.one_of(st.none(), st.text(alphabet="abXY", max_size=3)),
        ),
        min_size=1,
        max_size=12,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_fingerprint_permutation_invariant_and_sensitive(spark, rows, seed):
    """The fingerprint of ANY multiset of rows is row-order invariant,
    and appending one extra row always changes the k column's multiset
    sums (n_rows +1 and the hash sums move together)."""
    import random

    from peskas_timor_data_pipeline_spark.operators.restructure import (
        dataset_fingerprint,
    )

    df1 = spark.createDataFrame(rows, "k long, v string")
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "k long, v string")
    fp = lambda df: sorted(map(tuple, dataset_fingerprint(df).collect()))
    assert fp(df1) == fp(df2)

    extra = spark.createDataFrame(rows + [rows[0]], "k long, v string")
    a = {r.column_name: r for r in dataset_fingerprint(df1).collect()}
    b = {r.column_name: r for r in dataset_fingerprint(extra).collect()}
    assert b["k"].n_rows == a["k"].n_rows + 1
    assert (b["k"].sum_hi, b["k"].sum_lo) != (a["k"].sum_hi, a["k"].sum_lo)


@given(
    series=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_ewma_fold_matches_python_reference(spark, series):
    """The windowed EWMA fold equals a plain Python left fold over the
    last 16 values, element for element (same float op order)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(1, i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "u long, i long, v double")
    w = Window.partitionBy("u").orderBy("i").rowsBetween(-15, 0)
    ewma = F.expr(
        "aggregate(slice(__win__, 2, size(__win__) - 1), element_at(__win__, 1), "
        "(acc, x) -> cast(0.2 as double) * x + cast(0.8 as double) * acc)"
    )
    got = {
        r.i: r.e
        for r in df.select("i", F.collect_list("v").over(w).alias("__win__"))
        .select("i", ewma.alias("e"))
        .collect()
    }
    for i in range(len(series)):
        window = series[max(0, i - 15): i + 1]
        acc = float(window[0])
        for x in window[1:]:
            acc = 0.2 * float(x) + 0.8 * acc
        assert got[i] == acc


@given(
    starts=st.lists(
        st.integers(min_value=0, max_value=5_000),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_interval_union_matches_python_sweep(spark, starts):
    """The two-window island sweep computes EXACTLY the union length of
    arbitrary overlapping [s, s+600) second intervals (checked against a
    plain Python merge), including duplicate and touching starts."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    span = 600
    rows = [(1, s * 1_000_000, (s + span) * 1_000_000) for s in starts]
    df = spark.createDataFrame(rows, "user_id long, s long, e long")
    w_ord = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "ni", F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0)
    ).withColumn(
        "island", F.sum("ni").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = (
        flagged.groupBy("user_id", "island")
        .agg(F.min("s").alias("a"), F.max("e").alias("b"))
        .groupBy("user_id")
        .agg(F.expr("sum(b - a) div 1000000").alias("covered"))
        .collect()[0]
        .covered
    )

    # independent Python sweep
    ivs = sorted((s, s + span) for s in starts)
    total, cur_s, cur_e = 0, None, None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    total += cur_e - cur_s
    assert got == total


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    """Degree-ordered node-iterator == brute-force enumeration on random
    graphs (including multi-edges, self-loops, reversed duplicates —
    normalization is part of the contract)."""
    import itertools
    import random

    from peskas_timor_data_pipeline_spark.operators.graph import triangle_count

    rng = random.Random(42)
    for trial in range(3):
        n = 12
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges += [(b, a) for a, b in edges[:5]]  # reversed dups
        df = spark.createDataFrame(edges, "src long, dst long")
        got = triangle_count(df, "src", "dst").collect()[0]
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expect = sum(
            1
            for x, y, z in itertools.combinations(sorted(adj), 3)
            if y in adj[x] and z in adj[x] and z in adj[y]
        )
        assert got.n_triangles == expect, (trial, got, expect)
        assert got.n_edges == len(und)
        assert got.n_nodes == len(adj)


def test_triangle_count_empty_and_triangle_free(spark):
    from peskas_timor_data_pipeline_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "src long, dst long")
    r = triangle_count(empty, "src", "dst").collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (0, 0, 0)
    # a path graph has zero triangles
    path = spark.createDataFrame([(i, i + 1) for i in range(6)], "src long, dst long")
    r = triangle_count(path, "src", "dst").collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (7, 6, 0)
