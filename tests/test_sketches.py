"""KMV sketch: estimator accuracy and the union-merge algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

K = 32


def test_kmv_merge_equals_direct_global_sketch(spark):
    """Rolling up per-group sketches must yield byte-identical state to
    sketching the whole table directly — the property that makes
    per-partition sketching composable at any fan-in."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        kmv_sketch,
        merge_sketches,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    per_flag = kmv_sketch(li, ["l_returnflag"], "l_suppkey", k=K)
    merged = merge_sketches(per_flag, k=K).collect()[0]
    direct = kmv_sketch(li.withColumn("g", F.lit(1)), ["g"], "l_suppkey", k=K).collect()[0]
    assert merged.hs == direct.hs
    assert merged.n_kept == direct.n_kept


def test_kmv_estimate_small_group_is_exact_large_group_close(spark):
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    est = (
        kmv_sketch(li, ["l_returnflag"], "l_suppkey", k=K)
        .select("l_returnflag", kmv_estimate(K).alias("est"), "n_kept")
        .join(
            li.groupBy("l_returnflag").agg(
                F.countDistinct("l_suppkey").alias("exact")
            ),
            "l_returnflag",
        )
        .collect()
    )
    assert est
    for r in est:
        if r.n_kept < K:  # sketch holds the whole value set
            assert r.est == r.exact
        else:  # KMV standard error ~ 1/sqrt(k-1) ≈ 18% at k=32
            assert abs(r.est - r.exact) / r.exact < 0.5


def test_kmv_set_estimates_track_exact_jaccard(spark):
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        kmv_set_estimates,
        kmv_sketch,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sk = kmv_sketch(li, ["l_returnflag"], "l_suppkey", k=K)
    pairs = sk.select(
        F.col("l_returnflag").alias("flag_a"), F.col("hs").alias("hs_a")
    ).join(
        sk.select(F.col("l_returnflag").alias("flag_b"), F.col("hs").alias("hs_b")),
        F.col("flag_a") < F.col("flag_b"),
    )
    est = kmv_set_estimates(pairs, K).collect()
    assert est  # at least one flag pair
    membership = li.select("l_returnflag", "l_suppkey").distinct()
    sets = {
        r.l_returnflag: set()
        for r in membership.select("l_returnflag").distinct().collect()
    }
    for r in membership.collect():
        sets[r.l_returnflag].add(r.l_suppkey)
    for r in est:
        a, b = sets[r.flag_a], sets[r.flag_b]
        exact_j = len(a & b) / len(a | b)
        exact_u = len(a | b)
        # KMV standard error ~1/sqrt(k-1); allow a generous band
        assert abs(r.est_jaccard - exact_j) < 0.35
        assert abs(r.est_union - exact_u) / exact_u < 0.5


def test_incremental_rollup_equals_direct(spark):
    from peskas_timor_data_pipeline_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    keys = ["l_returnflag"]
    measures = {"s": ("sum", "l_quantity"), "n": ("count", "l_quantity"),
                "lo": ("min", "l_discount"), "hi": ("max", "l_discount")}
    state = None
    for i in range(4):
        batch = li.filter(F.col("l_orderkey") % 4 == i)
        state = merge_rollup(state, partial_rollup(batch, keys, measures), keys, measures)
    direct = li.groupBy(*keys).agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"),
        F.min("l_discount").alias("lo"), F.max("l_discount").alias("hi"),
    )
    inc = {r.l_returnflag: (round(r.s, 6), r.n, r.lo, r.hi) for r in state.collect()}
    ref = {r.l_returnflag: (round(r.s, 6), r.n, r.lo, r.hi) for r in direct.collect()}
    assert inc == ref


def test_cms_sketch_matches_python_replica_and_overcounts(spark):
    """The sketch must equal an exact hashlib replica (same md5 bucket
    formula), and every point estimate must be >= the true count (Count-Min
    only ever over-counts)."""
    import hashlib
    from collections import Counter

    from peskas_timor_data_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    words = ("spark duck spark row table duck spark scan scan row "
             "merge table spark row duck").split()
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    true = Counter(words)

    def bucket(j, tok):
        return hashlib.md5(f"cms{j}#{tok}".encode()).hexdigest()[:2]

    expect_sketch = Counter()
    for w in words:
        for j in range(4):
            expect_sketch[(j, bucket(j, w))] += 1

    got_sketch = {(r.seed, r.bucket): r.c
                  for r in cms_sketch(df, "tok", d=4).collect()}
    assert got_sketch == dict(expect_sketch)

    items = spark.createDataFrame([(w,) for w in set(words)], "tok string")
    est = {r.tok: r.est_c for r in cms_estimate(
        items, cms_sketch(df, "tok", d=4), "tok", d=4).collect()}
    for w, c in true.items():
        assert est[w] >= c
        expected_est = min(expect_sketch[(j, bucket(j, w))] for j in range(4))
        assert est[w] == expected_est

    # an item never inserted estimates 0 (all its buckets empty) unless it
    # collides — verify via the replica
    probe = spark.createDataFrame([("zzz-unseen",)], "tok string")
    est0 = cms_estimate(
        probe, cms_sketch(df, "tok", d=4), "tok", d=4).collect()[0].est_c
    assert est0 == min(expect_sketch.get((j, bucket(j, "zzz-unseen")), 0)
                       for j in range(4))


def test_cms_sketch_merges_by_summing_buckets(spark):
    """sketch(A) + sketch(B) (bucket-wise sum) must equal sketch(A ∪ B) —
    the mergeability that lets shards/days/sources sketch independently
    and combine later (same property the KMV sketch above relies on)."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.sketches import cms_sketch

    a = spark.createDataFrame([(w,) for w in "x y x z".split()], "tok string")
    b = spark.createDataFrame([(w,) for w in "y y w x".split()], "tok string")
    merged = (
        cms_sketch(a, "tok").unionByName(cms_sketch(b, "tok"))
        .groupBy("seed", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    full = cms_sketch(a.unionByName(b), "tok")
    got_m = {(r.seed, r.bucket): r.c for r in merged.collect()}
    got_f = {(r.seed, r.bucket): r.c for r in full.collect()}
    assert got_m == got_f


def test_log_histogram_quantiles_buckets_and_merge_property(spark):
    """Known values land in known buckets; the p50 estimate is the
    geometric midpoint of the bucket holding the median; and sketching
    two shards separately then summing bucket counts gives the same
    histogram as one pass (mergeability)."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        log_histogram_quantiles,
    )

    # cents: 100 -> b=6 est 0.96; 700 -> b=9 est 7.68; 5000 -> b=12 est 61.44
    vals = [1.0] * 5 + [7.0] * 4 + [50.0] * 1
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    row = log_histogram_quantiles(df, "g", "v").collect()[0]
    assert row.n == 10
    assert row.p5 == 0.96    # cum 5 >= ceil(0.5*10) = 5
    assert row.p9 == 7.68    # cum 9 >= ceil(0.9*10) = 9
    assert row.p99 == 61.44  # only the 50.0 bucket reaches cum 10


def test_poisson_bootstrap_ci_constant_and_coverage(spark):
    """A constant column gives a zero-width CI at the constant; a mixed
    column gives a CI that brackets the true mean; results are identical
    across runs (md5 draws, no RNG state)."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.sketches import (
        poisson_bootstrap_ci,
    )

    rows = [("c", i, 7) for i in range(40)]
    rows += [("m", i, i % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, rid long, v long")
    out1 = {r.g: r for r in poisson_bootstrap_ci(
        df, ["g"], "v", F.col("rid").cast("string"), n_resamples=16
    ).collect()}
    assert out1["c"].ci_lo == 7.0 and out1["c"].ci_hi == 7.0
    m = out1["m"]
    assert m.ci_lo <= m.mean <= m.ci_hi
    assert m.ci_hi - m.ci_lo < 2.0  # n=200: a sane, not-degenerate width
    out2 = {r.g: r for r in poisson_bootstrap_ci(
        df, ["g"], "v", F.col("rid").cast("string"), n_resamples=16
    ).collect()}
    assert {k: (v.ci_lo, v.ci_hi) for k, v in out1.items()} == \
           {k: (v.ci_lo, v.ci_hi) for k, v in out2.items()}


def test_hll_estimate_accuracy_and_merge(spark):
    """HLL on 5000 known-distinct ids lands within the ~3x standard-error
    band (1.04/sqrt(1024) ~ 3.3%), and the union sketch equals the
    element-wise register max of the two halves — the mergeability that
    makes per-partition rollup possible."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = hll_estimate(hll_sketch(df, ["g"], "v", b=10), ["g"], b=10).collect()[0]
    assert est.m == 1024
    assert abs(est.est_distinct - 5000) < 0.10 * 5000

    lo = df.filter(F.col("v") < 2500)
    hi = df.filter(F.col("v") >= 2500)
    merged = (
        hll_sketch(lo, ["g"], "v", b=10)
        .unionByName(hll_sketch(hi, ["g"], "v", b=10))
        .groupBy("g", "j")
        .agg(F.max("M").alias("M"))
    )
    whole = hll_sketch(df, ["g"], "v", b=10)
    assert sorted((r.j, r.M) for r in merged.collect()) == sorted(
        (r.j, r.M) for r in whole.collect()
    )


def test_hll_small_m_alpha_and_b_guard(spark):
    """ADVICE r05 retirement: small-m bias constants. At b=4 (m=16) the
    large-m asymptote 0.7213/(1+1.079/m) is ~4% hot vs Flajolet's
    dedicated alpha_16 = 0.673 — on a cardinality well above the
    linear-counting band the estimate must land inside the small-m
    standard-error envelope (1.04/sqrt(16) = 26%), which the wrong alpha
    pushes against systematically. b < 4 is unspecified and must raise."""
    import pytest
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = hll_estimate(hll_sketch(df, ["g"], "v", b=4), ["g"], b=4).collect()[0]
    assert est.m == 16
    # wide band (m=16 is a toy sketch) but centered: alpha_16 keeps the
    # relative error of this fixed md5 hash sequence ~8%; the large-m
    # alpha would shift every estimate up by 1.072/1.0407 ~ +3%
    assert abs(est.est_distinct - 2000) < 0.30 * 2000
    with pytest.raises(ValueError, match="b >= 4"):
        hll_estimate(hll_sketch(df, ["g"], "v", b=4), ["g"], b=3)
