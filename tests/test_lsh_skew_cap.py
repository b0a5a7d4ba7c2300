"""Hot-bucket skew policy for LSH candidate generation.

The quadratic failure mode at 100 TB: one boilerplate text shared by a
large fraction of the corpus puts all those docs in the SAME band bucket,
and bucket-mate pairing emits n(n-1)/2 pairs for that one key. The
``bucket_cap`` star policy bounds every over-cap bucket to n-1 pairs while
keeping cluster semantics: each member stays connected to the bucket
representative, so connected-components dedup drops exactly the same docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.llm.cluster import connected_components
from peskas_timor_data_pipeline_spark.llm.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
)

N_HASHES, BAND_SIZE = 16, 8
HOT = 60  # docs sharing the hot boilerplate (Zipf head)
CAP = 8


def _zipf_docs(spark):
    """Zipfian corpus: 60 copies of one boilerplate (plus a tiny unique
    suffix so they are near- not exact-dups), a 4-doc medium cluster, and
    unique word-salad tails."""
    base = "the common boilerplate header appears in every scraped page of this site "
    rows = [(i, base * 3 + f"tail {i}") for i in range(HOT)]
    rows += [(100 + i, "medium cluster text shared by just a few documents " * 4 + f"v{i}")
             for i in range(4)]
    rows += [(200 + i, f"unique document {i} with its own words entirely: "
              + " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, docs, cap):
    sigs = minhash_signature(docs, "doc_id", "text", N_HASHES, 5)
    return lsh_candidate_pairs(sigs, "doc_id", N_HASHES, BAND_SIZE, bucket_cap=cap)


def test_capped_pairs_are_linear_in_hot_bucket_size(spark):
    docs = _zipf_docs(spark)
    capped = _pairs(spark, docs, CAP).collect()
    # uncapped would emit >= C(60,2) = 1770 pairs from the hot bucket per
    # colliding band; the star policy emits n-1 per over-cap bucket, so the
    # total stays linear in corpus size
    n_docs = docs.count()
    n_bands = N_HASHES // BAND_SIZE
    assert len(capped) <= n_docs * n_bands + CAP * CAP * n_bands
    # the hot docs all pair with the representative (min id = 0)
    hot_partners = {r.id_b for r in capped if r.id_a == 0}
    assert set(range(1, HOT)) <= hot_partners


def test_cluster_membership_unchanged_by_cap(spark):
    """Star pairing preserves connected components: the docs deduped away
    are identical with and without the cap."""
    docs = _zipf_docs(spark)
    uncapped = _pairs(spark, docs, None)
    capped = _pairs(spark, docs, CAP)
    cl_un = {
        (r.node, r.component)
        for r in connected_components(uncapped, "id_a", "id_b").collect()
    }
    cl_cap = {
        (r.node, r.component)
        for r in connected_components(capped, "id_a", "id_b").collect()
    }
    assert cl_un == cl_cap


def test_normal_corpus_pairs_identical_under_cap(spark):
    """No bucket over the cap -> the capped pair set is bit-identical to
    exact pairing (recall untouched on a normal corpus)."""
    rows = [(i, f"plain document number {i} about topic "
             + " ".join(f"t{i}w{j}" for j in range(25))) for i in range(40)]
    # two planted near-dup PAIRS (small buckets, far under the cap)
    rows += [(1000, rows[0][1] + " x"), (1001, rows[1][1] + " y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r.id_a, r.id_b) for r in _pairs(spark, docs, None).collect()}
    capped = {(r.id_a, r.id_b) for r in _pairs(spark, docs, CAP).collect()}
    assert exact == capped
    assert (0, 1000) in capped and (1, 1001) in capped  # planted dups found


def test_capped_plan_has_no_extra_exchange_on_pair_join(spark):
    """The cap's bucket-stats aggregation shuffles on band_key — the SAME
    key the pair self-join already shuffles on; assert the capped plan
    adds no CartesianProduct and still joins on band_key."""
    docs = _zipf_docs(spark)
    plan = _pairs(spark, docs, CAP)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "band_key" in plan


def test_bucket_cap_from_scout_consumes_the_estimate(spark):
    """The scout->policy link: on a Zipfian corpus the recommended cap
    bounds the pair mass to the budget; on a normal corpus the policy
    recommends NO cap (exact pairing already fits)."""
    from peskas_timor_data_pipeline_spark.llm.dedup import (
        band_rows,
        bucket_cap_from_scout,
    )

    zipf = _zipf_docs(spark)
    sigs = minhash_signature(zipf, "doc_id", "text", N_HASHES, 5)
    cap = bucket_cap_from_scout(
        sigs, "doc_id", N_HASHES, BAND_SIZE, pair_budget_per_row=8
    )
    assert cap is not None and 1 <= cap < HOT  # the hot bucket is over it
    # emitted pairs under the recommended cap respect the budget
    rows = band_rows(sigs, "doc_id", N_HASHES, BAND_SIZE).count()
    pairs = lsh_candidate_pairs(
        sigs, "doc_id", N_HASHES, BAND_SIZE, bucket_cap=cap
    ).count()
    assert pairs <= 8 * rows

    normal = spark.createDataFrame(
        [(i, f"document {i} body " + " ".join(f"n{i}w{j}" for j in range(25)))
         for i in range(40)],
        "doc_id long, text string",
    )
    nsigs = minhash_signature(normal, "doc_id", "text", N_HASHES, 5)
    assert bucket_cap_from_scout(nsigs, "doc_id", N_HASHES, BAND_SIZE) is None


def test_bbit_minhash_estimates_track_full_width(spark):
    """b-bit compression (Li & Koenig 2010): on a planted exact duplicate
    every slot agrees (both estimates = 1e6 ppm exactly); on unrelated
    docs the b-bit agreement sits near the 1/4 collision floor so the
    corrected estimate lands near 0 (within the n=16 sampling band, which
    is wide: +/- ~330k ppm at 3 sigma); estimates are exact signed
    integers (no libm in the ranking path — the r06 discipline)."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.llm.dedup import (
        bbit_minhash_jaccard,
        minhash_signature,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different content with no shared shingles here xyz"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signature(docs, "doc_id", "text", 16, 5)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): r
        for r in bbit_minhash_jaccard(sigs, pairs, "doc_id", 16, b=2).collect()
    }
    dup = got[(1, 2)]
    assert dup.n_agree_full == 16 and dup.n_agree_bbit == 16
    assert dup.est_full_ppm == 1000000 and dup.est_bbit_ppm == 1000000
    far = got[(1, 3)]
    assert far.n_agree_full == 0
    # 16 slots at the 1/4 collision floor: E[agree]=4, 3 sigma ~ 5 slots
    assert far.n_agree_bbit <= 9
    assert -350000 <= far.est_bbit_ppm <= 420000
