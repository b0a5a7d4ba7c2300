"""IVF ANN: structure + recall against the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _split(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    candidates = emb.filter(F.col("vec_id") >= 10)
    return queries, candidates


def test_ivf_structure_and_recall_vs_bruteforce(spark):
    from peskas_timor_data_pipeline_spark.llm.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    queries, candidates = _split(spark)
    exact = cosine_topk_bruteforce(
        queries, candidates, "vec_id", "embedding", k=1, dim=64
    )
    approx = cosine_topk_ivf(
        queries, candidates, "vec_id", "embedding",
        k=1, dim=64, n_cells=8, n_probe=4,
    )
    ex = {r.query_id: r.cand_id for r in exact.collect()}
    ap = {r.query_id: r.cand_id for r in approx.collect()}
    assert set(ap) == set(ex)  # every query answered
    recall = sum(ap[q] == ex[q] for q in ex) / len(ex)
    # probing half the cells of a seeded quantizer must find most true
    # top-1s; the floor is loose because the synthetic vectors are near-
    # uniform (hardest case for any ANN partitioner)
    assert recall >= 0.5, f"recall@1 {recall}"


def test_ivf_cells_partition_candidates(spark):
    from peskas_timor_data_pipeline_spark.llm.similarity import (
        ivf_centroids,
        cosine_topk_ivf,  # noqa: F401  (import exercises registration)
    )

    _, candidates = _split(spark)
    cents = ivf_centroids(candidates, "vec_id", "embedding", n_cells=8, dim=64)
    rows = cents.collect()
    assert len(rows) == 8
    # centroids are drawn from the candidate set, deterministically
    cand_ids = {r.vec_id for r in candidates.select("vec_id").collect()}
    assert {r.cell_id for r in rows} <= cand_ids
    again = {r.cell_id for r in ivf_centroids(candidates, "vec_id", "embedding", 8, 64).collect()}
    assert again == {r.cell_id for r in rows}
