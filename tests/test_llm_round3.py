"""Round-3 LLM-pipeline operators: image dHash + banded hamming dedup,
mixture resampling, bigram logprob, cross-source overlap, silhouette.
Each pinned against an independent hand/numpy computation."""

from __future__ import annotations

import math


def _dhash_ref(px, grid=8):
    """Independent numpy reference for the 56-bit dHash."""
    import numpy as np

    h, w, _ = px.shape
    g = px.sum(axis=2, dtype=np.int64)
    iy = (np.arange(grid) * h) // grid
    ix = (np.arange(grid) * w) // grid
    s = g[np.ix_(iy, ix)]
    bits = (s[:, 1:] > s[:, :-1]).astype(np.int64).ravel()
    return int((bits << np.arange(grid * (grid - 1))).sum())


def test_image_dhash_exact_and_invariance(spark):
    """dHash equals the independent reference; re-encoding the same pixels
    hashes identically; a brightness-shifted copy (monotone transform)
    keeps the hash (dHash's point), and a transposed image does not."""
    import numpy as np

    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        encode_ppm,
        image_dhash,
    )

    rng = np.random.RandomState(3)
    base = rng.randint(0, 200, size=(11, 13, 3)).astype(np.uint8)
    brighter = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    rows = [
        (0, bytearray(encode_ppm(base))),
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(brighter))),
        (3, bytearray(encode_ppm(base.transpose(1, 0, 2)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r.dhash for r in image_dhash(df, "doc_id").collect()}
    assert got[0] == _dhash_ref(base)
    assert got[0] == got[1]
    assert got[2] == got[0]  # uniform brightness shift preserves ordering
    assert got[3] != got[0]


def test_hamming_neardup_pigeonhole_recall(spark):
    """Any pair within n_bands - 1 differing bits shares a band and must be
    found; a pair differing in every band with distance > max_hamming must
    not appear."""
    from peskas_timor_data_pipeline_spark.llm.dedup import hamming_neardup_pairs

    a = 0x00FF00FF00FF00
    rows = [
        (1, a),
        (2, a ^ 0b111),            # hamming 3 < n_bands=4: guaranteed found
        (3, a ^ ((1 << 1) | (1 << 15) | (1 << 29) | (1 << 43))),  # 4 bits,
        # one per band: no shared band -> legitimately missable; distance 4
        (4, (~a) & ((1 << 56) - 1)),  # hamming 56: must never pass verify
    ]
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(
            df, "doc_id", "dhash", n_bits=56, n_bands=4, max_hamming=6
        ).collect()
    }
    assert pairs[(1, 2)] == 3
    assert (1, 4) not in pairs and (2, 4) not in pairs
    assert (1, 3) not in pairs  # differs in all 4 bands -> no bucket


def test_mixture_sample_quotas_and_determinism(spark):
    from peskas_timor_data_pipeline_spark.llm.text import mixture_sample

    rows = [(i, "a" if i < 30 else "b") for i in range(40)] + [(99, "c")]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out1 = mixture_sample(df, "doc_id", "src", {"a": 5, "b": 100}).collect()
    out2 = mixture_sample(df, "doc_id", "src", {"a": 5, "b": 100}).collect()
    by_src: dict = {}
    for r in out1:
        by_src.setdefault(r.src, []).append(r.doc_id)
    assert len(by_src["a"]) == 5          # quota met
    assert len(by_src["b"]) == 10         # clamped to group size
    assert "c" not in by_src              # absent from targets -> dropped
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_bigram_logprob_hand_computed(spark):
    """Two docs, tiny vocabulary: every count is hand-checkable."""
    from peskas_timor_data_pipeline_spark.llm.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a")], "doc_id long, text string"
    )
    # corpus: tokens = [a b a b a a]; T=6; c(a)=4 c(b)=2
    # bigrams: doc1: (a,b)x2 (b,a)x1; doc2: (a,a)x1
    # c(a,b)=2 c(b,a)=1 c(a,a)=1
    lam = 0.75
    p_ab = lam * 2 / 4 + (1 - lam) * 2 / 6
    p_ba = lam * 1 / 2 + (1 - lam) * 4 / 6
    p_aa = lam * 1 / 4 + (1 - lam) * 4 / 6
    want1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    want2 = math.log(p_aa)
    got = {r.doc_id: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 1
    assert math.isclose(got[1].mean_logp, round(want1, 6), abs_tol=1e-6)
    assert math.isclose(got[2].mean_logp, round(want2, 6), abs_tol=1e-6)


def test_cross_source_overlap_counts(spark):
    from peskas_timor_data_pipeline_spark.llm.dedup import cross_source_overlap

    df = spark.createDataFrame(
        [
            (1, "shared one", "s1"),
            (2, "shared one", "s2"),   # cross-source dup
            (3, "only in s1", "s1"),
            (4, "only in s2", "s2"),
            (5, "SHARED ONE", "s3"),   # case-folds to the same fingerprint
        ],
        "doc_id long, text string, src string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in cross_source_overlap(df, "doc_id", "text", "src").collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s2")].n_shared == 1
    assert out[("s1", "s3")].n_shared == 1 and out[("s2", "s3")].n_shared == 1
    assert out[("s1", "s2")].n_a == 2 and out[("s1", "s2")].n_b == 2
    assert math.isclose(out[("s2", "s3")].overlap_coeff, 1.0)  # 1 / min(2,1)


def test_silhouette_separated_vs_mislabeled(spark):
    """Two tight, orthogonal clusters: mean silhouette near 1. Flip one
    point's label and that label's mean drops below the clean one."""
    from peskas_timor_data_pipeline_spark.llm.similarity import (
        silhouette_by_centroid,
    )

    dim = 8
    def vec(axis, eps, i):
        v = [0.001 * ((i * 7 + j) % 5) for j in range(dim)]
        v[axis] = 1.0 + eps
        return v

    rows = [(i, vec(0, 0.01 * i, i), 0) for i in range(5)] + [
        (10 + i, vec(3, 0.01 * i, i), 1) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    clean = {r.label: r.mean_silhouette
             for r in silhouette_by_centroid(df, "vec_id", "embedding", "label", dim=dim).collect()}
    assert clean[0] > 0.8 and clean[1] > 0.8

    flipped = [(i, v, (1 if i == 0 else l)) for (i, v, l) in rows]
    df2 = spark.createDataFrame(flipped, "vec_id long, embedding array<double>, label int")
    noisy = {r.label: r.mean_silhouette
             for r in silhouette_by_centroid(df2, "vec_id", "embedding", "label", dim=dim).collect()}
    assert noisy[1] < clean[1]


def test_segment_dedup_first_occurrence_and_rebuild(spark):
    """A segment copied into a later document survives only at its first
    (doc, pos) occurrence; unique segments all survive; a fully-duplicated
    document rebuilds to ''. Segments are 2 words here to keep the example
    hand-checkable."""
    from peskas_timor_data_pipeline_spark.llm.dedup import segment_dedup

    rows = [
        (1, "a b c d"),          # segs: "a b", "c d" — both first
        (2, "a b x y"),          # "a b" seen (doc1 pos0) -> only "x y" kept
        (3, "a b c d"),          # both segs seen -> rebuilt ''
        (4, "z z z"),            # segs: "z z", "z" — both first
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in segment_dedup(df, "doc_id", "text", seg_words=2).collect()
    }
    assert (got[1].n_segs, got[1].n_kept, got[1].rebuilt) == (2, 2, "a b c d")
    assert (got[2].n_segs, got[2].n_kept, got[2].rebuilt) == (2, 1, "x y")
    assert (got[3].n_segs, got[3].n_kept, got[3].rebuilt) == (2, 0, "")
    assert (got[4].n_segs, got[4].n_kept, got[4].rebuilt) == (2, 2, "z z z")
    assert abs(got[2].kept_ratio - 0.5) < 1e-9


def test_segment_dedup_string_id_fallback_agrees(spark):
    """Non-integral ids take the struct-min fallback; it must produce the
    identical first-occurrence decisions as the hash-aggregable integral
    path (same corpus, ids mapped doc 1->'d1' etc. so lexicographic order
    matches numeric order)."""
    from peskas_timor_data_pipeline_spark.llm.dedup import segment_dedup

    rows = [(1, "a b c d"), (2, "a b x y"), (3, "a b c d"), (4, "z z z")]
    d_long = spark.createDataFrame(rows, "doc_id long, text string")
    d_str = spark.createDataFrame(
        [(f"d{i}", t) for i, t in rows], "doc_id string, text string"
    )
    by_long = {
        r.doc_id: (r.n_segs, r.n_kept, r.rebuilt)
        for r in segment_dedup(d_long, "doc_id", "text", seg_words=2).collect()
    }
    by_str = {
        int(r.doc_id[1:]): (r.n_segs, r.n_kept, r.rebuilt)
        for r in segment_dedup(d_str, "doc_id", "text", seg_words=2).collect()
    }
    assert by_long == by_str


def test_bm25_topk_matches_pure_python(spark):
    """BM25 scores and ranking agree with a hand-rolled replica on a tiny
    corpus with known tf/dl variation."""
    from peskas_timor_data_pipeline_spark.llm.text import bm25_topk

    rows = [
        (1, "hash join hash join hash"),
        (2, "hash scan scan scan scan scan scan scan scan scan"),
        (3, "join sort"),
        (4, "scan sort filter"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, "doc_id", "text", [(7, ["hash", "join"])], k=3)
    got = {(r.query_id, r.doc_id): (r.rank, r.score) for r in out.collect()}

    # pure-python replica
    corpus = {d: t.split() for d, t in rows}
    dl = {d: len(t) for d, t in corpus.items()}
    avgdl = sum(dl.values()) / len(dl)
    n = len(corpus)
    k1, b = 1.2, 0.75
    scores = {}
    for term in ["hash", "join"]:
        df = sum(1 for t in corpus.values() if term in t)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in corpus.items():
            tf = t.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl[d] / avgdl)
                )
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert len(got) == 3
    for rank, (d, s) in enumerate(expect, start=1):
        assert got[(7, d)][0] == rank
        assert abs(got[(7, d)][1] - s) < 1e-6
    # doc 1 (dense in both query terms, short) must beat doc 2 (one hash in
    # a long doc) and doc 3 (single join)
    assert got[(7, 1)][0] == 1


def test_bpe_encode_round_trip_and_oov_runs(spark):
    """Encoding with trained merges reproduces the training loop's final
    vocabulary symbols, including the documented separator-consumption run
    behavior on tokens the training never fully fused."""
    from peskas_timor_data_pipeline_spark.llm.text import bpe_encode, bpe_train_merges

    corpus = spark.createDataFrame(
        [("aaab",), ("aaab",), ("ab",)], "tok string"
    )
    merges = bpe_train_merges(corpus, "tok", n_merges=3)
    got_merges = {r.step: r.pair for r in merges.collect()}
    assert got_merges == {1: "a a", 2: "a b", 3: "aa ab"}

    to_encode = spark.createDataFrame([("aaab",), ("ab",), ("aab",)], "tok string")
    enc = bpe_encode(to_encode, "tok", merges, n_merges=3)
    got = {r.tok: (r.bpe_sym, r.n_pieces) for r in enc.collect()}
    assert got["aaab"] == ("aaab", 1)
    assert got["ab"] == ("ab", 1)
    # 'aab' -> 'a a b' -> step1 fuses the leading pair -> 'aa b'; steps 2-3
    # find no ' a b ' / ' aa ab ' windows -> stays 2 pieces
    assert got["aab"] == ("aa b", 2)


def test_lsh_eval_counts_and_ratios(spark):
    """Two exact copies (caught) and one disjoint doc: truth = candidates =
    the copy pair, ratios 1.0. Adding a near-dup below threshold must not
    enter truth even when banding proposes it."""
    from peskas_timor_data_pipeline_spark.llm.dedup import lsh_eval

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr"),
        ],
        "doc_id long, text string",
    )
    row = lsh_eval(docs, "doc_id", "text", threshold=0.5,
                   n_hashes=8, band_size=2, k_shingle=5).collect()[0]
    assert row.n_truth == 1 and row.true_positives == 1
    assert row.n_candidates >= 1
    assert row.recall == 1.0
    assert row.precision == round(1 / row.n_candidates, 6)


def test_cdc_segments_shift_tolerance_and_reassembly(spark):
    """Segments reassemble to the original text in order, empty docs chunk
    to nothing, and a prefix edit leaves the tail segment hashes intact
    (the property fixed-width chunking lacks)."""
    from peskas_timor_data_pipeline_spark.llm.dedup import cdc_segments

    text = "the quick brown fox jumps over the lazy dog again and again " * 4
    df = spark.createDataFrame(
        [(1, text), (2, "XY " + text), (3, "")],
        "doc_id long, text string",
    )
    segs = cdc_segments(df, "doc_id", "text")
    rows = segs.collect()
    assert not [r for r in rows if r.doc_id == 3]  # empty doc -> no segments
    d1 = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.seg_idx)
    assert sum(r.seg_len for r in d1) == len(text)
    h1 = {r.seg_hash for r in d1}
    h2 = {r.seg_hash for r in rows if r.doc_id == 2}
    # all but the head segment survive the prefix edit
    assert len(h1 & h2) >= len(h1) - 1 and len(h1) > 1


def test_bloom_decontaminate_no_false_negatives(spark):
    """Every eval key genuinely present in train MUST flag (Bloom has no
    false negatives); a disjoint eval key may or may not flag (false
    positives allowed) but with 4096 bits and 3 keys the specific
    fixture keys below stay clean."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.llm.dedup import bloom_decontaminate

    train = spark.createDataFrame(
        [(i, f"shared-{i}") for i in range(50)], "id long, key string"
    )
    eval_df = spark.createDataFrame(
        [(100 + i, f"shared-{i}") for i in range(10)]
        + [(900 + i, f"novel-{i}") for i in range(10)],
        "id long, key string",
    )
    out = {r.id: r.maybe_in_train for r in bloom_decontaminate(
        train, eval_df, "key").collect()}
    assert all(out[100 + i] for i in range(10))          # no false negatives
    fp = sum(out[900 + i] for i in range(10))
    assert fp <= 2                                        # tiny filter, low fp
