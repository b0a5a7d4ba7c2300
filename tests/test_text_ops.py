from __future__ import annotations


def test_chunk_documents_overlap_tail_and_empty(spark):
    from peskas_timor_data_pipeline_spark.llm.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only three  tokens"),                  # short doc, 1 chunk
            (3, "   "),                                 # whitespace-only: no chunks
        ],
        "doc_id int, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, stride=2)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: starts 0,2,4,6,8 -> 5 chunks; 50% overlap between neighbours
    assert sorted(c for d, c in rows if d == 1) == [0, 1, 2, 3, 4]
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t2 t3 t4 t5"
    # trailing chunk is short but covers the last token
    assert rows[(1, 4)].chunk_text == "t8 t9" and rows[(1, 4)].n_tokens == 2
    # doc 2: 3 tokens (double space collapses), starts 0,2
    assert rows[(2, 0)].chunk_text == "only three tokens"
    assert rows[(2, 1)].chunk_text == "tokens"
    # doc 3: no chunks at all
    assert not any(d == 3 for d, _ in rows)
    # invalid config rejected
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=2, stride=4)


def test_clean_lines_c4_rules(spark):
    from peskas_timor_data_pipeline_spark.llm.text import clean_lines

    docs = spark.createDataFrame(
        [
            (1, "This line survives the filter.\nHome | About | Contact\n"
                'She said "stop".\nok?\nToo short.'),
            (2, "no terminal punctuation here at all"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.clean_text for r in clean_lines(docs, "text").collect()}
    # menu line: no terminal punct; 'ok?': under 3 tokens; 'Too short.': 2 tokens
    assert out[1] == 'This line survives the filter.\nShe said "stop".'
    assert out[2] == ""


def test_pack_sequences_greedy_rule(spark):
    """Greedy packing: bins never exceed the budget (except single
    oversized docs, which get their own bin), offsets are running fills,
    and every doc appears exactly once."""
    from peskas_timor_data_pipeline_spark.llm.text import pack_sequences

    rows = [(i, n) for i, n in enumerate([50, 60, 70, 200, 300, 10, 90, 255, 2, 256])]
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    out = pack_sequences(df, "doc_id", "nt", budget=256, shard_col=None).collect()
    assert len(out) == len(rows)
    by_bin = {}
    for r in out:
        by_bin.setdefault((r.shard, r.bin_id), []).append(r)
    for (shard, b), members in by_bin.items():
        total = sum(r.n_tokens for r in members)
        if len(members) > 1:
            assert total <= 256, (shard, b, total)
        # offsets are the running prefix within the bin
        members = sorted(members, key=lambda r: r.offset_tokens)
        run = 0
        for r in members:
            assert r.offset_tokens == run
            run += r.n_tokens
    # oversized doc (300 > budget) is alone in its bin
    big = [r for r in out if r.n_tokens == 300][0]
    assert len(by_bin[(big.shard, big.bin_id)]) == 1


def test_repeated_gram_share_flags_boilerplate(spark):
    """Docs sharing a long copied span have dup_ppm > 0; a unique doc has
    0; short docs (< k) report zero grams."""
    from peskas_timor_data_pipeline_spark.llm.dedup import repeated_gram_share

    boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED TEMPLATE HEADER v1"
    rows = [
        (1, boiler + " alpha unique tail one with extra words"),
        (2, boiler + " totally different ending for document two"),
        (3, "completely original text with no shared long spans anywhere in it"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repeated_gram_share(df, "doc_id", "text", k_shingle=32).collect()}
    assert out[1].n_shared > 0 and out[2].n_shared > 0
    assert out[1].dup_ppm > 200_000 and out[2].dup_ppm > 200_000
    assert out[3].n_shared == 0 and out[3].dup_ppm == 0
    assert out[4].n_grams == 0 and out[4].dup_ppm == 0
    # ppm is exact integer arithmetic: cross-check one row by hand
    assert out[1].dup_ppm == out[1].n_shared * 1_000_000 // out[1].n_grams


def test_quality_buckets_rank_tiers(spark):
    """Documents made of frequent tokens rank head; rare-token documents
    tail; tier boundaries follow the 30/70 rank fractions with id
    tie-breaks; a group is tiered independently of other groups."""
    from peskas_timor_data_pipeline_spark.llm.text import quality_buckets

    # 'the' appears 16x corpus-wide, rare tokens once each
    rows = [
        (1, "the the the the", "s1"),   # score 4*16 = 64
        (2, "the the rare1", "s1"),     # 2*16 + 1 = 33
        (3, "rare2 rare3", "s1"),       # 2
        (4, "the the the the the the", "s2"),  # 96
        (5, "rare4", "s2"),             # 1
        (6, "the the the the rare5", "s2"),    # 65
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in quality_buckets(
        df, "doc_id", "text", "source").collect()}
    # s1: ranks 1,2,3 of n=3 -> rn<=0.9 head only rn=0? 0.3*3=0.9 -> no head
    assert [got[i].bucket for i in (1, 2, 3)] == ["middle", "middle", "tail"]
    assert [got[i].bucket for i in (4, 6, 5)] == ["middle", "middle", "tail"]
    assert got[1].score == 64 and got[5].score == 1


def test_normalize_text_folds_strips_collapses(spark):
    """Curly quotes/dashes/NBSP fold to ASCII, control chars become
    spaces, whitespace collapses, ends trim, case lowers — and clean text
    passes through unchanged."""
    from peskas_timor_data_pipeline_spark.llm.text import normalize_text

    rows = [
        (1, "\t  Hello“World” — it’s\x01fine  "),
        (2, "already clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.norm_text
           for r in normalize_text(df, "text").collect()}
    assert got[1] == 'hello"world" - it\'s fine'
    assert got[2] == "already clean text"


def test_bpe_train_merges_hand_computed(spark):
    """Two merge steps on a tiny weighted vocabulary: step 1 sees the
    3-3 tie between 'a b' and 'b c' and must take 'a b' (pair asc); step 2
    must count pairs over the FUSED symbols ('ab c' etc.), not the
    originals."""
    from peskas_timor_data_pipeline_spark.llm.text import bpe_train_merges

    toks = ["abc", "abc", "abd", "bc"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {r.step: r for r in bpe_train_merges(df, "tok", n_merges=2).collect()}
    assert (got[1].pair, got[1].merged, got[1].pair_count) == ("a b", "ab", 3)
    assert (got[2].pair, got[2].merged, got[2].pair_count) == ("ab c", "abc", 2)


def test_dsir_select_prefers_target_like_docs(spark):
    """Target domain speaks 'alpha'; among non-target docs, the alpha-heavy
    one must outrank the beta-heavy one, and target docs never appear."""
    from peskas_timor_data_pipeline_spark.llm.text import dsir_select

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha alpha", True),
            (2, "alpha alpha beta alpha", True),
            (3, "alpha alpha alpha beta", False),
            (4, "beta beta beta beta", False),
            (5, "alpha beta beta beta", False),
        ],
        "doc_id long, text string, tgt boolean",
    )
    out = dsir_select(docs, "doc_id", "text", "tgt", k=3).collect()
    ranks = {r.doc_id: r.rank for r in out}
    assert set(ranks) == {3, 4, 5}
    assert ranks[3] == 1 and ranks[5] == 2 and ranks[4] == 3
    by_rank = sorted(out, key=lambda r: r.rank)
    assert by_rank[0].avg_logratio > by_rank[1].avg_logratio > by_rank[2].avg_logratio


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition gates on a hand-checkable doc:
    doc 1: lines [ab, cd, ab, xy] -> 4 lines, 1 dup pair (ab x2):
      dup_line_ppm = (4-3)/4 = 250000
      dup_char_ppm = chars in 'a b' occurrences (3*2=6) over total
        (3+3+3+3=12) -> 500000
      words = a b c d a b x y; bigrams: 'a b' twice (others once);
      top coverage = 2 * 2 chars / 8 word chars -> 500000
    doc 2: single line, no repeats -> zeros except top bigram.
    doc 3: empty -> all zeros."""
    from peskas_timor_data_pipeline_spark.llm.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b\nc d\na b\nx y"),
            (2, "p q r"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.asDict() for r in
            repetition_signals(df, "doc_id", "text").collect()}
    assert rows[1] == {
        "doc_id": 1, "n_lines": 4, "dup_line_ppm": 250000,
        "dup_char_ppm": 500000, "top_bigram_ppm": 500000,
    }
    assert rows[2]["n_lines"] == 1
    assert rows[2]["dup_line_ppm"] == 0 and rows[2]["dup_char_ppm"] == 0
    # 'p q': 2 chars over 3 word chars
    assert rows[2]["top_bigram_ppm"] == 666666
    assert rows[3] == {
        "doc_id": 3, "n_lines": 0, "dup_line_ppm": 0,
        "dup_char_ppm": 0, "top_bigram_ppm": 0,
    }


def test_weighted_reservoir_sample(spark):
    """A-Res integer form: ranks are 1..k per group, non-positive weights
    never sample, weights clamp at max_weight, the draw is salt-stable,
    and high-weight rows dominate the sample (w=8 vs w=1 at 8:1 odds per
    slot — with k=50 of 100+100 rows the expected w=8 share is ~47/50)."""
    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.llm.text import (
        weighted_reservoir_sample,
    )

    rows = [(i, "g", 8 if i < 100 else 1) for i in range(200)]
    rows += [(900, "g", 0), (901, "g", -3)]          # never sampled
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    out = weighted_reservoir_sample(df, "id", "grp", "w", k=50).collect()
    assert sorted(r.sample_rank for r in out) == list(range(1, 51))
    ids = {r.id for r in out}
    assert 900 not in ids and 901 not in ids
    heavy = sum(1 for r in out if r.id < 100)
    assert heavy > 35, f"w=8 rows should dominate, got {heavy}/50"
    # deterministic: same salt reproduces the exact sample
    again = weighted_reservoir_sample(df, "id", "grp", "w", k=50).collect()
    assert {(r.id, r.sample_rank) for r in again} == {
        (r.id, r.sample_rank) for r in out
    }
    # clamp: weight column reports the saturated value
    big = spark.createDataFrame([(1, "g", 1000)], "id long, grp string, w long")
    got = weighted_reservoir_sample(big, "id", "grp", "w", k=1).collect()[0]
    assert got.weight == 64
