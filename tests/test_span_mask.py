"""Exact-substring dedup spans (Lee et al. 2021 masking primitive).

repeated_span_mask must recover the EXACT maximal shared span from its
k-gram seeds (a shared run of length L >= k yields L-k+1 seeds that merge
back to [start, start+L-1]), and apply_span_mask must splice
length-preservingly from the ORIGINAL text.
"""

from __future__ import annotations

from peskas_timor_data_pipeline_spark.llm.dedup import (
    apply_span_mask,
    repeated_span_mask,
)

K = 10


def test_span_recovery_is_exact(spark):
    shared = "0123456789abcdefghij"  # 20 chars -> seeds at 11 positions
    df = spark.createDataFrame(
        [
            (1, "AAAA" + shared + "BBBBBBBB"),          # span at [5, 24]
            (2, "xx" + shared + "yy"),                   # span at [3, 22]
            (3, "totally unrelated text goes here ok"),  # no span
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in repeated_span_mask(df, "doc_id", "text", k_min=K).collect()
    }
    assert spans[1] == (5, 24)
    assert spans[2] == (3, 22)
    assert 3 not in spans


def test_two_separate_repeats_stay_separate(spark):
    a, b = "qwertyuiopas", "zxcvbnmlkjhg"  # 12 chars each
    df = spark.createDataFrame(
        [
            (1, a + "-------------------" + b),
            (2, "lead " + a + " mid " + b + " tail"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_span_mask(df, "doc_id", "text", k_min=K).collect()
    )
    assert got == [
        (1, 1, 12), (1, 32, 43),
        (2, 6, 17), (2, 23, 34),
    ]


def test_case_insensitive_match_masks_original_case(spark):
    df = spark.createDataFrame(
        [(1, "HeadABCDEFGHIJKLtail"), (2, "abcdefghijkl elsewhere")],
        "doc_id long, text string",
    )
    spans = repeated_span_mask(df, "doc_id", "text", k_min=K)
    out = {
        r.doc_id: r.masked_text
        for r in apply_span_mask(df, spans, "doc_id", "text").collect()
    }
    assert out[1] == "Head" + " " * 12 + "tail"  # original case spliced out
    assert out[2] == " " * 12 + " elsewhere"
    assert all(
        len(m) == len(t)
        for m, t in zip(out.values(), ["HeadABCDEFGHIJKLtail", "abcdefghijkl elsewhere"])
    )


def test_expanding_lowercase_keeps_raw_positions(spark):
    """ADVICE r05 repro: U+0130 'İ' lowers to 2 codepoints. The r05 form
    computed seed positions on lower(text), so every position after the
    'İ' shifted by one and the mask hit the wrong characters (first
    repeated char left unmasked, one unrelated char masked). Positions
    must index the RAW string."""
    shared = "0123456789abcdefghij"  # 20 shared chars
    df = spark.createDataFrame(
        [
            (1, "İx" + shared + "yy"),  # raw span at [3, 22]
            (2, "no" + shared + "no"),       # raw span at [3, 22]
        ],
        "doc_id long, text string",
    )
    spans = repeated_span_mask(df, "doc_id", "text", k_min=K)
    got = {
        r.doc_id: (r.span_start, r.span_end) for r in spans.collect()
    }
    assert got == {1: (3, 22), 2: (3, 22)}
    out = {
        r.doc_id: r.masked_text
        for r in apply_span_mask(df, spans, "doc_id", "text").collect()
    }
    assert out[1] == "İx" + " " * 20 + "yy"
    assert out[2] == "no" + " " * 20 + "no"


def test_mask_passthrough_without_spans(spark):
    df = spark.createDataFrame(
        [(1, "unique one here"), (2, "another unique body")],
        "doc_id long, text string",
    )
    spans = repeated_span_mask(df, "doc_id", "text", k_min=K)
    out = apply_span_mask(df, spans, "doc_id", "text").collect()
    assert {r.masked_text for r in out} == {"unique one here", "another unique body"}
