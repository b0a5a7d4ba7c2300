"""d7_repeated_grams cross-engine agreement on HOSTILE multibyte text.

The d7 driver hash failed in two different forms across r03/r04 while the
local (pure-ASCII) corpus passed — the suspected divergence class is
Unicode semantics: Spark (Java/UTF-16 code units, locale-touched case
fold) vs DuckDB (code points, locale-free) disagree on
length()/substring()/lower() over multibyte text. The fix shingles over a
printable-ASCII projection in BOTH engines. This test replays the exact
query + oracle pair on a corpus engineered to trigger every known
divergence (non-BMP emoji = surrogate pairs, Turkish dotted İ whose
lower() expands to two code points, German ß/ẞ, NBSP, combining marks,
CJK) and asserts the driver's own comparison (rowcount + sorted-column
value hash) passes.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.selfcheck import value_hash

HOSTILE_DOCS = [
    # İ (U+0130): Java lower() -> "i̇" (2 chars); DuckDB -> "i̇" too,
    # but length/substring then disagree on code-unit vs code-point slices.
    (1, "İstanbul İİİ " + "the quick brown fox jumps over the lazy dog " * 3),
    (2, "ısparta III " + "the quick brown fox jumps over the lazy dog " * 3),
    # ẞ (U+1E9E) upper sharp s; ß lower
    (3, "STRAẞE straße " + "pack my box with five dozen liquor jugs " * 3),
    # non-BMP emoji (surrogate pairs in UTF-16)
    (4, "🦀🦀 rust crab 🦀 " + "pack my box with five dozen liquor jugs " * 3),
    # NBSP + combining acute + CJK interleaved with shared boilerplate
    (5, "café café menu " + "the quick brown fox jumps over the lazy dog " * 3),
    (6, "日本語テキスト処理 " + "the quick brown fox jumps over the lazy dog " * 3),
    # multibyte chars at every alignment inside an otherwise-shared span
    (7, "aéb" * 40),
    (8, "aéb" * 40 + "tail"),
    # pure ASCII controls
    (9, "the quick brown fox jumps over the lazy dog " * 4),
    (10, "entirely unique text with no shared spans anywhere here at all!"),
    # shorter than 32 printable-ASCII chars after stripping
    (11, "短い 🦀 tiny"),
    (12, ""),
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    """Write a documents.parquet of hostile text; mirror the other driver
    tables as views is unnecessary — d7 touches only `documents`."""
    d = tmp_path_factory.mktemp("hostile_sf")
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in HOSTILE_DOCS], pa.int64()),
            "text": pa.array([t for _, t in HOSTILE_DOCS], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ["d7_repeated_grams", "d7b_gram_checksum"])
def test_d7_agrees_on_hostile_unicode(spark, hostile_dir, qname):
    from peskas_timor_data_pipeline_spark.harness.llm_q import QUERIES

    fn, oracle = QUERIES[qname]
    sdf = fn(spark, hostile_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{hostile_dir}/documents.parquet'"
    )
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert len(srows) == len(orows) == len(HOSTILE_DOCS)
    assert sorted(scols) == sorted(ocols)
    assert value_hash(scols, srows) == value_hash(ocols, orows)


def test_d7_boilerplate_actually_detected(spark, hostile_dir):
    """Sanity: the planted shared boilerplate produces nonzero dup_ppm for
    the docs that share it, zero for the unique doc — i.e. the ASCII
    projection did not destroy the operator's signal."""
    from peskas_timor_data_pipeline_spark.harness.llm_q import QUERIES

    fn, _ = QUERIES["d7_repeated_grams"]
    rows = {r["doc_id"]: r.asDict() for r in fn(spark, hostile_dir).collect()}
    assert rows[9]["dup_ppm"] > 0  # shares fox-dog boilerplate with 1,2,5,6
    assert rows[10]["dup_ppm"] == 0  # unique text
    assert rows[12]["n_grams"] == 0  # empty text
    # 7 is a prefix of 8 -> every gram of 7 appears in 8
    assert rows[7]["dup_ppm"] == 1_000_000
