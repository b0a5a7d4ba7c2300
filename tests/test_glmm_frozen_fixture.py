"""Frozen-fixture pins for the crossed-GLMM registry entries.

Since round 6 m4_glmm and m4zi_glmm are ALSO oracle-checked (the crossed
design was reduced to (1|month) + (1|half) so the month block eliminates
in closed form and the 3x3 Schur complement replays in window SQL — see
stats_q._m4_crossed_sql). These pins stay as defense in depth: they
freeze the engine-side value hash at sf0.001/sf0.01, catching regressions
in the generic dense-Henderson numpy path that a matching oracle bug
could mask. Regenerated for the round-6 semantic change (half factor,
pinned iterations) under TZ=America/New_York; outputs are rounded
scalars, so the hash is stable across hosts with the same numpy/BLAS.

Regenerate (only after a DELIBERATE semantic change):
    python - <<'EOF'
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    import __spark_entry__ as e
    from tools.selfcheck import value_hash
    for name in ["m4_glmm", "m4zi_glmm"]:
        for sf in ["0.001", "0.01"]:
            df = e.queries()[name](spark, f"/root/testdata/sf{sf}")
            rows = [tuple(r) for r in df.collect()]
            print(name, sf, value_hash(df.columns, rows), len(rows))
    EOF
"""

from __future__ import annotations

import pytest

from tools.selfcheck import value_hash

FROZEN = {
    ("m4_glmm", "0.001"): ("ebb8ab567bfa2bf52992649861792aa0fb350071612025911616130b24388569", 85),
    ("m4_glmm", "0.01"): ("6ff0c54e09ac481221a574fbd19d289a2a475ee8d5c9fd5ad2d11a98b20e09a1", 85),
    ("m4zi_glmm", "0.001"): ("e6f800b15b6656ac4d8b90b9b01e50a15c851b16de3d1dd4700efb816ba3b479", 170),
    ("m4zi_glmm", "0.01"): ("c42d7fe33e8e43fd5da17a3759bad6437c745b91b2f6744391cc296700681f30", 170),
}


@pytest.mark.parametrize("name,sf", sorted(FROZEN))
def test_glmm_matches_frozen_fixture(spark, name, sf):
    import __spark_entry__ as e

    df = e.queries()[name](spark, f"/root/testdata/sf{sf}")
    rows = [tuple(r) for r in df.collect()]
    expect_hash, expect_n = FROZEN[(name, sf)]
    assert len(rows) == expect_n
    assert value_hash(df.columns, rows) == expect_hash
