"""Registry-wide driver contract: every query's OUTPUT schema must be
hashable by the driver, timezone-proof, and summation-order-proof.

Hard-won classes, pinned permanently:
- the driver's hasher cannot canonicalize array/struct/map columns
  (unlike selfcheck's) — vectors must be serialized to scalar strings;
- PySpark collect() renders TimestampType through the OS timezone, so a
  raw TimestampType output hash-diverges on any non-UTC host (r04's d7
  lesson generalized in r05) — emit TIMESTAMP_NTZ / DATE instead;
- DuckDB oracle outputs must avoid the integer types whose Python
  materialization depends on the fetch path: HUGEINT (sum of any integer
  type!) and DECIMAL degrade to float64/decimal128 under pandas/arrow
  while fetchall gives int — "5.0" vs "5" in a stringified value hash.
  d7_repeated_grams hash-failed THREE driver rounds on one uncast
  sum(CASE..) while every all-BIGINT twin passed (r06 root cause);
- no hashed output column may be a ROUNDED ORDER-DEPENDENT FLOAT
  REDUCTION: round(avg(x), 6) / round(sum(x), d<=data precision) over
  raw doubles flips with partition count when the true value sits on the
  rounding grid — which cents-exact fixture data GUARANTEES it often
  does (e23's r05 driver fail + 5 more found by the
  SPARK_GRAFT_SHUFFLE_INPUT sweep in r06). Use harness.tables.exact_avg /
  exact_sum (integer-sum first), or register a justified exemption below.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

FORBIDDEN = (T.ArrayType, T.StructType, T.MapType, T.TimestampType)


def _registry():
    from peskas_timor_data_pipeline_spark.harness import registry

    return registry()


@pytest.mark.parametrize("name", sorted(_registry()))
def test_query_output_schema_is_driver_hashable(spark, sf_dir, name):
    fn, _oracle = _registry()[name]
    df = fn(spark, sf_dir)
    bad = [
        (f.name, type(f.dataType).__name__)
        for f in df.schema.fields
        if isinstance(f.dataType, FORBIDDEN)
    ]
    assert not bad, (
        f"{name} emits non-driver-hashable / TZ-sensitive columns: {bad} — "
        "serialize nested values to scalars and cast timestamps to "
        "timestamp_ntz (see harness/tables._naive)"
    )


def test_oracle_outputs_have_no_hugeint_or_decimal_columns(sf_dir):
    """Plan every oracle in DuckDB (lazy — no execution) and reject
    HUGEINT/DECIMAL output columns. DuckDB promotes sum() of ANY integer
    type to HUGEINT, so every integer sum an oracle emits needs an
    explicit CAST(... AS BIGINT)."""
    import duckdb

    con = duckdb.connect()
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad = []
    for name, (_fn, oracle) in _registry().items():
        if oracle is None:
            continue
        rel = con.sql(oracle)
        for col, ty in zip(rel.columns, [str(x).upper() for x in rel.types]):
            if "HUGEINT" in ty or "DECIMAL" in ty:
                bad.append((name, col, ty))
    assert not bad, (
        f"oracle columns with fetch-path-dependent types: {bad} — "
        "CAST them to BIGINT/DOUBLE (the d7 three-round driver fail)"
    )


# Rounded float reductions audited as safe, with the reason. The rule for
# new code: a rounded float reduction is safe iff (a) the reduced values
# are integers in double (exact sums are order-free), or (b) the rounding
# granularity is at or below the data's exact decimal precision (the true
# total is then itself a grid point and the ~1e-12 float error cannot
# cross to a different one), or (c) the reduced values are generic
# irrationals (log-likelihoods, model coefficients) whose probability of
# sitting within 1e-12 of a rounding boundary is ~0 AND the engine/oracle
# pair has a contraction argument (the m4b discipline). Anything over
# cents-exact data rounded coarser than its precision must use
# exact_avg/exact_sum instead.
_ROUNDED_REDUCTION_BUDGET = {
    # file: allowed count of F.round(F.avg|F.sum(...) occurrences,
    # each audited against classes (a)/(b)/(c) above in r06
    "aggregates_q.py": 12,      # qty/value sums at d >= data precision
                                # + a4's exact-cents conditional mean
                                # (F.round(F.sum(CASE..cents)) — safe by
                                # construction),
                                # (a1, a6, a17, a21, a23), integer-valued
                                # sums/ratios (a4 prop, a28, a33/a34,
                                # rollup cents), integer avg (a17)
    "core_relational_q.py": 2,  # sum(l_quantity) at 2dp (j5, j7)
    "flagship.py": 1,           # sum_catch at 2dp (2dp-true trip sums)
    "llm_q.py": 2,              # mean KN logprob (class c), integer ratio
    "stats_q.py": 7,            # length-weight model sums/means (class
                                # b/c), exact-cents integer sums (m5/m6
                                # monthly means), theil-sen slope mean
                                # (class c — rational slopes, noted)
    "windows_q.py": 3,          # integer epoch-gap avg (w1), 4dp event
                                # sums at d=6 (w7 rolling, w13)
    "validators_q.py": 0,
    "tables.py": 0,
    "__init__.py": 0,
}


def test_rounded_float_reductions_are_budgeted():
    """Mechanical backstop for the order-dependence class: any NEW
    F.round(F.avg(... / F.round(F.sum(... in a harness module beyond the
    audited budget fails here, forcing the author through the safety
    rule above (or exact_avg/exact_sum)."""
    import os

    import peskas_timor_data_pipeline_spark.harness as h

    base = os.path.dirname(h.__file__)
    pat = re.compile(r"F\.round\(\s*F\.(avg|sum)\(")
    over = {}
    for fname, budget in _ROUNDED_REDUCTION_BUDGET.items():
        src = open(os.path.join(base, fname)).read()
        n = len(pat.findall(src))
        if n > budget:
            over[fname] = (n, budget)
    assert not over, (
        f"new rounded float reductions beyond the audited budget: {over} "
        "— integer-ize via harness.tables.exact_avg/exact_sum or audit "
        "and bump the budget with a reason"
    )
