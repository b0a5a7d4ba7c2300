"""Registry-wide driver contract: every query's OUTPUT schema must be
hashable by the driver and timezone-proof.

Two hard-won classes, pinned permanently:
- the driver's hasher cannot canonicalize array/struct/map columns
  (unlike selfcheck's) — vectors must be serialized to scalar strings;
- PySpark collect() renders TimestampType through the OS timezone, so a
  raw TimestampType output hash-diverges on any non-UTC host (r04's d7
  lesson generalized in r05) — emit TIMESTAMP_NTZ / DATE instead.
"""

from __future__ import annotations

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
