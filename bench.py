"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are fully materialized via the noop sink (no driver collect, no
disk write) so the measured time is the distributed compute itself.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from peskas_timor_data_pipeline_spark.harness import registry
    from peskas_timor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry()
    timings: dict[str, float] = {}
    # JIT/session warmup on the flagship so steady-state numbers dominate.
    warm_fn, _ = reg["flagship_cpue"]
    warm_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    total = 0.0
    for name, (fn, _sql) in reg.items():
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
