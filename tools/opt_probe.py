"""Optimization probe: per-query timing split into plan-build time (the
registry fn call, which includes any eager materialize/localCheckpoint
jobs) and the final noop action, plus optional formatted-plan capture.

Usage:
    python tools/opt_probe.py q1,q2,...        # time the named queries
    python tools/opt_probe.py q1 --plan out.txt  # also dump explain
    python tools/opt_probe.py q1,q2 --repeat 3   # repeat, report each run

Timing methodology matches bench.py (noop sink, same session factory);
this tool exists for the r11 optimization round's isolated measurements.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plan", default=None,
                    help="write explain('formatted') of the final frame here")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--plan-only", action="store_true",
                    help="skip the timed runs, just dump plans")
    args = ap.parse_args()

    from peskas_timor_data_pipeline_spark.harness import registry
    from peskas_timor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]

    if not args.no_warm:
        warm, _ = reg["flagship_cpue"]
        warm(spark, args.sf_dir).write.mode("overwrite").format("noop").save()

    for name in names:
        fn, _sql = reg[name]
        for r in range(0 if args.plan_only else args.repeat):
            spark.sparkContext.setJobDescription(f"{name} build r{r}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"{name} action r{r}")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            print(f"{name} run{r}: build={t1-t0:.3f}s action={t2-t1:.3f}s "
                  f"total={t2-t0:.3f}s", flush=True)
            spark.sparkContext.setJobDescription(None)
        if args.plan:
            df = fn(spark, args.sf_dir)
            jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")
            with open(args.plan, "a") as f:
                f.write(f"== {name} ==\n")
                f.write(df._jdf.queryExecution().explainString(jmode))
                f.write("\n")


if __name__ == "__main__":
    main()
