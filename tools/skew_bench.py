"""Big-big skew-join proof: AQE skew-split under a Zipfian hot key.

Synthesizes the J5 trip-matching shape (fact x fact equi-join on a
boat/day-style key) with a Zipf head: 50% of the left rows share ONE key;
the right side fans out 4 rows per key. Broadcast is disabled so the join
is a real sort-merge over a shuffle — the shape that at 100 TB gets one
straggler task owning half the data. Runs the join with AQE skew-join ON
and OFF, captures the final adaptive plan (the ON plan must carry the
``skew=true`` SMJ marker), and reports wall-clock for both.

Two lessons encoded here (both cost an hour to find, both generalize):
- AQE refuses to split a skewed join partition when a downstream operator
  requires the join's hash distribution (same-key groupBy) unless
  forceOptimizeSkewedJoin is set — so the aggregation key deliberately
  differs from the join key, as it does in the real J5 pipeline.
- ``count()`` builds its own plan instance; to inspect the executed
  adaptive plan you must collect the DataFrame itself.

Writes one JSON line; the driver-side artifact is committed as
SKEWBENCH_r{N}.json.

Usage: python tools/skew_bench.py [--rows 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_join(spark, n_left: int, n_right: int):
    from pyspark.sql import functions as F

    # Zipf head: every even left row hits key 0; tail uniform over 4096
    left = spark.range(n_left).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 4096)
        .alias("k"),
        (F.col("id") * 31 % 997).alias("lv"),
    )
    # right: exactly 4 rows per key (fan-out 4, bounded output) — with
    # broadcast disabled this is a genuine shuffle sort-merge join whose
    # LEFT hot partition carries half the fact table
    right = spark.range(n_right).select(
        (F.col("id") % 4096).alias("k"),
        (F.col("id") * 17 % 991).alias("rv"),
    )
    joined = left.join(right, "k")
    # aggregate on a DIFFERENT key than the join: a same-key groupBy would
    # reuse the join's hash partitioning, and AQE (correctly) refuses to
    # split a skewed partition when downstream requires that distribution
    # (forceOptimizeSkewedJoin stays at its default false here)
    return joined.groupBy((F.col("lv") % 64).alias("g")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("lv") + F.col("rv")).alias("s")
    )


def run(spark, n_left: int, n_right: int, skew_on: bool):
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # fixture-scale thresholds: production defaults (256 MB) assume real
    # executor-sized partitions; scale them down so the SAME detection
    # logic fires on a 4M-row local run
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    df = build_join(spark, n_left, n_right)
    t0 = time.time()
    # collect df ITSELF (64 aggregated rows): count() builds a separate
    # plan instance, leaving df's own AdaptiveSparkPlan unexecuted
    # (isFinalPlan=false) with no skew markers to inspect
    rows = sorted(tuple(r) for r in df.collect())
    wall = time.time() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    return wall, rows, plan


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    args = ap.parse_args()

    from peskas_timor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    n_right = args.rows // 4
    wall_off, rows_off, plan_off = run(spark, args.rows, n_right, skew_on=False)
    wall_on, rows_on, plan_on = run(spark, args.rows, n_right, skew_on=True)

    skew_marker = "skew=true" in plan_on
    smj_line = next(
        (ln.strip() for ln in plan_on.splitlines() if "skew=true" in ln), ""
    )
    out = {
        "metric": "skew_join_aqe",
        "rows_left": args.rows,
        "rows_right": n_right,
        "result_rows_match": rows_on == rows_off,
        "wall_skew_off_sec": round(wall_off, 2),
        "wall_skew_on_sec": round(wall_on, 2),
        "aqe_skew_split_fired": skew_marker,
        "plan_excerpt": smj_line[:200],
    }
    print(json.dumps(out))
    return 0 if (skew_marker and rows_on == rows_off) else 1


if __name__ == "__main__":
    sys.exit(main())
