"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01 (or --sf-dir), compares row-count, schema (column names),
and an order-insensitive value hash (columns sorted by name, rows sorted,
values stringified). Exit code 1 on any mismatch.

Usage: python tools/selfcheck.py [--sf-dir DIR] [--only name1,name2] [-v]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v) -> str:
    import datetime

    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return canon(float(v))
    except ImportError:
        pass
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession like the external driver does",
    )
    ap.add_argument(
        "--duckdb-mem",
        default=None,
        help="run every oracle under this DuckDB memory_limit (e.g. 200MB)."
        " The r04 driver ran DuckDB in a memory window where one oracle's"
        " planner strategy flipped and OOM'd; sweeping {100MB,200MB,500MB}"
        " over the heavy oracles catches that class before the driver does.",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("selfcheck-vanilla").getOrCreate()
    else:
        from peskas_timor_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name="selfcheck")

    def connect():
        c = duckdb.connect()
        if args.duckdb_mem:
            c.execute(f"SET memory_limit='{args.duckdb_mem}'")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")
        return c

    con = connect()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # one generic retry: concurrent JVMs (pytest, bench) on the
            # host can starve a task mid-run — a real failure reproduces
            # on the immediate second attempt, a transient doesn't (the
            # r04 closing sweep saw 5 consecutive phantom failures that
            # all passed in isolation)
            for attempt in range(2):
                try:
                    sdf = fn(spark, args.sf_dir)
                    scols = sdf.columns
                    srows = [tuple(r) for r in sdf.collect()]
                    break
                except Exception:
                    if attempt == 1:
                        raise
                    # surface the swallowed first failure: a genuinely
                    # intermittent bug would otherwise hide behind the
                    # transient-starvation retry
                    print(
                        f"WARN {name}: first attempt failed, retrying\n"
                        f"{traceback.format_exc()}"
                    )
                    time.sleep(5)
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            # transient host memory pressure (observed failing 16 KB
            # allocations with >100 GB free moments later, typically under
            # a concurrently-running Spark JVM): reconnect to drop the
            # buffer pool and retry with backoff before giving up.
            # Under --duckdb-mem, use a FRESH connection per oracle: a
            # long-lived capped connection accumulates buffer-pool state
            # across ~200 queries and starts OOMing oracles that pass in
            # isolation — the sweep should measure per-oracle footprints,
            # not connection-lifetime fragmentation.
            if args.duckdb_mem:
                con.close()
                con = connect()
            res = None
            for attempt in range(3):
                try:
                    res = con.execute(oracles[name])
                    break
                except (duckdb.OutOfMemoryException, duckdb.IOException):
                    # OOM or EMFILE under a concurrently-running Spark JVM:
                    # reconnect to drop the buffer pool / file handles.
                    # Under an explicit --duckdb-mem limit an OOM is the
                    # FINDING, not a transient — fail immediately.
                    if attempt == 2 or args.duckdb_mem:
                        raise
                    print(f"WARN {name}: oracle transient, reconnecting\n"
                          f"{traceback.format_exc()}")
                    time.sleep(5 * (attempt + 1))
                    con.close()
                    con = connect()
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: oracle error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                if args.verbose:
                    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                    ss = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in srows)
                    oo = sorted("\x1f".join(canon(r[i]) for i in order_o) for r in orows)
                    for a, b in zip(ss, oo):
                        if a != b:
                            print(f"  spark : {a.replace(chr(31), ' | ')}")
                            print(f"  oracle: {b.replace(chr(31), ' | ')}")
                            break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failures:", ",".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
