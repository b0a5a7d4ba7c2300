"""Bucketed-table helpers for co-located joins (SURVEY.md §4.2 item 7).

The pipeline joins landings-derived and tracker-derived frames on the same
keys at every stage (submission id, (date, imei), orderkey analogues). At
100 TB, writing both sides bucketed by the join key makes every downstream
join shuffle-free: the scan is already hash-partitioned, so SortMergeJoin
reads bucket i against bucket i with no Exchange.

Rule of thumb: bucket the big fact tables that meet repeatedly on one key;
broadcast everything dimension-sized instead of bucketing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. Sorting by
    the join key additionally removes the per-bucket sort from SMJ."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two equally-bucketed tables; with matching bucket specs the
    plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def morton_key(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleave of two columns' bit patterns, each first
    rank-normalized to ``bits`` bits by the caller (e.g. width_bucket /
    floor-scaled ints). Clustering files on the interleaved key gives every
    file a bounded extent in BOTH dimensions, so predicates on EITHER
    column prune files — a plain range-cluster on (a, b) prunes only on
    ``a`` (b's per-file extent stays the full domain). This is the layout
    trick behind Delta/Iceberg Z-ordering, as a pure column expression.

    Cost shape: the interleave is shift/or arithmetic (whole-stage
    codegen); the clustered write (repartitionByRange on the key) is the
    same single exchange any clustered write pays.
    """
    from pyspark.sql import functions as F

    a = col_a.cast("long")
    b = col_b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return z
