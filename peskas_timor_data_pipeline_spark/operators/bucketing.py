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
