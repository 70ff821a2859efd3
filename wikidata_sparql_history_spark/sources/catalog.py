"""Table catalog abstraction (SURVEY.md §2.1 S3/S4/S7/S8).

Production target is Iceberg (`writeTo(...).createOrReplace()` on a
configured catalog — atomic snapshot commits give us exactly-once
stage outputs and incremental reads). The sandbox has no Iceberg
runtime jar, so the same contract is provided over parquet
directories with an atomic-enough protocol: write to the final path,
rely on Spark's _SUCCESS marker for completeness, and treat a
directory without _SUCCESS as absent (crash-consistent resume).

The reference analog is the RocksDB store + triple-progress.txt
resume counter (RocksTripleLoader.java:65-90): our unit of resume is
a whole stage output table (coarser but idempotent — re-running a
stage overwrites, never duplicates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def write_table(
    df: DataFrame,
    path: str,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write a stage output. `sort_by` = within-partition sort so
    parquet min/max stats support data skipping (the analog of the
    reference's sorted RocksDB key order, RocksStore.java:224-245).
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Bucketed catalog table (S7 at scale): pre-hash-partitioned ON
    DISK, so joins/aggregations keyed on the bucket columns read both
    sides co-located and need NO shuffle at query time — the Spark
    analog of the reference's sorted RocksDB key layout making its
    merge joins index-order (RocksStore.java:224-245). At 100 TB this
    is the difference between an exabyte of shuffle over the fact
    table's lifetime and none: bucket once on conv_id (or subj), every
    later stage reuses the layout. Iceberg's `bucket(N, col)` partition
    transform is the production spelling of the same contract.

    (saveAsTable because bucket metadata lives in the session catalog —
    plain parquet paths can't carry it.)
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
