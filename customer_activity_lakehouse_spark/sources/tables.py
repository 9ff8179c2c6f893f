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
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
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

    The mode is passed as a per-WRITER option (takes precedence over the
    session conf), so concurrent writes planned on the same SparkSession
    keep Spark's static default — a session-conf set/restore here could
    leak 'dynamic' into another thread's write being planned at the same
    time.
    """
    if not spec.partition_cols:
        raise ValueError("write_incremental requires a partitioned TableSpec")
    (
        df.write.format(spec.fmt)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*spec.partition_cols)
        .save(spec.path)
    )


def read_table(spark: SparkSession, spec: TableSpec) -> DataFrame:
    return spark.read.format(spec.fmt).load(spec.path)


def _path_exists(spark: SparkSession, path: str) -> bool:
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def merge_upsert(
    spark: SparkSession,
    spec: TableSpec,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> None:
    """MERGE INTO emulation over plain parquet — the Delta/Iceberg upsert
    contract (WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT) for the
    environment where neither runtime's jars are installed (see module
    docstring / ``detect_table_format``).

    Shape: read ONLY the partitions the batch touches (broadcast semi-join
    on the batch's distinct partition values — never the other ~365),
    union with the updates, keep one row per key (updates beat existing;
    ties within a batch resolve by ``order_col`` descending when given),
    then dynamic-overwrite exactly those partitions. The merged frame is
    localCheckpoint-ed first to cut its lineage from the very files the
    overwrite replaces — the stand-in for a table format's write-new-files
    -then-swap atomicity. Re-running the same batch is a no-op by
    construction (idempotent), which is the property the nightly-load
    retry story needs.

    Documented gap vs a real table format: a key that MOVES partitions is
    only removed from its old partition if the old partition is present in
    the batch; per-file transaction isolation and time travel need the
    actual Delta/Iceberg runtime — on a cluster with the jars, set
    ``spec.fmt='delta'`` and replace this call with ``MERGE INTO``.
    """
    key_cols = list(keys)
    if not key_cols:
        raise ValueError("merge_upsert requires at least one key column")
    if _path_exists(spark, spec.path):
        existing = read_table(spark, spec)
        if spec.partition_cols:
            parts = updates.select(*spec.partition_cols).distinct()
            relevant = existing.join(
                F.broadcast(parts), list(spec.partition_cols), "left_semi"
            )
        else:
            relevant = existing
        merged = relevant.withColumn("__pri", F.lit(0)).unionByName(
            updates.withColumn("__pri", F.lit(1))
        )
    else:
        merged = updates.withColumn("__pri", F.lit(1))
    order = [F.col("__pri").desc()]
    if order_col is not None:
        order.append(F.col(order_col).desc_nulls_last())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    resolved = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pri")
    )
    resolved = resolved.localCheckpoint(eager=True)
    if spec.partition_cols:
        write_incremental(resolved, spec)
    else:
        write_full(resolved, spec)


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
    """Rewrite the table so each partition holds AT MOST
    ``files_per_partition`` files — the OPTIMIZE/rewrite_data_files job of
    a real table format.

    Shape: one shuffle keyed on the partition columns (repartition by key
    puts each hive partition's rows in at most ``files_per_partition``
    tasks), then a dynamic overwrite so unrelated concurrent partitions
    are untouched. At 100 TB run per-partition-range, not whole-table.

    File-count semantics: ``files_per_partition=1`` is exact; above 1 the
    deterministic row-hash salt spreads rows over ``n`` sub-buckets, but
    hash-repartition collisions can merge salt buckets, so the guarantee
    is ≤ n (possibly uneven) files per partition — the bound that matters
    for the small-file problem. The salt derives from the row's columns
    (``pmod(xxhash64(...), n)``), not ``F.rand``: deterministic under task
    retry, and reruns produce identical layouts.
    """
    df = read_table(spark, spec)
    if spec.partition_cols:
        n = max(1, files_per_partition)
        keys = [F.col(c) for c in spec.partition_cols]
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast("int")
        salt_col = "_salt"
        while salt_col in df.columns:  # never clobber a user column
            salt_col = "_" + salt_col
        parts = df.withColumn(salt_col, salt).repartition(
            *keys, F.col(salt_col)
        ).drop(salt_col)
        write_incremental(parts, spec)
    else:
        write_full(df.repartition(max(1, files_per_partition)), spec)
