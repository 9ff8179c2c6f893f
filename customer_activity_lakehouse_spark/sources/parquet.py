"""Parquet scans/sinks (reference operators S4-S6) + driver-table loader.

Reference:
- S4 partitioned scan: read_parquet_from_minio, data_processing.py:226-244.
  Spark's parquet reader discovers hive partitions automatically and prunes
  them when the query filters on the partition column.
- S5 raw sink: write_dask_dataframe_to_minio, data_processing.py:201-223 —
  overwrite, partitioned by transaction_date.
- S6 curated sink: write_parquet_to_minio, data_processing.py:399-435 —
  repartition to a target output-file count (default 1), optional partition
  columns (validated), overwrite.

Scale notes (100 TB):
- ``repartition(1)`` is correct only for small dims; for the fact table pass
  ``target_partitions=None`` and let AQE coalesce post-shuffle output, or set
  ``maxRecordsPerFile`` to bound file sizes. The knob exists to reproduce the
  reference's single-file curated outputs (data_processing.py:405, 413), not
  as the scale path.
- Overwrite mode is *static* whole-prefix overwrite, same semantics as the
  reference's ``overwrite=True`` (data_processing.py:217, 427). For
  incremental daily loads at scale, set
  ``spark.sql.sources.partitionOverwriteMode=dynamic`` and overwrite only the
  partitions present in the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import salt_column
from ..schemas import DRIVER_TABLES, require_columns


# Columnar formats the sinks below can write. Parquet is the default
# everywhere; ORC ships inside the Spark distribution (no extra jars — the
# one columnar alternative this environment actually allows, unlike
# Delta/Iceberg whose runtimes are install-blocked, README "Table formats").
COLUMNAR_FORMATS = ("parquet", "orc")


def _check_fmt(fmt: str) -> str:
    if fmt not in COLUMNAR_FORMATS:
        raise ValueError(f"unsupported columnar format {fmt!r}; use one of {COLUMNAR_FORMATS}")
    return fmt


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4 — (partitioned) parquet scan with automatic partition discovery."""
    return spark.read.parquet(path)


def read_columnar(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Format-dispatched scan (parquet | orc), same partition discovery."""
    return spark.read.format(_check_fmt(fmt)).load(path)


def _cluster_by_partitions(
    df: DataFrame, cols: list[str], files_per_partition: int = 1
) -> DataFrame:
    """Shuffle rows so each hive partition is written by (at most)
    ``files_per_partition`` tasks — THE prerequisite for partitioned sinks.

    Without it every input task holds rows for every partition value and
    opens one writer per value: T input tasks × P partition dirs = T×P
    tiny files (measured: a 32-task, 366-date write produced ~11,700
    files and took 54 s at 100k rows; clustered, it's ~366 files and
    seconds — and the downstream scan stops paying per-file open cost).
    The salt term splits hot partitions across ``files_per_partition``
    tasks (deterministic row-hash, replay-safe — same pattern as
    tables.compact); at n=1 it is constant and the expression reduces to
    repartition-by-key. Salt source is ``salt_column`` (operators/joins),
    which skips xxhash64-unhashable columns (MapType, nested or not) so a
    frame carrying a map column still writes."""
    n = max(1, int(files_per_partition))
    salt = salt_column(df, n)
    return df.repartition(*[F.col(c) for c in cols], salt)


def write_raw_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    files_per_partition: int = 1,
    fmt: str = "parquet",
) -> None:
    """S5 — raw-zone sink: hive-partitioned, full overwrite
    (data_processing.py:201-223; partition_on data_processing.py:218).
    Rows are clustered by the partition key first (see
    :func:`_cluster_by_partitions`); raise ``files_per_partition`` when a
    single date holds more rows than one task should write."""
    cols = ["transaction_date"] if partition_cols is None else partition_cols
    require_columns(df, cols, "write_raw_partitioned")
    out = _cluster_by_partitions(df, cols, files_per_partition) if cols else df
    writer = out.write.mode("overwrite").format(_check_fmt(fmt))
    if cols:
        writer = writer.partitionBy(*cols)
    writer.save(path)


def write_curated_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    target_partitions: int | None = 1,
    input_clustered: bool = False,
    fmt: str = "parquet",
) -> None:
    """S6 — curated sink with output-file-count control
    (data_processing.py:399-435; repartition data_processing.py:187-196, 413).

    ``target_partitions=None`` skips the repartition entirely (the 100 TB
    path: AQE-coalesced shuffle output + maxRecordsPerFile).

    For PARTITIONED curated writes ``target_partitions`` means files PER
    PARTITION DIR (the reference's Dask ``repartition(1)`` + partition_on
    yields one file per date dir, data_processing.py:413+428): rows are
    clustered on the partition key so each dir is written by that many
    tasks, never by every task (see :func:`_cluster_by_partitions`).

    ``input_clustered=True`` declares that the input is ALREADY laid out
    by the partition key — e.g. a narrow transform over a scan of a
    hive-partitioned dir, where every input split holds rows of exactly
    one partition value — and skips the re-cluster exchange entirely.
    For raw→curated over a date-partitioned raw zone, that exchange is a
    full shuffle of the fact table carrying zero information; at 100 TB
    it IS the cost of the job. File counts are preserved as long as one
    raw file per partition stays under maxPartitionBytes (a split file
    writes 2 files for that dir; raise ``files_per_partition`` on the raw
    sink instead if a single date outgrows one task).
    """
    cols = partition_cols or []
    require_columns(df, cols, "write_curated_parquet")
    out = df
    if input_clustered and cols:
        pass  # trust the scan layout: no exchange of any kind
    elif target_partitions is not None:
        if cols:
            out = _cluster_by_partitions(df, cols, target_partitions)
        else:
            # repartition (shuffle) rather than coalesce: coalesce(1) would
            # pull the whole upstream transform onto one task, serializing
            # the job.
            out = df.repartition(max(1, int(target_partitions)))
    writer = out.write.mode("overwrite").format(_check_fmt(fmt))
    if cols:
        writer = writer.partitionBy(*cols)
    writer.save(path)


def load_driver_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver-provided test tables (TESTDATA.md) as DataFrames."""
    names = tables or DRIVER_TABLES
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in names}


def register_driver_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for name, df in load_driver_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
