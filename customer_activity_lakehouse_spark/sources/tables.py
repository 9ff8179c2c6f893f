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


def _hadoop_fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _path_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


# Columns merge_upsert injects to rank update-vs-existing rows. Reserved:
# an updates frame already carrying one would be silently clobbered by
# withColumn and corrupt the merged output (same guard class as SALT_COL
# in operators/joins.salted_join).
MERGE_RESERVED_COLS = ("__pri", "__rn")


def merge_upsert(
    spark: SparkSession,
    spec: TableSpec,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    allow_schema_evolution: bool = False,
    order_col_is_metadata: bool = False,
    _delete_col: str | None = None,
) -> None:
    """MERGE INTO emulation over plain parquet — the Delta/Iceberg upsert
    contract (WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT) for the
    environment where neither runtime's jars are installed (see module
    docstring / ``detect_table_format``).

    Shape: read ONLY the partitions the batch touches (broadcast semi-join
    on the batch's distinct partition values — never the other ~365),
    union with the updates, keep one row per key (updates beat existing;
    ties within a batch resolve by ``order_col`` descending when given),
    then stage-and-swap: the merged frame is first written to a staging
    path NEXT TO the table (``<path>.__staging__``), then the target is
    rewritten FROM THE STAGED FILES — dynamic partition overwrite for
    partitioned tables, an atomic directory rename for unpartitioned ones.
    Staging is what makes read-write-same-path safe at scale: the frame
    that overwrites the target never holds lineage into the files being
    replaced, the staged copy lives on reliable table storage (an executor
    lost mid-overwrite re-reads staging and retries — unlike
    ``localCheckpoint``, whose blocks die with the executor), and a crash
    before the swap leaves the target untouched with the staging dir as
    the only debris. Re-running the same batch is a no-op by construction
    (idempotent), which is the property the nightly-load retry story needs.

    Documented gap vs a real table format: a key that MOVES partitions is
    only removed from its old partition if the old partition is present in
    the batch; per-file transaction isolation and time travel need the
    actual Delta/Iceberg runtime — on a cluster with the jars, set
    ``spec.fmt='delta'`` and replace this call with ``MERGE INTO``.

    ``allow_schema_evolution=True`` is Delta's ``mergeSchema`` contract:
    updates may ADD columns (existing rows read null there) or omit
    existing ones (a winning update row leaves null — whole-row-replace
    semantics, documented); the evolved schema lands atomically with the
    swap. Off (default), schema drift fails loudly before anything stages.

    ``order_col_is_metadata=True`` says ``order_col`` is a transport-level
    sequencing column (an LSN, a CDC ``_commit_version``) that exists ONLY
    on the updates: it ranks the in-batch winner and is then dropped, the
    schema-drift check ignores it, and existing rows rank as null under it
    (``__pri`` already puts updates above existing; the order column only
    breaks ties WITHIN the batch). This is what lets a multi-commit change
    feed apply in one batch without teaching the table its version stamps.

    ``_delete_col`` is internal plumbing for :func:`apply_changes` (WHEN
    MATCHED DELETE): when set, the named column marks rows and a key whose
    WINNING row says 'delete' is dropped from the table instead of
    written.
    """
    key_cols = list(keys)
    if not key_cols:
        raise ValueError("merge_upsert requires at least one key column")
    if order_col_is_metadata and order_col is None:
        raise ValueError("order_col_is_metadata requires order_col")
    clash = [c for c in MERGE_RESERVED_COLS if c in updates.columns]
    if clash:
        raise ValueError(
            f"merge_upsert reserves column(s) {clash} for update-priority "
            "ranking; rename them in the updates frame before merging"
        )
    exists = _path_exists(spark, spec.path)
    if exists:
        existing = read_table(spark, spec)
        clash = [c for c in MERGE_RESERVED_COLS if c in existing.columns]
        if clash:
            raise ValueError(
                f"merge_upsert reserves column(s) {clash}, present in the "
                f"existing table at {spec.path}"
            )
        if spec.partition_cols:
            parts = updates.select(*spec.partition_cols).distinct()
            relevant = existing.join(
                F.broadcast(parts), list(spec.partition_cols), "left_semi"
            )
        else:
            relevant = existing
        if _delete_col is not None:
            # existing rows can never delete themselves; any non-'delete'
            # marker keeps them when they win the key race
            relevant = relevant.withColumn(_delete_col, F.lit("__keep__"))
        if not allow_schema_evolution:
            drift = set(relevant.columns) ^ set(updates.columns)
            drift.discard(_delete_col)
            if order_col_is_metadata:
                drift.discard(order_col)
            if drift:
                raise ValueError(
                    f"merge_upsert: schema drift {sorted(drift)} between table and "
                    "updates; pass allow_schema_evolution=True to merge schemas "
                    "(Delta mergeSchema semantics)"
                )
        merged = relevant.withColumn("__pri", F.lit(0)).unionByName(
            updates.withColumn("__pri", F.lit(1)),
            allowMissingColumns=allow_schema_evolution or order_col_is_metadata,
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
    if _delete_col is not None:
        resolved = resolved.filter(F.col(_delete_col) != "delete").drop(_delete_col)
    if order_col_is_metadata:
        resolved = resolved.drop(order_col)
    _stage_and_swap(spark, spec, resolved, exists)


def _stage_and_swap(
    spark: SparkSession, spec: TableSpec, resolved: DataFrame, exists: bool
) -> None:
    """Shared write path for the read-modify-write table operations
    (merge_upsert / apply_changes / merge_additive).

    Stage unpartitioned (partition values stay ordinary data columns, so
    re-reading them is type-stable regardless of the session's partition-
    column inference settings), then swap. Hadoop FS rename FAILS BY
    RETURNING FALSE, not by raising — every rename result is checked, the
    target is moved ASIDE (never deleted) before the swap so a failed
    rename can restore it, and the staging dir — the only complete copy
    of the merged data until the swap lands — is deleted ONLY after the
    target verifiably holds the merge. On any failure the staging path
    survives for manual recovery."""
    if not exists:
        # Bootstrap: no read-write overlap to break, write directly.
        write_full(resolved, spec) if not spec.partition_cols else write_incremental(
            resolved, spec
        )
        return
    staging = spec.path.rstrip("/") + ".__staging__"
    fs, jstaging = _hadoop_fs(spark, staging)
    resolved.write.format(spec.fmt).mode("overwrite").save(staging)
    staged = spark.read.format(spec.fmt).load(staging)
    if spec.partition_cols:
        # Dynamic partition overwrite from the staged files; if it dies
        # mid-overwrite the staged merge is intentionally left in place.
        write_incremental(staged, spec)
        fs.delete(jstaging, True)
        return
    _, jtarget = _hadoop_fs(spark, spec.path)
    retired = spec.path.rstrip("/") + ".__old__"
    _, jretired = _hadoop_fs(spark, retired)
    fs.delete(jretired, True)  # clear debris from a previous crashed swap
    if not fs.rename(jtarget, jretired):
        raise IOError(
            f"merge_upsert: could not move {spec.path} aside to {retired}; "
            f"target untouched, staged merge preserved at {staging}"
        )
    if not fs.rename(jstaging, jtarget):
        if not fs.rename(jretired, jtarget):
            raise IOError(
                f"merge_upsert: swap failed AND restore failed — table data "
                f"at {retired}, staged merge at {staging}"
            )
        raise IOError(
            f"merge_upsert: swap failed; target restored from {retired}, "
            f"staged merge preserved at {staging}"
        )
    fs.delete(jretired, True)


# 'update' is the NET-diff form (snapshot_changes); the per-commit change
# feed uses Delta CDF's split vocabulary update_preimage/update_postimage
CHANGE_TYPES = ("insert", "update", "delete", "update_preimage", "update_postimage")


def apply_changes(
    spark: SparkSession,
    spec: TableSpec,
    changes: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    change_col: str = "change_type",
    order_col_is_metadata: bool = False,
) -> None:
    """APPLY CHANGES INTO emulation (DLT's AUTO CDC / MERGE with WHEN
    MATCHED DELETE): apply row-level change records — e.g. the output of
    ``snapshots.snapshot_changes`` — to a keyed table. insert/update both
    upsert (latest wins, same key-race rules as :func:`merge_upsert`,
    ``order_col`` breaks in-batch ties); a key whose winning record is
    'delete' is removed. Unknown change types fail loudly before any
    write. Idempotent per batch like merge_upsert (stage-and-swap), which
    is what the streaming sink (``streams.write_stream_apply_changes``)
    composes into exactly-once."""
    if change_col not in changes.columns:
        raise ValueError(f"apply_changes: changes frame has no {change_col!r} column")
    bad = changes.filter(~F.col(change_col).isin(*CHANGE_TYPES)).select(change_col).first()
    if bad is not None:
        raise ValueError(
            f"apply_changes: unknown change type {bad[0]!r} "
            f"(expected one of {CHANGE_TYPES})"
        )
    # preimages describe the OLD row — replica state comes from the
    # postimage (Delta's APPLY CHANGES drops them the same way); dropping
    # before the merge also keeps a key's winning record unambiguous
    changes = changes.filter(F.col(change_col) != "update_preimage")
    merge_upsert(
        spark,
        spec,
        changes,
        keys,
        order_col=order_col,
        order_col_is_metadata=order_col_is_metadata,
        _delete_col=change_col,
    )


def merge_additive(
    spark: SparkSession,
    spec: TableSpec,
    delta: DataFrame,
    keys: Sequence[str],
) -> None:
    """Incremental aggregate maintenance — the materialized-view refresh
    for DISTRIBUTIVE aggregates: the table holds grouped sums/counts;
    ``delta`` holds the SAME columns computed over only the new facts
    (e.g. one late-arriving day). Matched keys ADD component-wise,
    unmatched keys insert, so refreshing an hourly rollup costs
    O(|delta| + touched partitions) — never a fact rescan. This is the
    contract Spark's own streaming aggregations implement inside their
    state store, surfaced for batch backfills.

    Every non-key column must be additive (sum/count); avg must be stored
    as (sum, count) and derived on read, min/max merge only while rows are
    never retracted — store those with care. Column dtypes are preserved
    (sums are cast back), so counts stay BIGINT through repeated merges.
    Schema drift between table and delta fails loudly."""
    key_cols = list(keys)
    if not key_cols:
        raise ValueError("merge_additive requires at least one key column")
    add_cols = [c for c in delta.columns if c not in key_cols]
    missing = [c for c in key_cols if c not in delta.columns]
    if missing or not add_cols:
        raise ValueError(
            f"merge_additive: delta must carry keys {key_cols} plus at least "
            f"one additive column (got {delta.columns})"
        )
    exists = _path_exists(spark, spec.path)
    if exists:
        existing = read_table(spark, spec)
        if sorted(existing.columns) != sorted(delta.columns):
            raise ValueError(
                f"merge_additive: schema drift — table has {sorted(existing.columns)}, "
                f"delta has {sorted(delta.columns)}"
            )
        if spec.partition_cols:
            parts = delta.select(*spec.partition_cols).distinct()
            relevant = existing.join(
                F.broadcast(parts), list(spec.partition_cols), "left_semi"
            )
        else:
            relevant = existing
        merged = relevant.unionByName(delta.select(*existing.columns))
    else:
        merged = delta
    dtypes = dict(merged.dtypes)
    resolved = merged.groupBy(*key_cols).agg(
        *[F.sum(c).cast(dtypes[c]).alias(c) for c in add_cols]
    )
    _stage_and_swap(spark, spec, resolved, exists)


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
