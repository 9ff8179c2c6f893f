"""Partition columns on snapshot tables (VERDICT r7 #2): hive-style
layout per batch, exact partition pruning through [v, v] stats, layout
preservation across DML/OPTIMIZE/streaming, and ALTER interactions."""

from __future__ import annotations

from pathlib import Path

import pytest

from customer_activity_lakehouse_spark.sources.snapshots import (
    _PART_PREFIX,
    commit_append,
    commit_overwrite,
    delete_snapshot,
    compact_snapshot,
    read_snapshot,
    snapshot_detail,
)


def _days(spark, day: str, lo: int, hi: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .withColumn("d", F.lit(day).cast("date"))
        .selectExpr("id", "id * 2 AS v", "d")
    )


def _data_files_of(df) -> list[str]:
    # DV files are scans too (verify gotcha r7): keep data files only
    return [f for f in df.inputFiles() if "-dv-" not in f]


def test_partitioned_append_prunes_to_one_partition(spark, tmp_path):
    """The verdict's acceptance: a date-scoped read of a partitioned
    table lists ONLY that partition's files."""
    t = str(tmp_path / "tbl")
    for i, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"]):
        commit_append(
            spark, t, _days(spark, day, i * 10, i * 10 + 10).coalesce(1),
            partition_by=["d"],
        )
    # layout: every data file sits under a __pp_d=<value> hive dir
    all_files = read_snapshot(spark, t).inputFiles()
    assert len(all_files) == 3
    assert all(f"{_PART_PREFIX}d=" in f for f in all_files)
    # partition-scoped read lists exactly that day's file
    scoped = read_snapshot(spark, t, partition_where={"d": "2024-01-02"})
    assert len(_data_files_of(scoped)) == 1
    assert f"{_PART_PREFIX}d=2024-01-02" in _data_files_of(scoped)[0]
    assert sorted(r.id for r in scoped.collect()) == list(range(10, 20))
    # IN-list keeps the union of the named partitions
    two = read_snapshot(
        spark, t, partition_where={"d": ["2024-01-01", "2024-01-03"]}
    )
    assert len(_data_files_of(two)) == 2
    assert two.count() == 20
    # the real column is IN the files (no reconstruction games)
    assert scoped.select("d").distinct().collect()[0][0].isoformat() == "2024-01-02"
    assert snapshot_detail(spark, t).collect()[0]["partition_columns"] == ["d"]


def test_partitioning_is_inherited_and_conflicts_fail(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, _days(spark, "2024-01-01", 0, 5).coalesce(1), partition_by=["d"]
    )
    # plain append inherits the layout
    commit_append(spark, t, _days(spark, "2024-01-02", 5, 9).coalesce(1))
    files = read_snapshot(spark, t).inputFiles()
    assert all(f"{_PART_PREFIX}d=" in f for f in files)
    with pytest.raises(ValueError, match="partitioned by"):
        commit_append(
            spark, t, _days(spark, "2024-01-03", 9, 12), partition_by=["v"]
        )
    with pytest.raises(KeyError, match="partition column"):
        commit_append(
            spark,
            str(tmp_path / "tbl2"),
            spark.range(3).selectExpr("id"),
            partition_by=["nope"],
        )


def test_delete_preserves_partition_layout_and_pruning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i, day in enumerate(["2024-01-01", "2024-01-02"]):
        commit_append(
            spark, t, _days(spark, day, i * 10, i * 10 + 10).coalesce(1),
            partition_by=["d"],
        )
    delete_snapshot(spark, t, "id % 2 = 1")
    assert read_snapshot(spark, t).count() == 10
    # rewritten survivor files are still hive-laid and value-pure
    files = read_snapshot(spark, t).inputFiles()
    assert all(f"{_PART_PREFIX}d=" in f for f in files)
    scoped = read_snapshot(spark, t, partition_where={"d": "2024-01-01"})
    assert len(_data_files_of(scoped)) == 1
    assert sorted(r.id for r in scoped.collect()) == [0, 2, 4, 6, 8]


def test_optimize_compacts_within_partitions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):  # 4 small files per day, 2 days
        for day in ("2024-01-01", "2024-01-02"):
            commit_append(
                spark, t, _days(spark, day, i * 5, i * 5 + 5).coalesce(1),
                partition_by=["d"],
            )
    assert len(read_snapshot(spark, t).inputFiles()) == 8
    v = compact_snapshot(spark, t, target_file_mb=64)
    files = read_snapshot(spark, t, version=v).inputFiles()
    # bin-packing coalesced, but the partitionBy write re-splits by value:
    # every output file remains value-pure under its hive dir
    assert all(f"{_PART_PREFIX}d=" in f for f in files)
    assert len(files) == 2
    scoped = read_snapshot(spark, t, partition_where={"d": "2024-01-02"})
    assert len(_data_files_of(scoped)) == 1
    assert read_snapshot(spark, t).count() == 40


def test_overwrite_can_relay_partitioning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, _days(spark, "2024-01-01", 0, 10).coalesce(1), partition_by=["d"]
    )
    # overwrite inherits by default
    commit_overwrite(spark, t, _days(spark, "2024-01-05", 0, 6).coalesce(1))
    assert all(
        f"{_PART_PREFIX}d=" in f for f in read_snapshot(spark, t).inputFiles()
    )
    # explicit [] drops partitioning
    commit_overwrite(
        spark, t, _days(spark, "2024-01-06", 0, 4).coalesce(1), partition_by=[]
    )
    files = read_snapshot(spark, t).inputFiles()
    assert all(f"{_PART_PREFIX}" not in f for f in files)
    assert snapshot_detail(spark, t).collect()[0]["partition_columns"] == []
    # and appends to the re-laid table are flat again
    commit_append(spark, t, _days(spark, "2024-01-07", 4, 8).coalesce(1))
    assert read_snapshot(spark, t).count() == 8


def test_streaming_sink_honors_partition_layout(spark, tmp_path):
    from customer_activity_lakehouse_spark.streaming.streams import (
        write_stream_snapshot_append,
    )

    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, _days(spark, "2024-01-01", 0, 5).coalesce(1), partition_by=["d"]
    )
    src = str(tmp_path / "src")
    _days(spark, "2024-01-02", 5, 12).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("id bigint, v bigint, d date").parquet(src)
    )
    q = write_stream_snapshot_append(
        stream, t, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    assert read_snapshot(spark, t).count() == 12
    scoped = read_snapshot(spark, t, partition_where={"d": "2024-01-02"})
    assert sorted(r.id for r in scoped.collect()) == list(range(5, 12))
    assert all(
        f"{_PART_PREFIX}d=" in f for f in read_snapshot(spark, t).inputFiles()
    )


def test_rename_follows_partition_column_and_drop_refused(spark, tmp_path):
    from customer_activity_lakehouse_spark.sources.snapshots import (
        drop_snapshot_column,
        rename_snapshot_column,
    )

    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, _days(spark, "2024-01-01", 0, 5).coalesce(1), partition_by=["d"]
    )
    with pytest.raises(ValueError, match="partition column"):
        drop_snapshot_column(spark, t, "d")
    rename_snapshot_column(spark, t, "d", "day")
    assert snapshot_detail(spark, t).collect()[0]["partition_columns"] == ["day"]
    # pruning works through the NEW logical name (physical key unchanged)
    scoped = read_snapshot(spark, t, partition_where={"day": "2024-01-01"})
    assert scoped.count() == 5
    # and appends keyed by the new name land in the same physical layout
    from pyspark.sql import functions as F

    batch = (
        spark.range(5, 9)
        .withColumn("day", F.lit("2024-01-02").cast("date"))
        .selectExpr("id", "id * 2 AS v", "day")
        .coalesce(1)
    )
    commit_append(spark, t, batch)
    assert read_snapshot(
        spark, t, partition_where={"day": "2024-01-02"}
    ).count() == 4


def test_datasource_writer_honors_partition_layout(spark, tmp_path):
    """The pure-Python Arrow writer splits its batches by partition value
    and stages hive-style, so a DataSource append to a partitioned table
    keeps every file value-pure — then JVM-side partition pruning works on
    Python-written files and vice versa (mixed-engine table)."""
    from customer_activity_lakehouse_spark.sources import datasource as DS
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )

    # layout prefix contract shared by both engines
    assert DS._PART_PREFIX == _PART_PREFIX

    spark.dataSource.register(SnapshotLogDataSource)
    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, _days(spark, "2024-01-01", 0, 5).coalesce(1), partition_by=["d"]
    )
    # one Python-written batch spanning TWO partition values
    batch = _days(spark, "2024-01-02", 5, 10).union(
        _days(spark, "2024-01-03", 10, 14)
    )
    (
        batch.coalesce(1)
        .write.format("snapshot_log")
        .option("path", t)
        .mode("append")
        .save()
    )
    assert read_snapshot(spark, t).count() == 14
    files = read_snapshot(spark, t).inputFiles()
    assert len(files) == 3  # the task split its batch into one file per value
    assert all(f"{_PART_PREFIX}d=" in f for f in files)
    # exact partition pruning over the Python-written files
    scoped = read_snapshot(spark, t, partition_where={"d": "2024-01-03"})
    assert len(_data_files_of(scoped)) == 1
    assert sorted(r.id for r in scoped.collect()) == list(range(10, 14))
    # and the DataSource reader round-trips the mixed-engine table
    got = spark.read.format("snapshot_log").option("path", t).load()
    assert sorted(r.id for r in got.collect()) == list(range(14))


def test_datasource_overwrite_inherits_partitioning(spark, tmp_path):
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )

    spark.dataSource.register(SnapshotLogDataSource)
    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, _days(spark, "2024-01-01", 0, 5).coalesce(1), partition_by=["d"]
    )
    (
        _days(spark, "2024-01-09", 0, 6)
        .coalesce(1)
        .write.format("snapshot_log")
        .option("path", t)
        .mode("overwrite")
        .save()
    )
    assert snapshot_detail(spark, t).collect()[0]["partition_columns"] == ["d"]
    files = read_snapshot(spark, t).inputFiles()
    assert all(f"{_PART_PREFIX}d=" in f for f in files)
    # a JVM append after the Python overwrite still inherits the layout
    commit_append(spark, t, _days(spark, "2024-01-10", 6, 9).coalesce(1))
    assert read_snapshot(
        spark, t, partition_where={"d": "2024-01-10"}
    ).count() == 3


def test_partition_spec_evolution(spark, tmp_path):
    """Iceberg partition evolution: one metadata commit changes the spec
    — old files keep their layout (pruned conservatively), new files lay
    out by the new spec (pruned exactly), and a rewrite adopts the
    current spec so pruning tightens over time. Never a filter."""
    from pyspark.sql import functions as F

    import customer_activity_lakehouse_spark.sources.snapshots as S

    t = str(tmp_path / "tbl")
    df = spark.range(0, 400).select(
        "id",
        (F.col("id") % 4).cast("int").alias("region"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 10).cast("int")).alias("day"),
    )
    S.commit_append(spark, t, df.filter("id < 200"), partition_by=["region"])
    v = S.set_partition_spec(spark, t, ["day"])
    m = S._read_manifest(spark, t, v)
    assert m["partition_by"] == ["day"]
    # appends now lay out by day (and may no longer declare region)
    S.commit_append(spark, t, df.filter("id >= 200"))
    assert S.read_snapshot(spark, t).count() == 400
    m2 = S._read_manifest(spark, t, v + 1)
    new_files = [f for f in m2["files"] if f not in set(m["files"])]
    assert new_files and all("__pp_day=" in f for f in new_files)
    # pruning on the NEW spec: new files prune exactly; old-spec files
    # survive conservatively (they hold matching rows anyway here)
    probe = S.read_snapshot(spark, t, partition_where={"day": "2024-01-03"})
    assert probe.filter("day = '2024-01-03'").count() == 40
    pruned_new = [f for f in probe.inputFiles() if "__pp_day=" in f]
    assert all("__pp_day=2024-01-03" in f for f in pruned_new)
    # pruning on the OLD spec still works for old files (exact) and keeps
    # new files conservatively — never a filter in either direction
    probe_r = S.read_snapshot(spark, t, partition_where={"region": 2})
    assert probe_r.filter("region = 2").count() == 100
    # a rewrite adopts the current spec: compaction re-lays everything
    S.compact_snapshot(spark, t, target_file_mb=1)
    m3 = S._read_manifest(spark, t, S._list_versions(spark, t)[-1])
    rewritten = [f for f in m3["files"] if f not in set(m2["files"])]
    assert rewritten and all("__pp_day=" in f for f in rewritten)
    # unpartition via the same verb
    S.set_partition_spec(spark, t, [])
    S.commit_append(spark, t, df.limit(5))
    assert S.read_snapshot(spark, t).count() == 405
