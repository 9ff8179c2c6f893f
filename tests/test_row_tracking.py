"""Row tracking (Delta ROW TRACKING parity): unique stable row ids.

Contract under test (snapshots.enable_row_tracking docstring):
- every row has a unique 64-bit ``_row_id`` (base-per-file + parquet row
  index, or a materialized ``_row_id`` column after OPTIMIZE/REORG);
- ids survive appends, metadata commits, merge-on-read (dv) DML,
  OPTIMIZE/REORG rewrites, time travel, restore, and clone;
- data-change rewrites assign FRESH ids to rewritten rows (Delta's
  non-preserving-operation semantics) while untouched files keep theirs;
- the watermark is monotonic — no id is ever minted twice, even across
  restores and racing appends;
- writers that cannot maintain the allocation refuse (Python DataSource).
"""

from __future__ import annotations

import threading

import pytest

from customer_activity_lakehouse_spark.sources.snapshots import (
    clone_snapshot,
    commit_append,
    commit_overwrite,
    compact_snapshot,
    delete_snapshot,
    enable_row_tracking,
    merge_snapshot,
    read_snapshot,
    restore_snapshot,
    set_check_constraint,
    update_snapshot,
)


def _seed(spark, path, batches=((0, 10), (10, 20))):
    t = str(path)
    for lo, hi in batches:
        commit_append(
            spark, t,
            spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(1),
            stats_cols=["id"],  # lets merge's file pruning scope rewrites
        )
    return t


def _ids(spark, t, **kw):
    rows = read_snapshot(spark, t, with_row_ids=True, **kw).collect()
    return {r.id: r._row_id for r in rows}


def test_enable_assigns_unique_dense_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    got = _ids(spark, t)
    assert len(got) == 20
    assert sorted(got.values()) == list(range(20))  # dense from 0 at enable
    # plain reads never see the id column
    assert "_row_id" not in read_snapshot(spark, t).columns
    # idempotent
    v = enable_row_tracking(spark, t)
    assert v == 3 and _ids(spark, t) == got


def test_append_allocates_above_watermark(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    commit_append(spark, t, spark.range(20, 25).selectExpr("id", "id * 2 AS v"))
    after = _ids(spark, t)
    assert {k: after[k] for k in before} == before  # old rows untouched
    new_ids = [after[k] for k in range(20, 25)]
    assert min(new_ids) >= 20 and len(set(after.values())) == 25


def test_optimize_preserves_ids_exactly(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl", batches=((0, 7), (7, 13), (13, 20)))
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    v = compact_snapshot(spark, t)  # 3 small files -> 1
    assert v is not None
    assert _ids(spark, t) == before  # bit-for-bit identical mapping
    # and the ids survive a SECOND compaction cycle (materialized column
    # read back + re-materialized)
    commit_append(spark, t, spark.range(20, 26).selectExpr("id", "id * 2 AS v").coalesce(1))
    before2 = _ids(spark, t)
    assert compact_snapshot(spark, t) is not None
    assert _ids(spark, t) == before2


def test_optimize_cluster_by_preserves_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    assert compact_snapshot(spark, t, cluster_by=["v"]) is not None
    assert _ids(spark, t) == before


def test_dv_delete_preserves_survivor_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    delete_snapshot(spark, t, "id < 5", mode="dv")
    after = _ids(spark, t)
    assert set(after) == set(range(5, 20))
    assert after == {k: v for k, v in before.items() if k >= 5}


def test_rewrite_delete_fresh_ids_for_rewritten_file_only(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")  # file A: 0-9, file B: 10-19
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    delete_snapshot(spark, t, "id = 3")  # rewrites file A only
    after = _ids(spark, t)
    assert set(after) == set(range(20)) - {3}
    # file B untouched: ids identical
    assert {k: after[k] for k in range(10, 20)} == {
        k: before[k] for k in range(10, 20)
    }
    # file A survivors: FRESH ids above the old watermark, still unique
    assert all(after[k] >= 20 for k in range(10) if k != 3)
    assert len(set(after.values())) == 19


def test_update_dv_mode_postimages_get_fresh_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    update_snapshot(spark, t, "id = 7", {"v": "999"}, mode="dv")
    after = _ids(spark, t)
    assert after[7] != before[7] and after[7] >= 20  # postimage row: new id
    assert {k: after[k] for k in after if k != 7} == {
        k: before[k] for k in before if k != 7
    }
    got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
    assert got[7] == 999


def test_merge_untouched_files_keep_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    upd = spark.createDataFrame([(3, 333), (25, 50)], "id long, v long")
    merge_snapshot(spark, t, upd, keys=["id"])
    after = _ids(spark, t)
    assert set(after) == set(range(20)) | {25}
    # file B (10-19) untouched by the merge key range
    assert {k: after[k] for k in range(10, 20)} == {
        k: before[k] for k in range(10, 20)
    }
    assert len(set(after.values())) == 21


def test_time_travel_and_restore_keep_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    v_enabled = 3
    ids_v3 = _ids(spark, t)
    delete_snapshot(spark, t, "id >= 10")  # v4 rewrite
    assert _ids(spark, t, version=v_enabled) == ids_v3  # time travel
    restore_snapshot(spark, t, v_enabled)
    restored = _ids(spark, t)
    assert restored == ids_v3  # restore brings the old files AND their ids
    # watermark stayed monotonic: a fresh append can't re-mint any id
    # minted by the rolled-back delete commit
    commit_append(spark, t, spark.range(30, 33).selectExpr("id", "id * 2 AS v"))
    after = _ids(spark, t)
    assert len(set(after.values())) == 23


def test_overwrite_mints_fresh_ids_monotonically(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    commit_overwrite(spark, t, spark.range(0, 4).selectExpr("id", "id * 3 AS v"))
    after = _ids(spark, t)
    assert len(after) == 4 and min(after.values()) >= 20


def test_metadata_commit_and_clone_carry_ids(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    set_check_constraint(spark, t, "nonneg", "v >= 0")
    assert _ids(spark, t) == before
    dst = str(tmp_path / "clone")
    clone_snapshot(spark, t, dst)
    assert _ids(spark, dst) == before


def test_concurrent_appends_disjoint_id_ranges(spark, tmp_path):
    t = _seed(spark, tmp_path / "tbl", batches=((0, 5),))
    enable_row_tracking(spark, t)
    errs: list = []

    def appender(lo):
        try:
            commit_append(
                spark, t,
                spark.range(lo, lo + 50).selectExpr("id", "id * 2 AS v").coalesce(1),
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(100 * k,)) for k in (1, 2, 3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    ids = _ids(spark, t)
    assert len(ids) == 155
    assert len(set(ids.values())) == 155  # no two rows ever share an id


def test_datasource_writer_refuses_row_tracked_table(spark, tmp_path):
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )

    spark.dataSource.register(SnapshotLogDataSource)
    t = _seed(spark, tmp_path / "tbl")
    enable_row_tracking(spark, t)
    df = spark.range(50, 55).selectExpr("id", "id * 2 AS v")
    with pytest.raises(Exception, match="row tracking"):
        df.write.format("snapshot_log").mode("append").option("path", t).save()


def test_streaming_sink_allocates_row_ids(spark, tmp_path):
    """The streaming snapshot sink funnels through _commit_append_files,
    so micro-batch appends to a row-tracked table must allocate bases
    like any append: seed ids unchanged, streamed rows above the
    watermark, global uniqueness across every micro-batch."""
    from customer_activity_lakehouse_spark.streaming import (
        write_stream_snapshot_append,
    )

    t = _seed(spark, tmp_path / "tbl", batches=((0, 10),))
    enable_row_tracking(spark, t)
    before = _ids(spark, t)
    landing = str(tmp_path / "landing")
    spark.range(100, 140).selectExpr("id", "id * 2 AS v").repartition(
        2
    ).write.parquet(landing)
    stream = (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = write_stream_snapshot_append(stream, t, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive
    after = _ids(spark, t)
    assert {k: after[k] for k in before} == before
    assert len(after) == 50 and len(set(after.values())) == 50
    assert all(after[k] >= 10 for k in range(100, 140))


def test_pruned_checkpoint_read_keeps_row_id_markers(spark, tmp_path):
    """Regression (ADVICE r9): a pruned read (skip_where/point_where) decodes
    only the probed stat columns from the parquet checkpoint — but
    with_row_ids also needs the '__row_ids: materialized' marker that
    OPTIMIZE/REORG rewrites stamp on their files, or _rt_bases_for raises
    'row-tracking invariant broken'. Repro: compacted file + enough appends
    to cross CKPT_EVERY so the manifest resolves through a pruned
    checkpoint decode."""
    t = _seed(spark, tmp_path / "tbl", batches=((0, 5), (5, 10), (10, 15)))
    enable_row_tracking(spark, t)
    assert compact_snapshot(spark, t) is not None  # marks '__row_ids'
    for k in range(6):  # past CKPT_EVERY=10 commits total
        commit_append(
            spark, t,
            spark.range(20 + 5 * k, 25 + 5 * k).selectExpr("id", "id * 2 AS v"),
            stats_cols=["id"],
        )
    full = _ids(spark, t)
    pruned = _ids(spark, t, skip_where=("id", 0, 5))
    assert {k: v for k, v in full.items() if 0 <= k <= 5} == {
        k: v for k, v in pruned.items() if 0 <= k <= 5
    }
    assert len(set(full.values())) == len(full)


def test_enable_refuses_existing_row_id_column(spark, tmp_path):
    """`_row_id` is a reserved physical name: enabling tracking on a table
    whose schema already carries one would make every with_row_ids read
    project a duplicate, ambiguous column — refuse loudly instead."""
    t = str(tmp_path / "tbl")
    commit_append(
        spark, t,
        spark.range(5).selectExpr("id", "id AS _row_id"),
    )
    with pytest.raises(ValueError, match="_row_id"):
        enable_row_tracking(spark, t)
