"""Incremental materialized aggregate maintenance (sources/incremental.py):
the MV must equal a from-scratch recompute after EVERY kind of source
commit — appends, MERGE, deletion-vector deletes, updates — while reading
only the change feed; consumption is exactly-once via the version stamp
in the aggregate's own manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.sources.incremental import (
    maintain_recompute_aggregate,
    maintain_sum_aggregate,
)
from customer_activity_lakehouse_spark.sources.snapshots import (
    _list_versions,
    _read_manifest,
    commit_append,
    commit_overwrite,
    compact_snapshot,
    delete_snapshot,
    merge_snapshot,
    read_snapshot,
    update_snapshot,
)


def _src_df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id % 5 AS k", "id * 2 AS v")


def _recompute(spark, src):
    return {
        r.k: (r.v, r.n)
        for r in read_snapshot(spark, src)
        .groupBy("k")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _mv(spark, agg):
    return {r.k: (r.v, r.n_rows) for r in read_snapshot(spark, agg).collect()}


def test_mv_tracks_full_dml_surface_exactly(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    commit_append(spark, src, _src_df(spark, 0, 40).coalesce(2), stats_cols=["id"])

    # bootstrap
    v = maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    assert v == 1
    assert _mv(spark, agg) == _recompute(spark, src)
    # already current → no-op, version unchanged
    assert maintain_sum_aggregate(spark, src, agg, ["k"], ["v"]) is None
    n_agg_commits = len(_list_versions(spark, agg))

    # append + merge + DV delete + update, then ONE maintenance run
    commit_append(spark, src, _src_df(spark, 40, 60).coalesce(1), stats_cols=["id"])
    merge_snapshot(
        spark,
        src,
        spark.range(0, 8).selectExpr("id", "id % 5 AS k", "id * 1000 AS v"),
        ["id"],
        stats_cols=["id"],
    )
    delete_snapshot(spark, src, "id >= 55", mode="dv", stats_cols=["id"])
    update_snapshot(
        spark, src, "id < 3", {"v": "v + 7"}, stats_cols=["id"]
    )
    v = maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    assert v == max(_list_versions(spark, src))
    assert _mv(spark, agg) == _recompute(spark, src)

    # the consumed version is stamped in the aggregate's own manifest —
    # the exactly-once anchor (no side cursor to desync)
    m = _read_manifest(spark, agg, max(_list_versions(spark, agg)))
    assert m["mv_consumed_version"] == v
    assert len(_list_versions(spark, agg)) == n_agg_commits + 1


def test_mv_key_leaves_aggregate_at_zero_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    # two keys; key 1 has exactly 3 rows
    df = spark.createDataFrame(
        [(0, 0, 10), (1, 0, 20), (2, 1, 30), (3, 1, 40), (4, 1, 50)],
        "id long, k long, v long",
    )
    commit_append(spark, src, df.coalesce(1), stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    delete_snapshot(spark, src, "k = 1", stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    out = _mv(spark, agg)
    assert out == {0: (30, 2)}, out  # key 1 fully deleted → row GONE


def test_mv_compaction_only_range_records_version(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    for i in range(3):
        commit_append(
            spark, src, _src_df(spark, i * 10, i * 10 + 10).coalesce(1),
            stats_cols=["id"],
        )
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    compact_snapshot(spark, src)  # data_change=false
    v = maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    assert v == max(_list_versions(spark, src))
    assert _mv(spark, agg) == _recompute(spark, src)
    # and now current
    assert maintain_sum_aggregate(spark, src, agg, ["k"], ["v"]) is None


def test_mv_overwrite_falls_back_to_resync(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    commit_append(spark, src, _src_df(spark, 0, 30).coalesce(1), stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    commit_overwrite(spark, src, _src_df(spark, 100, 120).coalesce(1), stats_cols=["id"])
    v = maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    assert v == max(_list_versions(spark, src))
    assert _mv(spark, agg) == _recompute(spark, src)


def _recompute_minmax(spark, src):
    return {
        r.k: (r.v_min, r.v_max, r.n)
        for r in read_snapshot(spark, src)
        .groupBy("k")
        .agg(F.min("v").alias("v_min"), F.max("v").alias("v_max"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_minmax_mv_survives_extremum_deletion(spark, tmp_path):
    """The case signed folding can NEVER maintain: delete the row holding
    a key's MAX — the recompute MV must find the new max from the
    survivors, touching only the changed keys."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    exprs = {"v_min": "min(v)", "v_max": "max(v)"}
    commit_append(spark, src, _src_df(spark, 0, 40).coalesce(2), stats_cols=["id"])
    v = maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    assert v == 1
    assert {r.k: (r.v_min, r.v_max, r.n_rows)
            for r in read_snapshot(spark, agg).collect()} == _recompute_minmax(spark, src)
    assert maintain_recompute_aggregate(spark, src, agg, ["k"], exprs) is None

    # id=39 is k=4's max (v=78); id=35..38 removes the runners-up too
    delete_snapshot(spark, src, "id >= 35", stats_cols=["id"])
    update_snapshot(spark, src, "id = 2", {"v": "v - 1000"}, stats_cols=["id"])
    merge_snapshot(
        spark, src,
        spark.createDataFrame([(100, 0, 7)], "id long, k long, v long"),
        ["id"], stats_cols=["id"],
    )
    v = maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    assert v == max(_list_versions(spark, src))
    assert {r.k: (r.v_min, r.v_max, r.n_rows)
            for r in read_snapshot(spark, agg).collect()} == _recompute_minmax(spark, src)


def test_minmax_mv_key_retirement_and_null_key_rejection(spark, tmp_path):
    """Key 1 retires when its last row dies. A NULL group key must FAIL
    LOUDLY: SQL MERGE (Delta's too) never matches NULL keys, so a
    null-keyed aggregate row is unaddressable by maintenance — silent
    staleness is the failure mode the guard prevents."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    exprs = {"v_max": "max(v)"}
    df = spark.createDataFrame(
        [(0, 0, 10), (1, 0, 20), (2, 1, 30), (3, None, 40), (4, None, 5)],
        "id long, k long, v long",
    )
    commit_append(spark, src, df.coalesce(1), stats_cols=["id"])
    maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    got = {r.k: (r.v_max, r.n_rows) for r in read_snapshot(spark, agg).collect()}
    assert got == {0: (20, 2), 1: (30, 1), None: (40, 2)}  # bootstrap is a full agg
    # the incremental path refuses a feed touching the null group
    delete_snapshot(spark, src, "id = 2 OR id = 3", stats_cols=["id"])
    with pytest.raises(ValueError, match="NULL group key"):
        maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    # a non-null-key change still maintains (key 1 retires)
    src2 = str(tmp_path / "src2")
    agg2 = str(tmp_path / "agg2")
    commit_append(spark, src2, df.filter("k IS NOT NULL").coalesce(1), stats_cols=["id"])
    maintain_recompute_aggregate(spark, src2, agg2, ["k"], exprs)
    delete_snapshot(spark, src2, "id = 2", stats_cols=["id"])
    maintain_recompute_aggregate(spark, src2, agg2, ["k"], exprs)
    got = {r.k: (r.v_max, r.n_rows) for r in read_snapshot(spark, agg2).collect()}
    assert got == {0: (20, 2)}


def test_sum_mv_rejects_null_group_key(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    df = spark.createDataFrame(
        [(0, 0, 10), (1, None, 20)], "id long, k long, v long"
    )
    commit_append(spark, src, df.coalesce(1), stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])  # bootstrap: full agg ok
    delete_snapshot(spark, src, "id = 1", stats_cols=["id"])
    with pytest.raises(ValueError, match="NULL group key"):
        maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])


def test_minmax_mv_overwrite_resync(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    exprs = {"v_min": "min(v)", "v_max": "max(v)"}
    commit_append(spark, src, _src_df(spark, 0, 30).coalesce(1), stats_cols=["id"])
    maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    commit_overwrite(spark, src, _src_df(spark, 100, 115).coalesce(1), stats_cols=["id"])
    v = maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    assert v == max(_list_versions(spark, src))
    assert {r.k: (r.v_min, r.v_max, r.n_rows)
            for r in read_snapshot(spark, agg).collect()} == _recompute_minmax(spark, src)


def test_streaming_mv_follows_cdc_stream_exactly_once(spark, tmp_path):
    """End-to-end DLT shape: snapshot_log CDC stream → streaming
    incremental aggregate. Batch 0 bootstraps from the initial snapshot's
    insert rows; a second availableNow pass folds only the new DML
    commits; a replayed batch id is a no-op (the stamp lives in the
    aggregate's own log)."""
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )
    import customer_activity_lakehouse_spark.streaming.streams as S

    spark.dataSource.register(SnapshotLogDataSource)
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    commit_append(spark, src, _src_df(spark, 0, 20).coalesce(2), stats_cols=["id"])

    def run_pass():
        sdf = (
            spark.readStream.format("snapshot_log")
            .option("path", src)
            .option("mode", "cdc")
            .load()
        )
        q = S.write_stream_incremental_aggregate(sdf, agg, ["k"], ["v"], ck)
        q.awaitTermination(120)

    run_pass()
    assert _mv(spark, agg) == _recompute(spark, src)
    n_agg_v = len(_list_versions(spark, agg))

    # full DML surface on the source, then one more availableNow pass
    merge_snapshot(
        spark, src,
        spark.range(0, 4).selectExpr("id", "id % 5 AS k", "id * 100 AS v"),
        ["id"], stats_cols=["id"],
    )
    delete_snapshot(spark, src, "id >= 18", mode="dv", stats_cols=["id"])
    update_snapshot(spark, src, "id = 10", {"v": "v + 1"}, stats_cols=["id"])
    run_pass()
    assert _mv(spark, agg) == _recompute(spark, src)

    # REPLAY: re-deliver an already-committed batch id — must be a no-op
    captured = {}
    orig = S.write_stream_foreach_batch

    def capture(df, fn, *a, **kw):
        captured["fn"] = fn

        class _Done:
            def awaitTermination(self, *_):
                return True

        return _Done()

    S.write_stream_foreach_batch = capture
    try:
        S.write_stream_incremental_aggregate(
            spark.createDataFrame(
                [(999, 0, 1, "insert")], "id long, k long, v long, change_type string"
            ),
            agg, ["k"], ["v"], ck,
        )
    finally:
        S.write_stream_foreach_batch = orig
    replay_df = spark.createDataFrame(
        [(999, 0, 12345, "insert")], "id long, k long, v long, change_type string"
    )
    before = _mv(spark, agg)
    captured["fn"](replay_df, 0)  # batch 0 already stamped in the agg log
    assert _mv(spark, agg) == before
    assert len(_list_versions(spark, agg)) >= n_agg_v  # and no new data commit
    captured["fn"](replay_df, 777)  # a NEW batch id applies
    assert _mv(spark, agg)[0] == (before[0][0] + 12345, before[0][1] + 1)


def test_sum_mv_decimal_measure_stays_committed_type(spark, tmp_path):
    """Decimal measures: sum widening (dec(28,2)+dec(28,2) → dec(29,2))
    must not trip the merge's schema-drift gate — the absolute is pinned
    back to the bootstrap's committed type, and values stay exact."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    df = spark.range(0, 20).selectExpr(
        "id", "id % 5 AS k", "cast(id * 1.5 AS decimal(18,2)) AS v"
    )
    commit_append(spark, src, df.coalesce(1), stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    assert read_snapshot(spark, agg).schema["v"].dataType.simpleString() == "decimal(28,2)"
    delete_snapshot(spark, src, "id >= 15", stats_cols=["id"])
    update_snapshot(spark, src, "id = 0", {"v": "cast(v + 0.25 as decimal(18,2))"},
                    stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"])
    got = {r.k: (str(r.v), r.n_rows) for r in read_snapshot(spark, agg).collect()}
    want = {
        r.k: (str(r.v), r.n)
        for r in read_snapshot(spark, src).groupBy("k").agg(
            F.sum("v").alias("v"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert read_snapshot(spark, agg).schema["v"].dataType.simpleString() == "decimal(28,2)"


def test_mv_maintenance_reads_only_change_files(spark, tmp_path):
    """The 100 TB contract, gated on the actual scan: maintenance's feed
    read must touch ONLY the DML commits' change files — never the base
    table's data files. A regression here turns O(|changes|) maintenance
    into a table rescan."""
    src = str(tmp_path / "src")
    commit_append(spark, src, _src_df(spark, 0, 40).coalesce(4), stats_cols=["id"])
    base_files = set(read_snapshot(spark, src).inputFiles())
    merge_snapshot(
        spark, src,
        spark.range(0, 3).selectExpr("id", "id % 5 AS k", "id * 9 AS v"),
        ["id"], stats_cols=["id"],
    )
    delete_snapshot(spark, src, "id = 20", stats_cols=["id"])
    from customer_activity_lakehouse_spark.sources.snapshots import (
        snapshot_change_feed,
    )

    feed = snapshot_change_feed(spark, src, 1)
    feed_files = set(feed.inputFiles())
    assert feed_files, "feed read no files"
    assert not (feed_files & base_files), (
        "change feed scanned base data files: "
        f"{sorted(feed_files & base_files)}"
    )


def test_recompute_mv_engages_stats_pruning(spark, tmp_path, monkeypatch):
    """maintain_recompute_aggregate must pass the touched keys' [min,max]
    to read_snapshot's skip_where — the mechanism that bounds the partial
    recompute to the files containing touched keys."""
    import customer_activity_lakehouse_spark.sources.incremental as inc

    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    exprs = {"v_max": "max(v)"}
    # two range-disjoint files
    commit_append(spark, src, _src_df(spark, 0, 20).coalesce(1), stats_cols=["id"])
    commit_append(
        spark, src, _src_df(spark, 1000, 1020).coalesce(1), stats_cols=["id"]
    )
    maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    seen = {}
    real = inc.read_snapshot

    def spy(spark_, dir_, **kw):
        if dir_ == src and "skip_where" in kw:
            seen["skip_where"] = kw["skip_where"]
        return real(spark_, dir_, **kw)

    monkeypatch.setattr(inc, "read_snapshot", spy)
    delete_snapshot(spark, src, "id = 5", stats_cols=["id"])
    maintain_recompute_aggregate(spark, src, agg, ["k"], exprs)
    # k=0 is the only touched key (id=5 → k=0): bounds collapse to [0, 0]
    assert seen.get("skip_where") == ("k", 0, 0), seen
    got = {r.k: r.v_max for r in read_snapshot(spark, agg).collect()}
    assert got == {r.k: r.v_max for r in read_snapshot(spark, src)
                   .groupBy("k").agg(F.max("v").alias("v_max")).collect()}


def test_mv_over_static_dim_join(spark, tmp_path):
    """MV over a JOIN (DLT's fact-⋈-dim rollup): the transform joins each
    change row to a STATIC broadcast dim; signed folding then maintains
    per-segment totals through the full DML surface. Also checks the
    inner join's filtering effect (facts with no dim match never count)
    and the change_type-preservation guard."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    dim = spark.createDataFrame(
        [(0, "gold"), (1, "gold"), (2, "silver"), (3, "silver")],
        "k long, seg string",
    )  # k=4 intentionally unmapped

    def view(df):
        return df.join(F.broadcast(dim), "k")

    commit_append(spark, src, _src_df(spark, 0, 40).coalesce(2), stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["seg"], ["v"], transform=view)

    def recompute():
        return {
            r.seg: (r.v, r.n)
            for r in read_snapshot(spark, src).join(dim, "k")
            .groupBy("seg")
            .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
            .collect()
        }

    def mv():
        return {r.seg: (r.v, r.n_rows) for r in read_snapshot(spark, agg).collect()}

    assert mv() == recompute()
    merge_snapshot(
        spark, src,
        spark.range(0, 6).selectExpr("id", "id % 5 AS k", "id * 1000 AS v"),
        ["id"], stats_cols=["id"],
    )
    delete_snapshot(spark, src, "id >= 30", stats_cols=["id"])
    update_snapshot(spark, src, "id = 7", {"v": "v + 13"}, stats_cols=["id"])
    v = maintain_sum_aggregate(spark, src, agg, ["seg"], ["v"], transform=view)
    assert v == max(_list_versions(spark, src))
    assert mv() == recompute()

    # a transform that drops change_type is refused before any commit
    with pytest.raises(ValueError, match="change_type"):
        delete_snapshot(spark, src, "id = 8", stats_cols=["id"])
        maintain_sum_aggregate(
            spark, src, agg, ["seg"], ["v"],
            transform=lambda df: df.join(F.broadcast(dim), "k").select("seg", "v"),
        )


def test_mv_partitioned_aggregate_prunes_reads(spark, tmp_path):
    """An MV declared with partition_by lays its aggregate out hive-style:
    bootstrap honors it, every maintenance MERGE inherits the layout from
    the manifest, and a partition-scoped read of the MV lists only that
    partition's files — the dashboard-query shape the MV exists for."""
    from customer_activity_lakehouse_spark.sources.snapshots import _read_manifest

    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    commit_append(spark, src, _src_df(spark, 0, 40).coalesce(2), stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"], partition_by=["k"])
    m = _read_manifest(spark, agg, max(_list_versions(spark, agg)))
    assert m["partition_by"] == ["k"]
    delete_snapshot(spark, src, "id % 7 = 0", stats_cols=["id"])
    maintain_sum_aggregate(spark, src, agg, ["k"], ["v"], partition_by=["k"])
    assert _mv(spark, agg) == _recompute(spark, src)
    pruned = read_snapshot(spark, agg, partition_where={"k": 2})
    files = [f for f in pruned.inputFiles() if "-dv-" not in f]
    assert files and all("k=2" in f for f in files), files


def test_streaming_mv_with_dim_join_transform(spark, tmp_path):
    """Streaming MV over a JOIN: the CDC stream's change rows join a
    static broadcast dim inside the fold — per-segment totals follow the
    source through DML with no source rescan."""
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )
    import customer_activity_lakehouse_spark.streaming.streams as S

    spark.dataSource.register(SnapshotLogDataSource)
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    dim = spark.createDataFrame(
        [(0, "gold"), (1, "gold"), (2, "silver"), (3, "silver"), (4, "bronze")],
        "k long, seg string",
    )

    def view(df):
        return df.join(F.broadcast(dim), "k")

    commit_append(spark, src, _src_df(spark, 0, 30).coalesce(2), stats_cols=["id"])

    def run_pass():
        sdf = (
            spark.readStream.format("snapshot_log")
            .option("path", src)
            .option("mode", "cdc")
            .load()
        )
        q = S.write_stream_incremental_aggregate(
            sdf, agg, ["seg"], ["v"], ck, transform=view
        )
        q.awaitTermination(120)

    def recompute():
        return {
            r.seg: (r.v, r.n)
            for r in read_snapshot(spark, src).join(dim, "k")
            .groupBy("seg")
            .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
            .collect()
        }

    run_pass()
    assert {r.seg: (r.v, r.n_rows) for r in read_snapshot(spark, agg).collect()} \
        == recompute()
    delete_snapshot(spark, src, "id >= 25", mode="dv", stats_cols=["id"])
    update_snapshot(spark, src, "id = 1", {"v": "v + 100"}, stats_cols=["id"])
    run_pass()
    assert {r.seg: (r.v, r.n_rows) for r in read_snapshot(spark, agg).collect()} \
        == recompute()


def test_mv_rejects_unknown_change_type(spark):
    from customer_activity_lakehouse_spark.sources.incremental import _fold_feed

    feed = spark.createDataFrame(
        [(1, 10, "mutate", 3)], "k long, v long, change_type string, _commit_version int"
    )
    with pytest.raises(ValueError, match="mutate"):
        _fold_feed(feed, ["k"], ["v"], "test")


def test_cursor_survives_interleaved_nonstamping_commits(spark, tmp_path):
    """r9 regression: the consumed-version stamp rides only maintenance
    commits, so an interleaved commit to the AGGREGATE table (an
    OPTIMIZE, a bloom spec) used to reset the cursor to 0 and the next
    maintenance double-folded the whole feed. stamped_version walks the
    log instead."""
    from pyspark.sql import functions as F

    from customer_activity_lakehouse_spark.sources.incremental import (
        maintain_sum_aggregate,
        stamped_version,
    )
    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        read_snapshot,
        set_check_constraint,
    )

    src, agg = str(tmp_path / "src"), str(tmp_path / "agg")
    rows = spark.range(0, 100).selectExpr(
        "id % 5 AS k", "cast(id as decimal(18,2)) AS price"
    )
    commit_append(spark, src, rows.repartition(4))
    maintain_sum_aggregate(spark, src, agg, ["k"], ["price"])
    # a non-stamping commit lands on the AGGREGATE table
    set_check_constraint(spark, agg, "nonneg_rows", "n_rows >= 0")
    assert stamped_version(spark, agg, "mv_consumed_version") == 1
    # nothing new in the source → maintenance must be a no-op, not a
    # full re-fold of v1 (which would double every sum)
    assert maintain_sum_aggregate(spark, src, agg, ["k"], ["price"]) is None
    got = {
        (r.k, str(r.price)) for r in read_snapshot(spark, agg).collect()
    }
    want = {
        (r.k, str(r.price))
        for r in rows.groupBy("k")
        .agg(F.sum("price").alias("price"))
        .collect()
    }
    assert got == want
