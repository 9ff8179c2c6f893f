"""The snapshot_log Python Data Source (Spark 4 DataSource API): batch
reads with DV + column-mapping + time-travel fidelity, and the log as a
real Structured Streaming source with exactly-once version offsets."""

from __future__ import annotations

import pytest

from customer_activity_lakehouse_spark.sources.datasource import (
    SnapshotLogDataSource,
)
from customer_activity_lakehouse_spark.sources.snapshots import (
    commit_append,
    delete_snapshot,
    merge_snapshot,
    read_snapshot,
    rename_snapshot_column,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SnapshotLogDataSource)
    return spark


def test_batch_read_matches_read_snapshot(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    commit_append(
        spark, t, spark.range(0, 10).selectExpr("id", "id*2 AS v").coalesce(2)
    )
    commit_append(spark, t, spark.range(10, 15).selectExpr("id", "id*2 AS v"))
    delete_snapshot(spark, t, "id = 3", mode="dv")  # DV applied in-reader
    rename_snapshot_column(spark, t, "v", "val")  # mapping aliased in-reader

    df = spark.read.format("snapshot_log").option("path", t).load()
    assert df.columns == ["id", "val"]
    got = {r.id: r.val for r in df.collect()}
    want = {r.id: r.val for r in read_snapshot(spark, t).collect()}
    assert got == want and 3 not in got and len(got) == 14

    # time travel via option; pre-rename logical name
    v1 = spark.read.format("snapshot_log").option("path", t).option("version", "1")
    assert v1.load().columns == ["id", "v"]
    assert v1.load().count() == 10


def test_batch_read_evolved_schema_nulls(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    commit_append(spark, t, spark.range(0, 4).selectExpr("id"))
    commit_append(
        spark,
        t,
        spark.range(4, 6).selectExpr("id", "id*7 AS extra"),
        allow_schema_evolution=True,
    )
    df = spark.read.format("snapshot_log").option("path", t).load()
    rows = {r.id: r.extra for r in df.collect()}
    assert rows[0] is None and rows[5] == 35 and len(rows) == 6


def test_stream_source_exactly_once_offsets(registered, tmp_path):
    """availableNow run consumes the log; appends land; a restart from
    the same checkpoint delivers ONLY the delta (version offsets)."""
    spark = registered
    t = str(tmp_path / "tbl")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    commit_append(spark, t, spark.range(0, 5).selectExpr("id", "id*3 AS v"))
    sdf = spark.readStream.format("snapshot_log").option("path", t).load()

    def run():
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert {r.id for r in spark.read.parquet(sink).collect()} == set(range(5))
    commit_append(spark, t, spark.range(5, 9).selectExpr("id", "id*3 AS v"))
    run()
    # exactly-once: 0-4 not re-delivered, 5-8 delivered once
    ids = sorted(r.id for r in spark.read.parquet(sink).collect())
    assert ids == list(range(9))


def test_stream_source_refuses_dml_commits(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    commit_append(spark, t, spark.range(0, 5).selectExpr("id", "id*3 AS v"))
    merge_snapshot(
        spark, t, spark.createDataFrame([(0, 99)], "id long, v long"), keys=["id"]
    )
    sdf = spark.readStream.format("snapshot_log").option("path", t).load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only|STREAM"):
        q.awaitTermination(120)
        raise RuntimeError("stream should have failed on the merge commit")


def test_writer_append_bootstrap_and_chain(registered, tmp_path):
    """df.write.format('snapshot_log'): bootstrap, chained appends, and
    read-back parity through both the format and the JVM path."""
    spark = registered
    t = str(tmp_path / "tbl")
    spark.range(0, 10).selectExpr("id", "id*2 AS v").write.format(
        "snapshot_log"
    ).option("path", t).mode("append").save()
    spark.range(10, 15).selectExpr("id", "id*2 AS v").write.format(
        "snapshot_log"
    ).option("path", t).mode("append").save()
    assert read_snapshot(spark, t).count() == 15
    assert spark.read.format("snapshot_log").option("path", t).load().count() == 15
    # time travel sees the bootstrap commit alone
    assert read_snapshot(spark, t, version=1).count() == 10


def test_writer_respects_mapping_constraints_and_stats(registered, tmp_path):
    from customer_activity_lakehouse_spark.sources.snapshots import (
        set_check_constraint,
        snapshot_file_listing,
    )

    spark = registered
    t = str(tmp_path / "tbl")
    spark.range(0, 10).selectExpr("id", "id*2 AS v").write.format(
        "snapshot_log"
    ).option("path", t).option("stats_cols", "id").mode("append").save()
    rename_snapshot_column(spark, t, "v", "val")
    # append through the format AFTER the rename: staged physically
    spark.range(10, 13).selectExpr("id", "id*2 AS val").write.format(
        "snapshot_log"
    ).option("path", t).option("stats_cols", "id").mode("append").save()
    got = {r.id: r.val for r in read_snapshot(spark, t).collect()}
    assert got[11] == 22 and len(got) == 13
    # task-side stats feed skip_where
    fl = snapshot_file_listing(spark, t)
    assert fl.filter("col_stats['id'] IS NOT NULL").count() == fl.count()
    # constraints enforced task-side, write fails before any commit
    set_check_constraint(spark, t, "id_nonneg", "id >= 0")
    n_before = read_snapshot(spark, t).count()
    with pytest.raises(Exception, match="id_nonneg"):
        spark.range(1).selectExpr("-id - 1 AS id", "id AS val").write.format(
            "snapshot_log"
        ).option("path", t).mode("append").save()
    assert read_snapshot(spark, t).count() == n_before


def test_writer_overwrite_resets_and_schema_gate(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    spark.range(0, 5).selectExpr("id", "id*2 AS v").write.format(
        "snapshot_log"
    ).option("path", t).mode("append").save()
    # drifted append refused without the evolution option
    with pytest.raises(Exception, match="schema_evolution|drift"):
        spark.range(5, 6).selectExpr("id", "id*2 AS other").write.format(
            "snapshot_log"
        ).option("path", t).mode("append").save()
    spark.range(5, 8).selectExpr("id", "id*2 AS v", "id AS extra").write.format(
        "snapshot_log"
    ).option("path", t).option("schema_evolution", "true").mode("append").save()
    rows = {r.id: r.extra for r in read_snapshot(spark, t).collect()}
    assert rows[6] == 6 and rows[0] is None
    # overwrite replaces contents and schema; history retained
    spark.range(0, 3).selectExpr("id", "id AS fresh").write.format(
        "snapshot_log"
    ).option("path", t).mode("overwrite").save()
    cur = read_snapshot(spark, t)
    assert cur.columns == ["id", "fresh"] and cur.count() == 3
    assert read_snapshot(spark, t, version=1).count() == 5


def test_stream_cdc_mode_flows_through_dml(registered, tmp_path):
    """option('mode','cdc'): the stream delivers per-commit change rows
    (insert/update/delete + _commit_version) and keeps flowing through
    MERGE and DELETE where append-only mode must fail."""
    from customer_activity_lakehouse_spark.sources.snapshots import delete_snapshot

    spark = registered
    t = str(tmp_path / "tbl")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    commit_append(spark, t, spark.range(0, 5).selectExpr("id", "id*3 AS v"))
    sdf = (
        spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("mode", "cdc")
        .load()
    )

    def run():
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    first = spark.read.parquet(sink).collect()
    assert {r.change_type for r in first} == {"insert"}
    assert all(r._commit_version == 1 for r in first)

    merge_snapshot(
        spark, t,
        spark.createDataFrame([(0, 99), (7, 21)], "id long, v long"),
        keys=["id"],
    )
    delete_snapshot(spark, t, "id = 4")
    run()
    rows = spark.read.parquet(sink).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.change_type, []).append(r)
    # merge: id=0 matched (pre+post images — Delta CDF vocabulary),
    # id=7 inserted; delete: id=4 removed
    assert {r.id for r in by_type["update_preimage"]} == {0}
    assert {r.id for r in by_type["update_postimage"]} == {0}
    assert {r.id for r in by_type["insert"]} == set(range(5)) | {7}
    assert {r.id for r in by_type["delete"]} == {4}
    assert {r._commit_version for r in rows} == {1, 2, 3}


def test_py_try_commit_atomic_no_overwrite(tmp_path):
    """The writer's pure-python commit primitive: os.link arbitration —
    exactly one winner per version slot, loser's content never clobbers,
    across genuinely concurrent committers (no Spark involved)."""
    from concurrent.futures import ThreadPoolExecutor

    from customer_activity_lakehouse_spark.sources.datasource import (
        _py_manifest,
        _py_try_commit,
    )

    t = str(tmp_path / "tbl")
    assert _py_try_commit(t, 1, {"version": 1, "op": "append", "files": ["w0"]})
    assert not _py_try_commit(t, 1, {"version": 1, "op": "append", "files": ["w1"]})
    assert _py_manifest(t, 1)["files"] == ["w0"]  # winner intact

    # 16 racers per version slot, 10 slots: exactly one winner each
    def race(args):
        v, w = args
        return _py_try_commit(
            t, v, {"version": v, "op": "append", "files": [f"w{w}"]}
        )

    with ThreadPoolExecutor(max_workers=16) as ex:
        for v in range(2, 12):
            results = list(ex.map(race, [(v, w) for w in range(16)]))
            assert sum(results) == 1, f"v{v}: {results}"
            assert _py_manifest(t, v)["files"][0].startswith("w")
    # every committed manifest carries its timestamp stamp
    assert _py_manifest(t, 5)["committed_at"]


def test_lakehouse_loop_log_to_log_streaming(registered, tmp_path):
    """The full loop a lakehouse runs, end to end through Spark's own
    streaming machinery: snapshot table A --readStream(snapshot_log)-->
    stateful aggregation --write_stream_snapshot_append--> snapshot
    table B, with B's commits carrying the micro-batch id for replay
    dedup and B remaining time-travelable."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        snapshot_history,
    )

    spark = registered
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ck = str(tmp_path / "ck")
    commit_append(
        spark, a, spark.range(0, 20).selectExpr("id % 4 AS k", "id AS v")
    )
    commit_append(
        spark, a, spark.range(20, 40).selectExpr("id % 4 AS k", "id AS v")
    )
    src = spark.readStream.format("snapshot_log").option("path", a).load()
    agg = src.groupBy("k").count()
    # complete-mode aggregate → one snapshot commit per micro-batch
    query = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(
            lambda df, bid: commit_append(
                spark, b, df.withColumn("batch", df.k * 0 + bid)
            )
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    out = read_snapshot(spark, b)
    got = {r.k: r["count"] for r in out.collect()}
    assert got == {0: 10, 1: 10, 2: 10, 3: 10}
    assert snapshot_history(spark, b).count() >= 1


def test_batch_read_tag_option(registered, tmp_path):
    """option('tag', name) resolves through the refs prop carried in the
    raw commit record — pure-Python time travel by name (refs.py)."""
    from customer_activity_lakehouse_spark.sources.refs import set_tag

    spark = registered
    t = str(tmp_path / "t")
    commit_append(spark, t, spark.range(0, 6).selectExpr("id", "id * 2 AS v"))
    set_tag(spark, t, "pinned")
    commit_append(spark, t, spark.range(6, 20).selectExpr("id", "id * 2 AS v"))
    got = (
        spark.read.format("snapshot_log")
        .option("path", t)
        .option("tag", "pinned")
        .load()
    )
    assert got.count() == 6
    with pytest.raises(Exception, match="no tag"):
        spark.read.format("snapshot_log").option("path", t).option(
            "tag", "ghost"
        ).load().collect()


def test_writer_carries_refs_and_refuses_unique_keys(registered, tmp_path):
    """ADVICE r10: the pure-Python writer must CARRY the 'refs' property
    (a DataSource append/overwrite that drops it makes every tag vanish
    and lets the next vacuum expire the tagged versions' files) and must
    FAIL-LOUD on unique-key tables (it has no engine to probe the batch
    against the table)."""
    from customer_activity_lakehouse_spark.sources.refs import (
        read_tag,
        set_tag,
        tag_version,
    )
    from customer_activity_lakehouse_spark.sources.snapshots import (
        set_unique_key,
        vacuum,
    )

    spark = registered
    t = str(tmp_path / "tagged")
    commit_append(spark, t, spark.range(0, 6).selectExpr("id", "id*2 AS v"))
    set_tag(spark, t, "audit")  # pins v1
    # python-writer append must keep the tag alive...
    spark.range(6, 9).selectExpr("id", "id*2 AS v").write.format(
        "snapshot_log"
    ).option("path", t).mode("append").save()
    assert tag_version(spark, t, "audit") == 1
    # ...and so must a python-writer overwrite (Delta keeps metadata
    # across mode=overwrite)
    spark.range(0, 4).selectExpr("id", "id*2 AS v").write.format(
        "snapshot_log"
    ).option("path", t).mode("overwrite").save()
    assert tag_version(spark, t, "audit") == 1
    # the tagged version survives an aggressive vacuum and reads exactly
    vacuum(spark, t, keep_last=1)
    assert read_tag(spark, t, "audit").count() == 6

    t2 = str(tmp_path / "uniq")
    commit_append(spark, t2, spark.range(0, 5).selectExpr("id", "id*2 AS v"))
    set_unique_key(spark, t2, ["id"], name="pk")
    with pytest.raises(Exception, match="unique key"):
        spark.range(5, 8).selectExpr("id", "id*2 AS v").write.format(
            "snapshot_log"
        ).option("path", t2).mode("append").save()
    with pytest.raises(Exception, match="unique key"):
        spark.range(0, 3).selectExpr("id", "id*2 AS v").write.format(
            "snapshot_log"
        ).option("path", t2).mode("overwrite").save()
    assert read_snapshot(spark, t2).count() == 5  # nothing landed


def test_stream_source_survives_addonly_publish(registered, tmp_path):
    """A Structured Streaming consumer of a WAP table must not die when
    the audit publishes: an add-only publish_branch commit streams as
    inserts (its copied files), exactly like an append. A publish
    carrying branch-side deletes still refuses (append-only contract)."""
    from customer_activity_lakehouse_spark.sources.refs import (
        branch_dir,
        create_branch,
        publish_branch,
    )

    spark = registered
    t = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    commit_append(spark, t, spark.range(0, 4).selectExpr("id", "id*2 AS v"))
    create_branch(spark, t, "wip")
    commit_append(
        spark, branch_dir(t, "wip"),
        spark.range(4, 7).selectExpr("id", "id*2 AS v"),
    )
    commit_append(spark, t, spark.range(7, 9).selectExpr("id", "id*2 AS v"))
    publish_branch(spark, t, "wip")
    sdf = spark.readStream.format("snapshot_log").option("path", t).load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(9))  # base + parent append + published audit
