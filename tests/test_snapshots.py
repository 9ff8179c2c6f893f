"""Snapshot-log tests: time travel, overwrite isolation, optimistic
concurrency, crash-debris invisibility, and vacuum."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from customer_activity_lakehouse_spark.sources.snapshots import (
    commit_append,
    commit_overwrite,
    read_snapshot,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_time_travel_and_latest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = commit_append(spark, t, _df(spark, 0, 10))
    v2 = commit_append(spark, t, _df(spark, 10, 25))
    assert (v1, v2) == (1, 2)
    assert read_snapshot(spark, t).count() == 25  # latest
    assert read_snapshot(spark, t, version=1).count() == 10  # time travel
    assert sorted(r.id for r in read_snapshot(spark, t, 1).collect()) == list(range(10))


def test_overwrite_keeps_history_until_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 10))
    v2 = commit_overwrite(spark, t, _df(spark, 100, 103))
    assert v2 == 2
    assert read_snapshot(spark, t).count() == 3
    assert read_snapshot(spark, t, 1).count() == 10  # history intact
    deleted = vacuum(spark, t, keep_last=1)
    assert deleted > 0
    assert read_snapshot(spark, t).count() == 3  # latest untouched
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 1)  # expired


def test_append_retries_around_concurrent_commit(spark, tmp_path):
    """Simulate losing the version race: a competing manifest for the next
    version lands before our commit — append must retry at n+1."""
    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 5))
    # competitor claims v2 directly
    snap = Path(t) / "_snapshots"
    (snap / "v00002.json").write_text(json.dumps({"version": 2, "op": "append", "files": []}))
    v = commit_append(spark, t, _df(spark, 5, 8))
    assert v == 3
    assert read_snapshot(spark, t).count() == 3 + 0  # v3 = v2's files ([]) + batch
    # v1 is still complete
    assert read_snapshot(spark, t, 1).count() == 5


def test_overwrite_aborts_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """The race window: a competitor commits v2 AFTER the overwrite reads
    the log (simulated with a stale _list_versions) but before its rename —
    rename refuses the existing destination and the overwrite aborts."""
    import customer_activity_lakehouse_spark.sources.snapshots as S

    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 5))
    snap = Path(t) / "_snapshots"
    (snap / "v00002.json").write_text(json.dumps({"version": 2, "op": "append", "files": []}))
    monkeypatch.setattr(S, "_list_versions", lambda sp, td: [1])  # stale read
    with pytest.raises(RuntimeError, match="committed concurrently"):
        S.commit_overwrite(spark, t, _df(spark, 0, 1))
    monkeypatch.undo()
    assert read_snapshot(spark, t, 1).count() == 5  # v1 untouched by the abort


def test_uncommitted_data_is_invisible_and_vacuumed(spark, tmp_path):
    """A crashed commit leaves a data dir with no manifest: readers never
    see it (they read manifest file lists), vacuum removes it."""
    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 5))
    # orphan debris: data written, manifest never committed
    _df(spark, 90, 99).write.parquet(f"{t}/data/v99999-orphan")
    assert read_snapshot(spark, t).count() == 5
    vacuum(spark, t, keep_last=1)
    assert not Path(f"{t}/data/v99999-orphan").exists()
    assert read_snapshot(spark, t).count() == 5


def test_snapshot_changes_append_fast_path_reads_only_delta(spark, tmp_path):
    """Append-only CDC must read exactly the files added after v_from —
    no join, no base-table scan (the incremental-consumption contract)."""
    import io
    import contextlib

    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        snapshot_changes,
    )

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    delta = spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string")
    v1 = commit_append(spark, t, base)
    v2 = commit_append(spark, t, delta)
    ch = snapshot_changes(spark, t, v_from=v1, v_to=v2)
    rows = {(r.id, r.v, r.change_type) for r in ch.collect()}
    assert rows == {(3, "c", "insert"), (4, "d", "insert")}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ch.explain("simple")
    assert "Join" not in buf.getvalue()  # delta files only, never a diff join
    # empty range -> empty frame, correct schema
    assert snapshot_changes(spark, t, v_from=v2, v_to=v2).count() == 0


def test_snapshot_changes_overwrite_diff_classifies(spark, tmp_path):
    """Crossing an overwrite falls back to the keyed full-outer diff:
    insert/update/delete classification with new values (old for
    deletes), unchanged rows suppressed."""
    import pytest as _pytest

    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        commit_overwrite,
        snapshot_changes,
    )

    t = str(tmp_path / "t")
    v1 = commit_append(
        spark,
        t,
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string"),
    )
    v2 = commit_overwrite(
        spark,
        t,
        # 1 unchanged, 2 updated, 3 deleted, 4 inserted
        spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], "id long, v string"),
    )
    with _pytest.raises(ValueError, match="key_cols"):
        snapshot_changes(spark, t, v_from=v1, v_to=v2)
    ch = snapshot_changes(spark, t, v_from=v1, v_to=v2, key_cols=["id"])
    rows = {(r.id, r.v, r.change_type) for r in ch.collect()}
    assert rows == {(2, "B", "update"), (3, "c", "delete"), (4, "d", "insert")}


def test_cdc_driven_incremental_view_maintenance(spark, tmp_path):
    """End-to-end IVM over the snapshot log: a rollup maintained purely
    from snapshot_changes deltas (the append fast path — no base rescans)
    must equal a full recompute over the latest snapshot. Chains the two
    CDC/incremental primitives (snapshots.snapshot_changes →
    tables.merge_additive) the way a production refresh job would."""
    from pyspark.sql import functions as F

    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        read_snapshot,
        snapshot_changes,
    )
    from customer_activity_lakehouse_spark.sources.tables import (
        TableSpec,
        merge_additive,
        read_table,
    )

    base = str(tmp_path / "facts")
    b0 = spark.createDataFrame(
        [("2024-01-01", "click", 2.0), ("2024-01-01", "view", 1.0)],
        "dt string, typ string, v double",
    )
    b1 = spark.createDataFrame(
        [("2024-01-01", "click", 5.0), ("2024-01-02", "buy", 7.0)],
        "dt string, typ string, v double",
    )
    b2 = spark.createDataFrame(
        [("2024-01-02", "buy", 1.0), ("2024-01-02", "view", 4.0)],
        "dt string, typ string, v double",
    )
    v0 = commit_append(spark, base, b0)
    v1 = commit_append(spark, base, b1)
    v2 = commit_append(spark, base, b2)

    def rollup(df):
        return df.groupBy("dt", "typ").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    spec = TableSpec(str(tmp_path / "mv"), ("dt",))
    # initialize from v0, then refresh ONLY from CDC deltas
    merge_additive(spark, spec, rollup(read_snapshot(spark, base, version=v0)), keys=["dt", "typ"])
    for v_from, v_to in [(v0, v1), (v1, v2)]:
        delta = snapshot_changes(spark, base, v_from, v_to)
        assert delta.filter("change_type != 'insert'").count() == 0  # append fast path
        merge_additive(spark, spec, rollup(delta.drop("change_type")), keys=["dt", "typ"])

    got = {(r.dt, r.typ, r.n, r.total) for r in read_table(spark, spec).collect()}
    want = {
        (r.dt, r.typ, r.n, r.total)
        for r in rollup(read_snapshot(spark, base)).collect()
    }
    assert got == want


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    """Shallow clone: one manifest write, content-identical read, then
    copy-on-write divergence — appends at the clone land under the clone's
    dir and never touch the source; the clone's vacuum cannot delete
    source files; cloning into a non-empty destination refuses. The
    source-vacuum caveat (expiring the cloned version at the source breaks
    the clone) is pinned as documented behavior."""
    import pytest

    from customer_activity_lakehouse_spark.sources.snapshots import (
        clone_snapshot,
        commit_append,
        commit_overwrite,
        read_snapshot,
        vacuum,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df1 = spark.range(100).selectExpr("id", "id * 2 as v")
    commit_append(spark, src, df1)
    v = clone_snapshot(spark, src, dst)
    assert v == 1
    assert sorted(read_snapshot(spark, dst).collect()) == sorted(df1.collect())
    # zero-copy: the clone's own data dir does not exist yet
    import os

    assert not os.path.exists(f"{dst}/data")

    # divergence: append at the clone, source unchanged
    commit_append(spark, dst, spark.range(100, 150).selectExpr("id", "id * 2 as v"))
    assert read_snapshot(spark, dst).count() == 150
    assert read_snapshot(spark, src).count() == 100
    # clone vacuum never touches source files
    vacuum(spark, dst, keep_last=1)
    assert read_snapshot(spark, src).count() == 100

    with pytest.raises(FileExistsError):
        clone_snapshot(spark, src, dst)

    # the documented caveat: source vacuum does not know about clones
    commit_overwrite(spark, src, spark.range(5).selectExpr("id", "id as v"))
    vacuum(spark, src, keep_last=1)  # expires the cloned version's files
    with pytest.raises(Exception):
        read_snapshot(spark, dst).collect()


def test_consume_appends_at_least_once_cursor(spark, tmp_path):
    """Incremental consumption contract: each consume returns exactly the
    unseen appended rows; an unacknowledged delta is re-delivered
    (at-least-once); after advance_cursor the next consume is empty; an
    overwrite inside the unconsumed range fails instead of silently
    misreporting."""
    import pytest

    from customer_activity_lakehouse_spark.sources.snapshots import (
        advance_cursor,
        commit_append,
        commit_overwrite,
        consume_appends,
        cursor_position,
    )

    base = str(tmp_path / "t")
    cur = str(tmp_path / "cursor")
    commit_append(spark, base, spark.range(10).selectExpr("id"))
    d1, v1 = consume_appends(spark, base, cur)
    assert d1.count() == 10 and cursor_position(spark, cur) == 0
    # crash before ack: same delta re-delivered
    d1b, v1b = consume_appends(spark, base, cur)
    assert v1b == v1 and d1b.count() == 10
    advance_cursor(spark, cur, v1)
    assert cursor_position(spark, cur) == v1
    none_delta, v_same = consume_appends(spark, base, cur)
    assert none_delta is None and v_same == v1

    commit_append(spark, base, spark.range(10, 15).selectExpr("id"))
    commit_append(spark, base, spark.range(15, 18).selectExpr("id"))
    d2, v2 = consume_appends(spark, base, cur)
    assert sorted(r.id for r in d2.collect()) == list(range(10, 18))
    advance_cursor(spark, cur, v2)

    commit_overwrite(spark, base, spark.range(3).selectExpr("id"))
    with pytest.raises(Exception):
        consume_appends(spark, base, cur)


def test_restore_snapshot_rolls_back_preserving_history(spark, tmp_path):
    """RESTORE parity: rolling back commits a NEW version with the old
    file list — reads flip to the restored content, the bad version stays
    time-travelable, and vacuum after restore keeps the restored files
    (the latest manifest references them)."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        commit_overwrite,
        read_snapshot,
        restore_snapshot,
        vacuum,
    )

    base = str(tmp_path / "t")
    v1 = commit_append(spark, base, spark.range(10).selectExpr("id"))
    v2 = commit_overwrite(spark, base, spark.range(3).selectExpr("id"))  # the bad deploy
    assert read_snapshot(spark, base).count() == 3
    v3 = restore_snapshot(spark, base, v1)
    assert v3 == v2 + 1
    assert read_snapshot(spark, base).count() == 10
    assert read_snapshot(spark, base, version=v2).count() == 3  # history intact
    vacuum(spark, base, keep_last=1)
    assert read_snapshot(spark, base).count() == 10  # restored files survive


def test_append_schema_drift_gated(spark, tmp_path):
    """Schema contract on the log: a drifted append fails BEFORE writing
    (nothing new committed, table still reads), and with
    allow_schema_evolution=True the evolved signature is recorded and the
    table reads the union-by-name view."""
    import pytest

    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        read_snapshot,
    )

    base = str(tmp_path / "t")
    commit_append(spark, base, spark.createDataFrame([(1, "a")], "k long, v string"))
    drifted = spark.createDataFrame([(2, "b", 1.5)], "k long, v string, s double")
    with pytest.raises(ValueError, match="schema drift"):
        commit_append(spark, base, drifted)
    assert read_snapshot(spark, base).count() == 1  # nothing poisoned

    commit_append(spark, base, drifted, allow_schema_evolution=True)
    got = read_snapshot(spark, base)
    assert set(got.columns) == {"k", "v", "s"}
    rows = {r.k: (r.v, r.s) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 1.5)}


def test_concurrent_appends_all_land_exactly_once(spark, tmp_path):
    """Optimistic-concurrency stress: 6 threads racing commit_append on one
    table — every batch lands exactly once, versions are contiguous from 1,
    and the final read is the union of all batches (no lost updates, no
    duplicates) despite version races forcing retries."""
    import threading

    from customer_activity_lakehouse_spark.sources.snapshots import (
        _list_versions,
        commit_append,
        read_snapshot,
    )

    base = str(tmp_path / "race")
    n_writers = 6
    errs = []

    def writer(i: int) -> None:
        try:
            commit_append(
                spark, base, spark.range(i * 100, i * 100 + 10).selectExpr("id")
            )
        except Exception as e:  # surfaced after join
            errs.append((i, e))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    versions = _list_versions(spark, base)
    assert versions == list(range(1, n_writers + 1)), versions
    got = sorted(r.id for r in read_snapshot(spark, base).collect())
    want = sorted(x for i in range(n_writers) for x in range(i * 100, i * 100 + 10))
    assert got == want


def test_manifest_stats_data_skipping(spark, tmp_path):
    """Delta-style data skipping from manifest stats: commits record
    per-file [min,max]; a skip_where read drops files whose range cannot
    intersect BEFORE Spark lists them (verified via inputFiles), returns
    exactly the matching rows after the real predicate, never skips
    stat-less files, and an impossible range reads empty with the
    table's schema."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        read_snapshot,
    )

    base = str(tmp_path / "t")
    for lo in (0, 1000, 2000):
        commit_append(
            spark,
            base,
            spark.range(lo, lo + 100).selectExpr("id", "id * 2 as v").coalesce(1),
            stats_cols=["id"],
        )
    full = read_snapshot(spark, base)
    assert len(full.inputFiles()) == 3

    pruned = read_snapshot(spark, base, skip_where=("id", 1010, 1020))
    assert len(pruned.inputFiles()) == 1, pruned.inputFiles()
    got = sorted(r.id for r in pruned.filter("id between 1010 and 1020").collect())
    assert got == list(range(1010, 1021))

    # open bounds prune one side only
    assert len(read_snapshot(spark, base, skip_where=("id", 2000, None)).inputFiles()) == 1
    assert len(read_snapshot(spark, base, skip_where=("id", None, 999)).inputFiles()) == 1

    # impossible range: empty frame, schema preserved
    empty = read_snapshot(spark, base, skip_where=("id", 5000, 6000))
    assert empty.count() == 0 and set(empty.columns) == {"id", "v"}

    # a column with no recorded stats never skips
    assert len(read_snapshot(spark, base, skip_where=("v", 0, 1)).inputFiles()) == 3
