"""Segmented commit-log tests (VERDICT r7 #1/#3): O(batch) commit
records, checkpoint-bounded resolution, 100-commit time travel / CDF /
vacuum, and the unified mixed-primitive commit race."""

from __future__ import annotations

import json
import threading
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from customer_activity_lakehouse_spark.sources import commitlog
from customer_activity_lakehouse_spark.sources.snapshots import (
    commit_append,
    commit_overwrite,
    read_snapshot,
    snapshot_change_feed,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


# ---------------------------------------------------------------- pure log


def _manifest(files, stats=None, dvs=None, **meta):
    m = {"version": 9, "op": "append", "files": list(files), **meta}
    if stats:
        m["stats"] = stats
    if dvs:
        m["dv_files"] = dvs
    return m


def test_make_commit_first_is_self_contained():
    m = _manifest(["a", "b"])
    assert commitlog.make_commit(None, m) is m


def test_make_commit_encodes_o_delta_and_round_trips():
    prev = _manifest(["a", "b"], stats={"a": {"id": [0, 9]}, "b": {"id": [10, 19]}})
    cur = _manifest(
        ["a", "c"],
        stats={"a": {"id": [0, 9]}, "c": {"id": [20, 29]}},
        dvs=["dv1"],
        schema=[["id", "bigint"]],
    )
    rec = commitlog.make_commit(prev, cur)
    assert "files" not in rec and rec["schema"] == [["id", "bigint"]]
    d = rec["delta"]
    assert d["add"] == ["c"] and d["remove"] == ["b"]
    assert d["stats_add"] == {"c": {"id": [20, 29]}}
    assert d["dv_add"] == ["dv1"]
    files, stats, dvs = commitlog.apply_commit(
        commitlog.apply_commit(None, prev), rec
    )
    assert (files, stats, dvs) == (cur["files"], cur["stats"], ["dv1"])


def test_make_commit_truncate_on_disjoint_rewrite():
    prev = _manifest([f"f{i}" for i in range(500)])
    cur = _manifest(["g1", "g2"])
    rec = commitlog.make_commit(prev, cur)
    d = rec["delta"]
    # overwrite-class: O(new), no O(old) remove list
    assert d.get("truncate") is True and d["add"] == ["g1", "g2"]
    assert "remove" not in d
    assert commitlog.apply_commit(commitlog.apply_commit(None, prev), rec)[0] == [
        "g1",
        "g2",
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sets(st.integers(0, 30), max_size=12),  # live file ids
            st.booleans(),  # drop stats for even files
        ),
        min_size=1,
        max_size=8,
    )
)
def test_commit_chain_round_trips(steps):
    """Any sequence of manifests replays exactly through the encoded
    delta chain: resolve(make_commit chain) == the original manifests."""
    prev = None
    state = None
    for ids, drop_even in steps:
        files = sorted(f"f{i}" for i in ids)
        stats = {
            f: {"id": [i, i + 1]}
            for i, f in enumerate(files)
            if not (drop_even and i % 2 == 0)
        }
        cur = _manifest(files, stats=stats or None)
        rec = commitlog.make_commit(prev, cur)
        state = commitlog.apply_commit(state, rec)
        view = commitlog.resolved_view(rec, state)
        # the file list is a SET contract (readers union/diff, never index)
        assert sorted(view["files"]) == files
        assert len(set(view["files"])) == len(view["files"])
        assert view.get("stats", {}) == stats
        prev = cur


def test_resolve_uses_checkpoint_and_survives_torn_pointer(tmp_path):
    snap = tmp_path / "_snapshots"
    snap.mkdir()
    # v1 self-contained, v2..v12 deltas, ckpt at v10
    m = _manifest(["f1"])
    (snap / commitlog.commit_name(1)).write_text(json.dumps(m))
    prev = m
    for v in range(2, 13):
        cur = _manifest(prev["files"] + [f"f{v}"])
        (snap / commitlog.commit_name(v)).write_text(
            json.dumps(commitlog.make_commit(prev, cur))
        )
        if v == 10:
            commitlog.write_ckpt_local(str(snap), 10, cur)
        prev = cur

    def read_commit(v):
        return json.loads((snap / commitlog.commit_name(v)).read_text())

    has_ckpt, read_ckpt = commitlog.ckpt_prober(str(snap))
    out = commitlog.resolve(12, read_commit, has_ckpt, read_ckpt)
    assert out["files"] == [f"f{v}" for v in range(1, 13)]
    # time travel BELOW the checkpoint still resolves from raw commits
    assert commitlog.resolve(5, read_commit, has_ckpt, read_ckpt)["files"] == [
        f"f{v}" for v in range(1, 6)
    ]
    # torn/corrupt pointer is advisory only
    (snap / commitlog.LAST_CKPT).write_text("{garbage")
    assert commitlog.read_last_ckpt_pointer(str(snap)) is None
    out2 = commitlog.resolve(12, read_commit, has_ckpt, read_ckpt)
    assert out2["files"] == out["files"]


# ----------------------------------------------------- end-to-end (Spark)


def test_100_commit_table_o_batch_records(spark, tmp_path):
    """The verdict's acceptance test: manifest bytes per append stay
    O(batch) across 100 commits — while the table still time-travels to
    v1, CDC-feeds the whole range, and vacuums correctly."""
    t = str(tmp_path / "tbl")
    for i in range(100):
        commit_append(
            spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1), stats_cols=["id"]
        )
    snap = Path(t) / "_snapshots"
    sizes = {
        int(p.name[1:6]): p.stat().st_size for p in snap.glob("v*.json")
    }
    assert len(sizes) == 100
    # delta records don't grow with table size: every late commit stays
    # within 2x of an early delta commit (each adds the same 1-file batch)
    assert sizes[99] < 2 * sizes[3], sizes
    assert sizes[95] < 2 * sizes[3], sizes
    # checkpoints exist every CKPT_EVERY commits and DO carry the growth
    ckpts = sorted(int(p.name[6:11]) for p in snap.glob("ckpt-v*.parquet"))
    assert ckpts == list(range(10, 101, 10))
    assert commitlog.read_last_ckpt_pointer(str(snap)) == 100
    # full correctness across the log: latest, time travel, stats pruning
    assert read_snapshot(spark, t).count() == 1000
    assert read_snapshot(spark, t, version=1).count() == 10
    assert read_snapshot(spark, t, version=57).count() == 570
    assert (
        len(read_snapshot(spark, t, skip_where=("id", 0, 5)).inputFiles()) == 1
    )
    # CDF across the whole range after v1
    feed = snapshot_change_feed(spark, t, 1, 100)
    assert feed.count() == 990
    assert feed.select("change_type").distinct().collect()[0][0] == "insert"
    # vacuum expires the head; a checkpoint is materialized at the oldest
    # retained version so the surviving delta chain still resolves
    vacuum(spark, t, keep_last=7)
    assert read_snapshot(spark, t).count() == 1000
    assert read_snapshot(spark, t, version=94).count() == 940
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=93)


def test_overwrite_in_log_is_o_new_and_history_replays(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        commit_append(spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1))
    commit_overwrite(spark, t, _df(spark, 500, 503).coalesce(1))
    raw = json.loads((Path(t) / "_snapshots" / "v00005.json").read_text())
    assert raw["delta"].get("truncate") is True and "remove" not in raw["delta"]
    assert read_snapshot(spark, t).count() == 3
    assert read_snapshot(spark, t, version=4).count() == 40
    commit_append(spark, t, _df(spark, 600, 610).coalesce(1))
    assert read_snapshot(spark, t).count() == 13


def test_pre_r8_full_manifests_read_unchanged(spark, tmp_path):
    """Old-format logs (every commit self-contained) resolve verbatim —
    simulate by rewriting each raw record as its resolved view."""
    from customer_activity_lakehouse_spark.sources.snapshots import _read_manifest

    t = str(tmp_path / "tbl")
    for i in range(5):
        commit_append(spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1))
    snap = Path(t) / "_snapshots"
    resolved = {v: _read_manifest(spark, t, v) for v in range(1, 6)}
    for p in snap.glob("*"):
        p.unlink()
    for v, m in resolved.items():
        (snap / commitlog.commit_name(v)).write_text(json.dumps(m))
    assert read_snapshot(spark, t).count() == 50
    assert read_snapshot(spark, t, version=2).count() == 20
    # and new delta commits append on top of the legacy log seamlessly
    commit_append(spark, t, _df(spark, 100, 105).coalesce(1))
    raw = json.loads((snap / "v00006.json").read_text())
    assert "delta" in raw and "files" not in raw
    assert read_snapshot(spark, t).count() == 55


def test_mixed_primitive_commit_race(spark, tmp_path):
    """VERDICT r7 #3 acceptance: the JVM-path _try_commit and the
    DataSource's _py_try_commit race the SAME version slots from 16
    threads x 10 slots — exactly one winner per slot, every loser told so,
    and the winner's content is intact (no clobber)."""
    from customer_activity_lakehouse_spark.sources import datasource as DS
    from customer_activity_lakehouse_spark.sources import snapshots as S

    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 5).coalesce(1))
    prev = S._read_manifest(spark, t, 1)
    wins: dict[int, list[str]] = {v: [] for v in range(2, 12)}
    lock = threading.Lock()
    # Per-slot barrier: without it a single fast thread stays one slot
    # ahead of the pack and sweeps every version uncontended (observed as
    # a one-engine-sweep flake); with it all 16 threads hit each slot's
    # arbiter simultaneously — the race the test exists to exercise.
    barrier = threading.Barrier(16, timeout=60)

    def contend(tag: str, use_jvm: bool):
        for v in range(2, 12):
            barrier.wait()
            m = {"version": v, "op": "append", "files": prev["files"], "writer": tag}
            won = (
                S._try_commit(spark, t, v, dict(m), prev=prev)
                if use_jvm
                else DS._py_try_commit(t, v, dict(m), prev=prev)
            )
            if won:
                with lock:
                    wins[v].append(tag)

    threads = [
        threading.Thread(target=contend, args=(f"w{i}", i % 2 == 0))
        for i in range(16)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert all(len(w) == 1 for w in wins.values()), wins
    for v in range(2, 12):
        raw = json.loads(
            (Path(t) / "_snapshots" / commitlog.commit_name(v)).read_text()
        )
        assert raw["writer"] == wins[v][0]  # winner's bytes, uncorrupted
    # Both PARITY CLASSES (JVM-path threads = even tags, DataSource-path
    # = odd) won at least once across the 10 barrier-synchronized slots.
    # Probabilistic, but with the barrier each slot's winner is an
    # effectively uniform draw over 16 threads (8 per class):
    # P(one class sweeps) ≈ 2·(1/2)^10 ≈ 0.2%.
    classes = {int(w[1:]) % 2 for ws in wins.values() for w in ws}
    assert classes == {0, 1}, wins


# ------------------------------------------------------- protocol features


def test_features_stamped_from_manifest_content(spark, tmp_path):
    """DV deletes, partition columns, CHECK constraints: each stamps the
    matching reader/writer feature on its commit; plain appends stamp
    none. Delta's table-features contract (PROTOCOL.md is the model),
    derived per version from the manifest's own keys."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        delete_snapshot,
        set_check_constraint,
    )

    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 10).coalesce(1))
    m1 = _read_manifest(spark, t, 1)
    assert "reader_features" not in m1 and "writer_features" not in m1

    delete_snapshot(spark, t, "id < 2", mode="dv")
    m2 = _read_manifest(spark, t, 2)
    assert "deletion-vectors" in m2["reader_features"]
    assert "deletion-vectors" in m2["writer_features"]

    set_check_constraint(spark, t, "v_even", "v % 2 = 0")
    m3 = _read_manifest(spark, t, 3)
    assert "check-constraints" in m3["writer_features"]
    # constraints are writer-only: readers need not know them
    assert "check-constraints" not in (m3.get("reader_features") or [])

    t2 = str(tmp_path / "part")
    commit_append(
        spark,
        t2,
        _df(spark, 0, 10).selectExpr("id", "v", "id % 2 AS p").coalesce(1),
        partition_by=["p"],
    )
    mp = _read_manifest(spark, t2, 1)
    assert "partition-columns" in mp["reader_features"]


def test_unknown_reader_feature_fails_loudly_everywhere(spark, tmp_path):
    """A manifest demanding a feature this engine lacks must refuse to
    resolve — via the JVM read path AND the Python DataSource path (both
    share commitlog.resolve) — never silently mis-read."""
    import pytest as _pytest

    from customer_activity_lakehouse_spark.sources import datasource as DS

    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 10).coalesce(1))
    raw = json.loads((Path(t) / "_snapshots" / commitlog.commit_name(1)).read_text())
    raw["reader_features"] = ["v9-quantum-clustering"]
    (Path(t) / "_snapshots" / commitlog.commit_name(1)).unlink()
    (Path(t) / "_snapshots" / commitlog.commit_name(1)).write_text(json.dumps(raw))

    with _pytest.raises(commitlog.UnsupportedTableFeature, match="quantum"):
        read_snapshot(spark, t)
    with _pytest.raises(commitlog.UnsupportedTableFeature, match="quantum"):
        DS._py_manifest(t, 1)


def test_unknown_writer_feature_blocks_commit_not_read(spark, tmp_path):
    """Writer-only features gate COMMITS (an engine that can't maintain
    the invariant must not write) while reads stay open."""
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 10).coalesce(1))
    p = Path(t) / "_snapshots" / commitlog.commit_name(1)
    raw = json.loads(p.read_text())
    raw["writer_features"] = ["append-only-enforcement"]
    p.unlink()
    p.write_text(json.dumps(raw))

    assert read_snapshot(spark, t).count() == 10  # reads unaffected
    with _pytest.raises(commitlog.UnsupportedTableFeature, match="append-only"):
        commit_append(spark, t, _df(spark, 10, 20).coalesce(1))


def test_features_survive_delta_encoding_and_checkpoints(spark, tmp_path):
    """The stamp must ride delta records and checkpoints: after 12 more
    appends (crossing a checkpoint boundary) a DV table still declares
    deletion-vectors at the latest version."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _list_versions,
        _read_manifest,
        delete_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_append(spark, t, _df(spark, 0, 10).coalesce(1))
    delete_snapshot(spark, t, "id < 2", mode="dv")
    for i in range(12):
        commit_append(spark, t, _df(spark, 100 + i, 101 + i).coalesce(1))
    v = max(_list_versions(spark, t))
    assert v >= 13
    m = _read_manifest(spark, t, v)
    assert "deletion-vectors" in m["reader_features"]
    assert read_snapshot(spark, t).count() == 8 + 12


def test_identity_and_unique_stamp_writer_features(spark, tmp_path):
    """Identity allocation and unique-key probing are write-path
    invariants: an engine that doesn't implement them would mint
    duplicate ids / land colliding keys without any read error — so
    declaring either stamps the writer feature, and a writer missing it
    refuses."""
    import customer_activity_lakehouse_spark.sources.snapshots as S
    from customer_activity_lakehouse_spark.sources import commitlog

    t = str(tmp_path / "tbl")
    S.commit_append(
        spark, t, spark.createDataFrame([(1, 0)], "rid long, v long")
    )
    S.set_identity_column(spark, t, "rid")
    S.set_unique_key(spark, t, ["v"])
    m = S._read_commit(spark, t, S._list_versions(spark, t)[-1])
    assert "identity-columns" in m["writer_features"]
    assert "unique-keys" in m["writer_features"]
    # neither is reader-relevant: old readers still read the rows fine
    assert "identity-columns" not in (m.get("reader_features") or [])
    with pytest.raises(commitlog.UnsupportedTableFeature):
        commitlog.check_writer_features(
            {"writer_features": ["identity-columns", "not-a-real-feature"]}
        )


# ---------------------------------------------------------------------------
# Parquet checkpoints (r9): columnar, typed, prunable table metadata
# ---------------------------------------------------------------------------


def test_ckpt_encode_decode_exact_round_trip():
    """The parquet checkpoint must round-trip a manifest EXACTLY — key
    presence, empty-vs-absent stats dicts, int-vs-float, None bounds,
    engine scalars, dv files — because make_commit diffs stats dicts by
    equality against the checkpoint-resolved previous manifest."""
    m = {
        "version": 40,
        "op": "append",
        "schema": [["id", "bigint"], ["v", "double"]],
        "colmap": {"id": "id", "v": "v"},
        "constraints": {"pos": "id >= 0"},
        "files": ["/t/data/a.parquet", "/t/data/b.parquet", "/t/data/c.parquet"],
        "stats": {
            "/t/data/a.parquet": {
                "id": [0, 9],
                "v": [0.5, 2.25],
                "__rows": 10,
                "__base_row_id": 0,
                "__bloom": "/t/_bloom/a.bin",
            },
            "/t/data/b.parquet": {"id": [None, None], "name": ["a", "zz"]},
            "/t/data/c.parquet": {},
        },
        "dv_files": ["/t/data/x-dv-1.parquet"],
        "reader_features": ["deletion-vectors"],
    }
    out = commitlog.decode_ckpt(commitlog.encode_ckpt(m))
    assert out == m
    # int-vs-float exactness survives (pyarrow inference would make 7 a
    # double next to 2.5 — the encoder must fall back to JSON instead)
    weird = {
        "version": 10,
        "op": "append",
        "files": ["f1", "f2"],
        "stats": {"f1": {"c": [7, 9]}, "f2": {"c": [2.5, 3.5]}},
    }
    rt = commitlog.decode_ckpt(commitlog.encode_ckpt(weird))
    assert rt == weird
    assert isinstance(rt["stats"]["f1"]["c"][0], int)
    assert isinstance(rt["stats"]["f2"]["c"][0], float)


def test_ckpt_pruned_decode_reads_only_probed_columns():
    m = {
        "version": 10,
        "op": "append",
        "files": ["f1", "f2"],
        "stats": {
            "f1": {"a": [0, 1], "b": ["x", "y"], "__rows": 5},
            "f2": {"a": [2, 3], "b": ["p", "q"], "__rows": 7},
        },
    }
    data = commitlog.encode_ckpt(m)
    pruned = commitlog.decode_ckpt(data, stat_keys={"a"})
    assert pruned["files"] == ["f1", "f2"]
    assert pruned["stats"] == {"f1": {"a": [0, 1]}, "f2": {"a": [2, 3]}}
    # everything else (op, schema-free meta) still rides the footer
    assert pruned["op"] == "append" and pruned["version"] == 10


def test_cold_read_resolves_from_parquet_checkpoint(spark, tmp_path):
    """The r8 verdict's acceptance: a cold read of a long table resolves
    from the parquet checkpoint — proven by DELETING every commit record
    at or below the last checkpoint; only the checkpoint plus the <10
    trailing deltas remain, and reads (latest + skip_where pruning) still
    work. A standalone pyarrow open of the same file must also work (the
    pure-Python DataSource reader path has no JVM)."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    for i in range(23):
        commit_append(
            spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1), stats_cols=["id"]
        )
    snap = Path(t) / "_snapshots"
    assert commitlog.read_last_ckpt_pointer(str(snap)) == 20
    for v in range(1, 21):
        (snap / commitlog.commit_name(v)).unlink()
    (snap / commitlog.ckpt_name(10)).unlink()
    assert read_snapshot(spark, t).count() == 230
    assert len(read_snapshot(spark, t, skip_where=("id", 0, 5)).inputFiles()) == 1
    # plain pyarrow reads the checkpoint file directly — typed columns
    pf = pq.ParquetFile(str(snap / commitlog.ckpt_name(20)))
    names = pf.schema_arrow.names
    assert names[:3] == ["path", "kind", "has_stats"]
    assert pf.metadata.num_rows == 20
    direct = commitlog.read_ckpt_path(str(snap / commitlog.ckpt_name(20)))
    assert len(direct["files"]) == 20 and direct["version"] == 20


def test_legacy_json_checkpoints_still_read(spark, tmp_path):
    """r8 tables carry ckpt-v*.json — resolution must keep reading them."""
    t = str(tmp_path / "tbl")
    for i in range(12):
        commit_append(spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1))
    snap = Path(t) / "_snapshots"
    from customer_activity_lakehouse_spark.sources.snapshots import _read_manifest

    resolved = _read_manifest(spark, t, 10)
    (snap / commitlog.ckpt_name(10)).unlink()
    (snap / commitlog.ckpt_name_legacy(10)).write_text(json.dumps(resolved))
    for v in range(1, 10):
        (snap / commitlog.commit_name(v)).unlink()
    assert read_snapshot(spark, t).count() == 120
    assert read_snapshot(spark, t, version=10).count() == 100


def test_datasource_python_reader_resolves_parquet_ckpt(spark, tmp_path):
    """The Spark 4 Python DataSource reader (driver-side Python, no JVM
    manifest path) must resolve through the parquet checkpoint too."""
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )

    spark.dataSource.register(SnapshotLogDataSource)
    t = str(tmp_path / "tbl")
    for i in range(12):
        commit_append(spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1))
    snap = Path(t) / "_snapshots"
    for v in range(1, 11):
        (snap / commitlog.commit_name(v)).unlink()
    df = spark.read.format("snapshot_log").option("path", t).load()
    assert df.count() == 120


def test_snapshot_files_scan_distributed_and_pruned(spark, tmp_path):
    """snapshot_files_scan: the file-level state as a spark.read.parquet
    scan over the checkpoint + one delta patch — distributed metadata
    planning with column pruning (unselected stat columns never leave the
    checkpoint file)."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        delete_snapshot,
        snapshot_files_scan,
    )

    t = str(tmp_path / "tbl")
    for i in range(23):
        commit_append(
            spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1), stats_cols=["id"]
        )
    delete_snapshot(spark, t, "id < 3", mode="dv")  # v24: dv_add delta
    scan = snapshot_files_scan(spark, t)
    m = _read_manifest(spark, t, 24)
    got_data = {r.path for r in scan.filter("kind = 'data'").collect()}
    assert got_data == set(m["files"])
    got_dv = {r.path for r in scan.filter("kind = 'dv'").collect()}
    assert got_dv == set(m.get("dv_files", []))
    # stat columns carry the recorded skipping stats (typed lo/hi)
    row = (
        scan.filter("kind = 'data'")
        .selectExpr("min(`stat:id`.lo) AS lo", "max(`stat:id`.hi) AS hi",
                    "sum(`stat:__rows`.v) AS rows")
        .collect()[0]
    )
    assert (row.lo, row.hi, row.rows) == (0, 229, 230)
    # column pruning: a path+one-stat projection never reads the other
    # stat columns (has_stats / __rows stay out of the scan's ReadSchema)
    plan = (
        scan.select("path", "`stat:id`")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "has_stats" not in plan
    # time travel: the scan at an old version patches from the right base
    old = snapshot_files_scan(spark, t, version=13)
    assert old.filter("kind = 'data'").count() == 13


def test_corrupt_checkpoint_degrades_to_chain_walk(spark, tmp_path):
    """Checkpoints are an acceleration, not the source of truth: a torn/
    corrupt checkpoint (crashed non-local writer) must degrade to walking
    the delta chain, never brick resolution — but a resolution that
    NEEDS the checkpoint (chain vacuumed away) still fails loudly."""
    t = str(tmp_path / "tbl")
    for i in range(23):
        commit_append(
            spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1), stats_cols=["id"]
        )
    snap = Path(t) / "_snapshots"
    (snap / commitlog.ckpt_name(20)).write_bytes(b"PAR1 torn garbage")
    assert read_snapshot(spark, t).count() == 230
    assert len(read_snapshot(spark, t, skip_where=("id", 0, 5)).inputFiles()) == 1
    # both checkpoints corrupt: the full chain from self-contained v1
    (snap / commitlog.ckpt_name(10)).write_bytes(b"")
    assert read_snapshot(spark, t, version=22).count() == 220
    # the pure-Python DataSource reader degrades identically
    from customer_activity_lakehouse_spark.sources.datasource import (
        SnapshotLogDataSource,
    )

    spark.dataSource.register(SnapshotLogDataSource)
    assert (
        spark.read.format("snapshot_log").option("path", t).load().count() == 230
    )
    # chain vacuumed, checkpoint corrupt -> loud failure, not silence
    for v in range(1, 21):
        (snap / commitlog.commit_name(v)).unlink()
    with pytest.raises(Exception):
        read_snapshot(spark, t, version=23).count()

def test_files_scan_legacy_ckpt_vacuumed_chain(spark, tmp_path, monkeypatch):
    """Regression (ADVICE r9): snapshot_files_scan's chain walk only probes
    PARQUET checkpoints — on a pre-upgrade table whose resolution base is a
    legacy JSON checkpoint with the chain below it vacuumed, the walk must
    break to the scratch-encode fallback (which resolves through
    _read_manifest), not die on the missing commit record. Also pins the
    scratch-parquet leak fix: every mkstemp path is atexit-registered."""
    from customer_activity_lakehouse_spark.sources import snapshots
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        snapshot_files_scan,
    )

    registered: list = []
    real_register = snapshots.atexit.register

    class _FakeAtexit:
        @staticmethod
        def register(fn, *a):
            registered.append(a[0] if a else None)
            return real_register(fn, *a)

    monkeypatch.setattr(snapshots, "atexit", _FakeAtexit)

    t = str(tmp_path / "tbl")
    for i in range(12):
        commit_append(spark, t, _df(spark, i * 10, i * 10 + 10).coalesce(1))
    snap = Path(t) / "_snapshots"
    resolved = _read_manifest(spark, t, 10)
    (snap / commitlog.ckpt_name(10)).unlink()
    (snap / commitlog.ckpt_name_legacy(10)).write_text(json.dumps(resolved))
    for v in range(1, 10):
        (snap / commitlog.commit_name(v)).unlink()
    scan = snapshot_files_scan(spark, t)
    assert scan.filter("kind = 'data'").count() == 12
    assert {r.path for r in scan.collect()} == set(
        _read_manifest(spark, t, 12)["files"]
    )
    # the scratch checkpoint encode was registered for exit cleanup
    assert any(str(p).endswith(".ckpt.parquet") for p in registered)
