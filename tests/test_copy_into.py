"""COPY INTO: exactly-once file ingest — ledger idempotence, incremental
pickup, schemaful CSV, the compensating rollback, and a race."""

from __future__ import annotations

from pathlib import Path

from customer_activity_lakehouse_spark.sources.copy_into import (
    _rollback_copy,
    copy_into,
    loaded_sources,
)
from customer_activity_lakehouse_spark.sources.snapshots import read_snapshot


def _land(spark, d: Path, name: str, lo: int, hi: int) -> None:
    spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / name))


def test_copy_into_idempotent_and_incremental(spark, tmp_path):
    src = tmp_path / "landing"
    _land(spark, src, "a", 0, 10)
    _land(spark, src, "b", 10, 25)
    t = str(tmp_path / "tbl")
    r1 = copy_into(spark, t, str(src))
    assert r1["loaded_files"] == 2 and r1["version"] == 1
    assert read_snapshot(spark, t).count() == 25
    # re-run: ledger says everything is loaded
    r2 = copy_into(spark, t, str(src))
    assert r2 == {"loaded_files": 0, "version": None}
    assert read_snapshot(spark, t).count() == 25
    # a new landing file: only it loads
    _land(spark, src, "c", 25, 30)
    r3 = copy_into(spark, t, str(src))
    assert r3["loaded_files"] == 1
    assert read_snapshot(spark, t).count() == 30
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == list(range(30))


def test_copy_into_csv_with_schema(spark, tmp_path):
    src = tmp_path / "csvland"
    src.mkdir()
    (src / "one.csv").write_text("id,v\n1,x\n2,y\n")
    (src / "two.csv").write_text("id,v\n3,z\n")
    t = str(tmp_path / "tbl")
    r = copy_into(
        spark, t, str(src), fmt="csv", schema="id long, v string",
        options={"header": "true"},
    )
    assert r["loaded_files"] == 2
    assert {(x.id, x.v) for x in read_snapshot(spark, t).collect()} == {
        (1, "x"), (2, "y"), (3, "z"),
    }


def test_copy_rollback_supersedes_ledger(spark, tmp_path):
    src = tmp_path / "landing"
    _land(spark, src, "a", 0, 10)
    t = str(tmp_path / "tbl")
    v = copy_into(spark, t, str(src))["version"]
    assert len(loaded_sources(spark, t)) == 1
    _rollback_copy(spark, t, v)
    # rows gone, ledger superseded, re-copy loads again
    assert read_snapshot(spark, t).count() == 0
    assert loaded_sources(spark, t) == set()
    r = copy_into(spark, t, str(src))
    assert r["loaded_files"] == 1
    assert read_snapshot(spark, t).count() == 10


def test_copy_rollback_refuses_after_rewrite(spark, tmp_path):
    """Rollback drops the duplicate load BY FILE NAME — if a rewrite-class
    commit (OPTIMIZE/DML) folded the copy's files into new files first,
    the compensation would silently remove nothing; it must fail loudly."""
    import pytest

    from customer_activity_lakehouse_spark.sources.snapshots import (
        compact_snapshot,
    )

    src = tmp_path / "landing"
    _land(spark, src, "a", 0, 10)
    _land(spark, src, "b", 10, 30)
    t = str(tmp_path / "tbl")
    v = copy_into(spark, t, str(src))["version"]
    assert compact_snapshot(spark, t, target_file_mb=1) is not None
    with pytest.raises(RuntimeError, match="rewritten by a later commit"):
        _rollback_copy(spark, t, v)
    # nothing was dropped and the ledger still reflects the load
    assert read_snapshot(spark, t).count() == 30
    assert len(loaded_sources(spark, t)) == 2


def test_copy_into_concurrent_loaders_load_once(spark, tmp_path):
    import threading

    src = tmp_path / "landing"
    _land(spark, src, "a", 0, 10)
    _land(spark, src, "b", 10, 30)
    t = str(tmp_path / "tbl")
    errs = []

    def loader() -> None:
        try:
            copy_into(spark, t, str(src))
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    threads = [threading.Thread(target=loader) for _ in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    # whatever the interleaving, every source row exactly once
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == list(range(30))
    assert len(loaded_sources(spark, t)) == 2
