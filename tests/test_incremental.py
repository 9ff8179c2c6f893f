"""Incremental materialized aggregate maintenance (sources/incremental.py):
the MV must equal a from-scratch recompute after EVERY kind of source
commit — appends, MERGE, deletion-vector deletes, updates — while reading
only the change feed; consumption is exactly-once via the version stamp
in the aggregate's own manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.sources.incremental import (
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


def test_mv_rejects_unknown_change_type(spark):
    from customer_activity_lakehouse_spark.sources.incremental import _signed_delta

    feed = spark.createDataFrame(
        [(1, 10, "mutate", 3)], "k long, v long, change_type string, _commit_version int"
    )
    with pytest.raises(ValueError, match="mutate"):
        _signed_delta(feed, ["k"], ["v"])
