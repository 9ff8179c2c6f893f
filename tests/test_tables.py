"""Lakehouse table management: dynamic partition overwrite must touch only
the partitions in the batch; compaction must shrink file counts without
changing data; stats must agree with the file layout."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.sources.tables import (
    TableSpec,
    compact,
    detect_table_format,
    partition_stats,
    read_table,
    write_full,
    write_incremental,
)


def _mk(spark, dates, start=0, n=30):
    return spark.range(start, start + n).select(
        F.col("id"),
        F.element_at(F.array(*[F.lit(d) for d in dates]), (F.col("id") % len(dates) + 1).cast("int")).alias("dt"),
    )


def _files(path):
    return sorted(str(p) for p in Path(path).rglob("*.parquet"))


def test_incremental_overwrite_touches_only_batch_partitions(spark, tmp_path):
    spec = TableSpec(str(tmp_path / "t"), ("dt",))
    write_full(_mk(spark, ["2024-01-01", "2024-01-02", "2024-01-03"]), spec)
    before = {f for f in _files(spec.path) if "dt=2024-01-01" in f}
    assert before, "seed write produced no 01-01 files"

    # batch contains only 02 and 03 → 01 files must be byte-identical
    batch = _mk(spark, ["2024-01-02", "2024-01-03"], start=100)
    write_incremental(batch, spec)

    after = {f for f in _files(spec.path) if "dt=2024-01-01" in f}
    assert after == before, "untouched partition was rewritten"

    out = read_table(spark, spec)
    assert out.filter(F.col("dt") == "2024-01-01").count() == 10  # original
    got = {r["id"] for r in out.filter(F.col("dt") != "2024-01-01").collect()}
    assert got == {r["id"] for r in batch.collect()}  # replaced, not appended

    # static default restored after the call
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() == "static"


def test_incremental_requires_partitioning(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_incremental(spark.range(1), TableSpec(str(tmp_path / "x")))


def test_compact_shrinks_files_preserves_rows(spark, tmp_path):
    spec = TableSpec(str(tmp_path / "c"), ("dt",))
    # fragment: 6 incremental writes of the same partitions
    for i in range(6):
        df = _mk(spark, ["2024-02-01", "2024-02-02"], start=i * 100).repartition(4)
        if i == 0:
            write_full(df, spec)
        else:
            mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
            df.write.mode("append").partitionBy("dt").parquet(spec.path)
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    rows_before = {tuple(r) for r in read_table(spark, spec).collect()}
    n_files_before = len(_files(spec.path))
    assert n_files_before > 2

    compact(spark, spec, files_per_partition=1)

    assert {tuple(r) for r in read_table(spark, spec).collect()} == rows_before
    per_part = {}
    for f in _files(spec.path):
        part = [seg for seg in f.split("/") if seg.startswith("dt=")][0]
        per_part[part] = per_part.get(part, 0) + 1
    assert set(per_part) == {"dt=2024-02-01", "dt=2024-02-02"}
    assert all(n == 1 for n in per_part.values()), per_part


def test_partition_stats_matches_layout(spark, tmp_path):
    spec = TableSpec(str(tmp_path / "s"), ("dt",))
    write_full(_mk(spark, ["2024-03-01", "2024-03-02", "2024-03-03"]), spec)
    stats = {r["dt"]: (r["n_rows"], r["n_files"]) for r in partition_stats(spark, spec).collect()}
    assert set(stats) == {"2024-03-01", "2024-03-02", "2024-03-03"}
    assert sum(n for n, _ in stats.values()) == 30
    for part, (_, nf) in stats.items():
        on_disk = len([f for f in _files(spec.path) if f"dt={part}" in f])
        assert nf == on_disk


def test_detect_table_format_falls_back_to_parquet():
    # this environment ships no delta/iceberg runtime
    assert detect_table_format() == "parquet"


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    """MERGE contract: matched keys take the update's values, unmatched
    keys insert, untouched partitions keep their files byte-identical."""
    from customer_activity_lakehouse_spark.sources.tables import merge_upsert

    spec = TableSpec(str(tmp_path / "m"), ("dt",))
    seed = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-01", "b"), (3, "2024-01-02", "c")],
        "id long, dt string, v string",
    )
    write_full(seed, spec)
    other = {f for f in _files(spec.path) if "dt=2024-01-02" in f}

    batch = spark.createDataFrame(
        [(1, "2024-01-01", "a2"), (9, "2024-01-01", "new")], "id long, dt string, v string"
    )
    merge_upsert(spark, spec, batch, keys=["id"])

    got = {(r.id, r.dt, r.v) for r in read_table(spark, spec).collect()}
    assert got == {
        (1, "2024-01-01", "a2"),  # matched → updated
        (2, "2024-01-01", "b"),  # untouched key in touched partition survives
        (3, "2024-01-02", "c"),  # untouched partition survives
        (9, "2024-01-01", "new"),  # unmatched → inserted
    }
    assert {f for f in _files(spec.path) if "dt=2024-01-02" in f} == other, (
        "merge rewrote a partition outside the batch"
    )


def test_merge_upsert_idempotent_and_bootstraps(spark, tmp_path):
    """Re-applying the same batch is a no-op (retry safety); merging into a
    missing table creates it."""
    from customer_activity_lakehouse_spark.sources.tables import merge_upsert

    spec = TableSpec(str(tmp_path / "m2"), ("dt",))
    batch = spark.createDataFrame(
        [(1, "2024-01-01", "x"), (2, "2024-01-02", "y")], "id long, dt string, v string"
    )
    merge_upsert(spark, spec, batch, keys=["id"])  # bootstrap path
    once = sorted(map(tuple, read_table(spark, spec).collect()))
    merge_upsert(spark, spec, batch, keys=["id"])  # retry
    assert sorted(map(tuple, read_table(spark, spec).collect())) == once


def test_merge_upsert_rejects_reserved_columns(spark, tmp_path):
    """__pri/__rn in the updates frame would be clobbered by the priority
    ranking — refuse instead of corrupting user data."""
    import pytest

    from customer_activity_lakehouse_spark.sources.tables import merge_upsert

    spec = TableSpec(str(tmp_path / "mr"), ("dt",))
    bad = spark.createDataFrame(
        [(1, "2024-01-01", 0)], "id long, dt string, __pri long"
    )
    with pytest.raises(ValueError, match="reserves column"):
        merge_upsert(spark, spec, bad, keys=["id"])


def test_merge_upsert_cleans_staging(spark, tmp_path):
    """Stage-and-swap must leave no __staging__ debris next to the table."""
    from customer_activity_lakehouse_spark.sources.tables import merge_upsert

    spec = TableSpec(str(tmp_path / "ms"), ("dt",))
    batch = spark.createDataFrame(
        [(1, "2024-01-01", "x")], "id long, dt string, v string"
    )
    merge_upsert(spark, spec, batch, keys=["id"])  # bootstrap (no staging)
    merge_upsert(spark, spec, batch, keys=["id"])  # merge path (staged)
    leftovers = [p for p in (tmp_path).rglob("*__staging__*")]
    assert not leftovers, f"staging debris: {leftovers}"
    assert read_table(spark, spec).count() == 1


def test_merge_upsert_swap_survives_old_debris(spark, tmp_path):
    """The unpartitioned swap retires the target to <path>.__old__ before
    renaming staging in; debris from a previously crashed swap at that path
    must not break the next merge, and no __old__/__staging__ dirs remain
    after success."""
    from customer_activity_lakehouse_spark.sources.tables import merge_upsert

    spec = TableSpec(str(tmp_path / "mo"))
    batch = spark.createDataFrame([(1, "a")], "id long, v string")
    merge_upsert(spark, spec, batch, keys=["id"])  # bootstrap
    debris = tmp_path / "mo.__old__"
    debris.mkdir()
    (debris / "junk.txt").write_text("crashed swap leftovers")
    batch2 = spark.createDataFrame([(1, "b"), (2, "c")], "id long, v string")
    merge_upsert(spark, spec, batch2, keys=["id"])  # swap path
    got = {(r.id, r.v) for r in read_table(spark, spec).collect()}
    assert got == {(1, "b"), (2, "c")}
    leftovers = [p for p in tmp_path.rglob("*__old__*")] + [
        p for p in tmp_path.rglob("*__staging__*")
    ]
    assert not leftovers, f"swap debris: {leftovers}"


def test_merge_upsert_order_col_resolves_in_batch_dups(spark, tmp_path):
    from customer_activity_lakehouse_spark.sources.tables import merge_upsert

    spec = TableSpec(str(tmp_path / "m3"))
    batch = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new")], "id long, ver long, v string"
    )
    merge_upsert(spark, spec, batch, keys=["id"], order_col="ver")
    assert [(r.id, r.ver, r.v) for r in read_table(spark, spec).collect()] == [(1, 20, "new")]


def test_apply_changes_insert_update_delete(spark, tmp_path):
    """AUTO-CDC contract: insert/update upsert, delete retires the key,
    delete of an absent key is a no-op, unknown types fail loudly before
    any write, and re-applying the same batch is idempotent."""
    import pytest

    from customer_activity_lakehouse_spark.sources.tables import (
        apply_changes,
        read_table,
    )

    spec = TableSpec(str(tmp_path / "cdc"), ("dt",))
    seed = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-01", "b"), (3, "2024-01-02", "c")],
        "id long, dt string, v string",
    )
    write_full(seed, spec)

    changes = spark.createDataFrame(
        [
            (2, "2024-01-01", "b2", "update"),
            (3, "2024-01-02", "c", "delete"),
            (4, "2024-01-02", "d", "insert"),
            (99, "2024-01-01", "zz", "delete"),  # absent key: no-op
        ],
        "id long, dt string, v string, change_type string",
    )
    apply_changes(spark, spec, changes, keys=["id"])
    expect = {
        (1, "2024-01-01", "a"),
        (2, "2024-01-01", "b2"),
        (4, "2024-01-02", "d"),
    }
    got = {(r.id, r.dt, r.v) for r in read_table(spark, spec).collect()}
    assert got == expect
    # change_type never leaks into the table
    assert "change_type" not in read_table(spark, spec).columns
    # idempotent re-apply
    apply_changes(spark, spec, changes, keys=["id"])
    assert {(r.id, r.dt, r.v) for r in read_table(spark, spec).collect()} == expect

    bad = spark.createDataFrame(
        [(5, "2024-01-01", "x", "upsert")], "id long, dt string, v string, change_type string"
    )
    with pytest.raises(ValueError, match="unknown change type"):
        apply_changes(spark, spec, bad, keys=["id"])
    with pytest.raises(ValueError, match="no 'change_type' column"):
        apply_changes(spark, spec, seed, keys=["id"])


def test_apply_changes_order_col_breaks_in_batch_races(spark, tmp_path):
    """One batch carrying several records for a key resolves by order_col
    descending — a trailing delete wins over an earlier update and vice
    versa."""
    from customer_activity_lakehouse_spark.sources.tables import (
        apply_changes,
        read_table,
    )

    spec = TableSpec(str(tmp_path / "cdc2"), ())
    write_full(
        spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "id long, v string, lsn long"),
        spec,
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 5, "update"),
            (1, "gone", 9, "delete"),  # latest for id=1 -> retired
            (2, "gone", 3, "delete"),
            (2, "b2", 7, "update"),  # latest for id=2 -> survives
        ],
        "id long, v string, lsn long, change_type string",
    )
    apply_changes(spark, spec, changes, keys=["id"], order_col="lsn")
    got = {(r.id, r.v) for r in read_table(spark, spec).collect()}
    assert got == {(2, "b2")}


def test_merge_additive_equals_full_recompute(spark, tmp_path):
    """IVM contract: maintaining an hourly rollup by merging per-batch
    partial aggregates equals recomputing the rollup over all facts —
    including a late-arrival batch that touches existing keys — and only
    the touched partitions are rewritten."""
    from customer_activity_lakehouse_spark.sources.tables import (
        merge_additive,
        read_table,
    )

    facts1 = spark.createDataFrame(
        [("2024-01-01", "click", 2.0), ("2024-01-01", "click", 3.0), ("2024-01-02", "view", 1.0)],
        "dt string, typ string, v double",
    )
    facts2 = spark.createDataFrame(  # late arrivals: existing + new keys
        [("2024-01-01", "click", 5.0), ("2024-01-02", "buy", 7.0)],
        "dt string, typ string, v double",
    )

    def rollup(df):
        return df.groupBy("dt", "typ").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    spec = TableSpec(str(tmp_path / "rollup"), ("dt",))
    merge_additive(spark, spec, rollup(facts1), keys=["dt", "typ"])
    untouched = {f for f in _files(spec.path) if "dt=2024-01-02" in f}
    merge_additive(
        spark,
        TableSpec(spec.path, spec.partition_cols),
        rollup(facts2.filter("dt = '2024-01-01'")),
        keys=["dt", "typ"],
    )
    assert {f for f in _files(spec.path) if "dt=2024-01-02" in f} == untouched, (
        "additive merge rewrote a partition outside the delta"
    )
    merge_additive(spark, spec, rollup(facts2.filter("dt = '2024-01-02'")), keys=["dt", "typ"])

    got = {(r.dt, r.typ, r.n, r.total) for r in read_table(spark, spec).collect()}
    full = rollup(facts1.unionByName(facts2))
    expect = {(r.dt, r.typ, r.n, r.total) for r in full.collect()}
    assert got == expect
    # dtypes preserved through the merge (counts stay BIGINT)
    assert dict(read_table(spark, spec).dtypes)["n"] == "bigint"


def test_merge_additive_rejects_schema_drift(spark, tmp_path):
    import pytest

    from customer_activity_lakehouse_spark.sources.tables import merge_additive

    spec = TableSpec(str(tmp_path / "r2"), ())
    d1 = spark.createDataFrame([("a", 1)], "k string, n long")
    merge_additive(spark, spec, d1, keys=["k"])
    with pytest.raises(ValueError, match="schema drift"):
        merge_additive(
            spark, spec, spark.createDataFrame([("a", 1, 2)], "k string, n long, x long"), keys=["k"]
        )
    with pytest.raises(ValueError, match="at least one additive"):
        merge_additive(spark, spec, d1.select("k"), keys=["k"])


def test_merge_upsert_schema_evolution(spark, tmp_path):
    """Delta mergeSchema parity: off (default), drift fails loudly naming
    the columns; on, added columns land with nulls for untouched rows and
    an update omitting an existing column leaves null on its replaced row
    (whole-row-replace semantics, documented)."""
    import pytest

    from customer_activity_lakehouse_spark.sources.tables import merge_upsert, read_table

    spec = TableSpec(str(tmp_path / "evo"), ())
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string")
    merge_upsert(spark, spec, base, keys=["k"])

    widened = spark.createDataFrame([(2, "B", 9.5), (3, "c", 1.0)], "k long, val string, score double")
    with pytest.raises(ValueError, match="schema drift.*score"):
        merge_upsert(spark, spec, widened, keys=["k"])

    merge_upsert(spark, spec, widened, keys=["k"], allow_schema_evolution=True)
    got = {r.k: (r.val, r.score) for r in read_table(spark, spec).collect()}
    assert got == {1: ("a", None), 2: ("B", 9.5), 3: ("c", 1.0)}

    # narrowing direction: update missing an existing column
    narrow = spark.createDataFrame([(1, 7.0)], "k long, score double")
    merge_upsert(spark, spec, narrow, keys=["k"], allow_schema_evolution=True)
    got = {r.k: (r.val, r.score) for r in read_table(spark, spec).collect()}
    assert got == {1: (None, 7.0), 2: ("B", 9.5), 3: ("c", 1.0)}
