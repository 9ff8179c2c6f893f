"""SCD Type 2 apply on the snapshot log: interval chains, deletes as
coverage gaps, atomicity (one merge commit per batch), replay
convergence, out-of-order/duplicate refusal, and the streaming sink."""

from __future__ import annotations

import pytest

from customer_activity_lakehouse_spark.sources.scd import apply_changes_scd2
from customer_activity_lakehouse_spark.sources.snapshots import read_snapshot


def _rows(spark, data):
    return spark.createDataFrame(
        data, "id long, v string, lsn long, change_type string"
    )


def _by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.id, []).append((r.valid_from, r.valid_to, r.v))
    return {k: sorted(v) for k, v in out.items()}


def test_scd2_bootstrap_chain_and_delete(spark, tmp_path):
    t = str(tmp_path / "dim")
    # one batch: key 1 inserted then updated (chain), key 2 inserted then
    # deleted (closed, no open row), key 3 plain insert
    apply_changes_scd2(
        spark,
        t,
        _rows(
            spark,
            [
                (1, "a", 10, "insert"),
                (1, "a2", 20, "update"),
                (2, "b", 10, "insert"),
                (2, None, 30, "delete"),
                (3, "c", 15, "insert"),
            ],
        ),
        keys=["id"],
        order_col="lsn",
    )
    got = _by_key(read_snapshot(spark, t))
    assert got[1] == [(10, 20, "a"), (20, None, "a2")]
    assert got[2] == [(10, 30, "b")]  # closed by the delete, no open row
    assert got[3] == [(15, None, "c")]


def test_scd2_second_batch_closes_open_rows_atomically(spark, tmp_path):
    t = str(tmp_path / "dim")
    apply_changes_scd2(
        spark, t, _rows(spark, [(1, "a", 10, "insert"), (2, "b", 10, "insert")]),
        keys=["id"], order_col="lsn",
    )
    v2 = apply_changes_scd2(
        spark, t, _rows(spark, [(1, "a2", 50, "update"), (3, "c", 60, "insert")]),
        keys=["id"], order_col="lsn",
    )
    got = _by_key(read_snapshot(spark, t))
    assert got[1] == [(10, 50, "a"), (50, None, "a2")]
    assert got[2] == [(10, None, "b")]  # untouched key: still open
    assert got[3] == [(60, None, "c")]
    # atomicity: the whole batch is ONE commit; the pre-batch version
    # still shows the old open row
    before = _by_key(read_snapshot(spark, t, version=v2 - 1))
    assert before[1] == [(10, None, "a")]


def test_scd2_replay_converges(spark, tmp_path):
    t = str(tmp_path / "dim")
    apply_changes_scd2(
        spark, t, _rows(spark, [(1, "a", 10, "insert")]), keys=["id"], order_col="lsn"
    )
    batch = _rows(spark, [(1, "a2", 50, "update")])
    apply_changes_scd2(spark, t, batch, keys=["id"], order_col="lsn")
    first = _by_key(read_snapshot(spark, t))
    # replaying the SAME batch merges every rebuilt row onto its
    # (key, valid_from) identity: values converge, no duplicate rows
    apply_changes_scd2(spark, t, batch, keys=["id"], order_col="lsn")
    assert _by_key(read_snapshot(spark, t)) == first


def test_scd2_refuses_out_of_order_and_duplicates(spark, tmp_path):
    t = str(tmp_path / "dim")
    apply_changes_scd2(
        spark, t, _rows(spark, [(1, "a", 100, "insert")]), keys=["id"], order_col="lsn"
    )
    with pytest.raises(ValueError, match="out-of-order"):
        apply_changes_scd2(
            spark, t, _rows(spark, [(1, "late", 90, "update")]),
            keys=["id"], order_col="lsn",
        )
    with pytest.raises(ValueError, match="duplicate"):
        apply_changes_scd2(
            spark,
            t,
            _rows(spark, [(1, "x", 200, "update"), (1, "y", 200, "update")]),
            keys=["id"],
            order_col="lsn",
        )
    with pytest.raises(ValueError, match="unknown change type"):
        apply_changes_scd2(
            spark, t, _rows(spark, [(1, "x", 200, "upsert")]),
            keys=["id"], order_col="lsn",
        )


def test_scd2_preimages_dropped(spark, tmp_path):
    t = str(tmp_path / "dim")
    apply_changes_scd2(
        spark,
        t,
        _rows(
            spark,
            [
                (1, "a", 10, "insert"),
                (1, "a", 20, "update_preimage"),
                (1, "a2", 20, "update_postimage"),
            ],
        ),
        keys=["id"],
        order_col="lsn",
    )
    got = _by_key(read_snapshot(spark, t))
    assert got[1] == [(10, 20, "a"), (20, None, "a2")]


def test_scd2_streaming_sink_exactly_once(spark, tmp_path):
    from customer_activity_lakehouse_spark.streaming import (
        write_stream_apply_changes_scd2,
    )

    landing = tmp_path / "changes"
    _rows(spark, [(1, "a", 10, "insert"), (2, "b", 11, "insert")]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(landing))
    _rows(spark, [(1, "a2", 20, "update"), (2, None, 21, "delete")]).coalesce(
        1
    ).write.mode("append").parquet(str(landing))

    t = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("id long, v string, lsn long, change_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing))
        )
        q = write_stream_apply_changes_scd2(
            stream, t, keys=["id"], order_col="lsn", checkpoint=ckpt
        )
        q.awaitTermination(120)
        assert not q.isActive

    run()
    got = _by_key(read_snapshot(spark, t))
    assert got[1] == [(10, 20, "a"), (20, None, "a2")]
    assert got[2] == [(11, 21, "b")]
    # restart on the same checkpoint: no new data, no new commits
    import customer_activity_lakehouse_spark.sources.snapshots as S

    n_versions = len(S._list_versions(spark, t))
    run()
    assert len(S._list_versions(spark, t)) == n_versions
    assert _by_key(read_snapshot(spark, t)) == got


def test_scd2_reenter_after_delete_gap(spark, tmp_path):
    """A key deleted at t=30 may re-enter at t>=30 — half-open intervals
    make [10,30) + [30,None) adjacent, never overlapping — but a novel
    record STRICTLY inside the recorded gap boundary is refused."""
    t = str(tmp_path / "dim")
    apply_changes_scd2(
        spark,
        t,
        _rows(spark, [(2, "b", 10, "insert"), (2, None, 30, "delete")]),
        keys=["id"],
        order_col="lsn",
    )
    with pytest.raises(ValueError, match="out-of-order"):
        apply_changes_scd2(
            spark, t, _rows(spark, [(2, "ghost", 25, "insert")]),
            keys=["id"], order_col="lsn",
        )
    apply_changes_scd2(
        spark, t, _rows(spark, [(2, "b2", 30, "insert")]),
        keys=["id"], order_col="lsn",
    )
    got = _by_key(read_snapshot(spark, t))
    assert got[2] == [(10, 30, "b"), (30, None, "b2")]


# ---------------------------------------------------------------------------
# Model-based: random change sequences vs a pure-Python SCD2 reference
# ---------------------------------------------------------------------------


def _py_scd2_apply(state: dict, batch: list[tuple]) -> None:
    """Reference SCD2: state maps key -> list of [vf, vt, payload] rows.
    ``batch`` rows are (key, payload, lsn, change_type), already valid
    (unique (key, lsn), in-order). Mirrors the documented semantics: each
    record closes its predecessor; deletes close without opening; known
    (key, lsn) re-statements are skipped."""
    by_key: dict = {}
    for k, payload, lsn, chg in sorted(batch, key=lambda r: (r[0], r[2])):
        known = any(r[0] == lsn for r in state.get(k, []))
        if not known:
            by_key.setdefault(k, []).append((lsn, payload, chg))
    for k, recs in by_key.items():
        rows = state.setdefault(k, [])
        open_rows = [r for r in rows if r[1] is None]
        timeline = [(r[0], r[2], "existing") for r in open_rows] + [
            (lsn, p, c) for lsn, p, c in recs
        ]
        timeline.sort(key=lambda r: r[0])
        for r in open_rows:
            rows.remove(r)
        for i, (lsn, p, c) in enumerate(timeline):
            nxt = timeline[i + 1][0] if i + 1 < len(timeline) else None
            if c != "delete":
                rows.append([lsn, nxt, p])


def test_scd2_model_based_random_sequences(spark, tmp_path):
    """Random valid change sequences: the snapshot-log SCD2 and the
    pure-Python reference must agree on the full interval history after
    every batch. Batches are generated in-order per key (the documented
    contract); a seeded RNG keeps the case reproducible."""
    import random as _random

    rng = _random.Random(0x5CD2)
    for case in range(3):
        t = str(tmp_path / f"dim_{case}")
        state: dict = {}
        next_lsn: dict = {}
        for batch_i in range(4):
            batch = []
            used = set()
            for _ in range(rng.randint(1, 8)):
                k = rng.randint(0, 5)
                if k in used:
                    continue  # one record per key per batch keeps it simple
                used.add(k)
                lsn = next_lsn.get(k, 0) + rng.randint(1, 3)
                next_lsn[k] = lsn
                has_open = any(r[1] is None for r in state.get(k, []))
                chg = (
                    rng.choice(["update", "delete"])
                    if has_open
                    else rng.choice(["insert", "update"])
                )
                payload = None if chg == "delete" else f"v{case}_{batch_i}_{k}"
                batch.append((k, payload, lsn, chg))
            if not batch:
                continue
            df = spark.createDataFrame(
                batch, "id long, v string, lsn long, change_type string"
            )
            apply_changes_scd2(spark, t, df, ["id"], "lsn")
            _py_scd2_apply(state, batch)
            got = {
                (r.id, r.valid_from, r.valid_to, r.v)
                for r in read_snapshot(spark, t).collect()
            }
            want = {
                (k, vf, vt, p)
                for k, rows in state.items()
                for vf, vt, p in rows
            }
            assert got == want, (case, batch_i, sorted(got) , sorted(want))
