"""Streaming layer tests: each streaming result is checked against the
equivalent batch computation on the same data (the strongest oracle
available for a stream)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.plans.registry import events_table
from customer_activity_lakehouse_spark.streaming import (
    hourly_event_counts,
    read_events_stream,
    sessionize_stream,
    sliding_event_rates,
    stream_dedup_events,
    write_stream_parquet,
)
from customer_activity_lakehouse_spark.streaming.streams import (
    write_stream_foreach_batch,
    write_stream_merge_upsert,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    """Land sf0.001 events as a micros-timestamped parquet directory —
    the raw-zone landing layout a stream would tail. 4 files so the
    maxFilesPerTrigger path sees multiple micro-batches."""
    out = tmp_path_factory.mktemp("events_stream")
    batch = events_table(spark, sf_smoke)
    batch.repartition(4).write.mode("overwrite").parquet(str(out / "landing"))
    return str(out / "landing"), str(out)


def _run(stream_df, path, checkpoint, output_mode="append"):
    q = write_stream_parquet(stream_df, path, checkpoint, output_mode=output_mode)
    q.awaitTermination(120)
    assert not q.isActive


def test_hourly_counts_match_batch(spark, sf_smoke, events_dir):
    landing, root = events_dir
    stream = read_events_stream(spark, landing)
    _run(hourly_event_counts(stream), f"{root}/hourly", f"{root}/ckpt_hourly")

    got = spark.read.parquet(f"{root}/hourly")
    batch = events_table(spark, sf_smoke)
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    g = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    w = {
        (r.window_start, r.event_type): (r.window_end, r.n_events, r.total_value)
        for r in want.collect()
    }
    # Append mode emits a window only once the watermark (max event time − 2h)
    # passes its end; windows in the final 2h horizon stay open at end-of-stream.
    max_ts = events_table(spark, sf_smoke).agg(F.max("ts")).collect()[0][0]
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    for k, (end, n, tot) in w.items():
        if end <= horizon:
            assert g[k] == (n, tot), k
        elif k in g:
            assert g[k] == (n, tot), k  # early emit is fine if values match
    assert set(g) <= set(w)


def test_sliding_windows_match_batch(spark, sf_smoke, events_dir):
    landing, root = events_dir
    stream = read_events_stream(spark, landing, max_files_per_trigger=2)
    _run(sliding_event_rates(stream), f"{root}/sliding", f"{root}/ckpt_sliding")

    got = spark.read.parquet(f"{root}/sliding")
    batch = events_table(spark, sf_smoke)
    want = (
        batch.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    g = {(r.window_start, r.event_type): r.n_events for r in got.collect()}
    w = {(r.window_start, r.event_type): (r.window_end, r.n_events) for r in want.collect()}
    import datetime

    max_ts = events_table(spark, sf_smoke).agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=2)
    for k, (end, n) in w.items():
        if end <= horizon:
            assert g[k] == n, k
    assert set(g) <= set(w)


def test_stream_dedup_is_noop_on_unique_ids(spark, sf_smoke, events_dir):
    landing, root = events_dir
    stream = read_events_stream(spark, landing)
    _run(
        stream_dedup_events(stream).select("event_id"),
        f"{root}/dedup",
        f"{root}/ckpt_dedup",
    )
    got = spark.read.parquet(f"{root}/dedup")
    n_batch = events_table(spark, sf_smoke).count()
    assert got.count() == n_batch
    assert got.distinct().count() == n_batch


def test_stream_dedup_drops_replayed_file(spark, events_dir, tmp_path):
    """Duplicate a landing file (at-least-once replay) — dedup must collapse
    the copies back to the original id set."""
    landing, _ = events_dir
    dup_dir = tmp_path / "landing_dup"
    src = spark.read.parquet(landing)
    src.write.mode("overwrite").parquet(str(dup_dir))
    src.limit(200).write.mode("append").parquet(str(dup_dir))

    stream = read_events_stream(spark, str(dup_dir))
    _run(
        stream_dedup_events(stream).select("event_id"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == src.count()


def test_stream_merge_upsert_keeps_latest_per_user(spark, sf_smoke, events_dir, tmp_path):
    """Streaming MERGE sink: update-mode sessionization re-emits each user
    per micro-batch; the merged table must hold exactly ONE row per user —
    the latest — after the stream drains, and a second incremental run
    (same checkpoint, new landing file) must update in place, not append."""
    from customer_activity_lakehouse_spark.sources.tables import TableSpec, read_table

    landing = str(tmp_path / "landing")
    batch = events_table(spark, sf_smoke).orderBy("ts", "event_id")
    half = batch.count() // 2
    batch.limit(half).coalesce(1).write.mode("overwrite").parquet(landing)

    spec = TableSpec(str(tmp_path / "sessions_tbl"))
    ckpt = str(tmp_path / "ckpt_merge")

    def run_once():
        stream = read_events_stream(spark, landing, max_files_per_trigger=1)
        q = write_stream_merge_upsert(
            sessionize_stream(stream), spec, keys=["user_id"], checkpoint=ckpt
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    t1 = read_table(spark, spec)
    n_users_1 = batch.limit(half).select("user_id").distinct().count()
    assert t1.count() == n_users_1  # one row per user despite update re-emits
    assert t1.agg(F.sum("n_events")).collect()[0][0] == half

    # land the remaining events, resume from the same checkpoint
    batch.coalesce(1).write.mode("append").parquet(landing)
    run_once()
    t2 = read_table(spark, spec)
    assert t2.count() == batch.select("user_id").distinct().count()
    # second file replays all events: totals grow past the first half
    assert t2.agg(F.sum("n_events")).collect()[0][0] > half
    assert t2.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0


def test_stream_stream_interval_join_matches_batch(spark, sf_smoke, events_dir):
    """Stream-stream interval join vs the same join computed in batch.
    Inner matches must all emit; outer (no-click) purchases emit only once
    the watermark clears them, so purchases inside the final horizon are
    allowed to be absent — and nothing may emit that batch didn't produce."""
    import datetime

    from customer_activity_lakehouse_spark.streaming import purchases_with_recent_clicks

    landing, root = events_dir
    gap, gap_td = "12 hours", datetime.timedelta(hours=12)
    # two independent stream scans of the same landing dir (not a self-join)
    joined = purchases_with_recent_clicks(
        read_events_stream(spark, landing).filter(F.col("event_type") == "purchase"),
        read_events_stream(spark, landing).filter(F.col("event_type") == "click"),
        max_gap=gap,
    )
    _run(joined, f"{root}/ssjoin", f"{root}/ckpt_ssjoin")
    got = spark.read.parquet(f"{root}/ssjoin")

    ev = events_table(spark, sf_smoke)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"), F.col("value").alias("purchase_value")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    want = p.join(
        c,
        (p["user_id"] == c["cu"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {gap}")),
        "leftOuter",
    ).select("event_id", "purchase_ts", "click_ts")

    got_keys = {(r.event_id, r.click_ts) for r in got.collect()}
    want_rows = want.collect()
    want_keys = {(r.event_id, r.click_ts) for r in want_rows}
    assert got_keys <= want_keys  # nothing invented
    # some purchases genuinely matched a click and some didn't
    assert any(k[1] is not None for k in want_keys)
    assert any(k[1] is None for k in want_keys)
    # every inner match emits; outer rows only outside the watermark horizon
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=2) - gap_td
    for r in want_rows:
        if r.click_ts is not None or r.purchase_ts <= horizon:
            assert (r.event_id, r.click_ts) in got_keys, r


def test_anomaly_stream_matches_batch_query_on_spike(spark, tmp_path):
    """The stateful rolling-baseline operator must agree with the batch
    events_anomaly_zscore on an in-order stream containing a rate spike:
    same alerted bucket, same count, same 4dp z — only the series' final
    (never-closed) bucket is out of streaming's reach, and here it is not
    an alert in batch either."""
    import datetime as dt

    from customer_activity_lakehouse_spark.plans.timeseries import q_events_anomaly_zscore
    from customer_activity_lakehouse_spark.streaming import anomaly_stream

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for minute in range(22):
        # varying baseline (4/5/6 per minute — constant history has zero
        # variance and is excluded by the v>0 guard), spike at minute 20
        n = 30 if minute == 20 else 4 + (minute % 3)
        for k in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    base + dt.timedelta(minutes=minute, seconds=k % 60),
                    100 + k,
                    "click",
                    1.0,
                    "{}",
                )
            )
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf_dir = str(tmp_path / "synthetic")
    events.orderBy("ts", "event_id").coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet"
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r.event_type, r.bucket, r.n_events, r.zscore) for r in batch_df.collect()
        )

    q = write_stream_foreach_batch(anomaly_stream(stream), sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    want = [
        (r.event_type, r.bucket, r.n_events, r.zscore)
        for r in q_events_anomaly_zscore(spark, sf_dir).orderBy("bucket").collect()
    ]
    assert len(want) == 1 and want[0][1] == "2026-01-01 00:20:00"  # the spike bucket
    assert sorted(got) == sorted(want)


def test_sessionize_stream_matches_batch_query(spark, sf_smoke, events_dir):
    """The custom stateful operator must agree with the batch catalog's
    event_sessionization (same 30-min gap) when the whole stream arrives in
    order. Single input file => single micro-batch => in-order arrival."""
    landing, root = events_dir
    single = f"{root}/landing_single"
    events_table(spark, sf_smoke).orderBy("ts", "event_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(single)

    stream = read_events_stream(spark, single)
    sess = sessionize_stream(stream)

    rows = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():  # tiny per-user summaries, not events
            rows[r.user_id] = (r.n_sessions, r.n_events)

    q = write_stream_foreach_batch(sess, sink, f"{root}/ckpt_sess")
    q.awaitTermination(120)

    from customer_activity_lakehouse_spark.plans.core import q_event_sessionization

    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q_event_sessionization(spark, sf_smoke).collect()
    }
    assert rows == want


class _FakeState:
    """Minimal GroupState stand-in for driving _anomaly_fold directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists = True
        self._v = v


def test_anomaly_fold_chunk_order_independent():
    """applyInPandasWithState may split one group's micro-batch rows across
    Arrow chunks in ANY order; the fold must produce identical alerts (and
    identical end state) whether the events arrive as one sorted chunk or
    as interleaved, internally-unsorted chunks (ADVICE r5)."""
    import pandas as pd

    from customer_activity_lakehouse_spark.streaming.streams import _anomaly_fold

    base = pd.Timestamp("2026-01-01 00:00:00")
    ts = []
    for minute in range(16):
        n = 40 if minute == 14 else 4 + (minute % 3)
        ts.extend(base + pd.Timedelta(minutes=minute, seconds=k % 60) for k in range(n))
    ordered = pd.DataFrame({"ts": pd.to_datetime(ts)})

    def run(chunks):
        state = _FakeState()
        (out,) = list(_anomaly_fold(("click",), chunks, state))
        return out, state._v

    want_out, want_state = run([ordered])
    assert len(want_out) == 1  # the spike bucket alerts

    # interleave: rows 0,3,6,... / 1,4,7,... / 2,5,8,... -> every chunk spans
    # the full time range, so any per-chunk folding closes buckets early
    shuffled = ordered.sample(frac=1.0, random_state=7).reset_index(drop=True)
    chunks = [shuffled.iloc[i::3].reset_index(drop=True) for i in range(3)]
    got_out, got_state = run(chunks)

    pd.testing.assert_frame_equal(got_out, want_out)
    assert got_state == want_state


def test_anomaly_stream_matches_batch_long_series_with_gap(spark, tmp_path):
    """Streaming/batch anomaly equivalence at scale (VERDICT r5 #6): a
    series much longer than the lookback (45 min > 3x12) containing TWO
    spikes and a 7-minute silent gap. The batch query scores observed
    buckets over a ROWS frame (gaps don't widen the window); the streaming
    fold must agree on the full alert set. The final bucket is quiet so
    streaming's one inherent blind spot (never-closed last bucket) does not
    differ from batch."""
    import datetime as dt

    from customer_activity_lakehouse_spark.plans.timeseries import (
        ANOMALY_LOOKBACK,
        q_events_anomaly_zscore,
    )
    from customer_activity_lakehouse_spark.streaming import anomaly_stream

    assert 45 > 3 * ANOMALY_LOOKBACK
    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for minute in range(45):
        if 25 <= minute < 32:
            continue  # silent gap: no bucket at all for these minutes
        if minute in (20, 40):
            n = 35  # spikes
        else:
            n = 4 + (minute % 3)
        for k in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(minutes=minute, seconds=k % 60),
                         200 + k, "view", 1.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf_dir = str(tmp_path / "synthetic_long")
    events.orderBy("ts", "event_id").coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet"
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r.event_type, r.bucket, r.n_events, r.zscore) for r in batch_df.collect()
        )

    q = write_stream_foreach_batch(anomaly_stream(stream), sink, str(tmp_path / "ckpt_long"))
    q.awaitTermination(120)

    want = [
        (r.event_type, r.bucket, r.n_events, r.zscore)
        for r in q_events_anomaly_zscore(spark, sf_dir).collect()
    ]
    # both spikes alert in batch; the gap minutes produce no buckets
    assert {w[1] for w in want} == {"2026-03-01 00:20:00", "2026-03-01 00:40:00"}
    assert sorted(got) == sorted(want)


def test_rate_events_stream_deterministic_and_windowed(spark, tmp_path):
    """The rate-micro-batch Kafka stand-in (VERDICT r5 next #8): (a) the
    synthetic mapping is a pure function of the row index — identical events
    on any run/partitioning; (b) a watermarked tumbling window over the
    stream agrees exactly with a batch groupBy over the same row range.
    Row count seen varies with wall clock (the source keeps producing), so
    assertions are derived from N = rows actually processed, not a fixed
    batch count."""
    import json

    from customer_activity_lakehouse_spark.streaming import read_rate_events_stream

    stream = read_rate_events_stream(spark, rows_per_batch=500, num_partitions=2)
    assert [f.name for f in stream.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]

    raw_rows = []
    counts = {}

    def raw_sink(batch_df, batch_id):
        raw_rows.extend(batch_df.collect())

    def window_sink(batch_df, batch_id):
        for r in batch_df.collect():  # update mode: last value per key wins
            counts[(r.window_start, r.event_type)] = r.n_events

    q1 = (
        stream.writeStream.outputMode("append")
        .foreachBatch(raw_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_raw"))
        .start()
    )
    from customer_activity_lakehouse_spark.streaming import hourly_event_counts

    windowed = hourly_event_counts(
        read_rate_events_stream(spark, rows_per_batch=500, num_partitions=2),
        watermark="10 minutes",
    ).drop("window_end", "total_value")
    q2 = (
        windowed.writeStream.outputMode("update")
        .foreachBatch(window_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .start()
    )
    import time as _time

    deadline = _time.time() + 60
    while _time.time() < deadline and (len(raw_rows) < 1500 or not counts):
        _time.sleep(1)
    q1.stop(); q2.stop()
    q1.awaitTermination(30); q2.awaitTermination(30)

    # (a) every collected row is the pure function of its event_id
    assert len(raw_rows) >= 1500
    types = ("view", "click", "purchase")
    for r in raw_rows[:2000]:
        v = r.event_id
        assert r.user_id == v % 50
        assert r.event_type == types[v % 3]
        assert r.value == (v % 100) / 10.0
        assert json.loads(r.props) == {"k": v % 7}
        assert int(r.ts.timestamp()) == 1_700_000_000 + v
    # contiguous prefix 0..N-1 (no gaps/dups across micro-batches)
    ids = sorted(r.event_id for r in raw_rows)
    assert ids == list(range(len(ids)))

    # (b) streaming windowed counts == batch groupBy over rows 0..N-1 for
    # every window the stream reported (final update per key wins)
    assert counts
    n2 = sum(counts.values())  # q2 processed exactly rows 0..n2-1
    import collections

    want = collections.Counter()
    for v in range(n2):
        hour_start = (1_700_000_000 + v) // 3600 * 3600
        import datetime as dt

        ws = dt.datetime.fromtimestamp(hour_start, dt.timezone.utc).replace(tzinfo=None)
        want[(ws, types[v % 3])] += 1
    assert counts == dict(want)


def test_stream_static_enrichment_matches_batch_join(spark, sf_smoke, events_dir, tmp_path):
    """Stream-static broadcast enrichment must produce exactly the batch
    left join's rows: every event keeps its dim attributes, events with
    keys absent from the dim survive with nulls."""
    from customer_activity_lakehouse_spark.streaming import enrich_stream_with_dim

    landing, root = events_dir
    batch = events_table(spark, sf_smoke)
    # synthetic user dim covering only half the users -> exercises the
    # unmatched-key path
    dim = (
        batch.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("segment", F.concat(F.lit("S"), (F.col("user_id") % 4).cast("string")))
    )
    dim_path = str(tmp_path / "user_dim")
    dim.write.mode("overwrite").parquet(dim_path)
    dim_static = spark.read.parquet(dim_path)

    stream = read_events_stream(spark, landing)
    out = enrich_stream_with_dim(stream, dim_static)
    _run(out, f"{root}/enriched", f"{root}/ckpt_enrich")

    got = spark.read.parquet(f"{root}/enriched")
    want = batch.join(F.broadcast(dim_static), "user_id", "left")
    assert got.count() == batch.count()  # left join: no event lost
    g = {(r.event_id, r.segment) for r in got.select("event_id", "segment").collect()}
    w = {(r.event_id, r.segment) for r in want.select("event_id", "segment").collect()}
    assert g == w
    assert any(s is None for _, s in g) and any(s is not None for _, s in g)


def test_stream_apply_changes_retires_deleted_keys(spark, tmp_path):
    """Streaming CDC-apply sink: change-record micro-batches upsert AND
    delete; a key inserted by one batch and deleted by a later one is gone
    after the stream drains, while the MERGE sink could only upsert."""
    from customer_activity_lakehouse_spark.sources.tables import TableSpec, read_table
    from customer_activity_lakehouse_spark.streaming import write_stream_apply_changes

    landing = tmp_path / "changes"
    b1 = spark.createDataFrame(
        [(1, "a", 1, "insert"), (2, "b", 2, "insert"), (3, "c", 3, "insert")],
        "id long, v string, lsn long, change_type string",
    )
    b1.coalesce(1).write.mode("overwrite").parquet(str(landing))
    b2 = spark.createDataFrame(
        [(2, "gone", 4, "delete"), (3, "c2", 5, "update"), (4, "d", 6, "insert")],
        "id long, v string, lsn long, change_type string",
    )
    b2.coalesce(1).write.mode("append").parquet(str(landing))

    stream = (
        spark.readStream.schema("id long, v string, lsn long, change_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    spec = TableSpec(str(tmp_path / "cdc_tbl"))
    q = write_stream_apply_changes(
        stream, spec, keys=["id"], checkpoint=str(tmp_path / "ckpt"), order_col="lsn"
    )
    q.awaitTermination(120)
    assert not q.isActive
    got = {(r.id, r.v) for r in read_table(spark, spec).collect()}
    assert got == {(1, "a"), (3, "c2"), (4, "d")}


def test_session_window_stream_matches_batch(spark, sf_smoke, events_dir):
    """Native streaming session windows vs the same session_window
    aggregate in batch: every session the stream emits must match the
    batch session exactly (start, end, n_events, active µs), and every
    batch session whose end precedes the final watermark must have been
    emitted. This is the streaming twin of q_events_session_stats_native —
    same builtin, same micros arithmetic."""
    import datetime

    from customer_activity_lakehouse_spark.streaming import session_window_stream

    landing, root = events_dir
    stream = read_events_stream(spark, landing, max_files_per_trigger=2)
    _run(session_window_stream(stream), f"{root}/sessions_native", f"{root}/ckpt_sess_native")

    got = spark.read.parquet(f"{root}/sessions_native")
    batch = events_table(spark, sf_smoke)
    want = (
        batch.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            (F.col("last_us") - F.col("first_us")).alias("active_us"),
        )
    )
    g = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.active_us)
        for r in got.collect()
    }
    w = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.active_us)
        for r in want.collect()
    }
    assert set(g) <= set(w), "stream emitted a session batch doesn't have"
    for k in g:
        assert g[k] == w[k], (k, g[k], w[k])
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=2)
    overdue = [k for k, (end, _, _) in w.items() if end <= horizon and k not in g]
    assert not overdue, f"sessions past the watermark never emitted: {overdue[:5]}"
    assert g, "stream emitted no sessions at all"


def test_dq_monitor_stream_matches_batch_checks(spark, sf_smoke, events_dir):
    """The streaming DQ monitor's audit rows, summed across micro-batches,
    must equal the same checks computed in one batch pass over the whole
    fixture; batch_ids are unique after the read-time dedup."""
    from customer_activity_lakehouse_spark.streaming import (
        read_dq_audit,
        write_stream_dq_monitor,
    )

    landing, root = events_dir
    stream = read_events_stream(spark, landing, max_files_per_trigger=2)
    q = write_stream_dq_monitor(stream, f"{root}/dq_audit", f"{root}/ckpt_dq")
    q.awaitTermination(120)
    assert not q.isActive

    audit = read_dq_audit(spark, f"{root}/dq_audit").collect()
    assert len(audit) >= 2, "expected multiple micro-batches"
    assert len({r.batch_id for r in audit}) == len(audit)

    batch = events_table(spark, sf_smoke)
    want = batch.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).cast("long").alias("nu"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).cast("long").alias("nt"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).cast("long").alias("nv"),
    ).collect()[0]
    assert sum(r.n_rows for r in audit) == want.n_rows
    assert sum(r.n_null_user for r in audit) == want.nu
    assert sum(r.n_null_ts for r in audit) == want.nt
    assert sum(r.n_negative_value for r in audit) == want.nv
    # event ids are unique in the fixture, so per-batch dup counts are 0
    assert all(r.n_dup_event_ids == 0 for r in audit)


def test_stream_snapshot_append_versioned_and_idempotent(spark, sf_smoke, events_dir):
    """Stream → snapshot log: micro-batches commit as appends (one version
    per batch, time-travelable), the final content equals the batch read,
    and a replayed batch (same batch_id) is skipped — the exactly-once
    contract living in the table's own log."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _list_versions,
        _read_manifest,
        read_snapshot,
    )
    from customer_activity_lakehouse_spark.streaming import write_stream_snapshot_append

    landing, root = events_dir
    stream = read_events_stream(spark, landing, max_files_per_trigger=2)
    tdir = f"{root}/snap_table"
    q = write_stream_snapshot_append(stream, tdir, f"{root}/ckpt_snap_append")
    q.awaitTermination(120)
    assert not q.isActive

    versions = _list_versions(spark, tdir)
    assert len(versions) >= 2, "expected one version per micro-batch"
    batch_ids = [_read_manifest(spark, tdir, v).get("stream_batch_id") for v in versions]
    assert all(b is not None for b in batch_ids) and len(set(batch_ids)) == len(batch_ids)

    want = events_table(spark, sf_smoke).count()
    assert read_snapshot(spark, tdir).count() == want
    # time travel: the first version holds strictly fewer rows
    assert read_snapshot(spark, tdir, version=versions[0]).count() < want

    # replay the LAST batch manually: must be skipped (no new version)
    from customer_activity_lakehouse_spark.streaming.streams import (
        write_stream_snapshot_append as _factory,
    )

    last_batch_id = max(batch_ids)
    batch_df = events_table(spark, sf_smoke).limit(5)
    # reconstruct the inner committer by calling the factory's closure path:
    # simplest faithful replay — invoke the foreachBatch function directly
    inner_holder = {}
    import customer_activity_lakehouse_spark.streaming.streams as streams_mod

    orig = streams_mod.write_stream_foreach_batch

    def capture(df, fn, ckpt, **kw):
        inner_holder["fn"] = fn

        class _Done:
            isActive = False

            def awaitTermination(self, *_):
                return None

        return _Done()

    streams_mod.write_stream_foreach_batch = capture
    try:
        # SAME checkpoint as the original stream: replay dedup is scoped by
        # (app_id=checkpoint, batch_id) — Delta's txnAppId contract — and a
        # real foreachBatch replay always comes from the same checkpoint
        _factory(stream, tdir, f"{root}/ckpt_snap_append")
    finally:
        streams_mod.write_stream_foreach_batch = orig
    n_before = len(_list_versions(spark, tdir))
    inner_holder["fn"](batch_df, last_batch_id)  # replay: skipped
    assert len(_list_versions(spark, tdir)) == n_before
    inner_holder["fn"](batch_df, last_batch_id + 1000)  # genuinely new: commits
    assert len(_list_versions(spark, tdir)) == n_before + 1


def test_stream_snapshot_append_records_skipping_stats(spark, sf_smoke, events_dir):
    """The streaming snapshot sink's stats_cols: every micro-batch commit
    records per-file [min,max] AND carries earlier batches' stats forward
    (ADVICE r6 — the old sink rebuilt manifests from scratch and silently
    discarded them), so event-id-ranged reads prune old micro-batches."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        _list_versions,
        _read_manifest,
        read_snapshot,
    )
    from customer_activity_lakehouse_spark.streaming import write_stream_snapshot_append

    landing, root = events_dir
    stream = read_events_stream(spark, landing, max_files_per_trigger=2)
    tdir = f"{root}/snap_stats_table"
    q = write_stream_snapshot_append(
        stream, tdir, f"{root}/ckpt_snap_stats", stats_cols=["event_id"]
    )
    q.awaitTermination(120)
    assert not q.isActive

    versions = _list_versions(spark, tdir)
    assert len(versions) >= 2
    m = _read_manifest(spark, tdir, versions[-1])
    # EVERY file — including ones committed by earlier micro-batches —
    # has recorded bounds in the LATEST manifest
    assert set(m["stats"].keys()) == set(m["files"])
    for st in m["stats"].values():
        lo, hi = st["event_id"]
        assert isinstance(lo, int) and isinstance(hi, int) and lo <= hi

    total = len(m["files"])
    lo0 = min(st["event_id"][0] for st in m["stats"].values())
    pruned = read_snapshot(spark, tdir, skip_where=("event_id", lo0, lo0))
    assert 1 <= len(pruned.inputFiles()) <= total
    assert pruned.filter(f"event_id = {lo0}").count() == 1


def test_write_stream_snapshot_merge_exactly_once(spark, tmp_path):
    """Streaming MERGE sink: micro-batch upserts land as merge commits
    with the batch id stamped atomically; a replayed batch (same id in
    recent history) is skipped, so state and the change feed stay exact."""
    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        read_snapshot,
        snapshot_change_feed,
    )
    from customer_activity_lakehouse_spark.streaming.streams import (
        read_rate_events_stream,
        write_stream_snapshot_merge,
    )

    t = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    commit_append(
        spark, t,
        spark.range(0, 50).selectExpr("id AS user_id", "cast(0 AS long) AS last_event"),
    )
    # rate stream: users 0..49 recurring; keep the LAST event id per user
    ev = read_rate_events_stream(spark, rows_per_batch=200).selectExpr(
        "user_id", "event_id AS last_event"
    )
    q = write_stream_snapshot_merge(
        ev, t, keys=["user_id"], checkpoint=ck, order_col="last_event"
    )
    q.awaitTermination(120)
    got = {r.user_id: r.last_event for r in read_snapshot(spark, t).collect()}
    assert len(got) == 50
    assert got[49] == 199 and got[0] == 150  # max event_id per user (v%50)
    # the merge commits are change-feed readable (one commit per batch);
    # Delta CDF vocabulary — each updated key carries pre- AND postimage
    feed = snapshot_change_feed(spark, t, 1)
    assert feed.filter("change_type = 'update_postimage'").count() == 50
    assert feed.filter("change_type = 'update_preimage'").count() == 50
    # REPLAY: calling the batch fn again with an already-committed id is a no-op
    from customer_activity_lakehouse_spark.sources.snapshots import _list_versions

    v_before = _list_versions(spark, t)[-1]
    import customer_activity_lakehouse_spark.streaming.streams as S

    # simulate foreachBatch redelivery of batch 0
    batch_df = spark.range(0, 5).selectExpr("id AS user_id", "cast(999 AS long) AS last_event")
    # rebuild the same closure the sink used
    sink_closure = None
    def capture(df, fn, ck2):  # capture merge_batch without starting a stream
        nonlocal sink_closure
        sink_closure = fn
        class _Q:  # minimal stand-in
            def awaitTermination(self, *_): pass
        return _Q()
    orig = S.write_stream_foreach_batch
    S.write_stream_foreach_batch = capture
    try:
        write_stream_snapshot_merge(batch_df, t, keys=["user_id"], checkpoint=ck)
        sink_closure(batch_df, 0)  # batch id 0 already committed above
    finally:
        S.write_stream_foreach_batch = orig
    assert _list_versions(spark, t)[-1] == v_before  # skipped, no new commit
    assert read_snapshot(spark, t).filter("last_event = 999").count() == 0


def test_theta_distinct_stream_matches_batch_and_tracks_exact(spark, sf_smoke, events_dir):
    """The streaming theta sketch must produce IDENTICAL numbers to the
    same function run in batch (deterministic md5 sample — the sketch's
    whole selling point), and the per-(window, type) estimates must track
    the exact distinct counts within a multi-sigma band."""
    import datetime

    from customer_activity_lakehouse_spark.streaming.streams import (
        theta_distinct_stream,
    )

    landing, root = events_dir
    batch = events_table(spark, sf_smoke)
    stream = read_events_stream(spark, landing)
    _run(theta_distinct_stream(stream), f"{root}/theta", f"{root}/ckpt_theta")

    got = {
        (r.window_start, r.event_type): r.est_users
        for r in spark.read.parquet(f"{root}/theta").collect()
    }
    # the watermark tracks the SAMPLED stream (θ-filter pushes below the
    # watermark operator — see the operator's watermark note), so the
    # emission horizon derives from the max sampled event time
    from customer_activity_lakehouse_spark.plans.ml_ops import THETA_KEEP, _h60

    max_ts = (
        batch.filter(F.col("user_id").isNotNull())
        .filter(_h60(F.col("user_id")) < THETA_KEEP)
        .agg(F.max("ts"))
        .collect()[0][0]
    )
    want = {
        (r.window_start, r.event_type): (r.window_end, r.est_users)
        for r in theta_distinct_stream(batch).collect()
    }
    horizon = max_ts - datetime.timedelta(hours=2)
    for k, (end, est) in want.items():
        if end <= horizon:
            assert got[k] == est, k
        elif k in got:
            assert got[k] == est, k
    assert set(got) <= set(want)
    assert got, "watermark horizon swallowed every window"

    exact = {
        (r.w.start, r.event_type): r.n
        for r in batch.filter(F.col("user_id").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # θ=1/4 on small per-window audiences is noisy; the bound here is the
    # sketch's own ±4/θ·sqrt band, asserted loosely: estimates stay within
    # max(16, 3x) of exact — a broken sample or scale factor lands far out
    for k, (end, est) in want.items():
        ex = exact[k]
        assert est <= max(16, 3 * ex) and (est >= ex / 3 or ex <= 16), (k, est, ex)


def test_stream_txn_dedup_is_app_scoped_and_dml_proof(spark, tmp_path):
    """Delta txnAppId parity for the streaming sinks' replay dedup:
    (1) two DIFFERENT streams (distinct checkpoints) writing one table
    must both land their batch 0 — a batch-id-only stamp would false-
    dedupe the second stream; (2) a replay must be detected even when a
    DML commit landed between the crash and the replay — the old probe
    walked appends only and stopped at the first non-append."""
    import customer_activity_lakehouse_spark.streaming.streams as S
    from customer_activity_lakehouse_spark.sources.snapshots import (
        merge_snapshot,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    fns = {}
    orig = S.write_stream_foreach_batch

    def capture(df, fn, ck, **kw):
        fns[ck] = fn

        class _Done:
            def awaitTermination(self, *_):
                return True

        return _Done()

    S.write_stream_foreach_batch = capture
    try:
        S.write_stream_snapshot_append(
            spark.range(0, 1).selectExpr("id", "id AS v"),
            t, str(tmp_path / "ckA"), stats_cols=["id"],
        )
        S.write_stream_snapshot_append(
            spark.range(0, 1).selectExpr("id", "id AS v"),
            t, str(tmp_path / "ckB"), stats_cols=["id"],
        )
    finally:
        S.write_stream_foreach_batch = orig
    fnA, fnB = fns[str(tmp_path / "ckA")], fns[str(tmp_path / "ckB")]

    batchA = spark.createDataFrame([(1, 10)], "id long, v long")
    batchB = spark.createDataFrame([(2, 20)], "id long, v long")
    fnA(batchA, 0)
    fnB(batchB, 0)  # same batch id, different app → must land too
    assert {r.id for r in read_snapshot(spark, t).collect()} == {1, 2}

    # a MERGE lands between stream A's commit and its replay of batch 0;
    # the replay must still be recognized (no duplicate id=1 row)
    merge_snapshot(
        spark, t, spark.createDataFrame([(3, 30)], "id long, v long"), ["id"],
        stats_cols=["id"],
    )
    fnA(batchA, 0)  # replay
    rows = [r.id for r in read_snapshot(spark, t).collect()]
    assert sorted(rows) == [1, 2, 3], rows
    # and a genuinely new batch still applies
    fnA(spark.createDataFrame([(4, 40)], "id long, v long"), 1)
    assert {r.id for r in read_snapshot(spark, t).collect()} == {1, 2, 3, 4}


def test_stream_ingest_dedup_composed_sink(spark, tmp_path):
    """The composed ingest+dedup sink (write_stream_ingest_dedup): a
    document stream lands in a versioned corpus, the MinHash band index
    follows through the change feed, and every micro-batch's candidate
    dup pairs persist to a pairs table — exactly-once across a full
    checkpoint-wiped replay (same app_id ⇒ corpus appends skip on the
    (app, batch) stamp, maintenance no-ops on the consumed stamp)."""
    import json

    from customer_activity_lakehouse_spark.sources.snapshots import (
        _list_versions,
        read_snapshot,
    )
    from customer_activity_lakehouse_spark.streaming import write_stream_ingest_dedup

    landing = tmp_path / "landing"
    landing.mkdir()
    root = str(tmp_path)
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "a completely different document about distributed query engines"
    text_c = "snapshot logs give exactly once ingest semantics for free text"
    files = [
        [(1, text_a), (2, text_b)],
        [(3, text_a), (4, text_c)],
        [(5, text_c), (6, text_c)],
    ]
    for i, rows in enumerate(files):
        with open(landing / f"f{i}.json", "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
        )
        q = write_stream_ingest_dedup(
            stream, f"{root}/corpus", f"{root}/idx", f"{root}/pairs",
            f"{root}/ckpt_ingest_dedup",
        )
        q.awaitTermination(180)
        assert not q.isActive

    run()
    assert read_snapshot(spark, f"{root}/corpus").count() == 6
    # exact-copy groups {1,3} and {4,5,6}: the reported orientation is
    # (larger id, smaller id) whether the pair lands cross-batch or
    # within-batch, so the expected set is batching-invariant
    want = {(3, 1), (5, 4), (6, 4), (6, 5)}
    got = {
        (r.new_doc, r.dup_of)
        for r in read_snapshot(spark, f"{root}/pairs").collect()
    }
    assert got == want
    bands = read_snapshot(spark, f"{root}/idx/bands")
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == set(range(1, 7))
    corpus_versions = _list_versions(spark, f"{root}/corpus")
    pairs_versions = _list_versions(spark, f"{root}/pairs")

    # full replay: wipe the checkpoint, same path (= same app_id) — every
    # micro-batch re-fires and every commit class must dedupe itself
    import shutil

    shutil.rmtree(f"{root}/ckpt_ingest_dedup")
    run()
    assert _list_versions(spark, f"{root}/corpus") == corpus_versions
    assert _list_versions(spark, f"{root}/pairs") == pairs_versions
    assert {
        (r.new_doc, r.dup_of)
        for r in read_snapshot(spark, f"{root}/pairs").collect()
    } == want


def test_streaming_wap_into_branch_then_publish(spark, sf_smoke, events_dir):
    """Write-audit-publish for a STREAM: micro-batches land on a branch
    (parent readers never see partial ingest), audit the branch, publish
    atomically — refs.py composed with the exactly-once snapshot sink."""
    from customer_activity_lakehouse_spark.sources.refs import (
        branch_dir,
        create_branch,
        publish_branch,
    )
    from customer_activity_lakehouse_spark.sources.snapshots import (
        commit_append,
        read_snapshot,
    )
    from customer_activity_lakehouse_spark.streaming import (
        write_stream_snapshot_append,
    )

    landing, root = events_dir
    batch = events_table(spark, sf_smoke)
    seed = batch.limit(0)  # schema-only parent: ingest lands via WAP
    t = f"{root}/wap_parent"
    commit_append(spark, t, seed)
    create_branch(spark, t, "ingest")
    stream = read_events_stream(spark, landing, max_files_per_trigger=2)
    q = write_stream_snapshot_append(
        stream, branch_dir(t, "ingest"), f"{root}/ckpt_wap"
    )
    q.awaitTermination(120)
    assert not q.isActive
    # parent saw NOTHING during ingest; branch holds the full stream
    assert read_snapshot(spark, t).count() == 0
    want = batch.count()
    assert read_snapshot(spark, branch_dir(t, "ingest")).count() == want
    publish_branch(spark, t, "ingest")
    assert read_snapshot(spark, t).count() == want
