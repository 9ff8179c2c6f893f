"""Incremental materialized aggregates over the snapshot log's change feed.

The lakehouse pattern Delta ships as DLT materialized views: a per-key
aggregate table maintained from the SOURCE's row-level changes — never
recomputed from scratch. Each maintenance run folds the unconsumed change
feed into signed per-key deltas (insert/update_post = +1, delete/
update_pre = −1), converts them to absolute rows against the current
aggregate, and MERGEs them in. Cost per run is O(|changes| + |touched
aggregate keys|), independent of source size — THE reason materialized
views work at 100 TB (a day of changes maintains an all-time rollup).

Exactly-once without a side cursor: every aggregate commit records
``mv_consumed_version`` (the source version the maintenance read through)
in its own manifest — the streaming sink's batch-id trick. A maintainer
that dies before committing left no trace (replay is safe); one that dies
after committing is visible to the next run, which resumes from the
recorded version. Additive application is NOT idempotent, so this
transactional coupling is load-bearing — an at-least-once cursor would
double-count.

Float caveat (any incremental MV has it): additive maintenance is exact
for integer/decimal measures; float measures accumulate different rounding
than a recompute. Tests pin exactness on integer measures.

Reference: the reference pipeline recomputes its curated zone in full each
run (data_processing.py:217) — incremental view maintenance is
beyond-reference surface with Delta/DLT as the public model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import (
    _list_versions,
    _read_manifest,
    commit_append,
    commit_overwrite,
    merge_snapshot,
    read_snapshot,
    snapshot_change_feed,
)

_N_COL = "n_rows"  # per-key surviving-row count; 0 ⇒ key leaves the aggregate


def stamped_version(spark: SparkSession, table_dir: str, key: str) -> int:
    """Most recent value of a consumption stamp (``key``) in ``table_dir``'s
    commit log — walks raw commit records newest-first, so the stamp
    SURVIVES interleaved commits that don't carry it (a compaction or a
    bloom-spec commit between maintenance runs previously reset the
    cursor to 0, and an MV cursor reset double-folds the whole feed).
    Raw records carry their metadata verbatim (the `_read_commit`
    contract), so each probe is O(1); the walk is O(commits since the
    last stamp). Returns 0 when never stamped."""
    from .snapshots import _read_commit

    for v in reversed(_list_versions(spark, table_dir)):
        r = _read_commit(spark, table_dir, v)
        if key in r:
            return int(r[key])
    return 0


def _consumed_version(spark: SparkSession, agg_dir: str) -> int:
    """Source version the aggregate last consumed (0 ⇒ never
    maintained) — see :func:`stamped_version` for why this walks."""
    return stamped_version(spark, agg_dir, "mv_consumed_version")


def _stamp_only(
    spark: SparkSession, agg_dir: str, keys: list[str], extra: dict
) -> None:
    """Record consumption with NO data change (the unconsumed range held
    only data_change=false commits): an empty MERGE commits the version
    stamp alone, so the next run doesn't re-walk compactions."""
    cur = read_snapshot(spark, agg_dir)
    merge_snapshot(
        spark, agg_dir, cur.limit(0), keys, stats_cols=[keys[0]], extra=extra
    )


def net_change_feed(
    feed: DataFrame, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """NET a change feed per key for index maintenance (r10): returns
    ``(retract_keys, final_rows)`` —

    - ``retract_keys``: one-column frame of keys whose PRE-EXISTING index
      state is stale (any ``delete``/``update_preimage`` in the range —
      an update is retract-then-reinsert to a frozen-codebook index);
    - ``final_rows``: the feed row carrying each surviving key's LAST
      state (latest ``_commit_version``; at the shared update version the
      postimage wins), kept only when that last change is an ``insert``/
      ``update_postimage`` — a key inserted then deleted inside one range
      must not be indexed at all.

    Everything is O(|changes|): one window over the feed keyed by
    ``key_col``."""
    from pyspark.sql import Window

    retract = (
        feed.filter(F.col("change_type").isin("delete", "update_preimage"))
        .select(key_col)
        .distinct()
    )
    pri = F.when(
        F.col("change_type").isin("insert", "update_postimage"), 2
    ).otherwise(1)
    w = Window.partitionBy(key_col).orderBy(
        F.col("_commit_version").desc(), pri.desc()
    )
    final_rows = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("change_type").isin("insert", "update_postimage"))
        .drop("__rn")
    )
    return retract, final_rows


RETRACT_CHUNK = 10_000  # max IN-list size per DV-delete commit


def dv_retract(
    spark: SparkSession, table_dir: str, key_col: str, victims: list[int]
) -> None:
    """DV-mask ``victims``' rows out of an index table by integer key —
    the retraction half of index maintenance. Victims are sorted and
    CHUNKED (``RETRACT_CHUNK`` per delete commit): a single
    million-element ``IN (...)`` string would strain Catalyst's parser,
    while sorted chunks keep each commit's ``prune_where`` interval
    tight against the key stats. Idempotent at every boundary —
    re-deleting already-absent keys is a no-op, so a crash between
    chunks replays safely."""
    from .snapshots import delete_snapshot

    vs = sorted(set(victims))
    for i in range(0, len(vs), RETRACT_CHUNK):
        part = vs[i : i + RETRACT_CHUNK]
        delete_snapshot(
            spark,
            table_dir,
            f"{key_col} IN ({', '.join(str(v) for v in part)})",
            prune_where=(key_col, part[0], part[-1]),
            mode="dv",
        )


def _reject_null_keys(touched: DataFrame, keys: list[str], op: str) -> None:
    """MERGE key semantics are SQL's: NULL never matches NULL (Delta
    MERGE behaves identically), so a null-keyed aggregate row is
    unaddressable by maintenance — it would silently go stale (matched
    path) or duplicate (insert path). Fail loudly instead; the fix
    belongs in the view definition (``coalesce(k, <sentinel>)``)."""
    cond = None
    for k in keys:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    if touched.filter(cond).limit(1).collect():
        raise ValueError(
            f"{op}: change feed touches a NULL group key in {keys} — "
            "MERGE cannot address null-keyed aggregate rows (SQL null "
            "semantics); coalesce the grouping key in the view definition"
        )


def _apply_transform(df: DataFrame, transform) -> DataFrame:
    """Run the view-defining transform over change rows, enforcing its
    contract: ``change_type`` must survive (signs are assigned AFTER the
    transform — a dropped column would silently unsign the fold)."""
    out = transform(df)
    if "change_type" not in out.columns:
        raise ValueError(
            "mv transform must carry the change_type column through "
            "(it assigns each output row its source row's fold sign)"
        )
    return out


_FOLD_SIGNS = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def _signed_delta(feed: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    """Per-key signed fold. Unknown change types contribute to ``__bad``
    instead of raising here, so validation rides the SAME job as the fold
    (a row with a null sign nulls out of every sum — harmless, because
    ``_fold_feed`` raises before any __bad-carrying delta is applied)."""
    sign = (
        F.when(F.col("change_type").isin(*[k for k, s in _FOLD_SIGNS.items() if s == 1]), F.lit(1))
        .when(F.col("change_type").isin(*[k for k, s in _FOLD_SIGNS.items() if s == -1]), F.lit(-1))
        .otherwise(F.lit(None))
    )
    signed = feed.withColumn("__sign", sign)
    aggs = [F.sum(F.col(c) * F.col("__sign")).alias(c) for c in sum_cols]
    aggs.append(F.sum("__sign").cast("long").alias(_N_COL))
    aggs.append(
        F.sum(F.when(F.col("__sign").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("__bad")
    )
    return signed.groupBy(*keys).agg(*aggs)


def _fold_feed(
    feed: DataFrame, keys: list[str], sum_cols: list[str], op: str
) -> DataFrame | None:
    """Fold + validate in ONE evaluation: the signed delta is persisted
    (it is read again by the merge — without the cache the fold over the
    change batch would run three times: emptiness probe, null-key probe,
    merge write) and a single probe job checks change-type validity,
    null group keys, and emptiness. Returns the persisted delta (caller
    must unpersist) or None when the feed folds to nothing."""
    delta = _signed_delta(feed, keys, sum_cols).persist()
    nullk = None
    for k in keys:
        c = F.col(k).isNull()
        nullk = c if nullk is None else (nullk | c)
    p = delta.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__bad").alias("bad"),
        F.sum(F.when(nullk, 1).otherwise(0)).alias("nk"),
    ).collect()[0]
    if (p["bad"] or 0) > 0:
        try:
            bad = (
                feed.filter(~F.col("change_type").isin(*_FOLD_SIGNS))
                .select("change_type")
                .limit(1)
                .collect()
            )
            detail = bad[0]["change_type"] if bad else "?"
        finally:
            delta.unpersist()
        raise ValueError(f"unknown change_type in feed: {detail!r}")
    if p["n"] == 0:
        delta.unpersist()
        return None
    if (p["nk"] or 0) > 0:
        delta.unpersist()
        raise ValueError(
            f"{op}: change feed touches a NULL group key in {keys} — "
            "MERGE cannot address null-keyed aggregate rows (SQL null "
            "semantics); coalesce the grouping key in the view definition"
        )
    return delta


def maintain_sum_aggregate(
    spark: SparkSession,
    src_dir: str,
    agg_dir: str,
    keys: list[str],
    sum_cols: list[str],
    transform=None,
    partition_by: list[str] | None = None,
) -> int | None:
    """Advance the materialized SUM/COUNT aggregate at ``agg_dir`` to
    reflect ``src_dir``'s latest version. Returns the source version
    consumed, or None when already current.

    Aggregate schema: ``keys + sum_cols + n_rows`` — each ``sum_cols``
    entry holds the per-key SUM of the source column, ``n_rows`` the
    surviving row count (AVG = sum/n downstream; keys whose count reaches
    0 are deleted). ``partition_by`` lays the aggregate out hive-style
    (bootstrap/resync declare it; every maintenance MERGE inherits the
    layout from the manifest) so partition-scoped reads of the MV prune
    to one partition's files.

    ``transform`` (optional, DataFrame -> DataFrame) defines the view
    over the source BEFORE aggregation — this is how an MV over a JOIN is
    maintained (DLT's fact-⋈-dim rollup): it is applied to the feed's
    change rows and folded with their signs, so it MUST be row-local and
    deterministic — each input row maps to its output rows independent
    of any other row and of WHEN it is evaluated. Broadcast joins to
    STATIC dimension tables, filters, projections, explodes qualify; a
    join to a dim that changes between maintenance runs does NOT (the
    preimage would re-join against the new dim — maintain such views by
    recompute, or snapshot the dim). The transform must carry the
    ``change_type`` column through (joins/filters/withColumn do; a
    select must include it) and must not read it.

    Maintenance plan, all on existing verbs: the change feed reads
    exactly the touched commits' files (O(|changes|)); the signed rollup
    is one partial agg to |touched keys| rows; absolutes come from a join
    against ONLY the touched keys' current rows (broadcast when small);
    the MERGE prunes the aggregate table to the files those keys live in.
    A range crossing an overwrite/restore (no row-level feed — Delta CDF
    contract) falls back to one full recompute, exactly as Delta MVs
    resync."""
    src_latest = max(_list_versions(spark, src_dir))
    v_from = _consumed_version(spark, agg_dir)
    if v_from >= src_latest:
        return None
    extra = {"mv_consumed_version": src_latest}

    def full_agg(snap: DataFrame) -> DataFrame:
        if transform is not None:
            snap = _apply_transform(snap.withColumn("change_type", F.lit("insert")),
                                    transform).drop("change_type")
        return snap.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.count(F.lit(1)).cast("long").alias(_N_COL),
        )

    if v_from == 0:
        # bootstrap: aggregate the current snapshot directly
        commit_append(
            spark, agg_dir, full_agg(read_snapshot(spark, src_dir)),
            stats_cols=[keys[0]], extra=extra, partition_by=partition_by,
        )
        return src_latest

    try:
        feed = snapshot_change_feed(spark, src_dir, v_from, src_latest)
    except ValueError:
        # overwrite/restore in range: no row-level feed — full resync
        commit_overwrite(
            spark, agg_dir, full_agg(read_snapshot(spark, src_dir)),
            stats_cols=[keys[0]], extra=extra, partition_by=partition_by,
        )
        return src_latest

    if transform is not None:
        feed = _apply_transform(feed, transform)
    delta = _fold_feed(feed, keys, sum_cols, "maintain_sum_aggregate")
    if delta is None:
        _stamp_only(spark, agg_dir, keys, extra)
        return src_latest
    try:
        apply_signed_delta(spark, agg_dir, delta, keys, sum_cols, extra)
    finally:
        delta.unpersist()
    return src_latest


def apply_signed_delta(
    spark: SparkSession,
    agg_dir: str,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    extra: dict,
) -> None:
    """MERGE a signed per-key delta frame (``keys + sum_cols + n_rows``)
    into the aggregate table: absolutes come from a left join against
    ONLY the touched keys' current rows; keys whose count reaches 0 are
    deleted; new keys insert. A missing aggregate table bootstraps from
    the delta alone (the CDC stream's first batch IS the initial snapshot
    as inserts — Delta CDF's startingVersion=0 contract)."""
    try:
        full = read_snapshot(spark, agg_dir)
    except FileNotFoundError:
        full = delta.limit(0)
    # additions widen decimals (dec(28,2)+dec(28,2) → dec(29,2)), which
    # would trip the merge's schema-drift gate — pin each measure back to
    # the type the bootstrap committed (headroom for 10 decimal digits of
    # row count over the source type; an overflow past THAT fails loudly)
    tgt = {f.name: f.dataType for f in full.schema.fields}
    cur = full.select(
        *keys,
        *[F.col(c).alias(f"__cur_{c}") for c in sum_cols],
        F.col(_N_COL).alias("__cur_n"),
    )
    absolute = (
        delta.join(cur, keys, "left")
        .select(
            *keys,
            *[
                (F.coalesce(f"__cur_{c}", F.lit(0)) + F.col(c))
                .cast(tgt[c])
                .alias(c)
                for c in sum_cols
            ],
            (F.coalesce("__cur_n", F.lit(0)) + F.col(_N_COL))
            .cast("long")
            .alias(_N_COL),
        )
    )
    merge_snapshot(
        spark,
        agg_dir,
        absolute,
        keys,
        stats_cols=[keys[0]],
        extra=extra,
        when_matched_delete=f"s.{_N_COL} = 0",
        when_not_matched_insert=f"{_N_COL} > 0",
    )


def maintain_recompute_aggregate(
    spark: SparkSession,
    src_dir: str,
    agg_dir: str,
    keys: list[str],
    agg_exprs: dict[str, str],
    partition_by: list[str] | None = None,
) -> int | None:
    """Materialized view for NON-ADDITIVE aggregates (MIN/MAX/
    count-distinct/...): signed folding cannot undo a deleted row's
    contribution to a MIN, so maintenance recomputes — but only the
    TOUCHED keys. ``agg_exprs`` maps output columns to SQL aggregate
    expressions over source rows (e.g. ``{"v_min": "min(v)"}``);
    ``n_rows`` is always appended.

    The 100 TB contract: the feed names which keys changed
    (O(|changes|)); the recompute scans the source pruned to the touched
    keys' [min, max] range via the manifest's own per-file stats
    (``skip_where``) then semi-joined to the exact key set — cost is
    O(|files containing touched keys|), not a table rescan. A day of
    changes against an all-time MIN/MAX rollup touches that day's keys'
    files only. Same exactly-once stamp + overwrite-resync discipline as
    :func:`maintain_sum_aggregate`.

    Delta/DLT is the public model (partial recompute of invalidated
    groups); the reference recomputes its curated zone wholesale each run
    (data_processing.py:217)."""
    src_latest = max(_list_versions(spark, src_dir))
    v_from = _consumed_version(spark, agg_dir)
    if v_from >= src_latest:
        return None
    extra = {"mv_consumed_version": src_latest}

    def full_agg(snap: DataFrame) -> DataFrame:
        return snap.groupBy(*keys).agg(
            *[F.expr(e).alias(c) for c, e in agg_exprs.items()],
            F.count(F.lit(1)).cast("long").alias(_N_COL),
        )

    if v_from == 0:
        commit_append(
            spark, agg_dir, full_agg(read_snapshot(spark, src_dir)),
            stats_cols=[keys[0]], extra=extra, partition_by=partition_by,
        )
        return src_latest
    try:
        feed = snapshot_change_feed(spark, src_dir, v_from, src_latest)
    except ValueError:
        commit_overwrite(
            spark, agg_dir, full_agg(read_snapshot(spark, src_dir)),
            stats_cols=[keys[0]], extra=extra, partition_by=partition_by,
        )
        return src_latest

    touched = feed.select(*keys).dropDuplicates(keys)
    # 1-row driver fetch, |touched| bounded by the change batch — the
    # same batch-sized bounds probe merge_snapshot's pruning uses
    b = touched.agg(
        F.min(keys[0]).alias("lo"),
        F.max(keys[0]).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count(keys[0]).alias("n_nonnull"),
    ).collect()[0]
    if b["n"] == 0:
        _stamp_only(spark, agg_dir, keys, extra)
        return src_latest
    if b["n"] > b["n_nonnull"] or len(keys) > 1:
        _reject_null_keys(touched, keys, "maintain_recompute_aggregate")
    pruned = read_snapshot(spark, src_dir, skip_where=(keys[0], b["lo"], b["hi"]))
    recomputed = full_agg(pruned.join(touched, keys, "left_semi"))
    # touched keys with no surviving source rows leave the aggregate
    absolute = touched.join(recomputed, keys, "left").select(
        *keys,
        *[F.col(c) for c in agg_exprs],
        F.coalesce(_N_COL, F.lit(0)).cast("long").alias(_N_COL),
    )
    merge_snapshot(
        spark,
        agg_dir,
        absolute,
        keys,
        stats_cols=[keys[0]],
        extra=extra,
        when_matched_delete=f"s.{_N_COL} = 0",
        when_not_matched_insert=f"{_N_COL} > 0",
    )
    return src_latest
