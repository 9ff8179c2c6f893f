"""Snapshot log: time travel + optimistic concurrency over immutable parquet.

The one table-format capability ``tables.py`` could not emulate with plain
hive layouts is SNAPSHOTS — readers pinned to a version while writers
commit, and time travel to any retained version. This module implements the
core of the Delta/Iceberg commit protocol directly over parquet, with no
runtime jars (environment-blocked — README "Table formats"):

- Data files are IMMUTABLE: every commit writes a fresh ``data/v{n}-…``
  directory; nothing is ever modified in place.
- A commit is the ATOMIC RENAME of a manifest into ``_snapshots/v{n}.json``.
  Hadoop FS rename does not overwrite an existing destination, which gives
  OPTIMISTIC CONCURRENCY exactly as in Delta: two writers racing to the
  same version — one wins, the loser re-reads the log and retries at n+1
  (append commits) or aborts (overwrite commits, whose file list depends on
  what they read).
- Readers never list data dirs: they read the manifest's explicit file
  list, so half-written data from a crashed commit is invisible (debris
  removed by ``vacuum``).

Scale notes: a manifest holds one line per file — at 100 TB keep file
counts bounded with compaction (tables.compact) before this becomes the
metadata bottleneck (the point where real Delta/Iceberg's multi-level
manifests earn their complexity). All data I/O is ordinary distributed
parquet; only the tiny manifest JSON touches the driver.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .tables import _hadoop_fs

_SNAP_DIR = "_snapshots"
_MAX_COMMIT_RETRIES = 20


def _list_versions(spark: SparkSession, table_dir: str) -> list[int]:
    fs, jdir = _hadoop_fs(spark, f"{table_dir}/{_SNAP_DIR}")
    if not fs.exists(jdir):
        return []
    out = []
    for status in fs.listStatus(jdir):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(spark: SparkSession, table_dir: str, version: int) -> dict:
    fs, jpath = _hadoop_fs(spark, f"{table_dir}/{_SNAP_DIR}/v{version:05d}.json")
    stream = fs.open(jpath)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode())


def _write_data(df: DataFrame, table_dir: str, tag: str) -> str:
    path = f"{table_dir}/data/{tag}"
    df.write.mode("error").parquet(path)
    return path


def _data_files(spark: SparkSession, data_path: str) -> list[str]:
    fs, jdir = _hadoop_fs(spark, data_path)
    return sorted(
        str(s.getPath().toString())
        for s in fs.listStatus(jdir)
        if s.getPath().getName().endswith(".parquet")
    )


def _try_commit(spark: SparkSession, table_dir: str, version: int, manifest: dict) -> bool:
    """Write the manifest to a temp name, then atomically rename it to
    v{n}.json. Rename refuses an existing destination → losing a race
    returns False instead of clobbering the winner's commit."""
    fs, jdir = _hadoop_fs(spark, f"{table_dir}/{_SNAP_DIR}")
    fs.mkdirs(jdir)
    tmp = f"{table_dir}/{_SNAP_DIR}/.tmp-v{version:05d}-{id(manifest)}"
    _, jtmp = _hadoop_fs(spark, tmp)
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=1).encode()))
    finally:
        out.close()
    _, jfinal = _hadoop_fs(spark, f"{table_dir}/{_SNAP_DIR}/v{version:05d}.json")
    if fs.rename(jtmp, jfinal):
        return True
    fs.delete(jtmp, False)
    return False


def _file_stats(
    spark: SparkSession, files: list[str], stats_cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for ``stats_cols`` — ONE distributed pass over
    the new files using the parquet reader's file-name column; the result
    (|files| × |cols| tiny) is what the manifest stores for data skipping.
    Nulls are excluded from min/max (a file of all-null values gets
    [None, None] and is never skipped)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(*files).withColumn("__file", F.input_file_name())
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = df.groupBy("__file").agg(*aggs).collect()

    def js(v):
        # JSON-safe, order-preserving encoding: numbers stay numeric,
        # everything orderable-but-not-JSON (dates, timestamps, decimals)
        # becomes its string form — ISO date/timestamp strings compare in
        # the same order as the values, which is all skipping needs
        return v if v is None or isinstance(v, (int, float, str, bool)) else str(v)

    out: dict[str, dict[str, list]] = {}
    for r in rows:
        d = r.asDict()
        # input_file_name returns a URI; manifests store the same form the
        # lister produced, so normalize both to the URI's path part
        key = d["__file"]
        out[key] = {c: [js(d[f"__min_{c}"]), js(d[f"__max_{c}"])] for c in stats_cols}
    # re-key to the manifest's file strings: Hadoop's Path.toString() spells
    # the scheme "file:/x" while input_file_name() spells "file:///x" —
    # normalize both to the bare path before matching
    import re

    def norm(p: str) -> str:
        return re.sub(r"^[a-zA-Z0-9+.-]+:/+", "/", p)

    by_path = {norm(k): v for k, v in out.items()}
    return {f: by_path[norm(f)] for f in files if norm(f) in by_path}


def _schema_sig(df: DataFrame) -> list[list[str]]:
    """JSON-stable (name, dataType.simpleString) pairs — the schema
    identity manifests record and appends validate against. Nullability is
    deliberately excluded: parquet readers union it anyway."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def commit_append(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    allow_schema_evolution: bool = False,
    stats_cols: list[str] | None = None,
) -> int:
    """Append ``df`` as a new snapshot: new files = previous snapshot's
    files + this batch's. Retries on version races (append order does not
    depend on what the writer read, so retrying is always safe).

    Schema contract: the manifest records the table schema; an append whose
    (name, type) signature differs fails BEFORE writing unless
    ``allow_schema_evolution=True`` (the evolved signature is then
    recorded, and readers see parquet's union-by-name view). Without the
    gate a drifted append silently poisons every later read — parquet
    multi-file reads take the schema of an arbitrary file."""
    versions = _list_versions(spark, table_dir)
    sig = _schema_sig(df)
    if versions:
        prev_m = _read_manifest(spark, table_dir, versions[-1])
        prev_sig = prev_m.get("schema")
        if prev_sig is not None and prev_sig != sig and not allow_schema_evolution:
            raise ValueError(
                f"commit_append: schema drift at {table_dir} — table has "
                f"{prev_sig}, append has {sig}; pass allow_schema_evolution=True "
                "to record the evolved schema"
            )
    attempt = (versions[-1] if versions else 0) + 1
    # the staged dir name must be WRITER-unique, not just attempt-unique:
    # two appenders racing the same attempt number (threads in one driver,
    # or a retried crashed commit) must never collide at the parquet write
    # — the manifest rename is the only arbitration point
    data_path = _write_data(df, table_dir, f"v{attempt:05d}-{uuid.uuid4().hex[:12]}")
    new_files = _data_files(spark, data_path)
    new_stats = _file_stats(spark, new_files, stats_cols) if stats_cols else {}
    for _ in range(_MAX_COMMIT_RETRIES):
        versions = _list_versions(spark, table_dir)
        version = (versions[-1] if versions else 0) + 1
        if versions:
            prev_m = _read_manifest(spark, table_dir, versions[-1])
            prev_files = prev_m["files"]
            prev_stats = prev_m.get("stats", {})
        else:
            prev_files, prev_stats = [], {}
        manifest = {
            "version": version,
            "op": "append",
            "files": prev_files + new_files,
            "schema": sig,
        }
        if prev_stats or new_stats:
            manifest["stats"] = {**prev_stats, **new_stats}
        if _try_commit(spark, table_dir, version, manifest):
            return version
    raise RuntimeError(
        f"commit_append: lost {_MAX_COMMIT_RETRIES} version races at {table_dir}"
    )


def commit_overwrite(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
) -> int:
    """Replace the table contents as a new snapshot (old versions remain
    readable until vacuumed). On a version race this ABORTS instead of
    retrying — an overwrite validated against version n must not blindly
    clobber a concurrent n+1 (same rule as Delta's WriteSerializable)."""
    versions = _list_versions(spark, table_dir)
    version = (versions[-1] if versions else 0) + 1
    data_path = _write_data(df, table_dir, f"v{version:05d}-{uuid.uuid4().hex[:12]}")
    files = _data_files(spark, data_path)
    manifest = {
        "version": version,
        "op": "overwrite",
        "files": files,
        "schema": _schema_sig(df),
    }
    if stats_cols:
        manifest["stats"] = _file_stats(spark, files, stats_cols)
    if not _try_commit(spark, table_dir, version, manifest):
        raise RuntimeError(
            f"commit_overwrite: version {version} was committed concurrently at "
            f"{table_dir}; re-read the table and retry the overwrite"
        )
    return version


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    skip_where: tuple | None = None,
) -> DataFrame:
    """Read the table at ``version`` (default: latest). Reads exactly the
    manifest's file list — uncommitted/orphaned data is invisible.

    ``skip_where=(col, lo, hi)`` is manifest-level DATA SKIPPING (the
    Delta file-stats prune): files whose recorded [min, max] for ``col``
    cannot intersect [lo, hi] (None = open bound) are dropped from the
    read BEFORE Spark ever lists them. Files without recorded stats are
    always read (skipping is an optimization, never a filter) — the
    caller still applies the actual predicate; skipping only shrinks I/O."""
    versions = _list_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"snapshot v{v} not found at {table_dir} (have {versions})")
    manifest = _read_manifest(spark, table_dir, v)
    if not manifest["files"]:
        return spark.createDataFrame([], schema="__empty string").limit(0)
    files = manifest["files"]
    if skip_where is not None:
        col, lo, hi = skip_where
        stats = manifest.get("stats", {})

        def keep(f: str) -> bool:
            st = stats.get(f, {}).get(col)
            if not st or st[0] is None:
                return True  # no stats / all-null file: must read
            mn, mx = st
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
            return True

        files = [f for f in files if keep(f)]
        if not files:
            empty = spark.createDataFrame([], schema="__empty string").limit(0)
            sig = manifest.get("schema")
            if sig:
                ddl = ", ".join(f"`{n}` {t}" for n, t in sig)
                return spark.createDataFrame([], schema=ddl)
            return empty
    sig = manifest.get("schema")
    if sig:
        # The manifest's recorded schema is authoritative: an explicit-
        # schema read gives files written before an evolution their
        # missing columns as null WITHOUT mergeSchema's every-footer scan
        # (the scale-right alternative), and guarantees readers at any
        # version see that version's schema exactly.
        ddl = ", ".join(f"`{name}` {typ}" for name, typ in sig)
        return spark.read.schema(ddl).parquet(*files)
    return spark.read.parquet(*files)


def consume_appends(
    spark: SparkSession, table_dir: str, cursor_dir: str
) -> tuple[DataFrame | None, int]:
    """Checkpointed incremental consumption — the snapshot log as a batch
    stream source: returns (delta since the cursor, latest version),
    reading ONLY the files appended in between (the snapshot_changes fast
    path), or (None, version) when nothing new committed. Does NOT move
    the cursor: call :func:`advance_cursor` with the returned version
    AFTER the sink succeeds — a consumer that dies in between re-reads the
    same delta (at-least-once; pair with an idempotent sink like
    merge_upsert / merge_additive for exactly-once effect).

    This is incremental ETL without Structured Streaming: a cron-shaped
    job calls it per tick and gets Delta's ``readChangeFeed`` append
    contract from plain manifests. An overwrite inside the unconsumed
    range raises (via snapshot_changes needing key_cols) — the caller must
    resync, just as CDF consumers must on non-append history."""
    versions = _list_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    latest = versions[-1]
    last_seen = cursor_position(spark, cursor_dir)
    if latest <= last_seen:
        return None, last_seen
    if last_seen == 0:
        delta = read_snapshot(spark, table_dir, version=latest)
    else:
        delta = snapshot_changes(spark, table_dir, last_seen, latest).drop("change_type")
    return delta, latest


def cursor_position(spark: SparkSession, cursor_dir: str) -> int:
    """The last table version a consumer acknowledged (0 = nothing yet)."""
    cursor_versions = _list_versions(spark, cursor_dir)
    if not cursor_versions:
        return 0
    return _read_manifest(spark, cursor_dir, cursor_versions[-1])["consumed_version"]


def advance_cursor(spark: SparkSession, cursor_dir: str, version: int) -> None:
    """Acknowledge consumption THROUGH ``version``. The cursor is itself a
    tiny snapshot log (one atomic manifest rename per advance), so two
    consumers racing the same cursor cannot both win a version slot."""
    cursor_versions = _list_versions(spark, cursor_dir)
    cursor_v = (cursor_versions[-1] if cursor_versions else 0) + 1
    manifest = {
        "version": cursor_v,
        "op": "cursor",
        "files": [],
        "consumed_version": version,
    }
    if not _try_commit(spark, cursor_dir, cursor_v, manifest):
        raise RuntimeError(f"concurrent consumer advanced the cursor at {cursor_dir}")


def clone_snapshot(
    spark: SparkSession, src_dir: str, dst_dir: str, version: int | None = None
) -> int:
    """SHALLOW (zero-copy) clone — the Delta ``CREATE TABLE ... SHALLOW
    CLONE`` emulation: commit a v1 manifest at ``dst_dir`` referencing the
    SOURCE's data files at ``version`` (default latest). No data moves —
    clone cost is one manifest write regardless of table size, the
    dev/test-against-prod-data primitive. Writes at the clone commit new
    files under the CLONE's own dir (copy-on-write divergence); the
    clone's ``vacuum`` walks only its own data dir, so it can never delete
    source files.

    Caveat (same as Delta's): the SOURCE's vacuum does not know about
    clones — expiring the cloned version at the source deletes files the
    clone still references. Pin the source's retention while clones live.

    Refuses a non-empty destination (clones start at v1)."""
    if _list_versions(spark, dst_dir):
        raise FileExistsError(f"clone destination already has snapshots: {dst_dir}")
    versions = _list_versions(spark, src_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots to clone at {src_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"snapshot v{v} not found at {src_dir} (have {versions})")
    src = _read_manifest(spark, src_dir, v)
    manifest = {
        "version": 1,
        "op": "clone",
        "files": src["files"],
        "schema": src.get("schema"),
        "cloned_from": {"table": src_dir, "version": v},
    }
    if not _try_commit(spark, dst_dir, 1, manifest):
        raise RuntimeError(f"clone destination committed concurrently: {dst_dir}")
    return 1


def restore_snapshot(spark: SparkSession, table_dir: str, version: int) -> int:
    """Delta ``RESTORE TABLE ... TO VERSION`` parity: roll the table back
    by committing a NEW snapshot whose file list is the old version's —
    history is preserved (the bad versions stay time-travelable until
    vacuumed), readers flip atomically with the manifest rename, and a
    concurrent commit aborts the restore rather than being clobbered
    (an overwrite-class operation under the WriteSerializable rule)."""
    versions = _list_versions(spark, table_dir)
    if version not in versions:
        raise FileNotFoundError(
            f"snapshot v{version} not found at {table_dir} (have {versions})"
        )
    target = _read_manifest(spark, table_dir, version)
    new_v = versions[-1] + 1
    manifest = {
        "version": new_v,
        "op": "overwrite",
        "files": target["files"],
        "schema": target.get("schema"),
        "restored_from": version,
    }
    if not _try_commit(spark, table_dir, new_v, manifest):
        raise RuntimeError(
            f"restore_snapshot: version {new_v} was committed concurrently at "
            f"{table_dir}; re-read and retry"
        )
    return new_v


def vacuum(spark: SparkSession, table_dir: str, keep_last: int = 1) -> int:
    """Delete data files referenced ONLY by expired snapshots (and the
    expired manifests, and any orphaned data dirs from crashed commits).
    Returns the number of files deleted. Time travel remains available for
    the ``keep_last`` newest versions."""
    versions = _list_versions(spark, table_dir)
    if not versions:
        return 0
    keep = set(versions[-max(1, keep_last):])
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(spark, table_dir, v)["files"])
    fs, jdata = _hadoop_fs(spark, f"{table_dir}/data")
    deleted = 0
    if fs.exists(jdata):
        for d in fs.listStatus(jdata):
            statuses = list(fs.listStatus(d.getPath()))
            parquet = [
                (f, str(f.getPath().toString()))
                for f in statuses
                if str(f.getPath().getName()).endswith(".parquet")
            ]
            if not any(p in live for _, p in parquet):
                # whole batch dir is dead (incl. orphans from crashed
                # commits, whose _SUCCESS markers are junk too)
                fs.delete(d.getPath(), True)
                deleted += len(parquet)
                continue
            for f, p in parquet:
                if p not in live:
                    fs.delete(f.getPath(), False)
                    deleted += 1
    for v in versions:
        if v not in keep:
            _, jm = _hadoop_fs(spark, f"{table_dir}/{_SNAP_DIR}/v{v:05d}.json")
            fs.delete(jm, False)
    return deleted


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """CDC between two snapshot versions: the rows a downstream consumer
    must apply to move from ``v_from`` to ``v_to`` (default: latest).
    Output = the table's columns plus ``change_type`` in
    {'insert', 'update', 'delete'} (update/delete rows carry the NEW and
    OLD values respectively).

    Fast path — the one that matters at 100 TB: when every commit in
    (v_from, v_to] is an APPEND, the change set is exactly the data files
    added after v_from (manifest file-list difference). Those files are
    read directly — no join, no scan of the base table, cost proportional
    to the delta alone. This is the incremental-consumption contract
    Delta's CDF/Iceberg's incremental reads provide, recovered from plain
    manifests.

    General path (any overwrite in the range): requires ``key_cols``; the
    two snapshots meet in ONE co-partitioned full-outer hash join on the
    key, and rows classify as insert (no old), delete (no new), or update
    (both present, non-key columns differ under null-safe struct
    comparison). Keys must be unique per snapshot — the same contract as
    tables.merge_upsert.

    Beyond-reference extension (the reference's Dask ETL re-reads whole
    zones; ReadMe.md:99 defers incremental processing to future work)."""
    from pyspark.sql import functions as F

    versions = _list_versions(spark, table_dir)
    v_to = versions[-1] if v_to is None else v_to
    for v in (v_from, v_to):
        if v not in versions:
            raise FileNotFoundError(f"snapshot v{v} not found at {table_dir} (have {versions})")
    if v_to < v_from:
        raise ValueError(f"v_to={v_to} precedes v_from={v_from}")
    manifests = {v: _read_manifest(spark, table_dir, v) for v in versions if v_from < v <= v_to}
    if all(m["op"] == "append" for m in manifests.values()):
        old_files = set(_read_manifest(spark, table_dir, v_from)["files"])
        new_files = [f for f in _read_manifest(spark, table_dir, v_to)["files"] if f not in old_files]
        if not new_files:
            base = read_snapshot(spark, table_dir, v_to)
            return base.withColumn("change_type", F.lit("insert")).limit(0)
        return spark.read.parquet(*new_files).withColumn("change_type", F.lit("insert"))
    if not key_cols:
        raise ValueError(
            f"snapshot_changes {table_dir} v{v_from}->v{v_to} crosses an overwrite "
            "commit; row-level diff needs key_cols"
        )
    old = read_snapshot(spark, table_dir, v_from)
    new = read_snapshot(spark, table_dir, v_to)
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        F.struct(*val_cols).alias("old_vals"),
    )
    n = new.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        F.struct(*val_cols).alias("new_vals"),
    )
    cond = [o[f"k_{c}"].eqNullSafe(n[f"k_{c}"]) for c in key_cols]
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(o["old_vals"].isNull(), F.lit("insert"))
        .when(n["new_vals"].isNull(), F.lit("delete"))
        .when(~o["old_vals"].eqNullSafe(n["new_vals"]), F.lit("update"))
    )
    picked = F.coalesce(n["new_vals"], o["old_vals"])
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(n[f"k_{c}"], o[f"k_{c}"]).alias(c)
                for c in key_cols
            ],
            *[picked[c].alias(c) for c in val_cols],
            "change_type",
        )
    )
