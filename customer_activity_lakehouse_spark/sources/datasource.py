"""Spark 4 Python Data Source for the snapshot log: ``spark.read.format
("snapshot_log")`` and ``spark.readStream.format("snapshot_log")``.

This wires the module's commit protocol (:mod:`.snapshots`) into Spark's
own source API so the log composes with everything that speaks formats —
SQL ``CREATE TABLE ... USING``, Structured Streaming's offset/checkpoint
machinery, third-party tooling — without the caller importing this
package's functions:

- BATCH: one InputPartition per manifest data file (the natural 100 TB
  task granularity — Spark schedules |files| tasks, each a single
  pyarrow parquet scan yielding Arrow RecordBatches, vectorized end to
  end). Deletion vectors are applied per-file from the partition's own
  (tiny) deleted-row-index list; column mapping aliases physical file
  columns back to the logical schema; ``option("version", n)`` is time
  travel.
- STREAMING: the log becomes a real Structured Streaming SOURCE with
  exactly-once offset tracking — offsets are manifest versions (the same
  integers ``consume_appends`` checkpoints), ``partitions(start, end)``
  is the per-commit added-file list, and replayed ranges re-read
  identically because data files are immutable. Downstream this feeds
  watermarked windowed aggs / stateful ops like any Kafka topic would.
  Append-only contract: a DML commit in the range fails the stream
  loudly (use ``snapshots.consume_changes`` for CDC consumption) —
  Delta's streaming-source default.

Scale note: the JVM parquet scan (:func:`..snapshots.read_snapshot`)
remains the batch fast path — whole-stage codegen, pushdown, AQE. This
source's batch reader trades that for API interop (Arrow keeps it
vectorized, but rows cross the Python boundary); its STREAMING reader is
the capability that doesn't otherwise exist. Use read_snapshot in hot
analytics paths, the format for composition and streams.

Reference: the reference has no streaming and no source API — its Dask
ETL re-reads whole zones per run (data_processing.py, flows.py); this is
beyond-reference extension surface.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SNAP_DIR = "_snapshots"


def _localize(p: str) -> str:
    """Manifest file strings carry Hadoop's scheme spelling
    (``file:/x``); pyarrow and os want bare paths."""
    return re.sub(r"^file:/+", "/", p)


def _py_versions(table_dir: str) -> list[int]:
    d = os.path.join(_localize(table_dir), _SNAP_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _py_manifest(table_dir: str, version: int) -> dict:
    path = os.path.join(_localize(table_dir), _SNAP_DIR, f"v{version:05d}.json")
    with open(path, "rb") as fh:
        return json.loads(fh.read().decode())


def _arrow_type(t: str):
    """simpleString -> pyarrow type for the scalar types the log records.
    Nested types are refused loudly — use snapshots.read_snapshot (JVM
    path) for those tables."""
    import pyarrow as pa

    m = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if t in m:
        return m[t]
    dm = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if dm:
        return pa.decimal128(int(dm.group(1)), int(dm.group(2)))
    raise NotImplementedError(
        f"snapshot_log source: unsupported column type {t!r} "
        "(nested types: read via snapshots.read_snapshot)"
    )


@dataclass
class _FilePartition(InputPartition):
    """One manifest data file = one Spark task. Picklable and tiny: the
    per-file deleted row indices ride along (DVs are small by contract —
    compaction materializes them before they grow)."""

    file: str
    sig: list  # [[logical_name, simpleString], ...] — the read schema
    colmap: dict | None  # logical -> physical (None = unmapped)
    deleted: list = field(default_factory=list)  # sorted row indices


def _read_file_partition(p: _FilePartition):
    """Executor-side: pyarrow scan -> drop DV'd rows -> physical->logical
    aliasing -> cast to the declared schema -> Arrow batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(_localize(p.file))
    if p.deleted:
        mask = [True] * table.num_rows
        for i in p.deleted:
            if i < len(mask):
                mask[i] = False
        table = table.filter(pa.array(mask))
    arrays, fields = [], []
    for logical, t in p.sig:
        phys = (p.colmap or {}).get(logical, logical)
        at = _arrow_type(t)
        if phys in table.column_names:
            arrays.append(table.column(phys).cast(at))
        else:
            # pre-evolution file: the column reads as null (the same
            # explicit-schema contract as the JVM path)
            arrays.append(pa.nulls(table.num_rows, type=at))
        fields.append(pa.field(logical, at))
    out = pa.table(arrays, schema=pa.schema(fields))
    yield from out.to_batches(max_chunksize=1 << 16)


def _dv_index(dv_files: list[str]) -> dict[str, list[int]]:
    """file -> sorted deleted row indices, from the manifest's DV files
    (driver-side, |deleted rows|-sized by contract)."""
    import pyarrow.parquet as pq

    out: dict[str, list[int]] = {}
    for f in dv_files:
        t = pq.read_table(_localize(f), columns=["file_path", "row_index"])
        for fp, ri in zip(
            t.column("file_path").to_pylist(), t.column("row_index").to_pylist()
        ):
            out.setdefault(_localize(fp), []).append(ri)
    return {k: sorted(v) for k, v in out.items()}


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, table_dir: str, version: int | None):
        versions = _py_versions(table_dir)
        if not versions:
            raise FileNotFoundError(f"no snapshots at {table_dir}")
        v = versions[-1] if version is None else version
        if v not in versions:
            raise FileNotFoundError(
                f"snapshot v{v} not found at {table_dir} (have {versions})"
            )
        self._m = _py_manifest(table_dir, v)

    def partitions(self):
        m = self._m
        sig = m.get("schema") or []
        colmap = m.get("colmap")
        dvs = _dv_index(m.get("dv_files", []))
        return [
            _FilePartition(f, sig, colmap, dvs.get(_localize(f), []))
            for f in m["files"]
        ]

    def read(self, partition):
        yield from _read_file_partition(partition)


class _SnapshotStreamReader(DataSourceStreamReader):
    """Offsets are manifest versions — the atomic-rename commit points —
    so a micro-batch is exactly the files some range of commits appended,
    and any offset range replays byte-identically (files are immutable,
    manifests only expire via vacuum)."""

    def __init__(self, table_dir: str):
        self._dir = table_dir

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        versions = _py_versions(self._dir)
        return {"version": versions[-1] if versions else 0}

    def partitions(self, start: dict, end: dict):
        v0, v1 = start["version"], end["version"]
        versions = _py_versions(self._dir)
        parts: list[_FilePartition] = []
        prev_files: set[str] = set()
        if v0 and v0 in versions:
            prev_files = set(_py_manifest(self._dir, v0)["files"])
        for v in versions:
            if not (v0 < v <= v1):
                continue
            m = _py_manifest(self._dir, v)
            if m["op"] != "append" and m.get("data_change") is not False:
                raise ValueError(
                    f"snapshot_log stream: v{v} at {self._dir} is op="
                    f"{m['op']!r} (a data change that is not an append); "
                    "this source is append-only — consume DML via "
                    "snapshots.consume_changes"
                )
            sig = m.get("schema") or []
            colmap = m.get("colmap")
            if m["op"] == "append":
                parts.extend(
                    _FilePartition(f, sig, colmap)
                    for f in m["files"]
                    if f not in prev_files
                )
            prev_files = set(m["files"])
        return parts

    def read(self, partition):
        yield from _read_file_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's own checkpoint


class SnapshotLogDataSource(DataSource):
    """``spark.dataSource.register(SnapshotLogDataSource)`` then
    ``spark.read.format("snapshot_log").option("path", dir).load()`` /
    ``spark.readStream.format("snapshot_log")...``. Options: ``path``
    (required), ``version`` (batch time travel)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_log"

    def _dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_log source requires option('path', ...)")
        return path

    def schema(self) -> str:
        table_dir = self._dir()
        versions = _py_versions(table_dir)
        if not versions:
            raise FileNotFoundError(f"no snapshots at {table_dir}")
        v = int(self.options.get("version", versions[-1]))
        sig = _py_manifest(table_dir, v).get("schema")
        if not sig:
            raise ValueError(f"no recorded schema at {table_dir}")
        return ", ".join(f"`{n}` {t}" for n, t in sig)

    def reader(self, schema) -> DataSourceReader:
        v = self.options.get("version")
        return _SnapshotBatchReader(self._dir(), int(v) if v is not None else None)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SnapshotStreamReader(self._dir())
