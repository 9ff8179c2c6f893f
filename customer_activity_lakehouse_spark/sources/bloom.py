"""Per-file Bloom-filter indexes for the snapshot log (Delta bloom parity).

[min, max] file stats prune range-shaped predicates, but they are useless
for point lookups on high-cardinality UNCLUSTERED keys: every file's
[min, max] on a uuid-ish column spans nearly the whole domain, so a
``skip_where`` equality probe keeps every file. Delta's answer is a
per-file bloom filter index stored OUTSIDE the log; same design here:

- **spec** — manifest metadata key ``"bloom": {"cols": [...], "m": bits,
  "k": hashes}`` (PHYSICAL column names: stable across renames), set via
  :func:`snapshots.set_bloom_filter` and carried with every commit like
  CHECK constraints. O(columns) per commit, never O(files).
- **build** — each write-class commit indexes its NEW files in one
  distributed, column-pruned pass: k positions per row via
  ``pmod(xxhash64(col, seed), m)`` (JVM-side, whole-stage codegen), the
  per-file distinct-position set via a map-side-combining ``collect_set``
  (bounded by m per file), bit-packed to m/8 bytes by an Arrow-batched
  pandas UDF. The driver only ever holds |new files in this batch| x m/8
  bytes — batch-sized, like the stats pass it rides beside.
- **storage** — ONE sidecar JSON per commit under ``<table>/_bloom/``;
  each covered file's stats entry carries the sidecar's relative path
  under the reserved ``__bloom`` key, so coverage replays through the
  segmented commit log's existing stats add/remove machinery and
  checkpoints stay O(files), not O(files x m). Files without coverage
  (written before the spec, or by the pure-Python DataSource writer) are
  simply always read.
- **probe** — ``read_snapshot(..., point_where={col: value})`` computes
  the value's k positions with a 1-row Spark job running the SAME
  expression the writer ran (exact hash parity by construction — no
  Python xxhash64 reimplementation to drift from the JVM's), loads each
  referenced sidecar once, and drops every covered file with any probe
  bit unset. Pruning is an optimization, never a filter: the caller
  still applies the real predicate.

At 100 TB: a point lookup on an order/customer/document key over ~10^6
files reads only true hits + ~fpp false positives instead of the full
table. Sizing: fpp ~= (1 - e^(-k*n/m))^k per file; the default m=2^20,
k=5 holds fpp below ~1% up to ~10^5 distinct keys per file — size m to
the table's rows-per-file at OPTIMIZE's target file size.

Reference: the reference has no indexing at all (its zones are re-read
wholesale, data_processing.py:217); public model is Delta's bloom filter
index (create-on-write, rewrite-to-backfill) re-expressed over this
repo's JSON snapshot log.
"""

from __future__ import annotations

import base64
import json
import re

import pandas as pd  # module-level: string type hints (PEP 563) must
# resolve against module globals when Spark infers the pandas UDF type

from pyspark.sql import DataFrame, SparkSession

SIDECAR_DIR = "_bloom"

# reserved stats key holding a file's sidecar pointer (beside __rows)
STATS_KEY = "__bloom"


def _norm(p: str) -> str:
    """Collapse URI-scheme spelling differences (``file:/x`` vs
    ``file:///x``) to the bare path, same as snapshots._file_stats."""
    return re.sub(r"^[a-zA-Z0-9+.-]+:/+", "/", p)


def _position_cols(cols: list[str], m: int, k: int):
    """k bloom positions per row per column, as one array<long> column
    each — ``pmod(xxhash64(col, seed), m)`` stays inside whole-stage
    codegen; seeds 0..k-1 give k independent hash functions."""
    from pyspark.sql import functions as F

    return {
        c: F.array(
            *[F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(m)) for i in range(k)]
        )
        for c in cols
    }


def file_blooms(
    spark: SparkSession, files: list[str], cols: list[str], m: int, k: int
) -> dict[str, dict[str, str]]:
    """``{file: {col: base64 bitmap}}`` for every bloom column present in
    ``files`` — one column-pruned scan per bloom column (spec sizes are
    1-2 columns). Null key values are excluded (a probe for None never
    prunes). The shuffle is bounded: collect_set's map-side partial
    already holds <= m positions per (task, file), and the pandas UDF
    packs bits executor-side so only m/8-byte bitmaps reach the driver."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(*files)
    present = [c for c in cols if c in df.columns]
    if not present:
        return {}

    @F.pandas_udf("binary")
    def _pack(ps: pd.Series) -> pd.Series:
        import numpy as np

        def one(positions):
            bits = np.zeros(m // 8, dtype=np.uint8)
            a = np.asarray(positions, dtype=np.int64)
            np.bitwise_or.at(
                bits, a >> 3, (np.uint8(1) << (a & 7).astype(np.uint8))
            )
            return bits.tobytes()

        return ps.map(one)

    pos = _position_cols(present, m, k)
    out: dict[str, dict[str, str]] = {}
    for c in present:
        rows = (
            df.where(F.col(c).isNotNull())
            .select(F.input_file_name().alias("__file"), pos[c].alias("__ps"))
            .select("__file", F.explode("__ps").alias("__p"))
            .groupBy("__file")
            .agg(F.collect_set("__p").alias("__set"))
            .select("__file", _pack("__set").alias("__bits"))
            .collect()
        )
        by_path = {_norm(r["__file"]): bytes(r["__bits"]) for r in rows}
        for f in files:
            bm = by_path.get(_norm(f))
            if bm is not None:
                out.setdefault(f, {})[c] = base64.b64encode(bm).decode()
    return out


def probe_positions(
    spark: SparkSession, values: list, typ: str | None, m: int, k: int
) -> list[list[int]]:
    """The k bloom positions for each probe value — computed by a 1-row
    Spark job running the writer's own expression over literals CAST TO
    THE COLUMN'S RECORDED TYPE (xxhash64 of int(1) and bigint(1) differ;
    the manifest schema's simpleString pins the type both sides hashed)."""
    from pyspark.sql import functions as F

    lits = []
    for v in values:
        lit = F.lit(v)
        if typ is not None:
            lit = lit.cast(typ)
        lits.append(
            F.array(*[F.pmod(F.xxhash64(lit, F.lit(i)), F.lit(m)) for i in range(k)])
        )
    row = spark.range(1).select(F.array(*lits).alias("p")).collect()[0]
    return [[int(x) for x in ps] for ps in row["p"]]


def might_contain(bitmap: bytes, positions: list[int]) -> bool:
    """All k bits set? False = the file definitely lacks the value."""
    return all(bitmap[p >> 3] & (1 << (p & 7)) for p in positions)


def sidecar_payload(blooms: dict[str, dict[str, str]], m: int, k: int) -> bytes:
    return json.dumps({"m": m, "k": k, "files": blooms}, indent=1).encode()


class SidecarCache:
    """Per-read lazy loader: each referenced sidecar is fetched and
    base64-decoded once; lookups key on normalized file path + column.
    Missing sidecars / files / columns return None — the caller must
    treat that as 'no evidence, read the file' (clones carry stats whose
    __bloom refs point at the SOURCE table's _bloom dir; a miss there
    degrades to a plain read, never a wrong prune)."""

    def __init__(self, read_bytes):
        self._read = read_bytes  # (relpath) -> bytes | None
        self._cars: dict[str, dict | None] = {}

    def bitmap(self, rel: str, file: str, col: str) -> bytes | None:
        car = self._cars.get(rel, False)
        if car is False:
            raw = self._read(rel)
            if raw is None:
                car = None
            else:
                parsed = json.loads(raw.decode())
                car = {
                    (_norm(f), c): base64.b64decode(b)
                    for f, cols in parsed["files"].items()
                    for c, b in cols.items()
                }
            self._cars[rel] = car
        if car is None:
            return None
        return car.get((_norm(file), col))
