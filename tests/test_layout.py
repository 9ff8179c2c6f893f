"""Z-order layout tests: footer-stat pruning is measured directly from the
parquet files pyarrow sees — the same min/max stats any engine's file
pruner uses — so the benefit is asserted, not assumed."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.sources.layout import write_zordered


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(#files whose [min,max] for col overlaps [lo,hi], #files total)."""
    hit, total = 0, 0
    for f in Path(path).glob("*.parquet"):
        total += 1
        fmin, fmax = None, None
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


def _dataset(spark, n=200_000):
    """Two independent pseudo-random dims (hash-derived: deterministic,
    replay-safe, no rand())."""
    return spark.range(n).select(
        F.col("id"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % 10_000).alias("x"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % 10_000).alias("y"),
    )


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    df = _dataset(spark)
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], num_files=32)
    # baseline: linear sort by x (the best single-column layout)
    df.repartitionByRange(32, F.col("x")).sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(lpath)

    # content identical in both layouts
    z = spark.read.parquet(zpath)
    assert z.count() == df.count()
    assert z.select(F.sum("x"), F.sum("y")).collect() == df.select(
        F.sum("x"), F.sum("y")
    ).collect()

    # a 5% box on y ALONE: the linear-x layout spreads every y everywhere,
    # the z-order layout confines it to ~sqrt-fraction of files
    z_hit, z_tot = _files_overlapping(zpath, "y", 1000, 1500)
    l_hit, l_tot = _files_overlapping(lpath, "y", 1000, 1500)
    assert z_tot >= 16 and l_tot >= 16
    assert l_hit >= l_tot * 0.9, "baseline sanity: linear-x layout cannot prune on y"
    assert z_hit <= z_tot * 0.5, (
        f"z-order should prune most files on y: {z_hit}/{z_tot} vs linear {l_hit}/{l_tot}"
    )

    # and it still prunes on x (not as tightly as a pure x-sort, but far
    # better than nothing)
    zx_hit, _ = _files_overlapping(zpath, "x", 1000, 1500)
    assert zx_hit <= z_tot * 0.5


def test_zorder_key_locality_smoke(spark):
    """Neighbors in value space share z-key prefixes: the average z-key gap
    between x-adjacent points must be far below the keyspace span (weak but
    deterministic locality check, no files involved)."""
    from customer_activity_lakehouse_spark.sources.layout import zorder_key

    df = spark.range(256).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 256).alias("y")
    )
    keyed = df.select(
        "x", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
    ).orderBy("x")
    rows = keyed.collect()
    assert len({r.z for r in rows}) == 256  # distinct points -> distinct keys
    span = max(r.z for r in rows) - min(r.z for r in rows)
    gaps = [abs(b.z - a.z) for a, b in zip(rows, rows[1:])]
    assert sum(gaps) / len(gaps) < span / 4
