"""Multi-dimensional data layout: Z-order (Morton) clustering for writes.

The lakehouse analog of Delta's ``OPTIMIZE ZORDER BY`` / Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')``:
rows are sorted by the bit-interleaved (Morton) code of their bucketized
column values before writing, so every output file covers a small HYPERCUBE
of the value space instead of a thin slab of one column. Parquet footers
then carry tight min/max on EVERY z-ordered column and a reader pruning on
any of them (alone or combined) skips most files — a linear sort gives that
property for its leading column only.

All computation is JVM-side column arithmetic (shift/or/floor — no UDFs, no
collect): per-column min/max ride a broadcast 1-row aggregate, bucketize is
one projection, and the only wide operation is the final range repartition
by z-key (which any clustered write needs). Scale shape: one extra scan for
the min/max agg + one range shuffle — the same cost profile as Delta's
OPTIMIZE, and it composes with hive partitioning (z-order within each
partition by listing the partition key first in ``repartitionByRange``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # buckets per dimension = 2^bits; 8 -> 256 is plenty for file-level pruning


def _bucketize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Value -> integer bucket in [0, 2^bits): rank-free min/max scaling
    (one broadcast row, no global sort). Constant columns land in bucket 0."""
    span = cmax.cast("double") - cmin.cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (top + F.lit(1))).cast("long"), top.cast("long"))


def zorder_key(buckets: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of per-dimension bucket ids: bit ``b`` of dimension
    ``d`` lands at position ``b * ndims + d``. Pure shift/and/or column
    arithmetic — whole-stage codegen, no Python."""
    ndims = len(buckets)
    key = F.lit(0).cast("long")
    for d, bucket in enumerate(buckets):
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(bucket, b).bitwiseAND(F.lit(1)), b * ndims + d)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    1. One pass computes min/max per z-column (broadcast 1-row aggregate).
    2. Each row gets its Morton key (projection, codegen).
    3. ``repartitionByRange(zkey)`` + in-partition sort cluster the rows so
       each file covers a contiguous z-range = a small hypercube.
    ``num_files`` bounds the output file count (defaults to the session's
    shuffle parallelism); ``max_records_per_file`` further splits hot files.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    buckets = [
        _bucketize(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits) for c in cols
    ]
    keyed = with_stats.withColumn("__zkey", zorder_key(buckets, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    parts = [F.col("__zkey")]
    ranged = (
        keyed.repartitionByRange(num_files, *parts)
        if num_files is not None
        else keyed.repartitionByRange(*parts)
    )
    writer = ranged.sortWithinPartitions("__zkey").drop("__zkey").write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
