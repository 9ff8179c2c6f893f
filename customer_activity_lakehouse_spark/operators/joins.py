"""Join strategies for the two failure modes big clusters actually hit:
skewed keys (one straggler task holds the job) and repeated fact⋈fact
shuffles (the same TBs re-hashed every query).

The reference has no joins of its own (SURVEY.md §2.4) — its star schema
exists to be joined by the query layer — so these are the engine-side
primitives that keep those implied joins healthy at 100 TB:

- ``salted_join``: explicit skew salting for when AQE's runtime skew-split
  (spark.sql.adaptive.skewJoin, on in session.py) can't help — e.g. a
  single hot key inside one partition, or a build side that must shuffle.
- ``write_bucketed`` / bucketed reads: pre-shuffle a table once into N
  sorted buckets so every later equi-join on that key is exchange-free
  (SortMergeJoin with zero Exchange on the bucketed sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SALT_COL = "__salt"


def _hashable(dt: T.DataType) -> bool:
    """Whether xxhash64 accepts the type. MapType is rejected outright
    (unordered — no canonical byte form), including nested inside arrays
    or structs; everything else Spark hashes fine."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def salt_column(df: DataFrame, n: int, cols: list[str] | None = None):
    """Deterministic per-row salt in [0, n): ``pmod(xxhash64(*cols), n)``.

    Deterministic matters at scale: ``F.rand`` re-draws on task RETRY, so a
    replayed task can re-salt its rows differently mid-join and silently
    drop/duplicate matches. Hashing the row's own columns costs the same
    one projection and is replay-safe.

    ``cols`` defaults to every hashable column (MapType — which xxhash64
    rejects — is skipped, nested or not). Spread quality is bounded by the
    DISTINCT VALUE COMBINATIONS of the salt source: rows identical across
    all hashed columns share a salt, so a hot key whose rows carry few
    distinct attribute combos collapses into few sub-buckets and the skew
    mitigation degrades. When the hot key's payload is low-cardinality,
    pass ``cols`` naming a high-cardinality column (an id, a timestamp) —
    or dedup exact duplicates upstream (operators/curate.py D1).
    """
    use = [c for c in (cols or df.columns) if cols or _hashable(df.schema[c].dataType)]
    if not use:
        raise ValueError(
            "salt_column found no hashable columns (all MapType?); pass cols= "
            "naming hashable salt-source columns"
        )
    return F.pmod(F.xxhash64(*[F.col(c) for c in use]), F.lit(int(n))).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt_buckets``
    sub-keys. The big side gets a deterministic per-row salt (one narrow
    projection, no extra shuffle beyond the join's own — see
    :func:`salt_column`); the small side is replicated ``salt_buckets``×
    via an explode (rows × buckets — only acceptable because the salted
    side of a skew join is by definition the small one). Join key becomes
    (on, salt), so a key holding k rows shuffles into ``salt_buckets``
    tasks of ~k/buckets instead of one.

    Correctness: every big row holds exactly one salt value and the small
    side holds ALL salt values per key, so matches are preserved exactly;
    inner/left semantics unchanged. Right/full would drop the replication
    invariant (small-side rows must not multiply in the output) — rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, df in (("big", big), ("small", small)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"salted_join reserves column {SALT_COL!r}, present on the {side} side — "
                "rename it before salting"
            )
    n = max(2, int(salt_buckets))
    big_s = big.withColumn(SALT_COL, salt_column(big, n, cols=salt_cols))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    return big_s.join(small_s, [on, SALT_COL], how).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) by ``key`` — the
    pay-once co-location layout: both sides of a future join bucketed to
    the same (key, n_buckets) join with NO Exchange, and bucket-sorted
    files skip the per-task sort of SortMergeJoin too. This is the batch
    answer to 'the same join shuffles 100 TB every night'."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact⋈dimension with the SIZE-AWARE broadcast policy (VERDICT r6 #2)
    — the doctrine every catalog plan follows:

    - FIXED-CARDINALITY frames keep an unconditional ``F.broadcast`` at
      the call site: nation (25 rows), region (5), K centroids, quantile
      cuts, band tables, single-row totals, bounded probe/query sets,
      month-offset tables. Their size is a constant of the SCHEMA, not of
      the data volume — broadcasting them is correct at every scale and
      the hint saves AQE a stats round-trip.
    - SCALE-PROPORTIONAL tables (customer, supplier, part, and anything
      derived row-per-entity from them — segment maps, per-key thresholds,
      drop lists) go through THIS helper, un-hinted. At every testable SF
      AQE broadcasts them anyway (identical plan, identical results), but
      these tables grow with the data: at a true 100 TB (customer ≈ 1.5 B
      rows) a hard ``F.broadcast(cust)`` is a driver/executor OOM, not a
      slow plan. Un-hinted, AQE chooses broadcast while the dim's RUNTIME
      size fits ``spark.sql.autoBroadcastJoinThreshold`` and degrades to a
      co-shuffled join beyond it — the only strategy that survives every
      scale-up.

    The helper is deliberately a plain ``join``: its value is the call
    site marking which side of the doctrine a dimension is on, so a
    hard-broadcast of a scale-proportional table can never hide in plan
    code again.
    """
    return fact.join(dim, on, how)
