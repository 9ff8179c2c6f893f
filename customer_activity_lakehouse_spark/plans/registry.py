"""Query registry plumbing shared by the catalog modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One catalog entry.

    fn      : (spark, sf_dir) -> DataFrame — the Spark plan.
    oracle  : equivalent DuckDB SQL over the pre-registered views
              (region nation customer supplier part orders lineitem events
              documents embeddings), or None for non-SQL-expressible ops
              (driver then records a weaker rows-only check).
    tags    : free-form labels ("tpch", "window", "dedup", ...).
    bench   : include in bench.py's headline set.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events_table(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects. Read the nanos as long and rebuild a microsecond
    timestamp via integer division — `DIV 1000`, not `/1000`, because
    epoch-nanos (~1.7e18) exceed the 2^53 double mantissa and a fp division
    would corrupt low bits.

    Requires ``spark.sql.legacy.parquet.nanosAsLong=true`` on the session —
    set by ``get_spark`` (session.py) and by the driver-contract pinning in
    ``__spark_entry__._pin_session``. NOT set here: a runtime ``conf.set``
    inside a reader mutates the shared session under every other thread
    planning a query (the cross-thread-leak class write_incremental avoids
    with its per-writer option)."""
    from pyspark.sql import functions as F

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
