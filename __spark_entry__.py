"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship star rollup at sf0.001 (smoke).
``queries()``    — every implemented operator from SURVEY.md §2 + the
                   LLM-pipeline extensions, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names, same
                   rounding) for the sf0.01 correctness gate.

The catalog itself lives in customer_activity_lakehouse_spark.plans.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from customer_activity_lakehouse_spark.plans import QUERIES  # noqa: E402


def _pin_session(spark: SparkSession) -> None:
    """Pin the (driver-owned) session: UTC so date/timestamp formatting is
    deterministic and matches the DuckDB oracle's naive timestamps, and
    nanosAsLong so the TIMESTAMP(NANOS) events fixture is readable. This is
    the one sanctioned mutation point for sessions the engine did not build;
    sessions from ``get_spark`` carry both already."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session(spark)
    return QUERIES["revenue_by_brand_month"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(q.fn) for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
