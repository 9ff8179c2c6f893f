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


_PKG_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on PYTHON WORKERS. Arrow operators whose
    closures reference package globals (mapInPandas decode in
    multimodal/media.py) are pickled BY REFERENCE to the module, so the
    worker must `import customer_activity_lakehouse_spark` — which fails
    when the driver process found the repo via sys.path manipulation only
    (exactly how the external driver runs this file, from an arbitrary
    cwd). addPyFile with a package zip is the runtime-safe fix: env-based
    PYTHONPATH can't be changed after the session starts, and it works
    identically on a real cluster."""
    sc = spark.sparkContext
    if id(sc) in _PKG_SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_root = _REPO / "customer_activity_lakehouse_spark"
    zip_path = Path(tempfile.gettempdir()) / "customer_activity_lakehouse_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in sorted(pkg_root.rglob("*.py")):
            zf.write(p, str(p.relative_to(_REPO)))
    sc.addPyFile(str(zip_path))
    _PKG_SHIPPED.add(id(sc))


def _pin_session(spark: SparkSession) -> None:
    """Pin the (driver-owned) session: UTC so date/timestamp formatting is
    deterministic and matches the DuckDB oracle's naive timestamps, and
    nanosAsLong so the TIMESTAMP(NANOS) events fixture is readable; ship
    the package to the Python workers. This is the one sanctioned mutation
    point for sessions the engine did not build; sessions from
    ``get_spark`` carry the confs already (and run from the repo, where
    workers inherit an importable cwd)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _ship_package(spark)


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
