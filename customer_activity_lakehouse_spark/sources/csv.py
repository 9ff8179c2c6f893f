"""CSV scans (reference operators S1-S3) and the fixture CSV sink (S9).

Reference: lazy Dask CSV reads with explicit dtype dicts —
data_processing.py:135-160 (transactions), flows.py:118-130 (products),
flows.py:180-196 (customers). Spark equivalent: ``spark.read.csv`` with an
explicit StructType (never inferSchema — avoids an extra full scan) and
``mode=PERMISSIVE`` so malformed cells become nulls, matching pandas'
coerce-style tolerance; the raw transform's null-filter then drops them
(data_processing.py:167-172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CUSTOMERS_CSV, PRODUCTS_CSV, TRANSACTIONS_CSV


def _read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.csv(path, schema=schema, header=True, mode="PERMISSIVE")


def read_transactions_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — transactions scan (data_processing.py:135-160)."""
    return _read_csv(spark, path, TRANSACTIONS_CSV)


def read_products_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 — products scan (flows.py:118-130)."""
    return _read_csv(spark, path, PRODUCTS_CSV)


def read_customers_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3 — customers scan (flows.py:180-196)."""
    return _read_csv(spark, path, CUSTOMERS_CSV)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S9 — CSV sink, used only for fixture generation
    (generate_transaction.py:43-45; data_processing.py:75-77, 126-128)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)
