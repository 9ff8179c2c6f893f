"""Explicit StructType schemas for every table the engine touches.

The reference declares fixed dtype dicts at read time and never infers
(data_processing.py:139-152; flows.py:120-125, 182-191). We do the same with
StructTypes: CSV scans always pass ``schema=`` (no inference pass over the
data — at 100 TB an inference pass is a full extra scan).

Reference-native tables (§1.5 of SURVEY.md):
- transactions  : generate_transaction.py:11-40, dtypes data_processing.py:141-150
- customers dim : data_processing.py:47-72, dtypes flows.py:182-190
- products dim  : data_processing.py:100-123, dtypes flows.py:120-124

Driver test tables (/root/testdata/sf*/): TPC-H-ish star schema + events/
documents/embeddings; schemas verified from the parquet footers (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-native tables. Timestamps and dates arrive as *strings* in CSV and
# stay strings until the raw transform parses them (data_processing.py:168).
# ---------------------------------------------------------------------------

TRANSACTIONS_CSV = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("transaction_timestamp", T.StringType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("store_location", T.StringType()),
        T.StructField("payment_method", T.StringType()),
    ]
)

CUSTOMERS_CSV = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("customer_email", T.StringType()),
        T.StructField("customer_city", T.StringType()),
        T.StructField("customer_country", T.StringType()),
        T.StructField("registration_date", T.StringType()),
        T.StructField("customer_segment", T.StringType()),
    ]
)

PRODUCTS_CSV = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("product_category", T.StringType()),
        T.StructField("product_brand", T.StringType()),
        T.StructField("product_weight_kg", T.DoubleType()),
    ]
)

# Curated fact column order (data_processing.py:253-263). transaction_date is
# the hive partition key, kept as 'yyyy-MM-dd' STRING to match partition dir
# names exactly (data_processing.py:175-180).
FACT_COLUMNS = [
    "transaction_id",
    "customer_id",
    "product_id",
    "transaction_timestamp",
    "transaction_date",
    "quantity",
    "price",
    "store_location",
    "payment_method",
]

DIM_CUSTOMER_COLUMNS = [
    "customer_id",
    "customer_name",
    "customer_email",
    "customer_city",
    "customer_country",
    "registration_date",
    "customer_segment",
]

DIM_PRODUCT_COLUMNS = [
    "product_id",
    "product_name",
    "product_category",
    "product_brand",
    "product_weight_kg",
]

# ---------------------------------------------------------------------------
# Driver test tables (read-only parquet; schemas embedded in footers, listed
# here for reference/validation — parquet reads use the embedded schema).
# ---------------------------------------------------------------------------

DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def require_columns(df, expected: list[str], context: str = "") -> None:
    """Column-existence guard (reference data_processing.py:266-268, 416-419).

    Raises ValueError listing what is missing — cheap driver-side metadata
    check, no job triggered.
    """
    missing = [c for c in expected if c not in df.columns]
    if missing:
        raise ValueError(f"{context or 'dataframe'}: missing columns {missing}")
