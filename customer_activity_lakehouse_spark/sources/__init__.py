from .csv import read_customers_csv, read_products_csv, read_transactions_csv
from .parquet import (
    load_driver_tables,
    read_parquet,
    write_curated_parquet,
    write_raw_partitioned,
)

__all__ = [
    "read_transactions_csv",
    "read_customers_csv",
    "read_products_csv",
    "read_parquet",
    "write_raw_partitioned",
    "write_curated_parquet",
    "load_driver_tables",
]
