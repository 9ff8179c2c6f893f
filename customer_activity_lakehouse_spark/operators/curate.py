"""Raw→curated transforms (reference operators P1-P5, F1-F8, D1).

The reference implements these as pandas verbs over Dask partitions
(data_processing.py:163-184 raw transform; 248-291 fact; 295-352 customer dim;
356-396 product dim). Here each is one lazy DataFrame expression chain —
Catalyst collapses the projections/casts into a single stage over the scan,
and the null-filter is pushed below the project.

Semantics preserved exactly:
- timestamp parse is null-on-failure, and unparseable rows are DROPPED before
  the raw write so no invalid partition dirs appear (data_processing.py:167-172);
- transaction_date is a 'yyyy-MM-dd' STRING partition key (175-180);
- customer_segment nulls are filled 'Unknown' (338-340);
- product_category uses str.capitalize semantics, NOT initcap (387-391);
- dedup-by-customer_id is available both in the reference's nondeterministic
  form and a deterministic keep-first form (342-345, commented out there).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

from ..functions.scalars import capitalize_first, derive_date_str, parse_ts
from ..schemas import (
    DIM_CUSTOMER_COLUMNS,
    DIM_PRODUCT_COLUMNS,
    FACT_COLUMNS,
    require_columns,
)


def _tolerant_select(df: DataFrame, wanted: list[str]) -> DataFrame:
    """P2/P3 — select expected ∩ present columns, warning on gaps, one
    warning per absent column like the reference (data_processing.py:311-317,
    366-373 print 'Warning: Column X not found...')."""
    present = [c for c in wanted if c in df.columns]
    for missing in (c for c in wanted if c not in df.columns):
        logger.warning("Column %r not found in input; skipping it", missing)
    return df.select(*present)


def transform_raw_transactions(df: DataFrame) -> DataFrame:
    """Raw-zone transform (data_processing.py:163-184): parse ts once, drop
    unparseable rows (P4/F1), derive the string date partition key (F2/F3).

    The reference parses the timestamp twice (:168 and :176); one
    ``to_timestamp`` feeds both the filter and the date derivation here —
    identical results, one pass over the data.
    """
    require_columns(df, ["transaction_timestamp"], "transform_raw_transactions")
    ts = parse_ts("transaction_timestamp")
    return (
        df.withColumn("_ts", ts)
        .filter(F.col("_ts").isNotNull())
        .withColumn("transaction_date", derive_date_str(F.col("_ts")))
        .drop("_ts")
    )


def curate_fact(df: DataFrame) -> DataFrame:
    """Curated fact transform (data_processing.py:248-291): project the 9
    curated columns (P1), enforce join-key/measure types (F4/F5)."""
    require_columns(df, ["transaction_id", "customer_id", "product_id"], "curate_fact")
    out = (
        df.withColumn("customer_id", F.col("customer_id").cast("long"))
        .withColumn("quantity", F.col("quantity").cast("long"))
        .withColumn("price", F.col("price").cast("double"))
    )
    return _tolerant_select(out, FACT_COLUMNS)


def curate_dim_customer(df: DataFrame, dedup: str | None = None) -> DataFrame:
    """Customer dim transform (data_processing.py:295-352):
    cast key to long (F4), registration_date → 'yyyy-MM-dd' string via
    coerce-parse (F1/F2), null segment → 'Unknown' (F7), optional dedup (D1).

    dedup: None (reference default — the drop_duplicates at
    data_processing.py:342-345 is commented out), 'any' (arbitrary row per key,
    = dropDuplicates), or 'first' (deterministic keep-first by registration
    date then name — use this wherever a test asserts WHICH row survives).
    """
    require_columns(df, ["customer_id"], "curate_dim_customer")
    out = df.withColumn("customer_id", F.col("customer_id").cast("long"))
    if "registration_date" in out.columns:
        out = out.withColumn(
            "registration_date",
            derive_date_str(parse_ts("registration_date", "yyyy-MM-dd")),
        )
    if "customer_segment" in out.columns:
        out = out.fillna({"customer_segment": "Unknown"})
    out = _tolerant_select(out, DIM_CUSTOMER_COLUMNS)
    if dedup == "any":
        out = out.dropDuplicates(["customer_id"])
    elif dedup == "first":
        order: list[Column] = [
            F.col(c).asc_nulls_last()
            for c in ("registration_date", "customer_name")
            if c in out.columns
        ] or [F.lit(1).asc()]
        w = Window.partitionBy("customer_id").orderBy(*order)
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return out


def curate_dim_product(df: DataFrame) -> DataFrame:
    """Product dim transform (data_processing.py:356-396): weight → double
    (F5), category str.capitalize — first upper, rest LOWER (F8)."""
    require_columns(df, ["product_id"], "curate_dim_product")
    out = df
    if "product_weight_kg" in out.columns:
        out = out.withColumn("product_weight_kg", F.col("product_weight_kg").cast("double"))
    if "product_category" in out.columns:
        out = out.withColumn("product_category", capitalize_first("product_category"))
    return _tolerant_select(out, DIM_PRODUCT_COLUMNS)
