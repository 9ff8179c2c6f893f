"""Synthetic data generators (reference operators G1-G3).

The reference generates data single-process with Python's ``random`` + Faker
and writes CSV (generate_transaction.py:6-51; data_processing.py:34-80,
85-131). Here each generator is a distributed ``spark.range`` plan — at the
reference's 10M-row shape this is a handful of map tasks with zero shuffle,
and it scales linearly to billions of rows (the 100 TB fixture path).

Determinism: ``F.rand(seed)`` streams are seeded, and IDs/names derive from
md5 of the row id, so a given (n, seed) always yields the same table —
unlike the reference, which reseeds from the wall clock each run. The
reference's uuid4 transaction ids become md5-hex ids: same uniqueness and
string-typed shape, but reproducible.

Value domains match SURVEY.md §1.5 / §2.7 exactly (ranges, categorical sets,
2-decimal rounding, timestamp window now − ≤365 days).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

STORE_LOCATIONS = ["online", "store_A", "store_B", "mobile_app"]
PAYMENT_METHODS = ["credit_card", "paypal", "cash", "bank_transfer"]
CUSTOMER_SEGMENTS = ["A", "B", "C", "D"]
PRODUCT_CATEGORIES = [  # data_processing.py:120
    "Electronics",
    "Books",
    "Clothing",
    "Home Goods",
    "Groceries",
    "Outdoors",
    "Toys",
    "Beauty",
]

CUSTOMER_ID_MIN, CUSTOMER_ID_MAX = 1000, 50000  # generate_transaction.py:20
PRODUCT_ID_MIN, PRODUCT_ID_MAX = 100, 999  # generate_transaction.py:21


def _choice(options: list[str], r: Column) -> Column:
    """Uniform pick from a literal array given r ∈ [0,1) — element_at is
    1-indexed; floor(r*n) ∈ [0, n-1]."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.floor(r * len(options)) + 1).cast("int"))


def _uniform_long(lo: int, hi: int, r: Column) -> Column:
    """Uniform integer in [lo, hi] (inclusive), matching random.randint."""
    return (F.floor(r * (hi - lo + 1)) + lo).cast("long")


def _round2(c: Column) -> Column:
    return F.round(c, 2)


def gen_transactions(
    spark: SparkSession,
    n_rows: int = 10_000_000,
    seed: int = 42,
    anchor_ts: str | None = None,
) -> DataFrame:
    """G1 — fact generator (generate_transaction.py:6-47; default n
    generate_transaction.py:50).

    ``anchor_ts`` ('yyyy-MM-dd HH:mm:ss') pins "now" for reproducible tests;
    None uses the cluster clock like the reference does.
    """
    base = spark.range(n_rows)  # distributed; no shuffle
    now = (
        F.to_timestamp(F.lit(anchor_ts))
        if anchor_ts is not None
        else F.current_timestamp()
    )
    # independent uniform streams: rand(seed+k) per column
    r = [F.rand(seed + k) for k in range(7)]
    seconds_back = (r[2] * 365 * 24 * 3600).cast("long")
    ts = F.date_format(now - F.make_dt_interval(secs=seconds_back.cast("double")), "yyyy-MM-dd HH:mm:ss")
    return base.select(
        F.md5(F.concat(F.lit(f"txn:{seed}:"), F.col("id"))).alias("transaction_id"),
        _uniform_long(CUSTOMER_ID_MIN, CUSTOMER_ID_MAX, r[0]).alias("customer_id"),
        F.concat(
            F.lit("PROD"), _uniform_long(PRODUCT_ID_MIN, PRODUCT_ID_MAX, r[1])
        ).alias("product_id"),
        ts.alias("transaction_timestamp"),
        _uniform_long(1, 10, r[3]).alias("quantity"),
        _round2(r[4] * (500.0 - 5.0) + 5.0).alias("price"),
        _choice(STORE_LOCATIONS, r[5]).alias("store_location"),
        _choice(PAYMENT_METHODS, r[6]).alias("payment_method"),
    )


def _sample_distinct_ids(
    spark: SparkSession, lo: int, hi: int, n: int, seed: int
) -> DataFrame:
    """Uniform sample WITHOUT replacement of n ids from [lo, hi], as an
    ``id`` column. Mirrors random.sample(range(lo, hi+1), n)
    (data_processing.py:59, 106-112): rank the full range by a seeded hash
    and keep the first n. One narrow scan + one top-n — fine for dim-sized n;
    for huge n switch to sortWithinPartitions + zipWithIndex."""
    universe = spark.range(lo, hi + 1)
    keyed = universe.withColumn(
        "_k", F.md5(F.concat(F.lit(f"sample:{seed}:"), F.col("id")))
    )
    return keyed.orderBy("_k").limit(n).select("id")


def gen_customers(spark: SparkSession, n_rows: int = 10_000, seed: int = 42) -> DataFrame:
    """G2 — customer dim (data_processing.py:34-80): unique ids sampled from
    [1000, 50000], synthetic name/email/city/country (md5-derived in place of
    Faker — same cardinality/shape, deterministic), registration_date a
    'yyyy-MM-dd' string, segment ∈ {A,B,C,D}."""
    ids = _sample_distinct_ids(spark, CUSTOMER_ID_MIN, CUSTOMER_ID_MAX, n_rows, seed)
    h = F.md5(F.concat(F.lit(f"cust:{seed}:"), F.col("id")))
    r = [F.rand(seed + 100 + k) for k in range(2)]
    day_of_year = _uniform_long(0, 364, r[0])
    reg = F.date_format(
        F.date_add(F.to_date(F.lit("2025-01-01")), day_of_year.cast("int")),
        "yyyy-MM-dd",
    )
    return ids.select(
        F.col("id").alias("customer_id"),
        F.concat(F.lit("Customer "), F.substring(h, 1, 8)).alias("customer_name"),
        F.concat(F.substring(h, 1, 10), F.lit("@example.com")).alias("customer_email"),
        F.concat(F.lit("City "), F.substring(h, 9, 6)).alias("customer_city"),
        F.concat(F.lit("Country "), F.substring(h, 15, 4)).alias("customer_country"),
        reg.alias("registration_date"),
        _choice(CUSTOMER_SEGMENTS, r[1]).alias("customer_segment"),
    )


def gen_products(spark: SparkSession, n_rows: int = 900, seed: int = 42) -> DataFrame:
    """G3 — product dim (data_processing.py:85-131): unique PROD{100..999}
    ids, category from the 8-element list, weight ∈ [0.1, 20.0] 2dp."""
    n_rows = min(n_rows, PRODUCT_ID_MAX - PRODUCT_ID_MIN + 1)
    ids = _sample_distinct_ids(spark, PRODUCT_ID_MIN, PRODUCT_ID_MAX, n_rows, seed)
    h = F.md5(F.concat(F.lit(f"prod:{seed}:"), F.col("id")))
    r = [F.rand(seed + 200 + k) for k in range(2)]
    return ids.select(
        F.concat(F.lit("PROD"), F.col("id")).alias("product_id"),
        F.concat(F.lit("Product "), F.substring(h, 1, 10)).alias("product_name"),
        _choice(PRODUCT_CATEGORIES, r[0]).alias("product_category"),
        F.concat(F.lit("Brand "), F.substring(h, 11, 6)).alias("product_brand"),
        _round2(r[1] * (20.0 - 0.1) + 0.1).alias("product_weight_kg"),
    )
