"""End-to-end lakehouse pipeline (reference flows O1-O8, flows.py:28-399).

The reference orchestrates six Prefect flows in strict sequence
(flows.py:285-384) over a two-zone MinIO layout. Here the same DAG is plain
Python composing lazy DataFrame transforms; the only actions are the Parquet
writes, preserving the reference's laziness contract (SURVEY.md §3). No
scheduler — run_pipeline is callable from anything (cron, Airflow, a
notebook); the reference's daily CronSchedule (flows.py:388-399) is the
caller's concern.

Zone layout (buckets.py:11-12 → directories/URIs):
    {raw_dir}/transactions/        hive-partitioned by transaction_date
    {raw_dir}/products/            unpartitioned, single file
    {raw_dir}/customers/           unpartitioned, single file
    {curated_dir}/fact_customer_transactions/   partitioned by transaction_date
    {curated_dir}/dim_customer/    single file
    {curated_dir}/dim_product/     single file

Scale notes (100 TB): the fact write keeps hive partitioning by date string
(partition pruning for every date-ranged query downstream); pass
``target_partitions=None`` on curate steps to let AQE size output files
instead of forcing the reference's single file; dims stay single-file —
they're broadcast-joined, never scanned in parallel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .generate import gen_customers, gen_products, gen_transactions
from .operators.curate import (
    curate_dim_customer,
    curate_dim_product,
    curate_fact,
    transform_raw_transactions,
)
from .sources.csv import (
    read_customers_csv,
    read_products_csv,
    read_transactions_csv,
    write_csv,
)
from .sources.parquet import (
    read_parquet,
    write_curated_parquet,
    write_raw_partitioned,
)


@dataclass(frozen=True)
class LakehouseConfig:
    """Mirrors the hardcoded config block at flows.py:294-315 (bucket names +
    prefixes), reduced to two zone roots; paths may be local, s3a://, etc."""

    raw_dir: str
    curated_dir: str
    # Output-file-count knob for curated writes (data_processing.py:405).
    # None = let AQE decide (the at-scale setting).
    target_partitions: int | None = 1

    @property
    def raw_transactions(self) -> str:
        return f"{self.raw_dir}/transactions"

    @property
    def raw_products(self) -> str:
        return f"{self.raw_dir}/products"

    @property
    def raw_customers(self) -> str:
        return f"{self.raw_dir}/customers"

    @property
    def fact_customer_transactions(self) -> str:
        return f"{self.curated_dir}/fact_customer_transactions"

    @property
    def dim_customer(self) -> str:
        return f"{self.curated_dir}/dim_customer"

    @property
    def dim_product(self) -> str:
        return f"{self.curated_dir}/dim_product"


# ---------------------------------------------------------------------------
# S8: zone bootstrap
# ---------------------------------------------------------------------------


def bootstrap_zones(spark: SparkSession, cfg: LakehouseConfig) -> dict[str, bool]:
    """S8 — idempotent create of the two zone roots, mirroring the
    reference's bucket bootstrap (buckets.py:14-45: make each bucket iff it
    doesn't exist, never fail if it does).

    Goes through the Hadoop FileSystem API so the SAME call works for
    local paths, hdfs://, and s3a:// (where a plain mkdir wouldn't create
    the bucket). Returns {zone: created?} — False means it already
    existed, matching the reference's 'already exists' branch.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    created: dict[str, bool] = {}
    for zone in (cfg.raw_dir, cfg.curated_dir):
        path = jvm.org.apache.hadoop.fs.Path(zone)
        fs = path.getFileSystem(conf)
        existed = fs.exists(path)
        if not existed:
            fs.mkdirs(path)
        created[zone] = not existed
    return created


# ---------------------------------------------------------------------------
# O1-O4: ingestion (CSV → raw zone)
# ---------------------------------------------------------------------------


def ingest_transactions(spark: SparkSession, csv_path: str, cfg: LakehouseConfig) -> None:
    """O1 — customer_transactions_ingestion_flow (flows.py:28-50):
    CSV scan → parse/filter/derive-date → raw Parquet partitioned by date."""
    df = read_transactions_csv(spark, csv_path)
    write_raw_partitioned(transform_raw_transactions(df), cfg.raw_transactions)


def ingest_products(spark: SparkSession, csv_path: str, cfg: LakehouseConfig) -> None:
    """O3 — product_dimension_ingestion_flow (flows.py:86-150): CSV scan →
    raw Parquet, unpartitioned, single file (partition_cols=[] at
    flows.py:134-140)."""
    df = read_products_csv(spark, csv_path)
    write_curated_parquet(df, cfg.raw_products, partition_cols=[], target_partitions=1)


def ingest_customers(spark: SparkSession, csv_path: str, cfg: LakehouseConfig) -> None:
    """O4 — customer_dimension_ingestion_flow (flows.py:152-215)."""
    df = read_customers_csv(spark, csv_path)
    write_curated_parquet(df, cfg.raw_customers, partition_cols=[], target_partitions=1)


# ---------------------------------------------------------------------------
# O2, O5, O6: curation (raw → curated star schema)
# ---------------------------------------------------------------------------


def curate_transactions(spark: SparkSession, cfg: LakehouseConfig) -> None:
    """O2 — raw_to_curated_flow (flows.py:52-82): raw scan → project 9 cols +
    casts → curated fact, partitioned by transaction_date."""
    raw = read_parquet(spark, cfg.raw_transactions)
    write_curated_parquet(
        curate_fact(raw),
        cfg.fact_customer_transactions,
        partition_cols=["transaction_date"],
        target_partitions=cfg.target_partitions,
        # the raw zone is date-partitioned (one file per date, written by
        # ingest_transactions) and curate_fact is a narrow transform, so
        # every input split already holds exactly one date — re-clustering
        # would shuffle the whole fact table for nothing
        input_clustered=True,
    )


def curate_customers(
    spark: SparkSession, cfg: LakehouseConfig, dedup: str | None = None
) -> None:
    """O5 — raw_customer_to_curated_flow (flows.py:220-249)."""
    raw = read_parquet(spark, cfg.raw_customers)
    write_curated_parquet(
        curate_dim_customer(raw, dedup=dedup),
        cfg.dim_customer,
        partition_cols=[],
        target_partitions=cfg.target_partitions,
    )


def curate_products(spark: SparkSession, cfg: LakehouseConfig) -> None:
    """O6 — raw_product_to_curated_flow (flows.py:251-280)."""
    raw = read_parquet(spark, cfg.raw_products)
    write_curated_parquet(
        curate_dim_product(raw),
        cfg.dim_product,
        partition_cols=[],
        target_partitions=cfg.target_partitions,
    )


# ---------------------------------------------------------------------------
# O7: master flow
# ---------------------------------------------------------------------------


def run_pipeline(
    spark: SparkSession,
    cfg: LakehouseConfig,
    transactions_csv: str,
    products_csv: str,
    customers_csv: str,
    dedup_customers: str | None = None,
) -> None:
    """O7 — customer_transactions_master_flow (flows.py:285-384): the six
    steps in the reference's exact order (ingest txn → prod → cust, curate
    txn → cust → prod, flows.py:322-343, 353-380)."""
    ingest_transactions(spark, transactions_csv, cfg)
    ingest_products(spark, products_csv, cfg)
    ingest_customers(spark, customers_csv, cfg)
    curate_transactions(spark, cfg)
    curate_customers(spark, cfg, dedup=dedup_customers)
    curate_products(spark, cfg)


def generate_fixture_csvs(
    spark: SparkSession,
    out_dir: str,
    n_transactions: int = 100_000,
    n_customers: int = 10_000,
    n_products: int = 900,
    seed: int = 42,
    anchor_ts: str | None = None,
) -> tuple[str, str, str]:
    """Reference generator stage (flows.py:96-99, 160-166 write temp CSVs
    that the ingest flows then read). Returns the three CSV dir paths."""
    paths = (
        f"{out_dir}/transactions_csv",
        f"{out_dir}/products_csv",
        f"{out_dir}/customers_csv",
    )
    write_csv(gen_transactions(spark, n_transactions, seed, anchor_ts), paths[0])
    write_csv(gen_products(spark, n_products, seed), paths[1], single_file=True)
    write_csv(gen_customers(spark, n_customers, seed), paths[2], single_file=True)
    return paths


# ---------------------------------------------------------------------------
# Star-schema query layer over the curated zone (the consumption path the
# reference delegates to Spark SQL, ReadMe.md:85-94; SURVEY.md §2.4-2.5)
# ---------------------------------------------------------------------------


def load_star(spark: SparkSession, cfg: LakehouseConfig) -> dict[str, DataFrame]:
    return {
        "fact_customer_transactions": read_parquet(spark, cfg.fact_customer_transactions),
        "dim_customer": read_parquet(spark, cfg.dim_customer),
        "dim_product": read_parquet(spark, cfg.dim_product),
    }


def revenue_by_category_date(
    fact: DataFrame, dim_product: DataFrame, date_from: str | None = None
) -> DataFrame:
    """Flagship star rollup: fact ⋈ broadcast(dim_product) → revenue by
    category × date. LEFT join — fact keys may be absent from dims
    (SURVEY.md §1.5); unmatched rows roll up under NULL category.

    Filtering on transaction_date (the hive partition key) prunes partitions
    at the scan — at 100 TB a one-month query touches ~30/366 partitions."""
    f = fact
    if date_from is not None:
        f = f.filter(F.col("transaction_date") >= date_from)
    return (
        f.join(F.broadcast(dim_product), "product_id", "left")
        .groupBy("product_category", "transaction_date")
        .agg(
            F.round(F.sum(F.col("quantity") * F.col("price")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_transactions"),
        )
    )


def customer_segment_revenue(fact: DataFrame, dim_customer: DataFrame) -> DataFrame:
    """Segment rollup: fact ⋈ broadcast(dim_customer); unmatched customers
    (ids outside the 10k dim sample) appear as NULL segment."""
    return (
        fact.join(F.broadcast(dim_customer), "customer_id", "left")
        .groupBy("customer_segment")
        .agg(
            F.round(F.sum(F.col("quantity") * F.col("price")), 2).alias("revenue"),
            F.countDistinct("customer_id").alias("n_customers"),
        )
    )
