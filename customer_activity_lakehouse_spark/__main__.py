"""O8 — runnable entrypoint: ``python -m customer_activity_lakehouse_spark``.

Mirrors what ``python flows.py`` gives a user of the reference
(flows.py:388-399): one command that stands up the lakehouse end-to-end —
bootstrap zones, generate fixture CSVs, run the six-step master pipeline,
and report the curated row counts. The reference wraps the master flow in
a daily 1 AM cron deployment; scheduling stays the caller's job here
(cron/Airflow/systemd invoke this module), so the entrypoint runs the
pipeline ONCE and exits 0 on success — the contract schedulers expect.
"""

from __future__ import annotations

import argparse
import tempfile

from .pipeline import (
    LakehouseConfig,
    bootstrap_zones,
    generate_fixture_csvs,
    load_star,
    run_pipeline,
)
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="customer_activity_lakehouse_spark",
        description="Generate fixture CSVs and run the full ingest+curate pipeline.",
    )
    p.add_argument(
        "--root",
        default=None,
        help="lakehouse root directory/URI (default: a fresh temp dir)",
    )
    p.add_argument("--transactions", type=int, default=100_000)
    p.add_argument("--customers", type=int, default=10_000)
    p.add_argument("--products", type=int, default=900)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--dedup-customers",
        choices=["any", "first"],
        default=None,
        help="customer-dim dedup mode (default: reference behavior, no dedup)",
    )
    args = p.parse_args(argv)

    root = args.root or tempfile.mkdtemp(prefix="lakehouse_")
    spark = get_spark("lakehouse-cli")
    cfg = LakehouseConfig(raw_dir=f"{root}/raw", curated_dir=f"{root}/curated")
    bootstrap_zones(spark, cfg)
    csvs = generate_fixture_csvs(
        spark,
        f"{root}/fixtures",
        n_transactions=args.transactions,
        n_customers=args.customers,
        n_products=args.products,
        seed=args.seed,
    )
    run_pipeline(spark, cfg, *csvs, dedup_customers=args.dedup_customers)
    for name, df in load_star(spark, cfg).items():
        print(f"{name}: {df.count()} rows")
    print(f"lakehouse root: {root}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
