"""Oracle-checked DML surface: the snapshot log's MERGE / DELETE /
UPDATE / change-feed / materialized-view chain, expressed as catalog
queries so the driver's DuckDB gate checks the TABLE LAYER itself — not
just analytics over parquet.

Each query builds a scratch snapshot table from the sf_dir's ``orders``
(memoized per sf_dir, so the three queries share one build), applies a
deterministic DML chain, and returns a frame whose oracle is the same
chain replayed as DuckDB CTEs over the ``orders`` view:

  v1  append   orders (o_orderkey, o_custkey, price DECIMAL(18,2))
      + MV bootstrap (per-custkey SUM/COUNT)
  v2  MERGE    matched  (o_orderkey % 11 = 0): price += 100
               inserted (o_orderkey % 101 = 0): shifted key +10_000_000,
               price 50.00
  v3  DELETE   o_orderkey % 13 = 0
  v4  UPDATE   o_custkey % 17 = 0: price += 1
      + MV incremental maintenance (consumes the v2..v4 change feed)

Money discipline: DECIMAL(18,2) end to end (plans/core.py MONEY
convention) so sums are order-independent and hash-exact in both engines.

Reference: the reference pipeline has no DML surface at all — its curated
zone is a full overwrite each run (data_processing.py:217); this module
is beyond-reference surface with Delta Lake's verbs as the public model.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import MONEY
from .registry import Query, table

# sf_dir -> (src_table_dir, mv_dir); one build shared by all dml queries.
# The lock makes concurrent first-calls build once (harness parallelism).
_SCRATCH: dict[str, tuple[str, str]] = {}
_SCRATCH_LOCK = threading.Lock()


def _dml_chain(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    with _SCRATCH_LOCK:
        return _dml_chain_locked(spark, sf_dir)


def _dml_chain_locked(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    if sf_dir in _SCRATCH:
        return _SCRATCH[sf_dir]
    from ..sources.incremental import maintain_sum_aggregate
    from ..sources.snapshots import (
        commit_append,
        delete_snapshot,
        merge_snapshot,
        update_snapshot,
    )

    base = tempfile.mkdtemp(prefix="calh-dml-")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, agg = f"{base}/orders_snap", f"{base}/orders_mv"
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast(MONEY).alias("price"),
    )
    commit_append(spark, src, orders.repartition(4), stats_cols=["o_orderkey"])
    maintain_sum_aggregate(spark, src, agg, ["o_custkey"], ["price"])
    upd = orders.filter("o_orderkey % 11 = 0").withColumn(
        "price", F.expr(f"cast(price + 100 as {MONEY})")
    )
    ins = orders.filter("o_orderkey % 101 = 0").select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        "o_custkey",
        F.expr(f"cast(50.00 as {MONEY})").alias("price"),
    )
    merge_snapshot(
        spark, src, upd.unionByName(ins), ["o_orderkey"], stats_cols=["o_orderkey"]
    )
    # mode='dv' puts the MERGE-ON-READ path under the oracle: the read's
    # row-index anti-join, the DV commit's CDC preimages, the MV folding
    # them, and the next rewrite (the UPDATE below) materializing the DVs
    delete_snapshot(
        spark, src, "o_orderkey % 13 = 0", mode="dv", stats_cols=["o_orderkey"]
    )
    update_snapshot(
        spark,
        src,
        "o_custkey % 17 = 0",
        {"price": f"cast(price + 1 as {MONEY})"},
        stats_cols=["o_orderkey"],
    )
    maintain_sum_aggregate(spark, src, agg, ["o_custkey"], ["price"])
    _SCRATCH[sf_dir] = (src, agg)
    return src, agg


# DuckDB mirror of the chain; each stage AS MATERIALIZED (re-referenced).
_SQL_CHAIN = """
WITH base AS MATERIALIZED (
  SELECT o_orderkey, o_custkey, o_totalprice::DECIMAL(18,2) AS price
  FROM orders
), batch AS MATERIALIZED (
  SELECT o_orderkey, o_custkey, (price + 100)::DECIMAL(18,2) AS price
  FROM base WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 50.00::DECIMAL(18,2)
  FROM base WHERE o_orderkey % 101 = 0
), merged AS MATERIALIZED (
  SELECT b.o_orderkey,
         coalesce(u.o_custkey, b.o_custkey) AS o_custkey,
         coalesce(u.price, b.price) AS price
  FROM base b LEFT JOIN batch u ON b.o_orderkey = u.o_orderkey
  UNION ALL
  SELECT u.o_orderkey, u.o_custkey, u.price
  FROM batch u ANTI JOIN base b ON u.o_orderkey = b.o_orderkey
), survivors AS MATERIALIZED (
  SELECT * FROM merged WHERE o_orderkey % 13 != 0
), final AS MATERIALIZED (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_custkey % 17 = 0 THEN (price + 1)::DECIMAL(18,2)
              ELSE price END AS price
  FROM survivors
)
"""


def q_dml_snapshot_mv_totals(spark: SparkSession, sf: str) -> DataFrame:
    """The materialized view AFTER the full DML chain: per-custkey totals
    maintained incrementally from the change feed (sources/incremental.py)
    must equal the oracle's from-scratch aggregate of the final state —
    one green row here certifies MERGE, DELETE, UPDATE, the pre/postimage
    change feed, AND the MV fold in a single equality."""
    _, agg = _dml_chain(spark, sf)
    from ..sources.snapshots import read_snapshot

    return read_snapshot(spark, agg).select(
        "o_custkey",
        F.round(F.col("price").cast("double"), 2).alias("total_price"),
        F.col("n_rows"),
    )


ORACLE_DML_SNAPSHOT_MV_TOTALS = (
    _SQL_CHAIN
    + """
SELECT o_custkey, round(sum(price)::DOUBLE, 2) AS total_price,
       count(*) AS n_rows
FROM final GROUP BY o_custkey
"""
)


def q_dml_change_feed_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Per-commit change-feed row counts across the DML chain — checks the
    CDF vocabulary itself (Delta CDF parity: paired update_preimage/
    update_postimage, insert, delete) and per-commit granularity against
    counts the oracle derives from the replayed chain."""
    src, _ = _dml_chain(spark, sf)
    from ..sources.snapshots import snapshot_change_feed

    feed = snapshot_change_feed(spark, src, 1)  # (v1, latest]
    return feed.groupBy(
        F.col("_commit_version").alias("commit_version"), "change_type"
    ).agg(F.count(F.lit(1)).alias("n"))


ORACLE_DML_CHANGE_FEED_AUDIT = (
    _SQL_CHAIN
    + """
SELECT 2 AS commit_version, 'update_preimage' AS change_type, count(*) AS n
FROM base WHERE o_orderkey % 11 = 0
UNION ALL
SELECT 2, 'update_postimage', count(*) FROM base WHERE o_orderkey % 11 = 0
UNION ALL
SELECT 2, 'insert', count(*) FROM base WHERE o_orderkey % 101 = 0
UNION ALL
SELECT 3, 'delete', count(*) FROM merged WHERE o_orderkey % 13 = 0
UNION ALL
SELECT 4, 'update_preimage', count(*) FROM survivors WHERE o_custkey % 17 = 0
UNION ALL
SELECT 4, 'update_postimage', count(*) FROM survivors WHERE o_custkey % 17 = 0
"""
)


def q_dml_time_travel_totals(spark: SparkSession, sf: str) -> DataFrame:
    """TIMESTAMP-ordinal time travel: version 1 read AFTER three DML
    commits must still be byte-for-byte the initial append — the oracle is
    just the raw ``orders`` aggregate, untouched by the chain."""
    src, _ = _dml_chain(spark, sf)
    from ..sources.snapshots import read_snapshot

    return read_snapshot(spark, src, version=1).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("price").cast("double"), 2).alias("total_price"),
    )


ORACLE_DML_TIME_TRAVEL_TOTALS = """
SELECT count(*) AS n_orders,
       round(sum(o_totalprice::DECIMAL(18,2))::DOUBLE, 2) AS total_price
FROM orders
"""


_RW_SCRATCH: dict[str, str] = {}


def _replace_where_chain(spark: SparkSession, sf_dir: str) -> str:
    """Scratch chain #2: orders snapshot PARTITIONED by o_orderpriority,
    its per-priority MV bootstrapped, then Delta's replaceWhere re-lands
    the URGENT slice with doubled prices (the reference's daily-backfill
    shape, flows.py:314, as one atomic commit), and the MV consumes the
    replace commit's CDC (delete preimages + insert postimages)
    ADDITIVELY — no resync."""
    with _SCRATCH_LOCK:
        if sf_dir in _RW_SCRATCH:
            return _RW_SCRATCH[sf_dir]
        return _replace_where_chain_locked(spark, sf_dir)


def _replace_where_chain_locked(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.incremental import maintain_sum_aggregate
    from ..sources.snapshots import commit_append, commit_replace_where

    base = tempfile.mkdtemp(prefix="calh-rw-")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, agg = f"{base}/orders_part", f"{base}/orders_prio_mv"
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast(MONEY).alias("price"),
    )
    commit_append(
        spark, src, orders.repartition(4),
        stats_cols=["o_orderkey"], partition_by=["o_orderpriority"],
    )
    maintain_sum_aggregate(spark, src, agg, ["o_orderpriority"], ["price"])
    repl = orders.filter("o_orderpriority = '1-URGENT'").withColumn(
        "price", F.expr(f"cast(price * 2 as {MONEY})")
    )
    commit_replace_where(
        spark, src, repl, "o_orderpriority = '1-URGENT'", stats_cols=["o_orderkey"]
    )
    maintain_sum_aggregate(spark, src, agg, ["o_orderpriority"], ["price"])
    _RW_SCRATCH[sf_dir] = agg
    return agg


def q_dml_replace_where_mv(spark: SparkSession, sf: str) -> DataFrame:
    """Per-priority MV after replaceWhere on a PARTITIONED snapshot table:
    the replaced slice's doubled totals and every untouched partition's
    originals, maintained from the replace commit's own change feed."""
    agg = _replace_where_chain(spark, sf)
    from ..sources.snapshots import read_snapshot

    return read_snapshot(spark, agg).select(
        "o_orderpriority",
        F.round(F.col("price").cast("double"), 2).alias("total_price"),
        F.col("n_rows"),
    )


ORACLE_DML_REPLACE_WHERE_MV = """
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN (o_totalprice::DECIMAL(18,2) * 2)::DECIMAL(18,2)
                      ELSE o_totalprice::DECIMAL(18,2) END)::DOUBLE, 2)
         AS total_price,
       count(*) AS n_rows
FROM orders GROUP BY o_orderpriority
"""


_SCD_SCRATCH: dict[str, str] = {}


def _scd2_chain(spark: SparkSession, sf_dir: str) -> str:
    """Scratch chain #3: a customer dimension maintained as SCD TYPE 2
    (sources/scd.py) under three deterministic change batches:

      lsn 1  insert every customer (segment, balance)
      lsn 2  update  custkey % 7 = 0      → balance += 10
      lsn 3  delete  custkey % 55 = 0     (history closes, coverage gap)
             update  custkey % 11 = 0 and % 55 != 0 → segment 'VIP'
                     (balance carries its post-lsn-2 value)

    Each batch is ONE atomic merge commit; the oracle rebuilds the same
    interval history from closed-form flags over the ``customer`` view."""
    with _SCRATCH_LOCK:
        if sf_dir in _SCD_SCRATCH:
            return _SCD_SCRATCH[sf_dir]
        return _scd2_chain_locked(spark, sf_dir)


def _scd2_chain_locked(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.scd import apply_changes_scd2

    base = tempfile.mkdtemp(prefix="calh-scd2-")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    dim = f"{base}/dim_customer"
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").cast(MONEY).alias("bal"),
    )
    b1 = cust.select(
        "k", "segment", "bal", F.lit(1).alias("lsn"), F.lit("insert").alias("change_type")
    )
    apply_changes_scd2(spark, dim, b1, ["k"], "lsn")
    b2 = cust.filter("k % 7 = 0").select(
        "k",
        "segment",
        F.expr(f"cast(bal + 10 as {MONEY})").alias("bal"),
        F.lit(2).alias("lsn"),
        F.lit("update").alias("change_type"),
    )
    apply_changes_scd2(spark, dim, b2, ["k"], "lsn")
    bal_now = F.expr(
        f"CASE WHEN k % 7 = 0 THEN cast(bal + 10 as {MONEY}) ELSE bal END"
    )
    d3 = cust.filter("k % 55 = 0").select(
        "k",
        F.lit(None).cast("string").alias("segment"),
        F.lit(None).cast(MONEY).alias("bal"),
        F.lit(3).alias("lsn"),
        F.lit("delete").alias("change_type"),
    )
    u3 = cust.filter("k % 11 = 0 AND k % 55 != 0").select(
        "k",
        F.lit("VIP").alias("segment"),
        bal_now.alias("bal"),
        F.lit(3).alias("lsn"),
        F.lit("update").alias("change_type"),
    )
    apply_changes_scd2(spark, dim, d3.unionByName(u3), ["k"], "lsn")
    _SCD_SCRATCH[sf_dir] = dim
    return dim


def q_dml_scd2_dimension(spark: SparkSession, sf: str) -> DataFrame:
    """The SCD2 dimension's full interval history after the three-batch
    chain, audited per segment: total history rows, OPEN rows, rows
    closed by each boundary, and the open rows' exact balance total —
    one green row set certifies interval chaining, delete gaps, payload
    carry-forward, and the merge-on-(key, valid_from) apply in a single
    equality against the closed-form replay."""
    dim = _scd2_chain(spark, sf)
    from ..sources.snapshots import read_snapshot

    h = read_snapshot(spark, dim)
    return (
        h.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_hist"),
            F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_open"),
            F.sum(F.when(F.col("valid_to") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_closed_at_2"),
            F.sum(F.when(F.col("valid_to") == 3, 1).otherwise(0))
            .cast("long")
            .alias("n_closed_at_3"),
            F.round(
                F.sum(F.when(F.col("valid_to").isNull(), F.col("bal"))).cast("double"),
                2,
            ).alias("open_bal"),
        )
        .orderBy("segment")
    )


ORACLE_DML_SCD2_DIMENSION = """
WITH flags AS MATERIALIZED (
  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal::DECIMAL(18,2) AS bal,
         (c_custkey % 7 = 0) AS u2,
         (c_custkey % 55 = 0) AS d3,
         (c_custkey % 11 = 0 AND c_custkey % 55 != 0) AS u3
  FROM customer
),
hist AS MATERIALIZED (
  -- r1: the insert row, closed by whichever change hits the key first
  SELECT k, seg AS segment, bal, 1 AS vf,
         CASE WHEN u2 THEN 2 WHEN d3 OR u3 THEN 3 END AS vt
  FROM flags
  UNION ALL
  -- r2: the balance bump, closed by a lsn-3 change if any
  SELECT k, seg, (bal + 10)::DECIMAL(18,2), 2,
         CASE WHEN d3 OR u3 THEN 3 END
  FROM flags WHERE u2
  UNION ALL
  -- r3: the VIP re-segmentation (balance carries its post-lsn-2 value);
  -- deletes contribute no row — their keys end as coverage gaps
  SELECT k, 'VIP',
         CASE WHEN u2 THEN (bal + 10)::DECIMAL(18,2) ELSE bal END, 3, NULL
  FROM flags WHERE u3
)
SELECT segment,
       count(*)::BIGINT AS n_hist,
       sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_open,
       sum(CASE WHEN vt = 2 THEN 1 ELSE 0 END)::BIGINT AS n_closed_at_2,
       sum(CASE WHEN vt = 3 THEN 1 ELSE 0 END)::BIGINT AS n_closed_at_3,
       round(sum(CASE WHEN vt IS NULL THEN bal END)::DOUBLE, 2) AS open_bal
FROM hist GROUP BY segment ORDER BY segment
"""


# sf_dir -> row-tracked scratch table; separate from the main chain (its
# own deterministic layout is the contract under test).
_RT_SCRATCH: dict[str, str] = {}


def _rt_chain(spark: SparkSession, sf_dir: str) -> str:
    with _SCRATCH_LOCK:
        if sf_dir in _RT_SCRATCH:
            return _RT_SCRATCH[sf_dir]
        from ..sources.snapshots import (
            commit_append,
            compact_snapshot,
            delete_snapshot,
            enable_row_tracking,
        )

        base = tempfile.mkdtemp(prefix="calh-rt-")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        src = f"{base}/orders_rt"
        keys = table(spark, sf_dir, "orders").select("o_orderkey")
        # two single-file appends with DETERMINISTIC row order (sorted,
        # one partition) — the positional id contract needs a layout the
        # oracle can reproduce: file 1 = even keys ascending (row ids
        # 0..n_even-1), file 2 = odd keys ascending (n_even..n-1)
        for parity in (0, 1):
            commit_append(
                spark,
                src,
                keys.filter(f"o_orderkey % 2 = {parity}")
                .repartition(1)
                .sortWithinPartitions("o_orderkey"),
                stats_cols=["o_orderkey"],
            )
        enable_row_tracking(spark, src)
        # merge-on-read delete PRESERVES survivor ids (files unchanged) …
        delete_snapshot(spark, src, "o_orderkey % 7 = 0", mode="dv")
        # … and OPTIMIZE preserves them by MATERIALIZING the _row_id
        # column into the compacted file (data_change=false contract)
        assert compact_snapshot(spark, src) is not None
        _RT_SCRATCH[sf_dir] = src
        return src


def q_dml_row_tracking_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Row tracking end-to-end under the oracle: positional id assignment
    (base per file + row index over a deterministic two-file sorted
    layout), preservation across a merge-on-read DELETE (files unchanged)
    and an OPTIMIZE rewrite (ids materialized into the compacted file) —
    one green row set certifies enable → dv-delete → compact keeps every
    surviving row's id exactly as first assigned, which the oracle
    reproduces arithmetically: even keys get rank-1 among evens, odd keys
    get n_even + rank-1 among odds, %7 keys deleted AFTER assignment."""
    src = _rt_chain(spark, sf)
    from ..sources.snapshots import read_snapshot

    return (
        read_snapshot(spark, src, with_row_ids=True)
        .select("o_orderkey", F.col("_row_id").alias("row_id"))
        .orderBy("o_orderkey")
    )


ORACLE_DML_ROW_TRACKING_IDS = """
WITH ranked AS (
  SELECT o_orderkey,
         o_orderkey % 2 AS par,
         row_number() OVER (PARTITION BY o_orderkey % 2
                            ORDER BY o_orderkey) - 1 AS rk
  FROM orders
),
sized AS (
  SELECT count(*) AS n_even FROM ranked WHERE par = 0
)
SELECT o_orderkey,
       (CASE WHEN par = 0 THEN rk ELSE n_even + rk END)::BIGINT AS row_id
FROM ranked, sized
WHERE o_orderkey % 7 <> 0
ORDER BY o_orderkey
"""


QUERIES: dict[str, Query] = {
    "dml_row_tracking_ids": Query(
        q_dml_row_tracking_ids,
        ORACLE_DML_ROW_TRACKING_IDS,
        ("dml", "row-tracking", "optimize"),
    ),
    "dml_scd2_dimension": Query(
        q_dml_scd2_dimension,
        ORACLE_DML_SCD2_DIMENSION,
        ("dml", "scd2", "merge", "history"),
    ),
    "dml_replace_where_mv": Query(
        q_dml_replace_where_mv,
        ORACLE_DML_REPLACE_WHERE_MV,
        ("dml", "replacewhere", "mv", "partition"),
    ),
    "dml_snapshot_mv_totals": Query(
        q_dml_snapshot_mv_totals,
        ORACLE_DML_SNAPSHOT_MV_TOTALS,
        ("dml", "merge", "mv", "agg"),
    ),
    "dml_change_feed_audit": Query(
        q_dml_change_feed_audit,
        ORACLE_DML_CHANGE_FEED_AUDIT,
        ("dml", "cdc", "audit"),
    ),
    "dml_time_travel_totals": Query(
        q_dml_time_travel_totals,
        ORACLE_DML_TIME_TRAVEL_TOTALS,
        ("dml", "timetravel", "agg"),
    ),
}
