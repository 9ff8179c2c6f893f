"""SCD Type 2 apply — DLT's ``APPLY CHANGES ... STORED AS SCD TYPE 2``
re-expressed as ONE atomic MERGE on the snapshot log.

The dimension table holds full history: one row per (business key,
``valid_from``) with half-open ``[valid_from, valid_to)`` validity and
``valid_to IS NULL`` marking the current row — the same interval
vocabulary as the batch catalog's `customer_priority_scd` derivation
(plans/core.py), but MAINTAINED INCREMENTALLY under a stream of change
records instead of re-derived from the fact history each time.

How a batch applies (per business key):

1. the key's current OPEN row (if any) and the batch's change records
   form one timeline, ordered by ``order_col``;
2. every record closes its predecessor (``valid_to`` = successor's
   order value); ``delete`` records close without opening — a gap in
   coverage is exactly "the key did not exist then";
3. the rebuilt rows land via ONE ``merge_snapshot`` keyed on
   (business keys + ``valid_from``): the old open row MATCHES (its
   ``valid_to`` fills in), new versions INSERT. One commit — readers
   never observe a half-applied batch, and the change feed shows one
   change set.

Scale shape: only TOUCHED keys' open rows are read (broadcast semi-join
of the batch's key set against the ``valid_to IS NULL`` slice — at
100 TB that filter rides the log's file stats when ``valid_to`` is a
stats column); the timeline window partitions by business key with
batch-bounded partitions; the merge rewrites only the files the touched
keys live in (stats-pruned, like every merge).

Determinism / replay: applying the SAME batch twice converges — every
rebuilt row merges on its (key, valid_from) identity, so a replay
updates rows to the values they already hold. The streaming sink
(``streams.write_stream_apply_changes_scd2``) additionally stamps
(app_id, batch_id) so replays skip outright and the change feed stays
exact.

Reference basis: the reference overwrites dimension zones wholesale
(flows.py:243-275 re-lands dim_customer every run — history is lost);
SCD2 maintenance is part of the beyond-reference table layer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import snapshots as snap
from .tables import CHANGE_TYPES

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def apply_changes_scd2(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    keys: Sequence[str],
    order_col: str,
    change_col: str = "change_type",
    stats_cols: list[str] | None = None,
    extra: dict | None = None,
) -> int:
    """Apply one batch of change records as SCD2 history; returns the
    committed version. ``changes`` carries the business keys, the payload
    columns, ``order_col`` (event time / LSN — becomes ``valid_from``),
    and ``change_col`` ∈ insert/update/delete (+ update_preimage rows,
    dropped like DLT does). Fails loudly on: unknown change types,
    duplicate (key, order) records (no deterministic timeline), and
    out-of-order batches (a record at or before a key's open
    ``valid_from`` — late data must be sequenced upstream, Delta/DLT's
    own APPLY CHANGES contract)."""
    keys = list(keys)
    if change_col not in changes.columns:
        raise ValueError(f"apply_changes_scd2: no {change_col!r} column")
    if order_col not in changes.columns:
        raise ValueError(f"apply_changes_scd2: no {order_col!r} column")
    bad = changes.filter(~F.col(change_col).isin(*CHANGE_TYPES)).select(change_col).first()
    if bad is not None:
        raise ValueError(
            f"apply_changes_scd2: unknown change type {bad[0]!r} "
            f"(expected one of {CHANGE_TYPES})"
        )
    changes = changes.filter(F.col(change_col) != "update_preimage")
    dup = (
        changes.groupBy(*keys, order_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .first()
    )
    if dup is not None:
        raise ValueError(
            f"apply_changes_scd2: duplicate change records for key "
            f"{tuple(dup[k] for k in keys)} at {order_col}={dup[order_col]} — "
            "the timeline is ambiguous; dedupe upstream"
        )
    payload = [c for c in changes.columns if c not in (*keys, order_col, change_col)]
    recs = changes.select(
        *keys,
        *payload,
        F.col(order_col).alias("__ord"),
        F.col(change_col).alias("__chg"),
    )
    exists = bool(snap._list_versions(spark, table_dir))
    if exists:
        touched = recs.select(*keys).distinct()
        hist = snap.read_snapshot(spark, table_dir).join(
            F.broadcast(touched), keys, "left_semi"
        )
        # KNOWN records — those matching an existing (key, valid_from)
        # identity — are re-statements of already-applied history (the
        # crashed-and-replayed batch case); they drop from the timeline
        # (their intervals are already recorded; a replay's tail
        # re-merges to identical values). A correction that CHANGES a
        # known instant's payload is out of scope — that is UPDATE on
        # history, not APPLY CHANGES.
        ids = hist.select(*keys, F.col(VALID_FROM).alias("__ord")).distinct()
        novel = recs.join(ids, [*keys, "__ord"], "left_anti")
        # Out-of-order guard over NOVEL records only: a key's new records
        # must land strictly after its open row starts (open key) or at/
        # after its last closed boundary (key currently absent — a
        # delete's gap may be re-entered exactly at the delete instant,
        # half-open intervals make that adjacent, not overlapping).
        bounds = hist.groupBy(*keys).agg(
            F.max(F.when(F.col(VALID_TO).isNull(), F.col(VALID_FROM))).alias("open_vf"),
            F.max(VALID_TO).alias("last_to"),
        )
        viol = (
            novel.groupBy(*keys)
            .agg(F.min("__ord").alias("first_ord"))
            .join(bounds, keys)
            .filter(
                F.when(F.col("open_vf").isNotNull(), F.col("first_ord") <= F.col("open_vf"))
                .otherwise(F.col("first_ord") < F.col("last_to"))
            )
            .first()
        )
        if viol is not None:
            raise ValueError(
                f"apply_changes_scd2: out-of-order batch — key "
                f"{tuple(viol[k] for k in keys)} has a novel change at "
                f"{viol['first_ord']} inside already-recorded history "
                f"(open_from={viol['open_vf']}, last_to={viol['last_to']}); "
                "sequence late data upstream"
            )
        existing = (
            hist.filter(F.col(VALID_TO).isNull())
            .select(
                *keys,
                *payload,
                F.col(VALID_FROM).alias("__ord"),
                F.lit("existing").alias("__chg"),
            )
        )
        recs = existing.unionByName(novel)
    w = Window.partitionBy(*keys).orderBy("__ord")
    timeline = recs.withColumn("__next", F.lead("__ord").over(w))
    rows_out = timeline.filter(F.col("__chg") != "delete").select(
        *keys,
        *payload,
        F.col("__ord").alias(VALID_FROM),
        F.col("__next").alias(VALID_TO),
    )
    if not exists:
        return snap.commit_append(
            spark, table_dir, rows_out, stats_cols=stats_cols, extra=extra
        )
    return snap.merge_snapshot(
        spark,
        table_dir,
        rows_out,
        [*keys, VALID_FROM],
        stats_cols=stats_cols,
        extra=extra,
    )
