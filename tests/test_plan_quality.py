"""Physical-plan quality gates — the 100 TB design contract, enforced.

Correctness tests prove the small-SF answers match DuckDB; these prove the
*plans* are the ones that survive a 1000-executor scale-up:

- small dimensions are broadcast (no shuffle of the big fact side),
- predicates reach the parquet scan (PushedFilters),
- aggregations run inside WholeStageCodegen (JVM, not interpreted),
- no row-at-a-time Python UDF (BatchEvalPython) appears in ANY catalog
  query — Python is allowed only via Arrow (ArrowEvalPython / mapInPandas).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from customer_activity_lakehouse_spark.plans import QUERIES


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


BROADCAST_EXPECTED = [
    "revenue_by_brand_month",  # part dim broadcast under fact join
    "building_top_orders",  # filtered customer dim broadcast
    "region_nation_revenue",  # region/nation/supplier dims broadcast
    "ann_topk_bruteforce",  # 1-row query vector broadcast
    "ann_ivf_topk",  # centroid table + probe cell broadcast
]


@pytest.mark.parametrize("name", BROADCAST_EXPECTED)
def test_broadcast_join_used(spark, sf_correctness, name):
    plan = explain_str(QUERIES[name].fn(spark, sf_correctness))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"{name}: expected a broadcast join in the physical plan:\n{plan}"
    )


PUSHDOWN_EXPECTED = [
    "building_top_orders",  # date + segment predicates
    "large_orders",
    "small_qty_revenue",
]


@pytest.mark.parametrize("name", PUSHDOWN_EXPECTED)
def test_filters_pushed_to_scan(spark, sf_correctness, name):
    plan = explain_str(QUERIES[name].fn(spark, sf_correctness))
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters:" in ln and "PushedFilters: []" not in ln
    ]
    assert pushed, f"{name}: no non-empty PushedFilters in scan:\n{plan}"


CODEGEN_EXPECTED = ["pricing_summary", "revenue_by_brand_month", "order_status_rollup"]


@pytest.mark.parametrize("name", CODEGEN_EXPECTED)
def test_wholestage_codegen(spark, sf_correctness, name):
    # AQE hides codegen stages until the plan is finalized — execute first,
    # then check the final adaptive plan for `*(N)` codegen-span markers.
    df = QUERIES[name].fn(spark, sf_correctness)
    df.collect()
    plan = explain_str(df, "simple")
    assert "isFinalPlan=true" in plan
    assert "*(" in plan or "WholeStageCodegen" in plan, (
        f"{name}: plan fell out of codegen:\n{plan}"
    )


def test_no_row_python_udf_anywhere(spark, sf_correctness):
    """Row-at-a-time Python UDFs serialize row-by-row through the Python
    worker — the one pattern that cannot be saved at scale. Arrow-vectorized
    exchange (ArrowEvalPython) is the only Python allowed."""
    offenders = []
    for name, q in QUERIES.items():
        plan = explain_str(q.fn(spark, sf_correctness), "simple")
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-Python UDF in: {offenders}"


def test_top_suppliers_no_global_window(spark, sf_correctness):
    """Regression gate for the q15-shape top-k: the global ordering must be
    a TakeOrderedAndProject (per-partition heaps, driver merge), never an
    unpartitioned Window over the full agg output — that funnels every
    post-agg row through ONE task at scale. The rank window is allowed only
    AFTER the limit (it sees 3 rows)."""
    plan = explain_str(QUERIES["top_suppliers"].fn(spark, sf_correctness))
    assert "TakeOrderedAndProject" in plan, (
        f"top_suppliers: global top-k not limit-bounded:\n{plan}"
    )


def test_range_join_is_banded_equi_join(spark, sf_correctness):
    """The interval join must execute as an EQUI join on the time-bucket
    band key with the range predicate as a post-filter. Without the band
    key Catalyst's only plan for a pure inequality join is
    BroadcastNestedLoopJoin / CartesianProduct over the raw events — the
    shape that scans |events| x |incidents| pairs at 100 TB."""
    plan = explain_str(QUERIES["events_range_join"].fn(spark, sf_correctness))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"events_range_join fell back to a nested-loop join:\n{plan}"
    )


def test_asof_join_single_window_shuffle(spark, sf_correctness):
    """The as-of join's contract is union-and-window: ONE exchange keyed by
    user_id feeding the window (plus the clicks pre-dedup agg, which hashes
    on a superset key). A per-row range probe or a global (unpartitioned)
    window would not survive scale."""
    plan = explain_str(QUERIES["events_asof_join"].fn(spark, sf_correctness))
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan
    # no unpartitioned window: every Window operator's spec must name user_id
    win_lines = [ln for ln in plan.splitlines() if ln.strip().startswith("Arguments:") and "windowspecdefinition" in ln]
    for ln in win_lines:
        assert "user_id" in ln, f"unpartitioned window in asof join:\n{ln}"


def test_anomaly_zscore_bucket_then_series_exchanges_only(spark, sf_correctness):
    """The rolling z-score must shuffle BUCKETS, never events: exactly two
    hash exchanges (the (type, minute) partial-agg groupBy, then the
    per-series window re-key), a window partitioned by event_type (a
    global window would single-task at scale), and no join of any kind."""
    import re

    plan = explain_str(QUERIES["events_anomaly_zscore"].fn(spark, sf_correctness))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    assert n_exchanges == 2, plan
    assert "windowspecdefinition(event_type" in plan, "window not keyed by event_type"
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_curation_funnel_no_nested_loop_and_broadcast_flags(spark, sf_correctness):
    """The funnel joins its per-doc flag frames back on doc_id and checks
    grams against the (bounded, eval-suite-sized) benchmark set — all as
    hash or broadcast HASH joins; any BroadcastNestedLoop/Cartesian here
    means a flag join degenerated to pair enumeration."""
    plan = explain_str(QUERIES["doc_curation_funnel"].fn(spark, sf_correctness))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # bench-gram set rides a broadcast


def test_pareto_prefix_sum_never_single_partitions_customers(spark, sf_correctness):
    """The Pareto query's exact global cumulative sum must run as the
    two-level banded scan: the only SinglePartition exchange is the TINY
    per-band table (downstream of the band groupBy), and the per-customer
    window is PARTITIONED BY band — a global ORDER BY window over customers
    would single-task at scale."""
    plan = explain_str(QUERIES["revenue_pareto_customers"].fn(spark, sf_correctness))
    # exactly one SinglePartition exchange, and it must sit in the banded
    # rollup branch (above a band-keyed aggregate), not over raw customers
    assert plan.count("SinglePartition") == 1, plan
    # the big-side window is keyed by band (bounded partitions)
    assert "windowspecdefinition(band" in plan, "customer window lost its band key"
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_sliding_rates_two_exchanges_no_raw_event_shuffle(spark, sf_correctness):
    """Sliding windows are a generator (3 windows per event) + partial-agg
    groupBy: exactly two hash exchanges (partial->final agg), no join, no
    shuffle of raw events."""
    import re

    plan = explain_str(QUERIES["events_sliding_rates"].fn(spark, sf_correctness))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    assert n_exchanges <= 2, plan
    assert "Join" not in plan


def test_vocab_topk_is_take_ordered(spark, sf_correctness):
    """Top-K vocab selection must be TakeOrderedAndProject (per-partition
    heaps), not a full sort of the vocabulary."""
    plan = explain_str(QUERIES["doc_vocab_stats"].fn(spark, sf_correctness))
    assert "TakeOrderedAndProject" in plan, (
        f"doc_vocab_stats sorts the whole vocab:\n{plan}"
    )


def test_partition_pruning(spark, tmp_path):
    """A date-partitioned write read back with a partition predicate must
    prune at planning time (the reference's raison d'être for hive
    partitioning, data_processing.py:218)."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string")).alias("dt"),
    )
    out = str(tmp_path / "part")
    df.write.mode("overwrite").partitionBy("dt").parquet(out)
    back = spark.read.parquet(out).filter(F.col("dt") == "2024-01-02")
    plan = explain_str(back)
    assert "PartitionFilters" in plan and "dt" in plan
    # only one of three partitions survives the scan
    assert back.count() == 33


def test_kmeans_never_shuffles_vectors(spark, sf_correctness):
    """Distributed Lloyd's contract: per iteration the vectors stay put —
    centroids ride a broadcast (1-row array via BroadcastNestedLoop is the
    intended shape), the argmin is map-side, and the ONLY hash exchanges
    are cluster-keyed partial-agg updates (K rows). A vec_id-keyed
    exchange means the plan started shuffling vectors."""
    import re

    plan = explain_str(QUERIES["embedding_kmeans"].fn(spark, sf_correctness), "simple")
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    # r14 (Arrow assign kernel): the update aggregations run in their own
    # per-iteration jobs (each a cluster-keyed K-row partial agg), so the
    # RETURNED final-assignment plan is scan → in-row argmin with no
    # exchange at all; any hash exchange that does appear must still be
    # cluster-keyed, and a vec_id-keyed one means vectors started moving.
    assert set(hash_keys) <= {"cluster"}, f"non-cluster exchanges: {hash_keys}"
    assert "ArrowEvalPython" in plan, plan
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_semantic_cells_vectors_shuffle_only_by_cell(spark, sf_correctness):
    """SemDeDup composition contract (VERDICT r7 #6): the clustering
    phase never shuffles vectors (kmeans gate above), and the within-cell
    pair search shuffles them exactly once, keyed by CLUSTER — every hash
    exchange in the plan is cluster-keyed, and the pair join is an equi
    join on the cell, never pair enumeration."""
    import re

    plan = explain_str(
        QUERIES["dedup_semantic_cells"].fn(spark, sf_correctness), "simple"
    )
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert hash_keys, plan
    assert set(hash_keys) == {"cluster"}, f"non-cluster exchanges: {hash_keys}"
    assert "CartesianProduct" not in plan
    # r10 (VERDICT r9 weak #1): the per-cell candidate cap must compile to
    # WindowGroupLimit (rank-limit pushdown — the dedup_setsim_capped
    # shape), so a megacell is bounded BEFORE the pair join, per partition,
    # without a full within-cell sort materializing.
    phys = (
        QUERIES["dedup_semantic_cells"]
        .fn(spark, sf_correctness)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in phys, phys


def test_setsim_prefix_equi_joins_only(spark, sf_correctness):
    """Prefix filtering exists to make the similarity join an EQUI join on
    prefix tokens; NestedLoop/Cartesian anywhere means the candidate
    generation degenerated to pair enumeration."""
    plan = explain_str(QUERIES["dedup_setsim_prefix"].fn(spark, sf_correctness), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_global_enumerate_windows_are_bucket_partitioned(spark, sf_correctness):
    """The scalable-enumeration contract: the big-side row_number window
    is PARTITIONED BY the range bucket (bounded partitions) and the only
    unpartitioned window (the offset cumsum) sits above the per-bucket
    aggregate — i.e. every row_number spec names the bucket key, and no
    SinglePartition exchange feeds a row_number."""
    plan = explain_str(QUERIES["orders_global_enumerate"].fn(spark, sf_correctness), "simple")
    for ln in plan.splitlines():
        if "row_number()" in ln:
            assert "windowspecdefinition(bucket" in ln, (
                f"row_number window lost its bucket key:\n{ln}"
            )
    assert "CartesianProduct" not in plan


def test_setsim_capped_bounded_candidates_shape(spark, sf_correctness):
    """The capped setsim variant's contract: posting-cap via a token-keyed
    row_number window (never a global one), equi joins only — candidate
    volume then has the Σ min(|posting|, CAP)² bound regardless of corpus
    pathology (measured: 102s -> 2.6s at sf0.1 vs the exact variant)."""
    plan = explain_str(QUERIES["dedup_setsim_capped"].fn(spark, sf_correctness), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "row_number()" in ln:
            # WindowGroupLimit = Spark's rank-limit pushdown (per-partition
            # top-CAP before the shuffle) — the ideal shape for the cap
            assert "windowspecdefinition(token" in ln or "WindowGroupLimit [token" in ln, (
                f"posting-cap window lost its token key:\n{ln}"
            )
    assert "WindowGroupLimit" in plan, "rank-limit pushdown missing for the posting cap"


def test_trade_flows_broadcasts_all_dims(spark, sf_correctness):
    """Q7-shape contract: the fact side shuffles once (lineitem co-joined
    with orders); customer/supplier/nation×2 all ride broadcasts — any
    SortMergeJoin against a dim means a dim shuffled the fact table."""
    plan = explain_str(QUERIES["nation_trade_flows"].fn(spark, sf_correctness), "simple")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan


def test_market_basket_mapside_pairs_and_takeordered(spark, sf_correctness):
    """Basket pairs must be generated MAP-SIDE from the per-order part
    arrays (a Generate/explode over the combinatorics expression) — never
    an orderkey SELF-join, which reshuffles lineitem twice more for the
    same pair stream. The only row-pairing join allowed is the 1-row
    n_orders broadcast (Catalyst may spell that Cartesian — 1×N is fine,
    |parts|×|parts| is not). Top-k must be TakeOrderedAndProject."""
    plan = explain_str(QUERIES["part_market_basket"].fn(spark, sf_correctness), "simple")
    assert "Generate explode" in plan, f"pair generation is not an explode:\n{plan}"
    self_join = any(
        ("SortMergeJoin" in ln or "ShuffledHashJoin" in ln) and "l_orderkey" in ln
        for ln in plan.splitlines()
    )
    assert not self_join, f"basket pairs regressed to an orderkey self-join:\n{plan}"
    # exactly the one 1-row totals pairing, nothing pair-enumerating beyond it
    assert plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pagerank_iterations_never_rescan_facts(spark, sf_correctness):
    """The iterative-lineage trap (connected_components precedent): the
    edge list is materialized once via checkpoint, so the FINAL plan of
    the 3-iteration rank chain contains ZERO parquet scans of lineitem —
    re-deriving edges per iteration would triple the fact join."""
    plan = explain_str(QUERIES["nation_pagerank"].fn(spark, sf_correctness), "simple")
    assert "lineitem" not in plan, (
        f"pagerank iterations re-scan the fact table:\n{plan[:2000]}"
    )


def test_trade_paths_iterations_never_rescan_facts(spark, sf_correctness):
    """Same iterative-lineage gate as pagerank for the min-plus
    Bellman-Ford chain: the edge frame checkpoints before the relaxation
    loop, so the final 4-round plan contains zero lineitem scans."""
    plan = explain_str(QUERIES["nation_trade_paths"].fn(spark, sf_correctness), "simple")
    assert "lineitem" not in plan, (
        f"trade-path relaxations re-scan the fact table:\n{plan[:2000]}"
    )


def test_priority_drift_equi_joins_only(spark, sf_correctness):
    """The point-in-time SCD lookup must ride two equi HASH joins
    (orderkey, then custkey with the interval range predicate as a
    post-join filter) — a NestedLoop/Cartesian means Catalyst treated the
    range condition as the join itself, which is all-pairs at scale. The
    interval windows must stay customer-keyed."""
    plan = explain_str(QUERIES["priority_drift_revenue"].fn(spark, sf_correctness), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(o_custkey" in plan, "interval windows lost the customer key"


def test_systematic_sample_banded_prefix_sum(spark, sf_correctness):
    """Same contract as the Pareto scan it reuses: the exact global char
    prefix sum may single-partition ONLY the tiny per-band table, and the
    per-document window is PARTITIONED BY band — a global ORDER BY doc_id
    window would single-task the corpus."""
    plan = explain_str(QUERIES["doc_systematic_sample"].fn(spark, sf_correctness))
    assert plan.count("SinglePartition") == 1, plan
    assert "windowspecdefinition(band" in plan, "per-doc window lost its band key"
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_weighted_sample_banded_prefix_sum(spark, sf_correctness):
    """The quality-weighted sampler inherits the systematic sampler's
    scale contract: one SinglePartition (the per-band offsets table
    only), per-doc window partitioned by band, no nested-loop joins."""
    plan = explain_str(QUERIES["doc_sample_weighted"].fn(spark, sf_correctness))
    assert plan.count("SinglePartition") == 1, plan
    assert "windowspecdefinition(band" in plan, "per-doc window lost its band key"
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_chisq_single_fact_aggregation(spark, sf_correctness):
    """Chi-square's scale contract: orders-scale data aggregates EXACTLY
    ONCE (separate groupBy branches per marginal would re-evaluate the
    whole fact join 4x — the duplicated-subtree trap); marginals/totals
    are windows over the 25-row cell frame, whose unpartitioned form is
    bounded by the categorical cardinalities."""
    plan = explain_str(
        QUERIES["segment_priority_chisq"].fn(spark, sf_correctness), "simple"
    )
    # one scan each: the fact subtree is shared, never duplicated
    assert plan.count("orders.parquet") == 1, plan
    assert plan.count("customer.parquet") == 1, plan
    assert "windowspecdefinition" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_label_similarity_never_shuffles_vectors(spark, sf_correctness):
    """Class-centroid similarity: vectors reduce map-side into the
    struct-of-64-sums partial agg, so the ONLY hash exchange is label-keyed
    (|labels| rows); the pair fan-out is a broadcast self-join of that tiny
    frame (BroadcastNestedLoop on label_a < label_b is the intended shape).
    An embedding/vec_id-keyed exchange means vectors started shuffling."""
    import re

    plan = explain_str(QUERIES["embedding_label_similarity"].fn(spark, sf_correctness), "simple")
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert hash_keys, plan
    assert set(hash_keys) == {"label"}, f"non-label exchanges: {hash_keys}"
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_session_native_single_user_exchange(spark, sf_correctness):
    """Native session_window contract: events shuffle ONCE (user-keyed)
    into the MergingSessions aggregate — with a map-side partial session
    agg below the exchange — and the per-user rollup reuses that
    partitioning (no second event-volume exchange)."""
    import re

    plan = explain_str(QUERIES["events_session_stats_native"].fn(spark, sf_correctness), "simple")
    assert "MergingSessions" in plan, f"session_window not planned as merging agg:\n{plan}"
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert hash_keys == ["user_id"], f"expected one user-keyed exchange, got: {hash_keys}"


def test_best_supplier_argmax_no_window(spark, sf_correctness):
    """max(struct(...)) argmax contract: partial-aggregable map-side combine
    (partial_max below the exchange), ONE nationkey exchange, nation rides a
    broadcast — and NO Window/row_number anywhere (the idiom this replaces)."""
    plan = explain_str(QUERIES["nation_best_supplier"].fn(spark, sf_correctness), "simple")
    assert "partial_max(struct(" in plan, f"argmax lost its map-side partial agg:\n{plan}"
    assert "Window" not in plan and "row_number" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_orders_above_cust_avg_broadcast_and_hash_joins(spark, sf_correctness):
    """Decorrelated self-relative filter: the per-customer aggregate joins
    back on custkey as a hash join and the segment dim is broadcast —
    NestedLoop/Cartesian would mean the correlation survived to the plan."""
    plan = explain_str(QUERIES["orders_above_cust_avg"].fn(spark, sf_correctness), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_data_quality_audit_hash_antijoins_only(spark, sf_correctness):
    """Referential checks must plan as hash LEFT ANTI joins (build or
    co-shuffle) — a nested-loop anti join degenerates to all-pairs on the
    fact side at scale."""
    plan = explain_str(QUERIES["data_quality_audit"].fn(spark, sf_correctness), "simple")
    assert "LeftAnti" in plan, f"anti-join checks missing:\n{plan}"
    for ln in plan.splitlines():
        if "LeftAnti" in ln:
            assert "HashJoin" in ln, f"anti join fell out of hash strategy:\n{ln}"
    assert "CartesianProduct" not in plan


def test_customer_360_single_shuffle_per_dataset(spark, sf_correctness):
    """The clickstream⋈star join: events and orders each shuffle exactly
    once (into their per-user partial aggs / the join), the segment dim is
    broadcast — no event-volume or order-volume data moves twice."""
    import re

    plan = explain_str(QUERIES["customer_engagement_360"].fn(spark, sf_correctness), "simple")
    assert "BroadcastHashJoin" in plan, plan
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    # exchanges are keyed by the shared user key (user_id / o_custkey) for
    # the per-user aggregates and their join, plus the tiny final segment
    # rollup (post-partial-agg, |users|→|segments| rows) — nothing else
    assert hash_keys and set(hash_keys) <= {"user_id", "o_custkey", "c_mktsegment"}, hash_keys
    assert "CartesianProduct" not in plan


def test_rolling_7d_window_runs_on_day_aggregate(spark, sf_correctness):
    """The trailing-7d RANGE window must consume the DAY-LEVEL aggregate
    (calendar-bounded rows), never raw orders: the plan's window sits above
    a hash aggregate keyed by day, and the only SinglePartition exchange
    feeds that calendar-bounded frame."""
    plan = explain_str(QUERIES["revenue_rolling_7d"].fn(spark, sf_correctness))
    assert "specifiedwindowframe(RangeFrame" in plan, f"RANGE frame missing:\n{plan}"
    # the window's input is the aggregated frame: partial_sum (map-side
    # combine over raw orders) appears below the exchange feeding the sort
    assert "partial_sum" in plan, plan
    assert plan.count("SinglePartition") == 1, plan


def test_retention_matrix_single_event_shuffle_no_join(spark, sf_correctness):
    """Cohort retention's scale contract: NO join anywhere (the naive
    spelling self-joins events back onto a min-window), exactly one
    event-volume exchange (user-keyed, into the per-user week-set partial
    agg — ObjectHashAggregate does map-side combine), and the final
    (cohort, offset) rollup re-shuffles only the already-tiny exploded
    frame."""
    import re

    plan = explain_str(QUERIES["events_retention_matrix"].fn(spark, sf_correctness), "simple")
    assert "Join" not in plan, f"retention must not join:\n{plan}"
    assert "Window" not in plan, plan
    user_exchanges = re.findall(r"Exchange hashpartitioning\(user_id#", plan)
    assert len(user_exchanges) == 1, f"events must shuffle exactly once:\n{plan}"


def test_audience_overlap_no_event_self_join(spark, sf_correctness):
    """Audience overlap must come from per-user type SETS (HOF pair
    fan-out), never the quadratic events-on-events self-join: the only
    event exchanges are the user-keyed set aggregate (it feeds both the
    pair and audience branches — two IDENTICAL map-side-combined
    exchanges in the static plan, deduped by exchange reuse at runtime),
    and the only joins are the |types|-row audience broadcasts."""
    df = QUERIES["events_audience_overlap"].fn(spark, sf_correctness)
    static_plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in static_plan, f"event-scale join leaked in:\n{static_plan}"
    assert "CartesianProduct" not in static_plan, static_plan
    assert "BroadcastHashJoin" in static_plan, static_plan  # |types|-row dims
    assert "partial_collect_set" in static_plan, static_plan  # map-side combine
    # The per-user set aggregate feeds three branches (pairs, n_a, n_b) —
    # the static plan shows identical user exchanges per branch; at
    # RUNTIME AQE's exchange reuse must collapse them so events scan and
    # shuffle once. Execute and assert on the final plan.
    df.collect()
    final_plan = explain_str(df, "simple")
    assert "isFinalPlan=true" in final_plan
    assert "ReusedExchange" in final_plan, f"user shuffle not reused:\n{final_plan}"


def test_shipment_concurrency_window_on_date_aggregate(spark, sf_correctness):
    """The sweep-line's scale contract: the single ordered running-sum
    window consumes the DATE-level net-delta aggregate (calendar-bounded),
    never the raw endpoint stream — partial_sum below the one
    SinglePartition exchange proves the fact collapsed map-side first."""
    plan = explain_str(QUERIES["shipment_concurrency"].fn(spark, sf_correctness))
    assert plan.count("SinglePartition") == 1, plan
    assert "partial_sum" in plan, plan


def test_ranksum_window_on_value_aggregate(spark, sf_correctness):
    """Mann-Whitney's scale contract (same doctrine as the sweep-line):
    the single ordered midrank window consumes the distinct-CENT-VALUE
    aggregate, never a rank() over raw orders — partial counts below the
    one SinglePartition exchange prove the fact collapsed map-side."""
    plan = explain_str(QUERIES["priority_ranksum_test"].fn(spark, sf_correctness))
    assert plan.count("SinglePartition") <= 2, plan  # value window + 1-row moments
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_order_streaks_no_join_customer_partitioned_window(spark, sf_correctness):
    """Gaps-and-islands must stay join-free; its only window partitions by
    customer (bounded partitions, never a global sort)."""
    plan = explain_str(
        QUERIES["customer_order_streaks"].fn(spark, sf_correctness), "simple"
    )
    assert "Join" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_key_skew_profile_single_fact_shuffle(spark, sf_correctness):
    """The skew profile pays ONE event-scale exchange (groupBy suppkey
    with map-side partial_count); the percentiles run on the |keys|
    count frame, and (r10) the top-10 share is a TakeOrdered 10-row
    frame — never a global row_number window over |keys| rows (keys
    grow with the fact table)."""
    import re

    df = QUERIES["lineitem_key_skew_profile"].fn(spark, sf_correctness)
    plan = explain_str(df, "simple")
    assert "partial_count" in explain_str(df)
    # the counts frame feeds TWO branches (top-10 and the main aggregate):
    # the static plan shows one identical suppkey exchange per branch; at
    # runtime AQE's exchange reuse collapses them so lineitem scans and
    # shuffles ONCE (the events_audience_overlap precedent).
    key_exchanges = re.findall(r"Exchange hashpartitioning\(l_suppkey#", plan)
    assert 1 <= len(key_exchanges) <= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "row_number" not in plan, plan
    if len(key_exchanges) == 2:
        df.collect()
        final_plan = explain_str(df, "simple")
        assert "isFinalPlan=true" in final_plan
        assert "ReusedExchange" in final_plan, (
            f"suppkey shuffle not reused:\n{final_plan}"
        )


def test_ann_sq_vectors_never_shuffle(spark, sf_correctness):
    """SQ8 ANN scale contract: the corpus scan dequantizes and scores
    in-place against broadcast codebook + query (BroadcastNestedLoop cross
    joins) and finishes in TakeOrdered — corpus vectors must never enter a
    hash exchange or a sort-merge join. The only exchanges allowed belong
    to the 64-row codebook build (pos-keyed) and the k-row result."""
    import re

    plan = explain_str(QUERIES["ann_sq_topk"].fn(spark, sf_correctness), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert set(hash_keys) <= {"pos"}, f"vector-scale exchanges: {hash_keys}"


def test_unigram_logprob_topk_no_global_sort(spark, sf_correctness):
    """Unigram surprisal: per-doc sums are partial-aggregated map-side and
    the top-K is TakeOrdered. The ONLY single-partition stage allowed is
    the scalar corpus-token total (a 1-row broadcast, partial_sum below
    it); a second one would mean the corpus hit a global sort/window."""
    plan = explain_str(QUERIES["doc_unigram_logprob"].fn(spark, sf_correctness))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("SinglePartition") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_zipf_slope_windows_vocab_by_lang(spark, sf_correctness):
    """Zipf fit: the ranking window partitions by lang over the VOCAB
    rollup (partial_count proves the corpus collapsed map-side first);
    no single-partition stage anywhere."""
    plan = explain_str(QUERIES["doc_zipf_slope"].fn(spark, sf_correctness))
    assert "SinglePartition" not in plan, plan
    assert "partial_count" in plan, plan


def test_ann_pq_vectors_shuffle_only_for_training_aggs(spark, sf_correctness):
    """PQ contract: encoding + ADC scoring are in-row against the
    broadcast codebook (TakeOrdered finish); the only hash exchanges
    allowed are the training aggregates — seed buckets and (m, cluster)
    codebook updates. A vec_id/embedding-keyed exchange means corpus
    vectors started shuffling."""
    import re

    plan = explain_str(QUERIES["ann_pq_topk"].fn(spark, sf_correctness), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    hash_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert set(hash_keys) <= {"m", "cluster"}, f"vector-scale exchanges: {hash_keys}"


def test_theta_overlap_samples_before_shuffle_and_reuses_scan(spark, sf_correctness):
    """The theta sketch's scale contract: the θ-filter runs map-side UNDER
    the first exchange (only the hash sample ever shuffles), pair fan-out
    is the HOF expansion (no event self-join), audiences ride broadcasts,
    and at runtime AQE's exchange reuse collapses the three logical
    branches onto ONE θ-filtered events scan."""
    df = QUERIES["events_theta_overlap"].fn(spark, sf_correctness)
    static_plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in static_plan, static_plan
    assert "CartesianProduct" not in static_plan, static_plan
    assert "BroadcastHashJoin" in static_plan, static_plan
    # θ-filter (conv(substring(md5(...)))) runs map-side — the sample is
    # taken before any shuffle
    assert "conv(substring(md5(" in static_plan, static_plan
    df.collect()
    final_plan = explain_str(df, "simple")
    assert "isFinalPlan=true" in final_plan
    assert final_plan.count("ReusedExchange") >= 2, (
        f"audience branches must reuse the sampled exchange:\n{final_plan}"
    )


def test_heavy_hitters_candidates_broadcast_no_vocab_shuffle(spark, sf_correctness):
    """Two-pass MG's scale contract: pass 1 (MapInPandas) runs with NO
    exchange below it — per-partition summaries only; the candidate set
    reaches pass 2 as a BROADCAST left-semi (the full-vocab token shuffle
    never happens); the final rollup is a map-side-combined partial
    aggregate into TakeOrdered, not a global sort."""
    plan = explain_str(QUERIES["doc_token_heavy_hitters"].fn(spark, sf_correctness), "simple")
    assert "MapInPandas" in plan, plan
    # nothing below MapInPandas but the generate+scan: no exchange feeds it
    below = plan.split("MapInPandas", 1)[1]
    assert "Exchange" not in below.split("Scan parquet", 1)[0], plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in explain_str(
        QUERIES["doc_token_heavy_hitters"].fn(spark, sf_correctness)
    ), "second pass must map-side combine"


def test_bigram_logprob_hof_stream_no_global_sort(spark, sf_correctness):
    """Bigram scoring's scale contract: bigrams come from a Generate over
    the per-doc token array (never a token self-join or position window),
    per-doc sums map-side combine, and the top-K is TakeOrdered — no
    global sort of the scored corpus."""
    plan = explain_str(QUERIES["doc_bigram_logprob"].fn(spark, sf_correctness), "simple")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in explain_str(
        QUERIES["doc_bigram_logprob"].fn(spark, sf_correctness)
    ), "per-doc rollup must map-side combine"


def test_cdc_chunks_windows_per_doc_no_join(spark, sf_correctness):
    """Content-defined chunking's scale contract: join-free end to end;
    the prefix-sum window partitions by doc_id (bounded by doc length —
    never a global sort / SinglePartition funnel)."""
    plan = explain_str(QUERIES["doc_cdc_chunks"].fn(spark, sf_correctness), "simple")
    assert "Join" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan, plan


def test_ann_ivfpq_cells_broadcast_codes_in_row(spark, sf_correctness):
    """IVF-PQ composition contract (tightened r15): the SERVE plan is one
    corpus scan — cell assignment (Arrow kernel over the collected
    centroids) → map-side probe-cell filter → in-row ADC scoring →
    TakeOrdered. The probe is ranked on the driver from the K centroid
    rows training already collected, so the plan has NO join and NO
    exchange of any kind (r14 still broadcast-joined a probe frame whose
    lineage re-ran a corpus pass, then joined candidates back by vec_id)."""
    import re

    plan = explain_str(QUERIES["ann_ivfpq_topk"].fn(spark, sf_correctness), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    hash_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert not hash_keys, f"serve plan should be exchange-free: {hash_keys}"
    assert plan.count("ArrowEvalPython") >= 1, plan


def test_containment_prefix_postings_no_nested_loop(spark, sf_correctness):
    """Containment dedup's scale contract: candidates come from the
    (prefix × full) posting join — hash joins on the shingle key — and
    the exact verify re-joins documents BY doc_id; no nested-loop or
    cartesian pair enumeration anywhere."""
    plan = explain_str(QUERIES["dedup_containment"].fn(spark, sf_correctness), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_count" in explain_str(
        QUERIES["dedup_containment"].fn(spark, sf_correctness)
    ), "df counts must map-side combine"


def test_pca_power_vectors_never_shuffle(spark, sf_correctness):
    """Power iteration's scale contract: per iteration ONE broadcast of v
    and ONE global partial-aggregated sum (D integer sums → a
    SinglePartition merge of partial rows); corpus vectors never hash-
    shuffle. Any hashpartitioning exchange means a vector-scale shuffle
    leaked in."""
    import re

    from customer_activity_lakehouse_spark.plans.ml_ops import PCA_ITERS

    plan = explain_str(QUERIES["embedding_pca_power"].fn(spark, sf_correctness), "simple")
    assert "BroadcastExchange" in plan, plan
    assert not re.search(r"Exchange hashpartitioning", plan), plan
    assert plan.count("SinglePartition") == PCA_ITERS, plan
    assert "partial_sum" in explain_str(
        QUERIES["embedding_pca_power"].fn(spark, sf_correctness)
    ), "per-dim sums must map-side combine"


def test_mann_kendall_pair_join_on_day_aggregate(spark, sf_correctness):
    """Mann-Kendall's scale contract: the O(|dates|^2) pair join runs on
    the DAY-AGGREGATED frame only — both join inputs are hash aggregates
    keyed by o_orderdate (map-side combined), so the nested-loop pair
    enumeration is constant in fact volume. A raw-orders pair join would
    show a FileScan feeding the BNLJ without the day collapse."""
    plan = explain_str(QUERIES["revenue_mann_kendall"].fn(spark, sf_correctness), "simple")
    assert "CartesianProduct" not in plan, plan
    # the inequality pair join exists and is the ONLY conditional
    # nested-loop (the census crossJoins are Cross over 1-row aggregates)
    assert plan.count("BroadcastNestedLoopJoin BuildRight, Inner") == 1, plan
    # day collapse on both pair branches: partial+final hash agg keyed by
    # o_orderdate (2 per branch) feed the join, never raw orders rows
    assert plan.count("HashAggregate(keys=[o_orderdate") >= 4, plan
    assert "partial_sum" in plan, "day collapse must map-side combine"


def test_triangle_count_no_conditional_nested_loop(spark, sf_correctness):
    """Triangle census's scale contract (Suri-Vassilvitskii): wedges close
    against the oriented edge set via EQUI joins — the only nested-loop
    joins in the plan are the Cross joins assembling four 1-row census
    aggregates. A quadratic all-pairs enumeration would surface as a
    conditional BroadcastNestedLoopJoin or CartesianProduct."""
    plan = explain_str(QUERIES["part_triangle_count"].fn(spark, sf_correctness), "simple")
    assert "CartesianProduct" not in plan, plan
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj == plan.count("BroadcastNestedLoopJoin BuildRight, Cross"), plan
    assert bnlj == 3, plan  # exactly the three census crossJoins


def test_winnowing_window_per_document_no_text_duplication(spark, sf_correctness):
    """Winnowing's scale contract: the k-gram hash stream is built by a
    row-local array transform (posexplode(transform(sequence(...)))) so
    the document text is never duplicated per position, and every lead()
    window partitions BY doc_id — no global sort, no single-partition
    window over the position stream."""
    plan = explain_str(QUERIES["doc_winnowing_fingerprints"].fn(spark, sf_correctness), "simple")
    assert "posexplode(transform(sequence(" in plan.replace("\n", ""), plan
    assert "windowspecdefinition(doc_id#" in plan, plan
    # the only SinglePartition exchanges feed the two 1-row census
    # aggregates — never the per-position window sort
    import re

    wins = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert wins and set(wins) == {"doc_id"}, wins


def test_suffix_dup_spans_text_never_shuffles(spark, sf_correctness):
    """Substring-dedup's scale contract (Lee et al. shape): T-char windows
    are hashed by a row-local array transform — the text never shuffles;
    the only corpus-wide exchange carries (doc_id, p, fp) into the
    fp-partitioned count window, and the span merge windows partition BY
    doc_id. No joins of window-scale frames."""
    import re

    plan = explain_str(QUERIES["doc_suffix_dup_spans"].fn(spark, sf_correctness), "simple")
    assert "posexplode(transform(sequence(" in plan.replace("\n", ""), plan
    assert "CartesianProduct" not in plan, plan
    # exchanges: the fp-count window and the doc-partitioned sweep — never
    # a text-bearing column
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan):
        assert m.group(1) in {"fp", "doc_id"}, plan
    wins = set(re.findall(r"windowspecdefinition\((\w+)#", plan))
    assert wins == {"fp", "doc_id"}, wins


def test_ann_index_query_serves_without_training(spark, sf_correctness):
    """The persisted-index serving contract (r9): the query plan contains
    NO training subtree — zero hash exchanges at all (the codes scan is
    scored in-row against broadcast codebooks and finishes in
    TakeOrdered), and the codes read is partition-pruned to the probed
    cells' files."""
    import re

    df = QUERIES["ann_index_query"].fn(spark, sf_correctness)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    # r14 (Arrow ADC kernel): the serve shuffles NOTHING — the codebook
    # is a 128-row driver collect baked into the kernel, so the plan is
    # scan → in-row scoring → TakeOrdered with zero hash exchanges (the
    # pre-r14 plan carried exactly one, the groupBy-m codebook collapse;
    # any (m, cluster) TRAINING agg appearing here would mean a retrain)
    assert plan.count("Exchange hashpartitioning(") == 0, plan
    # partition pruning on the index table: the codes scan touches fewer
    # files than the table holds (ceil(sqrt(nlist)) of nlist cells probed)
    from customer_activity_lakehouse_spark.plans.ann_index import _index_dir
    from customer_activity_lakehouse_spark.sources.snapshots import read_snapshot

    idx = _index_dir(spark, sf_correctness)
    all_codes = set(read_snapshot(spark, f"{idx}/codes").inputFiles())
    probed = {f for f in df.inputFiles() if "/codes/" in f and "-dv-" not in f}
    assert probed and len(probed) < len(all_codes), (len(probed), len(all_codes))


def test_dedup_incremental_minhash_reads_persisted_pairs(spark, sf_correctness):
    """The catalog entry reads the COMMITTED pairs table — no shingle
    recomputation rides repeated runs (the lifecycle mutates once,
    memoized; the query itself is a scan)."""
    df = QUERIES["dedup_incremental_minhash"].fn(spark, sf_correctness)
    files = df.inputFiles()
    assert files and all("/pairs/" in f for f in files), files
    plan = explain_str(df, "simple")
    assert "BatchEvalPython" not in plan, plan


def test_rank_stats_collapse_before_ranking(spark, sf_correctness):
    """The r9 rank statistics' scale contract: facts collapse to
    value-level frames FIRST (one partial-agg groupBy); the single
    ordered window runs over the distinct-value frame, never a rank()
    window over the fact table — so no plan may sort fact rows
    globally. Kendall additionally must never pair fact ROWS: its
    concordant/discordant join runs on the <=550-cell contingency frame
    (broadcast), so no SortMergeJoin can appear at all."""
    for name in (
        "lineitem_spearman_qty_price",
        "priority_revenue_kruskal",
        "lineitem_kendall_qty_discount",
    ):
        plan = explain_str(QUERIES[name].fn(spark, sf_correctness), "simple")
        assert "BatchEvalPython" not in plan, name
        # partial aggregation reaches the scan side (map-side combine)
        assert "partial_" in plan, f"{name}: no partial agg\n{plan}"
    kendall = explain_str(
        QUERIES["lineitem_kendall_qty_discount"].fn(spark, sf_correctness),
        "simple",
    )
    assert "SortMergeJoin" not in kendall, kendall
    # r10 (VERDICT r9 'weak'): the o_totalprice batteries' value frames
    # track |orders| (99.99% distinct), so their rank/ECDF maps must ride
    # the BANDED two-level prefix scan — no window may order the raw
    # value column WITHOUT a band partition. In plan text an unpartitioned
    # value window prints `windowspecdefinition(v#..., specifiedwindow...`
    # (partition columns, when present, come first) — forbid exactly that.
    for name in (
        "priority_revenue_kruskal",
        "priority_ranksum_test",
        "priority_ks_test",
    ):
        df = QUERIES[name].fn(spark, sf_correctness)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition(v#" not in plan, (
            f"{name}: single-partition window over the o_totalprice value "
            f"frame (use stats_ops.banded_prefix)\n{plan}"
        )
        # and the banded within-band window IS there, hash-partitioned
        assert "windowspecdefinition(__band#" in plan, name


def test_theil_sen_pairs_only_monthly_aggregate(spark, sf_correctness):
    """Theil-Sen's O(n²) pair join is legal ONLY because n is the ~80-row
    monthly aggregate: the join must be a broadcast over the collapsed
    frame (no SortMergeJoin, no exchange of fact rows into the pair
    join)."""
    plan = explain_str(
        QUERIES["revenue_theil_sen_trend"].fn(spark, sf_correctness), "simple"
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_mmr_single_corpus_scan_then_tiny_frames(spark, sf_correctness):
    """MMR's contract: ONE TakeOrdered pool scan of the corpus; the
    pairwise-similarity frame and all K greedy steps run on broadcast
    joins of the pool — no SortMergeJoin anywhere, and no more scans of
    the embeddings table than the pool + query subtrees need."""
    df = QUERIES["ann_mmr_rerank"].fn(spark, sf_correctness)
    plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_refined_serve_pool_fetch_is_pushed_id_lookup(spark, sf_correctness):
    """The r14 refine stage's full-vector fetch must reach the corpus
    scan as a pushed-down In(vec_id, ...) filter over the pool's ids
    with a 2-column ReadSchema — a stats-prunable point lookup, not a
    corpus scan feeding a join. Asserted on the REAL serve path: the
    frame query_ann_index_refined returns over the catalog's persisted
    index."""
    from pyspark.sql import functions as F

    from customer_activity_lakehouse_spark.plans.ann_index import (
        _index_dir,
        query_ann_index_refined,
    )
    from customer_activity_lakehouse_spark.plans.registry import table

    emb = table(spark, sf_correctness, "embeddings")
    refined = query_ann_index_refined(
        spark,
        _index_dir(spark, sf_correctness),
        emb.filter(F.col("vec_id") == 0).select("embedding"),
        emb.select("vec_id", "embedding"),
        exclude_id=0,
    )
    plan = explain_str(refined)
    assert "In(vec_id" in plan, plan
    assert "ReadSchema: struct<vec_id:bigint,embedding" in plan, plan
    # the exact-cosine re-rank stays JVM-side: no Python eval of any kind
    assert "BatchEvalPython" not in plan
