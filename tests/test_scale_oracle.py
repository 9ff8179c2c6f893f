"""sf0.1 oracle spot-checks for the heaviest catalog queries (slow-marked).

The driver's correctness pass runs at sf0.01; scale-dependent divergence —
cap thresholds starting to fire, float accumulation order, LSH bucket
population shifts — would be invisible there. This runs a handful of the
heaviest queries against DuckDB at sf0.1 once per round (VERDICT r4 next
#8). Excluded from the default run via ``-m "not slow"`` in pytest.ini;
run with ``pytest -m slow``.
"""

from __future__ import annotations

import pytest

from customer_activity_lakehouse_spark.plans import QUERIES

from .oracle_harness import compare, duckdb_conn, exact_float_diffs

SF_SCALE = "/root/testdata/sf0.1"

HEAVY = [
    "doc_decontaminate",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_lsh",
    "events_asof_join",
    "dedup_cluster_assignments",
    # r5 heavies (VERDICT r5 next #3): sf-dependent behavior — threshold
    # firing (curation gates, z-score alerts) and window/chunk populations —
    # is invisible at sf0.01
    "doc_curation_funnel",
    "events_anomaly_zscore",
    "doc_dup_chunks",
    # r6: band populations (two-level Pareto scan) and sliding-window row
    # counts scale with sf
    "revenue_pareto_customers",
    "events_sliding_rates",
    # r6 ML additions: posting-cap firing (hot tokens appear only at sf0.1)
    # and k-means cluster populations are sf-dependent
    "dedup_setsim_capped",
    "embedding_kmeans",
    # r6 analytics: min-support firing and multi-event session populations
    # only materialize at sf0.1
    "part_market_basket",
    "events_session_paths",
    # r6 late additions: SCD interval populations (run lengths per customer)
    # and first-occurrence gram attribution both shift with corpus size
    "priority_drift_revenue",
    "doc_ngram_novelty",
    # exact-moment queries: integer magnitudes GROW with sf — precisely the
    # decimal/hugeint width class that can overflow or precision-cap at
    # scale while sf0.01 stays silent
    "brand_concentration_hhi",
    "lineitem_correlation_matrix",
    # r8: tier populations (which quality bands docs land in) and the
    # chi-square's integer products (o*n, r*c) both grow with sf — the
    # weighted sampler's tick count and the chisq int64 headroom are the
    # scale-dependent parts
    "doc_sample_weighted",
    "segment_priority_chisq",
    # r8 late additions: unigram surprisal quantization boundaries and the
    # Zipf fit's decimal/hugeint moment widths both grow with vocab size;
    # SQ8's per-dim [min,max] (and thus every cell boundary) widens with
    # the corpus — all three are exactly the scale-dependent float class
    "doc_unigram_logprob",
    "doc_zipf_slope",
    "ann_sq_topk",
    # PQ: codebook cells (which centroids survive seeding, where Lloyd
    # moves them) repopulate with corpus size — sf0.01 greenness alone
    # proves little about the trained-codebook float path
    "ann_pq_topk",
    # r8 sketch/text/ANN additions: theta sample populations, MG candidate
    # survival, bigram-model mass, CDC chunk boundaries, and IVF cell
    # routing all shift with corpus size — each is exactly the
    # sf-dependent class the driver's sf0.01 pass cannot see
    "events_theta_overlap",
    "doc_token_heavy_hitters",
    "doc_bigram_logprob",
    "doc_cdc_chunks",
    "ann_ivfpq_topk",
    # PCA: the integer magnitudes of the per-dim sums (and thus the
    # double-exactness headroom the docstring reasons about) grow
    # linearly with corpus size — precisely the sf-dependent class.
    # dedup_containment stays OUT like dedup_setsim_prefix: exact-anchor
    # output is Ω(true pairs) and this template-heavy corpus is the
    # documented degenerate case.
    "embedding_pca_power",
    # r8 DML chain: decimal SUM magnitudes grow with sf (the exact-width
    # class), and the chain's file populations (which files each
    # MERGE/DELETE/UPDATE prunes to, which partitions replaceWhere
    # touches, how many keys each MV maintenance folds) all shift with
    # table size — sf0.01 greenness proves the verbs, not their pruning
    # behavior at scale
    "dml_snapshot_mv_totals",
    "dml_replace_where_mv",
    # r8 stats/selection additions: DSIR's vocab (and with it every
    # smoothed log-ratio) repopulates with corpus size; the ANOVA's
    # integer-cents moment widths are exactly the exact-width class; the
    # decontam report's threshold-crossing population shifts with both
    # corpus and benchmark-slice size
    "doc_dsir_weights",
    "priority_revenue_anova",
    "embedding_decontaminate",
    # min-plus path costs: every edge weight is a quantized log of a flow
    # share that repopulates with fact volume — the whole distance table
    # is sf-dependent
    "nation_trade_paths",
    # rank-sum moments: the distinct-value frame, tie populations, and
    # the HUGEINT/decimal rank-sum widths all grow with order volume
    "priority_ranksum_test",
    # SCD2 chain: which keys each batch touches, the merge's file pruning,
    # and the open-balance decimal widths all shift with dimension size
    "dml_scd2_dimension",
    # KS: the cross-multiplied ECDF gap (cum·n products) grows
    # quadratically with group size — the int64-headroom class
    "priority_ks_test",
    # rule-firing populations (which docs pass which Gopher threshold)
    # and first-digit counts both repopulate with corpus/order volume
    "doc_gopher_rules",
    "orders_benford_audit",
    # r8 graph/text additions: the co-purchase graph's edge/wedge/triangle
    # populations grow superlinearly with order volume (the orientation
    # bound only matters once degrees are high), and winnowing's shared-
    # fingerprint population shifts with corpus size — both are exactly
    # the sf-dependent class
    "part_triangle_count",
    "doc_winnowing_fingerprints",
    # ACF: the n²·Σxy / S² decimal widths grow quadratically with daily
    # revenue magnitude — the exact-width class the docstring bounds
    "revenue_acf",
    # substring dedup: which T-windows repeat (and thus the whole span
    # population) is a pure function of corpus size — template collisions
    # only materialize at sf0.1
    "doc_suffix_dup_spans",
    # CUSUM: the alarm-day population and the HUGEINT prefix-sum widths
    # both grow with daily-revenue magnitude
    "revenue_cusum_drift",
    # row tracking: the id space, the dv-delete population, and the
    # compaction's materialized-file layout all scale with order volume
    "dml_row_tracking_ids",
    # r9 rank statistics: midrank frames, tie populations, and the
    # HUGEINT/decimal moment widths (n·Σr², Σt³) all grow with fact
    # volume — the same exact-width class as ranksum/KS
    "lineitem_spearman_qty_price",
    "lineitem_kendall_qty_discount",
    "priority_revenue_kruskal",
    "revenue_theil_sen_trend",
    "revenue_pettitt_change",
    # r9 index lifecycle: which band buckets collide (and thus the whole
    # candidate-pair population) repopulates with corpus size; the ANN
    # serve must keep matching the retraining oracle as cells refill
    "dedup_incremental_minhash",
    "ann_index_query",
    # MMR: the retrieved pool's membership (and thus every greedy pick)
    # is a pure function of corpus size — diversity picks reshuffle at
    # each sf
    "ann_mmr_rerank",
    # BM25: df/avgdl corpus constants and the ln() 1-ulp exposure both
    # move with corpus size
    "doc_bm25_topk",
    # RRF: fuses two sf-dependent pools — membership of either pool
    # reshuffles the fused ordering
    "hybrid_search_rrf",
    # r10: the bounded SemDeDup (the cell-cap QUALIFY is live in both
    # engines at sf0.1 where cells ~250), its over-cap audit, and the
    # filtered persisted-index serve (widening rule at scale)
    "dedup_semantic_cells",
    "semantic_cell_audit",
    "ann_index_query_where",
]


@pytest.fixture(scope="module")
def scale_con():
    con = duckdb_conn(SF_SCALE)
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_query_matches_oracle_at_sf01(spark, scale_con, name):
    q = QUERIES[name]
    assert q.oracle is not None, f"{name} lost its oracle"
    spark_df = q.fn(spark, SF_SCALE).toPandas()
    oracle_df = scale_con.execute(q.oracle).fetchdf()
    assert len(spark_df) > 0, f"{name} returned no rows at sf0.1 — fixture or cap problem"
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name} diverges at sf0.1: {problems}"
    # The driver hashes values: floats must be bit-identical, not just close.
    assert exact_float_diffs(spark_df, oracle_df) == 0, f"{name}: non-exact floats at sf0.1"
