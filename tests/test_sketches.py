"""Accuracy + determinism gates for the sketch-family catalog entries.

These queries deliberately carry no DuckDB oracle (HLL++/Greenwald-Khanna
estimates are engine-specific), so the correctness contract lives here:
the estimate must sit inside its configured error bound of the exact value
computed in the SAME result row, and repeated runs must be bit-identical
(Spark's sketches are deterministic for a given dataset)."""

from __future__ import annotations

from customer_activity_lakehouse_spark.plans import QUERIES


def test_hll_distinct_users_within_bound_and_deterministic(spark, sf_correctness):
    q = QUERIES["events_distinct_users_sketch"]
    rows = {r.event_type: r for r in q.fn(spark, sf_correctness).collect()}
    assert rows
    for et, r in rows.items():
        assert r.n_users_exact > 0
        rel = abs(r.n_users_approx - r.n_users_exact) / r.n_users_exact
        # rsd=0.02 → 5% is > 2 sigma; a violation means the sketch broke
        assert rel <= 0.05, f"{et}: approx {r.n_users_approx} vs exact {r.n_users_exact}"
    again = {r.event_type: r.n_users_approx for r in q.fn(spark, sf_correctness).collect()}
    assert again == {et: r.n_users_approx for et, r in rows.items()}


def test_gk_quantiles_within_rank_neighborhood(spark, sf_correctness):
    q = QUERIES["order_value_sketch_quantiles"]
    (row,) = q.fn(spark, sf_correctness).collect()
    # GK with accuracy 10k guarantees rank error <= n/10k; on monetary data
    # that maps to a tight relative band around the exact quantile
    for p in ("p50", "p90", "p99"):
        exact, approx = getattr(row, f"{p}_exact"), getattr(row, f"{p}_approx")
        assert exact > 0
        assert abs(approx - exact) / exact <= 0.02, (p, exact, approx)
    (again,) = q.fn(spark, sf_correctness).collect()
    assert again == row


def test_theta_overlap_tracks_exact_audience(spark, sf_correctness):
    """The fixed-threshold theta estimates must sit near the EXACT overlap
    query's answers (θ=1/4 → relative σ ≈ sqrt((1-θ)/(n·θ)); 50% is a
    multi-sigma band at this scale), and the inclusion-exclusion identity
    must hold exactly — the estimates are integer arithmetic on one
    deterministic sample, not independent randomness per column."""
    est = {
        (r.type_a, r.type_b): r
        for r in QUERIES["events_theta_overlap"].fn(spark, sf_correctness).collect()
    }
    exact = {
        (r.type_a, r.type_b): r
        for r in QUERIES["events_audience_overlap"].fn(spark, sf_correctness).collect()
    }
    assert est
    for key, r in est.items():
        assert r.est_union == r.est_a + r.est_b - r.est_both  # identity, exact
        ex = exact[key]
        assert abs(r.est_a - ex.n_a) / ex.n_a <= 0.5, (key, r.est_a, ex.n_a)
        assert abs(r.est_b - ex.n_b) / ex.n_b <= 0.5, (key, r.est_b, ex.n_b)


def test_misra_gries_retention_guarantee_under_decrements(spark):
    """Synthetic Zipf stream across 4 partitions with capacity FORCED far
    below the key cardinality, so the batched decrement path actually
    runs: the merged candidate union must retain every key with global
    count > N/capacity, and the two-pass final top-k must equal the exact
    top-k — the guarantee q_doc_token_heavy_hitters rides at web scale."""
    import pandas as pd
    from pyspark.sql import functions as F

    from customer_activity_lakehouse_spark.plans import ml_ops

    # Zipf-ish: key k (1..200) appears floor(2000/k) times → N ≈ 11,772
    rows = [(f"k{k:03d}",) for k in range(1, 201) for _ in range(2000 // k)]
    tok = spark.createDataFrame(rows, "token string").repartition(4)
    cap = 16

    def _mg(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["token"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
            if len(counts) > cap:
                cut = sorted(counts.values(), reverse=True)[cap]
                counts = {k: v - cut for k, v in counts.items() if v > cut}
        yield pd.DataFrame({"token": list(counts)})

    candidates = {r.token for r in tok.mapInPandas(_mg, "token string").distinct().collect()}
    # decrements really happened: far fewer survivors than 200 distinct keys
    assert len(candidates) < 200
    exact = {
        r.token: r.n
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    must_keep = {t for t, n in exact.items() if n > n_total / cap}
    assert must_keep, "test data must contain guaranteed-heavy keys"
    assert must_keep <= candidates, must_keep - candidates
    # two-pass exactness: top-10 by recount over candidates == global top-10
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_cand = sorted(
        ((t, n) for t, n in exact.items() if t in candidates),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert top_cand == top_exact
    # and the shipped entry's output is stable across runs (determinism)
    q = ml_ops.QUERIES["doc_token_heavy_hitters"]
    sf = "/root/testdata/sf0.001"
    assert q.fn(spark, sf).collect() == q.fn(spark, sf).collect()
