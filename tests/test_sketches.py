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
