"""Unit contract for plans/coverage.py — the data-driven catalog rotation.

The rotation decides which queries the driver's ~50-entry correctness
window re-checks each round, so its parsing/tiering rules get direct unit
coverage on synthetic CORRECTNESS files (the integration behavior is pinned
by test_registry.py against the real repo data).
"""

from __future__ import annotations

import json

from customer_activity_lakehouse_spark.plans.coverage import (
    _row_green,
    catalog_order,
    compute_coverage,
)
from customer_activity_lakehouse_spark.plans.registry import Query


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(payload if isinstance(payload, str) else json.dumps(payload))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}


def test_row_green_rules():
    assert _row_green(GREEN)
    # rows-only check (no oracle): hash_match is None, still green
    assert _row_green({**GREEN, "hash_match": None})
    assert not _row_green({**GREEN, "hash_match": False})
    assert not _row_green({**GREEN, "rows_match": False})
    assert not _row_green({**GREEN, "err": "boom"})
    assert not _row_green({})


def test_compute_coverage_latest_round_wins_and_red_rows_ignored(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"a": GREEN, "b": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", {"a": GREEN, "b": {**GREEN, "hash_match": False}})
    cov = compute_coverage(tmp_path)
    assert cov == {"a": 2, "b": 1}  # b's red r2 row does not erase its r1 green


def test_compute_coverage_skips_malformed_files(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"a": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", "{not json")
    _write(tmp_path, "CORRECTNESS_r03.json", ["not", "a", "dict"])
    _write(tmp_path, "CORRECTNESS_rXX.json", {"z": GREEN})  # name doesn't parse
    assert compute_coverage(tmp_path) == {"a": 1}


def test_compute_coverage_double_digit_rounds(tmp_path):
    _write(tmp_path, "CORRECTNESS_r09.json", {"a": GREEN})
    _write(tmp_path, "CORRECTNESS_r10.json", {"a": GREEN})
    assert compute_coverage(tmp_path) == {"a": 10}


def _q(tags=()):
    return Query(fn=lambda spark, sf: None, oracle=None, tags=tuple(tags))


def test_catalog_order_tiers_and_family_representatives():
    merged = {
        "old_plain": _q(["x"]),
        "old_newtag": _q(["y"]),  # introduces y -> pulled ahead in its tier
        "fresh": _q(["x"]),
        "never": _q(["x"]),
    }
    cov = {"old_plain": 1, "old_newtag": 1, "fresh": 3}
    order = catalog_order(merged, cov)
    assert order[0] == "never"  # never-checked first
    assert order[-1] == "fresh"  # most recently green last
    tier1 = order[1:3]
    assert set(tier1) == {"old_plain", "old_newtag"}
    # representative with the unseen tag leads its tier... after 'never'
    # already claimed tag x, only old_newtag adds a new tag
    assert tier1[0] == "old_newtag"


def test_catalog_order_is_total_and_deterministic():
    merged = {f"q{i}": _q([f"t{i % 3}"]) for i in range(10)}
    cov = {f"q{i}": (i % 4) + 1 for i in range(10)}
    a = catalog_order(merged, cov)
    b = catalog_order(dict(reversed(list(merged.items()))), cov)
    assert sorted(a) == sorted(merged)
    assert a == b  # insertion order of `merged` must not matter
