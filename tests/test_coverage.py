"""Unit contract for plans/coverage.py — the data-driven catalog rotation.

The rotation decides which queries the driver's ~50-entry correctness
window re-checks each round, so its parsing/tiering rules get direct unit
coverage on synthetic CORRECTNESS files (the integration behavior is pinned
by test_registry.py against the real repo data).
"""

from __future__ import annotations

import json

from customer_activity_lakehouse_spark.plans import coverage as coverage_mod
from customer_activity_lakehouse_spark.plans.coverage import (
    _row_green,
    catalog_order,
    compute_coverage,
    effective_coverage,
    source_fingerprint,
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
    # no_oracle rows (registry oracle=None by design): a successful
    # rows-only Spark run IS the check — r9 rotation fix
    assert _row_green(
        {"rows_match": None, "schema_match": None, "hash_match": None,
         "spark_rows": 4, "oracle_rows": None, "err": "no_oracle"}
    )
    assert not _row_green({"err": "no_oracle"})  # Spark side never ran
    assert not _row_green({"err": "no_oracle", "spark_rows": None})


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


# ---- change-aware rotation (r6) -------------------------------------------

def _fn_a(spark, sf_dir):
    return 1


def _fn_a_helper_user(spark, sf_dir):
    return _helper()


def _helper():
    return _THRESHOLD


_THRESHOLD = 42


def _fn_b(spark, sf_dir):
    return 2


def test_source_fingerprint_deterministic_and_distinct():
    qa = Query(fn=_fn_a, oracle="SELECT 1", tags=("x",))
    qb = Query(fn=_fn_b, oracle="SELECT 1", tags=("x",))
    assert source_fingerprint(qa) == source_fingerprint(qa)
    assert source_fingerprint(qa) != source_fingerprint(qb)
    # oracle SQL is part of the semantics
    assert source_fingerprint(qa) != source_fingerprint(
        Query(fn=_fn_a, oracle="SELECT 2", tags=("x",))
    )
    # tags/bench are NOT part of the semantics (pure metadata)
    assert source_fingerprint(qa) == source_fingerprint(
        Query(fn=_fn_a, oracle="SELECT 1", tags=("y",), bench=True)
    )


def test_source_fingerprint_covers_transitive_helpers_and_constants():
    """_fn_a_helper_user -> _helper -> _THRESHOLD must all be hashed, so a
    helper or threshold edit trips the fingerprint even though the query
    fn's own source is unchanged (the r5 doc_decontaminate failure mode)."""
    q = Query(fn=_fn_a_helper_user, oracle=None)
    fp = source_fingerprint(q)
    orig = coverage_mod.__dict__  # not used; keep namespace access explicit
    import tests.test_coverage as me
    old = me._THRESHOLD
    try:
        me._THRESHOLD = 43
        assert source_fingerprint(q) != fp, "constant edit must change fingerprint"
    finally:
        me._THRESHOLD = old
    assert source_fingerprint(q) == fp


def test_rewritten_entry_leads_the_catalog():
    """The r6 policy: an entry whose recorded at-green-time fingerprint no
    longer matches its current source is tier 0 and must precede everything,
    even entries green in the same (latest) round."""
    merged = {
        "rewritten": Query(fn=_fn_a, oracle="SELECT 1", tags=("x",)),
        "unchanged": Query(fn=_fn_b, oracle="SELECT 1", tags=("x",)),
    }
    cov = {"rewritten": 5, "unchanged": 5}
    fps = {
        "rewritten": "0000000000000000",  # stale recording != current source
        "unchanged": source_fingerprint(merged["unchanged"]),
    }
    eff = effective_coverage(merged, cov, fps)
    assert "rewritten" not in eff and eff["unchanged"] == 5
    order = catalog_order(merged, eff)
    assert order[0] == "rewritten"


def test_effective_coverage_without_fingerprints_is_identity():
    merged = {"a": Query(fn=_fn_a, oracle=None)}
    cov = {"a": 3, "gone_query": 2}
    assert effective_coverage(merged, cov, None) == cov
    assert effective_coverage(merged, cov, {}) == cov
    # entries with no recorded fp (or deleted from the catalog) keep their round
    assert effective_coverage(merged, cov, {"other": "abc"}) == cov


def test_snapshot_v2_roundtrip(tmp_path, monkeypatch):
    import json as _json

    snap = tmp_path / "coverage.json"
    snap.write_text(_json.dumps({
        "version": 2,
        "entries": {"a": {"round": 4, "fp": "deadbeefdeadbeef"}, "b": {"round": 5}},
    }))
    monkeypatch.setattr(coverage_mod, "_SNAPSHOT", snap)
    rounds, fps = coverage_mod._read_snapshot()
    assert rounds == {"a": 4, "b": 5}
    assert fps == {"a": "deadbeefdeadbeef"}


def test_snapshot_v1_backcompat(tmp_path, monkeypatch):
    import json as _json

    snap = tmp_path / "coverage.json"
    snap.write_text(_json.dumps({"a": 3, "b": 4}))
    monkeypatch.setattr(coverage_mod, "_SNAPSHOT", snap)
    rounds, fps = coverage_mod._read_snapshot()
    assert rounds == {"a": 3, "b": 4}
    assert fps == {}


def test_window_family_promotion_displaces_only_fresh_entries(monkeypatch):
    """When the fresh tier's required-family representatives overflow the
    window slots, the crowded-out family's carrier is promoted by
    displacing a FRESH window entry whose required tags stay covered by
    another window entry — never a stale-due entry, never a sole carrier.
    When no such victim exists, nothing is displaced (the family gate's
    fresh-carriers exemption applies instead, test_registry.py)."""
    monkeypatch.setattr(coverage_mod, "DRIVER_WINDOW", 4)
    monkeypatch.setattr(
        coverage_mod,
        "REQUIRED_FAMILIES",
        frozenset({"agg", "lsh", "similarity", "skew"}),
    )
    merged = {
        "stale_a": _q(["agg"]),
        "stale_b": _q(["agg"]),
        "r1": _q(["lsh"]),  # rep; its lsh is ALSO carried by r2 -> victim
        "r2": _q(["lsh", "similarity"]),  # rep; sole similarity carrier
        "z1": _q(["skew"]),  # rep, but rarity-ranked past the window edge
        "z2": _q(["skew"]),
    }
    cov = {"r1": 5, "r2": 5, "z1": 5, "z2": 5}
    order = coverage_mod.catalog_order(merged, cov)
    window = order[: coverage_mod.DRIVER_WINDOW]
    # without promotion the window would be [stale_a, stale_b, r2, r1]
    assert "z1" in window, order
    assert "r2" in window, order  # sole similarity carrier kept
    assert order.index("r1") == coverage_mod.DRIVER_WINDOW  # victim just outside
    assert set(order[:2]) == {"stale_a", "stale_b"}  # stale still leads
    rounds = [cov.get(n, 0) for n in order]
    assert rounds == sorted(rounds)  # staleness monotonicity preserved

    # every in-window fresh entry is a sole required-carrier -> no victim,
    # no displacement of stale entries, family left just outside
    monkeypatch.setattr(coverage_mod, "DRIVER_WINDOW", 2)
    order2 = coverage_mod.catalog_order(merged, cov)
    assert set(order2[:2]) == {"stale_a", "stale_b"}
