"""Staleness-driven catalog ordering for the driver's correctness window.

The per-round driver checks only the first ~50 entries of ``queries()``
(dict insertion order), so WHICH entries lead the catalog decides which get
a fresh oracle-checked green row this round.  Rounds 1-4 maintained that
order as a hand-frozen priority list; this module derives it from data
instead:

1. ``load_coverage()`` maps each query name to the latest round in which the
   driver recorded a fully-green row (rows+schema+hash, no err).  It prefers
   recomputing from the ``CORRECTNESS_r*.json`` files at the repo root — so
   the rotation advances AUTOMATICALLY when a new round's results land,
   with no human edit — and falls back to the committed ``coverage.json``
   snapshot when the package is used away from the repo checkout.
2. ``catalog_order()`` sorts never-checked entries first, then ascending
   last-green round (stalest first).  Within a tier, entries introducing an
   operator-family tag not yet represented earlier in the order are pulled
   forward, so a truncated driver pass still covers every family.

The policy gate lives in tests/test_registry.py: no entry may go more than
two rounds without a driver check.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from .registry import Query

_PKG_DIR = Path(__file__).resolve().parent
_SNAPSHOT = _PKG_DIR / "coverage.json"
_REPO_ROOT = _PKG_DIR.parents[1]
_CORRECTNESS_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def _row_green(row: dict) -> bool:
    """Fully green: rows+schema match, hash matches when checked (None =
    rows-only check for non-SQL-expressible ops), and no error."""
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and row.get("hash_match") is not False
        and not row.get("err")
    )


def compute_coverage(repo_root: Path) -> dict[str, int]:
    """query name -> latest round with a green driver row, from the
    CORRECTNESS_r{N}.json files the driver commits at the repo root."""
    coverage: dict[str, int] = {}
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        match = _CORRECTNESS_RE.search(path.name)
        if not match:
            continue
        round_no = int(match.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_green(row):
                coverage[name] = max(coverage.get(name, 0), round_no)
    return coverage


def load_coverage() -> dict[str, int]:
    coverage = compute_coverage(_REPO_ROOT)
    if coverage:
        return coverage
    try:
        snapshot = json.loads(_SNAPSHOT.read_text())
    except (OSError, json.JSONDecodeError):
        return {}
    return {k: int(v) for k, v in snapshot.items()}


# The coarse operator families every driver-correctness window must keep a
# representative of (tests/test_registry.py enforces it on the first 50
# entries).  Part of the ordering POLICY, not test decoration: when a tier
# is wider than the window, carriers of a required-but-unrepresented family
# outrank entries that merely introduce a niche tag.
REQUIRED_FAMILIES: frozenset[str] = frozenset(
    {
        "tpch", "agg", "window", "join", "scalar", "events", "text",
        "dedup", "lsh", "similarity", "audit", "recall", "sampling",
        "asof-join", "range-join", "gapfill", "rollup", "graph",
        "skew", "pivot", "cube", "quantile", "setops",
    }
)


def catalog_order(merged: dict[str, Query], coverage: dict[str, int]) -> list[str]:
    """Never-checked first, then stalest last-green round; within each tier,
    family representatives (entries adding an unseen tag) lead, with
    carriers of a REQUIRED family not yet represented earlier in the order
    ranked before niche-tag representatives, and ties broken by the rarity
    of the tags introduced (a tag's only carrier must not be crowded past
    the driver window).  Fully deterministic for a given (merged, coverage)."""
    tag_freq: dict[str, int] = {}
    for q in merged.values():
        for t in set(q.tags):
            tag_freq[t] = tag_freq.get(t, 0) + 1

    tiers: dict[int, list[str]] = {}
    for name in merged:
        tiers.setdefault(coverage.get(name, 0), []).append(name)

    seen_tags: set[str] = set()
    order: list[str] = []
    for round_no in sorted(tiers):
        tier = sorted(tiers[round_no])
        representatives: list[str] = []
        sort_key: dict[str, tuple] = {}
        for name in tier:
            new = set(merged[name].tags) - seen_tags
            if new:
                representatives.append(name)
                covers_required = bool(new & REQUIRED_FAMILIES)
                sort_key[name] = (
                    0 if covers_required else 1,
                    min(tag_freq[t] for t in new),
                    name,
                )
                seen_tags.update(merged[name].tags)
        representatives.sort(key=lambda n: sort_key[n])
        chosen = set(representatives)
        order.extend(representatives + [n for n in tier if n not in chosen])
    return order


def write_snapshot() -> dict[str, int]:
    """Refresh the committed coverage.json from the repo's correctness files
    (run via ``python -m customer_activity_lakehouse_spark.plans.coverage``)."""
    coverage = compute_coverage(_REPO_ROOT)
    if not coverage:
        raise SystemExit(f"no CORRECTNESS_r*.json found under {_REPO_ROOT}")
    ordered = dict(sorted(coverage.items(), key=lambda kv: (kv[1], kv[0])))
    _SNAPSHOT.write_text(json.dumps(ordered, indent=1) + "\n")
    return ordered


if __name__ == "__main__":
    snap = write_snapshot()
    print(f"wrote {_SNAPSHOT} ({len(snap)} entries, max round {max(snap.values())})")
