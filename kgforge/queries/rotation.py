"""Driver-snapshot rotation (see module docstrings below, moved verbatim
from queries.py in round 5)."""

from __future__ import annotations

from kgforge.queries.core import REGISTRY

# ---------------------------------------------------------------------------
# Driver-snapshot rotation (VERDICT r2 #2; made DETERMINISTIC per VERDICT r3 #1)
# ---------------------------------------------------------------------------
# The correctness driver snapshots only a PREFIX of this registry (~50
# entries; r2/r3 covered exactly the first 50 definitions), so with 70+
# registered queries some get no CORRECTNESS row each round. Rounds 2-3
# used hand-maintained _FRONT/_BACK lists; that left 24 queries riding on
# rows two rounds old. Ordering is now DERIVED from the driver's own
# CORRECTNESS_r*.json artifacts committed at the repo root:
#
#   1. the north-rule pipeline checks (q90-q93) are pinned first — they
#      must never rotate outside the cap;
#   2. then every query ordered by the LAST ROUND in which it has a driver
#      row, ascending (never-verified first), tie-broken by definition
#      order (stable and auditable).
#
# A query verified in round N therefore automatically yields its slot to
# the round-N absentees in round N+1: no query's latest driver row can go
# stale by more than ceil(n_registered / cap) - 1 ≈ 1 round. Same files ->
# same order (the artifacts are committed, so this is reproducible), and
# with no artifacts present (fresh clone without driver output) the order
# degrades to pinned + definition order. Every (fn, sql) pair is
# unchanged — this is presentation order only.

_PINNED = [
    "q90_kg_triples",
    "q91_mention_extraction",
    "q92_vendor_scorecards",
    "q93_doc_neardup_dedup",
]
# fail fast on renames: a typo here would silently unpin (ADVICE r3).
# Explicit raise, not assert — `python -O` strips asserts, and a stripped
# guard is the exact silent-unpin failure it exists to catch (ADVICE r4).
if set(_PINNED) - set(REGISTRY):
    raise ValueError(
        f"_PINNED names not in REGISTRY: {sorted(set(_PINNED) - set(REGISTRY))}"
    )


def _row_verified(row) -> bool:
    """True iff a CORRECTNESS row is a PASS (oracle green, or the weaker
    rows-only check for entries without oracle SQL). A failed row must NOT
    count as 'seen' — otherwise the rotation would push a just-fixed query
    to the back and the fix would go unverified for two more rounds
    (code-review r4)."""
    if not isinstance(row, dict):
        return False
    if row.get("err") not in (None, "no_oracle"):
        return False
    return row.get("hash_match") is not False and row.get("rows_match") is not False


def _last_driver_round() -> dict[str, int]:
    """query name -> latest round number with a PASSING CORRECTNESS row."""
    import glob
    import json
    import os
    import re

    # repo root: this file lives at kgforge/queries/rotation.py (three
    # levels down since the round-5 package split — a two-dirname root
    # silently found no artifacts and degraded to definition order)
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name, row in rows.items():
                if _row_verified(row):
                    seen[name] = max(seen.get(name, 0), rnd)
    return seen


def apply_rotation(seen: dict[str, int] | None = None) -> None:
    """Reorder REGISTRY in place: pinned first, then by last-verified
    driver round ascending (never-verified first), tie-broken by
    definition order.

    Explicit function (ADVICE r4) so the ordering is unit-testable with an
    injected `seen` map and re-runnable after artifacts change, rather
    than an anonymous import-time block. It still runs once at import —
    the driver contract (`__spark_entry__.queries()`) needs the rotated
    order present at import with no extra call site — but the inputs are
    the COMMITTED CORRECTNESS_r*.json artifacts (the driver commits each
    round's artifact with the round), so same tree -> same order, and a
    fresh clone without artifacts degrades to pinned + definition order.
    """
    if seen is None:
        seen = _last_driver_round()
    defn = {name: i for i, name in enumerate(REGISTRY)}
    rotated = _PINNED + sorted(
        (k for k in REGISTRY if k not in _PINNED),
        key=lambda k: (seen.get(k, -1), defn[k]),
    )
    ordered = {k: REGISTRY[k] for k in rotated}
    REGISTRY.clear()
    REGISTRY.update(ordered)


apply_rotation()
