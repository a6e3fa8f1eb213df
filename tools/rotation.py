"""Propose the next round's showcase window.

Reads CORRECTNESS_r*.json ∪ the live registry, computes the
never-driver-checked queries, and prints a 50-entry window: the 8
anchors + 42 never-checked picks chosen to (a) honor the
every-family invariant (tests/test_registry_order.py), (b) prefer
full-oracle queries, (c) spread across modules round-robin so no one
family floods the window.  Output is the Python tuple body to paste
into registry._SHOWCASE (the guard tests verify the paste).

Run: python tools/rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ondemand_dask_spark.registry import all_queries  # noqa: E402

ANCHORS = (
    "tpch_q1", "tpch_q3",
    "join_inner", "agg_groupby_basic", "agg_groupby_quantile",
    "window_cumsum", "dedup_minhash_lsh", "pipeline_end_to_end",
)

# every module the family-span invariant requires in the window
REQUIRED_MODULES = {
    "tpch", "sources", "relational", "joins", "aggregations",
    "windows", "sets", "scalars", "composed", "udfs", "dedup",
    "similarity", "text", "pipeline", "multimodal", "jobs",
    "incremental", "encoding", "skew",
}

WINDOW = 50


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            checked.update(json.load(fh).keys())

    qs = all_queries()
    mod = {n: q.fn.__module__.rsplit(".", 1)[-1] for n, q in qs.items()}
    never = [n for n in qs if n not in checked and n not in ANCHORS]
    print(f"# registry={len(qs)} driver-checked={len(checked)} "
          f"never-checked={len(never)}", file=sys.stderr)

    picks: list[str] = []
    chosen_mods = {mod[a] for a in ANCHORS}

    def take(name: str) -> None:
        if name not in picks and len(picks) < WINDOW - len(ANCHORS):
            picks.append(name)
            chosen_mods.add(mod[name])

    # 1. cover required modules missing from the anchor set, preferring
    #    never-checked oracle-carrying queries; fall back to any
    #    registered query from the module (re-green) if none remain.
    for m in sorted(REQUIRED_MODULES - chosen_mods):
        cands = [n for n in never if mod[n] == m and qs[n].oracle]
        cands = cands or [n for n in never if mod[n] == m]
        cands = cands or [n for n in qs if mod[n] == m and n not in ANCHORS]
        if cands:
            take(cands[0])

    # 2. fill remaining slots round-robin across modules from the
    #    never-checked pool (oracle-carrying first within each module).
    by_mod: dict[str, list[str]] = {}
    for n in never:
        if n not in picks:
            by_mod.setdefault(mod[n], []).append(n)
    for m in by_mod:
        by_mod[m].sort(key=lambda n: (qs[n].oracle is None, n))
    order = sorted(by_mod)
    i = 0
    while len(picks) < WINDOW - len(ANCHORS) and any(by_mod.values()):
        m = order[i % len(order)]
        if by_mod[m]:
            take(by_mod[m].pop(0))
        i += 1

    window = list(ANCHORS) + picks
    assert len(window) == WINDOW, len(window)
    print("_SHOWCASE: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    new = [n for n in window if n not in checked]
    print(f"# new-to-driver in this window: {len(new)}", file=sys.stderr)


if __name__ == "__main__":
    main()
