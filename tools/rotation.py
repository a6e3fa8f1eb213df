"""Generate the round's showcase window + the ROTATION.md worklist.

Reads CORRECTNESS_r*.json ∪ the live registry, computes the
never-driver-checked queries, and emits:

1. stdout — the Python tuple body to paste into
   `registry._SHOWCASE` (the guard tests verify the paste): the
   ANCHORS/REPRESENT/PRIORITY tiers first (each may be EMPTY — r11
   empties all three because the never-checked backlog is exactly
   one window), then a family-span pick per REQUIRED module still
   carrying backlog, then a largest-backlog-first fill preferring
   full-oracle queries (tests/test_registry_order.py carries the
   family-span invariant);
2. ROTATION.md — the machine-generated worklist (registry size,
   driver-checked count, the full never-checked list).  A guard test
   (tests/test_coverage_guard.py) recomputes the same numbers from
   CORRECTNESS history and fails when the committed file drifts —
   the hand-maintained comment block this replaces drifted twice.

Run: python tools/rotation.py [--write]   (--write rewrites ROTATION.md)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ondemand_dask_spark.registry import all_queries  # noqa: E402

# r11: the never-checked backlog is EXACTLY 50 = one full window
# (r10 retired 45; 393/443 driver-certified).  Every repeat slot —
# anchor, rows-only re-present, or priority — would leave one query
# permanently uncertified, so all three curated tiers are empty this
# round and the window IS the backlog (r10 verdict item 1: "Done =
# 50 green rows in CORRECTNESS_r11.json, backlog 0").  entry() still
# smoke-runs tpch_q1 every round; every rows-only query already sits
# adjacent to its oracle twin in the r10 record.
ANCHORS: tuple[str, ...] = ()

# Rows-only re-presents: none needed after r10 — each of the three
# rows-only-by-design queries has a driver row ADJACENT to its
# oracle-checked twin (stat_freq_items/stat_freq_items_verified and
# dedup_minhash_ml/dedup_minhash_lsh in r10; udf_ewm/
# window_ewm_bounded in r8), which was the r9 verdict's ask.
REPRESENT: tuple[str, ...] = ()

# Never-checked queries the verdict explicitly called out — taken
# first, before the backlog fill.  Refresh each round from
# VERDICT.md's "next round" item.  r11: the verdict names the whole
# remaining 50-query tail, so no individual priorities; the backlog
# fill takes everything.
PRIORITY: tuple[str, ...] = ()

# every module the family-span invariant requires in the window —
# honored only while the module still has never-checked queries
# (a module whose entire registered surface is already driver-green,
# e.g. skew after r7, would otherwise burn a coverage slot on a
# repeat; tests/test_registry_order.py carries the same carve-out)
REQUIRED_MODULES = {
    "tpch", "sources", "relational", "joins", "aggregations",
    "windows", "sets", "scalars", "composed", "udfs", "dedup",
    "similarity", "text", "pipeline", "multimodal", "jobs",
    "incremental", "encoding", "skew",
}

WINDOW = 50


def correctness_files(repo: str) -> list[str]:
    """Every CORRECTNESS_r*.json on disk, sorted by round."""
    return sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))


def checked_names(repo: str, files: list[str] | None = None) -> set[str]:
    """Query names with ≥1 driver CORRECTNESS row across `files`
    (default: every census file on disk)."""
    checked: set[str] = set()
    for f in correctness_files(repo) if files is None else files:
        with open(f) as fh:
            checked.update(json.load(fh).keys())
    return checked


def build_window() -> tuple[list[str], set[str], dict[str, str]]:
    """Return (window, driver-checked names, query→module map)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = checked_names(repo)
    qs = all_queries()
    mod = {n: q.fn.__module__.rsplit(".", 1)[-1] for n, q in qs.items()}
    never = [n for n in qs if n not in checked and n not in ANCHORS]

    picks: list[str] = []
    chosen_mods = {mod[a] for a in ANCHORS}

    def take(name: str) -> None:
        if name not in picks and len(picks) < WINDOW - len(ANCHORS):
            picks.append(name)
            chosen_mods.add(mod[name])

    # 1. rows-only re-presents (unconditional), then verdict-named
    #    priorities (only those still unchecked).
    for n in REPRESENT:
        if n in qs:
            take(n)
    for n in PRIORITY:
        if n in qs and n not in checked:
            take(n)

    # 2. cover required modules missing from the window so far,
    #    preferring never-checked oracle-carrying queries.  A module
    #    with NO never-checked queries left is skipped — re-greening
    #    an already-driver-checked query would cost a coverage slot.
    for m in sorted(REQUIRED_MODULES - chosen_mods):
        cands = [n for n in never if mod[n] == m and qs[n].oracle]
        cands = cands or [n for n in never if mod[n] == m]
        if cands:
            take(cands[0])

    # 3. fill remaining slots from the never-checked pool, always
    #    drawing from the module with the LARGEST remaining backlog
    #    (oracle-carrying first within each module) — the r7 verdict
    #    names the big modules (stats/aggregations, windows, scalars)
    #    as the coverage debt; round-robin gave them 1-2 slots each.
    by_mod: dict[str, list[str]] = {}
    for n in never:
        if n not in picks:
            by_mod.setdefault(mod[n], []).append(n)
    for m in by_mod:
        by_mod[m].sort(key=lambda n: (qs[n].oracle is None, n))
    while len(picks) < WINDOW - len(ANCHORS) and any(by_mod.values()):
        m = max(by_mod, key=lambda k: (len(by_mod[k]), k))
        take(by_mod[m].pop(0))

    window = list(ANCHORS) + picks
    assert len(window) == WINDOW, len(window)
    return window, checked, mod


def rotation_md(repo: str | None = None, files: list[str] | None = None) -> str:
    """The machine-generated worklist (guard-tested against drift).

    `files` pins the census inputs explicitly; the guard test passes
    the rounds named in the committed header so a fresh driver census
    dropped in AFTER the last regeneration (the driver writes
    CORRECTNESS_r{N}.json post-commit, every round) cannot make the
    committed file unreproducible at judge time.
    """
    if repo is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if files is None:
        files = correctness_files(repo)
    checked = checked_names(repo, files)
    qs = all_queries()
    mod = {n: q.fn.__module__.rsplit(".", 1)[-1] for n, q in qs.items()}
    never = sorted(n for n in qs if n not in checked)
    rounds = sorted(os.path.basename(f) for f in files)
    by_mod: dict[str, list[str]] = {}
    for n in never:
        by_mod.setdefault(mod[n], []).append(n)
    lines = [
        "# ROTATION — driver-coverage worklist",
        "",
        "Generated by `tools/rotation.py --write` from "
        f"{' ∪ '.join(rounds)} ∪ the registry; do not edit by hand "
        "(tests/test_coverage_guard.py recomputes and diffs).",
        "",
        f"- registered queries: **{len(qs)}**",
        f"- driver-checked (≥1 CORRECTNESS row, any round): "
        f"**{len(checked & set(qs))}**",
        f"- never driver-checked: **{len(never)}**",
        "",
        "## Never-checked, by module",
        "",
    ]
    for m in sorted(by_mod):
        lines.append(f"- **{m}** ({len(by_mod[m])}): "
                     + ", ".join(f"`{n}`" for n in by_mod[m]))
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    window, checked, _mod = build_window()
    print("_SHOWCASE: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    new = [n for n in window if n not in checked]
    print(f"# new-to-driver in this window: {len(new)}", file=sys.stderr)
    if "--write" in sys.argv:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = os.path.join(repo, "ROTATION.md")
        with open(out, "w") as f:
            f.write(rotation_md())
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
