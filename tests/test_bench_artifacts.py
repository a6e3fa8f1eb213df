"""Committed bench artifacts must bench the SHIPPING headline set
(r12 verdict What's-wrong #1 / Next-round #1).

The failure this pins against: r12 swapped HEADLINE's edit-distance
entry (exhaustive → lsh) after `bench_full_sf1.json` had been
generated, and nothing failed — the committed sf1 record kept the
superseded quadratic form (115.7 s of its 360 s total) and overstated
the final tree by ~112 s.  A bench artifact whose `queries` keys
drift from `bench.HEADLINE` is stale by definition; regenerate it on
HEAD instead of relaxing this test.
"""

from __future__ import annotations

import glob
import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_bench_artifacts_match_headline():
    arts = sorted(glob.glob(os.path.join(REPO, "bench_full*.json")))
    assert arts, "no committed bench artifact found"
    for path in arts:
        with open(path) as fh:
            d = json.load(fh)
        assert set(d["queries"]) == set(bench.HEADLINE), (
            f"{os.path.basename(path)} benches a different query set "
            f"than bench.HEADLINE — stale artifact; regenerate on HEAD "
            f"(missing: {sorted(set(bench.HEADLINE) - set(d['queries']))}, "
            f"extra: {sorted(set(d['queries']) - set(bench.HEADLINE))})"
        )
        assert set(d["isolated"]["queries"]) == set(bench.ISOLATED), (
            f"{os.path.basename(path)}'s isolated section drifted "
            f"from bench.ISOLATED"
        )
