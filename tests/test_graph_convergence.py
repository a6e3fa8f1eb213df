"""graph_kcore peels to a genuine fixpoint at every fixture SF.

The oracle unrolls a FIXED number of CTE peel rounds; the Spark side
loops on a scalar edge-count fixpoint with that same number as a
safety cap.  The differential check is only guaranteed to compare the
true k-core if the peel actually converges within the cap — this test
proves it does, at all three SFs, by running the real registered query
and asserting the module's convergence telemetry.
"""

from __future__ import annotations

import os

import pytest

import ondemand_dask_spark.queries.graph as graph_mod

_ALL_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf", _ALL_SF_DIRS)
def test_kcore_converges_within_oracle_rounds(spark, sf):
    result = graph_mod.graph_kcore(spark, sf)
    n = result.count()  # materialise: the loop runs during the call,
    # but counting also proves the returned plan is executable
    assert n >= 0
    assert graph_mod.LAST_KCORE_CONVERGED, (
        f"k-core peel did not reach its edge-count fixpoint within "
        f"{graph_mod._KCORE_ROUNDS} rounds at {sf} — the unrolled "
        f"oracle would compare a non-core"
    )
    assert 1 <= graph_mod.LAST_KCORE_ROUNDS <= graph_mod._KCORE_ROUNDS
