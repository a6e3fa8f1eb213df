"""Shared-edge-cache bench mode must be result-identical.

bench.py times the graph family a second time under ONE
pre-materialized co-purchase edge cache (SPARK_GRAFT_SHARED_EDGES=1,
see queries/graph.py `_family_edges`) — a timing-only mode, so any
row-level divergence from the default per-query rebuild would make
the committed A/B meaningless.  Pin equality on a representative
query from each edge-consumption shape: cached-default (pagerank via
_sym), retained-cache iterative (label propagation), and the
broadcast-attach census (assortativity).
"""

from __future__ import annotations

import os

import pytest

from ondemand_dask_spark.queries.graph import release_shared_edges
from ondemand_dask_spark.registry import all_queries


@pytest.mark.parametrize(
    "name",
    ["graph_pagerank", "graph_label_propagation", "graph_assortativity"],
)
def test_shared_mode_matches_default(spark, sf_dir, name):
    q = all_queries()[name]
    base = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    os.environ["SPARK_GRAFT_SHARED_EDGES"] = "1"
    try:
        shared = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    finally:
        os.environ.pop("SPARK_GRAFT_SHARED_EDGES", None)
        release_shared_edges()
    assert shared == base
