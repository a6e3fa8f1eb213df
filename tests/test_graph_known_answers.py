"""Known-answer tests for the graph family on constructed graphs.

The co-purchase edge list derives from lineitem (parts sharing an
order), so a mini lineitem fixture constructs EXACT graph topologies:
one order forms a clique; overlapping 2-part orders assemble
arbitrary edges.  The differential is blind to a census wrong the
same way on both engines (the r8 blind-spot theme); hand-countable
topologies are the independent check.
"""

from __future__ import annotations

import os

import pandas as pd

from ondemand_dask_spark.registry import all_queries


def _mini_lineitem(tmp_path, orders):
    """orders: list of part-key lists; each becomes one order."""
    rows = []
    for okey, parts in enumerate(orders, start=1):
        for ln, p in enumerate(parts, start=1):
            rows.append((okey, p, ln, 1.0, 1.0))
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_linenumber",
            "l_quantity", "l_extendedprice",
        ],
    ).to_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return sf_dir


def test_triangle_census_on_constructed_topologies(spark, tmp_path):
    """K4 (one 4-part order): 4 triangles, every node in 3.
    A triangle assembled from three 2-part orders: every node in 1.
    A 3-node path (two 2-part orders): no triangles — absent."""
    sf_dir = _mini_lineitem(
        tmp_path,
        [
            [1, 2, 3, 4],          # K4
            [21, 22], [22, 23], [21, 23],  # triangle from overlaps
            [31, 32], [32, 33],    # path — zero triangles
        ],
    )
    got = {
        int(r["part_id"]): int(r["n_triangles"])
        for r in all_queries()["graph_triangle_count"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 21: 1, 22: 1, 23: 1}


def test_pagerank_uniform_on_regular_components(spark, tmp_path):
    """On a graph whose every component is k-REGULAR (K4, K3, K2),
    uniform rank is the exact fixpoint at every iteration: teleport
    mass is global-uniform and within-component contributions
    conserve a regular component's mass, so pr_scaled (rank × |V|,
    mean 1.0) must be exactly 1.0 for every node — a closed-form
    answer independent of both engines' iteration arithmetic."""
    sf_dir = _mini_lineitem(
        tmp_path,
        [
            [1, 2, 3, 4],                  # K4 — 3-regular
            [21, 22], [22, 23], [21, 23],  # K3 — 2-regular
            [31, 32],                      # K2 — 1-regular
        ],
    )
    got = {
        int(r["part_id"]): float(r["pr_scaled"])
        for r in all_queries()["graph_pagerank"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 3, 4, 21, 22, 23, 31, 32}
    for node, rank in got.items():
        assert abs(rank - 1.0) < 1e-9, (node, rank)
