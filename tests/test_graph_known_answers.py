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


def test_kcore_keeps_exactly_the_clique(spark, tmp_path):
    """k-core at k=3 on K4 ∪ K3 ∪ path: K3's nodes have degree 2 and
    peel away, the path peels, and ONLY K4 survives — each surviving
    node with core degree 3."""
    sf_dir = _mini_lineitem(
        tmp_path,
        [[1, 2, 3, 4], [21, 22], [22, 23], [21, 23], [31, 32], [32, 33]],
    )
    got = {
        int(r["part_id"]): int(r["core_degree"])
        for r in all_queries()["graph_kcore"].fn(spark, sf_dir).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_label_propagation_hand_simulated(spark, tmp_path):
    """3 synchronous LPA rounds hand-simulated on K4, K3, and a
    2-node component.  K4/K3 settle on the component min by round 2;
    the K2 OSCILLATES under synchronous updates (the classic
    bipartite flip), landing swapped after the odd round count —
    pinning that the engine runs true synchronous rounds rather than
    converging early or updating in-place."""
    sf_dir = _mini_lineitem(
        tmp_path,
        [[1, 2, 3, 4], [21, 22], [22, 23], [21, 23], [31, 32]],
    )
    got = {
        int(r["part_id"]): int(r["label"])
        for r in all_queries()["graph_label_propagation"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        21: 21, 22: 21, 23: 21,
        31: 32, 32: 31,  # swapped after 3 (odd) synchronous rounds
    }


def test_bfs_reach_histogram_hand_computed(spark, tmp_path):
    """K5 (parts 1-5) with a chain 5-6-7-8-9: the top-5 hubs by
    (degree desc, node asc) are exactly the clique (node 5 has
    degree 5, nodes 1-4 degree 4, chain nodes ≤ 2), so the 3-hop
    multi-source BFS reaches 6/7/8 at hops 1/2/3 and never reaches
    9 — histogram {0:5, 1:1, 2:1, 3:1}."""
    sf_dir = _mini_lineitem(
        tmp_path,
        [[1, 2, 3, 4, 5], [5, 6], [6, 7], [7, 8], [8, 9]],
    )
    got = {
        int(r["dist"]): int(r["n_nodes"])
        for r in all_queries()["graph_bfs_khop"].fn(spark, sf_dir).collect()
    }
    assert got == {0: 5, 1: 1, 2: 1, 3: 1}


def test_hierarchy_rollup_resolves_beyond_depth_16(spark, tmp_path):
    """sql_recursive_hierarchy_rollup's synthetic tree has depth
    log4(partkey); the unroll must cover ANY int64 key.  A
    constructed part at 4^17 sits 17 levels below root 1 — at the
    old 4 doubling rounds (depth 16) it silently rolled up to a
    NON-root ancestor; 5 rounds (depth 32 > log4(int64 max)) resolve
    it.  Also checks an sf-style shallow key and a root."""
    import pandas as pd

    # the full ancestor chain 4^1..4^17 must exist as parts (the
    # doubling join climbs through existing nodes — dense keys in
    # the real fixture guarantee that; construct it here), plus a
    # root and one shallow key
    keys = [1, 7] + [4**i for i in range(1, 18)]
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {"p_partkey": keys, "p_retailprice": [1.0] * len(keys)}
    ).to_parquet(os.path.join(sf_dir, "part.parquet"))

    got = {
        int(r["top_ancestor"]): (int(r["n_parts"]), float(r["total_retail"]))
        for r in all_queries()["sql_recursive_hierarchy_rollup"]
        .fn(spark, sf_dir)
        .collect()
    }
    # everything climbs to root 1 (7 // 4 = 1; 4^i chains down to 4^1
    # whose parent is 1); 4^17 is 17 levels deep — beyond the old
    # 4-round (depth-16) unroll, which mis-rooted it at 4^1
    assert got == {1: (len(keys), float(len(keys)))}
