"""Topology-adversarial scale probe for star-contraction CC.

A chain (path graph) is the worst case for min-label propagation:
rounds = diameter, so a 200k-node chain needs 200k supersteps and
NEVER finishes in practice.  Star contraction must converge in
O(log n) rounds on the same input.  This probe runs both on a
200k-chain + 1000 random 50-node clusters and prints per-algorithm
rounds, wall time, and whether the labels agree with ground truth
(chain: every node labels to 0; clusters: min node of each).

Usage:  python tools/probe_star_cc.py [--chain 200000] [--cap 12]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.operators.checkpoint import (  # noqa: E402
    release_local_checkpoint,
)
from ondemand_dask_spark.operators.graphcc import (  # noqa: E402
    connected_components_star,
)
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=12,
                    help="round cap for the propagation baseline")
    args = ap.parse_args()

    spark = build_session(
        app_name="probe_star_cc",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = args.chain
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    # 1000 dense 50-node clusters, ids disjoint from the chain
    base = 10_000_000
    clusters = (
        spark.range(1000 * 49)
        .select(
            (F.lit(base) + (F.col("id") / 49).cast("long") * 50).alias("c0"),
            (F.col("id") % 49).alias("k"),
        )
        .select("c0", (F.col("c0") + F.col("k") + 1).alias("dst"))
        .select(F.col("c0").alias("src"), "dst")
    )
    edges = chain.unionByName(clusters).localCheckpoint()
    report: dict = {"chain_nodes": n, "cluster_edges": edges.count() - (n - 1)}

    # --- star contraction ---
    stats: dict = {}
    t0 = time.perf_counter()
    labels, stars = connected_components_star(edges, stats=stats)
    bad = labels.filter(
        (
            (F.col("node") < base) & (F.col("cluster_id") != 0)
        ) | (
            (F.col("node") >= base)
            & (
                F.col("cluster_id")
                != F.floor((F.col("node") - base) / 50) * 50 + base
            )
        )
    ).count()
    report["star"] = {
        "rounds": stats["rounds"],
        "seconds": round(time.perf_counter() - t0, 2),
        "wrong_labels": bad,
    }
    release_local_checkpoint(stars)

    # --- min-label propagation baseline, capped ---
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    t0 = time.perf_counter()
    converged = False
    rounds = 0
    for _ in range(args.cap):
        prop = sym.join(labels, sym["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "lbl"
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") < F.col("o.lbl"))
            .count()
        )
        release_local_checkpoint(labels)
        labels = new_labels
        rounds += 1
        if changed == 0:
            converged = True
            break
    report["propagation"] = {
        "rounds": rounds,
        "seconds": round(time.perf_counter() - t0, 2),
        "converged": converged,
        "note": (
            "chain diameter = %d; propagation needs that many rounds"
            % (n - 1)
        ),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
