"""A/B the r14 BFS superstep rewrites in ONE warm session.

The registered frontier-delta BFS pays, per hop: a frontier join, a
distinct exchange, an anti-join against the settled set, and a lazy
localCheckpoint.  At co-purchase scale the settled set is
dimension-sized (|V| = the part catalog), so the delta machinery's
fixed costs may exceed what it saves.  Arms:

  registered — current graph_bfs_khop
  relax      — the oracle's own unrolled min-dist relaxation:
               dist_{r+1} = min over union(dist_r, neighbors+1);
               one lazy plan, no distinct/anti-join/checkpoint; the
               dist vector rides an explicit broadcast (|V|-row)
  delta_bc   — registered delta shape, but frontier and settled set
               explicitly broadcast, no localCheckpoint

Usage: python tools/ab_bfs_r14.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.operators.checkpoint import (  # noqa: E402
    evict_all_retained,
)
from ondemand_dask_spark.queries.graph import (  # noqa: E402
    _BFS_HOPS,
    _BFS_SOURCES,
    _family_edges,
    _sym,
)
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def bfs_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return all_queries()["graph_bfs_khop"].fn(spark, sf_dir)


def _common(spark: SparkSession, sf_dir: str):
    edges = _family_edges(spark, sf_dir)
    edges.count()
    sym = _sym(edges)
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    src = (
        deg.orderBy(F.desc("d"), F.asc("node"))
        .limit(_BFS_SOURCES)
        .select("node")
    )
    return sym, src


def bfs_relax(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym, src = _common(spark, sf_dir)
    dist = src.withColumn("dist", F.lit(0))
    for _ in range(_BFS_HOPS):
        relax = sym.join(
            F.broadcast(dist).withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.groupBy("dist").agg(F.count("*").alias("n_nodes"))


def bfs_delta_bc(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym, src = _common(spark, sf_dir)
    dist = src.withColumn("dist", F.lit(0))
    frontier = src
    for hop in range(1, _BFS_HOPS + 1):
        reached = (
            sym.join(F.broadcast(frontier).withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = reached.join(
            F.broadcast(dist.select("node")), "node", "left_anti"
        ).withColumn("dist", F.lit(hop))
        dist = dist.unionByName(new)
        frontier = new.select("node")
    return dist.groupBy("dist").agg(F.count("*").alias("n_nodes"))


ARMS = {
    "registered": bfs_registered,
    "relax": bfs_relax,
    "delta_bc": bfs_delta_bc,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(
        app_name="ab_bfs_r14",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    probe_dir = "/root/testdata/sf0.01"
    base = None
    for name, fn in ARMS.items():
        evict_all_retained()
        spark.catalog.clearCache()
        rows = sorted(
            (r["dist"], r["n_nodes"]) for r in fn(spark, probe_dir).collect()
        )
        if base is None:
            base = rows
        elif rows != base:
            print(f"ARM {name} DIVERGES at {probe_dir}: {rows} vs {base}")
            return 1
    print(f"identity check passed at {probe_dir}: {base}")

    def run_once(fn) -> float:
        evict_all_retained()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for fn in ARMS.values():
        run_once(fn)
    times: dict[str, list[float]] = {n: [] for n in ARMS}
    for _ in range(rounds):
        for name, fn in ARMS.items():
            times[name].append(round(run_once(fn), 4))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "best": {n: min(ts) for n, ts in times.items()},
                "all": times,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
