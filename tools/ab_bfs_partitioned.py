"""A/B a zero-exchange-superstep BFS rewrite in ONE warm session
(repo bench hygiene: interleaved rounds, exclusive host).

Hypothesis: the LPA zero-exchange trick (r8) transfers to BFS with
the roles flipped — pre-partition the cached symmetric edge list on
**v** (the per-superstep AGGREGATION key), BROADCAST the frontier
onto join key u (broadcast preserves the streamed side's
partitioning) and project v→node before the distinct-groupBy, so the
reached-set aggregation runs exchange-free; the settled-set
anti-join also broadcasts (the settled set is |V|-bounded — the same
dimension-sized justification as LPA's label vector).  The
registered form pays a distinct exchange + an anti-join
sort-merge exchange per superstep.

Arms:
  bfs_registered   — the current registered graph_bfs_khop
  bfs_partitioned  — sym repartition(v).cache() + broadcast frontier
                     + broadcast anti-join on the settled set

Usage: python tools/ab_bfs_partitioned.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.operators.checkpoint import (  # noqa: E402
    evict_all_retained,
)
from ondemand_dask_spark.queries.graph import (  # noqa: E402
    _BFS_HOPS,
    _BFS_SOURCES,
    _edges,
    _sym,
)
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab_bfs", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    par = spark.sparkContext.defaultParallelism

    def bfs_partitioned():
        sym = _sym(_edges(spark, sf_dir)).repartition(par, "v").cache()
        sym.count()
        deg = sym.groupBy(F.col("u").alias("node")).agg(
            F.count("*").alias("d")
        )
        src = (
            deg.orderBy(F.desc("d"), F.asc("node"))
            .limit(_BFS_SOURCES)
            .select("node")
        )
        dist = src.withColumn("dist", F.lit(0))
        frontier = src
        for hop in range(1, _BFS_HOPS + 1):
            reached = (
                sym.join(
                    F.broadcast(frontier.withColumnRenamed("node", "u")),
                    "u",
                )
                .select(F.col("v").alias("node"))
                .distinct()
            )
            new = (
                reached.join(
                    F.broadcast(dist.select("node")), "node", "left_anti"
                )
                .withColumn("dist", F.lit(hop))
                .localCheckpoint(eager=False)
            )
            dist = dist.unionByName(new)
            frontier = new.select("node")
        out = dist.groupBy("dist").agg(F.count("*").alias("n_nodes"))
        out.write.format("noop").mode("overwrite").save()
        sym.unpersist()

    def registered():
        qs["graph_bfs_khop"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    arms = {
        "bfs_registered": registered,
        "bfs_partitioned": bfs_partitioned,
    }
    times: dict[str, list[float]] = {a: [] for a in arms}
    for fn in arms.values():  # warm-up
        evict_all_retained()
        spark.catalog.clearCache()
        fn()
    for r in range(rounds):
        for name, fn in arms.items():
            evict_all_retained()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
            print(f"round {r} arm={name:16s} {dt:6.2f}s", flush=True)
    print(json.dumps({a: min(ts) for a, ts in times.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
