"""A/B the zero-exchange-round LPA/PageRank rewrite in ONE warm
session (repo bench hygiene: interleaved rounds, exclusive host).

Hypothesis (plan-verified at sf0.001): pre-partitioning the
symmetrized edge list on the aggregation key and projecting the
alias BEFORE groupBy lets HashPartitioning(u) satisfy every round's
ClusteredDistribution — the alias inside groupBy(col("u").alias(
"node")) blocks AliasAwareOutputPartitioning, so the registered form
pays 2 data-sized exchanges per LPA round (count agg + argmax agg)
and 1 per PageRank iteration that the rewrite removes entirely.

Arms:
  lpa_registered   — the current registered query
  lpa_partitioned  — sym repartition(u).cache() + project-then-group
  pr_registered    — current graph_pagerank
  pr_partitioned   — sym repartition(v).cache(), contribs grouped on v

Usage: python tools/ab_lpa_partitioned.py [sf_dir] [rounds]
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
    _LPA_ROUNDS,
    _PR_D,
    _PR_ITERS,
    _edges,
    _sym,
)
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab_lpa", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    par = spark.sparkContext.defaultParallelism

    def lpa_partitioned():
        sym = _sym(_edges(spark, sf_dir)).repartition(par, "u").cache()
        sym.count()
        labels = (
            sym.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
        )
        for _ in range(_LPA_ROUNDS):
            joined = sym.join(
                F.broadcast(labels.withColumnRenamed("node", "v")), "v"
            )
            cnt = (
                joined.select(F.col("u").alias("node"), "lbl")
                .groupBy("node", "lbl")
                .agg(F.count("*").alias("c"))
            )
            labels = cnt.groupBy("node").agg(
                F.max_by(
                    "lbl", F.struct(F.col("c"), -F.col("lbl"))
                ).alias("lbl")
            )
        out = labels.select(
            F.col("node").alias("part_id"), F.col("lbl").alias("label")
        )
        out.write.format("noop").mode("overwrite").save()
        sym.unpersist()

    def pr_partitioned():
        # registered graph_pagerank semantics, with sym pre-
        # partitioned on the aggregation key v and the v->node alias
        # projected BEFORE the groupBy
        sym = _sym(_edges(spark, sf_dir)).repartition(par, "v").cache()
        sym.count()
        deg = sym.groupBy(F.col("u").alias("node")).agg(
            F.count("*").alias("d")
        )
        nn = deg.agg(F.count("*").alias("n"))
        pr = deg.crossJoin(F.broadcast(nn)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("pr")
        )
        for _ in range(_PR_ITERS):
            contrib = (
                sym.join(pr, sym["u"] == pr["node"])
                .join(
                    F.broadcast(deg).alias("d"),
                    F.col("d.node") == sym["u"],
                )
                .select(
                    F.col("v").alias("node"),
                    (F.col("pr") / F.col("d.d")).alias("c"),
                )
            )
            pr = (
                contrib.groupBy("node")
                .agg(F.sum("c").alias("s"))
                .crossJoin(F.broadcast(nn))
                .select(
                    "node",
                    (
                        (1 - _PR_D) / F.col("n")
                        + F.lit(_PR_D) * F.col("s")
                    ).alias("pr"),
                )
            )
        out = pr.crossJoin(F.broadcast(nn)).select(
            F.col("node").alias("part_id"),
            (F.round(F.col("pr") * F.col("n") - 1e-9, 4) + 0.0).alias(
                "pr_scaled"
            ),
        )
        out.write.format("noop").mode("overwrite").save()
        sym.unpersist()

    def registered(name):
        def run():
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        return run

    arms = {
        "lpa_registered": registered("graph_label_propagation"),
        "lpa_partitioned": lpa_partitioned,
        "pr_registered": registered("graph_pagerank"),
        "pr_partitioned": pr_partitioned,
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
