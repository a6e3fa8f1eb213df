"""A/B the r14 PageRank iteration rewrites in ONE warm session
(repo bench hygiene: interleaved rounds, exclusive host).

Motivation (plans/r14/graph_pagerank_before.txt): the registered
query's rank-vector join plans as a per-iteration SortMergeJoin —
Exchange + Sort of the 2.4M-row cached sym EVERY iteration (3×),
plus a separate broadcast deg attach — and the union-based _sym
duplicates the edge-build lineage across both legs when AQE exchange
reuse does not fire.  The r7 A/B tested only a naive
F.broadcast(pr) on the otherwise unchanged shape (6.34 s declarative
vs 6.77 s explicit) — it did NOT test folding deg into the broadcast
vector (one BHJ per iteration instead of SMJ + BHJ) or the
explode-based symmetrization (one edge-build pass instead of two
union legs).

Arms:
  registered — the current graph_pagerank
  explode    — registered iterations, sym built via
               explode(array(struct(src,dst), struct(dst,src)))
  bcast      — explode sym + per-iteration broadcast of the combined
               (node, pr, d) vector: sym never shuffles or sorts in
               any iteration; the only data-sized op per round is the
               cached-sym scan feeding a partial-agg groupBy(v)

Every arm must emit IDENTICAL rows (checked at the probe SF before
timing).  Usage: python tools/ab_pagerank_r14.py [sf_dir] [rounds]
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
    _PR_D,
    _PR_ITERS,
    _R,
    _edges,
    _sym,
)
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def _sym_explode(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
                F.struct(F.col("dst").alias("u"), F.col("src").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")


def pr_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return all_queries()["graph_pagerank"].fn(spark, sf_dir)


def _pr_iterations(
    spark: SparkSession, sym: DataFrame, *, bcast: bool
) -> DataFrame:
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    nn = deg.agg(F.count("*").alias("n"))
    if not bcast:
        pr = deg.crossJoin(F.broadcast(nn)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("pr")
        )
        for _ in range(_PR_ITERS):
            contrib = (
                sym.join(pr, sym["u"] == pr["node"])
                .join(F.broadcast(deg).alias("d"), F.col("d.node") == sym["u"])
                .select(F.col("v"), (F.col("pr") / F.col("d.d")).alias("c"))
            )
            pr = (
                contrib.groupBy(F.col("v").alias("node"))
                .agg(F.sum("c").alias("s"))
                .crossJoin(F.broadcast(nn))
                .select(
                    "node",
                    ((1 - _PR_D) / F.col("n") + F.lit(_PR_D) * F.col("s")).alias(
                        "pr"
                    ),
                )
            )
    else:
        deg = deg.cache()
        # combined (node, pr, d) vector — ONE broadcast attach per
        # iteration, sym side never exchanged
        vec = deg.crossJoin(F.broadcast(nn)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("pr"), "d"
        )
        for _ in range(_PR_ITERS):
            contrib = sym.join(
                F.broadcast(vec).withColumnRenamed("node", "u"), "u"
            ).select(F.col("v"), (F.col("pr") / F.col("d")).alias("c"))
            vec = (
                contrib.groupBy(F.col("v").alias("node"))
                .agg(F.sum("c").alias("s"))
                .crossJoin(F.broadcast(nn))
                .select(
                    "node",
                    ((1 - _PR_D) / F.col("n") + F.lit(_PR_D) * F.col("s")).alias(
                        "pr"
                    ),
                )
                .join(F.broadcast(deg), "node")
            )
        pr = vec.select("node", "pr")
    return pr.crossJoin(F.broadcast(nn)).select(
        F.col("node").alias("part_id"),
        (F.round(F.col("pr") * F.col("n") - 1e-9, _R) + 0.0).alias("pr_scaled"),
    )


def pr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = _sym_explode(_edges(spark, sf_dir)).cache()
    return _pr_iterations(spark, sym, bcast=False)


def pr_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = _sym_explode(_edges(spark, sf_dir)).cache()
    return _pr_iterations(spark, sym, bcast=True)


ARMS = {
    "registered": pr_registered,
    "explode": pr_explode,
    "bcast": pr_bcast,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(
        app_name="ab_pagerank_r14",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # identity check at a small SF first: every arm must return the
    # same rows (the registered query is oracle-checked, so matching
    # it exactly is the equivalence proof for the rewrites)
    probe_dir = "/root/testdata/sf0.01"
    base = None
    for name, fn in ARMS.items():
        evict_all_retained()
        spark.catalog.clearCache()
        rows = sorted(
            (r["part_id"], r["pr_scaled"]) for r in fn(spark, probe_dir).collect()
        )
        if base is None:
            base = rows
        elif rows != base:
            diffs = [
                (a, b) for a, b in zip(base, rows) if a != b
            ][:5]
            print(f"ARM {name} DIVERGES at {probe_dir}: {diffs}")
            return 1
    print(f"identity check passed at {probe_dir}: {len(base)} rows")

    def run_once(fn) -> float:
        evict_all_retained()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for fn in ARMS.values():  # warm-up
        run_once(fn)
    times: dict[str, list[float]] = {n: [] for n in ARMS}
    for _ in range(rounds):  # interleaved rounds
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
