"""A/B for graph_label_propagation's upfront layout (r15, VERDICT
item 3): the registered shape pays a full repartition+cache of the
2|E|-row symmetric edge list before the rounds (~40% of LPA's cost
per the r14 audit).  Challengers avoid that second full shuffle:

  base     — registered: _sym(edges).repartition(par, "u").cache()
             (zero-exchange rounds; 2|E| exchange + 2|E| cache upfront)
  symcache — _sym(edges).cache(), NO repartition: rounds pay one
             exchange of PARTIALLY-AGGREGATED (node,lbl,c) rows each
             (bounded by distinct labels per node per partition),
             upfront pays only the cache write.
  edgecache— cache the canonical |E| edges once (the frame every
             graph query already builds); sym is a lazy explode over
             the cache (narrow).  Halves the cached bytes; rounds as
             symcache.

Usage: python tools/ab_lpa_r15.py [sf_dir] [rounds]
Interleaved best-of-rounds in ONE warm session + identity checks.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.queries.graph import (  # noqa: E402
    _CACHES,
    _LPA_ROUNDS,
    _family_edges,
    _sym,
)
from ondemand_dask_spark.session import build_session  # noqa: E402

_evict_retained = _CACHES.evict
_retain = _CACHES.retain


def _rounds(labels_src, sym):
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
            F.max_by("lbl", F.struct(F.col("c"), -F.col("lbl"))).alias("lbl")
        )
    return labels.select(
        F.col("node").alias("part_id"), F.col("lbl").alias("label")
    )


def lpa(spark, sf_dir, mode: str):
    _evict_retained()
    par = spark.sparkContext.defaultParallelism
    if mode == "base":
        sym = _retain(
            _sym(_family_edges(spark, sf_dir, cached_default=False))
            .repartition(par, "u")
            .cache()
        )
        sym.count()
    elif mode == "symcache":
        sym = _retain(
            _sym(_family_edges(spark, sf_dir, cached_default=False)).cache()
        )
        sym.count()
    elif mode == "edgecache":
        edges = _family_edges(spark, sf_dir)  # cached+retained |E| rows
        edges.count()
        sym = _sym(edges)
    else:
        raise ValueError(mode)
    return _rounds(None, sym)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session(
        app_name="ab_lpa_r15",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    modes = ["base", "symcache", "edgecache"]

    base_rows = sorted(map(tuple, lpa(spark, sf_dir, "base").collect()))
    for m in modes[1:]:
        rows = sorted(map(tuple, lpa(spark, sf_dir, m).collect()))
        assert rows == base_rows, f"{m} differs!"
        print(f"identity {m}: OK ({len(rows)} rows)", file=sys.stderr)

    def run(m) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        lpa(spark, sf_dir, m).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {m: [] for m in modes}
    for m in modes:
        run(m)
    for _ in range(rounds):
        for m in modes:
            results[m].append(round(run(m), 3))
    for m, ts in results.items():
        print(f"{m}: best {min(ts):.2f}s of {ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
