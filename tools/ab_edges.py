"""A/B the co-purchase edge build (graph._edges) in ONE warm session.

Arms:
  selfjoin — the current shape: repartition on l_orderkey, self-join,
             distinct
  collect  — groupBy(l_orderkey).collect_set(l_partkey), pair
             expansion via nested array transform (pure codegen),
             distinct: one partial-agg shuffle instead of the join,
             and the pair explosion happens AFTER the groupBy
             reduced each order to its distinct parts
Each arm ends in the same (src, dst) distinct, timed to a noop write.

Usage: python tools/ab_edges.py [sf_dir] [rounds]
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

from ondemand_dask_spark.io import load_table  # noqa: E402
from ondemand_dask_spark.queries import graph  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab_edges", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def selfjoin():
        return graph._edges(spark, sf_dir)

    def collect():
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        per_order = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("parts")
        )
        pairs = per_order.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("parts"),
                                i + 2,
                                F.greatest(
                                    F.size(F.col("parts")) - i - 1, F.lit(0)
                                ),
                            ),
                            lambda b: F.struct(
                                a.alias("src"), b.alias("dst")
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.src", "p.dst")
        return pairs.distinct()

    arms = {"selfjoin": selfjoin, "collect": collect}
    # sanity: identical edge sets
    ca = selfjoin().count()
    cb = collect().count()
    print(f"edge counts: selfjoin={ca} collect={cb}")
    assert ca == cb, "arms disagree"
    times: dict[str, list[float]] = {a: [] for a in arms}
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} arm={name:9s} {dt:6.2f}s", flush=True)
    print(json.dumps({a: round(min(ts), 3) for a, ts in times.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
