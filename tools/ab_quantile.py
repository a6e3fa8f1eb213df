"""A/B agg_groupby_quantile's cost structure in ONE warm session
(repo bench hygiene: never compare timings across sessions or under
concurrent load).  Round-robin interleaves the arms so slow drift
(JIT, page cache) hits all arms equally.

Arms:
  full        — the registered query (approx sketch + exact + join)
  exact_only  — just the distributed exact sort-path operator
  approx_only — just the percentile_approx aggregate
  exact_join  — exact path with counts from a separate agg+join
                instead of the whole-partition count window (the r3
                surgery candidate: is the count window re-scanning?)

Usage: python tools/ab_quantile.py [sf_dir] [rounds]
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
from ondemand_dask_spark.operators.quantile import (  # noqa: E402
    _sort_path,
    exact_group_quantiles,
    exact_group_quantiles_ranged,
    exact_group_quantiles_select,
)
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab_quantile", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()["agg_groupby_quantile"]

    def full():
        return q.fn(spark, sf_dir)

    def exact_only():
        li = load_table(spark, sf_dir, "lineitem")
        return exact_group_quantiles(
            li, ["l_returnflag"], "l_extendedprice", {"q50": 0.5, "q90": 0.9}
        )

    def approx_only():
        li = load_table(spark, sf_dir, "lineitem")
        return li.groupBy("l_returnflag").agg(
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), 10000
            ).alias("approx_qs")
        )

    def exact_join():
        li = load_table(spark, sf_dir, "lineitem")
        d = li.select(
            "l_returnflag", F.col("l_extendedprice").cast("double").alias("__v")
        ).filter(F.col("__v").isNotNull())
        counts = d.groupBy("l_returnflag").agg(F.count("*").alias("__n"))
        return _sort_path(d, counts, ["l_returnflag"], {"q50": 0.5, "q90": 0.9})

    def select_minmax():
        li = load_table(spark, sf_dir, "lineitem")
        return exact_group_quantiles_select(
            li, ["l_returnflag"], "l_extendedprice",
            {"q50": 0.5, "q90": 0.9}, cuts_from="minmax",
        )

    def select_sketch():
        li = load_table(spark, sf_dir, "lineitem")
        return exact_group_quantiles_select(
            li, ["l_returnflag"], "l_extendedprice",
            {"q50": 0.5, "q90": 0.9}, cuts_from="sketch",
        )

    def ranged():
        li = load_table(spark, sf_dir, "lineitem")
        return exact_group_quantiles_ranged(
            li, ["l_returnflag"], "l_extendedprice", {"q50": 0.5, "q90": 0.9}
        )

    arms = {
        "full": full,
        "exact_only": exact_only,
        "ranged": ranged,
        "approx_only": approx_only,
        "exact_join": exact_join,
        "select_minmax": select_minmax,
        "select_sketch": select_sketch,
    }
    times: dict[str, list[float]] = {a: [] for a in arms}
    for fn in arms.values():  # warm-up, untimed
        fn().write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} arm={name:12s} {dt:6.2f}s", flush=True)
    summary = {a: round(min(ts), 3) for a, ts in times.items()}
    print(json.dumps({"best_of": summary, "all": times}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
