"""Isolated best-of-N measurement of registered queries — the
protocol the r7 verdict asks applied to guard-flagged regressions
(the dedup_minhash_lsh discipline, bench.py:229-246): EXCLUSIVE run,
fresh session, one warm-up + N timed runs per query, with BOTH bench
calibration jobs (CPU-bound codegen sum; bandwidth-bound sort of a
cached frame) measured in the same session/hour so attribution can
divide host drift out.

Usage: python tools/ab_isolated.py name[,name...] [sf_dir] [runs]
Emits one JSON line: {"calib_sec": ..., "calib_bw_sec": ...,
"queries": {name: {"best": s, "all": [...]}}}.
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
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def measure(spark, names: list[str], sf_dir: str, runs: int = 5) -> dict:
    """The isolated protocol body on the GIVEN (fresh) session: both
    calibration jobs, then 1 warm-up + `runs` timed runs per query
    with full cache eviction between runs.  Shared with bench.py's
    per-round `isolated` block (r8 verdict item 3) so the committed
    numbers and this ad-hoc tool stay the same instrument."""
    qs = all_queries()

    def calib_cpu() -> float:
        t0 = time.perf_counter()
        spark.range(1_000_000_000).selectExpr(
            "sum(CAST(id AS DOUBLE) * id) AS s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    bw = spark.range(30_000_000).select(F.xxhash64("id").alias("k")).persist()
    bw.count()

    def calib_bw() -> float:
        t0 = time.perf_counter()
        bw.orderBy("k").write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calib_cpu()
    cpu = round(min(calib_cpu() for _ in range(3)), 4)
    calib_bw()
    bwv = round(min(calib_bw() for _ in range(3)), 4)
    bw.unpersist()

    def run_once(name: str) -> float:
        evict_all_retained()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    out: dict[str, dict] = {}
    for name in names:
        run_once(name)  # warm-up
        ts = [round(run_once(name), 4) for _ in range(runs)]
        out[name] = {"best": min(ts), "all": ts}
        print(f"{name}: best {min(ts):.2f}s of {ts}", file=sys.stderr)

    return {"calib_sec": cpu, "calib_bw_sec": bwv, "queries": out}


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = build_session(app_name="ab_isolated", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(measure(spark, names, sf_dir, runs)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
