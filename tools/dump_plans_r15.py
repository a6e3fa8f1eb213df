"""Dump explain('formatted') for headline queries → plans/r15/.

Usage: python tools/dump_plans_r15.py [before|after] [query ...]

With no query names, dumps every bench.HEADLINE query.  Plans are
constructed at $SPARK_GRAFT_SF_DIR (default sf0.1) — the bench SF —
so Exchange counts / join strategies match what the bench times.
Iterative queries execute their per-round driver actions during
plan construction; that is the cost of a faithful plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from ondemand_dask_spark.plans import plan_string  # noqa: E402
from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(
        app_name=f"dump_plans_{suffix}",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        if name not in queries:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = queries[name].fn(spark, sf_dir)
            plan = plan_string(df)
        except Exception as exc:  # record the failure, keep going
            plan = f"PLAN FAILED: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
