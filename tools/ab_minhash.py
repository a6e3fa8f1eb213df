"""A/B the dedup_minhash_lsh verification-join strategies in ONE warm
session (repo bench hygiene: never compare timings across sessions or
under concurrent load).  Interleaves the variants round-robin so slow
drift (JIT, page cache) hits all arms equally.

Usage: python tools/ab_minhash.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ondemand_dask_spark.queries import dedup  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab_minhash")
    modes = ["broadcast", "shuffle", "full"]
    times: dict[str, list[float]] = {m: [] for m in modes}
    # warm-up: one untimed run so scan/codegen caches are hot for all
    dedup.dedup_minhash_lsh(spark, sf_dir).count()
    for r in range(rounds):
        for m in modes:
            dedup._VERIFY_MODE = m
            t0 = time.time()
            n = dedup.dedup_minhash_lsh(spark, sf_dir).count()
            dt = time.time() - t0
            times[m].append(dt)
            print(f"round {r} mode={m:9s} {dt:6.2f}s  rows={n}", flush=True)
    dedup._VERIFY_MODE = "broadcast"
    summary = {m: round(min(ts), 3) for m, ts in times.items()}
    print(json.dumps({"best_of": summary, "all": times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
