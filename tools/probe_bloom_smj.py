"""A/B probe: does the explicit Bloom prefilter pay once the exact
join is a real sort-merge (the 100 TB fact-fact regime)?

Locally AQE broadcasts join_bloom_prefilter's filtered build side,
so the Bloom is pure overhead (see the query docstring).  This probe
recreates the regime the operator is FOR: broadcast disabled
(spark.sql.autoBroadcastJoinThreshold=-1, the effective state of a
fact-fact join whose build side exceeds any threshold), so the exact
join must shuffle the full probe side — unless the Bloom drops
non-matching rows first.

Run: python tools/probe_bloom_smj.py [sf_dir] [runs]

MEASURED (sf0.1, local[32], best-of-5 warm, broadcast disabled):
plain SMJ 0.66 s vs Bloom+SMJ 0.74 s (narrow probe), 0.71 vs 0.78 s
with the full 11-column lineitem width — break-even even in the
forced-SMJ regime, because a 600 k-row local shuffle costs about as
much as the per-row hash+test.  This matches Spark's own runtime
bloom filter policy: the built-in rule (spark.sql.optimizer.runtime.
bloomFilter.enabled=true here) only injects when the application-side
scan exceeds ~10 GB — exactly the regime a local fixture cannot
reach.  Conclusion recorded in the query docstring: the operator is
the 100 TB mechanism made explicit and differentially testable; at
fixture scale it is expected overhead, not a win.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.io import load_table  # noqa: E402
from ondemand_dask_spark.queries.joins import (  # noqa: E402
    _BLOOM_BITS,
    _BLOOM_PRICE,
)
from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="probe_bloom", shuffle_partitions=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setLogLevel("ERROR")

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select("o_orderkey", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    def finish(probe):
        return (
            probe.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderpriority")
            .agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue")
            )
        )

    def bucket(col):
        return F.pmod(F.xxhash64(col), F.lit(_BLOOM_BITS))

    def bloom_probe():
        bloom = (
            o.select(bucket(F.col("o_orderkey")).alias("bk"))
            .select(
                F.floor(F.col("bk") / 64).cast("long").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(bk % 64 AS INT))"
                ).alias("bit"),
            )
            .groupBy("word")
            .agg(F.bit_or("bit").alias("bits"))
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("word", "bits"))
                ).alias("m")
            )
            .select(
                F.expr(
                    f"transform(sequence(0, {_BLOOM_BITS // 64 - 1}), "
                    "i -> coalesce(element_at(m, CAST(i AS BIGINT)), "
                    "CAST(0 AS BIGINT)))"
                ).alias("bloom")
            )
        )
        return (
            li.crossJoin(F.broadcast(bloom))
            .withColumn("bk", bucket(F.col("l_orderkey")))
            .filter(
                F.expr(
                    "(shiftright("
                    "element_at(bloom, CAST(floor(bk / 64) AS INT) + 1),"
                    " CAST(bk % 64 AS INT)) & 1) = 1"
                )
            )
            .drop("bloom", "bk")
        )

    variants = {"plain_smj": lambda: finish(li), "bloom_smj": lambda: finish(bloom_probe())}
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()  # warm
        best = min(
            _timed(make) for _ in range(runs)
        )
        n = make().count()
        print(f"{name}: best {best:.3f}s over {runs} runs, {n} result rows")


def _timed(make) -> float:
    t = time.perf_counter()
    make().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
