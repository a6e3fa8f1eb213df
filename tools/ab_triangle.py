"""A/B: triangle census intersection strategy (r8 verdict item 5).

Variant A (shipped): attach per-node out-adjacency ARRAYS to both
endpoints of every oriented edge and intersect with the codegen'd
`array_intersect` — per-edge cost O(|adj(lo)|+|adj(hi)|) inside one
fused JVM stage, no extra shuffle beyond the two adjacency-attach
joins.

Variant B (challenger): EXPLODE the lo-side adjacency into
(lo, hi, w) wedge rows and sort-merge/hash-join them against the
oriented edge set on (hi, w) — the membership test as a relational
join instead of an in-row intersection.  Same orientation, same
census semantics (each match contributes 1 to lo, hi, and w), but
the wedge rows materialize through a shuffle (sum over edges of
outdeg(lo) rows ≈ tens of millions at sf0.1) instead of staying
packed in arrays.

Both variants run the full per-node census to the same noop sink in
ONE fresh session (A/B adjacency discipline: warm-up + best-of-3
each, interleaved order A B A B ... so host drift hits both), with
the CPU calibration recorded.  Run exclusively:

    python tools/ab_triangle.py [sf_dir] [runs]
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


def census_exploded(spark, sf_dir: str):
    """Variant B: the identical orientation + adjacency build as
    graph_triangle_count, but the intersection as an exploded wedge
    join (see module docstring)."""
    from ondemand_dask_spark.operators.rank import global_row_numbers
    from ondemand_dask_spark.queries.graph import _family_edges, _sym

    edges = _family_edges(spark, sf_dir, cached_default=False).cache()
    sym = _sym(edges)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    rnk = global_row_numbers(deg, "d", "node", col_name="r").select(
        "node", "r"
    )
    ru = F.broadcast(rnk).alias("ru")
    rv = F.broadcast(rnk).alias("rv")
    oriented = (
        edges.alias("s")
        .join(ru, F.col("ru.node") == F.col("s.src"))
        .join(rv, F.col("rv.node") == F.col("s.dst"))
        .select(
            F.when(F.col("ru.r") < F.col("rv.r"), F.col("s.src"))
            .otherwise(F.col("s.dst"))
            .alias("lo"),
            F.when(F.col("ru.r") < F.col("rv.r"), F.col("s.dst"))
            .otherwise(F.col("s.src"))
            .alias("hi"),
        )
        .cache()
    )
    edges.count()
    oriented.count()
    adj = oriented.groupBy(F.col("lo").alias("node")).agg(
        F.collect_list("hi").alias("nbrs")
    )
    # wedges anchored at the low-rank endpoint: (lo, hi, w in adj(lo))
    wedges = oriented.join(
        adj.select(F.col("node").alias("lo"), F.col("nbrs").alias("na")),
        "lo",
    ).select("lo", "hi", F.explode("na").alias("w"))
    # membership test as a join: (hi -> w) must be an oriented edge
    tri = wedges.join(
        oriented.select(
            F.col("lo").alias("hi"), F.col("hi").alias("w")
        ),
        ["hi", "w"],
    )
    return (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("lo").alias("node")),
                    F.struct(F.col("hi").alias("node")),
                    F.struct(F.col("w").alias("node")),
                )
            ).alias("x")
        )
        .select("x.node")
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab_triangle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(1_000_000_000).selectExpr(
            "sum(CAST(id AS DOUBLE) * id) AS s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calib()
    cpu = round(min(calib() for _ in range(3)), 4)

    def run_a() -> float:
        evict_all_retained()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs["graph_triangle_count"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    def run_b() -> float:
        evict_all_retained()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        census_exploded(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # equality pin first: both strategies must produce the identical
    # census (sorted rows) before any timing is worth reading
    a_rows = sorted(
        map(tuple, qs["graph_triangle_count"].fn(spark, sf_dir).collect())
    )
    b_rows = sorted(map(tuple, census_exploded(spark, sf_dir).collect()))
    assert a_rows == b_rows, (
        f"strategy mismatch: {len(a_rows)} vs {len(b_rows)} rows"
    )
    print(f"equality pin: {len(a_rows)} census rows identical",
          file=sys.stderr)

    run_a(), run_b()  # warm both
    ta, tb = [], []
    for _ in range(runs):  # interleaved so drift hits both
        ta.append(round(run_a(), 4))
        tb.append(round(run_b(), 4))
    out = {
        "calib_sec": cpu,
        "array_intersect_best": min(ta),
        "array_intersect_all": ta,
        "exploded_join_best": min(tb),
        "exploded_join_all": tb,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
