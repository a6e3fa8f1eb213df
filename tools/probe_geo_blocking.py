"""Scale probe: cell+ring geo blocking as a KEYED (shuffle) join —
the billion-point path behind geo_pairs_within_radius.

The registered query broadcasts the ring table because its input
(supplier) is dimension-sized; past broadcast scale the SAME helper
(`ring_pair_candidates`) runs as a plain equi-join on the cell keys —
each point shuffles to its home cell, ring replicas to their cells,
hash-partitioned, never all-pairs.  This probe synthesizes N
deterministic points (md5-style hash-derived lat/lon, CLUSTERED 80/20
into 256 dense "cities" on a 16×16 world grid so cell skew is
realistic while the intrinsic within-city pair count stays bounded
— see _points) and reports:

  - total possible pairs (n²/2 — what a naive spatial self-join scans)
  - ring candidate pairs (the blocking's actual join volume)
  - verified pairs within the radius (the answer)
  - the largest single cell's population (the skew axis the shuffle
    join must survive; the broadcast form never sees it)
  - wall time

Completeness pin: on a 2k-point subsample the ring candidates must
contain EVERY pair a brute-force O(n²) join finds within the radius.
This assertion is what caught the original fixed 3×3 ring missing
high-latitude and antimeridian pairs (lat 79°, Δlon 23° = 485 km but
2 cells apart) — the bug the adaptive wrap-aware ring in
queries/geo.py now fixes, exhaustively re-pinned in
tests/test_geo_completeness.py.

Usage: python tools/probe_geo_blocking.py [n_points] [radius_km]
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

from ondemand_dask_spark.queries.geo import (  # noqa: E402
    _CELL_DEG,
    _haversine_km,
    ring_pair_candidates,
)
from ondemand_dask_spark.session import build_session  # noqa: E402


_CITIES = 256


def _points(spark, n):
    """Deterministic synthetic points: 80% cluster into {_CITIES}
    dense 'cities' on a 16×16 world grid (hash-jittered ±1.5°), 20%
    spread world-wide across the full |lat| < 80 / lon ±180 domain
    (poles and antimeridian included — the regimes the ring must
    survive).  Within-city pairs are genuinely within the radius, so
    the verified answer scales ~n²/cities — the city count bounds the
    intrinsic output, not a blocking artifact."""
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(2)))
    h3 = F.abs(F.xxhash64(F.col("id"), F.lit(3)))
    city = h3 % _CITIES
    clustered = (F.abs(F.xxhash64(F.col("id"), F.lit(4))) % 10) < 8
    lat = F.when(
        clustered,
        ((city % 16).cast("double") * 9.8 - 77.0)
        + (h1 % 3000) / 1000.0
        - 1.5,
    ).otherwise((h1 % 160000) / 1000.0 - 80.0)
    lon = F.when(
        clustered,
        (F.floor(city / 16).cast("double") * 22.3 - 177.0)
        + (h2 % 3000) / 1000.0
        - 1.5,
    ).otherwise((h2 % 360000) / 1000.0 - 180.0)
    return spark.range(n).select(
        F.col("id").alias("key"), lat.alias("lat"), lon.alias("lon")
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    radius = float(sys.argv[2]) if len(sys.argv) > 2 else 500.0
    spark = build_session(app_name="probe_geo_blocking")
    spark.sparkContext.setLogLevel("ERROR")

    pts = _points(spark, n).cache()
    pts.count()

    # completeness pin: on a 2k subsample, the ring candidates must
    # contain every brute-force pair within the radius (note the
    # brute force uses TRUE haversine on the raw coordinates — the
    # independent oracle the blocking must reproduce)
    sub = pts.filter(F.col("key") % (max(n // 2000, 1)) == 0).cache()
    a, b = sub.alias("a"), sub.alias("b")
    brute = (
        a.join(b, F.col("a.key") < F.col("b.key"))
        .select(
            F.col("a.key").alias("a_key"),
            F.col("b.key").alias("b_key"),
            _haversine_km(
                F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
            ).alias("d"),
        )
        .filter(F.col("d") <= radius)
    )
    ver_s = ring_pair_candidates(sub, radius, broadcast_ring=False).filter(
        F.col("d") <= radius
    )
    missed = brute.join(
        ver_s.select("a_key", "b_key"), ["a_key", "b_key"], "left_anti"
    ).count()
    assert missed == 0, f"ring blocking missed {missed} qualifying pairs"

    t0 = time.perf_counter()
    cand = ring_pair_candidates(pts, radius, broadcast_ring=False)
    n_cand = cand.count()
    n_ver = cand.filter(F.col("d") <= radius).count()
    wall = time.perf_counter() - t0

    cell_pop = (
        pts.groupBy(
            F.floor(F.col("lat") / _CELL_DEG).alias("cx"),
            F.floor(F.col("lon") / _CELL_DEG).alias("cy"),
        )
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    print(
        json.dumps(
            {
                "n_points": n,
                "naive_pairs": n * (n - 1) // 2,
                "ring_candidates": n_cand,
                "verified_within_radius": n_ver,
                "cut_factor": round(n * (n - 1) / 2 / max(n_cand, 1), 1),
                "max_cell_population": cell_pop,
                "subsample_completeness_missed": missed,
                "wall_sec": round(wall, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
