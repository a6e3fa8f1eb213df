"""Completeness pins for the cell+ring geo blocking.

tools/probe_geo_blocking.py's brute-force pin caught the original
fixed 3×3 ring missing qualifying pairs (antimeridian wrap; high
latitude where 10° of longitude is shorter than the 500 km radius).
These tests re-pin the fix at unit scale:

1. the adaptive ring width is computed identically by Spark and the
   DuckDB oracle for EVERY lat cell (the input domain is 16 integer
   cells, so the check is exhaustive — no float-boundary roulette);
2. constructed boundary pairs (antimeridian straddle, lat-79°
   2-cells-apart, and a just-outside control) land exactly as the
   true haversine says;
3. a 400-point hash-scattered cloud matches a brute-force O(n²)
   join pair-for-pair.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ondemand_dask_spark.queries.geo import (
    _PAIR_RADIUS_KM,
    _ring_w_col,
    _ring_w_sql,
    _haversine_km,
    ring_pair_candidates,
)


def test_ring_width_identical_on_both_engines_for_every_lat_cell(spark):
    cells = list(range(-8, 8))  # lat ∈ [-80, 80) at 10° cells
    got_spark = {
        r["cx0"]: r["w"]
        for r in spark.createDataFrame([(c,) for c in cells], ["cx0"])
        .select("cx0", _ring_w_col(F.col("cx0"), _PAIR_RADIUS_KM).alias("w"))
        .collect()
    }
    wlat_sql, w_sql = _ring_w_sql(_PAIR_RADIUS_KM)
    got_duck = dict(
        duckdb.connect()
        .execute(
            f"SELECT cx0, {w_sql} AS w FROM ("
            f"  SELECT cx0, {wlat_sql} AS wlat FROM ("
            f"    SELECT unnest(generate_series(-8, 7)) AS cx0))"
        )
        .fetchall()
    )
    assert got_spark == got_duck
    # physics sanity: 1 cell suffices below ~56° lat, widens toward
    # the 80° bound, and stays bounded
    assert got_spark[0] == 1 and got_spark[-1] == 1
    assert got_spark[7] >= 3 and got_spark[-8] >= 3
    assert max(got_spark.values()) <= 4


@pytest.mark.parametrize(
    "pair, within",
    [
        # antimeridian straddle: ~22 km apart but in lon cells 17 / 18
        (((0.0, 179.9), (0.0, -179.9)), True),
        # the bug case: lat 79, Δlon 23° = ~485 km but 2 lon cells apart
        (((79.0, 0.5), (79.0, 23.5)), True),
        # control just outside the radius at the same latitude
        (((79.0, 0.5), (79.0, 26.5)), False),
        # ordinary mid-latitude neighbors across a cell edge
        (((40.0, 9.9), (40.0, 10.1)), True),
        # same cell but far apart in latitude — excluded by distance
        (((71.0, 5.0), (79.9, 5.0)), False),
    ],
)
def test_boundary_pairs_land_exactly_as_haversine_says(spark, pair, within):
    (lat_a, lon_a), (lat_b, lon_b) = pair
    pts = spark.createDataFrame(
        [(1, lat_a, lon_a), (2, lat_b, lon_b)], ["key", "lat", "lon"]
    )
    got = (
        ring_pair_candidates(pts, _PAIR_RADIUS_KM)
        .filter(F.col("d") <= _PAIR_RADIUS_KM)
        .count()
    )
    assert got == (1 if within else 0)


def test_scattered_cloud_matches_brute_force(spark):
    """400 hash-scattered points over the full domain (|lat| < 80,
    lon ±180): blocked-and-refined pairs == brute-force pairs."""
    pts = (
        spark.range(400)
        .select(
            F.col("id").alias("key"),
            ((F.abs(F.xxhash64("id", F.lit(1))) % 160000) / 1000.0 - 80.0).alias(
                "lat"
            ),
            ((F.abs(F.xxhash64("id", F.lit(2))) % 360000) / 1000.0 - 180.0).alias(
                "lon"
            ),
        )
        .cache()
    )
    blocked = {
        (r.a_key, r.b_key)
        for r in ring_pair_candidates(pts, _PAIR_RADIUS_KM)
        .filter(F.col("d") <= _PAIR_RADIUS_KM)
        .collect()
    }
    a, b = pts.alias("a"), pts.alias("b")
    brute = {
        (r.a_key, r.b_key)
        for r in a.join(b, F.col("a.key") < F.col("b.key"))
        .select(
            F.col("a.key").alias("a_key"),
            F.col("b.key").alias("b_key"),
            _haversine_km(
                F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
            ).alias("d"),
        )
        .filter(F.col("d") <= _PAIR_RADIUS_KM)
        .collect()
    }
    assert blocked == brute
    assert len(brute) > 0  # the check is vacuous on an empty answer
