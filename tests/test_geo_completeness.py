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
    w_sql = _ring_w_sql(_PAIR_RADIUS_KM)
    got_duck = dict(
        duckdb.connect()
        .execute(
            f"SELECT cx0, {w_sql} AS w FROM ("
            f"    SELECT unnest(generate_series(-8, 7)) AS cx0)"
        )
        .fetchall()
    )
    assert got_spark == got_duck
    # both are injections of the SAME Python-computed literal table
    from ondemand_dask_spark.queries.geo import _ring_widths

    assert got_spark == _ring_widths(_PAIR_RADIUS_KM)
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


# ---- pure-math property: the ring bound itself ----------------------

import math

from hypothesis import given, settings
from hypothesis import strategies as st

_R_EARTH = 6371.0
_CELL = 10
_LON_CELLS = 36
_LAT_MAX = 80.0
_RADIUS = 500.0


def _hav(lat1, lon1, lat2, lon2):
    dphi = math.radians(lat2 - lat1) / 2
    dlmb = math.radians(lon2 - lon1) / 2
    a = math.sin(dphi) ** 2 + math.cos(math.radians(lat1)) * math.cos(
        math.radians(lat2)
    ) * math.sin(dlmb) ** 2
    return 2 * _R_EARTH * math.asin(math.sqrt(min(1.0, a)))


def _w(cx):
    """Python twin of _ring_w_col's formula (same operations)."""
    slack = math.degrees(_RADIUS / _R_EARTH)
    sin_half = math.sin(_RADIUS / (2 * _R_EARTH))
    lat0 = cx * float(_CELL)
    worst_own = min(max(abs(lat0), abs(lat0 + _CELL)), _LAT_MAX)
    worst_partner = min(worst_own + slack, _LAT_MAX)
    ratio = min(
        1.0,
        sin_half
        / math.sqrt(
            math.cos(math.radians(worst_own))
            * math.cos(math.radians(worst_partner))
        ),
    )
    return int(math.floor(math.degrees(2 * math.asin(ratio)) / _CELL) + 1)


@settings(max_examples=2000, deadline=None)
@given(
    lat_a=st.floats(-79.999, 79.999),
    lat_b=st.floats(-79.999, 79.999),
    lon_a=st.floats(-180.0, 179.999),
    lon_b=st.floats(-180.0, 179.999),
)
def test_ring_bound_property(lat_a, lat_b, lon_a, lon_b):
    """For ANY pair within the radius (hypothesis explores the whole
    coordinate domain, including the antimeridian and the |lat| → 80
    regime that broke the original ring): the lat cells differ by at
    most 1, and the MODULAR lon-cell distance is within the replica
    width computed from b's lat cell — i.e. a's home cell is one of
    b's ring replicas, so the join finds the pair."""
    if _hav(lat_a, lon_a, lat_b, lon_b) > _RADIUS:
        return
    cxa, cxb = math.floor(lat_a / _CELL), math.floor(lat_b / _CELL)
    assert abs(cxa - cxb) <= 1
    cya = math.floor(lon_a / _CELL) % _LON_CELLS
    cyb = math.floor(lon_b / _CELL) % _LON_CELLS
    dy = min((cya - cyb) % _LON_CELLS, (cyb - cya) % _LON_CELLS)
    assert dy <= _w(cxb), (lat_a, lon_a, lat_b, lon_b, dy, _w(cxb))


def test_sparsity_whitelisted_query_is_nonempty_at_driver_sf(spark):
    """geo_pairs_within_radius is whitelisted as legitimately empty
    at sf0.001 (tests/test_oracle.py EMPTY_OK_AT_SF0001) on the
    argument that it IS non-empty at the driver's correctness scale —
    check that argument instead of asserting it."""
    import os

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf_dir, "supplier.parquet")):
        pytest.skip("driver-scale fixture not present")
    from ondemand_dask_spark.registry import all_queries

    n = all_queries()["geo_pairs_within_radius"].fn(spark, sf_dir).count()
    assert n > 0, (
        "the sparsity whitelist's justification no longer holds — the "
        "driver's sf0.01 check would be an empty-vs-empty hash"
    )
