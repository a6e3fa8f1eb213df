"""Hand-computed known answers for the windows tail.

The DuckDB differential proves Spark and DuckDB agree — but both
sides of several window queries are CONSTRUCTED from the same
formula (covar/var slope, value·Δt integral, lerp carries), so a
shared misreading would pass the differential silently (the
mirrored-blocking bug class; see the r8 geo find).  These tests pin
a handful of the windows-tail queries to values computed BY HAND on
tiny constructed event fixtures — a genuinely independent third
algorithm (arithmetic on paper), same discipline as
tests/test_graph_known_answers.py / test_stats_known_answers.py.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from ondemand_dask_spark.registry import all_queries

QUERIES = all_queries()


def _mini_events(tmp_path, rows):
    """rows: list of (event_id, ts_iso, user_id, event_type, value)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_time_weighted_avg_hand_integral(spark, tmp_path):
    """User 7: values 1, 4, 10 at t = 0 s, 10 s, 40 s.  Each value
    holds until the next, the last has no holding interval:
    twa = (1·10 s + 4·30 s) / 40 s = 130/40 = 3.25; span 40 s in
    exact microseconds.  User 8 has a single event → no interval →
    excluded entirely."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", 7, "view", 1.0),
            (2, "2024-01-01 00:00:10", 7, "view", 4.0),
            (3, "2024-01-01 00:00:40", 7, "view", 10.0),
            (4, "2024-01-01 00:00:00", 8, "view", 99.0),
        ],
    )
    got = {
        int(r["user_id"]): (float(r["twa_value"]), int(r["span_us"]))
        for r in QUERIES["window_time_weighted_avg"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {7: (3.25, 40_000_000)}


def test_rolling_slope_hand_ols(spark, tmp_path):
    """User 1, values 1, 3, 2, 8 at positions x = 1..4.  Trailing-10
    OLS slopes by hand: pos 1 → var(x)=0 → NULL; pos 2 → (3−1)/(2−1)
    = 2; pos 3 → Σ(x−x̄)(y−ȳ)=1, Σ(x−x̄)²=2 → 0.5; pos 4 → 10/5 = 2."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "view", 1.0),
            (2, "2024-01-01 00:00:02", 1, "view", 3.0),
            (3, "2024-01-01 00:00:03", 1, "view", 2.0),
            (4, "2024-01-01 00:00:04", 1, "view", 8.0),
        ],
    )
    got = {
        int(r["event_id"]): (
            None if r["roll_slope"] is None else float(r["roll_slope"])
        )
        for r in QUERIES["window_rolling_slope"].fn(spark, sf_dir).collect()
    }
    assert got == {1: None, 2: 2.0, 3: 0.5, 4: 2.0}


def test_interpolate_linear_hand_lerp(spark, tmp_path):
    """The query nulls event_id % 5 == 0 rows and lerps interior
    gaps by POSITION.  User 1: ids 1, 2, 5, 6 at increasing ts →
    id 5 (pos 3) is nulled, neighbors pos 2 (v=20) and pos 4 (v=60)
    → 20 + (60−20)·(3−2)/(4−2) = 40.  User 2 starts with id 10 (nulled,
    LEADING) then id 11 — leading nulls stay NULL; and user 3 ends
    with id 15 (nulled, TRAILING) → stays NULL."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "view", 10.0),
            (2, "2024-01-01 00:00:02", 1, "view", 20.0),
            (5, "2024-01-01 00:00:03", 1, "view", 999.0),  # nulled
            (6, "2024-01-01 00:00:04", 1, "view", 60.0),
            (10, "2024-01-01 00:00:01", 2, "view", 888.0),  # nulled, leading
            (11, "2024-01-01 00:00:02", 2, "view", 7.0),
            (14, "2024-01-01 00:00:01", 3, "view", 5.0),
            (15, "2024-01-01 00:00:02", 3, "view", 777.0),  # nulled, trailing
        ],
    )
    got = {
        int(r["event_id"]): (
            None
            if r["interpolated"] is None
            else float(r["interpolated"])
        )
        for r in QUERIES["window_interpolate_linear"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {
        1: 10.0, 2: 20.0, 5: 40.0, 6: 60.0,
        10: None, 11: 7.0,
        14: 5.0, 15: None,
    }


def test_pct_change_zero_prev_yields_null(spark, tmp_path):
    """User 1, values 2, 4, 0, 5: pct = NULL (first), 1.0, −1.0,
    NULL (previous value exactly 0 — the nullif guard both engines
    share, pinned here against an independent hand computation)."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "view", 2.0),
            (2, "2024-01-01 00:00:02", 1, "view", 4.0),
            (3, "2024-01-01 00:00:03", 1, "view", 0.0),
            (4, "2024-01-01 00:00:04", 1, "view", 5.0),
        ],
    )
    got = {
        int(r["event_id"]): (
            None if r["pct_change"] is None else float(r["pct_change"])
        )
        for r in QUERIES["window_pct_change"].fn(spark, sf_dir).collect()
    }
    assert got == {1: None, 2: 1.0, 3: -1.0, 4: None}


def test_distinct_expanding_hand_count(spark, tmp_path):
    """User 1 touches types a, a, b, a, c in order → running distinct
    type counts 1, 1, 2, 2, 3."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "a", 1.0),
            (2, "2024-01-01 00:00:02", 1, "a", 1.0),
            (3, "2024-01-01 00:00:03", 1, "b", 1.0),
            (4, "2024-01-01 00:00:04", 1, "a", 1.0),
            (5, "2024-01-01 00:00:05", 1, "c", 1.0),
        ],
    )
    got = {
        int(r["event_id"]): int(r["types_seen"])
        for r in QUERIES["window_distinct_expanding"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3}


def test_cusum_drift_hand_recurrence(spark, tmp_path):
    """User 1, values 60, 30, 100, 40 vs target 50: the literal
    recurrence S_i = max(0, S_{i−1} + (x_i − 50)) gives 10, 0, 50,
    40; alarm (>120) never fires.  Independent of the reflection
    identity both engines implement (tests/test_cusum_identity.py
    proves the identity; this pins concrete values)."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "view", 60.0),
            (2, "2024-01-01 00:00:02", 1, "view", 30.0),
            (3, "2024-01-01 00:00:03", 1, "view", 100.0),
            (4, "2024-01-01 00:00:04", 1, "view", 40.0),
        ],
    )
    got = {
        int(r["event_id"]): (float(r["cusum"]), bool(r["alarm"]))
        for r in QUERIES["window_cusum_drift"].fn(spark, sf_dir).collect()
    }
    # hand recurrence: 0+10=10; 10-20=-10→0; 0+50=50; 50-10=40
    assert got == {
        1: (10.0, False), 2: (0.0, False),
        3: (50.0, False), 4: (40.0, False),
    }
    # and an alarm case: a run of +50 excesses crosses 120 on step 3
    sf_dir2 = _mini_events(
        tmp_path.joinpath("alarm"),
        [
            (1, "2024-01-01 00:00:01", 9, "view", 100.0),
            (2, "2024-01-01 00:00:02", 9, "view", 100.0),
            (3, "2024-01-01 00:00:03", 9, "view", 100.0),
        ],
    )
    got2 = {
        int(r["event_id"]): (float(r["cusum"]), bool(r["alarm"]))
        for r in QUERIES["window_cusum_drift"].fn(spark, sf_dir2).collect()
    }
    assert got2 == {1: (50.0, False), 2: (100.0, False), 3: (150.0, True)}


def test_nth_first_last_hand_picks(spark, tmp_path):
    """User 1 values 7, 3, 9, 5 in ts order → every row broadcasts
    first=7, third=9, last=5 over the FULL-partition frame (the
    growing-frame default would have made last_v the current row —
    the exact trap the query pins).  User 2 has only 2 rows →
    third_v NULL."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "v", 7.0),
            (2, "2024-01-01 00:00:02", 1, "v", 3.0),
            (3, "2024-01-01 00:00:03", 1, "v", 9.0),
            (4, "2024-01-01 00:00:04", 1, "v", 5.0),
            (6, "2024-01-01 00:00:01", 2, "v", 2.0),
            (7, "2024-01-01 00:00:02", 2, "v", 8.0),
        ],
    )
    got = {
        int(r["event_id"]): (
            float(r["first_v"]),
            None if r["third_v"] is None else float(r["third_v"]),
            float(r["last_v"]),
        )
        for r in QUERIES["window_nth_first_last"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {
        1: (7.0, 9.0, 5.0), 2: (7.0, 9.0, 5.0),
        3: (7.0, 9.0, 5.0), 4: (7.0, 9.0, 5.0),
        6: (2.0, None, 8.0), 7: (2.0, None, 8.0),
    }


def test_fill_forward_backward_hand_carries(spark, tmp_path):
    """The query nulls event_id % 5 == 0.  User 1 (ids 1, 2, 5, 6):
    id 5 carries 20 forward and 60 backward.  User 2 starts with the
    nulled id 10: ffill has nothing to carry (NULL), bfill carries 7
    back."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "v", 10.0),
            (2, "2024-01-01 00:00:02", 1, "v", 20.0),
            (5, "2024-01-01 00:00:03", 1, "v", 999.0),  # nulled
            (6, "2024-01-01 00:00:04", 1, "v", 60.0),
            (10, "2024-01-01 00:00:01", 2, "v", 888.0),  # nulled, leading
            (11, "2024-01-01 00:00:02", 2, "v", 7.0),
        ],
    )
    got = {
        int(r["event_id"]): (
            None if r["ffilled"] is None else float(r["ffilled"]),
            None if r["bfilled"] is None else float(r["bfilled"]),
        )
        for r in QUERIES["window_fill_forward"].fn(spark, sf_dir).collect()
    }
    assert got == {
        1: (10.0, 10.0), 2: (20.0, 20.0), 5: (20.0, 60.0), 6: (60.0, 60.0),
        10: (None, 7.0), 11: (7.0, 7.0),
    }


def test_rolling_corr_hand_extremes(spark, tmp_path):
    """The companion series is m = event_id % 97.  User 1's values
    10, 20, 30 at ids 1, 2, 3 are perfectly linear in m → corr +1
    from the second row on (first row: zero-variance frame → NULL).
    User 2's values 10, 5 at ids 4, 5 are perfectly anti-linear →
    corr −1 at the second row."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "v", 10.0),
            (2, "2024-01-01 00:00:02", 1, "v", 20.0),
            (3, "2024-01-01 00:00:03", 1, "v", 30.0),
            (4, "2024-01-01 00:00:01", 2, "v", 10.0),
            (5, "2024-01-01 00:00:02", 2, "v", 5.0),
        ],
    )
    got = {
        int(r["event_id"]): (
            None if r["roll_corr"] is None else float(r["roll_corr"])
        )
        for r in QUERIES["window_rolling_corr"].fn(spark, sf_dir).collect()
    }
    assert got == {1: None, 2: 1.0, 3: 1.0, 4: None, 5: -1.0}


def test_seasonal_zscore_hand_weekday_groups(spark, tmp_path):
    """Three Mondays totalling 10, 10, 22 → same-dow profile μ=14,
    σ=√48, z = ±{8,4}/√48 by hand; two identical Tuesdays (σ=0) pin
    the zero-variance weekday to z NULL with the anomaly flag
    coalesced to False."""
    import math

    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 12:00:00", 1, "view", 10.0),  # Monday
            (2, "2024-01-08 12:00:00", 1, "view", 10.0),  # Monday
            (3, "2024-01-15 12:00:00", 1, "view", 22.0),  # Monday
            (4, "2024-01-02 12:00:00", 1, "view", 5.0),   # Tuesday
            (5, "2024-01-09 12:00:00", 1, "view", 5.0),   # Tuesday
        ],
    )
    got = {
        str(r["d"])[:10]: (
            float(r["x"]),
            int(r["n_same_dow"]),
            None if r["seasonal_z"] is None else float(r["seasonal_z"]),
            bool(r["anomaly"]),
        )
        for r in QUERIES["ts_seasonal_zscore"].fn(spark, sf_dir).collect()
    }
    s = math.sqrt(48)
    assert got["2024-01-01"] == (10.0, 3, round(-4 / s - 1e-9, 4), False)
    assert got["2024-01-08"] == (10.0, 3, round(-4 / s - 1e-9, 4), False)
    assert got["2024-01-15"] == (22.0, 3, round(8 / s - 1e-9, 4), False)
    assert got["2024-01-02"] == (5.0, 2, None, False)
    assert got["2024-01-09"] == (5.0, 2, None, False)
