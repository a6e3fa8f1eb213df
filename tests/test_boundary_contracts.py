"""Exact-boundary audit of every docstring-declared tie contract
(r11 verdict item 2).

The r11 session-gap finding proved the risk class: a boundary
contract stated in a docstring but never TESTED at the boundary can
silently encode the wrong model of the engine (Spark merged two
events exactly `gap` apart while every oracle split them, for ten
green rounds).  Each test here constructs the exact-boundary fixture
for one declared contract and asserts BOTH things:

1. the semantic outcome the contract promises (so the pin fails if
   either engine's behavior drifts), and
2. Spark-vs-DuckDB agreement through the query's OWN registered
   oracle on the same scratch data (so the pin fails if the two
   engines ever disagree at the edge).

Contracts covered (the session exact-gap contract itself is pinned in
tests/test_fuzz_events_differential.py; the watermark eviction edge
in tests/test_stream_fixture_assumptions.py):

- asof tolerance edge: a match EXACTLY `tolerance` away is KEPT
  (inclusive <=, pandas merge_asof semantics) — operators/asof.py
- time-RANGE frame ends: an event exactly 1 h earlier is IN the
  frame (RANGE ... PRECEDING AND CURRENT ROW is closed) —
  queries/windows.py window_rolling_time
- value-RANGE frame ends: a value exactly ±band away is IN the
  frame — queries/windows.py window_value_range_frame
- interval join endpoints: [o_orderdate, o_orderdate + 60d) —
  start inclusive, end exclusive — queries/joins.py join_interval
- point-in-range join endpoints: [lo, lo + 10min) with the interval
  start/end landing exactly ON a bucket boundary (the replication
  arithmetic's own edge) — operators/rangejoin.py
- interval-overlap join: windows touching end-to-start do NOT
  overlap ([lo, hi) semantics) — queries/joins.py
  join_interval_overlap
- debounce run edges: a run of exactly MIN events is kept, MIN-1
  dropped, and a single interloper splits a run —
  queries/composed.py events_alarm_debounce
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import duckdb
import pytest

from ondemand_dask_spark.registry import all_queries
from tests.compare import assert_results_match

# epoch µs of T0 is an exact multiple of the 600 s bucket width, so
# the range-join fixtures exercise interval bounds ON bucket edges
T0 = datetime(2024, 1, 1, 0, 0, 0)
US = timedelta(microseconds=1)


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _write(spark, sf_dir, table, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, f"{table}.parquet")
    )


def _events(spark, sf_dir, rows):
    """rows: (ts, user_id, event_type, value); ids auto-assigned in
    list order so tie-breaks are deterministic."""
    _write(
        spark,
        sf_dir,
        "events",
        [
            (i, ts, uid, etype, val, None)
            for i, (ts, uid, etype, val) in enumerate(rows, 1)
        ],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )


def _check(spark, sf_dir, q, tables=("events",)):
    """Differential leg: the query's own oracle on the scratch data."""
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{sf_dir}/{t}.parquet/*.parquet')"
        )
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(q.oracle).fetchdf()
    con.close()
    assert_results_match(spark_pdf, oracle_pdf, q.name)
    return spark_pdf


def test_asof_backward_matches_at_exact_timestamp_equality(
    spark, tmp_path, qs
):
    """asof backward is >= (at-or-before): a left row at EXACTLY the
    right row's timestamp must match it — the union-carry
    implementation encodes this as right-sorts-before-left at equal
    `on` (operators/asof.py __prio), declared in a comment and
    pinned here at the boundary.  The view 1 µs EARLIER must not."""
    sf_dir = str(tmp_path)
    _events(spark, sf_dir, [
        (T0 + timedelta(hours=1), 1, "purchase", 1.0),   # event_id 1
        (T0 + timedelta(hours=1), 1, "view", 2.0),       # same µs
        (T0 + timedelta(hours=1) - US, 2, "view", 3.0),  # 1 µs early
        (T0 + timedelta(hours=1), 2, "purchase", 4.0),   # event_id 4
    ])
    out = _check(spark, sf_dir, qs["asof_join_backward"])
    # kept rows (inner): user 1's purchase self-match + the equal-ts
    # view; user 2's view precedes its only purchase -> dropped, the
    # purchase itself self-matches
    rows = {
        (r.event_id, r.purchase_event)
        for r in out.itertuples(index=False)
    }
    assert rows == {(1, 1), (2, 1), (4, 4)}, rows


def test_asof_tolerance_exact_edge_is_matched(spark, tmp_path, qs):
    """Δ == tolerance (1 h) exactly → MATCHED (inclusive <=);
    Δ == tolerance + 1 µs → unmatched."""
    sf_dir = str(tmp_path)
    _events(spark, sf_dir, [
        (T0, 1, "purchase", 1.0),
        (T0 + timedelta(hours=1), 1, "view", 2.0),          # Δ = tol
        (T0, 2, "purchase", 3.0),
        (T0 + timedelta(hours=1) + US, 2, "view", 4.0),     # Δ = tol+1µs
    ])
    out = _check(spark, sf_dir, qs["asof_join_tolerance"])
    # matched rows: both purchases self-match (Δ=0) + user 1's view
    by_user = out.groupby("user_id").size().to_dict()
    assert by_user == {1: 2, 2: 1}, out


def test_time_range_frame_end_is_inclusive(spark, tmp_path, qs):
    """An event exactly 1 h earlier is IN the RANGE frame; one
    microsecond past 1 h is OUT."""
    sf_dir = str(tmp_path)
    _events(spark, sf_dir, [
        (T0, 1, "view", 1.0),
        (T0 + timedelta(hours=1), 1, "view", 2.0),          # Δ = frame
        (T0, 2, "view", 1.0),
        (T0 + timedelta(hours=1) + US, 2, "view", 2.0),     # Δ = frame+1µs
    ])
    out = _check(spark, sf_dir, qs["window_rolling_time"])
    s = {
        (r.user_id, r.event_id): r.sum_1h
        for r in out.itertuples(index=False)
    }
    assert s[(1, 2)] == pytest.approx(3.0)   # inclusive: 1.0 + 2.0
    assert s[(2, 4)] == pytest.approx(2.0)   # exclusive past the edge


def test_value_range_frame_ends_are_inclusive(spark, tmp_path, qs):
    """Values exactly ±band (5.0) apart are in each other's frame;
    anything strictly beyond is not."""
    sf_dir = str(tmp_path)
    _events(spark, sf_dir, [
        (T0, 1, "view", 0.0),
        (T0 + timedelta(seconds=1), 1, "view", 5.0),    # Δv = band
        (T0, 2, "view", 0.0),
        (T0 + timedelta(seconds=1), 2, "view", 5.125),  # Δv > band (exact fp)
    ])
    out = _check(spark, sf_dir, qs["window_value_range_frame"])
    n = {
        (r.user_id, r.event_id): r.n_similar
        for r in out.itertuples(index=False)
    }
    assert n[(1, 1)] == 2 and n[(1, 2)] == 2
    assert n[(2, 3)] == 1 and n[(2, 4)] == 1


def test_interval_join_start_inclusive_end_exclusive(
    spark, tmp_path, qs
):
    """join_interval counts shipments in [orderdate, orderdate+60d):
    shipdate == orderdate counts, == +59d counts, == +60d does not,
    and one day before the order does not."""
    sf_dir = str(tmp_path)
    _write(
        spark, sf_dir, "orders",
        [(1, 1, "O", 100.0, T0, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    )
    li_schema = (
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_shipdate timestamp_ntz"
    )
    _write(
        spark, sf_dir, "lineitem",
        [
            (1, 1, 1.0, 1.0, T0),                          # == start: in
            (1, 2, 1.0, 1.0, T0 + timedelta(days=59)),     # in
            (1, 3, 1.0, 1.0, T0 + timedelta(days=60)),     # == end: out
            (1, 4, 1.0, 1.0, T0 - timedelta(days=1)),      # before: out
        ],
        li_schema,
    )
    out = _check(
        spark, sf_dir, qs["join_interval"],
        tables=("lineitem", "orders"),
    )
    assert out["n_early_ships"].tolist() == [2]


def test_range_join_endpoints_on_bucket_boundary(spark, tmp_path, qs):
    """join_range_bucketed: [lo, lo+10min) with lo EXACTLY on a
    bucket edge (T0's epoch µs is a multiple of the 600 s width) —
    the interval's hi then sits exactly on the next edge, the case
    the replication arithmetic floor((hi-1)/width) exists for.
    Point == lo is in; point == hi is out; hi − 1 µs is in."""
    sf_dir = str(tmp_path)
    assert (int(T0.timestamp()) * 1_000_000) % 600_000_000 == 0
    _events(spark, sf_dir, [
        (T0, 1, "error", 1.0),                              # lo (also a point: in)
        (T0 + timedelta(minutes=10) - US, 2, "view", 2.0),  # hi-1µs: in
        (T0 + timedelta(minutes=10), 3, "view", 3.0),       # == hi: out
        (T0 - US, 4, "view", 4.0),                          # < lo: out
    ])
    out = _check(spark, sf_dir, qs["join_range_bucketed"])
    assert sorted(out["event_id"].tolist()) == [1, 2]
    assert sorted(out["gap_us"].tolist()) == [0, 599_999_999]


def test_interval_overlap_touching_windows_do_not_overlap(
    spark, tmp_path, qs
):
    """join_interval_overlap: [lo, hi) windows touching end-to-start
    (purchase window starts exactly at the error window's hi) do NOT
    overlap; 1 µs of genuine intersection does."""
    sf_dir = str(tmp_path)
    _events(spark, sf_dir, [
        (T0, 1, "error", 1.0),                                 # [T0, T0+10m)
        (T0 + timedelta(minutes=10), 2, "purchase", 2.0),      # touches: out
        (T0 + timedelta(minutes=10) - US, 3, "purchase", 3.0), # 1µs overlap: in
    ])
    out = _check(spark, sf_dir, qs["join_interval_overlap"])
    assert out["pur_id"].tolist() == [3]


def test_dynamic_gap_session_reach_boundary(spark, tmp_path, qs):
    """sessionize_dynamic_gap: the measured PySpark 4.1.2 contract —
    per-event reach ts + gap(event), running-MAX reach, INCLUSIVE
    boundary.  Users: (1) view exactly at the purchase's 1 h reach →
    merged; (2) 1 µs past → split; (3) chained extension across
    mixed gaps → one 4-event session; (4) a later 30 min view must
    NOT shrink the earlier purchase's 1 h reach → merged."""
    sf_dir = str(tmp_path)
    h, m30, m10 = (
        timedelta(hours=1), timedelta(minutes=30), timedelta(minutes=10)
    )
    _events(spark, sf_dir, [
        (T0, 1, "purchase", 1.0), (T0 + h, 1, "view", 1.0),
        (T0, 2, "purchase", 1.0), (T0 + h + US, 2, "view", 1.0),
        (T0, 3, "view", 1.0), (T0 + m30, 3, "view", 1.0),
        (T0 + h, 3, "purchase", 1.0), (T0 + 2 * h, 3, "view", 1.0),
        (T0, 4, "purchase", 1.0), (T0 + m10, 4, "view", 1.0),
        (T0 + h, 4, "view", 1.0),
    ])
    out = _check(spark, sf_dir, qs["sessionize_dynamic_gap"])
    n_by_user = (
        out.sort_values(["user_id", "session_start"])
        .groupby("user_id")["n_events"]
        .apply(list)
        .to_dict()
    )
    assert n_by_user == {1: [2], 2: [1, 1], 3: [4], 4: [3]}, n_by_user


def test_asof_nearest_equidistant_tie_resolves_backward(
    spark, tmp_path, qs
):
    """asof_join_nearest: a left row EXACTLY midway between two
    purchases must take the EARLIER one (ties resolve backward —
    pandas merge_asof semantics, declared in operators/asof.py and
    the query docstring).  Both engines must agree: the Spark side's
    take_b condition is b_age <= f_age; the oracle composes a
    backward and a forward ASOF join and picks per-row with the same
    tie rule."""
    sf_dir = str(tmp_path)
    m10 = timedelta(minutes=10)
    _events(spark, sf_dir, [
        (T0, 1, "purchase", 1.0),            # event_id 1 (earlier)
        (T0 + m10, 1, "view", 2.0),          # exactly midway
        (T0 + 2 * m10, 1, "purchase", 3.0),  # event_id 3 (later)
        # control: strictly nearer forward neighbor wins
        (T0, 2, "purchase", 4.0),            # event_id 4
        (T0 + m10 + US, 2, "view", 5.0),     # nearer to the NEXT
        (T0 + 2 * m10, 2, "purchase", 6.0),  # event_id 6
    ])
    out = _check(spark, sf_dir, qs["asof_join_nearest"])
    near = {
        r.event_id: r.near_event for r in out.itertuples(index=False)
    }
    assert near[2] == 1, near   # tie -> backward (the earlier purchase)
    assert near[5] == 6, near   # strictly nearer forward neighbor


def test_debounce_run_edges(spark, tmp_path, qs):
    """events_alarm_debounce keeps runs of >= 3 (exactly 3 kept,
    2 dropped) and a single interloper SPLITS a run (3+1+1 pattern
    yields no qualifying error run)."""
    sf_dir = str(tmp_path)
    sec = timedelta(seconds=1)
    rows = []
    # user 1: exactly 3 consecutive errors → kept
    rows += [(T0 + i * sec, 1, "error", 1.0) for i in range(3)]
    # user 2: exactly 2 consecutive errors → dropped
    rows += [(T0 + i * sec, 2, "error", 1.0) for i in range(2)]
    # user 3: err,err,view,err,err — the view splits; no run >= 3
    rows += [
        (T0, 3, "error", 1.0),
        (T0 + sec, 3, "error", 1.0),
        (T0 + 2 * sec, 3, "view", 1.0),
        (T0 + 3 * sec, 3, "error", 1.0),
        (T0 + 4 * sec, 3, "error", 1.0),
    ]
    _events(spark, sf_dir, rows)
    out = _check(spark, sf_dir, qs["events_alarm_debounce"])
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.user_id, r.event_type, r.run_len) == (1, "error", 3)
