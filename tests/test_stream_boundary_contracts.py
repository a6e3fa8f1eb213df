"""Exact-boundary pins for the STREAMING jobs' window edges (r12
verdict item 5 — the streaming extension of
tests/test_boundary_contracts.py's batch pins).

Method identical to the r12 batch audit: a constructed micro-fixture
places events EXACTLY on each contract edge, both engines (the
streaming job and its batch/oracle analogue) must agree, and the
measured Spark semantics is pinned so it can never silently drift:

- tumbling window end: `window(ts, '1 hour')` is [start, end) — an
  event at exactly 10:00:00.000000 opens the 10:00 window (both the
  streaming engine and DuckDB's `date_trunc('hour')` oracle);
- session inactivity gap: INCLUSIVE on the streaming engine too —
  two events exactly `gap` apart MERGE (the r12 tie contract,
  SURVEY §0.5.7), one microsecond more splits;
- dedup watermark horizon: `dropDuplicatesWithinWatermark` state
  eviction LAGS the watermark by one micro-batch (the watermark used
  by batch N is computed from data through batch N-1), so a
  duplicate arriving in the first batch after the watermark passed
  its expiry is still dropped, and one arriving after a further
  spacer batch is re-emitted — the at-least-once boundary a
  downstream exactly-once consumer must tolerate;
- dynamic-gap session (streaming analogue of
  `sessionize_dynamic_gap`): an event landing exactly ON the prior
  event's reach (prev_ts + prev_gap) merges and EXTENDS the reach
  with its own gap — Spark merges overlapping-or-touching
  [ts, ts+gap] intervals, the same running-max-reach contract the
  batch form pins at test_boundary_contracts.py;
- sliding windows: exactly width/slide memberships per event, window
  ends exclusive at the slide edge too;
- stream-stream interval join (r13 verdict item 6): both range
  endpoints inclusive exactly as written (purchase_ts >= view_ts and
  <= view_ts + 1h — a purchase at exactly +1h matches, +1h+1µs does
  not), buffered state matches ACROSS micro-batches, and — the
  interval-join analogue of the dedup eviction-lag edge, measured —
  state eviction LAGS the watermark by one micro-batch: a late
  purchase in the first batch past its view's join horizon still
  probes live state and emits the pair (toward the batch answer),
  while after a further spacer batch the view's state is gone and
  the raw-predicate match is LOST (away from the batch answer — the
  divergence bound that keeps join state finite);
- dual-source union dedup (r13 verdict item 6): the watermark is
  measured on the UNION (one watermark operator after unionByName),
  so a fast feed alone advances it, and a feed lagging past the
  horizon has its rows dropped as late — the exactly-once repair's
  guarantee window is the watermark delay measured against the
  FASTEST feed, the operational bound a multi-region landing
  topology must monitor.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

from ondemand_dask_spark.streaming.jobs import (
    read_events_stream,
    run_to_table,
    session_agg,
    tumbling_agg,
    view_purchase_pairs,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def TS(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def write_batches(spark, base: str, batches) -> str:
    """One parquet FILE per micro-batch, lexicographic arrival order
    (the file-source replays them in order under
    maxFilesPerTrigger=1)."""
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    tmp = os.path.join(base, "_tmp")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.copy(src, os.path.join(base, f"{i:03d}.parquet"))
    shutil.rmtree(tmp)
    return base


def test_tumbling_window_end_is_exclusive(spark, tmp_path):
    """[start, end): 09:59:59.999999 is the last µs of the 09:00
    window; 10:00:00.000000 exactly opens the 10:00 window.  The
    batch oracle (date_trunc('hour')) truncates identically, so the
    registered stream_tumbling_agg differential holds AT the edge."""
    d = write_batches(
        spark,
        str(tmp_path / "tumble"),
        [[
            (1, TS("2024-01-01 09:59:59.999999"), 1, "view", 1.0, "{}"),
            (2, TS("2024-01-01 10:00:00.000000"), 1, "view", 2.0, "{}"),
        ]],
    )
    out = run_to_table(
        spark,
        tumbling_agg(read_events_stream(spark, directory=d)),
        "pin_tumbling_edge",
        "complete",
    )
    rows = {r["w_start"]: (r["n"], r["total_value"]) for r in out.collect()}
    assert rows == {
        TS("2024-01-01 09:00:00"): (1, 1.0),
        TS("2024-01-01 10:00:00"): (1, 2.0),
    }


def test_streaming_session_gap_is_inclusive_at_exactly_gap(spark, tmp_path):
    """The r12 tie contract on the STREAMING engine: 30:00.000000
    apart merges, 30:00.000001 splits — byte-identical to the batch
    sessionize_gap contract all four session forms share."""
    d = write_batches(
        spark,
        str(tmp_path / "sess"),
        [[
            (1, TS("2024-01-01 09:00:00"), 1, "view", 1.0, "{}"),
            (2, TS("2024-01-01 09:30:00"), 1, "view", 1.0, "{}"),
            (3, TS("2024-01-01 11:00:00"), 2, "view", 1.0, "{}"),
            (4, TS("2024-01-01 11:30:00.000001"), 2, "view", 1.0, "{}"),
        ]],
    )
    out = run_to_table(
        spark,
        session_agg(read_events_stream(spark, directory=d)),
        "pin_session_edge",
        "complete",
    )
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in out.collect()
    )
    assert got == [
        (1, TS("2024-01-01 09:00:00"), 2),  # exactly gap ⇒ ONE session
        (2, TS("2024-01-01 11:00:00"), 1),  # gap + 1µs ⇒ split
        (2, TS("2024-01-01 11:30:00.000001"), 1),
    ]


def _run_dedup(spark, directory: str):
    e = read_events_stream(spark, directory=directory, max_files_per_trigger=1)
    dd = (
        e.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts")
    )
    name = f"pin_dedup_{os.path.basename(directory)}"
    return sorted(
        (r["event_id"], r["ts"])
        for r in run_to_table(spark, dd, name, "append").collect()
    )


def test_dedup_watermark_drops_duplicate_one_batch_past_horizon(
    spark, tmp_path
):
    """State eviction lags the watermark by one micro-batch: the
    watermark a batch runs under comes from data through the PREVIOUS
    batch, and expired state is swept at batch end — so a duplicate
    arriving in the same batch that first runs past its expiry
    (id=1's expiry 10:10 < watermark 10:30 here) is still matched
    against live state and dropped.  'Within the watermark' is the
    GUARANTEE floor, not the eviction instant."""
    d = write_batches(
        spark,
        str(tmp_path / "dedup_lag"),
        [
            [(1, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            # advances the watermark to 10:30 (past id=1's 10:10 expiry)
            [(9, TS("2024-01-01 10:40:00"), 3, "view", 1.0, "{}")],
            # duplicate id=1 in the very next batch: still dropped
            [(1, TS("2024-01-01 10:41:00"), 1, "view", 1.0, "{}")],
        ],
    )
    assert _run_dedup(spark, d) == [
        (1, TS("2024-01-01 10:00:00")),
        (9, TS("2024-01-01 10:40:00")),
    ]


def test_dedup_watermark_readmits_duplicate_after_state_eviction(
    spark, tmp_path
):
    """With a spacer batch between the watermark advance and the
    duplicate's return, eviction has run (10:30 > id=1's 10:10
    expiry) and the same event_id is emitted AGAIN — the documented
    at-least-once edge of dropDuplicatesWithinWatermark that the
    oracle contract in stream_dedup_watermark's docstring declares
    out of its fixture envelope."""
    d = write_batches(
        spark,
        str(tmp_path / "dedup_evict"),
        [
            [(1, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            [(9, TS("2024-01-01 10:40:00"), 3, "view", 1.0, "{}")],
            [(8, TS("2024-01-01 10:42:00"), 3, "view", 1.0, "{}")],  # spacer
            [(1, TS("2024-01-01 10:43:00"), 1, "view", 1.0, "{}")],
        ],
    )
    assert _run_dedup(spark, d) == [
        (1, TS("2024-01-01 10:00:00")),
        (1, TS("2024-01-01 10:43:00")),  # re-admitted: state was evicted
        (8, TS("2024-01-01 10:42:00")),
        (9, TS("2024-01-01 10:40:00")),
    ]


def test_streaming_dynamic_gap_session_reach_boundary(spark, tmp_path):
    """session_window with a gap EXPRESSION (CalendarIntervalType):
    user 1's purchase at 09:00 carries a 60-min gap (reach 10:00); a
    view landing EXACTLY at 10:00 merges (inclusive reach — same tie
    contract as the fixed gap) and extends the reach with its OWN
    30-min gap to 10:30; a view exactly at 10:30 merges again — the
    running-max-reach contract the batch sessionize_dynamic_gap pins
    at test_boundary_contracts.py.  User 2: reach + 1µs splits."""
    d = write_batches(
        spark,
        str(tmp_path / "dyn"),
        [[
            (1, TS("2024-01-01 09:00:00"), 1, "purchase", 1.0, "{}"),
            (2, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
            (3, TS("2024-01-01 10:30:00"), 1, "view", 1.0, "{}"),
            (4, TS("2024-01-01 09:00:00"), 2, "view", 1.0, "{}"),
            (5, TS("2024-01-01 09:30:00.000001"), 2, "view", 1.0, "{}"),
        ]],
    )
    # make_interval, not INTERVAL literals: session_window's dynamic
    # gap must be CalendarIntervalType (a DayTimeIntervalType literal
    # is rejected with AnalysisException on Spark 4.1)
    gap = F.when(
        F.col("event_type") == "purchase",
        F.expr("make_interval(0,0,0,0,0,60,0)"),
    ).otherwise(F.expr("make_interval(0,0,0,0,0,30,0)"))
    e = read_events_stream(spark, directory=d)
    sess = (
        e.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
        .select("user_id", "session_start", "n_events")
    )
    out = run_to_table(spark, sess, "pin_dyn_gap", "complete")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in out.collect()
    )
    assert got == [
        (1, TS("2024-01-01 09:00:00"), 3),  # both exact-reach merges
        (2, TS("2024-01-01 09:00:00"), 1),
        (2, TS("2024-01-01 09:30:00.000001"), 1),  # reach + 1µs splits
    ]


def test_stream_stream_join_interval_edges_and_cross_batch_state(
    spark, tmp_path
):
    """The stream-stream join's range bound is inclusive at BOTH
    endpoints exactly as the predicate is written — a purchase at
    exactly view_ts matches (>=), one at exactly view_ts + 1 HOUR
    matches (<=), one microsecond past does not — and the match fires
    even though the view arrived a micro-batch EARLIER than every
    purchase: the view is buffered in join state across batches (the
    whole point of the watermark + range-condition pair).  The DuckDB
    oracle registered on stream_stream_join carries the identical
    inclusive endpoints, so the differential holds AT both edges."""
    d = write_batches(
        spark,
        str(tmp_path / "ssj_edges"),
        [
            [(1, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            [
                # exactly view_ts: matches (purchase_ts >= view_ts)
                (2, TS("2024-01-01 10:00:00"), 1, "purchase", 1.0, "{}"),
                # exactly view_ts + 1h: matches (<= inclusive)
                (3, TS("2024-01-01 11:00:00"), 1, "purchase", 1.0, "{}"),
                # one microsecond past the hour: out
                (4, TS("2024-01-01 11:00:00.000001"), 1, "purchase", 1.0, "{}"),
            ],
        ],
    )
    joined = view_purchase_pairs(
        read_events_stream(spark, directory=d, max_files_per_trigger=1)
    )
    out = run_to_table(spark, joined, "pin_ssj_edges", "append")
    got = sorted((r["view_id"], r["purchase_id"]) for r in out.collect())
    assert got == [(1, 2), (1, 3)]


def test_stream_stream_join_eviction_lags_by_one_batch(spark, tmp_path):
    """The interval-join analogue of the dedup eviction-lag pair of
    pins, measured on Spark 4.1.2: state eviction and late-input
    handling both LAG the watermark by one micro-batch.

    A purchase arriving in the FIRST batch after the watermark passed
    its view's join horizon (batch 3 runs under watermark 18:30,
    computed from batch 2's maxima: min(view 20:00 - 1h, purchase
    20:30 - 2h)) still PROBES the buffered view state — V1 is swept
    only at that batch's end — and the raw-predicate pair (1, 4) IS
    emitted, 8 hours past the horizon.  That lag is benign for the
    registered differential: the batch/DuckDB oracle contains the
    same pair, so the lag edge moves the stream TOWARD the batch
    answer, never away from it."""
    d = write_batches(
        spark,
        str(tmp_path / "ssj_lag"),
        [
            [(1, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            [
                (2, TS("2024-01-01 20:00:00"), 2, "view", 1.0, "{}"),
                (3, TS("2024-01-01 20:30:00"), 2, "purchase", 1.0, "{}"),
            ],
            # one batch past the horizon: still matches (lag edge)
            [(4, TS("2024-01-01 10:30:00"), 1, "purchase", 1.0, "{}")],
        ],
    )
    joined = view_purchase_pairs(
        read_events_stream(spark, directory=d, max_files_per_trigger=1)
    )
    out = run_to_table(spark, joined, "pin_ssj_lag", "append")
    got = sorted((r["view_id"], r["purchase_id"]) for r in out.collect())
    assert got == [(1, 4), (2, 3)]


def test_stream_stream_join_drops_match_after_state_eviction(
    spark, tmp_path
):
    """With a spacer batch between the watermark advance and the late
    purchase (the dedup readmit test's construction), eviction HAS
    run by the time the purchase arrives: V1 (view_ts 10:00) is far
    below the state watermark derived from the purchase-side
    watermark minus the 1-hour range bound, so its state is gone and
    the raw-predicate match (1, 5) is NOT emitted.  This is the
    divergence-from-batch edge — the bound that keeps join state
    finite at scale — and the reason the registered query's
    exactness contract rides on its single-batch replay (pinned in
    test_stream_fixture_assumptions.py): a multi-batch replay whose
    feed lags past the watermark horizon plus one batch LOSES pairs
    the batch oracle keeps."""
    d = write_batches(
        spark,
        str(tmp_path / "ssj_evict"),
        [
            [(1, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            [
                (2, TS("2024-01-01 20:00:00"), 2, "view", 1.0, "{}"),
                (3, TS("2024-01-01 20:30:00"), 2, "purchase", 1.0, "{}"),
            ],
            # spacer: eviction runs at this batch's end (V1 swept)
            [(4, TS("2024-01-01 20:40:00"), 3, "purchase", 1.0, "{}")],
            # two batches past the horizon: state gone, no pair
            [(5, TS("2024-01-01 10:30:00"), 1, "purchase", 1.0, "{}")],
        ],
    )
    joined = view_purchase_pairs(
        read_events_stream(spark, directory=d, max_files_per_trigger=1)
    )
    out = run_to_table(spark, joined, "pin_ssj_evict", "append")
    got = sorted((r["view_id"], r["purchase_id"]) for r in out.collect())
    assert got == [(2, 3)]


def test_union_dedup_watermark_is_measured_on_the_union(spark, tmp_path):
    """stream_union_dual_source's exactly-once repair: ONE watermark
    operator sits after unionByName, so the fastest feed alone
    advances it — and a feed lagging past the watermark horizon has
    its rows dropped as LATE (never re-emitted, never re-deduped).
    Feed A's original id=7 lands in batch 0 (feed B's same-batch
    overlap copy is deduped); A then advances the union watermark to
    11:50; B's replay of id=7 (ts 10:00) arrives two batches later —
    below the union watermark, so it is dropped as late input rather
    than re-admitted (contrast the single-source readmit pin above,
    where the duplicate's ts sat ABOVE the watermark).  Operational
    contract this pins: duplicate repair is exactly-once only while
    feed lag stays inside the watermark delay measured against the
    FASTEST feed; beyond it, overlap rows vanish (at-most-once), so
    feed lag must be monitored against the delay."""
    da = write_batches(
        spark,
        str(tmp_path / "union_a"),
        [
            [(7, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            [(50, TS("2024-01-01 12:00:00"), 3, "view", 1.0, "{}")],
            [(51, TS("2024-01-01 12:01:00"), 3, "view", 1.0, "{}")],
        ],
    )
    db = write_batches(
        spark,
        str(tmp_path / "union_b"),
        [
            # same-batch overlap copy of id=7: deduped by state
            [(7, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
            [(8, TS("2024-01-01 10:05:00"), 2, "view", 1.0, "{}")],
            # B replays id=7 after A pushed the union watermark past
            # it: late, dropped — NOT a duplicate, NOT re-admitted
            [(7, TS("2024-01-01 10:00:00"), 1, "view", 1.0, "{}")],
        ],
    )
    a = read_events_stream(spark, directory=da, max_files_per_trigger=1)
    b = read_events_stream(spark, directory=db, max_files_per_trigger=1)
    u = (
        a.unionByName(b)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts")
    )
    out = run_to_table(spark, u, "pin_union_wm", "append")
    got = sorted(r["event_id"] for r in out.collect())
    assert got == [7, 8, 50, 51]


def test_sliding_window_membership_at_exact_slide_boundary(spark, tmp_path):
    """window('1 hour', '30 minutes'): every event lands in exactly
    TWO windows, and window ends are exclusive there too — an event
    at exactly 10:00:00.000000 belongs to the [09:30, 10:30) and
    [10:00, 11:00) windows, NOT [09:00, 10:00), while one microsecond
    earlier belongs to [09:00, 10:00) and [09:30, 10:30).  The
    registered stream_sliding_agg oracle materializes the same two
    floor(epoch/1800) bucket starts per event, so the differential
    holds AT the slide edge."""
    d = write_batches(
        spark,
        str(tmp_path / "slide"),
        [[
            (1, TS("2024-01-01 09:59:59.999999"), 1, "view", 1.0, "{}"),
            (2, TS("2024-01-01 10:00:00.000000"), 1, "buy", 2.0, "{}"),
        ]],
    )
    e = read_events_stream(spark, directory=d)
    agg = (
        e.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n")
    )
    out = run_to_table(spark, agg, "pin_sliding_edge", "complete")
    got = sorted((r["w_start"], r["event_type"]) for r in out.collect())
    assert got == [
        (TS("2024-01-01 09:00:00"), "view"),
        (TS("2024-01-01 09:30:00"), "buy"),
        (TS("2024-01-01 09:30:00"), "view"),
        (TS("2024-01-01 10:00:00"), "buy"),
    ]
