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
  ends exclusive at the slide edge too.
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
