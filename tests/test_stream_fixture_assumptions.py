"""Fixture-assumption guards for the append-mode streaming oracles.

The r7 advisor caught stream_hourly_anomaly_alert passing "by data
luck" — its batch oracle agreed with the append-mode stream only
because the fixture happened to put no alert in the non-finalized
trailing hour.  That class of silent assumption is what these tests
pin: each one asserts the EXACT property of the events fixture that
a streaming oracle's batch-SQL equivalence rides on, at every scale
factor present, so a regenerated or rescaled fixture fails HERE with
a named contract instead of as an opaque hash mismatch in a driver
census.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import SF_DIR

# every standard fixture dir PLUS whatever the suite actually runs
# against (SPARK_GRAFT_TEST_SF_DIR can point elsewhere — the guards
# must cover that dir or they pin nothing for the live differential)
SF_DIRS = sorted(
    d
    for d in {
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        SF_DIR,
    }
    if os.path.exists(os.path.join(d, "events.parquet"))
)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_duplicate_event_ids_stay_within_the_watermark_horizon(sf_dir):
    """stream_dedup_watermark's oracle is a global DISTINCT ON
    (event_id), but dropDuplicatesWithinWatermark only suppresses a
    duplicate arriving within the 10-minute watermark horizon of its
    first occurrence — a wider-spread duplicate would re-emit and
    break the equivalence.  Contract: every recurring event_id's
    occurrences span <= 10 minutes.  (Today the fixtures carry ZERO
    duplicate event_ids, so the dedup is a no-op on the differential;
    the semantics themselves are exercised with injected duplicates
    in tests/test_streaming_incremental.py and by
    stream_union_dual_source, whose same-row feed overlap duplicates
    have zero time spread by construction.)"""
    path = os.path.join(sf_dir, "events.parquet")
    (bad,) = (
        duckdb.connect()
        .execute(
            f"""
            SELECT count(*) FROM (
              SELECT event_id FROM read_parquet('{path}')
              GROUP BY event_id
              HAVING count(*) > 1
                 AND max(ts) - min(ts) > INTERVAL 10 MINUTE
            )
            """
        )
        .fetchone()
    )
    assert bad == 0, (
        f"{path}: {bad} event_ids recur wider than the 10-minute "
        f"watermark — stream_dedup_watermark's DISTINCT oracle no "
        f"longer matches append-mode dropDuplicatesWithinWatermark"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_fixture_is_a_single_file_single_microbatch(sf_dir):
    """stream_stream_join's batch oracle is exact because the finite
    availableNow replay of a SINGLE parquet file is ONE micro-batch:
    the watermark only advances between batches, so no buffered state
    is evicted mid-replay and every in-range view/purchase match
    emits.  A multi-file events fixture would replay as multiple
    batches in file order — not event-time order — and matches whose
    partner landed behind an advanced watermark would be dropped.
    Multi-batch semantics are exercised deliberately (chunked dirs,
    max_files_per_trigger=1) in tests/test_streaming_incremental.py;
    the DIFFERENTIAL's exactness rides on this contract."""
    path = os.path.join(sf_dir, "events.parquet")
    assert os.path.isfile(path), (
        f"{path} is not a single file — append-mode stream oracles "
        f"(stream_stream_join et al.) assume a one-micro-batch replay"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_window_end_sits_exactly_on_the_watermark_boundary(sf_dir):
    """The append-mode finalization cutoff in the hourly/daily oracles
    (w_start + width <= max(ts) − 10min) assumes an INCLUSIVE
    boundary; Spark's state eviction compares window.end against the
    watermark with its own strict-vs-inclusive choice, so the two can
    disagree by exactly one window only when some window END lands
    EXACTLY on max(ts) − 10min.  Pin that degenerate alignment out of
    the fixture (r9 advisor ask): max(ts) − 10min must not be a whole
    hour or whole day boundary, so the inclusive-vs-strict question
    never arises on a regenerated fixture either."""
    path = os.path.join(sf_dir, "events.parquet")
    (on_hour, on_day) = (
        duckdb.connect()
        .execute(
            f"""
            SELECT
              (m - INTERVAL 10 MINUTE) = date_trunc('hour', m - INTERVAL 10 MINUTE),
              (m - INTERVAL 10 MINUTE) = date_trunc('day',  m - INTERVAL 10 MINUTE)
            FROM (SELECT max(ts) AS m FROM read_parquet('{path}'))
            """
        )
        .fetchone()
    )
    assert not on_hour and not on_day, (
        f"{path}: max(ts) − 10min lands exactly on a window boundary "
        f"(hour={on_hour}, day={on_day}) — the append-mode oracles' "
        f"inclusive finalization cutoff may disagree with Spark's "
        f"eviction predicate by one window"
    )
