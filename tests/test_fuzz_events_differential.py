"""Time-shape differential fuzz over events-only query families.

Companion to tests/test_fuzz_documents_differential.py, aimed at the
classic time-series divergence class the fixed driver fixtures barely
exercise: DUPLICATE timestamps (ordering ties), bursts inside one
gap-window, single-event users, NULL values/props, and boundary
timestamps landing exactly on day edges.  Each generated corpus is
written as a scratch events.parquet and a pick of deterministic
events-only registered queries runs through the same Spark-vs-DuckDB
comparison the driver uses.

Query pick favors session/interval/ordering semantics (gap
sessionization + metrics, SCD2 intervals, longest streak, as-of
nearest, stickiness) whose outputs must be well-defined for ANY
event stream — a failure here is an engine/oracle divergence or an
underdetermined tie contract, both of which are bugs to fix, not
fuzz noise.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from ondemand_dask_spark.registry import all_queries
from tests.compare import assert_results_match

QUERIES = [
    "sessionize_gap",
    "sessionize_metrics",
    "scd2_intervals",
    "events_longest_streak",
    "asof_join_nearest",
    "events_dau_wau_stickiness",
]

BASE = datetime(2024, 3, 1, 0, 0, 0)
# a SMALL timestamp pool forces duplicate ts rows — the ordering-tie
# regime; offsets straddle day boundaries and the 30-min session gap
OFFSETS = [
    0, 1, 59, 60, 1799, 1800, 1801, 3600,
    86399, 86400, 86401, 172800, 604800,
]
ts_strategy = st.sampled_from(OFFSETS).map(
    lambda s: BASE + timedelta(seconds=s)
)

event_row = st.tuples(
    ts_strategy,
    st.integers(min_value=1, max_value=4),          # user_id
    st.sampled_from(["view", "cart", "purchase"]),  # event_type
    st.one_of(st.none(), st.floats(
        min_value=-100, max_value=100,
        allow_nan=False, allow_infinity=False,
        width=32,
    )),                                             # value
    st.sampled_from([None, "{}", '{"k": 1}']),      # props
)

event_rows = st.lists(event_row, min_size=3, max_size=40)


@pytest.fixture(scope="module")
def picked():
    qs = all_queries()
    return {n: qs[n] for n in QUERIES}


@given(rows=event_rows)
# guaranteed tie corpus: three users sharing every timestamp, two
# identical rows for one user (full-duplicate events), a
# single-event user, and a burst straddling the 30-min session gap
@example(
    rows=[
        (BASE, 1, "view", 1.0, None),
        (BASE, 1, "view", 1.0, None),
        (BASE, 2, "view", 2.0, "{}"),
        (BASE, 3, "purchase", None, None),
        (BASE + timedelta(seconds=1799), 1, "cart", 3.0, None),
        (BASE + timedelta(seconds=1800), 1, "purchase", 4.0, None),
        (BASE + timedelta(seconds=86400), 2, "view", 5.0, None),
    ]
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_events_queries_match_oracle_on_adversarial_streams(
    rows, spark, picked, tmp_path_factory
):
    sf_dir = str(tmp_path_factory.mktemp("fuzzev"))
    events = spark.createDataFrame(
        [
            (i, ts, uid, etype, val, props)
            for i, (ts, uid, etype, val, props) in enumerate(rows, 1)
        ],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    events.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{sf_dir}/events.parquet/*.parquet')"
    )
    for name, q in picked.items():
        spark_pdf = q.fn(spark, sf_dir).toPandas()
        oracle_pdf = con.execute(q.oracle).fetchdf()
        assert_results_match(spark_pdf, oracle_pdf, name)
    con.close()
