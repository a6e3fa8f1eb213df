"""The CUSUM query's closed form must equal the literal recurrence.

`window_cusum_drift` computes S_i = max(0, S_{i-1} + (x_i - target))
via the reflection identity S_i = P_i - min(0, min_{j<=i} P_j); this
re-runs the sequential recurrence in plain Python per user and
compares every row.
"""

from __future__ import annotations

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.queries.windows import _CUSUM_TARGET
from ondemand_dask_spark.registry import all_queries


def test_closed_form_matches_recurrence(spark, sf_dir):
    got = (
        all_queries()["window_cusum_drift"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("event_id")["cusum"]
        .to_dict()
    )
    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    n_checked = 0
    for _, g in events.groupby("user_id"):
        s = 0.0
        for _, row in g.iterrows():
            s = max(0.0, s + (row["value"] - _CUSUM_TARGET))
            assert abs(got[row["event_id"]] - round(s - 1e-9, 4)) < 1e-3, (
                row["event_id"]
            )
            n_checked += 1
    assert n_checked == len(got) > 0
