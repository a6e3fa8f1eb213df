"""Property-based merge_asof vs pandas (hypothesis).

Random small frames hammer the edge cases hand-written tests miss:
users with an empty right side, left timestamps before every right
row, exact timestamp ties (>= / <= boundary), tolerance cutoffs
landing exactly on a match, and nearest-direction tie-breaking.

Numeric `on` keys keep generation simple — the operator supports
numeric and timestamp alike (both reduce to ordered comparisons).
Right keys are deduped per (user, t): with duplicates, "which equal
row wins" is input-order-dependent in pandas and partition-order-
dependent in any distributed engine — not a portable semantic, so
not a property to test.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ondemand_dask_spark.operators import merge_asof
from tests.compare import assert_results_match

_row = st.tuples(
    st.integers(min_value=0, max_value=2),     # user
    st.integers(min_value=0, max_value=50),    # t
)

_frames = st.tuples(
    st.lists(_row, min_size=1, max_size=12),
    st.lists(_row, min_size=0, max_size=12),
)


def _build(spark, rows, with_payload: bool):
    pdf = pd.DataFrame(rows, columns=["user", "t"]).drop_duplicates(
        subset=["user", "t"]
    )
    pdf["t"] = pdf["t"].astype("int64")
    pdf["user"] = pdf["user"].astype("int64")
    if with_payload:
        pdf["payload"] = pdf["user"] * 1000 + pdf["t"]
    else:
        pdf["row_id"] = range(len(pdf))
    if len(pdf) == 0:
        schema = "user long, t long, payload long"
        return spark.createDataFrame([], schema), pdf
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_frames, tolerance=st.sampled_from([None, 0, 3, 10]))
def test_merge_asof_matches_pandas(spark, direction, data, tolerance):
    lrows, rrows = data
    left, lpd = _build(spark, lrows, with_payload=False)
    right, rpd = _build(spark, rrows, with_payload=True)

    got = (
        merge_asof(
            left, right, on="t", by="user", direction=direction,
            tolerance_seconds=tolerance, suffix="_m",
        )
        .select("user", "t", "row_id", "payload_m")
        .toPandas()
    )
    exp = pd.merge_asof(
        lpd.sort_values("t", kind="stable"),
        rpd.sort_values("t", kind="stable"),
        on="t",
        by="user",
        direction=direction,
        tolerance=tolerance,
        suffixes=("", "_m"),
    ).rename(columns={"payload": "payload_m"})[
        ["user", "t", "row_id", "payload_m"]
    ]
    assert_results_match(got, exp, f"asof_prop_{direction}_{tolerance}")
