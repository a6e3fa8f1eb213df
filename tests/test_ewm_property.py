"""window_ewm_bounded vs pandas `ewm(alpha, adjust=True).mean()` —
the reference (Dask/pandas) semantics, not just the DuckDB twin.

The oracle test proves Spark and DuckDB compute the same truncated
dot product; this proves the truncation actually approximates the
pandas recursion: with lookback L=32 the dropped tail weighs
(1-a)^32 ≈ 1.1e-5 of the total, so results must agree within ~1e-3
even before rounding."""

from __future__ import annotations

import pandas as pd

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.queries.windows import _EWM_ALPHA
from ondemand_dask_spark.registry import all_queries


def test_ewm_matches_pandas(spark, sf_dir):
    got = (
        all_queries()["window_ewm_bounded"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("event_id")["ewm_value"]
    )

    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    expected = (
        events.assign(
            ewm=events.groupby("user_id")["value"].transform(
                lambda s: s.ewm(alpha=_EWM_ALPHA, adjust=True).mean()
            )
        )
        .set_index("event_id")["ewm"]
    )

    joined = pd.concat([got.rename("got"), expected.rename("exp")], axis=1)
    assert not joined.isna().any().any()
    assert (joined.got - joined.exp).abs().max() < 2e-3
