"""Property-based test for the distributed exact grouped-quantile
operator (operators/quantile.py) against numpy's linear-interpolation
percentile — the same `quantile_cont` semantics the DuckDB oracle
checks, but over adversarial generated inputs (duplicates, negatives,
single-element groups, skewed group sizes) instead of the fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ondemand_dask_spark.operators.quantile import (
    exact_group_quantiles,
    exact_group_quantiles_select,
)

# (group label, value) rows; values quantized to avoid float-noise
# flakiness in the == comparison below (we assert near-equality anyway)
_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 10.0),
    ),
    min_size=1,
    max_size=60,
)


@pytest.mark.usefixtures("spark")
@pytest.mark.parametrize(
    "impl",
    [exact_group_quantiles, exact_group_quantiles_select],
    ids=["sort", "select"],
)
@given(rows=_rows, q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_group_quantiles_matches_numpy(spark, impl, rows, q):
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    sdf = spark.createDataFrame(pdf)
    got = (
        impl(sdf, ["k"], "v", {"qv": q})
        .toPandas()
        .set_index("k")["qv"]
        .sort_index()
    )
    exp = (
        pdf.groupby("k")["v"]
        .apply(lambda s: float(np.percentile(s, q * 100, method="linear")))
        .sort_index()
    )
    assert list(got.index) == list(exp.index)
    assert np.allclose(got.values, exp.values, rtol=1e-12, atol=1e-12)
