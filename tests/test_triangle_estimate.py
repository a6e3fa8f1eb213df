"""Tolerance certificate for `triangle_count_estimate` — the
DOULION-style approximate twin of the exact triangle census
(r10 verdict item 7; decision documented on the estimator's
docstring: exact stays the registered query, the estimator is the
100 TB escape hatch, certified here instead of via the driver).

The estimator is unbiased per node (each triangle survives the edge
sampling with probability p³ and contributions scale by 1/p³); with
T ≈ 414k triangle contributions at sf0.01 the DOULION variance bound
puts the global relative error well under 1%, so the 5% gate has an
order-of-magnitude margin while still catching any scaling bug
(a wrong exponent on p is a ≥3.3× error at p = 0.3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ondemand_dask_spark.queries.graph import (
    graph_triangle_count,
    triangle_count_estimate,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_total(spark):
    df = graph_triangle_count(spark, SF_DIR)
    return df.agg(F.sum("n_triangles")).collect()[0][0]


def test_global_estimate_within_5pct(spark, exact_total):
    est = (
        triangle_count_estimate(spark, SF_DIR, p=0.3, seed=7)
        .agg(F.sum("n_triangles_est"))
        .collect()[0][0]
    )
    rel = abs(est - exact_total) / exact_total
    assert rel < 0.05, f"global rel error {rel:.3f} (est={est}, exact={exact_total})"


def test_deterministic_given_seed(spark):
    # hash coin, not rand(): the SAMPLE is partition-order
    # independent, so the per-node map is bit-identical across runs
    # (each node's value is one long count ÷ p³; the global double
    # SUM would not be — float merge order varies with scheduling)
    runs = [
        {
            r.part_id: r.n_triangles_est
            for r in triangle_count_estimate(
                spark, SF_DIR, p=0.3, seed=7
            ).collect()
        }
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_seed_average_tracks_exact(spark, exact_total):
    # unbiasedness smoke: the mean over 3 seeds lands tighter than
    # any single draw is required to
    ests = [
        triangle_count_estimate(spark, SF_DIR, p=0.3, seed=s)
        .agg(F.sum("n_triangles_est"))
        .collect()[0][0]
        for s in (7, 11, 13)
    ]
    mean = sum(ests) / len(ests)
    assert abs(mean - exact_total) / exact_total < 0.04


def test_p_one_reproduces_exact_census(spark):
    # p = 1 keeps every edge: the estimator IS the exact census
    exact = {
        r.part_id: r.n_triangles
        for r in graph_triangle_count(spark, SF_DIR).collect()
    }
    est = {
        r.part_id: r.n_triangles_est
        for r in triangle_count_estimate(spark, SF_DIR, p=1.0).collect()
    }
    assert est == pytest.approx(exact)
