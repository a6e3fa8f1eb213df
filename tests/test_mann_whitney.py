"""stat_mann_whitney vs a literal midrank computation.

The query computes U count-side (no data-sized global rank); this
test recomputes U the textbook way — midranks over the pooled sorted
sample — in pure Python on the same fixture and checks both U and
the tie-corrected z-score.
"""

from __future__ import annotations

import math

from ondemand_dask_spark.registry import all_queries


def _literal_u(a: list[float], b: list[float]) -> tuple[float, float]:
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    ranks: dict[int, float] = {}
    i = 0
    rank_sum_a = 0.0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        midrank = (i + 1 + j) / 2.0  # average of ranks i+1..j
        for k in range(i, j):
            if pooled[k][1] == 0:
                rank_sum_a += midrank
        ranks[i] = float(j - i)
        i = j
    na, nb = float(len(a)), float(len(b))
    u = rank_sum_a - na * (na + 1) / 2.0
    n = na + nb
    ties = sum(t**3 - t for t in ranks.values())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    return u, z


def test_u_matches_midrank_formula(spark, sf_dir):
    q = all_queries()["stat_mann_whitney"]
    row = q.fn(spark, sf_dir).collect()[0]
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    a = [round(r["value"], 3) for r in e if r["event_type"] == "purchase"]
    b = [round(r["value"], 3) for r in e if r["event_type"] == "view"]
    u, z = _literal_u(a, b)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["u_stat"] - u) < 1e-3, (row["u_stat"], u)
    assert abs(row["z_score"] - z) < 1e-3, (row["z_score"], z)
