"""Tied-fixture known-answer pins for every count-side rank statistic.

The r9 Mann-Kendall bug (tie-correction used the DISTINCT-VALUE count
as n where the formula needs the OBSERVATION count) was wrong the
same way on both engines, so the DuckDB differential stayed green.
This file is the r9-verdict sweep of that bug class across the other
rank statistics (queries/aggregations.py): each test runs the
registered query on a tiny CONSTRUCTED fixture with deliberate ties
and checks against values derived from the textbook midrank
definition — hand constants in the docstrings, re-derived here in
pure Python (fraction-exact arithmetic, no Spark/DuckDB formula
shared).  Audit result alongside: stat_kruskal_wallis,
stat_mann_whitney, stat_ks_two_sample, and stat_runs_test all take n
from observation counts (sum of per-value counts), not from the
distinct-value table — no further instance of the class was found;
these pins keep it that way.

(stat_mann_kendall and stat_runs_test already carry hand pins in
test_stats_known_answers.py; stat_mann_whitney's real-data literal
recompute lives in test_mann_whitney.py — the fixture here adds the
constructed-tie case with hand constants.)
"""

from __future__ import annotations

import datetime
import math
import os
from fractions import Fraction

import pandas as pd

from ondemand_dask_spark.registry import all_queries


def _write_events(tmp_path, rows):
    """Minimal events.parquet: (event_type, value) pairs, synthetic
    ids/timestamps (the rank stats ignore ts except runs_test)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pdf = pd.DataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 12, 0, 0), 1, g, float(v))
            for i, (g, v) in enumerate(rows)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def _midranks(values):
    """value -> midrank over the pooled sorted sample (Fractions)."""
    pooled = sorted(values)
    out: dict[float, Fraction] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        out[pooled[i]] = Fraction(i + 1 + j, 2)  # mean of ranks i+1..j
        i = j
    return out


def test_kruskal_wallis_tied_fixture(spark, tmp_path):
    """Groups purchase=[1,2,2], view=[2,3], click=[3,3,4] (n=8, two
    3-way ties).  Midranks: 1->1, 2->3, 3->6, 4->8; rank sums
    R=(7, 9, 20); H = 12/72 * (49/3 + 81/2 + 400/3) - 27 = 4.694444;
    ties Σ(t³−t)=48 over the OBSERVATION count n=8 (N³−N=504, not the
    distinct-value count 4 whose N³−N would be 60), so
    H_corr = H·504/456 = 5.188596."""
    groups = {
        "purchase": [1, 2, 2],
        "view": [2, 3],
        "click": [3, 3, 4],
    }
    sf_dir = _write_events(
        tmp_path, [(g, v) for g, vs in groups.items() for v in vs]
    )

    pooled = [v for vs in groups.values() for v in vs]
    mr = _midranks(pooled)
    n = Fraction(len(pooled))
    s = sum(
        sum(mr[v] for v in vs) ** 2 / Fraction(len(vs))
        for vs in groups.values()
    )
    h = Fraction(12) / (n * (n + 1)) * s - 3 * (n + 1)
    tie_counts = [pooled.count(v) for v in set(pooled)]
    tt = sum(t**3 - t for t in tie_counts)
    h_corr = h / (1 - Fraction(tt) / (n**3 - n))
    assert h == Fraction(169, 36)  # 4.69444... — hand derivation holds
    assert h_corr == Fraction(169 * 504, 36 * 456)

    row = all_queries()["stat_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert (row["n_groups"], row["n"]) == (3, 8)
    assert abs(row["h_stat"] - float(h)) < 2e-4
    assert abs(row["h_tie_corrected"] - float(h_corr)) < 2e-4


def test_mann_whitney_tied_fixture(spark, tmp_path):
    """purchase=[1,2,2,3] vs view=[2,3,3,4] (ties across samples).
    Midranks 1->1, 2->3, 3->6, 4->8; rank_sum_a = 13,
    U = 13 − 4·5/2 = 3; Σ(t³−t)=48 over n=8 observations;
    var = (16/12)·(9 − 48/56) = 10.857143;
    z = (3 − 8)/√var = −1.517443."""
    a, b = [1, 2, 2, 3], [2, 3, 3, 4]
    sf_dir = _write_events(
        tmp_path, [("purchase", v) for v in a] + [("view", v) for v in b]
    )

    mr = _midranks(a + b)
    na, nb = Fraction(len(a)), Fraction(len(b))
    n = na + nb
    u = sum(mr[v] for v in a) - na * (na + 1) / 2
    tt = sum(t**3 - t for t in ((a + b).count(v) for v in set(a + b)))
    var = na * nb / 12 * ((n + 1) - Fraction(tt) / (n * (n - 1)))
    assert u == 3 and var == Fraction(76, 7)  # 10.857142857...
    z = (float(u) - float(na * nb) / 2) / math.sqrt(float(var))

    row = all_queries()["stat_mann_whitney"].fn(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (4, 4)
    assert abs(row["u_stat"] - 3.0) < 1e-9
    assert abs(row["z_score"] - z) < 2e-4


def test_ks_two_sample_tied_fixture(spark, tmp_path):
    """purchase=[1,2,2,3] vs view=[2,3,3,4].  ECDFs at distinct values
    (1,2,3,4): F1=(.25,.75,1,1), F2=(0,.25,.75,1) → max gap 0.5 at
    v=2.  A distinct-value-count denominator would give F1=(.25,.5,
    .75,1)-style curves and a different gap — the pin separates
    them."""
    sf_dir = _write_events(
        tmp_path,
        [("purchase", v) for v in [1, 2, 2, 3]]
        + [("view", v) for v in [2, 3, 3, 4]],
    )
    row = all_queries()["stat_ks_two_sample"].fn(spark, sf_dir).collect()[0]
    assert abs(row["ks_stat"] - 0.5) < 1e-9


def test_spearman_min_rank_tied_fixture(spark, tmp_path):
    """Orders with tied prices [10,10,20,30] and tied dates
    [d1,d2,d2,d3].  The query documents MIN-rank semantics (rank(),
    not midrank) on both engines: rx=(1,1,3,4), ry=(1,2,2,4);
    Pearson over those = 4.75/√(6.75·4.75) = 0.838871 (midrank
    Spearman on the same data would be 0.833333 — the pin separates
    the two semantics)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    d = datetime.datetime
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_totalprice": [10.0, 10.0, 20.0, 30.0],
            "o_orderdate": [
                d(2024, 1, 1), d(2024, 1, 2), d(2024, 1, 2), d(2024, 1, 3),
            ],
        }
        # micros like the driver testdata — pandas' default NANOS would
        # read as bigint under the sticky nanosAsLong session flag that
        # an earlier events load_table sets
    ).to_parquet(os.path.join(sf_dir, "orders.parquet"), coerce_timestamps="us")

    rx, ry = [1, 1, 3, 4], [1, 2, 2, 4]
    mx = sum(rx) / 4.0
    my = sum(ry) / 4.0
    cov = sum((x - mx) * (y - my) for x, y in zip(rx, ry))
    want = cov / math.sqrt(
        sum((x - mx) ** 2 for x in rx) * sum((y - my) ** 2 for y in ry)
    )
    assert abs(want - 0.838871) < 1e-6  # hand constant holds

    row = all_queries()["stat_spearman_corr"].fn(spark, sf_dir).collect()[0]
    assert row["n"] == 4
    assert abs(row["spearman"] - want) < 2e-4
