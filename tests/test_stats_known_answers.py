"""Known-answer tests for shared-formula statistics.

The DuckDB differential is BLIND to a formula that is wrong the same
way on both engines (the r8 geo ring bug was exactly that class for
blocking).  These tests run the registered queries on tiny
CONSTRUCTED fixtures whose answers are computed by an independent
algorithm — exact integer combinatorics via math.comb, not the
engines' lgamma/Stirling ln-factorial path — so a transcription or
derivation error in the shared formula fails here even though the
differential stays green.
"""

from __future__ import annotations

import math
import os

import pandas as pd
from pyspark.sql import functions as F

from ondemand_dask_spark.registry import all_queries


def _mini_documents(tmp_path, rows):
    """Write a minimal documents.parquet carrying only the columns the
    stats queries read (lang, source)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "source"])
    pdf.to_parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _hypergeom_pmf(n, r1, c1, k):
    """P(X = k) for the 2x2 margin (exact integer combinatorics)."""
    return math.comb(r1, k) * math.comb(n - r1, c1 - k) / math.comb(n, c1)


def test_fisher_exact_matches_exact_combinatorics(spark, tmp_path):
    """The classic lady-tasting-tea table (n=8, both margins 4,
    observed a=3), built so the query's (lang='de') x (src<=10)
    derivation produces it exactly:

        p_point     = C(4,3)*C(4,1)/C(8,4) = 16/70
        p_one_sided = (16 + 1)/70          = 17/70
        p_two_sided = 2*(16 + 1)/70        = 34/70 (symmetric margins)

    computed here from math.comb — integer-exact, no lgamma anywhere.
    """
    # margins: r1 = 4 'de' docs, c1 = 4 low-source docs, a = 3 overlap
    rows = [
        (1, "de", "src1"),   # de & low
        (2, "de", "src2"),   # de & low
        (3, "de", "src3"),   # de & low
        (4, "de", "src11"),  # de & high
        (5, "en", "src4"),   # en & low
        (6, "en", "src12"),  # en & high
        (7, "en", "src13"),  # en & high
        (8, "en", "src14"),  # en & high
    ]
    sf_dir = _mini_documents(tmp_path, rows)
    got = (
        all_queries()["stat_fisher_exact"].fn(spark, sf_dir).toPandas().iloc[0]
    )
    assert (got["n_total"], got["n_treat"], got["n_exposed"], got["n_both"]) \
        == (8, 4, 4, 3)
    pmf = [_hypergeom_pmf(8, 4, 4, k) for k in range(0, 5)]
    assert abs(sum(pmf) - 1.0) < 1e-12  # sanity on the independent side
    want_point = pmf[3]
    want_one = pmf[3] + pmf[4]
    want_two = sum(p for p in pmf if p <= pmf[3] * (1 + 1e-7))
    assert abs(got["p_point"] - round(want_point - 1e-9, 4)) < 1e-9
    assert abs(got["p_one_sided"] - round(want_one - 1e-9, 4)) < 1e-9
    assert abs(got["p_two_sided"] - round(want_two - 1e-9, 4)) < 1e-9


def test_fisher_exact_extreme_table(spark, tmp_path):
    """Perfect association (a = min margin): one-sided p equals the
    point probability — the tail is a single table — and both equal
    C(n-r1, c1-r1)... computed independently below.  Catches
    off-by-one in the k-summation bounds that symmetric tables hide.
    """
    # n=10, r1=3 de (all low), c1=5 low
    rows = [(i, "de", f"src{i}") for i in range(1, 4)] + [
        (4, "en", "src4"),
        (5, "en", "src5"),
        (6, "en", "src11"),
        (7, "en", "src12"),
        (8, "en", "src13"),
        (9, "en", "src14"),
        (10, "en", "src15"),
    ]
    sf_dir = _mini_documents(tmp_path, rows)
    got = (
        all_queries()["stat_fisher_exact"].fn(spark, sf_dir).toPandas().iloc[0]
    )
    assert (got["n_total"], got["n_treat"], got["n_exposed"], got["n_both"]) \
        == (10, 3, 5, 3)
    pmf = {k: _hypergeom_pmf(10, 3, 5, k) for k in range(0, 4)}
    assert abs(got["p_point"] - round(pmf[3] - 1e-9, 4)) < 1e-9
    assert abs(got["p_one_sided"] - round(pmf[3] - 1e-9, 4)) < 1e-9
    want_two = sum(p for p in pmf.values() if p <= pmf[3] * (1 + 1e-7))
    assert abs(got["p_two_sided"] - round(want_two - 1e-9, 4)) < 1e-9


def test_auc_matches_exact_pair_counting(spark, tmp_path):
    """ml_eval_binary computes AUC count-side via the Mann-Whitney U
    identity (no global rank).  Independent check: AUC IS the
    concordance probability, so count (pos, neg) pairs directly —
    wins + half-ties over nP*nN — on a constructed score set with
    deliberate cross-class ties and a tie ON the threshold.
    """
    import datetime

    pos = [90.0, 80.0, 50.0, 35.0]   # 35.0 ties the threshold (<= t)
    neg = [70.0, 50.0, 20.0]         # 50.0 ties a positive
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate(pos):
        rows.append((i, t0, 1, v, "purchase"))
    for i, v in enumerate(neg):
        rows.append((100 + i, t0, 2, v, "view"))
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "value", "event_type"]
    ).to_parquet(os.path.join(sf_dir, "events.parquet"))

    got = all_queries()["ml_eval_binary"].fn(spark, sf_dir).toPandas().iloc[0]

    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want_auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got["auc"] - round(want_auc - 1e-9, 4)) < 1e-9
    # confusion at t=35: score must be STRICTLY above to predict 1
    tp = sum(1 for p in pos if p > 35.0)       # 3 (the 35.0 is a FN)
    fp = sum(1 for n in neg if n > 35.0)       # 2
    fn = len(pos) - tp                         # 1
    assert abs(got["precision_at_t"] - round(tp / (tp + fp) - 1e-9, 4)) < 1e-9
    assert abs(got["recall_at_t"] - round(tp / (tp + fn) - 1e-9, 4)) < 1e-9
    assert abs(
        got["f1_at_t"] - round(2 * tp / (2 * tp + fp + fn) - 1e-9, 4)
    ) < 1e-9


def test_ks_statistic_matches_literal_ecdf(spark, sf_dir):
    """stat_ks_two_sample folds the KS statistic into count-side
    windows over the distinct-value table; this recomputes it the
    textbook way — two explicit ECDFs evaluated at every pooled
    sample point — in pure Python on the same fixture (the
    stat_mann_whitney literal-recompute pattern)."""
    from ondemand_dask_spark.io import load_table

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("event_type", F.round("value", 3).alias("v"))
        .collect()
    )
    a = sorted(r["v"] for r in e if r["event_type"] == "purchase")
    b = sorted(r["v"] for r in e if r["event_type"] == "view")

    import bisect

    def ecdf(sorted_vals, x):
        return bisect.bisect_right(sorted_vals, x) / len(sorted_vals)

    want = max(
        abs(ecdf(a, x) - ecdf(b, x)) for x in set(a) | set(b)
    )
    got = (
        all_queries()["stat_ks_two_sample"].fn(spark, sf_dir).first()["ks_stat"]
    )
    assert abs(got - round(want - 1e-9, 4)) < 1e-9


def test_kruskal_wallis_matches_literal_midranks(spark, sf_dir):
    """stat_kruskal_wallis folds H from per-distinct-value counts;
    this recomputes it the textbook way — pooled sort, per-element
    midranks, per-group rank sums, H = 12/(N(N+1))·Σ R²/n − 3(N+1)
    with the Σ(t³−t) tie correction — in pure Python on the same
    fixture."""
    from collections import Counter, defaultdict

    from ondemand_dask_spark.io import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.round("value", 3).alias("v"))
        .collect()
    )
    by_group = defaultdict(list)
    for r in rows:
        by_group[r["event_type"]].append(r["v"])
    pooled = sorted(v for vs in by_group.values() for v in vs)
    # midrank of each distinct value = average of its 1-based ranks
    midrank = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        midrank[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    n = float(len(pooled))
    s = sum(
        (sum(midrank[v] for v in vs)) ** 2 / len(vs)
        for vs in by_group.values()
    )
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    tie = sum(t**3 - t for t in Counter(pooled).values())
    h_corr = h / (1.0 - tie / (n**3 - n))

    got = all_queries()["stat_kruskal_wallis"].fn(spark, sf_dir).first()
    assert got["n_groups"] == len(by_group)
    assert got["n"] == int(n)
    assert abs(got["h_stat"] - round(h - 1e-9, 4)) < 2e-4
    assert abs(got["h_tie_corrected"] - round(h_corr - 1e-9, 4)) < 2e-4


def test_spearman_matches_literal_min_ranks(spark, sf_dir):
    """stat_spearman_corr ranks via the distributed two-pass
    global_min_ranks; this recomputes Spearman the textbook way —
    min-rank (rank() semantics: 1 + #strictly smaller) per variable,
    then Pearson on the rank pairs — in pure Python."""
    from bisect import bisect_left

    from ondemand_dask_spark.io import load_table

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderdate")
        .collect()
    )
    xs = [float(r["o_totalprice"]) for r in rows]
    ys = [r["o_orderdate"] for r in rows]

    def min_ranks(vals):
        srt = sorted(vals)
        return [bisect_left(srt, v) + 1 for v in vals]

    rx, ry = min_ranks(xs), min_ranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    want = cov / (vx**0.5 * vy**0.5)

    got = all_queries()["stat_spearman_corr"].fn(spark, sf_dir).first()
    assert got["n"] == n
    assert abs(got["spearman"] - round(want - 1e-9, 4)) < 2e-4


def test_weighted_median_matches_literal_accumulation(spark, sf_dir):
    """agg_weighted_median finds the lower weighted median via
    window-accumulated weights; this recomputes it literally —
    sort each group by (value, orderkey, linenumber), walk the
    running weight to half the total — in pure Python."""
    from collections import defaultdict

    from ondemand_dask_spark.io import load_table

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", "l_extendedprice", "l_quantity",
            "l_orderkey", "l_linenumber",
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append(
            (
                float(r["l_extendedprice"]),
                int(r["l_orderkey"]),
                int(r["l_linenumber"]),
                float(r["l_quantity"]),
            )
        )
    want = {}
    for g, items in groups.items():
        items.sort()
        tw = sum(w for *_, w in items)
        cw = 0.0
        for v, _ok, _ln, w in items:
            cw += w
            if cw >= tw / 2.0:
                want[g] = (round(v - 1e-9, 4), round(tw - 1e-9, 4))
                break

    got = {
        r["l_returnflag"]: (r["weighted_median"], r["total_weight"])
        for r in all_queries()["agg_weighted_median"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert abs(got[g][0] - want[g][0]) < 1e-6, g
        assert abs(got[g][1] - want[g][1]) < 1e-6, g


def test_chi2_independence_hand_table(spark, tmp_path):
    """Constructed 2×2 lang×source table with counts 10/20/30/40:
    χ² = N(ad−bc)²/(r₁r₂c₁c₂) = 100·(400−600)²/(30·70·40·60)
    = 4,000,000/5,040,000 = 0.793650… — the shortcut formula, a
    genuinely different derivation from the Σ(O−E)²/E both engines
    compute.  dof = 1, levels 2×2."""
    rows = []
    i = 0
    for lang, source, n in [
        ("aa", "x", 10), ("aa", "y", 20), ("bb", "x", 30), ("bb", "y", 40)
    ]:
        for _ in range(n):
            rows.append((i, lang, source))
            i += 1
    sf_dir = _mini_documents(tmp_path, rows)
    (r,) = all_queries()["stat_chi2_independence"].fn(spark, sf_dir).collect()
    assert int(r["n_rows_levels"]) == 2 and int(r["n_col_levels"]) == 2
    assert int(r["dof"]) == 1
    shortcut = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert float(r["chi2"]) == round(shortcut - 1e-9, 4)


def test_g_test_hand_table(spark, tmp_path):
    """Same 10/20/30/40 table: G = 2·Σ O·ln(O/E) with expecteds from
    the margins (12, 18, 28, 42), recomputed here with exact integer
    ratios through math.log — pins the count/marginal plumbing and
    that absent zero cells contribute nothing."""
    rows = []
    i = 0
    for lang, source, n in [
        ("aa", "x", 10), ("aa", "y", 20), ("bb", "x", 30), ("bb", "y", 40)
    ]:
        for _ in range(n):
            rows.append((i, lang, source))
            i += 1
    sf_dir = _mini_documents(tmp_path, rows)
    (r,) = all_queries()["stat_g_test"].fn(spark, sf_dir).collect()
    assert int(r["dof"]) == 1
    g = 2 * (
        10 * math.log(10 / 12)
        + 20 * math.log(20 / 18)
        + 30 * math.log(30 / 28)
        + 40 * math.log(40 / 42)
    )
    assert float(r["g_stat"]) == round(g - 1e-9, 4)


def _mini_events_daily(tmp_path, series):
    """series: {event_type: [daily totals]} — one event per day,
    days consecutive from 2024-01-01."""
    import datetime

    rows = []
    i = 0
    for etype, vals in series.items():
        for d, v in enumerate(vals):
            rows.append(
                (
                    i,
                    datetime.datetime(2024, 1, 1 + d, 12, 0, 0),
                    1,
                    etype,
                    float(v),
                )
            )
            i += 1
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).to_parquet(os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_mann_kendall_hand_series(spark, tmp_path):
    """Three constructed daily series: strictly increasing (all 10
    pairs concordant → S=10, var=5·4·15/18, z=(10−1)/√var), strictly
    decreasing (S=−10, z mirrored), and one with a tie (values
    1,1,2 → S=2, tie term 2·1·9=18, var=(66−18)/18).  All arithmetic
    by hand — independent of the pairwise-join formulation both
    engines share."""
    sf_dir = _mini_events_daily(
        tmp_path,
        {"up": [1, 2, 3, 4, 5], "down": [5, 4, 3, 2, 1], "tie": [1, 1, 2]},
    )
    got = {
        r["event_type"]: (
            int(r["n_days"]), int(r["s_stat"]),
            float(r["var_s"]), float(r["z_score"]),
        )
        for r in all_queries()["stat_mann_kendall"].fn(spark, sf_dir).collect()
    }
    var5 = 5 * 4 * 15 / 18  # 16.6667
    z5 = 9 / math.sqrt(var5)
    var_tie = (3 * 2 * 11 - 18) / 18  # 2.6667
    z_tie = 1 / math.sqrt(var_tie)
    assert got["up"] == (5, 10, round(var5 - 1e-9, 4), round(z5 - 1e-9, 4))
    assert got["down"] == (
        5, -10, round(var5 - 1e-9, 4), round(-z5 - 1e-9, 4)
    )
    assert got["tie"] == (
        3, 2, round(var_tie - 1e-9, 4), round(z_tie - 1e-9, 4)
    )


def test_runs_test_hand_series(spark, tmp_path):
    """Perfectly alternating above/below-median days (1,10,…) give
    the MAXIMUM run count 6; perfectly clumped (1,1,1,10,10,10) give
    the minimum 2.  With n1=n2=3: E[R]=2·9/6+1=4,
    Var=2·3·3·(18−6)/(36·5)=1.2, so z=±2/√1.2 — the whole derivation
    by hand."""
    sf_dir = _mini_events_daily(
        tmp_path,
        {"alt": [1, 10, 1, 10, 1, 10], "clump": [1, 1, 1, 10, 10, 10]},
    )
    got = {
        r["event_type"]: (
            int(r["n_above"]), int(r["n_below"]),
            int(r["n_runs"]), float(r["z_score"]),
        )
        for r in all_queries()["stat_runs_test"].fn(spark, sf_dir).collect()
    }
    z = 2 / math.sqrt(1.2)
    assert got["alt"] == (3, 3, 6, round(z - 1e-9, 4))
    assert got["clump"] == (3, 3, 2, round(-z - 1e-9, 4))


def _mini_events_typed(tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    import datetime as _dt

    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_mcnemar_hand_table(spark, tmp_path):
    """Paired pre/post purchase bits around the 2024-01-16 cutover:
    1 user lost, 3 gained, 1 both, 1 neither →
    χ² = (|1−3|−1)²/(1+3) = 1/4 by hand."""
    pre, post = "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    rows = [
        (1, pre, 1, "purchase", 1.0), (2, post, 1, "view", 1.0),   # lost
        (3, pre, 2, "view", 1.0), (4, post, 2, "purchase", 1.0),   # gained
        (5, pre, 3, "view", 1.0), (6, post, 3, "purchase", 1.0),   # gained
        (7, pre, 4, "view", 1.0), (8, post, 4, "purchase", 1.0),   # gained
        (9, pre, 5, "purchase", 1.0), (10, post, 5, "purchase", 1.0),  # both
        (11, pre, 6, "view", 1.0), (12, post, 6, "view", 1.0),     # neither
    ]
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = all_queries()["stat_mcnemar"].fn(spark, sf_dir).collect()
    assert (
        int(r["n_lost"]), int(r["n_gained"]),
        int(r["n_both"]), int(r["n_neither"]),
    ) == (1, 3, 1, 1)
    assert float(r["mcnemar_chi2"]) == 0.25


def test_wilson_ci_boundary_invariants(spark, tmp_path):
    """The Wilson interval's defining edge behavior, independent of
    z: at k=0 the lower bound is EXACTLY 0 (center z²/2n equals the
    half-width) and at k=n the upper bound is EXACTLY 1 — where the
    Wald interval collapses.  One all-view day, one all-purchase
    day."""
    d0, d1 = "2024-01-01 12:00:00", "2024-01-02 12:00:00"
    rows = [
        (1, d0, 1, "view", 1.0), (2, d0, 1, "view", 1.0),
        (3, d0, 1, "view", 1.0),
        (4, d1, 1, "purchase", 1.0), (5, d1, 1, "purchase", 1.0),
        (6, d1, 1, "purchase", 1.0),
    ]
    sf_dir = _mini_events_typed(tmp_path, rows)
    got = {
        str(r["d"])[:10]: (
            int(r["n"]), int(r["k"]), float(r["p"]),
            float(r["wilson_lo"]), float(r["wilson_hi"]),
        )
        for r in all_queries()["stat_wilson_ci"].fn(spark, sf_dir).collect()
    }
    n0, k0, p0, lo0, hi0 = got["2024-01-01"]
    assert (n0, k0, p0) == (3, 0, 0.0)
    assert lo0 == 0.0 and 0.0 < hi0 < 1.0
    n1, k1, p1, lo1, hi1 = got["2024-01-02"]
    assert (n1, k1, p1) == (3, 3, 1.0)
    assert hi1 == 1.0 and 0.0 < lo1 < 1.0


def test_welch_ttest_hand_moments(spark, tmp_path):
    """purchase values 1,2,3 (m=2, v=1) vs view values 4,6 (m=5,
    v=2): mean_diff = −3, t = −3/√(1/3+1) = −3√3/2 ≈ −2.5981,
    Welch–Satterthwaite df = (4/3)²/((1/3)²/2 + 1) = 32/19 ≈ 1.6842
    — every step by hand."""
    t0 = "2024-01-01 00:00:00"
    rows = [
        (1, t0, 1, "purchase", 1.0), (2, t0, 1, "purchase", 2.0),
        (3, t0, 1, "purchase", 3.0),
        (4, t0, 2, "view", 4.0), (5, t0, 2, "view", 6.0),
    ]
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = all_queries()["stat_welch_ttest"].fn(spark, sf_dir).collect()
    assert (int(r["n1"]), int(r["n2"])) == (3, 2)
    assert float(r["mean_diff"]) == -3.0
    assert float(r["t_stat"]) == round(-3 * math.sqrt(3) / 2 - 1e-9, 4)
    assert float(r["welch_df"]) == round(32 / 19 - 1e-9, 4)


def test_proportions_ztest_hand_counts(spark, tmp_path):
    """Even users: 4 events / 1 purchase (p=0.25); odd users: 4 / 2
    (p=0.5); pooled 3/8.  z = −0.25/√(0.375·0.625·0.5) ≈ −0.7303 by
    hand."""
    t0 = "2024-01-01 00:00:00"
    rows = (
        [(i, t0, 2, "purchase" if i == 1 else "view", 1.0)
         for i in range(1, 5)]
        + [(10 + i, t0, 3, "purchase" if i <= 2 else "view", 1.0)
           for i in range(1, 5)]
    )
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = all_queries()["stat_proportions_ztest"].fn(spark, sf_dir).collect()
    assert (int(r["n_a"]), int(r["n_b"])) == (4, 4)
    assert (float(r["p_a"]), float(r["p_b"])) == (0.25, 0.5)
    assert float(r["p_pooled"]) == 0.375
    want_z = -0.25 / math.sqrt(0.375 * 0.625 * 0.5)
    assert float(r["z_score"]) == round(want_z - 1e-9, 4)


def test_effect_sizes_hand_moments(spark, tmp_path):
    """Same 1,2,3 vs 4,6 fixture as the Welch pin: pooled SD =
    √(((3−1)·1 + (2−1)·2)/3) = 2/√3, Cohen's d = −3√3/2, Hedges' g =
    d·(1 − 3/11), population-SD variant d·√(3/5) — each closed form
    recomputed by hand."""
    t0 = "2024-01-01 00:00:00"
    rows = [
        (1, t0, 1, "purchase", 1.0), (2, t0, 1, "purchase", 2.0),
        (3, t0, 1, "purchase", 3.0),
        (4, t0, 2, "view", 4.0), (5, t0, 2, "view", 6.0),
    ]
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = all_queries()["stat_effect_sizes"].fn(spark, sf_dir).collect()
    d = -3 * math.sqrt(3) / 2
    assert float(r["mean_diff"]) == -3.0
    assert float(r["pooled_sd"]) == round(2 / math.sqrt(3) - 1e-9, 4)
    assert float(r["cohens_d"]) == round(d - 1e-9, 4)
    assert float(r["hedges_g"]) == round(d * (1 - 3 / 11) - 1e-9, 4)
    assert float(r["glass_like_d"]) == round(
        d * math.sqrt(3 / 5) - 1e-9, 4
    )


def test_jackknife_constant_series_has_zero_se(spark, tmp_path):
    """Every leave-one-bucket-out mean of a CONSTANT series equals
    the constant, so the jackknife SE is exactly 0 and the mean is
    the constant — an invariant that holds regardless of how the
    opaque hash assigns buckets."""
    t0 = "2024-01-01 00:00:00"
    rows = [(i, t0, 1, "view", 7.0) for i in range(100)]
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = (
        all_queries()["stat_jackknife_variance"].fn(spark, sf_dir).collect()
    )
    assert int(r["n_rows"]) == 100
    assert 1 <= int(r["n_buckets"]) <= 32
    assert float(r["mean_value"]) == 7.0
    assert float(r["jackknife_se"]) == 0.0


def test_tost_hand_moments(spark, tmp_path):
    """Same fixture as the Welch pin (diff = −3, se = 2/√3): with
    margin 0.5, t_lower = −2.5/se, t_upper = −3.5/se; both one-sided
    tests clearly fail (the means differ by 6× the margin), so
    equivalent = False — the asymmetric-bounds arithmetic by hand."""
    t0 = "2024-01-01 00:00:00"
    rows = [
        (1, t0, 1, "purchase", 1.0), (2, t0, 1, "purchase", 2.0),
        (3, t0, 1, "purchase", 3.0),
        (4, t0, 2, "view", 4.0), (5, t0, 2, "view", 6.0),
    ]
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = all_queries()["stat_tost_equivalence"].fn(spark, sf_dir).collect()
    se = 2 / math.sqrt(3)
    assert float(r["mean_diff"]) == -3.0
    assert float(r["se"]) == round(se - 1e-9, 4)
    assert float(r["t_lower"]) == round(-2.5 / se - 1e-9, 4)
    assert float(r["t_upper"]) == round(-3.5 / se - 1e-9, 4)
    assert bool(r["equivalent"]) is False
    # and an equivalent pair: identical-mean tight groups, se small
    rows2 = [
        (1, t0, 1, "purchase", 10.0), (2, t0, 1, "purchase", 10.1),
        (3, t0, 1, "purchase", 9.9),
        (4, t0, 2, "view", 10.0), (5, t0, 2, "view", 10.1),
        (6, t0, 2, "view", 9.9),
    ]
    sf2 = _mini_events_typed(tmp_path.joinpath("eq"), rows2)
    (r2,) = all_queries()["stat_tost_equivalence"].fn(spark, sf2).collect()
    # diff = 0, se = sqrt(0.01/3 + 0.01/3) = sqrt(1/150)
    se2 = math.sqrt(0.01 / 3 + 0.01 / 3)
    assert float(r2["mean_diff"]) == 0.0
    assert float(r2["t_lower"]) == round(0.5 / se2 - 1e-9, 4)
    assert bool(r2["equivalent"]) is True


def test_power_sample_size_hand_variance(spark, tmp_path):
    """Pooled values 1,2,3,4,6: mean 3.2, sample variance 14.8/4 =
    3.7.  n_per_arm = ceil(2·3.7·(1.96+0.8416)²/0.25) and the MDE at
    a half split uses floor(5/2) = 2 — the closed forms recomputed
    by hand with the module's fixed constants."""
    t0 = "2024-01-01 00:00:00"
    rows = [
        (1, t0, 1, "purchase", 1.0), (2, t0, 1, "purchase", 2.0),
        (3, t0, 1, "purchase", 3.0),
        (4, t0, 2, "view", 4.0), (5, t0, 2, "view", 6.0),
        (6, t0, 3, "click", 999.0),  # excluded event type
    ]
    sf_dir = _mini_events_typed(tmp_path, rows)
    (r,) = (
        all_queries()["stat_power_sample_size"].fn(spark, sf_dir).collect()
    )
    zsum = 1.96 + 0.8416
    assert float(r["variance"]) == 3.7
    assert int(r["n_observed"]) == 5
    assert int(r["n_per_arm"]) == math.ceil(2 * 3.7 * zsum**2 / 0.25)
    assert float(r["mde_at_half_split"]) == round(
        zsum * math.sqrt(2 * 3.7 / 2) - 1e-9, 4
    )
