"""Hand-computed known answers for composed/encoding queries in the
r9 driver window — same independent-third-algorithm discipline as
tests/test_windows_known_answers.py (the differential alone cannot
catch a formula misread both engines share)."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from ondemand_dask_spark.registry import all_queries

QUERIES = all_queries()


def _mini_events(tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_burstiness_index_hand_values(spark, tmp_path):
    """User 1 is a metronome (gaps 10 s, 10 s, 10 s → σ=0, μ>0 →
    B = −1 exactly); user 2 has gaps 0, 0, 6 s → μ=2 s,
    σ=sqrt((4+4+16)/2)=2√3 s → B=(√3−1)/(√3+1) ≈ +0.2679 (bursty);
    user 3 has a single gap → excluded (sample σ undefined).  The
    summary is over exactly the two B values."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", 1, "v", 1.0),
            (2, "2024-01-01 00:00:10", 1, "v", 1.0),
            (3, "2024-01-01 00:00:20", 1, "v", 1.0),
            (4, "2024-01-01 00:00:30", 1, "v", 1.0),
            (5, "2024-01-01 00:00:00", 2, "v", 1.0),
            (6, "2024-01-01 00:00:00", 2, "v", 1.0),
            (7, "2024-01-01 00:00:00", 2, "v", 1.0),
            (8, "2024-01-01 00:00:06", 2, "v", 1.0),
            (9, "2024-01-01 00:00:00", 3, "v", 1.0),
            (10, "2024-01-01 00:00:09", 3, "v", 1.0),
        ],
    )
    (row,) = QUERIES["events_burstiness_index"].fn(spark, sf_dir).collect()
    b2 = (math.sqrt(3) - 1) / (math.sqrt(3) + 1)  # ≈ 0.26794919
    assert row["n_users"] == 2
    assert row["n_bursty"] == 1
    assert float(row["min_burstiness"]) == -1.0
    assert float(row["max_burstiness"]) == pytest.approx(b2, abs=2e-4)
    assert float(row["mean_burstiness"]) == pytest.approx(
        (-1.0 + b2) / 2, abs=2e-4
    )
    assert float(row["sd_burstiness"]) == pytest.approx(
        (b2 - (-1.0)) / math.sqrt(2), abs=2e-4
    )


def test_alarm_debounce_hand_islands(spark, tmp_path):
    """User 1's type sequence err,err,err,click,err has maximal runs
    err×3 (kept — the only run ≥ 3), click×1, err×1 (both glitches).
    The err×3 island must NOT absorb the post-click err (the classic
    gaps-and-islands off-by-one)."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 1, "err", 1.0),
            (2, "2024-01-01 00:00:02", 1, "err", 1.0),
            (3, "2024-01-01 00:00:03", 1, "err", 1.0),
            (4, "2024-01-01 00:00:04", 1, "click", 1.0),
            (5, "2024-01-01 00:00:05", 1, "err", 1.0),
        ],
    )
    rows = QUERIES["events_alarm_debounce"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["event_type"] == "err" and int(r["run_len"]) == 3
    assert str(r["run_start"]).startswith("2024-01-01 00:00:01")
    assert str(r["run_end"]).startswith("2024-01-01 00:00:03")


def test_encode_standardize_hand_zscores(spark, tmp_path):
    """Orders with totalprice 1, 2, 3: μ=2, sample σ=1 → z-scores
    exactly −1, 0, 1."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "o_totalprice": [1.0, 2.0, 3.0]}
    ).to_parquet(os.path.join(sf_dir, "orders.parquet"))
    got = {
        int(r["o_orderkey"]): float(r["price_z"])
        for r in QUERIES["encode_standardize"].fn(spark, sf_dir).collect()
    }
    assert got == {1: -1.0, 2: 0.0, 3: 1.0}


def test_cohort_revenue_curve_hand_ltv(spark, tmp_path):
    """User 1 first seen (a non-purchase view) on Jan 1: purchases
    5 on Jan 1 (offset 0), 7 on Jan 3 (offset 2), 100 on Jan 10
    (offset 9 → beyond the 7-day horizon, excluded).  User 2 first
    seen Jan 2, purchase 3 the same day.  Cumulative per cohort by
    hand: Jan-1 cohort 5 → 12; Jan-2 cohort 3."""
    sf_dir = _mini_events(
        tmp_path,
        [
            (1, "2024-01-01 08:00:00", 1, "view", None),
            (2, "2024-01-01 09:00:00", 1, "purchase", 5.0),
            (3, "2024-01-03 09:00:00", 1, "purchase", 7.0),
            (4, "2024-01-10 09:00:00", 1, "purchase", 100.0),
            (5, "2024-01-02 09:00:00", 2, "purchase", 3.0),
        ],
    )
    got = {
        (r["cohort_day"], int(r["offset_days"])): (
            float(r["revenue"]), float(r["cum_revenue"])
        )
        for r in QUERIES["cohort_revenue_curve"].fn(spark, sf_dir).collect()
    }
    assert got == {
        ("2024-01-01", 0): (5.0, 5.0),
        ("2024-01-01", 2): (7.0, 12.0),
        ("2024-01-02", 0): (3.0, 3.0),
    }


def _mini_documents(tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_lexical_diversity_hand_counts(spark, tmp_path):
    """Source s1 tokens: 'a a b c' + 'a d' → N=6, V=4, hapax=3,
    TTR=2/3, hapax ratio 3/4, Yule's K = 10⁴·(12−6)/36 = 1666.6667 —
    all exact integer arithmetic by hand."""
    sf_dir = _mini_documents(
        tmp_path,
        [(1, "a a b c", "en", "s1"), (2, "a d", "en", "s1")],
    )
    (r,) = (
        QUERIES["text_lexical_diversity"].fn(spark, sf_dir).collect()
    )
    assert (int(r["n_tokens"]), int(r["n_types"]), int(r["n_hapax"])) == (
        6, 4, 3,
    )
    assert float(r["type_token_ratio"]) == round(4 / 6 - 1e-9, 4)
    assert float(r["hapax_ratio"]) == 0.75
    assert float(r["yule_k"]) == round(10000 * 6 / 36 - 1e-9, 4)


def test_fingerprint_invariants(spark, tmp_path):
    """Hash values are opaque, but the min-over-windows structure
    has hand-checkable invariants: identical texts → identical
    fingerprints; < 4 tokens → excluded; and a doc whose window SET
    is a superset of another's can only have an equal-or-SMALLER
    fingerprint (min over a superset)."""
    sf_dir = _mini_documents(
        tmp_path,
        [
            (1, "w x y z", "en", "s"),
            (2, "w x y z", "en", "s"),          # identical to 1
            (3, "too few here", "en", "s"),     # 3 tokens — excluded
            (4, "p q w x y z", "en", "s"),      # windows ⊇ doc 1's
        ],
    )
    got = {
        int(r["doc_id"]): int(r["fingerprint"])
        for r in QUERIES["text_fingerprint"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 4}
    assert got[1] == got[2]
    assert got[4] <= got[1]


def test_encode_minmax_hand_scaling(spark, tmp_path):
    """Orders with totalprice 1, 2, 3 → min-max scaled exactly to
    0, 0.5, 1."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "o_totalprice": [1.0, 2.0, 3.0]}
    ).to_parquet(os.path.join(sf_dir, "orders.parquet"))
    got = {
        int(r["o_orderkey"]): float(r["price_01"])
        for r in QUERIES["encode_minmax"].fn(spark, sf_dir).collect()
    }
    assert got == {1: 0.0, 2: 0.5, 3: 1.0}


def test_ndcg_hand_ranking(spark, tmp_path):
    """User 1's model scores rank the items exactly BACKWARDS
    (gains 0, 1, 3 by descending score): DCG = 0/log2(2) + 1/log2(3)
    + 3/log2(4), IDCG = 3/log2(2) + 1/log2(3) — both by hand.  User
    2 has no positive gain anywhere → IDCG = 0 → abstains."""
    import math

    rows = [
        (1, "2024-01-01 00:00:01", 1, "purchase", 1.0),  # best item, worst score
        (2, "2024-01-01 00:00:02", 1, "view", 3.0),      # worst item, best score
        (3, "2024-01-01 00:00:03", 1, "click", 2.0),
        (4, "2024-01-01 00:00:04", 2, "view", 9.0),
        (5, "2024-01-01 00:00:05", 2, "view", 8.0),
    ]
    sf_dir = _mini_events(
        tmp_path, [(r[0], r[1], r[2], r[3], r[4]) for r in rows]
    )
    got = {
        int(r["user_id"]): float(r["ndcg_at_k"])
        for r in QUERIES["ml_eval_ndcg"].fn(spark, sf_dir).collect()
    }
    dcg = 0 / 1 + 1 / math.log2(3) + 3 / math.log2(4)
    idcg = 3 / 1 + 1 / math.log2(3)
    assert set(got) == {1}
    assert got[1] == round(dcg / idcg - 1e-9, 4)


def test_heavy_hitters_strict_threshold_boundary(spark, tmp_path):
    """K = 50 → report terms with count·50 > N, STRICTLY.  A 100-token
    corpus with 'a'×3 (150 > 100 ✓), 'b'×2 (100 > 100 ✗ — exactly on
    the boundary, must be excluded), and 95 distinct fillers (50 <
    100 ✗).  Pins the strict inequality and the share arithmetic by
    hand."""
    filler = " ".join(f"f{i}" for i in range(95))
    text = "a a a b b " + filler  # 3 + 2 + 95 = 100 tokens
    sf_dir = _mini_documents(tmp_path, [(1, text, "en", "s")])
    got = {
        r["term"]: (int(r["cnt"]), float(r["share"]))
        for r in QUERIES["pipeline_heavy_hitters"].fn(spark, sf_dir).collect()
    }
    assert got == {"a": (3, 0.03)}


def test_scd2_apply_hand_legs(spark, tmp_path):
    """Customers 1..8 with balances 10·key; the synthetic batch
    changes key 7 (+100).  Expected table state by hand: 7 untouched
    current rows, ONE closed row for key 7 (old balance, valid_to =
    effective ts, not current) and ONE inserted current row (new
    balance, valid_from = effective ts) — pins the anti/semi/insert
    leg routing and the interval stamps."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {
            "c_custkey": list(range(1, 9)),
            "c_acctbal": [10.0 * k for k in range(1, 9)],
        }
    ).to_parquet(os.path.join(sf_dir, "customer.parquet"))
    rows = QUERIES["scd2_apply_changes"].fn(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(int(r["c_custkey"]), []).append(
            (
                float(r["bal"]),
                r["valid_to"] is None,
                bool(r["is_current"]),
            )
        )
    assert len(rows) == 9  # 7 untouched + closed + inserted
    for k in (1, 2, 3, 4, 5, 6, 8):
        assert by_key[k] == [(10.0 * k, True, True)], k
    assert sorted(by_key[7]) == [
        (70.0, False, False),   # closed: old balance, bounded interval
        (170.0, True, True),    # inserted: new balance, open interval
    ]


def test_decontaminate_hand_overlaps(spark, tmp_path):
    """Benchmark doc 97 (doc_id % 97 == 0) carries 4-grams
    'a b c d' / 'b c d e'.  Train doc 1 embeds exactly one of them
    (1 hit), doc 3 embeds both (2 hits), doc 2 shares nothing
    (absent), and doc 4 is 3 tokens long (below the shingle width —
    excluded before hashing).  Counted by hand."""
    sf_dir = _mini_documents(
        tmp_path,
        [
            (97, "a b c d e", "en", "bench"),
            (1, "x a b c d y", "en", "s"),
            (2, "p q r s t u", "en", "s"),
            (3, "a b c d e z", "en", "s"),
            (4, "a b c", "en", "s"),
        ],
    )
    got = {
        int(r["doc_id"]): int(r["n_hits"])
        for r in QUERIES["pipeline_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert got == {1: 1, 3: 2}


def test_filter_cascade_hand_funnel(spark, tmp_path):
    """Five docs placed exactly on the funnel boundaries: n_chars 80
    and 1000 are inside the band (79/1001 outside), 12 tokens is the
    inclusive minimum, language allowlist en/de/fr.  Counts by hand:
    total 5, lang 4, +len 2, +tok 1; the final hash-sample stage is
    opaque but can only keep a subset of the previous stage."""
    t12 = " ".join(f"w{i}" for i in range(12))
    t11 = " ".join(f"w{i}" for i in range(11))
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [t12, t12, t12, t11, t12],
            "lang": ["en", "en", "zz", "fr", "de"],
            "source": ["s"] * 5,
            "n_chars": [80, 79, 500, 1000, 1001],
        }
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"))
    (r,) = QUERIES["pipeline_filter_cascade"].fn(spark, sf_dir).collect()
    assert (
        int(r["n_total"]), int(r["n_lang"]),
        int(r["n_len"]), int(r["n_tok"]),
    ) == (5, 4, 2, 1)
    assert 0 <= int(r["n_kept"]) <= 1
