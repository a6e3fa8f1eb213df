"""Scale-independent invariants for the round-7 stats/analytics
additions — properties that must hold at ANY scale factor, plus
degenerate-input guards for the failure classes the sf0.1 drives
have historically caught (ANSI divide-by-zero, NaN-vs-NULL)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ondemand_dask_spark.registry import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def km(spark, sf_dir):
    return (
        QUERIES["stat_kaplan_meier"]
        .fn(spark, sf_dir)
        .orderBy("duration_day")
        .toPandas()
    )


def test_km_survival_monotone_nonincreasing_in_unit_interval(km):
    s = km["km_survival"].tolist()
    assert all(0.0 <= v <= 1.0 for v in s)
    # allow 1-ulp-at-4dp slack from the per-row rounding
    assert all(a >= b - 1e-4 for a, b in zip(s, s[1:]))


def test_km_at_risk_accounting(km):
    # n_risk at the first duration equals everyone; each later at-risk
    # set shrinks by exactly the events+censored that left before it.
    expected = km["n_event"].sum() + km["n_censored"].sum()
    assert km["n_risk"].iloc[0] == expected
    left = (km["n_event"] + km["n_censored"]).cumsum().shift(1).fillna(0)
    assert (km["n_risk"] == expected - left).all()


def test_mann_kendall_s_within_pair_bound(spark, sf_dir):
    out = QUERIES["stat_mann_kendall"].fn(spark, sf_dir).toPandas()
    for _, r in out.iterrows():
        bound = r.n_days * (r.n_days - 1) / 2
        assert abs(r.s_stat) <= bound
        assert r.var_s > 0


def test_burstiness_bounds_and_constant_gap_user(spark, sf_dir):
    out = QUERIES["events_burstiness_index"].fn(spark, sf_dir).toPandas()
    r = out.iloc[0]
    assert -1.0 <= r.min_burstiness <= r.mean_burstiness <= r.max_burstiness <= 1.0
    assert 0 <= r.n_bursty <= r.n_users
    # inline degenerate pin: a metronome user (constant gaps) must land
    # exactly at B = -1 via the same guarded expression, not error.
    t0 = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": range(4),
            "ts": [t0 + datetime.timedelta(seconds=60 * i) for i in range(4)],
        }
    )
    mini = spark.createDataFrame(pdf)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = mini.select("user_id", (us - F.lag(us).over(w)).alias("g"))
    b = (
        gaps.groupBy("user_id")
        .agg(F.avg("g").alias("mu"), F.stddev_samp("g").alias("sigma"))
        .select(
            (
                (F.col("sigma") - F.col("mu"))
                / F.nullif(F.col("sigma") + F.col("mu"), F.lit(0.0))
            ).alias("b")
        )
        .collect()[0]
        .b
    )
    assert b == -1.0


def test_tost_zero_variance_yields_null_not_error(spark):
    """Both groups constant → se = 0 → the guarded t stats must be
    NULL, never ANSI DIVIDE_BY_ZERO."""
    pdf = pd.DataFrame(
        {
            "event_type": ["purchase"] * 3 + ["view"] * 3,
            "value": [5.0] * 6,
        }
    )
    e = spark.createDataFrame(pdf)
    p = F.when(F.col("event_type") == "purchase", F.col("value"))
    v = F.when(F.col("event_type") == "view", F.col("value"))
    g = e.agg(
        F.avg(p).alias("m1"), F.var_samp(p).alias("v1"),
        F.count(p).alias("n1"),
        F.avg(v).alias("m2"), F.var_samp(v).alias("v2"),
        F.count(v).alias("n2"),
    )
    se = F.nullif(
        F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")),
        F.lit(0.0),
    )
    row = g.select(((F.col("m1") - F.col("m2")) / se).alias("t")).collect()[0]
    assert row.t is None


def test_learning_curve_nested_training_sets(spark, sf_dir):
    out = (
        QUERIES["ml_learning_curve"]
        .fn(spark, sf_dir)
        .orderBy("train_buckets")
        .toPandas()
    )
    assert out["train_buckets"].tolist() == [4, 8, 15]
    n = out["n_train"].tolist()
    assert n[0] < n[1] < n[2]  # strictly nested subsets
    assert (out["mse"] > 0).all()


def test_dau_wau_stickiness_bounds(spark, sf_dir):
    out = QUERIES["events_dau_wau_stickiness"].fn(spark, sf_dir).toPandas()
    assert (out["wau"] >= out["dau"]).all()
    assert ((out["stickiness"] > 0) & (out["stickiness"] <= 1.0)).all()


def test_band_energy_pure_tone_dominates(spark):
    """A synthesized pure tone at probe bin 2 must win dominant_bin —
    pins the decoder offset, the basis sign, and the argmax tie rule
    end-to-end through the REAL WAV bytes."""
    import struct

    import numpy as np

    from ondemand_dask_spark.queries.multimodal import (
        _BAND_N,
        multimodal_audio_band_energy,
    )

    n = _BAND_N
    tone = (
        (np.sin(2.0 * np.pi * 2 * np.arange(n) / n) * 20000)
        .astype("<i2")
        .tobytes()
    )
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(tone))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(tone))
    )
    payload = header + tone
    pdf = pd.DataFrame({"doc_id": [1], "mime": ["audio/wav"],
                        "payload": [payload]})
    src = spark.createDataFrame(pdf)
    # Reuse the registered query's extractor by monkey-free plumbing:
    # the mapInPandas stage is the function under test, so apply the
    # same schema-preserving stage to a hand-built media frame.
    import ondemand_dask_spark.queries.multimodal as mm

    orig = mm._real_media
    try:
        mm._real_media = lambda spark_, sf_dir_: src
        out = multimodal_audio_band_energy(spark, "unused").toPandas()
    finally:
        mm._real_media = orig
    assert out.iloc[0].dominant_bin == 2
    assert out.iloc[0].p2 > out.iloc[0].p1
    assert out.iloc[0].p2 > out.iloc[0].p4


def test_proportions_degenerate_all_purchase_null_z(spark):
    pdf = pd.DataFrame(
        {"user_id": [0, 1, 2, 3], "event_type": ["purchase"] * 4}
    )
    e = spark.createDataFrame(pdf)
    even = F.col("user_id") % 2 == 0
    purchase = F.col("event_type") == "purchase"
    c = e.agg(
        F.count(F.when(even, 1)).cast("double").alias("na"),
        F.count(F.when(~even, 1)).cast("double").alias("nb"),
        F.count(F.when(even & purchase, 1)).cast("double").alias("xa"),
        F.count(F.when(~even & purchase, 1)).cast("double").alias("xb"),
    )
    na, nb, xa, xb = (F.col(x) for x in ("na", "nb", "xa", "xb"))
    pp = (xa + xb) / (na + nb)
    z = (xa / na - xb / nb) / F.nullif(
        F.sqrt(pp * (1 - pp) * (1 / na + 1 / nb)), F.lit(0.0)
    )
    assert c.select(z.alias("z")).collect()[0].z is None


def test_skyline_mutually_nondominated_and_complete(spark, sf_dir):
    """Brute-force dominance check: every returned part is
    undominated, and every omitted part is dominated by some
    returned one (on the deduped value set)."""
    out = QUERIES["part_skyline_frontier"].fn(spark, sf_dir).toPandas()
    allp = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size")
        .toPandas()
    )
    sky = set(zip(out.p_retailprice.round(4), out.p_size))

    def dominated(price, size):
        return any(
            (sp <= price and ss <= size) and (sp < price or ss < size)
            for sp, ss in sky
        )

    for _, r in out.iterrows():
        assert not dominated(round(r.p_retailprice, 4), r.p_size)
    kept_keys = set(out.p_partkey)
    for _, r in allp.iterrows():
        if r.p_partkey not in kept_keys:
            assert dominated(round(r.p_retailprice, 4), r.p_size) or (
                (round(r.p_retailprice, 4), r.p_size) in sky
            )


def test_global_prefix_min_matches_sequential_window(spark):
    """The distributed strict prefix-min is bitwise identical to the
    single-task window form on a shuffled frame."""
    import numpy as np

    from pyspark.sql.window import Window as W

    from ondemand_dask_spark.operators.rank import global_prefix_min

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "k": rng.permutation(500),
            "v": rng.randint(0, 50, 500),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = (
        global_prefix_min(df, "v", "k", col_name="pm")
        .orderBy("k")
        .toPandas()
    )
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    want = (
        df.withColumn("pm", F.min("v").over(w)).orderBy("k").toPandas()
    )
    assert got.pm.fillna(-1).tolist() == want.pm.fillna(-1).tolist()


def test_geo_ring_blocking_loses_no_pair(spark, sf_dir):
    """Completeness of the 3×3 cell-ring blocking: every supplier
    pair within the radius per brute-force haversine must appear in
    the blocked result (the blocking may only DROP non-candidates,
    never true pairs — cell size 10° ≈ 1100 km ≫ 500 km radius)."""
    import numpy as np

    from ondemand_dask_spark.queries.geo import (
        _PAIR_RADIUS_KM,
        _haversine_km,
        _lat_col,
        _lon_col,
    )

    out = QUERIES["geo_pairs_within_radius"].fn(spark, sf_dir).toPandas()
    got = {(a, b) for a, b in zip(out.a, out.b)}

    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select(
            "s_suppkey",
            _lat_col(F.col("s_suppkey")).alias("lat"),
            _lon_col(F.col("s_suppkey")).alias("lon"),
        )
        .toPandas()
    )
    lat = np.radians(supp.lat.to_numpy())
    lon = np.radians(supp.lon.to_numpy())
    keys = supp.s_suppkey.to_numpy()
    want = set()
    for i in range(len(keys)):
        dphi = (lat - lat[i]) / 2
        dlmb = (lon - lon[i]) / 2
        a = np.sin(dphi) ** 2 + np.cos(lat[i]) * np.cos(lat) * np.sin(dlmb) ** 2
        d = 2 * 6371.0 * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
        for j in np.nonzero(d <= _PAIR_RADIUS_KM)[0]:
            if keys[i] < keys[j]:
                want.add((keys[i], keys[j]))
    # rounding at the radius boundary may flip a pair at exactly
    # 500.0000 km; allow the blocked set to differ only there
    missing = want - got
    for a, b in missing:
        i = np.nonzero(keys == a)[0][0]
        j = np.nonzero(keys == b)[0][0]
        dphi = (lat[j] - lat[i]) / 2
        dlmb = (lon[j] - lon[i]) / 2
        aa = (
            np.sin(dphi) ** 2
            + np.cos(lat[i]) * np.cos(lat[j]) * np.sin(dlmb) ** 2
        )
        d = 2 * 6371.0 * np.arcsin(np.sqrt(aa))
        assert abs(d - _PAIR_RADIUS_KM) < 1e-3, (a, b, d)
    # and it must never invent pairs beyond brute force either
    assert not (got - want), f"invented pairs: {sorted(got - want)[:5]}"


def test_revenue_bridge_additivity(spark, sf_dir):
    """volume_effect + price_effect must reconstruct delta_revenue
    exactly (up to the 4 dp rounding of each addend)."""
    out = QUERIES["orders_revenue_bridge"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    resid = (
        out.volume_effect + out.price_effect - out.delta_revenue
    ).abs()
    assert (resid < 3e-4).all()


def test_ljung_box_nonnegative(spark, sf_dir):
    out = QUERIES["stat_ljung_box"].fn(spark, sf_dir).toPandas()
    assert (out.q_stat >= 0).all()
    assert (out.df == 7).all()


def test_conversion_rate_bounds(spark, sf_dir):
    out = (
        QUERIES["events_view_to_purchase_conversion"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    assert (out.n_converted <= out.n_views).all()
    assert ((out.conversion_rate >= 0) & (out.conversion_rate <= 1)).all()


def test_alarm_debounce_min_run_length(spark, sf_dir):
    out = QUERIES["events_alarm_debounce"].fn(spark, sf_dir).toPandas()
    assert (out.run_len >= 3).all()
    assert (out.run_end >= out.run_start).all()


def test_uniqueness_report_consistency(spark, sf_dir):
    out = QUERIES["dq_uniqueness_report"].fn(spark, sf_dir).toPandas()
    assert len(out) == 3
    assert (out.n_distinct + out.n_duplicate_rows == out.n_rows).all()
    assert (out.is_unique == (out.n_duplicate_rows == 0)).all()


def test_mixture_weights_normalize(spark, sf_dir):
    for name in (
        "pipeline_mixture_temperature",
        "pipeline_quality_weighted_mixture",
    ):
        out = QUERIES[name].fn(spark, sf_dir).toPandas()
        assert abs(out.weight.sum() - 1.0) < 1e-3, name
        assert (out.weight > 0).all(), name


def test_skyline_and_capture_sanity(spark, sf_dir):
    cr = QUERIES["stat_capture_recapture"].fn(spark, sf_dir).toPandas()
    r = cr.iloc[0]
    # the estimate can never undercut the directly observed union
    observed = r.n_first + r.n_second - r.n_both
    assert r.chapman_estimate >= observed - 1  # Chapman floor, ±round
    assert r.n_both <= min(r.n_first, r.n_second)
