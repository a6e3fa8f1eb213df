"""Scale-independent invariants for the round-7 closing additions
(PQ codebook, multi-touch attribution, Brown-Forsythe, RAKE,
double exponential smoothing, k-anonymity, Fisher exact, cardinality
estimator, lexical diversity, Bayesian A/B, jackknife) — properties
that must hold at ANY scale factor, independent of the DuckDB
differential the oracle tests already run."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import all_queries

QUERIES = all_queries()


def _pdf(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir).toPandas()


# --- embedding_pq_codebook -------------------------------------------------


@pytest.fixture(scope="module")
def pq(spark, sf_dir):
    return _pdf("embedding_pq_codebook", spark, sf_dir)


def test_pq_partitions_every_vector_in_every_subspace(pq, spark, sf_dir):
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    per_sub = pq.groupby("subspace")["n_members"].sum()
    assert len(per_sub) == 4
    assert (per_sub == n_vec).all()


def test_pq_refined_codebook_not_worse_than_seed_assignment(
    pq, spark, sf_dir
):
    # Lloyd monotonicity: total quantization error after the
    # (recompute centroids -> reassign) round must not exceed the
    # seed-codebook assignment error.  Recompute the seed-side error
    # directly (the query's internal d1/a1 stage, re-derived here).
    from ondemand_dask_spark.queries.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
        _sqdist,
    )
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")

    def subs_of(df):
        pieces = F.array(*[
            F.struct(
                F.lit(m).cast("long").alias("m"),
                F.slice("embedding", m * _PQ_SUBDIM + 1, _PQ_SUBDIM)
                .alias("sub"),
            )
            for m in range(_PQ_M)
        ])
        return df.select("vec_id", F.explode(pieces).alias("s")).select(
            "vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub")
        )

    subs = subs_of(e)
    seeds = subs_of(e.filter(F.col("vec_id") < _PQ_K)).select(
        F.col("vec_id").alias("code"), "m", F.col("sub").alias("csub")
    )
    d1 = subs.join(F.broadcast(seeds), "m").select(
        "vec_id", "m", "code",
        _sqdist(F.col("sub"), F.col("csub")).alias("dist"),
    )
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.round(F.col("dist"), 6), "code"
    )
    seed_total = (
        d1.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .agg(F.sum("dist"))
        .collect()[0][0]
    )
    refined_total = float((pq["avg_sqdist"] * pq["n_members"]).sum())
    assert refined_total <= seed_total * (1 + 1e-6)


# --- events_attribution_multi_touch ----------------------------------------


@pytest.fixture(scope="module")
def mt(spark, sf_dir):
    return _pdf("events_attribution_multi_touch", spark, sf_dir)


def test_multi_touch_credit_conservation(mt, spark, sf_dir):
    # Linear credit sums to exactly the number of purchases that had
    # at least one in-window touch; both revenue models distribute
    # the same attributable revenue pool.
    from ondemand_dask_spark.queries.composed import _ATTR_TOL_US

    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        ts_us.alias("p_us"), "value",
    )
    s = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("s_uid"), ts_us.alias("s_us")
    )
    touched = (
        p.join(
            s,
            (p["user_id"] == F.col("s_uid"))
            & (F.col("s_us") <= F.col("p_us"))
            & (F.col("p_us") - F.col("s_us") <= _ATTR_TOL_US),
            "left_semi",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("rev"))
        .collect()[0]
    )
    assert abs(mt["credited_purchases"].sum() - touched["n"]) < 1e-3
    assert abs(mt["revenue_linear"].sum() - touched["rev"]) < 1e-2
    assert abs(mt["revenue_decay"].sum() - touched["rev"]) < 1e-2


# --- stat_brown_forsythe / stat_fisher_exact --------------------------------


def test_brown_forsythe_stat_nonnegative_and_counts(spark, sf_dir):
    row = _pdf("stat_brown_forsythe", spark, sf_dir).iloc[0]
    n = load_table(spark, sf_dir, "lineitem").count()
    assert row["n_total"] == n
    assert row["k_groups"] == 3
    assert row["bf_stat"] >= 0.0


def test_fisher_exact_probability_axioms(spark, sf_dir):
    row = _pdf("stat_fisher_exact", spark, sf_dir).iloc[0]
    # point prob <= one-sided <= 1; two-sided includes the observed
    # table so it is >= point; all are probabilities.
    for c in ("p_point", "p_one_sided", "p_two_sided"):
        assert 0.0 <= row[c] <= 1.0
    assert row["p_one_sided"] >= row["p_point"] - 1e-4
    assert row["p_two_sided"] >= row["p_point"] - 1e-4
    assert row["n_both"] <= min(row["n_treat"], row["n_exposed"])


def test_lnfact_matches_lgamma_across_the_seam():
    # The Spark-side portable ln(n!) (lookup + Stirling) must agree
    # with math.lgamma to ~1e-10 on both sides of the n=10 switch.
    from ondemand_dask_spark.queries.aggregations import _LNFACT_SMALL

    for n, v in enumerate(_LNFACT_SMALL):
        assert abs(v - math.lgamma(n + 1)) < 1e-12
    # Stirling tail (n >= 11), evaluated in plain python mirroring
    # the Column arithmetic exactly.
    for n in (11, 12, 20, 100, 5000):
        x = float(n)
        stirling = (
            0.5 * math.log(2.0 * math.pi)
            + (x + 0.5) * math.log(x)
            - x
            + 1.0 / (12.0 * x)
            - 1.0 / (360.0 * x ** 3)
            + 1.0 / (1260.0 * x ** 5)
        )
        assert abs(stirling - math.lgamma(n + 1)) < 1e-9


# --- text_keyphrase_rake ----------------------------------------------------


def test_rake_phrases_contain_no_stopwords_and_scores_ranked(
    spark, sf_dir
):
    from ondemand_dask_spark.queries.text import STOPWORDS

    df = _pdf("text_keyphrase_rake", spark, sf_dir)
    assert len(df) == 15
    for phrase in df["phrase"]:
        assert phrase  # non-empty
        assert not set(phrase.split(" ")) & set(STOPWORDS)
    scores = df["rake_score"].tolist()
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


# --- ts_double_exp_smoothing -------------------------------------------------


def test_double_smoothing_reproduces_the_recursion(spark, sf_dir):
    # The closed-form weighted-sum S1 must equal the textbook
    # adjust=True EWM recursion, per series, at full precision
    # (modulo the 4dp output rounding).
    from ondemand_dask_spark.queries.windows import _DES_A

    df = _pdf("ts_double_exp_smoothing", spark, sf_dir)
    for etype, grp in df.groupby("event_type"):
        grp = grp.sort_values("day")
        num = den = 0.0
        for y, s1 in zip(grp["y"], grp["s1"]):
            num = num * (1 - _DES_A) + y
            den = den * (1 - _DES_A) + 1.0
            assert abs(num / den - s1) < 5e-4, etype


# --- privacy_k_anonymity ------------------------------------------------------


def test_k_anonymity_monotone_in_threshold(spark, sf_dir):
    df = _pdf("privacy_k_anonymity", spark, sf_dir).sort_values(
        "k_threshold"
    )
    assert (df["groups_below"].diff().dropna() >= 0).all()
    assert (df["rows_below"].diff().dropna() >= 0).all()
    assert (df["suppression_cost"].diff().dropna() >= -1e-9).all()
    assert (df["min_l_diversity"] >= 1).all()
    # rows_below under threshold t is < t * groups_below by definition
    assert (
        df["rows_below"] <= (df["k_threshold"] - 1) * df["groups_below"]
    ).all()


# --- join_cardinality_estimate ------------------------------------------------


def test_cardinality_estimate_bounds(spark, sf_dir):
    row = _pdf("join_cardinality_estimate", spark, sf_dir).iloc[0]
    # Cauchy-Schwarz: exact self-join size >= uniform estimate.
    assert row["exact_join_rows"] >= row["uniform_est_rows"] - 1e-6
    assert row["top_key_pairs"] <= row["exact_join_rows"]
    assert row["skew_ratio"] >= 1.0 - 1e-9
    assert row["n_keys"] <= row["n_rows"]


# --- ml_feature_gain_stump ----------------------------------------------------


def test_stump_gain_bounded_by_parent_gini(spark, sf_dir):
    df = _pdf("ml_feature_gain_stump", spark, sf_dir)
    assert len(df) >= 2  # f_types may be constant (unsplittable)
    assert (df["best_gain"] >= -1e-9).all()
    assert (df["parent_gini"] <= 0.5 + 1e-9).all()
    # a split can never remove more impurity than the parent holds
    assert (df["best_gain"] <= df["parent_gini"] + 1e-9).all()
    assert df["best_split_bin"].between(0, 8).all()


# --- orders_backlog_aging ------------------------------------------------------


def test_backlog_aging_accounts_for_every_open_order(spark, sf_dir):
    df = _pdf("orders_backlog_aging", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "P")
    )
    n, total = o.agg(F.count("*"), F.sum("o_totalprice")).collect()[0]
    assert df["n_orders"].sum() == n
    assert abs(df["open_value"].sum() - total) < 1e-2
    assert set(df["age_bucket"]) <= {
        "a_0_30", "b_31_90", "c_91_365", "d_over_365"
    }


# --- graph_personalized_pagerank ----------------------------------------------


def test_ppr_mass_conservation_and_seed_dominance(spark, sf_dir):
    df = _pdf("graph_personalized_pagerank", spark, sf_dir)
    assert len(df) <= 20
    assert (df["ppr"] > 0).all()
    # the walk distributes exactly one unit of mass (symmetric graph,
    # no dangling nodes): the reported top-20 can never exceed it
    assert df["ppr"].sum() <= 1.0 + 1e-6
    # scores arrive ranked
    s = df["ppr"].tolist()
    assert s == sorted(s, reverse=True)


# --- str_extractall -------------------------------------------------------------


def test_extractall_matches_pattern_and_indexes_dense(spark, sf_dir):
    df = _pdf("str_extractall", spark, sf_dir)
    assert (df["match"].str.match(r"s[a-z]+$")).all()
    # match_idx is dense 0..k-1 per doc
    for _, grp in df.groupby("doc_id"):
        idx = sorted(grp["match_idx"])
        assert idx == list(range(len(idx)))


# --- ann_pq_adc_topk -------------------------------------------------------------


def test_adc_topk_shape_and_exclusions(spark, sf_dir):
    df = _pdf("ann_pq_adc_topk", spark, sf_dir)
    assert set(df["query_id"]) == {0, 1, 2}
    assert (df["candidate_id"] >= 3).all()  # queries never candidates
    assert (df["adc_sqdist"] >= 0).all()
    for _, grp in df.groupby("query_id"):
        assert sorted(grp["rnk"]) == [1, 2, 3, 4, 5]
        by_rank = grp.sort_values("rnk")["adc_sqdist"].tolist()
        assert by_rank == sorted(by_rank)
