"""Property pins for the round-6 operators whose correctness has a
sharp structural bound (not visible at fixture scale alone)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hier_doubling_rounds_boundaries():
    """The metadata-driven round count must cover the tree depth of
    any key it is asked about: R rounds resolve chains ≤ 2^R, and
    depth(k) is the number of //4 steps to a root ≤ 3.  Pin the exact
    boundaries (4^16 is the last key 4 rounds cover; 4^17 was the r8
    cliff; int64 max needs exactly 5) and the derivation itself
    against a brute-force climb."""
    from ondemand_dask_spark.queries.composed import _hier_doubling_rounds

    def brute_depth(k: int) -> int:
        d = 0
        while k > 3:
            k //= 4
            d += 1
        return d

    for k in [1, 3, 4, 7, 16, 20_000, 4**16, 4**16 + 1, 4**17,
              2**63 - 1]:
        r = _hier_doubling_rounds(k)
        assert 2**r >= max(brute_depth(k), 1), (k, r)
        # and never over-pays by a full doubling round
        assert r == 0 or 2 ** (r - 1) < max(brute_depth(k), 1), (k, r)
    assert _hier_doubling_rounds(4**16) == 4
    assert _hier_doubling_rounds(4**17) == 5
    assert _hier_doubling_rounds(2**63 - 1) == 5
    assert _hier_doubling_rounds(20_000) == 3  # sf0.1's max partkey


def test_pointer_doubling_resolves_depth_16_chain(spark):
    """Drive the SAME doubling logic the rollup uses over a synthetic
    parent chain of depth exactly 2^4 with 4 rounds and assert every
    node resolves to the root — R rounds covering depth 2^R is the
    contract the metadata-driven derivation relies on."""
    rounds = 4
    depth = 2**rounds
    # chain: node i's parent is i-1; node 0 is the root (self-loop)
    nodes = spark.range(0, depth + 1).select(
        F.col("id").alias("node"),
        F.greatest(F.col("id") - 1, F.lit(0)).alias("anc"),
    )
    ptr = nodes
    for _ in range(rounds):
        a, b = ptr.alias("a"), ptr.alias("b")
        ptr = a.join(b, F.col("a.anc") == F.col("b.node")).select(
            F.col("a.node").alias("node"), F.col("b.anc").alias("anc")
        )
    got = {r.node: r.anc for r in ptr.collect()}
    assert len(got) == depth + 1
    # depth-16 chain: every node's 16-step ancestor is the root
    assert all(v == 0 for v in got.values()), got


def test_target_encode_isolated_user_falls_back_to_global_mean(spark):
    """A category whose rows all share one fold has no out-of-fold
    evidence; the encoder must emit the global mean, never a leaked
    self-mean."""
    import pandas as pd

    from ondemand_dask_spark.functions.texthash import portable_hash64

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [10, 10, 10, 20, 20, 99],
            "value": [1.0, 2.0, 3.0, 10.0, 20.0, 500.0],
        }
    )
    e = spark.createDataFrame(pdf)
    folds = 5
    f = e.select(
        "event_id",
        "user_id",
        "value",
        (portable_hash64(F.col("event_id").cast("string")) % folds).alias(
            "fold"
        ),
    )
    from pyspark.sql.window import Window

    pf = f.groupBy("user_id", "fold").agg(
        F.sum("value").alias("s"), F.count("*").alias("c")
    )
    wu = Window.partitionBy("user_id")
    tot = pf.select(
        "user_id", "fold", "s", "c",
        F.sum("s").over(wu).alias("s_all"),
        F.sum("c").over(wu).alias("c_all"),
    )
    g = e.agg(F.avg("value").alias("gmean"))
    oof = (F.col("s_all") - F.col("s")) / F.nullif(
        F.col("c_all") - F.col("c"), F.lit(0)
    )
    out = (
        f.join(tot, ["user_id", "fold"])
        .crossJoin(F.broadcast(g))
        .select(
            "event_id",
            "user_id",
            "fold",
            F.coalesce(oof, F.col("gmean")).alias("te"),
        )
    )
    rows = {r.event_id: r for r in out.collect()}
    gmean = sum(pdf["value"]) / len(pdf)
    # user 99 has a single row — necessarily fold-isolated
    assert abs(rows[6].te - gmean) < 1e-9
    # any user row whose fold holds ALL of that user's rows gets gmean;
    # rows with out-of-fold evidence must NOT include their own fold
    by_user_fold = {}
    for eid, r in rows.items():
        by_user_fold.setdefault((r.user_id, r.fold), []).append(eid)
    for r in rows.values():
        user_rows = pdf[pdf.user_id == r.user_id]
        fold_ids = by_user_fold[(r.user_id, r.fold)]
        others = user_rows[~user_rows.event_id.isin(fold_ids)]
        if len(others) == 0:
            assert abs(r.te - gmean) < 1e-9
        else:
            assert abs(r.te - others["value"].mean()) < 1e-9


def test_round6_plan_shapes(spark, sf_dir):
    """Exchange-count pins for the round-6 operators: each plan's
    shuffle budget is part of its contract (the docstrings argue the
    shape; this keeps the argument true).  Counts are upper bounds —
    a drop is fine, a rise means a shuffle crept in."""
    from ondemand_dask_spark.plans import shuffle_count
    from ondemand_dask_spark.registry import all_queries

    qs = all_queries()
    budget = {
        # measured at the fixture SF and pinned as ceilings; most
        # exchanges here are 1-row/vocab-sized aggregate builds for
        # broadcast attaches (cheap at any scale) — the pin guards
        # against a DATA-sized shuffle creeping in, which would show
        # up as a count above these.
        "stat_ols_by_group": 1,
        "ml_eval_regression": 3,
        "ml_eval_logloss": 3,
        "ml_calibration_bins": 2,
        "feature_woe_iv": 3,
        "stat_cuped_adjustment": 4,
        "stat_fdr_bh": 5,
        "ts_seasonal_decompose": 3,
        "ts_seasonal_naive_eval": 3,
        "ts_changepoint_binary": 2,
        "feature_target_encode_cv": 3,
        "join_fuzzy_entity_resolution": 0,
        "layout_file_skipping_stats": 2,
        "layout_zorder_key": 1,
    }
    over = []
    for name, cap in budget.items():
        n = shuffle_count(qs[name].fn(spark, sf_dir))
        if n > cap:
            over.append(f"{name}: {n} exchanges > budget {cap}")
    assert not over, over
