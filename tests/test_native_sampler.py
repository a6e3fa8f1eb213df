"""Spark's NATIVE seeded Bernoulli sampler stays exercised.

`sample_seeded` (queries/relational.py) deliberately fulfills the
seeded-sampling contract with a deterministic salted-hash draw — the
native `df.sample(fraction, seed)` RNG streams by partition index and
is neither cross-engine-expressible nor repartition-stable, so it can
never carry a full oracle.  That swap removed the suite's only
execution of the native sampler path; this test restores coverage of
the engine primitive itself (r9 advisor note):

- same seed + same partitioning  -> identical sample (reproducible),
- different seed                 -> a different draw,
- draw size within binomial bounds (it really samples ~frac),
- sample is a subset of the input (no row invented or duplicated).
"""

from __future__ import annotations

import math


def test_native_seeded_sampler_contract(spark, sf_dir):
    from ondemand_dask_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    n = orders.count()
    frac, seed = 0.2, 42

    a = sorted(r.o_orderkey for r in orders.sample(frac, seed).collect())
    b = sorted(r.o_orderkey for r in orders.sample(frac, seed).collect())
    assert a == b, "same seed + same partitioning must reproduce the draw"

    c = sorted(r.o_orderkey for r in orders.sample(frac, seed + 1).collect())
    assert a != c, "a different seed must give an independent draw"

    # binomial bound: |k - n*frac| < 6 * sqrt(n*frac*(1-frac))
    k = len(a)
    sigma = math.sqrt(n * frac * (1 - frac))
    assert abs(k - n * frac) < 6 * sigma, (k, n)

    universe = {r.o_orderkey for r in orders.collect()}
    assert set(a) <= universe and len(set(a)) == len(a)
