"""Completeness property of the prefix-filter set-similarity join.

`join_set_similarity` blocks on df-ordered prefix tokens; the prefix
bound (|set| - ceil(t·|set|) + 1) must never exclude a qualifying
pair.  The registered query proves it on the fixture corpus against
the brute-force DuckDB oracle; here adversarial synthetic sets cover
the corners: pairs AT the threshold exactly, pairs just under, sets
of different sizes, shared tokens placed only at the END of the
frequency order (the worst case for a too-short prefix), and the
binary-float ceil trap (t·n landing on an integer).
"""

from __future__ import annotations

import itertools
import random

from ondemand_dask_spark.queries.joins import _SSJ_T


def _brute(sets: dict[int, frozenset]) -> set[tuple[int, int]]:
    out = set()
    for (ia, a), (ib, b) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(a & b)
        if inter and inter / (len(a) + len(b) - inter) >= _SSJ_T:
            out.add((ia, ib))
    return out


def _run_spark(spark, sets: dict[int, frozenset]) -> set[tuple[int, int]]:
    """Run the same prefix-filter pipeline the registered query uses,
    over synthetic part rows (p_partkey, p_name)."""
    import pandas as pd

    from ondemand_dask_spark.queries.joins import join_set_similarity

    rows = [(k, " ".join(sorted(toks))) for k, toks in sets.items()]
    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_name"])
    # join_set_similarity reads `part` via load_table(sf_dir) — point
    # it at a scratch parquet dir shaped like a fixture sf dir
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "ssj_prop_fixture")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "part.parquet")
    )
    got = join_set_similarity(spark, d).collect()
    return {(r.pa, r.pb) for r in got}


def test_prefix_filter_complete_on_adversarial_sets(spark):
    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(60)]
    sets: dict[int, frozenset] = {}
    k = 0
    # planted pairs at and just under the threshold, several set sizes
    for size in (3, 4, 5, 6, 8, 10):
        for _ in range(8):
            base = frozenset(rng.sample(vocab, size))
            sets[k] = base
            k += 1
            # exactly ceil(t*size) shared tokens — ON the boundary
            import math

            shared = math.ceil(_SSJ_T * size)
            keep = rng.sample(sorted(base), shared)
            extra = [w for w in vocab if w not in base]
            variant = frozenset(
                keep + rng.sample(extra, size - shared)
            )
            sets[k] = variant
            k += 1
    # background noise
    for _ in range(80):
        sets[k] = frozenset(rng.sample(vocab, rng.randint(3, 10)))
        k += 1
    assert _run_spark(spark, sets) == _brute(sets)


def test_prefix_filter_boundary_ceil_exact_multiple(spark):
    """t·n an exact integer (n = 5, t = 0.6 → bound 3): a pair
    sharing exactly 3 of 5 tokens has J = 3/7 < 0.6 (excluded), but
    4 of 5 gives 4/6 ≥ 0.6 (must be found) — the prefix bound must
    use ceil(3.0) = 3, not the binary-float ceil(3.0000000000000004)
    = 4 that would shorten the prefix below completeness."""
    sets = {
        0: frozenset(["a", "b", "c", "d", "e"]),
        1: frozenset(["a", "b", "c", "d", "z"]),  # J = 4/6 — in
        2: frozenset(["a", "b", "c", "y", "z"]),  # J = 3/7 — out
    }
    got = _run_spark(spark, sets)
    assert (0, 1) in got
    assert (0, 2) not in got
    assert got == _brute(sets)
