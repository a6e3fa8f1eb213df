"""Completeness property of the multi-index Hamming blocking.

`simhash_hamming_pairs` must return EXACTLY the pairs a brute-force
O(n²) scan finds — the pigeonhole guarantee (3 flips damage ≤ 3 of
the 6 signature parts, so a 3-part combo key survives) means blocking
can never lose a qualifying pair, and the bit_count verification
means it can never admit a false one.  The fixture corpus exercises
this on real SimHashes (test_oracle); here adversarial synthetic
signatures cover the corners a corpus may never hit: planted near-dup
clusters at every distance 0-4, flips placed to damage exactly 3
parts, and uniform-random background noise.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import types as T

from ondemand_dask_spark.queries.dedup import (
    _SIMHASH_PART_OFFSETS,
    _SIMHASH_PART_WIDTHS,
    _simhash_scheme,
    simhash_hamming_pairs,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _brute_force(sigs: dict[int, int], max_h: int) -> set[tuple[int, int, int]]:
    out = set()
    for (ia, ha), (ib, hb) in itertools.combinations(sorted(sigs.items()), 2):
        d = bin(ha ^ hb).count("1")
        if d <= max_h:
            out.add((ia, ib, d))
    return out


def _run(
    spark, sigs: dict[int, int], max_h: int = 3
) -> set[tuple[int, int, int]]:
    df = spark.createDataFrame(
        [(i, h) for i, h in sigs.items()], schema=_SCHEMA
    )
    rows = simhash_hamming_pairs(df, max_hamming=max_h).collect()
    return {(r.doc_a, r.doc_b, r.hamming) for r in rows}


def test_planted_near_dups_at_every_distance(spark):
    rng = random.Random(7)
    sigs: dict[int, int] = {}
    doc = 0
    # 40 clusters: a seed signature plus variants at hamming 0..4
    # (distance-4 variants must be EXCLUDED by verification)
    for _ in range(40):
        seed = rng.getrandbits(32)
        sigs[doc] = seed
        doc += 1
        for d in (0, 1, 2, 3, 4):
            h = seed
            for bit in rng.sample(range(32), d):
                h ^= 1 << bit
            sigs[doc] = h
            doc += 1
    # background noise
    for _ in range(200):
        sigs[doc] = rng.getrandbits(32)
        doc += 1
    assert _run(spark, sigs) == _brute_force(sigs, 3)


def test_flips_concentrated_to_damage_three_parts(spark):
    """Adversarial placement: all 3 flips land in 3 DIFFERENT parts,
    leaving exactly 3 intact — the minimum the pigeonhole needs."""
    rng = random.Random(11)
    sigs: dict[int, int] = {}
    doc = 0
    part_bits = [
        list(range(off, off + w))
        for off, w in zip(_SIMHASH_PART_OFFSETS, _SIMHASH_PART_WIDTHS)
    ]
    for _ in range(60):
        seed = rng.getrandbits(32)
        sigs[doc] = seed
        doc += 1
        damaged = rng.sample(range(6), 3)
        h = seed
        for p in damaged:
            h ^= 1 << rng.choice(part_bits[p])
        sigs[doc] = h
        doc += 1
    assert _run(spark, sigs) == _brute_force(sigs, 3)


def test_identical_signatures_all_pairs_found(spark):
    sigs = {i: 0x5A5A5A5A for i in range(12)}
    got = _run(spark, sigs)
    assert got == _brute_force(sigs, 3)
    assert len(got) == 12 * 11 // 2


@pytest.mark.parametrize("radius", [1, 2, 3, 4])
def test_radius_knob_complete_at_every_radius(spark, radius):
    """Radius sweep: planted variants at distance radius (must all be
    found) and radius+1 (must all be excluded), with the flips placed
    adversarially — each in a DIFFERENT part, damaging the maximum
    number of parts the pigeonhole argument tolerates."""
    widths, offsets, _ = _simhash_scheme(radius)
    part_bits = [
        list(range(off, off + w)) for off, w in zip(offsets, widths)
    ]
    rng = random.Random(100 + radius)
    sigs: dict[int, int] = {}
    doc = 0
    for _ in range(40):
        seed = rng.getrandbits(32)
        sigs[doc] = seed
        doc += 1
        # exactly `radius` flips, one per distinct part
        h = seed
        for p in rng.sample(range(len(widths)), radius):
            h ^= 1 << rng.choice(part_bits[p])
        sigs[doc] = h
        doc += 1
        # radius+1 flips in distinct parts — just over the line
        h2 = seed
        for p in rng.sample(range(len(widths)), min(radius + 1, len(widths))):
            h2 ^= 1 << rng.choice(part_bits[p])
        sigs[doc] = h2
        doc += 1
    # background noise
    for _ in range(150):
        sigs[doc] = rng.getrandbits(32)
        doc += 1
    assert _run(spark, sigs, radius) == _brute_force(sigs, radius)


def test_radius_beyond_signature_support_refused(spark):
    sigs = {0: 1, 1: 2}
    df = spark.createDataFrame(list(sigs.items()), schema=_SCHEMA)
    with pytest.raises(ValueError):
        simhash_hamming_pairs(df, max_hamming=5)
