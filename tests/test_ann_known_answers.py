"""Known-answer pins for the similarity/ANN family.

Until r10 this family was verified by the engine differential plus
recall probes — both blind to a formula that is wrong the same way on
both engines (the Mann-Kendall class).  Each test here constructs an
embeddings fixture whose geometry makes the ENTIRE expected output
derivable by hand (constants in the docstrings), then runs the
registered query end-to-end:

- embedding_signbit_hamming: nested sign prefixes -> Hamming(i,j) is
  EXACTLY |i - j|, so the packed-word XOR+popcount path is pinned
  against integer arithmetic.
- ann_ivf_probe: all vectors in one 2-D plane -> cosine(i,j) is
  EXACTLY cos(angle_i - angle_j); centroid assignment, probe
  selection, and the re-rank are pinned against a hand-drawn angle
  table (the constructed 2-cluster set: angles near 0 deg vs near
  90 deg).
- embedding_pq_codebook / ann_pq_adc_topk: piecewise-constant
  subvectors -> every sqdist is 16*(a-b)^2 and the one Lloyd round
  is scalar means, so codebook census and exact ADC LUT sums are
  hand arithmetic.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ondemand_dask_spark.registry import all_queries


def _write_embeddings(tmp_path, vectors):
    """Minimal embeddings.parquet matching the driver testdata schema
    (vec_id int64, embedding list<float32>, label int32)."""
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vectors)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vectors],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(vectors), pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def test_signbit_hamming_nested_prefixes(tmp_path, spark):
    """Vector i = (-1 on dims 0..i-1, +1 on the rest), i = 0..11: the
    sign patterns are nested prefixes, so Hamming(i, j) = |i - j|
    exactly.  Expected top-5 per query i (vec_id < 10): candidates
    ordered by (|i - j|, j) — e.g. query 3 -> neighbors 2,4,1,5,0;
    query 0 -> 1,2,3,4,5 with hamming 1..5."""
    n = 12
    vecs = [[-1.0] * i + [1.0] * (64 - i) for i in range(n)]
    sf_dir = _write_embeddings(tmp_path, vecs)

    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["hamming"])
        for r in all_queries()["embedding_signbit_hamming"]
        .fn(spark, sf_dir)
        .collect()
    )
    want = []
    for q in range(10):
        ordered = sorted((abs(q - j), j) for j in range(n) if j != q)
        for rnk, (ham, j) in enumerate(ordered[:5], start=1):
            want.append((q, rnk, j, ham))
    assert got == sorted(want)
    # hand spot-checks from the docstring
    by_q = {(q, r): (j, h) for q, r, j, h in got}
    assert [by_q[(0, r)][0] for r in (1, 2, 3, 4, 5)] == [1, 2, 3, 4, 5]
    assert [by_q[(3, r)][0] for r in (1, 2, 3, 4, 5)] == [2, 4, 1, 5, 0]


# One 2-D plane: vector i = cos(theta_i) e0 + sin(theta_i) e1 (62 zero
# dims), so cosine(i, j) = cos(theta_i - theta_j) exactly.  Seeds are
# the first N_LISTS=8 vectors; the gaps below are all distinct per
# query, so no assignment or probe tie is ever exercised.
_IVF_ANGLES = [0, 90, 7, 83, 13, 77, 18, 72, 24, 66, 26, 64]

# Hand-drawn expectation: nearest-seed assignment gives lists
# 6:{6,8,10}, 7:{7,9,11}, singletons elsewhere; each query probes its
# 2 nearest lists; survivors re-rank by exact cosine.
#   query -> [(neighbor, angle_gap_deg), ...] in rank order
_IVF_WANT = {
    0: [(2, 7)],
    1: [(3, 7)],
    2: [(4, 6)],
    3: [(5, 6)],
    4: [(6, 5), (8, 11), (10, 13)],
    5: [(7, 5), (9, 11), (11, 13)],
    6: [(4, 5), (8, 6), (10, 8)],
    7: [(5, 5), (9, 6), (11, 8)],
    8: [(10, 2), (6, 6), (4, 11)],
    9: [(11, 2), (7, 6), (5, 11)],
}


def test_ivf_probe_two_cluster_plane(tmp_path, spark):
    """Cluster A near 0 deg (vecs 0,2,4,6,8,10), cluster B near 90 deg
    (1,3,5,7,9,11).  Assignment: every vector's nearest seed is inside
    its own cluster (largest within-cluster gap 8 deg vs 38+ deg
    across), lists 6 and 7 collect the three non-seed tails.  No
    cross-cluster neighbor ever appears in the output."""
    vecs = []
    for deg in _IVF_ANGLES:
        t = math.radians(deg)
        vecs.append([math.cos(t), math.sin(t)] + [0.0] * 62)
    sf_dir = _write_embeddings(tmp_path, vecs)

    rows = all_queries()["ann_ivf_probe"].fn(spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rnk"])):
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cosine"])
        )
    assert set(got) == set(_IVF_WANT)
    for q, want in _IVF_WANT.items():
        assert [n for n, _ in got[q]] == [n for n, _ in want], (q, got[q])
        for (n, cos_got), (_, gap) in zip(got[q], want):
            assert abs(cos_got - math.cos(math.radians(gap))) < 2e-4, (
                q, n, cos_got, gap,
            )
    # the 2-cluster invariant: neighbors stay within the query's cluster
    for q, members in got.items():
        for n, _ in members:
            assert (q % 2) == (n % 2), (q, n)


# PQ fixture: vector i is the constant c[i] on all 64 dims, so every
# 16-dim subvector is c[i]*ones and sqdist(sub_i, sub_j) =
# 16*(c_i - c_j)^2.  Seeds (codes) = first K=4 vectors; after one
# Lloyd round the centroids are the pair means 1.1/1.9/10.1/10.9 and
# every vector sits 0.1 from its centroid in every subspace.
_PQ_C = [1.0, 2.0, 10.0, 11.0, 1.2, 1.8, 10.2, 10.8]


def test_pq_codebook_census_hand_values(tmp_path, spark):
    """First assignment: v4->code0, v5->code1, v6->code2, v7->code3
    (margins 0.2 vs 0.8).  Lloyd means: (1+1.2)/2=1.1, (2+1.8)/2=1.9,
    (10+10.2)/2=10.1, (11+10.8)/2=10.9.  Re-assignment keeps the
    pairs, so EVERY (subspace, code) cell has exactly 2 members with
    avg_sqdist = 16 * 0.1^2 = 0.16."""
    sf_dir = _write_embeddings(tmp_path, [[c] * 64 for c in _PQ_C])
    rows = all_queries()["embedding_pq_codebook"].fn(spark, sf_dir).collect()
    assert len(rows) == 16  # 4 subspaces x 4 codes
    assert {(r["subspace"], r["code"]) for r in rows} == {
        (m, k) for m in range(4) for k in range(4)
    }
    for r in rows:
        assert r["n_members"] == 2, r
        assert abs(r["avg_sqdist"] - 0.16) < 1e-3, r


def test_pq_adc_topk_exact_lut_sums(tmp_path, spark):
    """ADC(query q, candidate j) = 4 subspaces * 16 dims *
    (c_q - centroid[code_j])^2.  For query 0 (c=1):
    v4 -> 64*(1-1.1)^2 = 0.64, v5 -> 64*(1-1.9)^2 = 51.84,
    v6 -> 64*(1-10.1)^2 = 5299.84, v3=v7 -> 64*(1-10.9)^2 = 6272.64
    (v3 and v7 share code 3 -> identical ADC, candidate-id
    tiebreak)."""
    sf_dir = _write_embeddings(tmp_path, [[c] * 64 for c in _PQ_C])
    cent = {0: 1.1, 1: 1.9, 2: 10.1, 3: 10.9}
    code = {3: 3, 4: 0, 5: 1, 6: 2, 7: 3}

    rows = all_queries()["ann_pq_adc_topk"].fn(spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rnk"])):
        got.setdefault(r["query_id"], []).append(
            (r["candidate_id"], r["adc_sqdist"])
        )
    assert set(got) == {0, 1, 2}
    for q in (0, 1, 2):
        cq = _PQ_C[q]
        want = sorted(
            (round(64 * (cq - cent[code[j]]) ** 2, 6), j) for j in code
        )
        assert [j for _, j in want] == [j for j, _ in got[q]], (q, got[q])
        for (adc_want, _), (_, adc_got) in zip(want, got[q]):
            assert abs(adc_got - adc_want) < 1e-2, (q, adc_got, adc_want)
    # docstring hand row: query 0, nearest candidate v4 at 0.64
    assert got[0][0][0] == 4 and abs(got[0][0][1] - 0.64) < 1e-2
    # the shared-code tie: v3 before v7 at identical ADC
    assert [j for j, _ in got[0][-2:]] == [3, 7]
