"""Known-answer pins for the text-retrieval family (BM25 first).

The BM25 query is verified by the engine differential — blind to a
formula misapplied the same way in the Spark code and the oracle SQL
(the Mann-Kendall class: both sides are written from the same
understanding).  This pin recomputes the textbook Okapi BM25 from
scratch in straight-line Python over a 7-doc fixture and compares the
registered query's full top-k table against it, exercising every
moving part of the formula independently:

- idf smoothing: ln((N - df + 0.5)/(df + 0.5) + 1) over df ∈ {1,2,3,4}
- length normalization: doc 6 is 5 tokens against a 3-token corpus,
  so (1 - b + b·dl/avgdl) differs from 1 on BOTH sides of avgdl
  (a b misapplication cannot hide — on an equal-length corpus it
  would cancel out of every score)
- tf saturation: doc 6 repeats "m" 4x (tf=4 against k1=1.2)
- self-exclusion (a query doc never matches itself) and the
  round(score, 6)-desc, doc_id-asc tie-break (docs 0 and 1 tie
  exactly for query 2)
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ondemand_dask_spark.registry import all_queries

_DOCS = [
    (0, "w x a"),
    (1, "w x b"),
    (2, "w y c"),
    (3, "z y d"),
    (4, "z q e"),
    (5, "z q f"),
    (6, "w m m m m"),
]
_K1, _B, _TOP = 1.2, 0.75, 3


def _expected():
    """Textbook BM25, no shared code with the engine or the oracle."""
    toks = {i: t.split(" ") for i, t in _DOCS}
    n = len(_DOCS)
    dl = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    tf = {i: {} for i in toks}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for i in tf:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in df.items()}
    rows = {}
    for q in tf:  # every doc_id < 10 is a query
        scores = {}
        for t in tf[q]:
            for d in tf:
                if d == q or t not in tf[d]:
                    continue
                norm = 1.0 - _B + _B * dl[d] / avgdl
                scores[d] = scores.get(d, 0.0) + (
                    idf[t] * tf[d][t] * (_K1 + 1.0)
                    / (tf[d][t] + _K1 * norm)
                )
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )
        for rnk, (d, s) in enumerate(ranked[:_TOP], start=1):
            rows[(q, d)] = (round(s - 1e-9, 4), rnk)
    return rows


def test_bm25_textbook_fixture(tmp_path, spark):
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
                "text": pa.array([d[1] for d in _DOCS]),
                "lang": pa.array(["en"] * len(_DOCS)),
                "source": pa.array(["src0"] * len(_DOCS)),
                "n_chars": pa.array(
                    [len(d[1]) for d in _DOCS], pa.int64()
                ),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    q = all_queries()["text_bm25_topk"]
    got = {
        (r.query_id, r.match_id): (r.bm25, r.rnk)
        for r in q.fn(spark, sf_dir).collect()
    }
    exp = _expected()
    assert got == exp
    # sanity on the fixture's discriminating structure, so a later
    # edit cannot silently defuse the pin:
    assert (2, 0) in exp and (2, 1) in exp  # the exact tie pair
    assert exp[(2, 0)][1] == 2 and exp[(2, 1)][1] == 3  # doc_id break
    assert any(d == 6 for _, d in exp)  # long doc ranked somewhere
