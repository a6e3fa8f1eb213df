"""Known-answer pins for the n-gram Jaccard/containment dedup family.

The family is verified by the engine differential (driver rows at
sf0.001/0.01) — blind to a formula wrong the same way on both engines
(the Mann-Kendall class) and to the stop-cut boundary, which both
sides express independently.  This fixture makes the ENTIRE expected
output hand-derivable:

Docs (id: text / lang), word 3-shingles in braces:
  0: "a b c d e"          en  {abc, bcd, cde}                (3)
  1: "a b c d f"          en  {abc, bcd, cdf}                (3)
  2: "a b c x y"          en  {abc, bcx, cxy}                (3)
  3: "p q r s t u"        en  {pqr, qrs, rst, stu}           (4)
  4: "a b c d e"          de  {abc, bcd, cde}                (3)
  5: "a b c d e"          en  {abc, bcd, cde}                (3)
  6: "a b c d e f g h"    en  {abc, bcd, cde, def, efg, fgh} (6)
  7: "x y"                en  {} (too short for a 3-shingle)

Stop cut with n_docs = 8: threshold = min(1000, max(5, 0.01·8)) = 5.
df("abc") = |{0,1,2,4,5,6}| = 6 > 5 ⇒ "abc" is CUT.  That boundary
is the point of the fixture: every expected value below is derived
over the KEPT shingle sets
  0,4,5: {bcd, cde}   1: {bcd, cdf}   2: {bcx, cxy}
  3: {pqr, qrs, rst, stu}   6: {bcd, cde, def, efg, fgh}
(df("bcd") = |{0,1,4,5,6}| = 5 = threshold ⇒ KEPT — the ≤ boundary —
and every other shingle has df ≤ 4).

Jaccard ≥ 0.4, same-lang, doc_a < doc_b:
  (0,1): i=1 {bcd}, J = 1/(2+2-1) = 1/3          — below, absent
  (0,5): i=2, J = 2/(2+2-2) = 1.0                — pair, 1.0
  (1,5): i=1, J = 1/3                            — absent
  (0,6): i=2 {bcd,cde}, J = 2/(2+5-2) = 0.4      — pair, 0.4 (>= edge)
  (5,6): same as (0,6)                           — pair, 0.4
  (1,6): i=1 {bcd}, J = 1/6                      — absent
  (0,4)/(4,5)/(1,4)/(4,6): lang de vs en         — BLOCKED
  2,3,7: no kept shingle shared with anyone      — absent

Containment ≥ 0.8 (i / n_inner), directed, same-lang:
  (0 in 5) = 2/2 = 1.0 and (5 in 0) = 1.0        — both directions
  (0 in 6) = 2/2 = 1.0, (6 in 0) = 2/5 = 0.4     — asymmetric: only
  (5 in 6) = 1.0, (6 in 5) = 0.4                   the short-in-long
  (1 in 6) = 1/2 = 0.5                           — absent
  4 with anyone                                  — lang-BLOCKED
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ondemand_dask_spark.registry import all_queries

_DOCS = [
    (0, "a b c d e", "en"),
    (1, "a b c d f", "en"),
    (2, "a b c x y", "en"),
    (3, "p q r s t u", "en"),
    (4, "a b c d e", "de"),
    (5, "a b c d e", "en"),
    (6, "a b c d e f g h", "en"),
    (7, "x y", "en"),
]


def _write_documents(tmp_path) -> str:
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
            "text": pa.array([d[1] for d in _DOCS], pa.string()),
            "lang": pa.array([d[2] for d in _DOCS], pa.string()),
            "source": pa.array(["src0"] * len(_DOCS), pa.string()),
            "n_chars": pa.array(
                [len(d[1]) for d in _DOCS], pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_ngram_jaccard_hand_fixture(tmp_path, spark):
    """Stop-cut boundary (df=6 cut, df=5 kept), the >= threshold edge
    (J exactly 0.4), the language block, and a shingle-less short doc
    — all pinned through the registered query end-to-end."""
    sf_dir = _write_documents(tmp_path)
    q = all_queries()["dedup_ngram_jaccard"]
    rows = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in q.fn(spark, sf_dir).collect()
    }
    assert rows == {
        (0, 5): 1.0,
        (0, 6): 0.4,
        (5, 6): 0.4,
    }


def test_ngram_containment_hand_fixture(tmp_path, spark):
    """The asymmetric direction: a short doc fully inside a longer one
    scores 1.0 inward but 0.4 outward (absent), identical docs score
    both directions, and the de-lang twin of doc 0 pairs with nobody."""
    sf_dir = _write_documents(tmp_path)
    q = all_queries()["dedup_ngram_containment"]
    rows = {
        (r.inner_doc, r.outer_doc): r.containment
        for r in q.fn(spark, sf_dir).collect()
    }
    assert rows == {
        (0, 5): 1.0,
        (5, 0): 1.0,
        (0, 6): 1.0,
        (5, 6): 1.0,
    }
