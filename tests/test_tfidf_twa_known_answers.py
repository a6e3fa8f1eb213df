"""Known-answer pins for TF-IDF top-term and the time-weighted
average — two more formula-carrying queries whose differential shares
one SQL-spelled formula between both engines (the Mann-Kendall class:
a shared misreading passes every green round).  Expectations here are
recomputed from the published definitions in straight-line Python.

TF-IDF fixture (4 docs, every doc also contains "the" so a df=N term
with idf exactly 0 rides along and must never win):
  0: "the apple apple banana"   1: "the banana cherry"
  2: "the cherry apple"         3: "the durian durian durian"
df: apple/banana/cherry = 2, durian = 1, the = 4; idf = ln(N/df).
Docs 1 and 2 each hold an exact two-way tf·idf tie (ln 2) broken by
term ascending — banana and apple respectively.

TWA fixture — EXTENDS test_windows_known_answers.py's
test_time_weighted_avg_hand_integral (which pins the basic integral,
last-observation exclusion, and the single-event user) with the two
ordering edges it does not reach:
  user 3: two events at the SAME ts ordered by event_id (the first
          gets Δt = 0 and weight zero), then one 2 s later →
          (5·0 + 7·2e6) / 2e6 = 7.0, span 2e6 µs
  user 4: rows written to the file out of time order → the window
          sort must reorder: 20 holds 5 s → 20.0, span 5e6 µs
"""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from ondemand_dask_spark.registry import all_queries

_TFIDF_DOCS = [
    (0, "the apple apple banana"),
    (1, "the banana cherry"),
    (2, "the cherry apple"),
    (3, "the durian durian durian"),
]


def _tfidf_expected():
    toks = {i: t.split(" ") for i, t in _TFIDF_DOCS}
    n = len(toks)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    rows = {}
    for i, ts in toks.items():
        scored = {}
        for t in ts:
            scored[t] = scored.get(t, 0) + 1
        scored = {
            t: c * math.log(n / df[t]) for t, c in scored.items()
        }
        top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rows[i] = (top[0], round(top[1] - 1e-9, 4))
    return rows


def test_tfidf_top_term_hand_fixture(tmp_path, spark):
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [d[0] for d in _TFIDF_DOCS], pa.int64()
                ),
                "text": pa.array([d[1] for d in _TFIDF_DOCS]),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["src0"] * 4),
                "n_chars": pa.array(
                    [len(d[1]) for d in _TFIDF_DOCS], pa.int64()
                ),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    q = all_queries()["text_tfidf_top_term"]
    got = {
        r.doc_id: (r.top_term, r.tfidf)
        for r in q.fn(spark, sf_dir).collect()
    }
    exp = _tfidf_expected()
    assert got == exp
    # fixture self-checks so an edit cannot defuse the pin:
    assert exp[1][0] == "banana" and exp[2][0] == "apple"  # tie-breaks
    assert exp[1][1] == exp[2][1]  # the tied score itself
    assert "the" not in {v[0] for v in exp.values()}  # idf-0 never wins


_T0 = datetime(2024, 1, 1)
_EVENTS = [
    # (event_id, ts_offset_s, user_id, value) — user 4 deliberately
    # written out of time order
    (5, 0, 3, 5.0),
    (6, 0, 3, 7.0),
    (7, 2, 3, 9.0),
    (8, 5, 4, 100.0),
    (9, 0, 4, 20.0),
]


def test_time_weighted_avg_hand_fixture(tmp_path, spark):
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    [e[0] for e in _EVENTS], pa.int64()
                ),
                "ts": pa.array(
                    [_T0 + timedelta(seconds=e[1]) for e in _EVENTS],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    [e[2] for e in _EVENTS], pa.int64()
                ),
                "event_type": pa.array(["click"] * len(_EVENTS)),
                "value": pa.array(
                    [e[3] for e in _EVENTS], pa.float64()
                ),
                "props": pa.array(["{}"] * len(_EVENTS)),
            }
        ),
        os.path.join(sf_dir, "events.parquet"),
    )
    q = all_queries()["window_time_weighted_avg"]
    got = {
        r.user_id: (r.twa_value, r.span_us)
        for r in q.fn(spark, sf_dir).collect()
    }
    assert got == {
        3: (7.0, 2_000_000),
        4: (20.0, 5_000_000),
    }
