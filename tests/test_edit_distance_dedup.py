"""Known-answer + boundary pins for dedup_edit_distance (the
edit-distance near-dup verify stage).

Covers the operator's own declared contracts, in the style of the
r12 boundary audit:
- threshold edge: a pair at EXACTLY _ED_MAX_DIST edits is kept, one
  edit past it is dropped;
- band-straddling: a qualifying pair whose lengths fall in ADJACENT
  length bands is still found (the 3-replica blocking exists for
  exactly this), and found exactly ONCE;
- same-band emit-once: no duplicate pair rows from the replication;
- NULL-lang isolation: NULL-lang docs never pair on either engine;
- differential: the registered DuckDB oracle agrees on every fixture.
"""

from __future__ import annotations

import os

import duckdb

from ondemand_dask_spark.queries.dedup import (
    _ED_BAND,
    _ED_MAX_DIST,
    dedup_edit_distance,
)
from ondemand_dask_spark.registry import all_queries
from tests.compare import assert_results_match


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        [(i, t, lang, "web", len(t)) for i, (t, lang) in enumerate(rows, 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


def _run_both(spark, sf_dir):
    q = all_queries()["dedup_edit_distance"]
    spark_pdf = dedup_edit_distance(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle_pdf = con.execute(q.oracle).fetchdf()
    con.close()
    assert_results_match(spark_pdf, oracle_pdf, "dedup_edit_distance")
    return {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in spark_pdf.itertuples(index=False)
    }


def test_threshold_edge_and_band_straddle(spark, tmp_path):
    base = "x" * 100
    at_limit = "y" * _ED_MAX_DIST + "x" * (100 - _ED_MAX_DIST)
    past_limit = "y" * (_ED_MAX_DIST + 1) + "x" * (99 - _ED_MAX_DIST)
    # doc 4 is doc 1 plus a suffix that pushes it into the NEXT
    # length band (100 -> 3*n..., band width {_ED_BAND}): len 100 is
    # band 3, len 100+neigh is band 3 only if < 128 — use len 127
    # vs 129 to straddle the 128 edge with dist 2
    straddle_lo = "z" * 127
    straddle_hi = "z" * 129
    rows = [
        (base, "en"),           # 1
        (at_limit, "en"),       # 2: dist(base)=16 -> kept
        (past_limit, "en"),     # 3: dist(base)=17 -> dropped
        (straddle_lo, "en"),    # 4: band floor(127/32)=3
        (straddle_hi, "en"),    # 5: band floor(129/32)=4, dist=2
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    pairs = _run_both(spark, sf_dir)
    assert pairs.get((1, 2)) == _ED_MAX_DIST  # exactly-at kept
    assert (1, 3) not in pairs                # one past: dropped
    assert pairs.get((2, 3)) == 1             # docs 2/3 differ by 1 y
    assert pairs.get((4, 5)) == 2  # adjacent bands, found once
    assert sum(1 for k in pairs if k == (4, 5)) == 1


def test_null_lang_docs_never_pair(spark, tmp_path):
    text = "identical text for the null lang parity check"
    rows = [(text, None), (text, None), (text, "en"), (text, "en")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    pairs = _run_both(spark, sf_dir)
    assert set(pairs) == {(3, 4)} and pairs[(3, 4)] == 0
