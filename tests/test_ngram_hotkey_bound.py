"""Pins for the hot-key-bounded ngram index build (r10 verdict item 2).

The index build in `_ngram_pair_scores` must never hold aggregation
state that scales with a single shingle's document frequency:

1. plan shape — NO collect_set anywhere in dedup_ngram_jaccard's
   physical plan (the old build merged a per-h doc set BEFORE the df
   cut, so one boilerplate shingle in 1% of a 10B-doc corpus meant a
   ~100M-element untracked JVM buffer on one reducer); the per-doc
   instance dedup must be a keys-only aggregate on the (h, doc_id)
   PAIR so a hot h spreads across reducers by doc_id.  The only
   list-building aggregate left is the posting regroup AFTER the
   cut, where every group is ≤ the stop-DF cap by construction.
   (The runtime ladder lives in tools/probe_ngram_hotkey.py: old
   shape's merge-stage max-task shuffle read grows ~linearly with
   hot df, the new build's aggregation stages stay flat.)

2. NULL-lang parity — lang is a BLOCKING key downstream, and the
   oracle's `x.lang = y.lang` join never pairs NULL-lang docs; the
   Spark groupBy would bucket all NULLs into one block and emit
   those pairs, so the build drops NULL-lang docs explicitly.  The
   committed generators never emit NULL lang (latent-parity
   hardening, ADVICE r10).
"""

from __future__ import annotations

import os
import re


from ondemand_dask_spark.queries.dedup import dedup_ngram_jaccard

SF_DIR = "/root/testdata/sf0.001"


def test_index_build_has_no_unbounded_set_aggregate(spark):
    plan = (
        dedup_ngram_jaccard(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_set" not in plan, (
        "per-h doc-set aggregation is back — the buffer scales with "
        "a hot shingle's df before the stop cut"
    )
    # the pair-keyed, keys-only dedup aggregate (functions=[]) exists
    assert re.search(
        r"HashAggregate\(keys=\[h#\d+L, doc_id#\d+L\], functions=\[\]",
        plan,
    ), "instance dedup is not a keys-only (h, doc_id) aggregate"
    # the df cut is a plain count
    assert re.search(
        r"HashAggregate\(keys=\[h#\d+L\], functions=\[(partial_)?count",
        plan,
    ), "df is not computed as a plain count"


def test_null_lang_docs_never_pair(spark, tmp_path):
    # two NULL-lang docs sharing identical text, two 'en' docs
    # sharing identical text: only the en pair may surface
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, text, None, "web", len(text)),
        (2, text, None, "web", len(text)),
        (3, text, "en", "web", len(text)),
        (4, text, "en", "web", len(text)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "sf_nulllang")
    os.makedirs(sf_dir, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    out = dedup_ngram_jaccard(spark, sf_dir)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert pairs == {(3, 4)}, pairs
