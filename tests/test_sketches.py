"""The HLL sketch-merge query is rows-only (sketch binaries are
engine-internal) — pin its self-evidence locally instead: merging
per-day sketches must estimate within HLL's error envelope, and at
the fixtures' cardinality (≤ thousands ≪ 2^lgk) it is exact."""

from ondemand_dask_spark.registry import all_queries


def test_hll_merge_close_to_exact(spark, sf_dir):
    row = all_queries()["agg_hll_sketch_merge"].fn(spark, sf_dir).collect()[0]
    assert row.exact_users > 0
    assert row.rel_err <= 0.05, row
