"""The HLL sketch-merge query carries a banded oracle (exact distinct
count + an in-query certificate that the merged estimate lands within
5%) — pin the certificate locally: merging per-day sketches must
estimate within HLL's error envelope, and at the fixtures'
cardinality (≤ thousands ≪ 2^lgk) it is exact."""

from ondemand_dask_spark.registry import all_queries


def test_hll_merge_close_to_exact(spark, sf_dir):
    row = all_queries()["agg_hll_sketch_merge"].fn(spark, sf_dir).collect()[0]
    assert row.exact_users > 0
    assert row.within_bound, row
