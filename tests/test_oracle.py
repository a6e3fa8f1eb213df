"""One differential test per registered query — the same comparison
the driver runs (Spark result vs DuckDB oracle).  Queries without an
oracle get a rows-only sanity check (runs, stable schema, >= 0 rows).
"""

from __future__ import annotations

import pytest

from ondemand_dask_spark.registry import all_queries
from tests.compare import assert_results_match

QUERIES = all_queries()

# Queries whose result is LEGITIMATELY empty at the suite's sf0.001
# (semantic sparsity, not a degenerate threshold) — each must be
# non-empty at the driver's sf0.01.  Everything else must return
# rows: an empty-vs-empty differential is vacuously green (r8 found
# two — geo_density_grid's fixed >=30 cut and
# stream_foreachbatch_sink's value>500 filter matched NOTHING at the
# driver's correctness scale, so their driver hashes proved nothing).
EMPTY_OK_AT_SF0001 = {
    # 100 world-scattered suppliers have no pair within 500 km;
    # 11 pairs at sf0.01, 1000 at sf0.1
    "geo_pairs_within_radius",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, duck, sf_dir):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert len(spark_pdf.columns) > 0
    # the sparsity whitelist argues sf0.001 specifically — at larger
    # SFs those queries are non-empty too, so exempt nothing there
    exempt = name in EMPTY_OK_AT_SF0001 and sf_dir.rstrip("/").endswith(
        "sf0.001"
    )
    if not exempt:
        assert spark_pdf.shape[0] > 0, (
            f"{name} returned an empty frame — the differential is "
            f"vacuously green; widen the query's selectivity at small "
            f"SF or whitelist it here with a sparsity argument"
        )
    if q.oracle is None:
        return  # rows-only by declared design (tolerance-twin-tested)
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    assert_results_match(spark_pdf, oracle_pdf, name)
