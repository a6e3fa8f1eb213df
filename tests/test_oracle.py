"""One differential test per registered query — the same comparison
the driver runs (Spark result vs DuckDB oracle).  Queries without an
oracle get a rows-only sanity check (runs, stable schema, >= 0 rows).
"""

from __future__ import annotations

import pytest

from ondemand_dask_spark.registry import all_queries
from tests.compare import assert_results_match

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, duck, sf_dir):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only: it ran, schema is stable, row count is sane
        assert spark_pdf.shape[0] >= 0
        assert len(spark_pdf.columns) > 0
        return
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    assert_results_match(spark_pdf, oracle_pdf, name)
