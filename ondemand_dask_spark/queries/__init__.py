"""Query modules — importing this package registers every query.

Each module covers one section of SURVEY.md §2's operator inventory.
"""

from ondemand_dask_spark.queries import (  # noqa: F401
    aggregations,
    composed,
    dedup,
    encoding,
    geo,
    graph,
    incremental,
    joins,
    layout,
    multimodal,
    pipeline,
    relational,
    scalars,
    sets,
    similarity,
    skew,
    sources,
    text,
    tpch,
    udfs,
    windows,
)
from ondemand_dask_spark import streaming  # noqa: F401  (§2.I jobs)
