"""Structured Streaming jobs (§2.I). Importing registers the queries."""

from ondemand_dask_spark.streaming import jobs  # noqa: F401
