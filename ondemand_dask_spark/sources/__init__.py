"""Source readers beyond parquet (§2.A). Importing re-exports them."""

from ondemand_dask_spark.sources.readers import (  # noqa: F401
    from_pandas,
    read_csv,
    read_fwf,
    read_json,
    read_orc,
    read_text,
)
