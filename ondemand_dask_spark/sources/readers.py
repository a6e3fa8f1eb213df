"""Format readers (§2.A) — the reference's `dd.read_*` family.

Policy: ALWAYS an explicit schema.  Schema inference is an extra full
scan at 100 TB and inferred types drift between files; every reader
here takes the schema (or fixed-width spec) as an argument.  The
round-trip queries in queries/sources.py prove fidelity per format
against the DuckDB oracle.

`read_fwf` has no native Spark reader: it lowers to `spark.read.text`
plus per-column `substring` + cast projections — a pure codegen
narrow op, so fixed-width ingestion parallelizes like any text scan.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_fwf(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[int, int]],
    names: list[str],
    dtypes: list[str],
    trim: bool = True,
) -> DataFrame:
    """Fixed-width file reader: (start, end) byte offsets (0-based,
    end-exclusive — pandas read_fwf convention) per column."""
    raw = spark.read.text(path)
    cols = []
    for (start, end), name, dtype in zip(colspecs, names, dtypes):
        c = F.substring("value", start + 1, end - start)  # substring is 1-based
        if trim:
            c = F.trim(c)
        cols.append(c.cast(dtype).alias(name))
    return raw.select(*cols)


def from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Local frame → DataFrame over the Arrow path."""
    return spark.createDataFrame(pdf)
