"""Sweep every registered query's OUTPUT SCHEMA for driver-hostile
column types.

The driver canonicalizes each query result by pulling it into pandas
and `sort_values`-ing over every column before hashing; any column
whose cells are ndarray / dict / Row (Spark array / map / struct /
binary types) raises `TypeError: unhashable type` there — even for
rows-only queries.  This sweep builds each query's DataFrame lazily
(no execution) and reports offending columns so they can be
stringified (array_join / to_json / hex) at the query's final select.

Usage: python tools/schema_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession, types as T  # noqa: E402


def _bad_fields(schema: T.StructType) -> list[tuple[str, str]]:
    out = []
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
            out.append((f.name, f.dataType.simpleString()))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("schema_sweep")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    qs = e.queries()
    bad = {}
    errs = {}
    for name, fn in qs.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as ex:  # building must not require execution
            errs[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
            continue
        fields = _bad_fields(schema)
        if fields:
            bad[name] = fields

    print(f"== {len(qs)} queries; {len(bad)} with non-scalar output columns ==")
    for name, fields in sorted(bad.items()):
        print(f"  {name}: " + ", ".join(f"{n}:{t}" for n, t in fields))
    if errs:
        print(f"== {len(errs)} failed to build ==")
        for name, msg in sorted(errs.items()):
            print(f"  {name}: {msg}")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
