"""Simulate the driver: import __spark_entry__, run entry() on a
PLAIN SparkSession (no engine-side configs — the driver builds its
own session), then run every queries() entry at a given SF and
compare against oracle_sql() via DuckDB (row-count + schema +
order-insensitive values).

Usage: python tools/driver_sim.py [sf_dir] [--names q1,q2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = None
    if "--names" in sys.argv:
        only = set(sys.argv[sys.argv.index("--names") + 1].split(","))

    import __spark_entry__ as e

    # Plain session, as the driver would build it (no engine configs).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    print("== entry() smoke ==")
    t0 = time.time()
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows, schema={[f.name for f in df.schema]}, "
          f"{time.time()-t0:.1f}s  OK={len(rows) > 0}")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        # driver testdata is one file per table; tools/gen_scale_data.py
        # writes Spark directory-parquet — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    from tests.compare import assert_results_match

    print(f"== {len(qs)} queries at {sf_dir} ({len(oracles)} with oracle) ==")
    passed = failed = rows_only = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
                assert_results_match(spark_pdf, oracle_pdf, name)
                print(f"  PASS {name}: {len(spark_pdf)} rows  {time.time()-t0:.1f}s")
            else:
                assert len(spark_pdf.columns) > 0
                rows_only += 1
                print(f"  ROWS-ONLY {name}: {len(spark_pdf)} rows  {time.time()-t0:.1f}s")
            passed += 1
        except Exception as ex:
            failed += 1
            print(f"  FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}")
    print(f"== done: {passed} passed ({rows_only} rows-only), {failed} failed ==")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
