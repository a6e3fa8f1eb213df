"""Distributed global rank — the scale-safe twin of a single-task
`Window.orderBy` (§2.F).

`row_number() OVER (ORDER BY ...)` with no partition key moves EVERY
row through one task — the pattern this repo only permits on bounded
inputs (|V|-row degree tables, k-row cut tables).  For data-sized
inputs the classic two-pass shape assigns the identical numbering at
full parallelism:

1. `repartitionByRange` on the sort keys (sampled boundaries — the
   same machinery `orderBy` uses), then sort within partitions;
2. local row numbers via a window PARTITIONED BY the physical
   partition id (each partition is one task's rows — no exchange, the
   data is already sorted);
3. per-partition counts (one tiny agg: #partitions rows), cumulative
   offsets via a window over that bounded table, broadcast back;
4. global position = partition offset + local row number.

The result is deterministic even though the sampled range boundaries
are not: as long as the sort key chain is a total order (callers must
pass a tie-breaking key), position = global rank by key regardless of
where the partition cuts landed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_numbers(
    df: DataFrame, *keys: str | Column, col_name: str = "pos"
) -> DataFrame:
    """Append 1-based global positions ordered by `keys` (must form a
    total order) without a single-task global window."""
    ranged = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(*keys)
    local = with_pid.withColumn("__rn", F.row_number().over(w_local))
    counts = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(col_name, F.col("__off") + F.col("__rn"))
        .drop("__pid", "__rn", "__off")
    )
