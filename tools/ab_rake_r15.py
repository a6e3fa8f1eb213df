"""A/B for text_keyphrase_rake's exchange width (r15, guide §2.2).

The sf1 profile shows the doc_id window exchange (41 MB) AQE-coalesced
to ONE task, and its three consumers (ph, wstat partials, scored) each
re-reading it single-task: 8.2 s of the 9.7 s query in three 1-task
stages.  Arm `rep` pins the width with an explicit
repartition(2*parallelism, doc_id) BEFORE the window — the window and
both (doc_id, pid) aggregates reuse the partitioning, so no exchange
is added, only the coalescible implicit one replaced.

Usage: python tools/ab_rake_r15.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from ondemand_dask_spark.io import load_table  # noqa: E402
from ondemand_dask_spark.queries.text import _RAKE_TOPK, STOPWORDS, _R  # noqa: E402
from ondemand_dask_spark.session import build_session  # noqa: E402


def rake(spark, sf_dir, rep: bool):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    if rep:
        tok = tok.repartition(
            2 * spark.sparkContext.defaultParallelism, "doc_id"
        )
    st = F.col("w").isin(*STOPWORDS).cast("long")
    wd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = tok.select(
        "doc_id", "pos", "w", st.alias("st"), F.sum(st).over(wd).alias("pid")
    )
    member = marked.filter((F.col("st") == 0) & (F.col("w") != "")).select(
        "doc_id", "pid", "pos", "w"
    )
    ph = member.groupBy("doc_id", "pid").agg(F.count("*").alias("plen"))
    wstat = (
        member.join(ph, ["doc_id", "pid"])
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
    )
    scored = (
        member.join(wstat, "w")
        .groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.getField("w"),
                ),
                " ",
            ).alias("phrase"),
            F.sum(F.col("deg").cast("double") / F.col("freq")).alias("score"),
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            (F.round(F.max("score") - 1e-9, _R) + 0.0).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(_RAKE_TOPK)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_testdata/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session(
        app_name="ab_rake_r15",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    a = sorted(map(tuple, rake(spark, sf_dir, False).collect()))
    b = sorted(map(tuple, rake(spark, sf_dir, True).collect()))
    assert a == b, "rep arm differs!"
    print(f"identity OK ({len(a)} rows)", file=sys.stderr)

    def run(rep) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rake(spark, sf_dir, rep).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    times = {"base": [], "rep": []}
    run(False), run(True)
    for _ in range(rounds):
        times["base"].append(round(run(False), 3))
        times["rep"].append(round(run(True), 3))
    for n, ts in times.items():
        print(f"{n}: best {min(ts):.2f}s of {ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
