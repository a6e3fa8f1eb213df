"""A/B harness for the r15 dedup_ngram_jaccard work (guide §2.2/§2.3).

Arms (each a local variant of _ngram_pair_scores' tail; the hybrid
hot-key-bounded index build is shared verbatim):

  base  — registered shape (implicit groupBy(lang,h) exchange at
          spark.sql.shuffle.partitions, AQE-coalesced; wide pair rows)
  repN  — explicit .repartition(N*defaultParallelism, "lang", "h")
          feeding the lists aggregate: REPARTITION_BY_NUM is not
          AQE-coalesced, the groupBy reuses it (same keys), and the
          quadratic explode + partial pair aggregation downstream run
          at cluster width instead of the advisory-coalesced count.
  narrow— kept-shingle counts (na/nb) carried as INT through the
          pair aggregate (cast back after): a doc's 3-gram count is
          words-2, far under 2^31 for any real document.
  both  — repN + narrow.

Usage: python tools/ab_ngram_r15.py [sf_dir] [rounds] [reps]
Interleaved best-of-rounds in ONE warm session; identity check of
each arm vs base (sorted rows) printed first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.io import load_table  # noqa: E402
from ondemand_dask_spark.queries.dedup import (  # noqa: E402
    _STOP_DF_CAP,
    _STOP_DF_FRAC,
    _STOP_DF_MIN,
    _R,
    _h,
    _CACHES,
    _shingle_array,
)
from ondemand_dask_spark.session import build_session  # noqa: E402

_evict_retained = _CACHES.evict
_retain = _CACHES.retain


def _build_kept(spark, sf_dir):
    """The shared hybrid hot-key-bounded index build (verbatim)."""
    docs = load_table(spark, sf_dir, "documents")
    h30 = _h(F.col("shingle")) % F.lit(1_073_741_824)
    inst = docs.select(
        "doc_id", F.explode(_shingle_array(F.col("text"), 3)).alias("shingle")
    ).select("doc_id", h30.alias("h"))
    total = docs.agg(F.count("*").alias("n_docs"))
    thresh = F.least(
        F.lit(float(_STOP_DF_CAP)),
        F.greatest(
            F.lit(float(_STOP_DF_MIN)), F.lit(_STOP_DF_FRAC) * F.col("n_docs")
        ),
    )
    raw = inst.groupBy("h").agg(F.count("*").alias("rc"))
    suspect = (
        raw.crossJoin(F.broadcast(total))
        .filter(F.col("rc") > thresh)
        .select("h")
    )
    safe_kept = (
        inst.join(suspect, "h", "left_anti")
        .groupBy("h")
        .agg(F.collect_set("doc_id").alias("ds"))
        .crossJoin(F.broadcast(total))
        .filter(F.size("ds") <= thresh)
        .select("h", F.explode("ds").alias("doc_id"))
    )
    sus_uniq = inst.join(suspect, "h", "left_semi").dropDuplicates(
        ["h", "doc_id"]
    )
    sus_keep = (
        sus_uniq.groupBy("h")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("df") <= thresh)
        .select("h")
    )
    _evict_retained()
    kept_inst = _retain(
        safe_kept.unionByName(
            sus_uniq.join(sus_keep, "h", "left_semi")
        ).cache()
    )
    return kept_inst, docs


def _tail(
    spark,
    kept_inst,
    docs,
    *,
    rep: int = 0,
    narrow: bool = False,
    fin: int = 0,
):
    counts = kept_inst.groupBy("doc_id").agg(F.count("*").alias("n"))
    if narrow:
        counts = counts.select("doc_id", F.col("n").cast("int").alias("n"))
    dmeta = counts.join(
        docs.select("doc_id", "lang").filter(F.col("lang").isNotNull()),
        "doc_id",
    )
    pre = kept_inst.join(dmeta, "doc_id")
    if rep:
        pre = pre.repartition(
            rep * spark.sparkContext.defaultParallelism, "lang", "h"
        )
    lists = (
        pre.groupBy("lang", "h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    combos = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc_id"].alias("a"),
                    x["n"].alias("na"),
                    y["doc_id"].alias("b"),
                    y["n"].alias("nb"),
                ),
            ),
        )
    )
    exploded = lists.select(F.explode(combos).alias("p")).select(
        F.col("p.a").alias("doc_a"),
        F.col("p.na").alias("na"),
        F.col("p.b").alias("doc_b"),
        F.col("p.nb").alias("nb"),
    )
    if fin:
        # explicit exchange before the pair aggregate: the complete
        # agg then runs at fin*parallelism tasks (no partial combine)
        exploded = exploded.repartition(
            fin * spark.sparkContext.defaultParallelism,
            "doc_a",
            "doc_b",
        )
    pairs = exploded.groupBy("doc_a", "na", "doc_b", "nb").agg(
        F.count("*").alias("i")
    )
    if narrow:
        pairs = pairs.select(
            "doc_a",
            F.col("na").cast("long").alias("na"),
            "doc_b",
            F.col("nb").cast("long").alias("nb"),
            "i",
        )
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        pairs.filter(jac >= 0.4)
        .select("doc_a", "doc_b", F.round(jac - 1e-9, _R).alias("jaccard"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_testdata/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rep_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = build_session(
        app_name="ab_ngram_r15",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    arms = {
        "base": dict(),
        "fin1": dict(fin=1),
        "fin2": dict(fin=2),
        "fin4": dict(fin=4),
    }

    def run(kw) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        kept, docs = _build_kept(spark, sf_dir)
        _tail(spark, kept, docs, **kw).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # identity check: each arm vs base, sorted rows
    kept, docs = _build_kept(spark, sf_dir)
    base_rows = sorted(
        map(tuple, _tail(spark, kept, docs).collect())
    )
    for name, kw in arms.items():
        if name == "base":
            continue
        rows = sorted(map(tuple, _tail(spark, kept, docs, **kw).collect()))
        assert rows == base_rows, f"{name} differs from base!"
        print(f"identity {name}: OK ({len(rows)} rows)", file=sys.stderr)

    results = {n: [] for n in arms}
    for n, kw in arms.items():  # warm-up
        run(kw)
    for r in range(rounds):
        for n, kw in arms.items():
            results[n].append(round(run(kw), 3))
    for n, ts in results.items():
        print(f"{n}: best {min(ts):.2f}s of {ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
