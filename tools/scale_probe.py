"""Scale probe — do the composed operators hold at 50× the bench SF?

Synthesizes events-shaped (5M rows, 5k users) and documents-shaped
(100k docs × ~60 tokens) data in /tmp — deterministic, generated on
the executors via spark.range (no driver materialization) — and times
the operators whose scaling behavior is non-obvious: the single-
shuffle merge_asof, sessionization, windowed analytics, MinHash-LSH
dedup, fingerprints, and salted vs plain aggregation under a 25%-hot
key.  Prints one JSON line; run ad-hoc, not part of the driver bench.

  python tools/scale_probe.py [--rows 5000000] [--docs 100000] [--vecs 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.operators.asof import merge_asof  # noqa: E402
from ondemand_dask_spark.operators.skew import salted_agg  # noqa: E402
from ondemand_dask_spark.functions.texthash import (  # noqa: E402
    rolling_fingerprint,
)
from ondemand_dask_spark.session import build_session  # noqa: E402

SCRATCH = "/tmp/ondemand_dask_spark_scale"


def synthesize(spark, rows: int, docs: int) -> None:
    """Deterministic synthetic tables, generated distributed."""
    if not os.path.exists(f"{SCRATCH}/events/_SUCCESS"):
        (
            spark.range(rows)
            .select(
                F.col("id").alias("event_id"),
                # 25% of rows land on user 0 → a genuinely hot key
                F.when(F.xxhash64("id") % 4 == 0, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000)))
                .alias("user_id"),
                F.timestamp_micros(
                    F.lit(1704067200000000)
                    + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(2_592_000_000_000))
                ).alias("ts"),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100000)) / 100.0).alias(
                    "value"
                ),
                F.element_at(
                    F.array(*[F.lit(x) for x in
                              ("view", "click", "purchase", "signup", "error")]),
                    (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(5)) + 1).cast("int"),
                ).alias("event_type"),
            )
            .write.mode("overwrite")
            .parquet(f"{SCRATCH}/events")
        )
    if not os.path.exists(f"{SCRATCH}/documents/_SUCCESS"):
        (
            spark.range(docs)
            .select(
                F.col("id").alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(60)),
                        lambda i: F.concat(
                            F.lit("w"),
                            F.pmod(F.xxhash64(F.col("id") * 100 + i), F.lit(500)),
                        ),
                    ),
                    " ",
                ).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(f"{SCRATCH}/documents")
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--vecs", type=int, default=1_000_000)
    args = ap.parse_args()

    spark = build_session(app_name="scale_probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, args.rows, args.docs)
    events = spark.read.parquet(f"{SCRATCH}/events")
    docs = spark.read.parquet(f"{SCRATCH}/documents")

    timings: dict[str, float] = {}

    def timed(name: str, df) -> None:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"  probe {name}: {timings[name]}s", file=sys.stderr, flush=True)

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    timed(
        "merge_asof_5m",
        merge_asof(
            events.select("user_id", "ts", "event_id"),
            purchases,
            on="ts",
            by="user_id",
            suffix="_p",
        ),
    )

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timed(
        "window_cumsum_5m",
        events.select(
            "event_id", F.sum("value").over(w).alias("running")
        ),
    )

    timed(
        "sessionize_5m",
        events.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
            F.count("*").alias("n"), F.sum("value").alias("s")
        ),
    )

    timed(
        "plain_agg_hot_key_5m",
        events.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("s")
        ),
    )
    timed(
        "salted_agg_hot_key_5m",
        salted_agg(
            events,
            keys=["user_id"],
            aggs={"n": ("count", "event_id"), "s": ("sum", "value")},
            buckets=32,
        ),
    )

    timed(
        "fingerprint_100k_docs",
        docs.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")),
    )

    from ondemand_dask_spark.registry import all_queries

    # full MinHash-LSH pipeline on the 100k-doc corpus: point the
    # registered query's loader at our scratch dir by registering a view-
    # compatible layout (documents.parquet under a dir)
    link_dir = f"{SCRATCH}/as_sf_dir"
    os.makedirs(link_dir, exist_ok=True)
    docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("synth")
    ).withColumn("n_chars", F.length("text")).coalesce(8).write.mode(
        "overwrite"
    ).parquet(f"{link_dir}/documents.parquet")
    timed(
        "minhash_lsh_100k_docs",
        all_queries()["dedup_minhash_lsh"].fn(spark, link_dir),
    )

    # connected components over the 100k-doc near-dup pairs: the
    # checkpointed fixpoint loop runs EAGERLY inside fn() (per-round
    # convergence counts), so time construction + final write together
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    cc = all_queries()["dedup_connected_components"].fn(spark, link_dir)
    cc.write.format("noop").mode("overwrite").save()
    timings["connected_components_100k_docs"] = round(time.perf_counter() - t0, 2)

    # round-4 reworked dedup shapes: the posting-list n-gram Jaccard
    # (stop-shingle cut) and the pigeonhole byte-block SimHash pairs
    # must hold at 100k docs (the naive twins are n²)
    for qname in ("dedup_ngram_jaccard", "dedup_simhash_pairs"):
        timed(f"{qname}_100k_docs", all_queries()[qname].fn(spark, link_dir))

    # training-pipeline ops on the same 100k-doc corpus
    for qname in (
        "pipeline_pack_sequences",
        "pipeline_chunk_overlap",
        "pipeline_heavy_hitters",
        "pipeline_inverted_index",
        "pipeline_shard_shuffle",
    ):
        timed(f"{qname}_100k_docs", all_queries()[qname].fn(spark, link_dir))

    # embeddings-shaped ops at --vecs vectors x 64 dims (10x the sf0.1
    # corpus by default): the iterative PCA (two full matrix-vector
    # passes, corpus never shuffled) and the broadcast brute-force ANN
    if not os.path.exists(f"{link_dir}/embeddings.parquet/_SUCCESS"):
        (
            spark.range(args.vecs)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(64)),
                    lambda i: (
                        (F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(2001)) - 1000)
                        / 1000.0
                    ).cast("float"),
                ).alias("embedding"),
                F.pmod(F.xxhash64("id", F.lit(5)), F.lit(10))
                .cast("int")
                .alias("label"),
            )
            .coalesce(16)
            .write.mode("overwrite")
            .parquet(f"{link_dir}/embeddings.parquet")
        )
    for qname in ("embedding_pca_power", "ann_cosine_topk"):
        timed(f"{qname}_{args.vecs // 1000}k_vecs", all_queries()[qname].fn(spark, link_dir))

    # events-shaped ops at 5M rows (inline: the synthetic events carry
    # real timestamps, not the fixture's ns-int column, so the
    # registered loaders don't apply)
    from ondemand_dask_spark.queries.windows import _EWM_ALPHA, _EWM_L, _EWM_W

    wo_ewm = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    for i, wt in enumerate(reversed(_EWM_W)):
        term = F.coalesce(F.lag("value", i).over(wo_ewm) * F.lit(wt), F.lit(0.0))
        num = term if num is None else num + term
    n = F.least(F.row_number().over(wo_ewm), F.lit(_EWM_L))
    den = (F.lit(1.0) - F.pow(F.lit(1.0 - _EWM_ALPHA), n)) / F.lit(_EWM_ALPHA)
    timed(
        "ewm_bounded_5m",
        events.select("event_id", "user_id", (num / den).alias("ewm_value")),
    )

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        events.withColumn("prev", F.lag("event_type").over(wo))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "ts", "event_id", "event_type")
    )
    timed(
        "scd2_5m",
        ch.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wo).alias("valid_to"),
            F.row_number().over(wo).alias("version"),
        ),
    )

    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "rows": args.rows,
                "docs": args.docs,
                "timings": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
