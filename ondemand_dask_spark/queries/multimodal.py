"""§2.K — multimodal columns: binary payloads + typed metadata.

Design (SURVEY §2.K): media lives in an opaque `binary` column next
to a typed metadata struct; decode / feature-extract / frame-sample
are Arrow-batched Python over `mapInPandas`.  The container has no
image/audio libs, so the decoder is STUBBED: real formats raise
`NotImplementedError`, and `text/plain` payloads get a deterministic
fake feature extractor — the Spark-side plumbing (schema, binary
Arrow transfer, batch iteration, partition parallelism) is real and
differentially tested where the math is SQL-expressible.

At 100 TB: payloads dominate bytes, so every query projects metadata
first and touches the binary column as late as possible (column
pruning keeps unprojected payloads on disk), and the decode stage is
a narrow mapInPandas — linear scan, no shuffle, executor-local.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register

# Formats the stub decoder recognizes.  Only text/plain has a (fake)
# implementation in this container.
_DECODABLE = {"text/plain"}


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table: documents re-materialized as
    (doc_id, payload binary, meta struct<mime,n_bytes,source>).
    Mime is assigned deterministically per row to exercise the
    mixed-format path."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    mime = (
        F.when(F.col("doc_id") % 10 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 10 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("text/plain"))
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN 'image/png'
                WHEN doc_id % 10 = 1 THEN 'audio/wav'
                ELSE 'text/plain' END AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS payload_md5,
           (doc_id % 10 >= 2)         AS decodable
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the multimodal table — mime, payload
    size, content digest, decodability — WITHOUT shipping payloads to
    Python.  (Digest computed on the pre-encode string: DuckDB 1.0
    lacks blob md5; byte-identical for UTF-8.)"""
    m = _media(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return m.join(d, "doc_id").select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
        F.col("meta.mime").isin(*_DECODABLE).alias("decodable"),
    )


def _fake_decode(payload: bytes, mime: str) -> dict:
    """STUB decoder.  A real deployment plugs PIL/librosa/ffmpeg in
    here; this container has none, so non-text mimes raise and
    text/plain returns deterministic byte-level 'features'."""
    if mime not in _DECODABLE:
        raise NotImplementedError(f"no decoder for {mime} in this environment")
    return {
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
        "byte_sum_mod": sum(payload) % 256,
    }


@register("multimodal_decode_features", oracle=None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: Arrow
    ships the bytes batch-wise to Python; undecodable mimes are
    filtered BEFORE the Python boundary (predicate stays JVM-side).
    Rows-only check — byte arithmetic isn't in the oracle's SQL
    dialect."""
    m = _media(spark, sf_dir).filter(F.col("meta.mime").isin(*_DECODABLE))

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "first_byte": [f["first_byte"] for f in feats],
                    "last_byte": [f["last_byte"] for f in feats],
                    "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
                }
            )

    flat = m.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(
        extract,
        "doc_id bigint, first_byte int, last_byte int, byte_sum_mod int",
    )


@register("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: chunk the binary into
    16-byte frames, keep every 4th, emit (doc_id, frame_idx,
    frame_len).  One input row → many output rows through mapInPandas
    — the generator shape real frame extraction uses (a UDTF works
    too; mapInPandas keeps it vectorized per batch)."""
    m = _media(spark, sf_dir).filter(F.col("meta.mime") == "text/plain")

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                chunks = [payload[o : o + 16] for o in range(0, len(payload), 16)]
                for i in range(0, len(chunks), 4):  # sample every 4th frame
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(chunks[i]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens}
            )

    return m.select("doc_id", "payload").mapInPandas(
        frames, "doc_id bigint, frame_idx int, frame_len int"
    )


@register("multimodal_resize", oracle=None)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail analogue: each payload is downsampled to a
    bounded 'thumbnail' (every 4th byte, capped at 64 bytes) and
    shipped BACK through Arrow as a new binary column — the
    round-trip (binary in → Python → binary out) a real image resize
    performs, with the pixel math stubbed to byte-stride sampling
    (no image libs in this container).  Narrow mapInPandas: no
    shuffle, payload bytes never leave the executor."""
    m = _media(spark, sf_dir).filter(F.col("meta.mime").isin(*_DECODABLE))

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = [bytes(p[::4][:64]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "orig_len": [len(p) for p in pdf["payload"]],
                    "thumb_len": [len(t) for t in thumbs],
                }
            )

    out = m.select("doc_id", "payload").mapInPandas(
        resize, "doc_id bigint, thumb binary, orig_len int, thumb_len int"
    )
    # Arrow ships the thumbnail back as real binary (the round-trip
    # under test); hex it at the final select so the driver's pandas
    # canonicalizer — where bytes cells are unhashable — can hash it.
    return out.select(
        "doc_id", F.hex("thumb").alias("thumb_hex"), "orig_len", "thumb_len"
    )


@register(
    "multimodal_dedup_content_hash",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN 'image/png'
                  WHEN doc_id % 10 = 1 THEN 'audio/wav'
                  ELSE 'text/plain' END AS mime,
             md5(text) AS digest
      FROM documents
    )
    SELECT mime, digest,
           min(doc_id) AS keeper,
           count(*)    AS n_copies
    FROM m GROUP BY mime, digest
    HAVING count(*) >= 1
    """,
)
def multimodal_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload dedup by content digest, partitioned by mime
    type (an image never dedups against an audio clip even on a
    digest collision): digest the payload JVM-side, group on
    (mime, digest), keep the first asset.  The multimodal analogue of
    `dedup_exact` — the shuffle moves 16-byte digests + mime strings,
    never payload bytes, which is the only workable shape when the
    payload column is megabytes per row at 100 TB."""
    m = _media(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        m.join(d, "doc_id")
        .select(
            F.col("meta.mime").alias("mime"),
            F.md5("text").alias("digest"),
            "doc_id",
        )
        .groupBy("mime", "digest")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )
