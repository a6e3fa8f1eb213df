"""§2.K — multimodal columns: binary payloads + typed metadata.

Design (SURVEY §2.K): media lives in an opaque `binary` column next
to a typed metadata struct; decode / feature-extract / frame-sample
are Arrow-batched Python over `mapInPandas`.  The container has no
image/audio LIBS, but two formats are decoded for REAL with pure
Python — RIFF/WAVE headers (struct.unpack) and binary PPM (header
scan + pixel checksum), exact-oracled in `multimodal_decode_wav` /
`_ppm` at the bottom of this module.  The generic `_media`-based
queries keep the stub decoder: non-text mimes raise
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


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN -1
                ELSE ascii(substr(text, 1, 1)) END AS first_byte,
           CASE WHEN length(text) = 0 THEN -1
                ELSE ascii(substr(text, length(text), 1)) END AS last_byte,
           CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))), 0) % 256 AS INT) AS byte_sum_mod
    FROM documents WHERE doc_id % 10 >= 2
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: Arrow
    ships the bytes batch-wise to Python; undecodable mimes are
    filtered BEFORE the Python boundary (predicate stays JVM-side).
    The Python side does real byte arithmetic on the payload; the
    oracle recomputes it as ascii() arithmetic over the source text —
    exact because the fixture corpus is pure ASCII (verified per SF),
    where UTF-8 bytes and codepoints coincide."""
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


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, octet_length(encode(text)) AS len
      FROM documents WHERE doc_id % 10 >= 2
    )
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST(least(16, len - 16 * i) AS INT) AS frame_len
    FROM (
      SELECT doc_id, len,
             unnest(generate_series(0,
                    CAST(ceil(len / 16.0) AS INT) - 1, 4)) AS i
      FROM t
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: chunk the binary into
    16-byte frames, keep every 4th, emit (doc_id, frame_idx,
    frame_len).  One input row → many output rows through mapInPandas
    — the generator shape real frame extraction uses (a UDTF works
    too; mapInPandas keeps it vectorized per batch).  The Python side
    chunks REAL bytes; the oracle recomputes the frame plan from pure
    length arithmetic — a stride or boundary bug diverges the hash."""
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


@register(
    "multimodal_resize",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, length(text) AS len
      FROM documents WHERE doc_id % 10 >= 2
    )
    SELECT doc_id,
           coalesce(hex(encode(array_to_string(
             list_transform(generate_series(1, least(len, 253), 4),
                            i -> substr(text, i, 1)), ''))), '') AS thumb_hex,
           CAST(len AS INT) AS orig_len,
           CAST(least(64, CAST(ceil(len / 4.0) AS INT)) AS INT) AS thumb_len
    FROM t
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail analogue: each payload is downsampled to a
    bounded 'thumbnail' (every 4th byte, capped at 64 bytes) and
    shipped BACK through Arrow as a new binary column — the
    round-trip (binary in → Python → binary out) a real image resize
    performs, with the pixel math stubbed to byte-stride sampling
    (no image libs in this container).  Narrow mapInPandas: no
    shuffle, payload bytes never leave the executor.  Exact-oracled:
    the Python side strides real payload bytes; the oracle strides
    the source text's chars (byte ≡ char on this verified-ASCII
    corpus) and hexes the same thumbnail."""
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


# ---------------------------------------------------------------------------
# REAL decoders — pure-Python WAV / PPM header parsing (no media libs
# needed).  Payloads are genuine format bytes built in a staging
# mapInPandas (the fixture), then decoded by a second mapInPandas that
# does real byte-level parsing (struct.unpack / ASCII header scan).
# Both sides of the differential check are honest: Spark's numbers
# come from parsing the actual bytes; the DuckDB oracle recomputes
# them from the deterministic generation formulas — a wrong parser
# (endianness, offset, header length) hash-mismatches immediately.
# ---------------------------------------------------------------------------

_R = 4
_WAV_DATA_LEN = 64  # fixed PCM payload size (keeps n_samples SQL-derivable)


def _wav_bytes(doc_id: int, text: str) -> bytes:
    """Canonical 44-byte RIFF/WAVE PCM header + 64 data bytes."""
    import struct

    rate = 8000 + (doc_id % 5) * 1000
    channels = 1 + doc_id % 2
    bits = 16
    data = text.encode("utf-8")[:_WAV_DATA_LEN].ljust(_WAV_DATA_LEN, b"\x00")
    block_align = channels * bits // 8
    byte_rate = rate * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, block_align, bits)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _ppm_bytes(doc_id: int) -> bytes:
    """Binary PPM (P6): ASCII header + w*h*3 deterministic pixel bytes."""
    w = 4 + doc_id % 8
    h = 3 + doc_id % 5
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    pixels = bytes((doc_id + i) % 256 for i in range(w * h * 3))
    return header + pixels


def _real_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fixture with REAL format payloads: doc_id%10==0 →
    binary PPM image, ==1 → PCM WAV clip, else UTF-8 text.  Built in
    a narrow mapInPandas (payload bytes never shuffle)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stage(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if doc_id % 10 == 0:
                    payloads.append(_ppm_bytes(int(doc_id)))
                    mimes.append("image/ppm")
                elif doc_id % 10 == 1:
                    payloads.append(_wav_bytes(int(doc_id), text))
                    mimes.append("audio/wav")
                else:
                    payloads.append(text.encode("utf-8"))
                    mimes.append("text/plain")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "mime": mimes, "payload": payloads}
            )

    return d.mapInPandas(stage, "doc_id bigint, mime string, payload binary")


@register(
    "multimodal_decode_wav",
    oracle=f"""
    SELECT doc_id,
           8000 + (doc_id % 5) * 1000        AS sample_rate,
           CAST(1 + doc_id % 2 AS INT)       AS n_channels,
           16                                 AS bits_per_sample,
           {_WAV_DATA_LEN}                    AS data_bytes,
           CAST({_WAV_DATA_LEN} // ((1 + doc_id % 2) * 2) AS INT) AS n_samples
    FROM documents WHERE doc_id % 10 = 1
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: parses the RIFF/WAVE fmt chunk of genuine
    WAV payloads with struct.unpack — sample rate, channel count,
    bit depth, data size, sample count.  The oracle recomputes each
    field from the fixture's generation formula, so a parser bug
    (wrong offset/endianness) fails the hash.  Narrow mapInPandas
    over the already-filtered wav rows; payload bytes cross to
    Python once and nothing shuffles."""
    m = _real_media(spark, sf_dir).filter(F.col("mime") == "audio/wav")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        rows: dict[str, list] = {
            "doc_id": [], "sample_rate": [], "n_channels": [],
            "bits_per_sample": [], "data_bytes": [], "n_samples": [],
        }
        for pdf in it:
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                assert b[:4] == b"RIFF" and b[8:12] == b"WAVE", "bad magic"
                (_fmt_len, _pcm, ch, rate, _brate, _balign, bits) = struct.unpack(
                    "<IHHIIHH", b[16:36]
                )
                (data_len,) = struct.unpack("<I", b[40:44])
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["bits_per_sample"].append(bits)
                rows["data_bytes"].append(data_len)
                rows["n_samples"].append(data_len // (ch * bits // 8))
        yield pd.DataFrame(rows)

    return m.mapInPandas(
        decode,
        "doc_id bigint, sample_rate bigint, n_channels int, "
        "bits_per_sample int, data_bytes int, n_samples int",
    )


@register(
    "multimodal_decode_ppm",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 8 AS INT) AS width,
           CAST(3 + doc_id % 5 AS INT) AS height,
           255                          AS maxval,
           CAST((4 + doc_id % 8) * (3 + doc_id % 5) * 3 AS INT) AS n_pixel_bytes,
           CAST(list_sum(list_transform(generate_series(0, 15),
                i -> (doc_id + i) % 256)) AS INT) AS checksum16
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: parses binary-PPM (P6) headers — magic,
    dimensions, maxval — and checksums the first 16 actual pixel
    bytes.  Oracle recomputes everything from the generation
    formulas; a parsing bug (header length, dimension order) or a
    corrupted pixel stream hash-mismatches."""
    m = _real_media(spark, sf_dir).filter(F.col("mime") == "image/ppm")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {
            "doc_id": [], "width": [], "height": [], "maxval": [],
            "n_pixel_bytes": [], "checksum16": [],
        }
        for pdf in it:
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                assert b[:2] == b"P6", "bad magic"
                # header = 3 whitespace-separated tokens after magic
                parts = b.split(b"\n", 3)
                w, h = (int(x) for x in parts[1].split())
                maxval = int(parts[2])
                pixels = parts[3]
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["maxval"].append(maxval)
                rows["n_pixel_bytes"].append(len(pixels))
                rows["checksum16"].append(sum(pixels[:16]))
        yield pd.DataFrame(rows)

    return m.mapInPandas(
        decode,
        "doc_id bigint, width int, height int, maxval int, "
        "n_pixel_bytes int, checksum16 int",
    )


@register(
    "multimodal_wav_rms",
    oracle=f"""
    WITH wav AS (
      SELECT doc_id, substr(text, 1, {_WAV_DATA_LEN}) AS t
      FROM documents WHERE doc_id % 10 = 1
    ),
    s AS (
      SELECT doc_id,
             list_transform(
               list_transform(generate_series(0, {_WAV_DATA_LEN // 2 - 1}),
                 k -> (CASE WHEN 2*k+1 <= length(t)
                            THEN ascii(substr(t, 2*k+1, 1)) ELSE 0 END)
                    + 256 * (CASE WHEN 2*k+2 <= length(t)
                                  THEN ascii(substr(t, 2*k+2, 1)) ELSE 0 END)),
               r -> CASE WHEN r >= 32768 THEN r - 65536 ELSE r END) AS v
      FROM wav
    )
    SELECT doc_id,
           round(sqrt(list_sum(list_transform(v, x -> CAST(x*x AS DOUBLE)))
                      / {_WAV_DATA_LEN // 2}) - 1e-9, {_R}) + 0.0 AS rms,
           CAST(list_max(list_transform(v, x -> abs(x))) AS INT) AS peak,
           round(list_sum(list_transform(v, x -> CAST(x AS DOUBLE)))
                 / {_WAV_DATA_LEN // 2} - 1e-9, {_R}) + 0.0 AS dc_mean
    FROM s
    """,
)
def multimodal_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio FEATURE EXTRACTION, one step past header decode:
    the PCM data chunk decodes to little-endian int16 samples
    (numpy `frombuffer`, vectorized over the Arrow batch) and yields
    the three first-line audio-QC signals — RMS loudness, absolute
    peak, DC offset.  The oracle recomputes the identical samples
    from the fixture's generation formula (data bytes = the text's
    first _WAV_DATA_LEN ASCII bytes, zero-padded) including the int16 two's-
    complement fold, so an endianness or offset bug in the real
    decoder fails the hash.  Same scale shape as the other decoders:
    payloads cross to Python once in a narrow mapInPandas, features
    come back scalar, nothing shuffles until the (tiny) result."""
    m = _real_media(spark, sf_dir).filter(F.col("mime") == "audio/wav")

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        rows: dict[str, list] = {
            "doc_id": [], "rms": [], "peak": [], "dc_mean": [],
        }
        for pdf in it:
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                (data_len,) = struct.unpack("<I", b[40:44])
                samples = np.frombuffer(
                    b[44 : 44 + data_len], dtype="<i2"
                ).astype(np.float64)
                rows["doc_id"].append(doc_id)
                rows["rms"].append(
                    round(float(np.sqrt(np.mean(samples**2))) - 1e-9, _R)
                )
                rows["peak"].append(int(np.abs(samples).max()))
                rows["dc_mean"].append(
                    round(float(samples.mean()) - 1e-9, _R)
                )
        yield pd.DataFrame(rows)

    return m.mapInPandas(
        extract, "doc_id bigint, rms double, peak int, dc_mean double"
    )


# Shared oracle CTE body: recompute the aHash from the PPM
# generation formula (doc_id%10==0 images, deterministic pixels).
_AHASH_ORACLE = """
    px AS (
      SELECT doc_id,
             (4 + doc_id % 8) * (3 + doc_id % 5) AS npix
      FROM documents WHERE doc_id % 10 = 0
    ),
    gray AS (
      SELECT doc_id, npix,
             list_transform(generate_series(0, npix - 1),
               p -> (((doc_id + 3 * p) % 256)
                   + ((doc_id + 3 * p + 1) % 256)
                   + ((doc_id + 3 * p + 2) % 256)) / 3.0) AS g
      FROM px
    ),
    stats AS (
      SELECT doc_id, npix, g,
             list_sum(g) / npix AS mean_gray
      FROM gray
    ),
    ah AS (
      SELECT doc_id, CAST(npix AS INT) AS n_pixels,
             round(mean_gray - 1e-9, 4) + 0.0 AS mean_gray,
             CAST(list_sum(list_transform(
                    generate_series(1, least(npix, 64)),
                    i -> CASE WHEN g[i] > mean_gray
                              THEN CAST(2 AS BIGINT) ** (i - 1)
                              ELSE 0 END)) AS BIGINT) AS ahash
      FROM stats
    )"""


@register(
    "multimodal_image_ahash",
    oracle=f"""
    WITH {_AHASH_ORACLE}
    SELECT doc_id, n_pixels, mean_gray, ahash FROM ah
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image fingerprint — the AVERAGE HASH: decode the
    REAL binary-PPM pixel stream, gray = mean(R,G,B) per pixel, one
    bit per pixel (gray > image mean), packed into a 64-bit
    signature.  aHash is the classic near-duplicate-IMAGE key (two
    re-encodes of the same picture differ by a few bits; pair them
    with the same multi-index Hamming blocking dedup_simhash_pairs
    uses — the signature table is 8 bytes/image, so the pairing
    stage never touches pixels again).  The decode is an
    Arrow-batched mapInPandas (numpy over the raw bytes, no image
    libs needed for PPM); the oracle recomputes gray means and bits
    from the fixture's pixel-generation formula, so an off-by-one in
    the header scan, channel order, or bit packing hash-mismatches.
    At 100 TB the scan is payload-bound and narrow — project
    metadata first, decode last, emit 8-byte signatures."""
    import numpy as np

    m = _real_media(spark, sf_dir).filter(F.col("mime") == "image/ppm")

    def ahash(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {
            "doc_id": [], "n_pixels": [], "mean_gray": [], "ahash": [],
        }
        for pdf in it:
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                assert b[:2] == b"P6", "bad magic"
                parts = b.split(b"\n", 3)
                w, h = (int(x) for x in parts[1].split())
                px = np.frombuffer(parts[3], dtype=np.uint8)[: w * h * 3]
                gray = px.reshape(-1, 3).sum(axis=1) / 3.0
                mean = float(gray.mean())
                bits = gray[:64] > mean
                sig = int(
                    sum(1 << i for i, hit in enumerate(bits) if hit)
                )
                rows["doc_id"].append(doc_id)
                rows["n_pixels"].append(w * h)
                rows["mean_gray"].append(round(mean - 1e-9, 4) + 0.0)
                rows["ahash"].append(sig)
        yield pd.DataFrame(rows)

    return m.mapInPandas(
        ahash,
        "doc_id bigint, n_pixels int, mean_gray double, ahash bigint",
    )


_BAND_BINS = (1, 2, 4, 8)  # DFT bins probed over the N=32 sample clip
_BAND_N = _WAV_DATA_LEN // 2  # 32 int16 samples


def _band_energy_sql() -> str:
    """Oracle: recompute the int16 samples from the generation
    formula (wav data bytes = the text's first 64 ASCII bytes,
    zero-padded), normalize by 2^15, and evaluate the DFT power at
    each probed bin as (Σ x·cos)² + (Σ x·sin)² — the identical
    closed form the Spark-side extractor runs on the decoded bytes."""
    bands = []
    for k in _BAND_BINS:
        c = (
            f"list_sum(list_transform(generate_series(0, {_BAND_N - 1}), "
            f"n -> xs[n + 1] * cos(2 * pi() * {k} * n / {_BAND_N}.0)))"
        )
        s = (
            f"list_sum(list_transform(generate_series(0, {_BAND_N - 1}), "
            f"n -> xs[n + 1] * sin(2 * pi() * {k} * n / {_BAND_N}.0)))"
        )
        bands.append(
            f"round(({c}) * ({c}) + ({s}) * ({s}) - 1e-9, {_R}) + 0.0"
            f" AS p{k}"
        )
    band_cols = ",\n           ".join(bands)
    dom = (
        "CASE WHEN p1 >= p2 AND p1 >= p4 AND p1 >= p8 THEN 1 "
        "WHEN p2 >= p4 AND p2 >= p8 THEN 2 "
        "WHEN p4 >= p8 THEN 4 ELSE 8 END"
    )
    return f"""
    WITH wav AS (
      SELECT doc_id, substr(text, 1, {_WAV_DATA_LEN}) AS t
      FROM documents WHERE doc_id % 10 = 1
    ),
    s AS (
      SELECT doc_id,
             list_transform(
               list_transform(
                 list_transform(generate_series(0, {_BAND_N - 1}),
                   k -> (CASE WHEN 2*k+1 <= length(t)
                              THEN ascii(substr(t, 2*k+1, 1)) ELSE 0 END)
                      + 256 * (CASE WHEN 2*k+2 <= length(t)
                                    THEN ascii(substr(t, 2*k+2, 1))
                                    ELSE 0 END)),
                 r -> CASE WHEN r >= 32768 THEN r - 65536 ELSE r END),
               i -> i / 32768.0) AS xs
      FROM wav
    ),
    p AS (
      SELECT doc_id,
           {band_cols}
      FROM s
    )
    SELECT doc_id, p1, p2, p4, p8,
           CAST({dom} AS INT) AS dominant_bin
    FROM p
    """


@register("multimodal_audio_band_energy", oracle=_band_energy_sql())
def multimodal_audio_band_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL spectral feature extraction over decoded PCM: DFT power
    at four probe bins (1, 2, 4, 8 cycles per clip) of the
    2^15-normalized int16 samples, plus the dominant bin — the
    single-bin Goertzel evaluation behind tone detection, hum
    checks, and cheap audio fingerprints.  One step past
    multimodal_wav_rms's time-domain stats into the frequency
    domain, on the same honest-differential contract: Spark decodes
    the actual WAV bytes (struct.unpack + numpy), the oracle
    recomputes the identical samples from the fixture's generation
    formula and evaluates the same closed form in SQL.

    Numerics: samples normalize to |x| ≤ 1 BEFORE the projection, so
    each power is ≤ 2·N² ≈ 2048 and cross-engine libm cos/sin ulp
    drift (~1e-13 absolute after the square) cannot reach the 4 dp
    round; dominant_bin compares the ROUNDED powers with a
    smallest-bin tie rule on both engines.  Scale shape: payload
    bytes cross to Python once in the narrow mapInPandas (declared
    Arrow boundary), features return as five scalars per clip,
    nothing shuffles."""
    m = _real_media(spark, sf_dir).filter(F.col("mime") == "audio/wav")
    n = _BAND_N

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        basis = {
            k: (
                np.cos(2.0 * np.pi * k * np.arange(n) / n),
                np.sin(2.0 * np.pi * k * np.arange(n) / n),
            )
            for k in _BAND_BINS
        }
        rows: dict[str, list] = {"doc_id": []}
        for k in _BAND_BINS:
            rows[f"p{k}"] = []
        rows["dominant_bin"] = []
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                (data_len,) = struct.unpack("<I", b[40:44])
                xs = (
                    np.frombuffer(b[44 : 44 + data_len], dtype="<i2")
                    .astype(np.float64)
                    / 32768.0
                )
                rows["doc_id"].append(doc_id)
                powers = {}
                for k in _BAND_BINS:
                    cvec, svec = basis[k]
                    c = float(np.dot(xs, cvec))
                    s = float(np.dot(xs, svec))
                    powers[k] = round(c * c + s * s - 1e-9, _R) + 0.0
                    rows[f"p{k}"].append(powers[k])
                dom = max(_BAND_BINS, key=lambda k: (powers[k], -k))
                rows["dominant_bin"].append(dom)
        yield pd.DataFrame(rows)

    return m.mapInPandas(
        extract,
        "doc_id bigint, p1 double, p2 double, p4 double, p8 double, "
        "dominant_bin int",
    )


_NEARDUP_MAX_HAMMING = 3
_NEARDUP_BANDS = 4  # 16-bit bands over the 64-bit aHash


@register(
    "multimodal_image_near_dup",
    oracle=f"""
    WITH {_AHASH_ORACLE},
    bands AS (
      SELECT doc_id, ahash, b,
             (ahash >> (16 * b)) & 65535 AS band_val
      FROM ah, unnest(generate_series(0, {_NEARDUP_BANDS - 1})) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
             x.ahash AS ha, y.ahash AS hb
      FROM bands x JOIN bands y
        ON x.b = y.b AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
    )
    SELECT a, b,
           CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= {_NEARDUP_MAX_HAMMING}
    """,
)
def multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE pairs by banded aHash Hamming distance —
    the visual member of the near-dup family (minhash : text ::
    simhash : tokens :: aHash bands : pixels).  Reuses the real
    PPM-decode aHash (multimodal_image_ahash) and blocks with the
    pigeonhole guarantee: hamming ≤ {_NEARDUP_MAX_HAMMING} over 64
    bits split into {_NEARDUP_BANDS} 16-bit bands forces at least
    one band to match exactly, so banding finds EVERY qualifying
    pair while probing only per-band bucket collisions — the same
    completeness argument as dedup_simhash_pairs.

    Scale shape: one decode pass to |images| 64-bit signatures, a
    ×{_NEARDUP_BANDS} band explode on that signature table (never on
    payloads), a bucket equi-join, and a codegen'd xor+bit_count
    refine — candidates are bucket-bounded, not all-pairs.  The
    Hamming distance is exact integer arithmetic, identical on both
    engines."""
    ah = multimodal_image_ahash(spark, sf_dir).select("doc_id", "ahash")
    bands = ah.select(
        "doc_id",
        "ahash",
        F.explode(
            F.sequence(F.lit(0), F.lit(_NEARDUP_BANDS - 1))
        ).alias("b"),
    ).withColumn(
        "band_val", F.expr("shiftright(ahash, 16 * b) & 65535")
    )
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.ahash").alias("ha"),
            F.col("y.ahash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ).cast("int")
    return cand.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= _NEARDUP_MAX_HAMMING
    )
