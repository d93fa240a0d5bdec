"""Multimodal column plumbing: binary payloads + typed metadata.

Image/video decode libraries are not available in this environment
(and binaries aren't in the testdata), so THOSE decodes are
deterministic stubs — but the Spark-side plumbing is real and what
the operators exercise: binary columns, Arrow-batched mapInPandas
with a declared schema, partition-parallel frame expansion. AUDIO is
the exception: ``mm_wav_decode`` parses real RIFF/PCM WAV bytes with
``codec/wav.py`` (pure stdlib+numpy) — chunk walk, multi-depth PCM,
corrupt-skip — no stub anywhere on that path.

The stub derives "media" bytes from ``documents.text`` (utf-8 encode)
and fakes decode metadata with arithmetic on byte lengths — chosen so
the DuckDB oracle can verify the pipeline end-to-end even though the
middle runs through pandas batches.

Swap points for production (marked NOTE below): replace
``_fake_decode`` with PIL/ffmpeg calls; schema and batching stay.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_triton_spark.operators.registry import query, tables


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))             AS n_bytes,
           n_chars,
           CASE octet_length(encode(text)) % 3
                WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format_tag
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column creation + metadata projection (pure JVM path)."""
    (d,) = tables(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    n_bytes = F.length(blob)
    return d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        "n_chars",
        F.when(n_bytes % 3 == 0, "png").when(n_bytes % 3 == 1, "jpeg")
         .otherwise("webp").alias("format_tag"),
    )


_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder.

    NOTE: production swap point — replace with e.g.
    ``PIL.Image.open(io.BytesIO(payload))``; raise/skip on corrupt
    payloads exactly like the .tri codec's corrupt-skip semantics.
    """
    n = len(payload)
    return (n % 320 + 32, n % 240 + 32, 3)


@query(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           cast(octet_length(encode(text)) % 320 + 32 as bigint) AS width,
           cast(octet_length(encode(text)) % 240 + 32 as bigint) AS height,
           cast(3 as bigint) AS channels,
           cast(octet_length(encode(text)) as bigint) AS n_bytes
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline: binary column -> mapInPandas ->
    typed metadata rows. The oracle verifies the whole path (the stub's
    outputs are arithmetic on byte length, so SQL can check them)."""
    (d,) = tables(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, c = _fake_decode(b)
                out.append((doc_id, w, h, c, len(b)))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height",
                                             "channels", "n_bytes"])

    return src.mapInPandas(decode, schema=_DECODE_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, f.i AS frame_idx,
           md5(substr(text, cast(f.i * 64 + 1 as integer), 64)) AS frame_hash
    FROM documents
    CROSS JOIN generate_series(0, 3) f(i)
    WHERE length(text) >= f.i * 64 + 1
    """,
    tags=("llm", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per fixed-stride chunk ("frame") of the
    payload, fingerprinted. The video-pipeline shape: explode a media
    blob into per-frame rows partition-locally (no shuffle), hash or
    feature-extract each frame."""
    (d,) = tables(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "text",
                 F.explode(F.expr("sequence(0, 3)")).alias("frame_idx"))
        .where(F.length("text") >= F.col("frame_idx") * 64 + 1)
        .select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"),
                F.md5(F.expr("substr(text, cast(frame_idx * 64 + 1 as int), 64)"))
                 .alias("frame_hash"))
    )


@query(
    "mm_resize_stub",
    oracle="""
    SELECT doc_id,
           cast(least(octet_length(encode(text)) % 320 + 32, 64) as bigint)
             AS out_width,
           cast(least(octet_length(encode(text)) % 240 + 32, 64) as bigint)
             AS out_height,
           cast(least(octet_length(encode(text)) % 320 + 32, 64)
                * least(octet_length(encode(text)) % 240 + 32, 64) * 3 as bigint)
             AS out_bytes
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: decode (stub) -> clamp to a 64x64 target box ->
    emit resized dims + payload size. NOTE production swap point:
    ``img.thumbnail((64, 64))`` in the pandas batch; the batch shape,
    schema, and partition-parallelism are what this operator proves."""
    (d,) = tables(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("out_bytes", T.LongType()),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c = _fake_decode(bytes(payload))
                ow, oh = min(w, 64), min(h, 64)
                out.append((doc_id, ow, oh, ow * oh * c))
            yield pd.DataFrame(out, columns=["doc_id", "out_width",
                                             "out_height", "out_bytes"])

    return src.mapInPandas(resize, schema=schema)


@query(
    "mm_feature_extract",
    oracle="""
    SELECT doc_id,
           array_to_string(
             [cast(octet_length(encode(text)) as bigint),
              cast(n_chars as bigint),
              cast(ascii(substr(text, 1, 1)) as bigint),
              cast(octet_length(encode(text)) % 256 as bigint)], '|')
             AS features
    FROM documents
    """,
    tags=("llm", "multimodal", "embedding"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: media payload -> fixed-dim numeric vector
    (here 4 deterministic byte-level features; production swap point:
    a vision/audio encoder inside the pandas batch emitting
    array<float>). The array column is the handoff into the similarity
    operators (ann_*, dedup_embedding_cosine)."""
    (d,) = tables(spark, sf_dir, "documents")
    src = d.select("doc_id", "n_chars", "text",
                   F.encode("text", "UTF-8").alias("payload"))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.LongType())),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars, text, payload in zip(
                    pdf["doc_id"], pdf["n_chars"], pdf["text"], pdf["payload"]):
                b = bytes(payload)
                rows.append((doc_id, [len(b), int(n_chars),
                                      ord(text[0]) if text else 0,
                                      len(b) % 256]))
            yield pd.DataFrame(rows, columns=["doc_id", "features"])

    # The array<long> vector is the real handoff type inside the engine;
    # the registry RESULT joins it to a string because array-typed output
    # columns crash the driver's canonical sort (unhashable list).
    return (src.mapInPandas(extract, schema=schema)
            .select("doc_id",
                    F.array_join(F.expr("transform(features, x -> cast(x as string))"),
                                 "|").alias("features")))


@query(
    "mm_wav_decode",
    oracle="""
    SELECT doc_id,
           cast(1 as bigint)    AS n_channels,
           cast(8000 as bigint) AS sample_rate,
           cast(16 as bigint)   AS bit_depth,
           cast(480 as bigint)  AS n_frames,
           cast(60 as bigint)   AS duration_ms,
           cast(1000 + (doc_id % 20) * 500 as bigint) AS peak,
           cast(1000 + (doc_id % 20) * 500 as bigint) AS rms_u
    FROM documents
    WHERE doc_id % 97 <> 13
    """,
    tags=("llm", "multimodal", "audio"),
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, no stub: each row carries a complete RIFF/PCM
    WAV payload (binary column) that codec/wav.py genuinely parses —
    chunk walk, fmt/data extraction, PCM sample stats. No native media
    library needed, so this is the one mm_* format whose decode path
    is production code, not a swap point.

    The gate corpus synthesizes the payloads in the same Arrow batch
    (a 480-frame 16-bit square wave whose amplitude is a closed-form
    function of doc_id — so the DuckDB oracle knows every output
    analytically), and deterministically TRUNCATES every 97th payload:
    the parser must reject those (ValueError) and the operator skips
    them, proving the corrupt-skip contract (same semantics as the
    msgpack decode path, tritond/server.go's unmarshal-skip) on real
    bytes. In production the payload column comes from
    ``spark.read.format("binaryFile")`` or an archive table; schema,
    batching, and partition-parallelism are identical.
    """
    from go_triton_spark.codec.wav import build_wav, parse_wav

    (d,) = tables(spark, sf_dir, "documents")
    src = d.select("doc_id")

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("rms_u", T.LongType()),
    ])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                amp = 1000 + (doc_id % 20) * 500
                wave = np.where(np.arange(480) % 2 == 0, amp, -amp)
                payload = build_wav(wave, sample_rate=8000)
                if doc_id % 97 == 13:
                    payload = payload[:30]  # corrupt: truncated mid-fmt
                try:
                    m = parse_wav(payload)
                except ValueError:
                    continue  # corrupt-skip, counted by the oracle's WHERE
                rows.append((doc_id, m["n_channels"], m["sample_rate"],
                             m["bit_depth"], m["n_frames"],
                             m["duration_ms"], m["peak"], m["rms_u"]))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return src.mapInPandas(decode, schema=schema)
