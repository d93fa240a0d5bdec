"""Perceptual (content-based) near-duplicate operators over decoded
media — the image/audio siblings of the text near-dup family.

Byte hashes (dedup_exact) catch identical files; decoded-pixel hashes
(dedup_image_cross_format) catch the same pixels in different
containers. Neither catches what image training-data pipelines
actually fight: the SAME photo re-encoded, resized, or slightly
retouched. The production answer (LAION, DataComp) is a perceptual
hash — here dHash (gradient hash): luma-downsample to a 9x8 grid,
emit one bit per horizontal gradient sign, giving a 64-bit signature
whose Hamming distance tracks visual similarity. Near-dup pairs are
then found EXACTLY like SimHash text dedup: band the 64 bits into 4x
16-bit keys (pigeonhole: any pair within Hamming<=3 collides on at
least one band), bucket-join on (band, key), and verify candidates
with an exact popcount — never all-pairs.

At 100 TB: decode+hash is a per-row Arrow pass (zero shuffles); only
(doc_id, 8-byte signature) rows shuffle into band buckets, and the
exact verifier touches candidate pairs only. The same
bucket-join-then-verify plan the text side already proved at scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_triton_spark.operators.registry import query, spread, tables

_DH_ROWS, _DH_COLS = 8, 9          # dHash grid: 8 rows x 9 cols -> 64 bits
_PH_BANDS, _PH_BAND_BITS = 4, 16   # 4 bands x 16 bits; catches Hamming<=3
_PH_MAX_HAMMING = 3


def dhash64(pixels) -> int:
    """64-bit difference hash of an (h, w, 3) uint8 RGB array.

    Integer luma (r + 2g + b) / 4, area-average resample onto the 9x8
    grid (row/col bins), then bit (r, c) = 1 iff grid[r][c+1] >
    grid[r][c]. Pure numpy, format-agnostic — callers feed it any
    parse_image output. Returned as a SIGNED 64-bit value so it stores
    in a Spark LongType column without loss.
    """
    import numpy as np

    px = pixels.astype("int64")
    luma = (px[:, :, 0] + 2 * px[:, :, 1] + px[:, :, 2]) // 4
    h, w = luma.shape
    # area-average resample: split rows into 8 bins, cols into 9 bins
    rbin = (np.arange(h) * _DH_ROWS) // h
    cbin = (np.arange(w) * _DH_COLS) // w
    grid = np.zeros((_DH_ROWS, _DH_COLS), dtype=np.float64)
    for r in range(_DH_ROWS):
        rows = luma[rbin == r]
        for c in range(_DH_COLS):
            grid[r, c] = rows[:, cbin == c].mean()
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64)  # (8, 8)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    return int((bits * weights).sum(dtype=np.uint64).view(np.int64))


def _phash_key_bits(img_key: int) -> int:
    """Ground-truth 64-bit gradient pattern for one gate image key.

    md5-derived so distinct keys differ in ~32 bits (the pairwise
    floor is asserted in tests — with 40 keys the probability any two
    64-bit digests land within Hamming 3 is ~1e-14, and the generator
    is deterministic so the property is checked once, not per run).
    """
    return int.from_bytes(
        hashlib.md5(b"phash-gate:%d" % img_key).digest()[:8], "big")


def _phash_gate_pixels(doc_id: int):
    """Gate image for doc_id: an 18x16 grayscale-content RGB image
    whose 9x8 dHash is EXACTLY ``_phash_key_bits(doc_id % 40)``, with
    per-doc perturbations that keep the hash within Hamming 1:

    - variant 0: the base image;
    - variant 1: +/-4 per-pixel noise (every gradient step is +/-12,
      block-mean noise shifts a step by at most 8 — signs survive);
    - variant 2: one gradient sign inverted at (row = img_key % 8,
      col 7) — flips exactly ONE hash bit (column 7 is the row's last
      step, so no neighboring gradient changes).

    So docs sharing img_key = doc_id % 40 sit within Hamming<=2 of
    each other (near-dups), while distinct keys sit ~32 bits apart —
    and the DuckDB oracle can state the expected pairs from img_key
    alone, a differential test of decode + hash + banding + verify.
    """
    import numpy as np

    img_key = doc_id % 40
    variant = (doc_id // 40) % 3
    bits = _phash_key_bits(img_key)
    step = np.where(
        [[(bits >> (r * 8 + c)) & 1 for c in range(8)] for r in range(8)],
        12, -12)
    grid = np.concatenate(
        [np.full((8, 1), 128, dtype=np.int64),
         128 + np.cumsum(step, axis=1)], axis=1)          # (8, 9)
    if variant == 2:
        r = img_key % 8
        grid[r, 8] = grid[r, 7] - (grid[r, 8] - grid[r, 7])
    img = np.repeat(np.repeat(grid, 2, axis=0), 2, axis=1)  # (16, 18)
    if variant == 1:
        py, px = np.mgrid[0:16, 0:18]
        img = img + ((doc_id * 7 + px * 5 + py * 3) % 9) - 4
    return np.dstack([img, img, img]).astype("uint8")


@query(
    "dedup_image_phash",
    oracle="""
    WITH live AS (SELECT doc_id, doc_id % 40 AS img_key
                  FROM documents WHERE doc_id % 131 <> 17)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM live a JOIN live b
      ON a.img_key = b.img_key AND a.doc_id < b.doc_id
    """,
    tags=("llm", "dedup", "multimodal", "image"),
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs: dHash-64 over DECODED pixels,
    banded Hamming LSH, exact popcount verification (<= 3 bits).

    Each row's payload is a complete real image file (container format
    cycles bmp/png/tiff/webp by doc_id, so the magic-sniffing dispatch
    and all four production decoders sit on the hot path), perturbed
    per doc: pixel noise and a single-gradient retouch that byte- and
    pixel-exact dedup both miss, but dHash keeps within Hamming 1.
    Every 131st payload is truncated mid-file — all four parsers
    reject it and the doc drops out of its pair set (corrupt-skip on
    real bytes).

    The oracle is deliberately NOT a dHash re-implementation: it
    states the expected pairs from the generator's ground-truth image
    key, so any decoder, resampler, hash, banding, or verify defect
    breaks the match.

    Plan shape (the SimHash/minhash scale plan, applied to images):
    decode+hash never shuffles; signatures cache as (doc_id, long);
    4x16-bit band keys derive JVM-side (shiftrightunsigned + mask);
    candidates = one bucket self-join; verify = xor + bit_count, all
    whole-stage codegen.
    """
    from go_triton_spark.codec.bmp import build_bmp
    from go_triton_spark.codec.image import parse_image
    from go_triton_spark.codec.png import build_png
    from go_triton_spark.codec.tiff import build_tiff
    from go_triton_spark.codec.vp8l import build_webp

    (d,) = tables(spark, sf_dir, "documents")
    src = spread(d.select("doc_id"), spark, rows_per_task=500)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ])

    def hash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        builders = (build_bmp, build_png, build_tiff, build_webp)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                payload = builders[doc_id % 4](_phash_gate_pixels(doc_id))
                if doc_id % 131 == 17:
                    payload = payload[:-11]  # corrupt: truncated file
                try:
                    m = parse_image(payload)
                except ValueError:
                    continue  # corrupt-skip, mirrored by the oracle WHERE
                rows.append((doc_id, dhash64(m["pixels"])))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    # signatures are read by the band explode AND both verify sides —
    # cache so the Python decode pass runs once (the window/cache
    # lesson from dedup_image_cross_format's plan audit)
    sigs = src.mapInPandas(hash_images, schema=schema).cache()

    band_structs = ", ".join(
        f"named_struct('band', {b}, 'key', "
        f"cast(shiftrightunsigned(phash, {b * _PH_BAND_BITS}) & 65535 as int))"
        for b in range(_PH_BANDS))
    buckets = sigs.select(
        "doc_id",
        F.explode(F.expr(f"array({band_structs})")).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    cand = (
        buckets.alias("a").join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ha = sigs.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("h_a"))
    hb = sigs.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("h_b"))
    return (
        cand.join(ha, "id_a").join(hb, "id_b")
        .where(F.expr(f"bit_count(h_a ^ h_b) <= {_PH_MAX_HAMMING}"))
        .select("id_a", "id_b")
    )


# =====================================================================
# Gain-invariant audio fingerprint dedup
# =====================================================================

_AFP_SEGS = 16            # segments per clip -> 15-bit fingerprint
_AFP_SEG_LEN = 32         # samples per segment


def audio_fingerprint(samples) -> int:
    """Chromaprint-style energy-delta fingerprint: split the clip
    into fixed segments, compute per-segment energy, emit one bit per
    consecutive-segment energy INCREASE. Ratios of energies are
    invariant to gain, so the same recording at different volumes —
    the most common audio near-dup in scraped corpora — fingerprints
    identically, while byte and sample hashes both miss it."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    n_seg = len(s) // _AFP_SEG_LEN
    seg = s[:n_seg * _AFP_SEG_LEN].reshape(n_seg, _AFP_SEG_LEN)
    energy = (seg * seg).sum(axis=1)
    bits = energy[1:] > energy[:-1]
    return int(sum(1 << j for j, b in enumerate(bits) if b))


def _afp_gate_signal(doc_id: int):
    """Gate clip: 16 segments of 32-sample square waves whose
    AMPLITUDE STAIRCASE encodes md5 bits of the group key (doc_id %
    45) — amp_j = 100*(2 + bit_j) + j, so consecutive-segment energy
    deltas are never ties — scaled by a per-doc gain of 1..3x. Docs
    sharing the key fingerprint identically at any gain; the 45 key
    patterns are pairwise distinct (asserted in tests)."""
    import numpy as np

    akey = doc_id % 45
    gain = 1 + (doc_id // 45) % 3
    h = int.from_bytes(
        hashlib.md5(b"afp-gate:%d" % akey).digest(), "big")
    segs = []
    for j in range(_AFP_SEGS):
        amp = (100 * (2 + ((h >> j) & 1)) + j) * gain
        i = np.arange(_AFP_SEG_LEN)
        segs.append(np.where(i % 8 < 4, amp, -amp))
    return np.concatenate(segs).astype(np.int64)


@query(
    "dedup_audio_fingerprint",
    oracle="""
    WITH live AS (SELECT doc_id, doc_id % 45 AS akey
                  FROM documents WHERE doc_id % 181 <> 7)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM live a JOIN live b
      ON a.akey = b.akey AND a.doc_id < b.doc_id
    """,
    tags=("llm", "dedup", "multimodal", "audio"),
)
def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio near-dup pairs: the same recording at
    different GAIN is the same training clip — byte hashes and
    decoded-sample hashes both miss that; a gain-invariant
    energy-delta fingerprint (``audio_fingerprint``) catches it.
    Payloads alternate real WAV and FLAC containers through the
    magic-sniffing parse_audio dispatch, and every doc carries a
    per-doc volume scale, so the operator proves decode + normalize +
    fingerprint end to end. Every 181st payload is truncated
    (corrupt-skip on real bytes).

    The oracle states expected pairs from the generator's ground-truth
    clip key — a differential test; any decoder or fingerprint defect
    splits or merges groups and breaks the hash.

    Plan (the dedup_exact scale shape, fingerprint computed from
    decoded audio): decode+fingerprint never shuffles; only
    (doc_id, int fingerprint) rows reach the self-join's exchange.
    """
    from go_triton_spark.codec.audio import parse_audio
    from go_triton_spark.codec.flac import build_flac
    from go_triton_spark.codec.wav import build_wav

    (d,) = tables(spark, sf_dir, "documents")
    src = spread(d.select("doc_id"), spark, rows_per_task=500)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("afp", T.LongType()),
    ])

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = _afp_gate_signal(doc_id)
                payload = (build_wav(s) if doc_id % 2 == 0
                           else build_flac(s))
                if doc_id % 181 == 7:
                    payload = payload[:-19]  # corrupt: truncated
                try:
                    m = parse_audio(payload)
                except ValueError:
                    continue  # corrupt-skip, mirrored by the oracle
                rows.append((doc_id,
                             audio_fingerprint(m["samples"][:, 0])))
            yield pd.DataFrame(rows, columns=["doc_id", "afp"])

    # both join sides read the fingerprint frame — cache so the Python
    # decode pass runs once (same lesson as dedup_image_phash)
    fps = src.mapInPandas(fingerprint, schema=schema).cache()
    a = fps.alias("a")
    b = fps.alias("b")
    return (a.join(b, (F.col("a.afp") == F.col("b.afp"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b")))


# =====================================================================
# Audio signal features (quality/content filtering primitives)
# =====================================================================

def _audio_gate_signal(doc_id: int):
    """Gate waveform: a 128-sample 50%-duty square wave whose period
    (8/16/32 by doc_id % 3) and amplitude (1000 + doc_id % 100) give
    every feature below a closed form the DuckDB oracle states
    directly — energy n*A^2, zero crossings 2n/P - 1, and a dominant
    rFFT bin at exactly n/P (the fundamental beats the strongest
    harmonic by >2.4x for all three periods, so the argmax is never a
    float-rounding coin flip)."""
    import numpy as np

    period = 8 << (doc_id % 3)
    amp = 1000 + doc_id % 100
    i = np.arange(128)
    return np.where((i // (period // 2)) % 2 == 0, amp, -amp).astype(
        np.int64)


@query(
    "mm_audio_features",
    oracle="""
    SELECT doc_id,
           cast(128 as bigint) AS n_samples,
           cast(8000 as bigint) AS sample_rate,
           cast(128 * (1000 + doc_id % 100) * (1000 + doc_id % 100)
                as bigint) AS energy,
           cast(CASE doc_id % 3 WHEN 0 THEN 31 WHEN 1 THEN 15 ELSE 7 END
                as bigint) AS zcr,
           cast(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 8 ELSE 4 END
                as bigint) AS peak_bin
    FROM documents WHERE doc_id % 137 <> 7
    """,
    tags=("llm", "multimodal", "audio"),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio featurization for training-data filtering: energy,
    zero-crossing rate, and dominant-frequency bin (rFFT argmax) over
    DECODED samples — the signal-level stats an audio curation
    pipeline thresholds on (silence/clipping/tone detection), the way
    text_quality_score thresholds text stats.

    Container-agnostic on purpose: payloads alternate real WAV (PCM)
    and real FLAC (Rice+LPC) by doc_id and flow through the
    magic-sniffing ``parse_audio`` dispatch, so both decoders sit on
    the hot path and the features never see the container. Every
    137th payload is truncated mid-stream; both parsers reject it
    (WAV chunk-length check, FLAC CRC/length) and the doc drops out.

    At 100 TB: per-row-independent Arrow pass, zero shuffles — the
    mm-family scale shape. The rFFT is numpy over a 128-sample frame;
    production frame sizes (1024-4096) keep the same per-row
    independence.
    """
    import numpy as np

    from go_triton_spark.codec.audio import parse_audio
    from go_triton_spark.codec.flac import build_flac
    from go_triton_spark.codec.wav import build_wav

    (d,) = tables(spark, sf_dir, "documents")
    src = spread(d.select("doc_id"), spark, rows_per_task=500)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zcr", T.LongType()),
        T.StructField("peak_bin", T.LongType()),
    ])

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = _audio_gate_signal(doc_id)
                payload = (build_wav(s) if doc_id % 2 == 0
                           else build_flac(s))
                if doc_id % 137 == 7:
                    payload = payload[:-13]  # corrupt: truncated stream
                try:
                    m = parse_audio(payload)
                except ValueError:
                    continue  # corrupt-skip, mirrored by the oracle
                ch = m["samples"][:, 0].astype(np.int64)
                energy = int((ch * ch).sum())
                zcr = int(np.sum(ch[1:] * ch[:-1] < 0))
                spec = np.abs(np.fft.rfft(ch.astype(np.float64)))
                peak_bin = int(np.argmax(spec[1:]) + 1)
                rows.append((doc_id, m["n_samples"], m["sample_rate"],
                             energy, zcr, peak_bin))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return src.mapInPandas(features, schema=schema)
