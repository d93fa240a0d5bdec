"""Streaming deduplication: the ingest-time half of the dedup story.

The batch operators (operators/dedup.py) dedupe a corpus at rest; a
training-data pipeline also needs dedup AT INGEST — drop a document
the moment it arrives if it duplicates something already seen, without
rescanning the archive per micro-batch. Two layers:

- ``streaming_exact_dedup``: declarative — Structured Streaming's
  ``dropDuplicatesWithinWatermark`` on the md5 fingerprint. State is
  one fingerprint per distinct doc, expired by the watermark (the
  bounded-state contract at 100 TB: state size tracks the DISTINCT
  docs inside the dedup horizon, not the stream length).
- ``streaming_near_dup_candidates``: custom stateful — the MinHash
  band buckets from the batch path (same signature algebra, same
  constants, so batch and stream agree on what a near-dup is), keyed
  by (band, key) with ``applyInPandasWithState``. Each bucket's state
  is its ANCHOR (first doc seen); later arrivals emit (anchor, doc)
  candidate pairs for downstream exact verification — the streaming
  analog of dedup_minhash_lsh's bucket self-join, with the self-join
  replaced by per-key state so each micro-batch touches only its own
  buckets. State is 2 longs per occupied bucket; a processing-time
  timeout expires idle buckets so the horizon is bounded.

Both compose with the StorePipeline source (sources/stream_source.py)
and checkpoint/restart like every other streaming query — covered by
tests/test_streaming_dedup.py including a kill-and-resume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_triton_spark.operators.dedup import (_LSH_BANDS, _LSH_ROWS,
                                             _MINHASH_PERMS, _PERM_A,
                                             _PERM_B, _PRIME, _SHINGLES)


def minhash_band_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, band, key): the batch path's exact
    signature algebra (31-bit shingle hashes, (a*h+b) mod p minima,
    xxhash64 band keys), expressed as pure column transforms so it
    runs identically on a batch OR streaming DataFrame."""
    hashed = (docs
              .select("doc_id", F.split("text", " ").alias("ws"))
              .select("doc_id", F.expr(_SHINGLES).alias("shingles"))
              .where(F.size("shingles") >= 1)
              .select("doc_id", F.expr(
                  "transform(shingles, s -> pmod(xxhash64(s), "
                  "cast(2147483647 as bigint)))").alias("hs")))
    sig_cols = [
        F.expr(
            f"aggregate(hs, cast({_PRIME} as bigint), "
            f"(acc, h) -> least(acc, pmod({_PERM_A[i]} * h + {_PERM_B[i]}, "
            f"cast({_PRIME} as bigint))))"
        ).alias(f"mh{i}")
        for i in range(_MINHASH_PERMS)
    ]
    sigs = hashed.select("doc_id", *sig_cols)
    band_exprs = []
    for b in range(_LSH_BANDS):
        cols = ", ".join(f"mh{b * _LSH_ROWS + r}" for r in range(_LSH_ROWS))
        band_exprs.append(
            f"named_struct('band', {b}, 'key', xxhash64({cols}))")
    return (sigs.select(
        "doc_id",
        F.explode(F.expr("array(" + ", ".join(band_exprs) + ")")).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key")))


def streaming_exact_dedup(docs: DataFrame, *, ts_col: str = "ts",
                          horizon: str = "10 minutes") -> DataFrame:
    """First-seen exact dedup over a streaming doc DataFrame: rows
    whose md5(text) was already seen within the watermark horizon are
    dropped; state for a fingerprint expires once the watermark passes
    it (bounded state — the built-in op IS the right plan here)."""
    return (docs
            .withColumn("fingerprint",
                        F.md5(F.col("text").cast("binary")))
            .withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(["fingerprint"]))


_CAND_SCHEMA = T.StructType([
    T.StructField("band", T.IntegerType()),
    T.StructField("key", T.LongType()),
    T.StructField("anchor_id", T.LongType()),
    T.StructField("doc_id", T.LongType()),
])

_BUCKET_STATE = T.StructType([
    T.StructField("anchor_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
])


def _make_update_bucket(idle_timeout_ms: int | None):
    def _update_bucket(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        band, bkey = key
        if state.hasTimedOut:
            state.remove()
            return
        anchor, n_seen = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            for doc_id in sorted(int(v) for v in pdf["doc_id"]):
                if anchor is None:
                    anchor = doc_id       # first doc owns the bucket
                elif doc_id != anchor:
                    out.append((band, bkey, anchor, doc_id))
                n_seen += 1
        state.update((anchor, n_seen))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=["band", "key",
                                             "anchor_id", "doc_id"])
    return _update_bucket


def streaming_near_dup_candidates(
        docs: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Stateful near-dup candidate emission at ingest: band-bucket the
    incoming docs with the batch MinHash algebra, then keep one anchor
    per occupied (band, key) bucket in the state store; every later
    arrival in the same bucket emits an (anchor, doc) candidate pair.

    Downstream verifies candidates exactly (array_intersect Jaccard,
    same as the batch path) — this operator only bounds the pair space.
    At 100 TB: state is 2 longs per OCCUPIED bucket, sharded by the
    bucket key across executors; each micro-batch shuffles only its
    own (band, key) rows.

    ``idle_timeout_ms`` bounds the dedup horizon for LONG-RUNNING
    ingest queries (idle buckets expire). It is opt-in because a
    processing-time timeout keeps an ``availableNow`` query alive
    forever (the engine keeps triggering to service future timeouts) —
    run-to-completion callers (tests, backfills) leave it None."""
    timeout = (GroupStateTimeout.NoTimeout if idle_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (minhash_band_buckets(docs)
            .groupBy("band", "key")
            .applyInPandasWithState(
                _make_update_bucket(idle_timeout_ms),
                outputStructType=_CAND_SCHEMA,
                stateStructType=_BUCKET_STATE,
                outputMode="update",
                timeoutConf=timeout,
            ))
