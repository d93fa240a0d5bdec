"""Streaming dedup (streaming/dedup.py): ingest-time exact dedup and
stateful MinHash near-dup candidate emission, driven through the real
Structured Streaming engine — batch/stream signature agreement,
cross-micro-batch state, and checkpointed restart continuity.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_triton_spark.streaming.dedup import (minhash_band_buckets,
                                             streaming_exact_dedup,
                                             streaming_near_dup_candidates)


@pytest.fixture(autouse=True)
def _narrow_state_store(spark):
    """State-store queries commit one file per shuffle partition per
    micro-batch; at the session's 32 partitions that is pure overhead
    for these tiny corpora (8 min -> ~2 min for the module). The width
    is pinned per-checkpoint at the FIRST run, so setting it before
    each test is enough."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _write_docs(dirpath, records):
    os.makedirs(dirpath, exist_ok=True)
    fname = os.path.join(dirpath, f"batch-{len(os.listdir(dirpath))}.json")
    with open(fname, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _doc(doc_id, text, minute=0):
    return {"doc_id": doc_id, "text": text,
            "ts": f"2024-03-01T00:{minute:02d}:00Z"}


NEAR_A = "the quick brown fox jumps over the lazy dog again and again"
NEAR_B = "the quick brown fox jumps over the lazy dog again and often"
OTHER = "completely different content about spark structured streaming state"


def test_streaming_exact_dedup_drops_within_horizon(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_docs(src, [
        _doc(1, NEAR_A, 0),
        _doc(2, NEAR_A, 1),          # exact duplicate text -> dropped
        _doc(3, OTHER, 2),
    ])
    stream = spark.readStream.format("json").schema(DOC_SCHEMA).load(src)
    q = (streaming_exact_dedup(stream, horizon="30 minutes")
         .writeStream.format("memory").queryName("exact_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM exact_dedup").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 3]


def test_band_buckets_agree_batch_vs_stream_semantics(spark):
    """The bucket transform is pure columns: near-dup docs must share
    at least one (band, key); unrelated docs share none."""
    df = spark.createDataFrame(
        [(1, NEAR_A), (2, NEAR_B), (3, OTHER)], "doc_id long, text string")
    b = minhash_band_buckets(df).collect()
    keys = {}
    for r in b:
        keys.setdefault(r["doc_id"], set()).add((r["band"], r["key"]))
    assert keys[1] & keys[2], "near-dups must collide in some band"
    assert not keys[1] & keys[3] and not keys[2] & keys[3]


def _run_once(cands, ckpt, sink: list):
    """One availableNow pass through a foreachBatch sink (the memory
    sink cannot recover from a checkpoint; foreachBatch can, which is
    what lets these tests prove cross-RUN state)."""
    def collect(batch_df, _epoch):
        sink.extend((r["anchor_id"], r["doc_id"])
                    for r in batch_df.collect())
    q = (cands.writeStream.foreachBatch(collect)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    done = q.awaitTermination(120)
    if not done:
        q.stop()
    assert done, "availableNow query failed to self-terminate"


def test_streaming_near_dup_candidates_cross_batch_state(spark, tmp_path):
    """The anchor lives in the STATE STORE: doc 1 arrives in the first
    run, its near-dup arrives in a later run against the same
    checkpoint, and the candidate pair must still be emitted (no
    per-batch self-join could see it)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(src, [_doc(1, NEAR_A, 0), _doc(3, OTHER, 1)])
    stream = spark.readStream.format("json").schema(DOC_SCHEMA).load(src)
    cands = streaming_near_dup_candidates(stream)

    got: list = []
    _run_once(cands, ckpt, got)
    assert got == []                            # nothing to pair yet

    _write_docs(src, [_doc(2, NEAR_B, 2)])      # near-dup, later run
    _run_once(cands, ckpt, got)
    assert set(got) == {(1, 2)}, got


def test_streaming_near_dup_restart_keeps_anchors(spark, tmp_path):
    """Checkpointed restart: a THIRD near-dup arriving after a full
    stop/start still pairs with the ORIGINAL anchor — state survived."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    near_c = NEAR_A.replace("dog", "cat")
    _write_docs(src, [_doc(1, NEAR_A, 0), _doc(2, NEAR_B, 1)])
    stream = spark.readStream.format("json").schema(DOC_SCHEMA).load(src)
    cands = streaming_near_dup_candidates(stream)
    first: list = []
    _run_once(cands, ckpt, first)
    assert set(first) == {(1, 2)}

    _write_docs(src, [_doc(7, near_c, 3)])
    second: list = []
    _run_once(cands, ckpt, second)
    # doc 7 may not share every band with doc 1, but any pair it emits
    # must name the surviving anchor 1, never doc 2
    assert second, "restarted query emitted nothing for a near-dup"
    assert all(a == 1 for a, _ in second), second
    assert all(d == 7 for _, d in second), second


def test_streaming_candidates_verify_like_batch(spark):
    """End-to-end contract: candidates from the streaming operator,
    verified with the batch exact-Jaccard rule, give a real near-dup
    pair and nothing else."""
    df = spark.createDataFrame(
        [(1, NEAR_A), (2, NEAR_B), (3, OTHER)], "doc_id long, text string")
    b = minhash_band_buckets(df)
    cand = (b.alias("a").join(
                b.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b")).distinct())
    assert {(r["id_a"], r["id_b"]) for r in cand.collect()} == {(1, 2)}
