"""kinesis_sim: shard-parallel streaming DataSource (S1/S2/S4/S5/S7).

The reference's shard-reader tests (triton/stream_test.go,
stream_reader_test.go) assert construction, positioned starts, merged
multi-shard delivery, corruption skip, and checkpoint resume — the same
scenarios here, through Spark's real streaming engine."""

import json
import os

from go_triton_spark.config import load_config
from go_triton_spark.engine import TritonEngine
from go_triton_spark.sources.kinesis_sim import register_kinesis_sim
from go_triton_spark.types import EVENTS_SCHEMA


def _put(root, shard, seq, recs):
    os.makedirs(f"{root}/{shard}", exist_ok=True)
    with open(f"{root}/{shard}/{seq:06d}.jsonl", "w") as f:
        for r in recs:
            f.write(r if isinstance(r, str) else json.dumps(r))
            f.write("\n")


def _rec(i, uid=None):
    return {"event_id": i, "ts": "2026-08-13T09:00:00Z",
            "user_id": i % 3 if uid is None else uid,
            "event_type": "click", "value": float(i), "props": "{}"}


def _drain(spark, root, ckpt, start_position="TRIM_HORIZON"):
    register_kinesis_sim(spark)
    captured = []
    q = (spark.readStream.format("kinesis_sim").schema(EVENTS_SCHEMA)
         .option("start_position", start_position).load(root)
         .writeStream.foreachBatch(lambda df, b: captured.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return captured


def test_multi_shard_merge_and_resume(spark, tmp_path):
    root, ckpt = str(tmp_path / "k"), str(tmp_path / "ckpt")
    _put(root, "shardId-000", 0, [_rec(i) for i in range(5)])
    _put(root, "shardId-001", 0, [_rec(i) for i in range(5, 9)])
    got = _drain(spark, root, ckpt)
    assert {r.event_id for r in got} == set(range(9))  # unordered merge (S4)

    # new file on one shard + a brand-new shard (resharding): only new rows
    _put(root, "shardId-000", 1, [_rec(100)])
    _put(root, "shardId-002", 0, [_rec(200)])
    got = _drain(spark, root, ckpt)
    assert {r.event_id for r in got} == {100, 200}  # S7 resume, no replay


def test_latest_skips_backlog(spark, tmp_path):
    root = str(tmp_path / "k")
    _put(root, "shardId-000", 0, [_rec(i) for i in range(4)])
    got = _drain(spark, root, str(tmp_path / "c1"), start_position="LATEST")
    assert got == []  # S2: LATEST starts at the current end
    _put(root, "shardId-000", 1, [_rec(50)])
    got = _drain(spark, root, str(tmp_path / "c1"), start_position="LATEST")
    assert [r.event_id for r in got] == [50]


def test_corrupt_lines_skipped(spark, tmp_path):
    root = str(tmp_path / "k")
    _put(root, "shardId-000", 0,
         [_rec(1), "not json {{{", json.dumps([1, 2]), "", _rec(2)])
    got = _drain(spark, root, str(tmp_path / "ckpt"))
    assert sorted(r.event_id for r in got) == [1, 2]  # S5 skip semantics


def test_store_pipeline_over_kinesis_sim(spark, tmp_path):
    """End-to-end: kinesis_sim source -> StorePipeline -> archive -> cat."""
    import datetime as dt

    root = str(tmp_path / "shards")
    _put(root, "shardId-000", 0, [_rec(i) for i in range(6)])
    _put(root, "shardId-001", 0, [_rec(i) for i in range(6, 10)])
    cfg = load_config(f"""
events:
  name: events
  partition_key: user_id
  source: kinesis_sim
  path: {root}
""")
    eng = TritonEngine(spark, str(tmp_path), config=cfg, client="archive")
    pipe = eng.store("events", schema=EVENTS_SCHEMA, once=True)
    pipe.await_once()
    pipe.stop()
    out = eng.cat("events", dt.datetime.now(tz=dt.timezone.utc).date())
    assert {r.event_id for r in out.select("event_id").collect()} == set(range(10))


def test_msgpack_payload_format(spark, tmp_path):
    """format=msgpack: concatenated msgpack maps per file (the
    reference's wire format), timestamps surviving as datetimes and
    trailing corrupt bytes skipped (S5)."""
    import datetime as dt

    from go_triton_spark.codec.msgpack_codec import packb

    root = str(tmp_path / "k")
    os.makedirs(f"{root}/shardId-000")
    ts = dt.datetime(2026, 8, 13, 9, 0, tzinfo=dt.timezone.utc)
    body = b"".join(
        packb({"event_id": i, "ts": ts, "user_id": i, "event_type": "click",
               "value": float(i), "props": "{}"})
        for i in range(4)) + b"\xc1\xff"  # trailing undecodable bytes
    with open(f"{root}/shardId-000/000000.msgpack", "wb") as f:
        f.write(body)

    register_kinesis_sim(spark)
    captured = []
    q = (spark.readStream.format("kinesis_sim").schema(EVENTS_SCHEMA)
         .option("format", "msgpack").load(root)
         .writeStream.foreachBatch(lambda df, b: captured.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(r.event_id for r in captured) == [0, 1, 2, 3]
    assert all(r.ts is not None for r in captured)


def test_engine_store_skip_to_latest_flag(spark, tmp_path):
    """`store --skip-to-latest` (triton.go:197-199): the engine-level
    override sets start_position=LATEST without touching the stream
    config — the backlog is never archived, records landing after the
    first start are."""
    import datetime as dt

    root = str(tmp_path / "shards")
    _put(root, "shardId-000", 0, [_rec(i) for i in range(5)])  # backlog
    cfg = load_config(f"""
events:
  name: events
  partition_key: user_id
  source: kinesis_sim
  path: {root}
""")
    eng = TritonEngine(spark, str(tmp_path), config=cfg, client="archive")
    pipe = eng.store("events", schema=EVENTS_SCHEMA, once=True,
                     skip_to_latest=True)
    pipe.await_once()
    pipe.stop()
    # new records arrive; resume (checkpoint now owns the position)
    _put(root, "shardId-000", 1, [_rec(70)])
    pipe = eng.store("events", schema=EVENTS_SCHEMA, once=True,
                     skip_to_latest=True)
    pipe.await_once()
    pipe.stop()
    out = eng.cat("events", dt.datetime.now(tz=dt.timezone.utc).date())
    assert {r.event_id for r in out.select("event_id").collect()} == {70}
    # the shared config object was not mutated by the override
    assert "start_position" not in cfg["events"].options
