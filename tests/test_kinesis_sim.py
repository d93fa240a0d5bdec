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


# =====================================================================
# Property-based resharding fuzz (VERDICT r5 ask #6)
# =====================================================================
#
# Random split/merge/empty-child/append/read/restart sequences against
# a scripted resharding Kinesis service, checked against an in-memory
# reference log: NO LOSS, NO DUP, per-shard order preserved (the
# stream_reader.go ordering guarantee), and readBetweenOffsets replays
# exactly the committed span. Seeded-random over >=100 topologies so
# every failure prints its reproducible seed.

import random

from go_triton_spark.sources.kinesis_boto3 import KinesisSimpleStreamReader


class ReshardingFakeKinesis:
    """Scripted service whose topology mutates mid-stream: shards can
    split/merge (children start empty), closed parents stop growing.
    Sequence numbers are globally monotonic zero-padded decimals (the
    real Kinesis shape; numeric order = stream order). get_records
    serves up to Limit records per call — unlike the one-record mocks,
    a fetch can OVERSHOOT a committed range, which is exactly what a
    recovery replay must tolerate."""

    def __init__(self):
        self.shards: dict[str, list] = {}
        self.closed: set[str] = set()
        self.arrivals: dict[str, int] = {}   # seq -> arrival ns
        self._seq = 0
        self._next_shard = 0

    def new_shard(self) -> str:
        name = f"shardId-{self._next_shard:04d}"
        self._next_shard += 1
        self.shards[name] = []
        return name

    def append(self, shard: str, data: bytes) -> str:
        import time as _t
        assert shard not in self.closed
        self._seq += 1
        seq = f"{self._seq:012d}"
        self.shards[shard].append((seq, data))
        self.arrivals[seq] = _t.time_ns()
        return seq

    def split(self, parent: str) -> tuple[str, str]:
        self.closed.add(parent)
        return self.new_shard(), self.new_shard()

    def merge(self, a: str, b: str) -> str:
        self.closed.update((a, b))
        return self.new_shard()

    def open_shards(self) -> list[str]:
        return [s for s in self.shards if s not in self.closed]

    # --- the boto3 client surface the reader uses -------------------
    def describe_stream(self, StreamName):
        return {"StreamDescription": {
            "Shards": [{"ShardId": s} for s in sorted(self.shards)],
            "StreamName": StreamName, "StreamStatus": "ACTIVE"}}

    def get_shard_iterator(self, StreamName, ShardId, ShardIteratorType,
                           StartingSequenceNumber=None, Timestamp=None):
        recs = self.shards.get(ShardId, [])
        if ShardIteratorType == "AFTER_SEQUENCE_NUMBER":
            pos = StartingSequenceNumber
        elif ShardIteratorType == "LATEST":
            pos = recs[-1][0] if recs else ""
        elif ShardIteratorType == "AT_TIMESTAMP":
            ns = int(Timestamp.timestamp() * 1e9)
            before = [r[0] for r in recs if self.arrivals[r[0]] < ns]
            pos = before[-1] if before else ""
        else:
            pos = ""
        return {"ShardIterator": f"{StreamName}|{ShardId}|{pos}"}

    def get_records(self, ShardIterator, Limit):
        _, shard, pos = ShardIterator.split("|")
        out = [r for r in self.shards[shard] if r[0] > pos][:Limit]
        nxt = out[-1][0] if out else pos
        return {"NextShardIterator": ShardIterator.rsplit("|", 1)[0] + f"|{nxt}",
                "Records": [{"SequenceNumber": sn, "Data": d,
                             "PartitionKey": "pk"} for sn, d in out],
                "MillisBehindLatest": 0}


def _run_topology(seed: int) -> None:
    rng = random.Random(seed)
    svc = ReshardingFakeKinesis()
    for _ in range(rng.randint(1, 3)):
        svc.new_shard()

    latest = rng.random() < 0.3
    # pre-start backlog (skipped under LATEST)
    skipped: set[bytes] = set()
    for _ in range(rng.randint(0, 5)):
        sh = rng.choice(svc.open_shards())
        data = f"backlog-{seed}-{svc._seq}".encode()
        svc.append(sh, data)
        if latest:
            skipped.add(data)

    def new_reader():
        return KinesisSimpleStreamReader(
            svc, "s", start_position="LATEST" if latest else "TRIM_HORIZON",
            min_interval=0.0)

    # let the clock tick past the backlog appends: the AT_TIMESTAMP
    # boundary travels as a datetime (microsecond resolution), so a
    # same-microsecond backlog record would straddle it
    import time as _t
    t0 = _t.time_ns()
    while _t.time_ns() - t0 < 2_000:
        pass
    reader = new_reader()
    offsets = reader.initialOffset()
    consumed: list[tuple] = []
    history: list[tuple] = []

    def do_read():
        nonlocal offsets
        start = dict(offsets)
        rows, offsets = reader.read(start)
        consumed.extend(rows)
        history.append((start, dict(offsets), rows))

    n_appended = 0
    for _ in range(rng.randint(6, 18)):
        op = rng.random()
        open_shards = svc.open_shards()
        if op < 0.45 and open_shards:
            for _ in range(rng.randint(1, 4)):
                sh = rng.choice(open_shards)
                svc.append(sh, f"d-{seed}-{svc._seq}".encode())
                n_appended += 1
        elif op < 0.55 and len(open_shards) >= 1:
            svc.split(rng.choice(open_shards))      # children start EMPTY
        elif op < 0.62 and len(open_shards) >= 2:
            a, b = rng.sample(open_shards, 2)
            svc.merge(a, b)
        elif op < 0.85:
            do_read()
        else:
            reader = new_reader()                   # restart from offsets
    # drain: two consecutive empty reads = done
    empties = 0
    for _ in range(60):
        before = len(consumed)
        do_read()
        empties = empties + 1 if len(consumed) == before else 0
        if empties >= 2:
            break

    # --- the reference-log invariants -------------------------------
    all_data = [d for recs in svc.shards.values() for _, d in recs]
    want = sorted(d for d in all_data if d not in skipped)
    got = sorted(bytes(r[4]) for r in consumed)
    assert got == want, (
        f"seed={seed}: loss/dup — consumed {len(got)} vs appended "
        f"{len(want)} (latest={latest})")
    # per-shard order strictly increasing across batches and restarts
    per_shard: dict[str, list] = {}
    for r in consumed:
        per_shard.setdefault(r[0], []).append(int(r[1]))
    for sh, seqs in per_shard.items():
        assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs), (
            f"seed={seed}: order violated on {sh}")
    # replay determinism: readBetweenOffsets over a committed span
    # returns EXACTLY that span's rows — no overshoot into later data
    for start, end, rows in rng.sample(history, min(3, len(history))):
        replayed = new_reader().readBetweenOffsets(start, end)
        assert sorted(bytes(r[4]) for r in replayed) == \
            sorted(bytes(r[4]) for r in rows), (
            f"seed={seed}: replay of {start}->{end} diverged")


def test_resharding_fuzz_100_topologies():
    for seed in range(200):
        _run_topology(seed)


def test_file_sim_reader_topology_fuzz():
    """The file-backed simulator's offset algebra under the same fuzz
    discipline (no Spark needed — the reader is driven directly):
    random shard creation / file appends / batches / reader restarts /
    LATEST starts over 100 seeded topologies, against an in-memory
    log: no loss, no dup, per-shard file order preserved."""
    import tempfile

    from pyspark.sql import types as T

    from go_triton_spark.sources.kinesis_sim import KinesisSimStreamReader

    schema = T.StructType([T.StructField("event_id", T.LongType())])

    for seed in range(100):
        rng = random.Random(10_000 + seed)
        root = tempfile.mkdtemp(prefix=f"kfuzz{seed}_")
        next_id = 0
        appended: list[int] = []
        skipped: set[int] = set()
        per_shard_written: dict[str, list[int]] = {}

        def put_file(shard):
            nonlocal next_id
            d = os.path.join(root, shard)
            os.makedirs(d, exist_ok=True)
            lst = per_shard_written.setdefault(shard, [])
            ids = list(range(next_id, next_id + rng.randint(1, 3)))
            next_id = ids[-1] + 1
            with open(os.path.join(d, f"{len(os.listdir(d)):06d}.jsonl"),
                      "w") as f:
                for i in ids:
                    f.write(json.dumps({"event_id": i}) + "\n")
            appended.extend(ids)
            lst.extend(ids)
            return ids

        shards = [f"shardId-{i:03d}" for i in range(rng.randint(1, 3))]
        latest = rng.random() < 0.3
        for _ in range(rng.randint(0, 4)):       # pre-start backlog
            skipped.update(put_file(rng.choice(shards)))
        if not latest:
            skipped.clear()

        def new_reader():
            return KinesisSimStreamReader(
                {"path": root,
                 "start_position": "LATEST" if latest else "TRIM_HORIZON"},
                schema)

        reader = new_reader()
        offsets = reader.initialOffset()
        consumed: list[int] = []
        per_shard_read: dict[str, list[int]] = {}

        def batch():
            nonlocal offsets
            end = reader.latestOffset()
            for part in reader.partitions(dict(offsets), end):
                for row in reader.read(part):
                    consumed.append(row[0])
                    per_shard_read.setdefault(part.shard, []).append(row[0])
            offsets = end

        for _ in range(rng.randint(4, 12)):
            op = rng.random()
            if op < 0.4:
                put_file(rng.choice(shards))
            elif op < 0.5:
                shards.append(f"shardId-{len(shards):03d}")  # resharding
            elif op < 0.9:
                batch()
            else:
                reader = new_reader()                        # restart
        batch()

        want = sorted(i for i in appended if i not in skipped)
        assert sorted(consumed) == want, f"seed={seed}: loss/dup"
        for sh, got in per_shard_read.items():
            wrote = [i for i in per_shard_written.get(sh, [])
                     if i not in skipped]
            assert got == wrote, f"seed={seed}: order violated on {sh}"
