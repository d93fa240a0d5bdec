#!/usr/bin/env python
"""Streaming-ingest throughput benchmark.

The reference is a stream archiver whose implied per-shard ceiling is
~1000 records/s (RequestLimit / MinPollInterval, BASELINE.md). This
tool pushes N synthetic event records through the full store pipeline
(file source -> schema decode -> date/hour partitioned parquet sink
with exactly-once checkpointing) and reports end-to-end records/s.

Usage: python tools/bench_streaming.py [N_RECORDS] [N_FILES]
       python tools/bench_streaming.py --read-while-write [N_RECORDS] [N_FILES]
Prints one JSON line: {"metric": "ingest_records_per_sec", ...}

--read-while-write is the reference's actual production shape (a
store daemon archiving while consumers `cat` the same archive): the
store pipeline runs CONTINUOUSLY while input files keep arriving in
waves AND a reader thread replays the archive via ``eng.cat`` in a
loop. Reports ingest rec/s under read contention plus cat latency
percentiles, and asserts snapshot isolation — every concurrent read
sees a complete prefix (monotonically non-decreasing counts, no
partial-file failures), which the parquet reader guarantees by
honoring the file sink's _spark_metadata commit log.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from go_triton_spark.session import get_spark
    from go_triton_spark.config import load_config
    from go_triton_spark.engine import TritonEngine
    from go_triton_spark.types import EVENTS_SCHEMA

    spark = get_spark("go-triton-spark-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="stream_bench_")
    src_dir = os.path.join(root, "incoming", "events")
    os.makedirs(src_dir)
    cfg = load_config(f"""
events:
  name: events
  partition_key: user_id
  source: file
  format: json
  path: {src_dir}
""")

    # synthesize the input up front (generation excluded from timing):
    # n_files JSON-lines files ~= shards' worth of parallel input
    per_file = n_records // n_files
    t_gen = time.perf_counter()
    for f_idx in range(n_files):
        with open(os.path.join(src_dir, f"batch-{f_idx:04d}.json"), "w") as f:
            base = f_idx * per_file
            for i in range(per_file):
                rid = base + i
                f.write('{"event_id": %d, "ts": "2024-01-%02dT%02d:%02d:%02dZ",'
                        ' "user_id": %d, "event_type": "click", "value": %d.5,'
                        ' "props": "{}"}\n'
                        % (rid, rid % 27 + 1, rid % 24, rid % 60, rid % 60,
                           rid % 1000, rid % 100))
    gen_s = time.perf_counter() - t_gen

    eng = TritonEngine(spark, root, config=cfg, client="bench")
    t0 = time.perf_counter()
    pipe = eng.store("events", schema=EVENTS_SCHEMA, once=True)
    pipe.await_once(timeout=600)
    pipe.stop()
    ingest_s = time.perf_counter() - t0

    ingested = n_files * per_file
    archived = spark.read.parquet(os.path.join(root, "archive")).count()
    assert archived == ingested, f"lost rows: {archived} != {ingested}"

    print(json.dumps({
        "metric": "ingest_records_per_sec",
        "value": round(ingested / ingest_s, 1),
        "unit": "records/sec",
        "records": ingested,
        "ingest_seconds": round(ingest_s, 2),
        "gen_seconds": round(gen_s, 2),
        "reference_ceiling_per_shard": 1000,
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


def main_read_while_write() -> int:
    import datetime as _dt
    import threading

    n_records = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    n_waves = 5

    from go_triton_spark.session import get_spark
    from go_triton_spark.config import load_config
    from go_triton_spark.engine import TritonEngine
    from go_triton_spark.types import EVENTS_SCHEMA

    spark = get_spark("go-triton-spark-rww-bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="rww_bench_")
    src_dir = os.path.join(root, "incoming", "events")
    os.makedirs(src_dir)
    cfg = load_config(f"""
events:
  name: events
  partition_key: user_id
  source: file
  format: json
  path: {src_dir}
""")

    per_file = n_records // n_files

    def write_file(f_idx: int) -> None:
        # atomic drop: write aside, rename in (file sources list by name)
        tmp = os.path.join(root, f"w-{f_idx:04d}.json")
        with open(tmp, "w") as f:
            base = f_idx * per_file
            for i in range(per_file):
                rid = base + i
                f.write('{"event_id": %d, "ts": "2024-01-%02dT%02d:%02d:%02dZ",'
                        ' "user_id": %d, "event_type": "click", "value": %d.5,'
                        ' "props": "{}"}\n'
                        % (rid, rid % 27 + 1, rid % 24, rid % 60, rid % 60,
                           rid % 1000, rid % 100))
        os.rename(tmp, os.path.join(src_dir, f"batch-{f_idx:04d}.json"))

    eng = TritonEngine(spark, root, config=cfg, client="bench")
    total = n_files * per_file
    today = _dt.date.today()

    stop_reading = threading.Event()
    cat_lat: list[float] = []
    cat_counts: list[int] = []
    read_errors: list[str] = []

    def reader() -> None:
        while not stop_reading.is_set():
            t0 = time.perf_counter()
            try:
                cat_counts.append(
                    eng.cat("events", today, ordered=False).count())
                cat_lat.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — report, don't die
                # the archive dir may not exist before the first commit
                if "PATH_NOT_FOUND" not in str(exc) and cat_counts:
                    read_errors.append(repr(exc))
            time.sleep(0.2)

    t0 = time.perf_counter()
    pipe = eng.store("events", schema=EVENTS_SCHEMA, once=False)
    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
    # feed input in waves while the query runs and readers replay
    for wave in range(n_waves):
        lo = wave * n_files // n_waves
        hi = (wave + 1) * n_files // n_waves
        for f_idx in range(lo, hi):
            write_file(f_idx)
        time.sleep(0.5)
    # drain: wait until everything is archived, then stop
    deadline = time.time() + 600
    archive = os.path.join(root, "archive")
    while time.time() < deadline:
        try:
            if spark.read.parquet(archive).count() >= total:
                break
        except Exception:  # noqa: BLE001 — sink dir not created yet
            pass
        time.sleep(0.5)
    ingest_s = time.perf_counter() - t0
    stop_reading.set()
    rt.join(timeout=30)
    pipe.stop()

    archived = spark.read.parquet(archive).count()
    assert archived == total, f"lost rows: {archived} != {total}"
    assert not read_errors, f"concurrent reads failed: {read_errors[:3]}"
    assert cat_counts == sorted(cat_counts), \
        "snapshot isolation violated: a cat saw fewer rows than an earlier cat"
    lat = sorted(cat_lat)

    print(json.dumps({
        "metric": "ingest_records_per_sec_under_read_contention",
        "value": round(total / ingest_s, 1),
        "unit": "records/sec",
        "records": total,
        "ingest_seconds": round(ingest_s, 2),
        "concurrent_cats": len(cat_lat),
        "cat_p50_s": round(lat[len(lat) // 2], 2) if lat else None,
        "cat_max_s": round(lat[-1], 2) if lat else None,
        "last_cat_rows": cat_counts[-1] if cat_counts else 0,
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    if "--read-while-write" in sys.argv:
        sys.exit(main_read_while_write())
    sys.exit(main())
