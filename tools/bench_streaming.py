#!/usr/bin/env python
"""Streaming-ingest throughput benchmark.

The reference is a stream archiver whose implied per-shard ceiling is
~1000 records/s (RequestLimit / MinPollInterval, BASELINE.md). This
tool pushes N synthetic event records through the full store pipeline
(file source -> schema decode -> date/hour partitioned parquet sink
with exactly-once checkpointing) and reports end-to-end records/s.

Usage: python tools/bench_streaming.py [N_RECORDS] [N_FILES]
Prints one JSON line: {"metric": "ingest_records_per_sec", ...}
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


if __name__ == "__main__":
    sys.exit(main())
