"""tritond wire client: the reference's ZMQ producer daemon protocol.

``ZmqClient`` reproduces tritond/client.go's zeromqClient over the
pure-Python ZMTP transport (zmtp.py):

- ``Put(stream, partition_key, record)`` sends ONE 2-frame message:
  frame 1 = compact JSON header ``{"stream_name":...,"partition_key":
  ...}`` (byte-identical to Go's json.Marshal of the header struct —
  field order and spacing pinned by a golden test; client.go:104-115),
  frame 2 = the record as a msgpack map (client.go:117-122, via the
  package's golden-tested codec). Any msgpack consumer decodes frame 2
  to the same map (encoders may legally pick different integer/string
  widths for the same value, so only the decoded form — not every
  byte — is guaranteed across implementations); an existing tritond
  daemon consumer therefore reads these messages unchanged.
- a bounded idle-connection pool (client.go:121-140): Put grabs an
  idle connection or dials a new one; at most ``num_idle_conn``
  connections are kept for reuse; a send failure closes that
  connection and surfaces the error.
- ``close()`` stops new Puts and drains idle connections
  (client.go:145-171 Close).

``MockTritondServer`` is the test double mirroring the PULL-side
consumer in tritond/main_test.go:51-67: binds a PULL socket (here a
TCP listener speaking ZMTP), collects every (header, body) message.
It exists for tests AND as the in-sandbox stand-in for a real daemon.
"""

from __future__ import annotations

import json
import os
import socket
import threading

from go_triton_spark.codec.msgpack_codec import packb, unpackb
from go_triton_spark.producer import ClientClosedError
from go_triton_spark.zmtp import ZmtpConnection, ZmtpError


def encode_put(stream: str, partition_key: str, record: dict) -> list[bytes]:
    """The 2-frame wire payload, byte-compatible with client.go:104-122."""
    header = json.dumps(
        {"stream_name": stream, "partition_key": partition_key},
        separators=(",", ":")).encode()
    return [header, packb(record)]


def decode_put(frames: list[bytes]) -> tuple[dict, dict]:
    """Inverse of :func:`encode_put` — what a tritond daemon does."""
    if len(frames) != 2:
        raise ValueError(f"tritond messages are 2 frames, got {len(frames)}")
    header = json.loads(frames[0].decode())
    body, _pos = unpackb(frames[1], 0)
    if not isinstance(body, dict):
        raise ValueError("tritond body must be a msgpack map")
    return header, body


class ZmqClient:
    """PUSH-side producer speaking the tritond wire protocol."""

    def __init__(self, endpoint: str, num_idle_conn: int = 2,
                 timeout: float = 10.0):
        # endpoint accepts the reference's form "tcp://host:port"
        if endpoint.startswith("tcp://"):
            endpoint = endpoint[len("tcp://"):]
        host, _, port = endpoint.rpartition(":")
        # bracketed IPv6 ("tcp://[::1]:3515"): create_connection wants
        # the bare address, libzmq-style endpoints keep the brackets
        self.addr = (host.strip("[]") or "127.0.0.1", int(port))
        self.timeout = timeout
        self.num_idle_conn = num_idle_conn
        self._idle: list[ZmtpConnection] = []
        self._lock = threading.Lock()
        self._closed = False

    def _dial(self) -> ZmtpConnection:
        sock = socket.create_connection(self.addr, timeout=self.timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        conn = ZmtpConnection(sock, "PUSH")
        conn.handshake()
        return conn

    def put(self, stream: str, partition_key: str, record: dict) -> None:
        with self._lock:
            if self._closed:
                raise ClientClosedError("put on closed client")
            conn = self._idle.pop() if self._idle else None
        if conn is None:
            conn = self._dial()
        try:
            conn.send_multipart(encode_put(stream, partition_key, record))
        except (OSError, ZmtpError):
            conn.close()  # client.go:131-135: failed socket is discarded
            raise
        with self._lock:
            if not self._closed and len(self._idle) < self.num_idle_conn:
                self._idle.append(conn)
                return
        conn.close()

    def close(self, timeout: float | None = None) -> None:
        with self._lock:
            self._closed = True
            idle, self._idle = self._idle, []
        for conn in idle:
            conn.close()


class MockTritondServer:
    """PULL-side collector (tritond/main_test.go:51-67 parity)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.create_server((host, port))
        self.addr = self._srv.getsockname()
        self.endpoint = f"tcp://{self.addr[0]}:{self.addr[1]}"
        self.messages: list[tuple[dict, dict]] = []
        self.raw_frames: list[list[bytes]] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(sock,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, sock: socket.socket) -> None:
        conn = ZmtpConnection(sock, "PULL")
        try:
            conn.handshake()
            while not self._stop.is_set():
                frames = conn.recv_multipart()
                with self._lock:
                    self.raw_frames.append(frames)
                    try:
                        self.messages.append(decode_put(frames))
                    except ValueError:
                        pass  # malformed: collected raw, not decoded
        except (ZmtpError, OSError):
            pass
        finally:
            conn.close()

    def stop(self) -> None:
        self._stop.set()
        self._srv.close()


class TritondDaemon(MockTritondServer):
    """The tritond daemon itself: wire in, engine files out.

    The reference daemon receives 2-frame ZMQ messages and forwards
    them to Kinesis; here the forwarding target is the engine's file
    stream source — records land as JSON-lines batch files under
    ``{out_root}/{stream}/`` (atomic per-flush files, exactly what
    ``eng.store`` tails). That closes the interop loop end-to-end: an
    EXISTING producer speaking the reference's wire protocol feeds
    this engine with no change on the producer side.

    Like the reference daemon, it is CONFIG-FREE: the stream name in
    the message header is trusted as the physical stream (the same
    stance ``cat`` takes for unknown logical names). Flushes happen
    per ``batch_size`` records per stream, on ``flush_interval``
    seconds, and on stop — a slow trickle still lands promptly.
    """

    def __init__(self, out_root: str, host: str = "127.0.0.1",
                 port: int = 0, batch_size: int = 200,
                 flush_interval: float = 1.0):
        self.out_root = out_root
        self.batch_size = batch_size
        self._buffers: dict[str, list[dict]] = {}
        self._buf_lock = threading.Lock()
        self.received = 0
        self.flushed = 0
        super().__init__(host=host, port=port)
        self._flusher = threading.Thread(
            target=self._flush_loop, args=(flush_interval,), daemon=True)
        self._flusher.start()

    # MockTritondServer collects; the daemon forwards instead
    def _serve(self, sock: socket.socket) -> None:
        conn = ZmtpConnection(sock, "PULL")
        try:
            conn.handshake()
            while not self._stop.is_set():
                frames = conn.recv_multipart()
                try:
                    header, record = decode_put(frames)
                except ValueError:
                    continue  # malformed: skip, stream survives
                stream = header.get("stream_name") or "unknown"
                # stream_name comes verbatim off the wire and becomes a
                # path segment under out_root; reject anything that
                # could escape it (the reference forwards the name to
                # Kinesis, where a hostile name has no filesystem
                # consequence — here it would)
                if (not isinstance(stream, str) or stream in (".", "..")
                        or "\\" in stream or "\x00" in stream
                        or os.path.basename(stream) != stream):
                    continue  # malformed: skip, stream survives
                with self._buf_lock:
                    buf = self._buffers.setdefault(stream, [])
                    buf.append(record)
                    self.received += 1
                    if len(buf) >= self.batch_size:
                        self._flush_stream(stream)
        except (ZmtpError, OSError):
            pass
        finally:
            conn.close()

    def _flush_stream(self, stream: str) -> None:
        # caller holds _buf_lock
        buf = self._buffers.get(stream)
        if not buf:
            return
        import time as _time
        import uuid

        out_dir = os.path.join(self.out_root, stream)
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(
            out_dir, f".{uuid.uuid4().hex[:12]}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for rec in buf:
                f.write(json.dumps(rec, default=str) + "\n")
        final = os.path.join(
            out_dir, f"{int(_time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json")
        os.rename(tmp, final)  # atomic: the stream source never sees partials
        self.flushed += len(buf)
        self._buffers[stream] = []

    def _flush_loop(self, interval: float) -> None:
        while not self._stop.wait(interval):
            with self._buf_lock:
                for s in list(self._buffers):
                    self._flush_stream(s)

    def stop(self) -> None:
        super().stop()
        with self._buf_lock:
            for s in list(self._buffers):
                self._flush_stream(s)
