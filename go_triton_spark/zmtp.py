"""Pure-Python ZMTP 3.0 (NULL mechanism) — the tritond wire protocol.

The reference's producer daemon speaks ZeroMQ: a PUSH socket sending
2-frame messages (JSON header + msgpack body) to tritond's PULL socket
(tritond/client.go:102-140; main_test.go:51-67 binds the PULL side).
pyzmq/libzmq are not available in this environment, so this module
implements the on-the-wire subset those sockets actually use, from the
PUBLIC ZMTP 3.0 spec (https://rfc.zeromq.org/spec/23/):

- the 64-octet greeting (signature, version, mechanism, as-server),
- the NULL-mechanism READY command handshake with Socket-Type
  metadata and PUSH<->PULL compatibility checking,
- short/long message framing with the MORE flag for multipart.

A libzmq peer (e.g. a real tritond daemon) speaks exactly these bytes
for a NULL-mechanism PUSH/PULL pair, so this client interoperates;
the golden tests pin the byte layout so that claim is checkable.
"""

from __future__ import annotations

import socket
import struct

# frame flag bits (ZMTP 3.0 section "Framing")
FLAG_MORE = 0x01
FLAG_LONG = 0x02
FLAG_COMMAND = 0x04

_SIGNATURE = b"\xff" + b"\x00" * 8 + b"\x7f"


class ZmtpError(ConnectionError):
    """Protocol violation from the peer (bad greeting, bad frame...)."""


# ------------------------------------------------------------ greeting

def encode_greeting(mechanism: bytes = b"NULL", as_server: bool = False) -> bytes:
    """The fixed 64-octet ZMTP 3.0 greeting."""
    if len(mechanism) > 20:
        raise ValueError("mechanism name too long")
    return (_SIGNATURE + bytes((3, 0))
            + mechanism.ljust(20, b"\x00")
            + (b"\x01" if as_server else b"\x00")
            + b"\x00" * 31)


def decode_greeting(data: bytes) -> dict:
    if len(data) != 64:
        raise ZmtpError(f"greeting must be 64 octets, got {len(data)}")
    if data[0] != 0xFF or data[9] != 0x7F:
        raise ZmtpError("bad greeting signature")
    major = data[10]
    if major != 3:
        raise ZmtpError(f"unsupported ZMTP major version {major}")
    mechanism = data[12:32].rstrip(b"\x00")
    return {"version": (major, data[11]), "mechanism": mechanism,
            "as_server": bool(data[32])}


# ------------------------------------------------------------- framing

def encode_frame(body: bytes, more: bool = False, command: bool = False) -> bytes:
    flags = (FLAG_MORE if more else 0) | (FLAG_COMMAND if command else 0)
    if len(body) > 255:
        return bytes((flags | FLAG_LONG,)) + struct.pack(">Q", len(body)) + body
    return bytes((flags, len(body))) + body


def _read_exact(sock_file, n: int) -> bytes:
    data = sock_file.read(n)
    if data is None or len(data) != n:
        raise ZmtpError("connection closed mid-frame")
    return data


def read_frame(sock_file) -> tuple[int, bytes]:
    """Read one frame; returns (flags, body)."""
    flags = _read_exact(sock_file, 1)[0]
    if flags & ~(FLAG_MORE | FLAG_LONG | FLAG_COMMAND):
        raise ZmtpError(f"reserved frame flag bits set: {flags:#x}")
    if flags & FLAG_LONG:
        size = struct.unpack(">Q", _read_exact(sock_file, 8))[0]
    else:
        size = _read_exact(sock_file, 1)[0]
    if size > 1 << 31:
        raise ZmtpError(f"frame too large: {size}")
    return flags, _read_exact(sock_file, size)


# ------------------------------------------------------------ commands

def encode_ready(socket_type: str, metadata: dict[str, bytes] | None = None) -> bytes:
    """READY command frame with Socket-Type (+ extra) metadata."""
    body = bytearray(b"\x05READY")
    meta = {"Socket-Type": socket_type.encode()}
    if metadata:
        meta.update(metadata)
    for name, value in meta.items():
        nb = name.encode() if isinstance(name, str) else name
        body += bytes((len(nb),)) + nb + struct.pack(">I", len(value)) + value
    return encode_frame(bytes(body), command=True)


def parse_command(body: bytes) -> tuple[str, dict[str, bytes]]:
    """Split a command frame body into (name, metadata)."""
    if not body:
        raise ZmtpError("empty command frame")
    nlen = body[0]
    name = body[1:1 + nlen].decode("ascii", "replace")
    meta: dict[str, bytes] = {}
    pos = 1 + nlen
    while pos < len(body):
        plen = body[pos]
        prop = body[pos + 1:pos + 1 + plen].decode("ascii", "replace")
        pos += 1 + plen
        if pos + 4 > len(body):
            raise ZmtpError("truncated command metadata")
        vlen = struct.unpack(">I", body[pos:pos + 4])[0]
        pos += 4
        meta[prop] = body[pos:pos + vlen]
        pos += vlen
    return name, meta


# PUSH talks to PULL and vice versa (ZMTP socket-type compatibility)
_VALID_PEERS = {"PUSH": {"PULL"}, "PULL": {"PUSH"},
                "PAIR": {"PAIR"}, "REQ": {"REP", "ROUTER"},
                "REP": {"REQ", "DEALER"}}


class ZmtpConnection:
    """One handshaken ZMTP connection over a TCP socket."""

    def __init__(self, sock: socket.socket, socket_type: str):
        self.sock = sock
        self.socket_type = socket_type
        self._rf = sock.makefile("rb")
        self.peer_type: str | None = None

    def handshake(self) -> None:
        """Greeting exchange + NULL-mechanism READY, both directions."""
        self.sock.sendall(encode_greeting())
        peer = decode_greeting(_read_exact(self._rf, 64))
        if peer["mechanism"] != b"NULL":
            raise ZmtpError(f"peer wants mechanism {peer['mechanism']!r}, "
                            "only NULL is supported")
        self.sock.sendall(encode_ready(self.socket_type))
        flags, body = read_frame(self._rf)
        if not flags & FLAG_COMMAND:
            raise ZmtpError("expected READY command, got a message frame")
        name, meta = parse_command(body)
        if name != "READY":
            raise ZmtpError(f"expected READY, got {name!r}")
        self.peer_type = meta.get("Socket-Type", b"").decode()
        valid = _VALID_PEERS.get(self.socket_type, set())
        if self.peer_type not in valid:
            raise ZmtpError(f"socket type {self.peer_type!r} is not a valid "
                            f"peer for {self.socket_type}")

    def send_multipart(self, frames: list[bytes]) -> None:
        out = bytearray()
        for i, f in enumerate(frames):
            out += encode_frame(f, more=(i < len(frames) - 1))
        self.sock.sendall(bytes(out))

    def recv_multipart(self) -> list[bytes]:
        frames: list[bytes] = []
        while True:
            flags, body = read_frame(self._rf)
            if flags & FLAG_COMMAND:
                continue  # ignore heartbeats/unknown commands
            frames.append(body)
            if not flags & FLAG_MORE:
                return frames

    def close(self) -> None:
        try:
            self._rf.close()
        finally:
            self.sock.close()
