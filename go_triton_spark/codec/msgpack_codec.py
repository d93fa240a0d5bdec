"""Pure-Python msgpack codec covering the reference's type surface.

The reference decodes records with ``msgp.ReadMapStrIntfBytes``
(triton/stream_reader.go:173) whose dynamic dispatch
(vendor msgp/read.go:1261-1341) produces exactly the types in
SURVEY section 1.2: nil/bool/int/uint/float/str/bin/array/map plus the
timestamp extension (type -1) -> datetime.

Decode semantics mirrored here:
- ``unpackb`` decodes ONE object and returns (obj, bytes_consumed) so the
  caller can detect trailing garbage (the "overlength record" corruption
  case, triton/stream_reader.go:185-194).
- ``unpack_stream`` yields back-to-back objects from a buffer — the .tri
  body layout (concatenated msgpack maps, triton/archive_reader.go:16-21).
- Corrupt input raises ``MsgpackError``; callers implement skip-don't-fail.
"""

from __future__ import annotations

import datetime as _dt
import struct
from collections.abc import Iterator

_UTC = _dt.timezone.utc


class MsgpackError(ValueError):
    """Raised on malformed msgpack input (decode error -> record skip)."""


# ---------------------------------------------------------------- encoding

def _pack_into(out: bytearray, obj) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(out, obj)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += bytes((0xD9, n))
        elif n < 0x10000:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n < 0x100:
            out += bytes((0xC4, n))
        elif n < 0x10000:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, _dt.datetime):
        _pack_timestamp(out, obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for item in obj:
            _pack_into(out, item)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack_into(out, str(k))
            _pack_into(out, v)
    else:
        raise TypeError(f"cannot msgpack-encode {type(obj)}")


def _pack_int(out: bytearray, v: int) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 0x100:
        out += bytes((0xCC, v))
    elif 0 <= v < 0x10000:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif 0 <= v < 0x100000000:
        out.append(0xCE)
        out += struct.pack(">I", v)
    elif 0 <= v < 0x10000000000000000:
        out.append(0xCF)
        out += struct.pack(">Q", v)
    elif -0x80 <= v < 0:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif -0x8000 <= v < 0:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif -0x80000000 <= v < 0:
        out.append(0xD2)
        out += struct.pack(">i", v)
    elif -0x8000000000000000 <= v < 0:
        out.append(0xD3)
        out += struct.pack(">q", v)
    else:
        raise OverflowError(f"int out of msgpack range: {v}")


def _pack_timestamp(out: bytearray, dt: _dt.datetime) -> None:
    """msgpack timestamp extension, type -1 (ts64 / ts96 as needed)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_UTC)
    epoch = dt.timestamp()
    sec = int(epoch // 1)
    nsec = dt.microsecond * 1000
    if sec < 0 or sec >= (1 << 34):
        out += bytes((0xC7, 12, 0xFF))  # ext8 len=12 type=-1 (ts96)
        out += struct.pack(">Iq", nsec, sec)
    elif nsec == 0 and sec < (1 << 32):
        out += bytes((0xD6, 0xFF))      # fixext4 (ts32)
        out += struct.pack(">I", sec)
    else:
        out += bytes((0xD7, 0xFF))      # fixext8 (ts64)
        out += struct.pack(">Q", (nsec << 34) | sec)


def packb(obj) -> bytes:
    """Encode one object to msgpack bytes."""
    out = bytearray()
    _pack_into(out, obj)
    return bytes(out)


# ---------------------------------------------------------------- decoding

def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise MsgpackError(f"truncated msgpack: need {n} bytes at {pos}")


def _unpack_one(buf: bytes, pos: int):
    _need(buf, pos, 1)
    c = buf[pos]
    pos += 1
    if c < 0x80:                       # positive fixint
        return c, pos
    if c >= 0xE0:                      # negative fixint
        return c - 0x100, pos
    if 0x80 <= c <= 0x8F:              # fixmap
        return _unpack_map(buf, pos, c & 0x0F)
    if 0x90 <= c <= 0x9F:              # fixarray
        return _unpack_array(buf, pos, c & 0x0F)
    if 0xA0 <= c <= 0xBF:              # fixstr
        n = c & 0x1F
        _need(buf, pos, n)
        return _decode_str(buf[pos:pos + n]), pos + n
    if c == 0xC0:
        return None, pos
    if c == 0xC2:
        return False, pos
    if c == 0xC3:
        return True, pos
    if c == 0xC4:                      # bin8
        _need(buf, pos, 1)
        n = buf[pos]; pos += 1
        _need(buf, pos, n)
        return bytes(buf[pos:pos + n]), pos + n
    if c == 0xC5:                      # bin16
        _need(buf, pos, 2)
        n = struct.unpack_from(">H", buf, pos)[0]; pos += 2
        _need(buf, pos, n)
        return bytes(buf[pos:pos + n]), pos + n
    if c == 0xC6:                      # bin32
        _need(buf, pos, 4)
        n = struct.unpack_from(">I", buf, pos)[0]; pos += 4
        _need(buf, pos, n)
        return bytes(buf[pos:pos + n]), pos + n
    if c == 0xC7:                      # ext8
        _need(buf, pos, 2)
        n, t = buf[pos], struct.unpack_from(">b", buf, pos + 1)[0]; pos += 2
        return _unpack_ext(buf, pos, t, n)
    if c == 0xC8:                      # ext16
        _need(buf, pos, 3)
        n = struct.unpack_from(">H", buf, pos)[0]
        t = struct.unpack_from(">b", buf, pos + 2)[0]; pos += 3
        return _unpack_ext(buf, pos, t, n)
    if c == 0xC9:                      # ext32
        _need(buf, pos, 5)
        n = struct.unpack_from(">I", buf, pos)[0]
        t = struct.unpack_from(">b", buf, pos + 4)[0]; pos += 5
        return _unpack_ext(buf, pos, t, n)
    if c == 0xCA:                      # float32
        _need(buf, pos, 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if c == 0xCB:                      # float64
        _need(buf, pos, 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if c == 0xCC:                      # uint8
        _need(buf, pos, 1)
        return buf[pos], pos + 1
    if c == 0xCD:
        _need(buf, pos, 2)
        return struct.unpack_from(">H", buf, pos)[0], pos + 2
    if c == 0xCE:
        _need(buf, pos, 4)
        return struct.unpack_from(">I", buf, pos)[0], pos + 4
    if c == 0xCF:
        _need(buf, pos, 8)
        return struct.unpack_from(">Q", buf, pos)[0], pos + 8
    if c == 0xD0:                      # int8
        _need(buf, pos, 1)
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if c == 0xD1:
        _need(buf, pos, 2)
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if c == 0xD2:
        _need(buf, pos, 4)
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if c == 0xD3:
        _need(buf, pos, 8)
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if 0xD4 <= c <= 0xD8:              # fixext 1/2/4/8/16
        n = 1 << (c - 0xD4)
        _need(buf, pos, 1)
        t = struct.unpack_from(">b", buf, pos)[0]; pos += 1
        return _unpack_ext(buf, pos, t, n)
    if c == 0xD9:                      # str8
        _need(buf, pos, 1)
        n = buf[pos]; pos += 1
        _need(buf, pos, n)
        return _decode_str(buf[pos:pos + n]), pos + n
    if c == 0xDA:
        _need(buf, pos, 2)
        n = struct.unpack_from(">H", buf, pos)[0]; pos += 2
        _need(buf, pos, n)
        return _decode_str(buf[pos:pos + n]), pos + n
    if c == 0xDB:
        _need(buf, pos, 4)
        n = struct.unpack_from(">I", buf, pos)[0]; pos += 4
        _need(buf, pos, n)
        return _decode_str(buf[pos:pos + n]), pos + n
    if c == 0xDC:                      # array16
        _need(buf, pos, 2)
        n = struct.unpack_from(">H", buf, pos)[0]
        return _unpack_array(buf, pos + 2, n)
    if c == 0xDD:
        _need(buf, pos, 4)
        n = struct.unpack_from(">I", buf, pos)[0]
        return _unpack_array(buf, pos + 4, n)
    if c == 0xDE:                      # map16
        _need(buf, pos, 2)
        n = struct.unpack_from(">H", buf, pos)[0]
        return _unpack_map(buf, pos + 2, n)
    if c == 0xDF:
        _need(buf, pos, 4)
        n = struct.unpack_from(">I", buf, pos)[0]
        return _unpack_map(buf, pos + 4, n)
    raise MsgpackError(f"unknown msgpack type byte 0x{c:02x}")


def _decode_str(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError as e:
        raise MsgpackError(f"invalid utf-8 in msgpack str: {e}") from None


def _unpack_array(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _unpack_one(buf, pos)
        out.append(v)
    return out, pos


def _unpack_map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack_one(buf, pos)
        v, pos = _unpack_one(buf, pos)
        out[k] = v
    return out, pos


def _unpack_ext(buf: bytes, pos: int, ext_type: int, n: int):
    _need(buf, pos, n)
    data = buf[pos:pos + n]
    pos += n
    if ext_type == -1:  # timestamp
        if n == 4:
            sec = struct.unpack(">I", data)[0]
            nsec = 0
        elif n == 8:
            packed = struct.unpack(">Q", data)[0]
            nsec = packed >> 34
            sec = packed & 0x3FFFFFFFF
        elif n == 12:
            nsec, sec = struct.unpack(">Iq", data)
        else:
            raise MsgpackError(f"bad timestamp ext length {n}")
        return (_dt.datetime.fromtimestamp(sec, tz=_UTC)
                + _dt.timedelta(microseconds=nsec // 1000)), pos
    # Unknown extension: surface as raw (type, bytes) — the reference never
    # produces these (SURVEY section 1.2 "out of scope").
    return (ext_type, bytes(data)), pos


def unpackb(buf: bytes, pos: int = 0):
    """Decode one object starting at ``pos``; return (obj, new_pos)."""
    return _unpack_one(buf, pos)


def unpack_stream(buf: bytes) -> Iterator:
    """Yield concatenated msgpack objects until the buffer is exhausted.

    Raises MsgpackError mid-iteration on corruption; the .tri reader
    catches it to implement skip semantics.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        obj, pos = _unpack_one(buf, pos)
        yield obj
