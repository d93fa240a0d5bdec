"""Standard MIDI File (SMF) parsing — symbolic-music training data.

Symbolic music corpora (piano-roll / event-token pretraining sets
like the Lakh MIDI dataset) ship as .mid files; a pipeline that
tokenizes music needs the real container walk. Pure stdlib from the
public SMF spec: MThd header (format, track count, division), MTrk
chunks, variable-length-quantity delta times, RUNNING STATUS (status
byte omitted when repeated — the compact idiom almost every real file
uses), channel messages with their per-status data widths, note-on
with velocity 0 meaning note-off, and meta/sysex events with VLQ
lengths. Fails loudly (ValueError) on bad magic, truncated chunks,
over-long VLQs, a data byte where a status byte is required, or a
track without end-of-track — the engine's corrupt-skip contract.
"""

from __future__ import annotations

import struct

_DATA_BYTES = {0x80: 2, 0x90: 2, 0xA0: 2, 0xB0: 2, 0xC0: 1, 0xD0: 1,
               0xE0: 2}


def _read_vlq(data: bytes, pos: int) -> tuple[int, int]:
    """Variable-length quantity: 7 bits per byte, MSB = continuation.
    The spec caps VLQs at 4 bytes (max 0x0FFFFFFF)."""
    value = 0
    for n in range(4):
        if pos >= len(data):
            raise ValueError("truncated VLQ")
        byte = data[pos]
        pos += 1
        value = (value << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return value, pos
    raise ValueError("VLQ longer than 4 bytes")


def _write_vlq(value: int) -> bytes:
    if value < 0 or value > 0x0FFFFFFF:
        raise ValueError(f"VLQ out of range: {value}")
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


def parse_midi(data: bytes) -> dict:
    """Parse one SMF; returns {format, division, n_tracks, tracks}
    where each track is a list of event dicts:
    {tick (absolute), type, channel, data} — note_on / note_off /
    control / program / pitchbend / aftertouch / meta / sysex. A
    note-on with velocity 0 is normalized to note_off (spec
    equivalence)."""
    if len(data) < 14 or data[:4] != b"MThd":
        raise ValueError("not an SMF (missing MThd)")
    hlen, fmt, ntrks, division = struct.unpack_from(">IHHH", data, 4)
    if hlen != 6:
        raise ValueError(f"MThd length {hlen} != 6")
    if fmt not in (0, 1, 2):
        raise ValueError(f"unknown SMF format {fmt}")
    if fmt == 0 and ntrks != 1:
        raise ValueError("format-0 SMF must have exactly one track")

    pos = 8 + hlen
    tracks = []
    for _ in range(ntrks):
        if pos + 8 > len(data):
            raise ValueError("truncated track header")
        if data[pos:pos + 4] != b"MTrk":
            raise ValueError("missing MTrk magic")
        tlen = struct.unpack_from(">I", data, pos + 4)[0]
        body_start = pos + 8
        if body_start + tlen > len(data):
            raise ValueError("truncated track body")
        tracks.append(_parse_track(data[body_start:body_start + tlen]))
        pos = body_start + tlen
    return {"format": int(fmt), "division": int(division),
            "n_tracks": int(ntrks), "tracks": tracks}


def _parse_track(body: bytes) -> list[dict]:
    events: list[dict] = []
    pos = 0
    tick = 0
    status = None  # running status register
    ended = False
    while pos < len(body):
        delta, pos = _read_vlq(body, pos)
        tick += delta
        if pos >= len(body):
            raise ValueError("truncated event")
        byte = body[pos]
        if byte >= 0x80:
            status = byte
            pos += 1
        elif status is None or status >= 0xF0:
            # running status never applies to meta/sysex (spec: they
            # CLEAR the register)
            raise ValueError(f"data byte 0x{byte:02x} with no "
                             "running status")
        if status == 0xFF:                      # meta event
            if pos >= len(body):
                raise ValueError("truncated meta event")
            mtype = body[pos]
            mlen, pos = _read_vlq(body, pos + 1)
            if pos + mlen > len(body):
                raise ValueError("truncated meta payload")
            events.append({"tick": tick, "type": "meta",
                           "channel": -1,
                           "data": (mtype, bytes(body[pos:pos + mlen]))})
            pos += mlen
            status = None
            if mtype == 0x2F:
                ended = True
                break
        elif status in (0xF0, 0xF7):            # sysex
            slen, pos = _read_vlq(body, pos)
            if pos + slen > len(body):
                raise ValueError("truncated sysex")
            events.append({"tick": tick, "type": "sysex", "channel": -1,
                           "data": bytes(body[pos:pos + slen])})
            pos += slen
            status = None
        elif status >= 0xF1:
            raise ValueError(f"system common status 0x{status:02x} "
                             "not valid in SMF")
        else:                                   # channel message
            kind = status & 0xF0
            channel = status & 0x0F
            width = _DATA_BYTES[kind]
            if pos + width > len(body):
                raise ValueError("truncated channel message")
            d = tuple(body[pos:pos + width])
            if any(b >= 0x80 for b in d):
                raise ValueError("status byte inside message data")
            pos += width
            if kind == 0x90 and d[1] == 0:
                events.append({"tick": tick, "type": "note_off",
                               "channel": channel, "data": d})
            else:
                name = {0x80: "note_off", 0x90: "note_on",
                        0xA0: "aftertouch", 0xB0: "control",
                        0xC0: "program", 0xD0: "aftertouch",
                        0xE0: "pitchbend"}[kind]
                events.append({"tick": tick, "type": name,
                               "channel": channel, "data": d})
    if not ended:
        raise ValueError("track missing end-of-track meta")
    return events


def build_midi(notes: list[tuple[int, int, int, int]],
               division: int = 480, channel: int = 0) -> bytes:
    """Assemble a format-0 SMF from (onset_tick, duration, pitch,
    velocity) tuples (sorted by onset). Note-offs are written as
    RUNNING-STATUS note-ons with velocity 0 — the compact real-world
    idiom — so parsers that mishandle either quirk fail the gate."""
    evts: list[tuple[int, int, int]] = []  # (tick, pitch, velocity)
    for onset, dur, pitch, vel in notes:
        evts.append((onset, pitch, vel))
        evts.append((onset + dur, pitch, 0))
    evts.sort(key=lambda e: (e[0], e[2]))

    body = bytearray()
    last_tick = 0
    first = True
    for tick, pitch, vel in evts:
        body += _write_vlq(tick - last_tick)
        last_tick = tick
        if first:
            body.append(0x90 | channel)
            first = False
        # running status: subsequent events omit the status byte
        body += bytes((pitch, vel))
    body += _write_vlq(0) + bytes((0xFF, 0x2F, 0x00))

    return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
            + b"MTrk" + struct.pack(">I", len(body)) + bytes(body))
