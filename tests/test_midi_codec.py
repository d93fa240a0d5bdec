"""codec/midi.py: SMF container walk, VLQs, running status."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_triton_spark.codec.midi import (_read_vlq, _write_vlq,
                                        build_midi, parse_midi)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 0x0FFFFFFF))
def test_vlq_round_trip(v):
    b = _write_vlq(v)
    got, pos = _read_vlq(b, 0)
    assert got == v and pos == len(b) and len(b) <= 4


def test_vlq_spec_goldens():
    """Byte-level VLQ examples straight from the SMF spec."""
    assert _write_vlq(0x00) == b"\x00"
    assert _write_vlq(0x7F) == b"\x7f"
    assert _write_vlq(0x80) == b"\x81\x00"
    assert _write_vlq(0x3FFF) == b"\xff\x7f"
    assert _write_vlq(0x0FFFFFFF) == b"\xff\xff\xff\x7f"
    with pytest.raises(ValueError):
        _read_vlq(b"\xff\xff\xff\xff\x7f", 0)  # 5-byte VLQ


def test_round_trip_running_status():
    notes = [(0, 120, 60, 90), (120, 240, 64, 80), (480, 120, 67, 70)]
    m = parse_midi(build_midi(notes))
    assert (m["format"], m["n_tracks"], m["division"]) == (0, 1, 480)
    evs = m["tracks"][0]
    ons = [(e["tick"], e["data"]) for e in evs if e["type"] == "note_on"]
    offs = [(e["tick"], e["data"]) for e in evs if e["type"] == "note_off"]
    assert ons == [(0, (60, 90)), (120, (64, 80)), (480, (67, 70))]
    # velocity-0 note-ons came back normalized as note_offs
    assert offs == [(120, (60, 0)), (360, (64, 0)), (600, (67, 0))]
    assert evs[-1]["type"] == "meta" and evs[-1]["data"][0] == 0x2F


def test_explicit_status_and_meta():
    """Hand-assembled track: explicit statuses, a tempo meta event,
    program change (1 data byte), pitch bend (2 data bytes)."""
    body = (b"\x00" + bytes((0xC5, 12))                   # program ch5
            + b"\x00" + bytes((0xFF, 0x51, 0x03)) + b"\x07\xa1\x20"
            + b"\x10" + bytes((0xE0, 0x00, 0x40))          # pitchbend
            + b"\x00" + bytes((0xFF, 0x2F, 0x00)))
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(body)) + body)
    evs = parse_midi(data)["tracks"][0]
    assert evs[0]["type"] == "program" and evs[0]["channel"] == 5
    assert evs[1]["type"] == "meta" and evs[1]["data"] == (
        0x51, b"\x07\xa1\x20")
    assert evs[2]["type"] == "pitchbend" and evs[2]["tick"] == 0x10


@pytest.mark.parametrize("mutate", [
    lambda d: b"MThx" + d[4:],                        # bad magic
    lambda d: d[:14] + b"XTrk" + d[18:],              # bad track magic
    lambda d: d[:-4],                                 # truncated body
    lambda d: d[:-4] + b"\x00\x90\x3c",               # truncated message
    lambda d: d[:9] + b"\x09" + d[10:],               # SMF format 9
])
def test_corrupt_rejected(mutate):
    good = build_midi([(0, 100, 60, 80)])
    with pytest.raises(ValueError):
        parse_midi(mutate(good))


def test_missing_end_of_track_rejected():
    good = bytearray(build_midi([(0, 100, 60, 80)]))
    # overwrite the end-of-track meta with a harmless note event
    good[-4:] = bytes((0x00, 0x3c, 0x00, 0x00))
    with pytest.raises(ValueError):
        parse_midi(bytes(good))


def test_data_byte_without_status_rejected():
    body = b"\x00" + bytes((0x3C, 0x40)) + b"\x00\xff\x2f\x00"
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(body)) + body)
    with pytest.raises(ValueError):
        parse_midi(data)
